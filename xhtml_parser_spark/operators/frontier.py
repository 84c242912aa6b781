"""Crawl-frontier operators: snapshot diffing and politeness scheduling.

The re-crawl loop above the extractor: decide WHAT changed between two
crawl snapshots (``crawl_delta``) and WHEN each frontier URL may be
fetched without hammering a host (``fetch_schedule``). Both are pure
relational plans -- no Python stage, no collect -- so they run at
frontier scale (10^12 urls) as one or two keyed shuffles.

``crawl_delta(old, new)``: full outer join on url over (url, digest)
projections -- the only shuffle is the join itself, and both sides
partial-project before it (digest columns only). Statuses: ``added``
(new only), ``removed`` (old only), ``changed`` (both, digest differs),
``same``. Feed ``changed + added`` back into the fetch queue; ``same``
rows are the re-crawl savings a scheduler reports.

``fetch_schedule(frontier, default_delay_ms)``: RFC 9309 politeness --
at most one fetch per host per crawl-delay. Per host, urls are ordered
by (priority desc, url) and the n-th gets ``fetch_at_ms = n * delay``
(host's crawl-delay when present, else the default). The per-host
``row_number`` window is the semantics, not an accident: a polite
schedule IS a per-host sequence, and the window's partition is exactly
the unit the crawl rate bounds (a host with 10^9 queued urls is
throttled to delay * 10^9 ms of wall anyway -- the plan is never the
bottleneck, the politeness budget is; cap the queue upstream with
``corpus.host_cap`` when that budget is real).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def crawl_delta(old: DataFrame, new: DataFrame) -> DataFrame:
    """(url, status, old_digest, new_digest) for two pages snapshots.

    Inputs need (url, html); digests are computed here (sha256 over the
    raw payload, the cdx_index identity) so callers can pass raw pages
    tables. Statuses: added | removed | changed | same."""
    o = old.select("url", F.sha2(F.col("html"), 256).alias("old_digest"))
    n = new.select("url", F.sha2(F.col("html"), 256).alias("new_digest"))
    j = o.join(n, "url", "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") == F.col("new_digest"), F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    return j.select("url", status.alias("status"), "old_digest", "new_digest")


def fetch_schedule(
    frontier: DataFrame,
    default_delay_ms: int = 1000,
    delays: DataFrame | None = None,
) -> DataFrame:
    """frontier(url, host, priority) -> (url, host, slot, fetch_at_ms).

    ``delays`` (host, delay_ms), typically from ``robots.parse_robots``
    crawl-delay lines, overrides the default per host; it is broadcast
    (the host dimension is small next to the frontier). Slot 0 fetches
    immediately; slot n at n * delay. Deterministic: priority desc,
    then url asc."""
    w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("url"))
    ranked = frontier.select("url", "host", "priority").withColumn(
        "slot", (F.row_number().over(w) - 1).cast("bigint")
    )
    if delays is not None:
        ranked = ranked.join(
            F.broadcast(delays.select("host", "delay_ms")), "host", "left"
        )
        delay = F.coalesce(F.col("delay_ms"), F.lit(default_delay_ms))
    else:
        delay = F.lit(default_delay_ms)
    return ranked.select(
        "url",
        "host",
        "slot",
        (F.col("slot") * delay).cast("bigint").alias("fetch_at_ms"),
    )
