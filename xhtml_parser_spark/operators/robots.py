"""robots.txt parsing and crawl-politeness filtering, relationally.

The step between "crawl delivery" and "pages worth fetching/keeping":
given one robots.txt body per host, decide for every url whether the
configured agent may fetch it. Both halves are pure DataFrame algebra
(windows + string built-ins, no Python in the hot path), so the whole
decision is exactly replayable by the SQL oracle.

Grammar subset (the practically-universal core of REP / RFC 9309):

  * lines are split on '\\n'; a trailing '#comment' and surrounding
    spaces/tabs are stripped (RFC 9309 WS = %x20 / %x09); blank and
    unknown-directive lines are IGNORED entirely -- they neither carry
    rules nor interrupt a group (a Crawl-delay between two User-agent
    lines does not split them; this matches Google's reference parser)
  * directives (case-insensitive names): ``User-agent:``, ``Allow:``,
    ``Disallow:`` with literal path-prefix values (no '*'/'$'
    wildcards -- documented out, like the reference's feature gates)
  * User-agent lines not separated by a RULE line share the rule group
    that follows (RFC 9309 §2.1); a User-agent line after rules starts
    a new group
  * group selection per RFC 9309 §2.2.1: if any group names the agent
    exactly (case-insensitive), those groups apply; otherwise groups
    naming ``*`` apply; otherwise everything is allowed
  * decision per url: the longest-prefix matching rule wins; on a
    length tie Allow wins; no matching rule (or an empty
    ``Disallow:``) means allowed

Scale shape: parsing is per-host row-local string/window work (one
window partitioned by host -- robots bodies are KB-sized, so the
per-host sort is trivial); the url decision is one equi-join on host
followed by a per-url max_by aggregate (map-side partial agg). Nothing
global, no skew beyond the host key itself (a hot host's urls hash
across tasks after the join's shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(
    robots: DataFrame,
    agent: str,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """Parse robots.txt bodies into the rule set that applies to
    ``agent``: (host, allow, path) -- one row per Allow/Disallow rule
    of the selected group(s); hosts whose robots.txt has no applicable
    group contribute no rows (= allowed by default downstream).
    """
    agent_lc = agent.lower()
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.coalesce(F.col(body_col), F.lit("")), "\n")).alias(
            "pos", "raw"
        ),
    )
    # strip comments + whitespace (spaces AND tabs -- F.trim only
    # removes spaces, and RFC 9309 WS is %x20/%x09); classify
    def _strip(col):
        return F.regexp_replace(
            F.regexp_replace(col, "^[ \t]+", ""), "[ \t]+$", ""
        )

    val = _strip(F.regexp_replace(F.col("raw"), "#.*$", ""))
    lines = lines.select(
        "host",
        "pos",
        val.alias("line"),
        F.lower(_strip(F.regexp_extract(val, "^([A-Za-z-]+)[ \t]*:", 1))).alias("d"),
        _strip(F.regexp_extract(val, "^[A-Za-z-]+[ \t]*:(.*)$", 1)).alias("v"),
    ).withColumn(
        "kind",
        F.when(F.col("d") == "user-agent", F.lit("ua"))
        .when(F.col("d").isin("allow", "disallow"), F.lit("rule"))
        .otherwise(F.lit("other")),
    )
    # group id: a UA line NOT directly preceded by another UA line
    # starts a new group (consecutive UA lines share the group)
    w = Window.partitionBy("host").orderBy("pos")
    grouped = (
        lines.where(F.col("kind") != "other")
        .withColumn("prev_kind", F.lag("kind").over(w))
        .withColumn(
            "new_grp",
            ((F.col("kind") == "ua") & (F.coalesce(F.col("prev_kind"), F.lit("x")) != "ua"))
            .cast("int"),
        )
        .withColumn("grp", F.sum("new_grp").over(w))
    )
    uas = grouped.where(F.col("kind") == "ua").select(
        "host", "grp", F.lower(F.col("v")).alias("ua")
    )
    # precedence: exact agent match (2) beats the '*' group (1)
    grp_prec = (
        uas.withColumn(
            "prec",
            F.when(F.col("ua") == agent_lc, F.lit(2))
            .when(F.col("ua") == "*", F.lit(1))
            .otherwise(F.lit(0)),
        )
        .groupBy("host", "grp")
        .agg(F.max("prec").alias("prec"))
        .where(F.col("prec") > 0)
    )
    host_best = grp_prec.groupBy("host").agg(F.max("prec").alias("best"))
    chosen = grp_prec.join(host_best, "host").where(
        F.col("prec") == F.col("best")
    ).select("host", "grp")
    rules = grouped.where((F.col("kind") == "rule") & (F.col("v") != "")).select(
        "host",
        "grp",
        (F.col("d") == "allow").cast("int").alias("allow"),
        F.col("v").alias("path"),
    )
    return rules.join(chosen, ["host", "grp"]).select("host", "allow", "path")


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Per-url politeness decision against a ``parse_robots`` rule set:
    (url, host, allowed) with allowed = 1/0. Longest matching
    path-prefix rule wins; ties go to Allow; urls on hosts with no
    matching rule (or no rules at all) are allowed.

    Rules match against path+query (fragment stripped), per RFC 9309 /
    Google's matcher -- a ``Disallow: /search?`` rule works. A url with
    a query but no path slash matches as ``/?q`` (what a crawler would
    request for an authority-only url).

    One equi-join on host + one per-url max_by aggregate. The
    tie-break is encoded in the max_by key (length * 2 + allow), so a
    single aggregate decides -- no window re-sort over the joined rows.
    """
    from ..functions.urls import _SCHEME_RE, url_host

    # host via the shared helper (lowercased, query/fragment-safe);
    # match target = authority-to-fragment span (path INCLUDING query),
    # '/'-prefixed when the path component is empty
    rest = F.regexp_replace(F.col(url_col), _SCHEME_RE, "")
    pq = F.regexp_extract(rest, "^[^/?#]*([^#]*)", 1)
    u = urls.select(
        F.col(url_col).alias("url"),
        url_host(F.col(url_col)).alias("host"),
        F.when(pq.startswith("/"), pq)
        .otherwise(F.concat(F.lit("/"), pq))
        .alias("path"),
    )
    return _decide(u, rules)


def _decide(u: DataFrame, rules: DataFrame) -> DataFrame:
    r = rules.select(
        "host",
        F.col("allow").cast("bigint").alias("r_allow"),
        F.col("path").alias("r_path"),
    )
    joined = u.join(r, "host").where(F.col("path").startswith(F.col("r_path")))
    decided = joined.groupBy("url", "host").agg(
        F.max_by(
            "r_allow", F.length("r_path") * 2 + F.col("r_allow")
        ).alias("win_allow")
    )
    return (
        u.join(decided.select("url", "win_allow"), "url", "left")
        .select(
            "url",
            "host",
            F.coalesce(F.col("win_allow"), F.lit(1)).cast("int").alias("allowed"),
        )
    )


def robots_sitemaps(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, idx, sitemap) for every ``Sitemap:`` directive -- the
    crawl-side discovery hook feeding ``operators.sitemap``. Per the
    sitemaps.org protocol the directive is GROUP-INDEPENDENT (it binds
    to the file, not to a User-agent group), so this is a pure
    line-filter: same comment/whitespace stripping as parse_robots,
    ``idx`` is the 0-based document-order ordinal. Values keep their
    case (URLs are case-sensitive; only the directive name folds).
    Row-local string work, no shuffle beyond the posexplode."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.split(F.coalesce(F.col(body_col), F.lit("")), "\n")
        ).alias("pos", "raw"),
    )

    def _strip(col):
        return F.regexp_replace(
            F.regexp_replace(col, "^[ \t]+", ""), "[ \t]+$", ""
        )

    val = _strip(F.regexp_replace(F.col("raw"), "#.*$", ""))
    picked = lines.select(
        "host",
        "pos",
        F.lower(
            _strip(F.regexp_extract(val, "^([A-Za-z-]+)[ \t]*:", 1))
        ).alias("d"),
        _strip(F.regexp_extract(val, "^[A-Za-z-]+[ \t]*:(.*)$", 1)).alias("v"),
    ).where((F.col("d") == "sitemap") & (F.col("v") != ""))
    w = Window.partitionBy("host").orderBy("pos")
    return picked.select(
        "host",
        (F.row_number().over(w) - 1).cast("int").alias("idx"),
        F.col("v").alias("sitemap"),
    )
