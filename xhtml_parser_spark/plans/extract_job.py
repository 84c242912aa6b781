"""The end-to-end extraction job (north_star B1-B11).

Pipeline per url-hash slice (slices are the checkpoint/commit unit):

  scan (url, html only -- Catalyst prunes the rest)
    -> repartition by url hash (B3: deterministic output layout,
       co-located re-reads, and task granularity for the CPU-bound
       kernel)
    -> mapInPandas parse/extract kernel (B5, shuffle-free)
    -> + spark_partition_id() provenance column
    -> snapshot-commit parquet slice (B11/B8)
    -> lineage rows aggregated FROM THE COMMITTED FILES (B7) -- no
       double parse, no cache: re-reading the written parquet is cheap
       relative to parsing, and lineage provably describes what landed

Resume (B8): a re-run with the same output path skips committed slices
-- the kill-anywhere contract is: data-then-manifest, manifest rename
is atomic, readers see committed slices only.

Skew (B4): hot hosts skew per-host aggregations, not the parse (which
keys on nothing). host_stats() demonstrates the two-phase salted
aggregate; the parse path needs no salting by construction.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import url_host
from ..operators import parse_pages
from ..sources.table import SnapshotTable

LINEAGE_COLS = (
    "run_id",
    "slice_id",
    "partition_id",
    "doc_count",
    "byte_count",
    "parse_error_count",
    "wall_ms",
)

_LINEAGE_SCHEMA = (
    "run_id string, slice_id int, partition_id int, doc_count bigint, "
    "byte_count bigint, parse_error_count bigint, wall_ms bigint"
)


def _slice_lineage_df(
    spark: SparkSession, table: SnapshotTable, k: int, run_id: str
) -> DataFrame:
    """Lineage rows derived from slice k's COMMITTED (manifest-listed)
    files -- the counts provably describe what landed. Works for both
    the standard and fused outputs (both carry partition_id,
    html_bytes, parse_ok, kernel_ns).

    ``wall_ms`` here is sum(kernel_ns)/1e6 -- kernel CPU time, the only
    timing the committed files carry. Fused-direct lineage rows instead
    record real task wall-clock (sources/fused_extract.py), so rows
    written by this heal/standard path and rows written by a live fused
    run measure different things; both are upper-bounded views of the
    same work and the column keeps one name so readers aggregate it
    uniformly."""
    manifest = next(m for m in table.manifests() if m["slice_id"] == k)
    files = [os.path.join(table.slice_dir(k), f) for f in manifest["files"]]
    if not files:
        return spark.createDataFrame([], _LINEAGE_SCHEMA)
    written = spark.read.parquet(*files)
    return written.groupBy("partition_id").agg(
        F.count("*").alias("doc_count"),
        F.sum("html_bytes").alias("byte_count"),
        F.sum(F.when(~F.col("parse_ok"), 1).otherwise(0)).alias(
            "parse_error_count"
        ),
        (F.sum("kernel_ns") / F.lit(1e6)).cast("bigint").alias("wall_ms"),
    ).select(
        F.lit(run_id).alias("run_id"),
        F.lit(k).cast("int").alias("slice_id"),
        "partition_id",
        "doc_count",
        "byte_count",
        "parse_error_count",
        "wall_ms",
    )


def _heal_missing_lineage(
    spark: SparkSession,
    table: SnapshotTable,
    lineage_table: SnapshotTable,
    run_id: str,
) -> list[int]:
    """Close the crash window between a slice's data commit and its
    lineage commit: a kill -9 there leaves a committed data slice with
    no lineage slice, and resume would otherwise skip it forever
    (found by jobs/backfill_rehearsal.py). Rebuild the missing lineage
    from the committed files and commit it under this run's id."""
    missing = table.committed_slices() - lineage_table.committed_slices()
    for k in sorted(missing):
        lineage_table.write_slice(
            _slice_lineage_df(spark, table, k, run_id), k, run_id
        )
    return sorted(missing)


def _check_resume_mode(
    table: SnapshotTable,
    fused: bool,
    n_slices: int,
    input_digest: str | None = None,
    input_format: str = "parquet",
) -> None:
    """Refuse to resume a partially-committed table in the other mode.

    Standard parquet slices are url-hash classes; fused and warc slices
    are input-file groups (so a crawl delivery gzip-decodes once per
    job, not once per slice). Mixing modes/formats (or changing
    n_slices, which re-keys the slice
    membership in both modes) silently duplicates and drops documents
    while the summaries still look exactly-once. Manifests record the
    mode and slice count at commit time; a mismatch is a hard error.

    Fused membership is additionally a function of the INPUT LISTING
    (files[slice_id::n_slices] of the sorted dir): a file added or
    removed between runs re-keys every group, so fused manifests also
    record the listing digest and resume verifies it.
    """
    for m in table.manifests():
        committed_fused = bool(m.get("fused", False))
        if committed_fused != fused:
            raise ValueError(
                f"slice {m['slice_id']} was committed with fused="
                f"{committed_fused}; resuming with fused={fused} would "
                "re-key slice membership (duplicate/missing documents). "
                "Use a fresh output path or the original mode."
            )
        committed_format = m.get("input_format", "parquet")
        if committed_format != input_format:
            raise ValueError(
                f"slice {m['slice_id']} was committed with input_format="
                f"{committed_format!r}; resuming with input_format="
                f"{input_format!r} would re-key slice membership "
                "(url-hash classes vs file groups). Use a fresh output "
                "path or the original format."
            )
        committed_n = m.get("n_slices")
        if committed_n is not None and committed_n != n_slices:
            raise ValueError(
                f"slice {m['slice_id']} was committed with n_slices="
                f"{committed_n}; resuming with n_slices={n_slices} would "
                "re-key slice membership (duplicate/missing documents)."
            )
        committed_digest = m.get("input_digest")
        if (
            input_digest is not None
            and committed_digest is not None
            and committed_digest != input_digest
        ):
            raise ValueError(
                f"slice {m['slice_id']} was committed over a different "
                "input listing (files added/removed since); resuming "
                "would re-key every fused file group (duplicate/missing "
                "documents). Use a fresh output path, or restore the "
                "original input listing."
            )


def run_extract(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    run_id: str,
    n_slices: int = 8,
    partitions: int | None = None,
    max_slices: int | None = None,
    fused: bool = False,
    layout: str | None = None,
    input_format: str = "parquet",
) -> dict:
    """Run (or resume) the extraction. Returns a summary dict.

    ``max_slices`` bounds how many uncommitted slices to process in this
    invocation (used by the resume test to simulate a mid-run kill; in
    production it bounds a run's blast radius the same way).

    ``layout`` ("range" default, per north_rule) range-partitions each
    slice by xxhash64(url) so output partitions hold contiguous hash
    ranges; "hash" uses plain hash partitioning (skips the range
    partitioner's sampling job).

    ``fused=True`` switches to the zero-IPC sink path
    (sources/fused_extract.py): python tasks read, parse, AND write
    their output parquet directly; the JVM sees only lineage rows. The
    commit unit becomes a deterministic input-file group instead of a
    url-hash range (see that module's docstring for the trade-off);
    manifests, resume, kill-safety and read_extracted/read_lineage are
    identical.
    """
    if layout not in (None, "range", "hash"):
        raise ValueError(f"layout must be 'range' or 'hash', got {layout!r}")
    if input_format not in ("parquet", "warc"):
        raise ValueError(
            f"input_format must be 'parquet' or 'warc', got {input_format!r}"
        )
    if fused and input_format != "parquet":
        # the fused reader streams parquet row groups in-task; a crawl
        # delivery runs the standard path straight off the .warc.gz
        # shards (or converts to parquet first for the fused sink)
        raise ValueError("fused=True supports parquet input only")
    if fused:
        if layout is not None:
            # fused output files are input-file-clustered by
            # construction; silently accepting a layout request would
            # hand the caller unpartitioned output they believe is
            # url-hash-ranged
            raise ValueError(
                "layout is not supported with fused=True (fused output is "
                "input-file-clustered; repartition downstream for a keyed "
                "layout)"
            )
        return _run_extract_fused(
            spark, input_path, output_path, run_id, n_slices, partitions,
            max_slices,
        )
    layout = layout or "range"
    table = SnapshotTable(output_path)
    lineage_table = SnapshotTable(os.path.join(output_path, "_lineage"))

    if input_format == "warc":
        # warc slices are FILE GROUPS (files[k::n_slices] of the sorted
        # listing, the fused path's commit unit): the python datasource
        # has no filter pushdown, so url-hash slices would re-read and
        # gzip-decode the ENTIRE delivery once per slice (a 1 TB
        # delivery decoding n_slices TB). File groups decode each
        # archive exactly once per job; membership is a function of the
        # listing, so manifests record its digest and resume verifies
        # it (same rule as fused).
        from ..sources.warc import list_warc_files, warc_listing_digest

        warc_files = list_warc_files(input_path)
        input_digest = warc_listing_digest(input_path)
    else:
        warc_files = None
        input_digest = None
    _check_resume_mode(
        table, fused=False, n_slices=n_slices,
        input_digest=input_digest, input_format=input_format,
    )
    done = table.committed_slices()
    healed = _heal_missing_lineage(spark, table, lineage_table, run_id)
    partitions = partitions or spark.sparkContext.defaultParallelism * 2

    if input_format != "warc":
        pages = spark.read.parquet(input_path).select("url", "html")

    processed = []
    for k in range(n_slices):
        if k in done:
            continue
        if max_slices is not None and len(processed) >= max_slices:
            break
        t0 = time.monotonic()
        if warc_files is not None:
            group = warc_files[k::n_slices]
            if group:
                # FUSED slice read (round 3): gzip-decode + frame +
                # PARSE inside the scan task, so the layout shuffle
                # below moves the parsed rows -- not the raw html,
                # which is both larger and would cross Arrow IPC twice
                # (python datasource out + mapInArrow in). Files are
                # grouped into at most `partitions` scan tasks:
                # one-task-per-file serializes ~100-200 ms of python
                # datasource launch overhead per archive (CLAUDE.md).
                from ..sources.warc import read_parsed_warc_files

                slice_df = read_parsed_warc_files(
                    spark, group, num_partitions=partitions
                )
            else:  # n_slices > file count: commit an empty slice
                from ..operators.parse import PARSED_SCHEMA

                slice_df = spark.createDataFrame([], PARSED_SCHEMA)
        else:
            slice_df = pages.where(
                F.pmod(F.xxhash64("url"), F.lit(n_slices)) == k
            )
        # B3: range-partition by url hash (north_rule) -- contiguous
        # hash ranges per output partition give a deterministic, nearly
        # uniform layout that downstream range reads can prune; the
        # range partitioner's sampling pass is cheap relative to the
        # parse. layout="hash" keeps plain hash partitioning (no
        # sampling job) for latency-sensitive small slices.
        if layout == "range":
            sliced = slice_df.repartitionByRange(
                partitions, F.xxhash64("url")
            )
        else:
            sliced = slice_df.repartition(partitions, F.xxhash64("url"))
        if warc_files is not None:
            parsed = sliced.withColumn(
                "partition_id", F.spark_partition_id()
            )
        else:
            parsed = parse_pages(sliced).withColumn(
                "partition_id", F.spark_partition_id()
            )
        meta = {
            "fused": False, "n_slices": n_slices,
            "input_format": input_format,
        }
        if input_digest is not None:
            meta["input_digest"] = input_digest
        table.write_slice(parsed, k, run_id, meta=meta)
        # lineage from the committed (manifest-listed) files -- counts
        # describe what landed; no double parse
        lineage_table.write_slice(
            _slice_lineage_df(spark, table, k, run_id), k, run_id
        )
        processed.append(
            {"slice_id": k, "wall_s": round(time.monotonic() - t0, 2)}
        )

    return {
        "run_id": run_id,
        "n_slices": n_slices,
        "skipped_committed": sorted(done),
        "healed_lineage": healed,
        "processed": processed,
    }


def _run_extract_fused(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    run_id: str,
    n_slices: int,
    partitions: int | None,
    max_slices: int | None,
) -> dict:
    from ..sources.fused_extract import fused_extract_slice, part_file_name

    from ..sources.listing import listing_digest

    table = SnapshotTable(output_path)
    lineage_table = SnapshotTable(os.path.join(output_path, "_lineage"))
    input_digest = listing_digest(input_path)
    _check_resume_mode(
        table, fused=True, n_slices=n_slices, input_digest=input_digest
    )
    done = table.committed_slices()
    healed = _heal_missing_lineage(spark, table, lineage_table, run_id)
    partitions = partitions or spark.sparkContext.defaultParallelism * 4

    processed = []
    for k in range(n_slices):
        if k in done:
            continue
        if max_slices is not None and len(processed) >= max_slices:
            break
        t0 = time.monotonic()
        # the scan action IS the extraction: tasks write their output
        # parquet and return one lineage row each
        rows = fused_extract_slice(
            spark,
            input_path,
            table.slice_dir(k),
            slice_id=k,
            n_slices=n_slices,
            num_partitions=partitions,
        ).collect()
        out_bytes = sum(r["out_bytes"] for r in rows)
        # commit exactly the files this run's tasks reported -- never a
        # directory listing, which could include stale orphans from a
        # previous killed run with a different partition count
        landed = [
            part_file_name(r["partition_id"])
            for r in rows
            if r["out_bytes"] > 0
        ]
        table.commit_slice_files(
            k, run_id, files=landed,
            meta={"out_bytes": out_bytes, "fused": True,
                  "n_slices": n_slices, "input_digest": input_digest},
        )
        # explicit _LINEAGE_SCHEMA-compatible types: createDataFrame(rows)
        # infers partition_id/slice_id as BIGINT, but the standard path and
        # the crash-window heal write them as INT -- a lineage table mixing
        # both fails at read time with a parquet column-type mismatch
        lineage = spark.createDataFrame(rows).select(
            F.lit(run_id).alias("run_id"),
            F.lit(k).cast("int").alias("slice_id"),
            F.col("partition_id").cast("int").alias("partition_id"),
            F.col("doc_count").cast("bigint").alias("doc_count"),
            F.col("byte_count").cast("bigint").alias("byte_count"),
            F.col("parse_error_count").cast("bigint").alias("parse_error_count"),
            F.col("wall_ms").cast("bigint").alias("wall_ms"),
        )
        lineage_table.write_slice(lineage, k, run_id)
        processed.append(
            {"slice_id": k, "wall_s": round(time.monotonic() - t0, 2)}
        )

    return {
        "run_id": run_id,
        "n_slices": n_slices,
        "skipped_committed": sorted(done),
        "healed_lineage": healed,
        "processed": processed,
        "fused": True,
    }


def read_extracted(spark: SparkSession, output_path: str) -> DataFrame:
    return SnapshotTable(output_path).read(spark)


def read_lineage(spark: SparkSession, output_path: str) -> DataFrame:
    return SnapshotTable(os.path.join(output_path, "_lineage")).read(spark)


def host_stats(pages: DataFrame, salts: int = 16) -> DataFrame:
    """Per-host doc/byte counts with two-phase salted aggregation (B4).

    Zipf-hot hosts would funnel one reducer on a naive groupBy(host) if
    partial aggregation were defeated (high-cardinality payloads,
    collect_list-style aggregates). Phase 1 aggregates (host, salt) --
    the hot host's rows spread over ``salts`` reducers -- phase 2 merges
    the per-salt partials.
    """
    # shared host extraction (functions/urls.py): handles path-less
    # urls ('https://example.com') that a trailing-slash regex would
    # silently map to host ''
    host = url_host(F.col("url")).alias("host")
    salted = pages.select(
        host, F.pmod(F.xxhash64("url"), F.lit(salts)).alias("salt"), "html"
    )
    partial = salted.groupBy("host", "salt").agg(
        F.count("*").alias("c"), F.sum(F.length("html")).alias("b")
    )
    return partial.groupBy("host").agg(
        F.sum("c").alias("doc_count"), F.sum("b").alias("byte_count")
    )
