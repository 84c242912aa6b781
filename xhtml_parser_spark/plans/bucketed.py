"""Bucketed table layout for co-located repeat joins (north_star:
"bucketing for co-located joins").

A crawl pipeline joins its derived tables on the same key over and
over: nodes x attrs on url, extracted x lineage on url-hash class,
candidate pairs back to documents. Hash-bucketing both sides ONCE at
write time (``bucketBy(n, key)``) lets every later equi-join on that
key skip its shuffle entirely -- the scan is already partitioned and
(optionally) sorted by the join key, so Catalyst plans a
SortMergeJoin with ZERO Exchange on either side. At 100 TB that is
the difference between re-shuffling the corpus per analytical join
and never shuffling it again.

Plain parquet files cannot carry bucket metadata; bucketed output goes
through ``saveAsTable`` (with an explicit ``path`` => external table,
so the data lives wherever the pipeline says while the bucketing spec
lives in the catalog).

``test_plans.py::test_bucketed_join_has_no_exchange`` asserts the
no-shuffle plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as an external bucketed (and optionally
    sorted-within-bucket) parquet table. ``n_buckets`` should match
    across every table meant to co-join (equal bucket counts are what
    let the planner elide both Exchanges)."""
    w = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
