"""SparkSession factory with scale-appropriate defaults.

The same settings we would submit to a 1000-executor cluster, minus the
resource sizing: AQE on (runtime coalescing + skew-join splitting),
Arrow transport for the pandas-UDF kernel, and a bounded Arrow batch
size -- HTML documents run 2 KB..1 MB, so the default 10k-rows/batch
would make a single Arrow batch multi-GB; 256 rows keeps batches in the
tens-of-MB range an executor core can hold.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH_ROWS = 256


def get_spark(
    app_name: str = "xhtml_parser_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cores}]"
    shuffle_partitions = shuffle_partitions or max(cores * 2, 8)
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        # parse stage is map-side: feed it splits small enough that one
        # task's HTML fits comfortably in a python worker
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        .config("spark.python.worker.reuse", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
