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
import tempfile
import zipfile

from pyspark.sql import SparkSession

ARROW_BATCH_ROWS = 256


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on python workers regardless of the
    driver's cwd/sys.path (mapInPandas closures are pickled by module
    reference, so workers must import ``xhtml_parser_spark`` themselves).
    Zips the package and addPyFile's it -- works in any deploy mode."""
    if getattr(ship_package, "_done", None) is spark:
        return
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    base = os.path.dirname(pkg_root)
    # unique per-process name: a fixed shared path races concurrent
    # drivers on one host (truncate-while-fetch) and collides across
    # users in a sticky-bit tempdir
    fd, zpath = tempfile.mkstemp(
        prefix="xhtml_parser_spark_pkg_", suffix=".zip"
    )
    os.close(fd)
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _, files in os.walk(pkg_root):
            for f in files:
                # ship the C kernel source too: workers importing from
                # the zip rebuild the accel module locally (the accel
                # loader reads the source via pkgutil, which works from
                # zipimport); a .py-only zip silently demoted every
                # worker to the pure-Python kernel
                if f.endswith((".py", ".c")):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, base))
    spark.sparkContext.addPyFile(zpath)
    ship_package._done = spark


def get_spark(
    app_name: str = "xhtml_parser_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cores}]"
    shuffle_partitions = shuffle_partitions or max(cores * 2, 8)
    spark = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # deterministic timestamp semantics regardless of host TZ:
        # cross-engine oracle comparisons and window/session outputs
        # are TZ-naive
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        # parse stage is map-side: feed it splits small enough that one
        # task's HTML fits comfortably in a python worker
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        # vectorized parquet batches are ROW-count sized; at the default
        # 4096 rows a binary html column of ~30 KB/row asks for >100 MB
        # of contiguous column-vector per task and 32 concurrent tasks
        # OOM the reservation (seen as FAILED_READ_FILE on the 18.5 GB
        # rehearsal corpus). 256 rows caps it at ~8-32 MB per task.
        # Deliberately session-global: the html pages table is this
        # engine's primary input and the option is SQLConf-only (per-
        # reader options are silently ignored); the cost on narrow-table
        # scans is one ColumnarBatch step per 256 rows (~us), noise next
        # to decode. Tunable for narrow-only sessions via env.
        .config(
            "spark.sql.parquet.columnarReaderBatchSize",
            os.environ.get("XPS_PARQUET_BATCH_ROWS", str(ARROW_BATCH_ROWS)),
        )
        .config("spark.python.worker.reuse", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # print the worker's Python stack on a hard crash (segfault /
        # OOM-kill) instead of a bare "connection reset": zero cost
        # until a fault actually fires, priceless when one does (the
        # 10x step-up debugging round; BENCH.md round 4)
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
        # Unix domain sockets for JVM<->worker IPC. Two reasons, both
        # measured at the 10x parse corpus (BENCH.md round 4): (1) the
        # TCP path deadlocks under sustained bidirectional pressure --
        # JVM task thread parked in ReaderInputStream's selector
        # (PythonRunner.scala:808) while the worker blocks in
        # tcp_sendmsg with a 33 MB unread input Recv-Q; reproduced 3x
        # (one worker-crash abort, two 133/134-task hangs), 0/8 hangs
        # with UDS; (2) UDS is ~25% faster on the same workload
        # (15.4-17.4 s vs 20.7-21.6 s per 1.2M-doc parse). Opt out via
        # XPS_UDS=0 for A/Bs.
        .config(
            "spark.python.unix.domain.socket.enabled",
            "false" if os.environ.get("XPS_UDS") == "0" else "true",
        )
        .getOrCreate()
    )
    ship_package(spark)
    return spark
