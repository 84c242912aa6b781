"""Fused read->parse->write extraction (the zero-IPC sink path).

The standard pipeline pays two JVM hops per document: parquet ->
JVM -> Arrow IPC -> python kernel, then parsed rows -> Arrow IPC ->
JVM -> parquet. On one 32-core box the shared JVM's IPC+GC path caps
the C-kernel pipeline around 1.5 GB/s (BENCH.md); on a cluster it
costs every executor memory bandwidth. Since the production sink is
parquet anyway, this data source fuses the whole chain INSIDE the
python task: each partition streams its input parquet split with
pyarrow, runs the parse kernel, writes its output parquet file
directly, and yields a single LINEAGE row. Document bytes never touch
the JVM in either direction; the driver collects only per-partition
counters (north_star B7).

Task-retry safety: output is written to a uuid tmp name and
os.replace()d to a deterministic per-partition name, so a retried or
speculatively-executed task overwrites atomically instead of
duplicating. Visibility is governed by the SnapshotTable manifest
(written by the driver AFTER the scan action completes), so a killed
run leaves invisible orphans, same as the standard path.

Deployment requirement: driver and executors must share one
filesystem for input and output paths (local[N], NFS, or a FUSE-mounted
object store). partitions() lists the input dir on the driver, tasks
os.replace() their output into the slice dir, and the driver's
commit_slice_files() stats those files before committing -- that
existence check fails loudly (FileNotFoundError) if the paths are not
actually shared, rather than committing phantom files. On HDFS/S3
without a shared mount, use the standard (non-fused) path.

Used by plans.extract_job.run_extract(fused=True); the commit unit is
a deterministic file group (files[slice_id::n_slices]) rather than a
url-hash range -- the natural unit for crawl-archive backfills where
the input file list is the work queue. Trade-off vs the standard
path: output files are input-clustered, not url-hash-clustered
(re-state with a url-hash repartition downstream if a keyed layout is
needed).
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..operators.parse import _parse_arrow_batches

LINEAGE_SCHEMA = StructType(
    [
        StructField("partition_id", IntegerType()),
        StructField("doc_count", LongType()),
        StructField("byte_count", LongType()),
        StructField("parse_error_count", LongType()),
        StructField("out_bytes", LongType()),
        StructField("wall_ms", LongType()),
    ]
)


def part_file_name(pid: int) -> str:
    """Deterministic per-partition output name -- the single source of
    truth shared by the task writer and the driver's manifest commit
    (a retried/speculative task overwrites the same name atomically)."""
    return f"part-{pid:05d}.parquet"


class _FusedPartition(InputPartition):
    def __init__(self, pid: int, paths: list[str]):
        self.pid = pid
        self.paths = paths


class FusedExtractReader(DataSourceReader):
    def __init__(self, options: dict):
        self.input = options.get("input")
        self.output = options.get("output")
        if not self.input or not self.output:
            raise ValueError("xps_fused_extract requires input and output")
        self.slice_id = int(options.get("slice_id", "0"))
        self.n_slices = int(options.get("n_slices", "1"))
        self.num_partitions = int(options.get("num_partitions", "0"))
        self.batch_rows = int(options.get("batch_rows", "256"))

    def partitions(self):
        from .listing import group_round_robin, list_parquet_files

        files = list_parquet_files(self.input)
        mine = files[self.slice_id :: self.n_slices]
        if not mine:
            # n_slices > file count: this slice has no input. One empty
            # partition yields a zero-count lineage row so the slice
            # still commits (empty) and resume proceeds past it.
            return [_FusedPartition(0, [])]
        return [
            _FusedPartition(i, group)
            for i, group in enumerate(group_round_robin(mine, self.num_partitions))
        ]

    def read(self, partition: _FusedPartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        t0 = time.monotonic()
        out_final = os.path.join(self.output, part_file_name(partition.pid))
        out_tmp = out_final + f".tmp-{uuid.uuid4().hex}"
        os.makedirs(self.output, exist_ok=True)
        writer: pq.ParquetWriter | None = None
        docs = in_bytes = errors = 0
        finalized = False
        try:
            for path in partition.paths:
                pf = pq.ParquetFile(path)
                for rb in _parse_arrow_batches(
                    pf.iter_batches(
                        batch_size=self.batch_rows, columns=["url", "html"]
                    )
                ):
                    if rb.num_rows == 0:
                        continue
                    # provenance column, same as the standard path's
                    # spark_partition_id() -- read_extracted() serves both
                    rb = rb.append_column(
                        "partition_id",
                        pa.array([partition.pid] * rb.num_rows, pa.int32()),
                    )
                    if writer is None:
                        writer = pq.ParquetWriter(
                            out_tmp, rb.schema, compression="snappy"
                        )
                    writer.write_batch(rb)
                    docs += rb.num_rows
                    in_bytes += pa.compute.sum(
                        rb.column("html_bytes")
                    ).as_py()
                    errors += rb.num_rows - pa.compute.sum(
                        pa.compute.cast(rb.column("parse_ok"), pa.int64())
                    ).as_py()
            # success-path finalization stays INSIDE the try: the footer
            # flush in close() and the final rename can themselves raise
            # (full disk), and only the except block below removes the
            # tmp -- a finally-raised exception would skip it and leak
            # the finalized tmp parquet forever
            if writer is not None:
                writer.close()
                writer = None
                os.replace(out_tmp, out_final)  # idempotent under retry
                finalized = True
        except BaseException:
            # a failed attempt must not leave a tmp parquet behind: a
            # stray *.parquet* file would otherwise sit in the slice
            # dir forever (readers only see manifest-listed files, but
            # disk still leaks). close() itself can raise again --
            # suppress it so the tmp removal always runs and the
            # ORIGINAL exception propagates.
            if writer is not None:
                try:
                    writer.close()
                except Exception:
                    pass
                writer = None
            if os.path.exists(out_tmp):
                os.remove(out_tmp)
            raise
        if not finalized:
            # zero-row input split: no output file, zero-count lineage
            # (the driver commits the slice with exactly the files the
            # lineage rows report -- possibly none)
            yield (partition.pid, 0, 0, 0, 0,
                   int((time.monotonic() - t0) * 1000))
            return
        wall_ms = int((time.monotonic() - t0) * 1000)
        yield (
            partition.pid,
            docs,
            in_bytes,
            errors,
            os.path.getsize(out_final),
            wall_ms,
        )


class FusedExtractDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "xps_fused_extract"

    def schema(self):
        return LINEAGE_SCHEMA

    def reader(self, schema) -> FusedExtractReader:
        return FusedExtractReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(FusedExtractDataSource)


def fused_extract_slice(
    spark,
    input_path: str,
    output_slice_dir: str,
    slice_id: int = 0,
    n_slices: int = 1,
    num_partitions: int | None = None,
):
    """One slice's fused scan: returns the lineage DataFrame (running
    an action on it performs the extraction and writes the output
    parquet as a side effect of the scan -- the foreach-style job
    expressed as a tiny-result scan)."""
    register(spark)
    reader = (
        spark.read.format("xps_fused_extract")
        .option("input", input_path)
        .option("output", output_slice_dir)
        .option("slice_id", str(slice_id))
        .option("n_slices", str(n_slices))
    )
    if num_partitions:
        reader = reader.option("num_partitions", str(num_partitions))
    return reader.load()
