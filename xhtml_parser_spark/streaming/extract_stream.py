"""Structured Streaming variant of the extraction pipeline.

The reference engine is pure per-document batch (no cross-document
state anywhere -- SURVEY.md §2 Part C), so the streaming form is the
same shuffle-free kernel over a file stream: an incremental-crawl
ingest where new parquet drops of pages are parsed exactly once,
checkpoint-resumable via the streaming commit log.

``host_rate_stream`` adds the standard late-data pattern on top:
watermarked tumbling-window crawl rates per host (useful as a live
lineage/monitoring feed; pass a slide duration to F.window for
overlapping windows if smoothed rates are needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import parse_pages
from ..sources.synth import PAGES_SCHEMA


def build_extract_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint: str,
    max_files_per_trigger: int | None = None,
):
    """readStream(pages parquet) -> parse kernel -> parquet sink.

    Exactly-once per input file via the checkpoint; re-running after a
    kill resumes from the last committed micro-batch (the streaming
    analog of the batch job's slice manifests).
    """
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_path)
    parsed = parse_pages(pages)
    return (
        parsed.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
    )


def host_rate_stream(pages_stream: DataFrame, window: str = "10 minutes",
                     watermark: str = "30 minutes",
                     slide: str | None = None) -> DataFrame:
    """Watermarked windowed crawl-rate per host (late rows beyond the
    watermark dropped; state bounded). Tumbling windows by default;
    pass ``slide`` (< window) for overlapping sliding windows when
    smoothed rates matter -- state grows by the window/slide ratio."""
    from ..functions.urls import url_host

    host = url_host(F.col("url")).alias("host")
    win = (
        F.window("warc_ts", window, slide)
        if slide
        else F.window("warc_ts", window)
    )
    return (
        pages_stream.select(host, "warc_ts", "html")
        .withWatermark("warc_ts", watermark)
        .groupBy(win, F.col("host"))
        .agg(
            F.count("*").alias("doc_count"),
            F.sum(F.length("html")).alias("byte_count"),
        )
    )
