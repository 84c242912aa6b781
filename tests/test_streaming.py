"""Structured Streaming tests: incremental exactly-once extraction and
watermarked windowed aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xhtml_parser_spark.sources import synthesize_pages
from xhtml_parser_spark.sources.synth import PAGES_SCHEMA
from xhtml_parser_spark.streaming import build_extract_stream, host_rate_stream


def _run_available_now(writer):
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(300)
    assert q.lastProgress is None or q.exception() is None


def test_incremental_extract_stream(spark, tmp_path):
    src = str(tmp_path / "pages_stream")
    out = str(tmp_path / "extracted_stream")
    ckpt = str(tmp_path / "ckpt")

    synthesize_pages(spark, 60, max_b=4096).write.mode("append").parquet(src)
    _run_available_now(build_extract_stream(spark, src, out, ckpt))
    n1 = spark.read.parquet(out).count()
    assert n1 == 60

    # drop more files: only the new batch is processed (checkpoint log)
    df2 = synthesize_pages(spark, 100, max_b=4096).where(F.col("url").isNotNull())
    df2.limit(100).write.mode("append").parquet(src)
    _run_available_now(build_extract_stream(spark, src, out, ckpt))
    ext = spark.read.parquet(out)
    assert ext.count() == n1 + 100
    # each url appears exactly as many times as it was dropped (60-doc
    # batch is a prefix of the 100-doc batch ids -> those urls twice)
    dup = ext.groupBy("url").count().where(F.col("count") > 2).count()
    assert dup == 0


def test_host_rate_stream_watermark(spark, tmp_path):
    src = str(tmp_path / "pages_rate")
    out = str(tmp_path / "rates")
    ckpt = str(tmp_path / "ckpt_rate")
    synthesize_pages(spark, 120, max_b=4096).write.parquet(src)

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
    # zero watermark so closed windows emit in append mode (the corpus
    # spans 120 seconds; a long watermark would withhold every window)
    rates = host_rate_stream(stream, window="1 minute", watermark="0 seconds")
    q = (
        rates.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    # warc_ts = epoch + doc_id seconds -> 120 docs span exactly 2 windows
    assert got.count() >= 1
    total = got.agg(F.sum("doc_count")).collect()[0][0]
    assert total <= 120  # rows beyond the final watermark may be withheld


def test_host_rate_stream_sliding_overlap(spark, tmp_path):
    """slide < window produces overlapping windows: each row lands in
    window/slide windows, so summed doc_count doubles vs tumbling."""
    src = str(tmp_path / "pages_slide")
    out = str(tmp_path / "rates_slide")
    ckpt = str(tmp_path / "ckpt_slide")
    synthesize_pages(spark, 120, max_b=4096).write.parquet(src)

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
    rates = host_rate_stream(
        stream, window="1 minute", watermark="0 seconds", slide="30 seconds"
    )
    q = (
        rates.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    # overlapping windows: every emitted window is 60s wide but starts
    # every 30s, so the same doc contributes to 2 windows
    w = got.select("window.start", "window.end").limit(1).collect()
    if w:  # at least one closed window emitted
        assert (w[0]["end"] - w[0]["start"]).total_seconds() == 60
    total = got.agg(F.sum("doc_count")).collect()[0][0] or 0
    assert total <= 240  # each of 120 docs in at most 2 windows
