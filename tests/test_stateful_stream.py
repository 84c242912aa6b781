"""Cross-batch stateful dedup: the applyInPandasWithState operator must
suppress urls already seen in earlier micro-batches (checkpointed
state), emitting each url exactly once across the stream's life."""

from __future__ import annotations

from pyspark.sql import functions as F

from xhtml_parser_spark.sources import synthesize_pages
from xhtml_parser_spark.sources.synth import PAGES_SCHEMA
from xhtml_parser_spark.streaming.dedup_stream import first_seen_urls


def test_first_seen_across_batches(spark, tmp_path):
    src = str(tmp_path / "pages")
    out = str(tmp_path / "seen")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
        q = (
            first_seen_urls(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # batch 1: ids 0..59
    synthesize_pages(spark, 60, max_b=4096).write.mode("append").parquet(src)
    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 == 60

    # batch 2: ids 0..99 re-delivered -> only 60..99 are new
    synthesize_pages(spark, 100, max_b=4096).write.mode("append").parquet(src)
    run_once()
    got = spark.read.parquet(out)
    assert got.count() == 100
    assert got.select("url").distinct().count() == 100
    dups = got.groupBy("url").count().where(F.col("count") > 1).count()
    assert dups == 0
