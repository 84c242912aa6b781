"""Stage-checkpointed curation job: resume semantics, parameter
guards, and count equality with the curation_funnel operator."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from xhtml_parser_spark.operators.corpus import curation_funnel
from xhtml_parser_spark.plans.curate_job import (
    read_curated,
    read_curation_metrics,
    run_curation,
)
from xhtml_parser_spark.sources.table import SnapshotTable


def _corpus(spark):
    # spread over langs/hosts so every funnel stage drops something:
    # 'the and of' matches en; short docs fail quality; 'rep rep ...'
    # fails repetition; duplicate texts exercise dedup; one hot host
    # exercises host_cap
    rows = []
    for i in range(120):
        host = f"h{i % 4}" if i % 10 else "hot"
        body = " ".join(f"w{j}x{i % 17}" for j in range(40))
        text = f"the and of {body}"
        if i % 13 == 0:
            text = "the and of short"                # fails min_words
        if i % 11 == 0:
            text = "the and of " + "rep " * 40       # fails repetition
        if i % 7 == 0:
            text = "le et les " + body               # recorded lang mismatch
        if i % 17 == 0:
            text = "the and of duplicate body " + " ".join(
                f"d{j}" for j in range(40)
            )                                        # corpus-wide duplicate
        rows.append((i, text, "en", host))
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string, source string")


def test_run_curation_matches_funnel_operator(spark, tmp_path):
    docs = _corpus(spark)
    inp = os.path.join(str(tmp_path), "docs")
    docs.write.parquet(inp)
    out = os.path.join(str(tmp_path), "curated")
    summary = run_curation(
        spark, inp, out, "r1", min_words=30, rep_mult=8, k_host=6,
        sample_num=9, sample_den=10, write_docs=True,
    )
    assert summary["complete"]
    assert summary["skipped"] == []
    want = {
        r["stage"]: r["rows_kept"]
        for r in curation_funnel(docs, min_words=30, rep_mult=8, k_host=6,
                                 sample_num=9, sample_den=10).collect()
    }
    assert summary["metrics"] == want
    # final keep list row count equals the sample stage metric
    assert read_curated(spark, out).count() == want["sample"]
    # kept_docs are real input rows for exactly the keep list
    kept = SnapshotTable(os.path.join(out, "stage=kept_docs")).read(spark)
    assert kept.count() == want["sample"]
    assert set(kept.columns) == set(docs.columns)
    keep_ids = {r["doc_id"] for r in read_curated(spark, out).collect()}
    assert {r["doc_id"] for r in kept.collect()} == keep_ids


def test_run_curation_resume_after_kill(spark, tmp_path):
    docs = _corpus(spark)
    inp = os.path.join(str(tmp_path), "docs")
    docs.write.parquet(inp)
    out = os.path.join(str(tmp_path), "curated")
    ref = os.path.join(str(tmp_path), "ref")

    first = run_curation(spark, inp, out, "r1", max_stages=2)
    assert first["computed"] == ["signals", "filtered"]
    assert not first["complete"]
    second = run_curation(spark, inp, out, "r2")
    assert second["skipped"] == ["signals", "filtered"]
    assert second["computed"] == ["dedup", "host_cap", "sample", "metrics"]
    assert second["complete"]
    # early stages keep their original run_id: they were NOT recomputed
    sig = SnapshotTable(os.path.join(out, "stage=signals"))
    assert sig.manifests()[0]["run_id"] == "r1"
    # resumed result equals a fresh single-shot run
    fresh = run_curation(spark, inp, ref, "rf")
    assert second["metrics"] == fresh["metrics"]
    a = sorted(r["doc_id"] for r in read_curated(spark, out).collect())
    b = sorted(r["doc_id"] for r in read_curated(spark, ref).collect())
    assert a == b
    got = {r["stage"]: r["rows_kept"]
           for r in read_curation_metrics(spark, out).collect()}
    assert got == second["metrics"]


def test_run_curation_refuses_param_mismatch(spark, tmp_path):
    docs = _corpus(spark)
    inp = os.path.join(str(tmp_path), "docs")
    docs.write.parquet(inp)
    out = os.path.join(str(tmp_path), "curated")
    run_curation(spark, inp, out, "r1", max_stages=1)
    with pytest.raises(ValueError, match="params"):
        run_curation(spark, inp, out, "r2", min_words=10)


def test_curate_cli_roundtrip(spark, tmp_path):
    """The spark-submit entry point end-to-end in-process (argparse +
    JSON summary), without spawning a JVM-per-test."""
    import subprocess
    import sys

    docs = _corpus(spark)
    inp = os.path.join(str(tmp_path), "docs")
    docs.write.parquet(inp)
    out = os.path.join(str(tmp_path), "curated")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "curate.py"),
         "--input", inp, "--output", out, "--run-id", "cli1",
         "--master", "local[4]"],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["complete"] and summary["metrics"]["input"] == 120


def test_run_curation_refuses_changed_input(spark, tmp_path):
    docs = _corpus(spark)
    a = os.path.join(str(tmp_path), "docsA")
    b = os.path.join(str(tmp_path), "docsB")
    docs.write.parquet(a)
    docs.where(F.col("doc_id") < 60).write.parquet(b)
    out = os.path.join(str(tmp_path), "curated")
    run_curation(spark, a, out, "r1", max_stages=1)
    with pytest.raises(ValueError, match="params"):
        run_curation(spark, b, out, "r2")


def test_input_digest_distinguishes_object_store_paths():
    """Non-local paths (os.stat raises) must still produce DISTINCT
    digests per path -- a shared constant would let a resume against a
    completely different s3:// input slip past the changed-input guard."""
    from xhtml_parser_spark.plans.curate_job import _input_digest

    a = _input_digest("s3://bucket-a/corpus")
    b = _input_digest("s3://bucket-b/corpus")
    assert a != b
    assert _input_digest("s3://bucket-a/corpus") == a  # stable
