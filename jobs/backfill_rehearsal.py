#!/usr/bin/env python3
"""Backfill rehearsal: kill -9 a live extraction mid-run, resume, and
prove exactly-once output at scale.

The unit tests simulate a kill with --max-slices; this harness does
the real thing: it launches jobs/extract.py as a subprocess over a
multi-GB corpus, SIGKILLs it while slices are mid-flight, re-runs to
completion, and then audits the committed table:

  * row count == distinct url count == corpus size (no loss, no dups)
  * lineage doc/byte totals reconcile with the committed data
  * manifests from both run ids are present (the resume really resumed)

Usage:
  python jobs/backfill_rehearsal.py [--docs 600000] [--kill-after 20]
                                    [--fused] [--slices 8]
                                    [--input-format warc]

--input-format warc rehearses the crawl-delivery path: the corpus is
packaged as .warc.gz shards (one gzip member per record), slices are
file groups read through the FUSED warc scan+parse datasource, and the
same kill -9 / resume / exactly-once audit applies.

Writes BENCH_REHEARSAL.json (keyed standard / fused / warc).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=600000)
    ap.add_argument("--kill-after", type=float, default=20.0)
    ap.add_argument("--slices", type=int, default=8)
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--input-format", default="parquet",
                    choices=["parquet", "warc"])
    ap.add_argument("--out", default="/tmp/xps_rehearsal")
    args = ap.parse_args()
    if args.fused and args.input_format == "warc":
        raise SystemExit("--fused supports parquet input only")

    from xhtml_parser_spark.session import get_spark
    from xhtml_parser_spark.sources import synthesize_pages

    corpus = f"/tmp/xps_bench_corpus_{args.docs}"
    spark = get_spark("rehearsal-prep")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        synthesize_pages(
            spark, args.docs, max_b=1 << 17, partitions=256
        ).write.mode("overwrite").parquet(corpus)
    total_bytes = (
        spark.read.parquet(corpus).selectExpr("sum(length(html)) b")
        .collect()[0]["b"]
    )
    input_path = corpus
    if args.input_format == "warc":
        warc_dir = f"/tmp/xps_bench_warc_{args.docs}"
        if not os.path.exists(os.path.join(warc_dir, "_SUCCESS")):
            shutil.rmtree(warc_dir, ignore_errors=True)
            from xhtml_parser_spark.sources.warc import write_warc_shards

            write_warc_shards(spark.read.parquet(corpus), warc_dir)
            open(os.path.join(warc_dir, "_SUCCESS"), "w").close()
        input_path = warc_dir
    spark.stop()

    shutil.rmtree(args.out, ignore_errors=True)
    cmd = [
        sys.executable, os.path.join(REPO, "jobs", "extract.py"),
        "--input", input_path, "--output", args.out,
        "--slices", str(args.slices),
    ]
    if args.fused:
        cmd.append("--fused")
    if args.input_format == "warc":
        cmd += ["--input-format", "warc"]

    # run 1: kill -9 mid-flight
    p = subprocess.Popen(
        cmd + ["--run-id", "rehearsal-a"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, cwd=REPO,
    )
    time.sleep(args.kill_after)
    p.send_signal(signal.SIGKILL)
    p.wait()
    killed_at = args.kill_after

    # run 2: resume to completion, timed
    t0 = time.monotonic()
    out = subprocess.run(
        cmd + ["--run-id", "rehearsal-b"],
        capture_output=True, text=True, cwd=REPO, check=True,
    )
    resume_wall = time.monotonic() - t0
    summary = json.loads(out.stdout.strip().splitlines()[-1])

    # audit
    spark = get_spark("rehearsal-audit")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from xhtml_parser_spark.plans.extract_job import (
        read_extracted,
        read_lineage,
    )
    from xhtml_parser_spark.sources.table import SnapshotTable

    ext = read_extracted(spark, args.out)
    n_rows = ext.count()
    n_urls = ext.select("url").distinct().count()
    lin = read_lineage(spark, args.out)
    tot = lin.agg(
        F.sum("doc_count").alias("d"), F.sum("byte_count").alias("b")
    ).collect()[0]
    runs = sorted(
        {m["run_id"] for m in SnapshotTable(args.out).manifests()}
    )
    data_bytes = ext.agg(F.sum("html_bytes").alias("b")).collect()[0]["b"]
    spark.stop()

    ok = (
        n_rows == n_urls == args.docs
        and tot["d"] == args.docs
        and tot["b"] == data_bytes == total_bytes
    )
    mode = (
        "warc" if args.input_format == "warc"
        else ("fused" if args.fused else "standard")
    )
    report = {
        "metric": "kill9_resume_exactly_once",
        "mode": mode,
        "docs": args.docs,
        "corpus_bytes": int(total_bytes),
        "killed_after_sec": killed_at,
        "slices_committed_before_kill": summary["skipped_committed"],
        "resume_wall_sec": round(resume_wall, 1),
        "rows": n_rows,
        "distinct_urls": n_urls,
        "lineage_doc_total": tot["d"],
        "lineage_byte_total": int(tot["b"]),
        "contributing_run_ids": runs,
        "exactly_once": ok,
    }
    # one report file, keyed by mode, so fused and standard runs
    # accumulate instead of overwriting each other
    path = os.path.join(REPO, "BENCH_REHEARSAL.json")
    existing = {}
    if os.path.exists(path):
        try:
            existing = json.load(open(path))
        except Exception:
            existing = {}
    if "metric" in existing and ("fused" not in existing and "standard" not in existing):
        existing = {}
    existing["metric"] = "kill9_resume_exactly_once"
    existing[report["mode"]] = {k: v for k, v in report.items() if k not in ("metric", "mode")}
    with open(path, "w") as fh:
        json.dump(existing, fh, indent=2)
    print(json.dumps(report))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
