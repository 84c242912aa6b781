#!/usr/bin/env python3
"""Curation rehearsal: kill -9 a live stage-checkpointed curation run
mid-stage, resume, and prove the result equals a fresh single-shot run.

The unit tests simulate a kill with --max-stages; this harness does
the real thing: it launches jobs/curate.py as a subprocess over a
large synthesized documents corpus, SIGKILLs it while a stage is
mid-write, re-runs to completion, and audits:

  * resumed metrics == fresh-run metrics, stage by stage
  * resumed keep list == fresh keep list (exact doc_id sets)
  * at least one stage manifest carries the first run id (the resume
    genuinely skipped committed work)
  * no stage was computed twice (manifest run ids partition cleanly)

Usage:
  python jobs/curate_rehearsal.py [--docs 400000] [--kill-after 12]

Writes BENCH_CURATE_REHEARSAL.json.
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


def _launch(inp: str, out: str, run_id: str) -> subprocess.Popen:
    return subprocess.Popen(
        [
            sys.executable, os.path.join(REPO, "jobs", "curate.py"),
            "--input", inp, "--output", out, "--run-id", run_id,
            "--write-docs", "--k-host", "2000",
        ],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400000)
    ap.add_argument("--kill-after", type=float, default=25.0,
                    help="manifest-poll budget multiplier base (s)")
    ap.add_argument("--kill-grace", type=float, default=2.0,
                    help="seconds past the first stage commit to kill")
    ap.add_argument("--out", default="/tmp/xps_curate_rehearsal")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from xhtml_parser_spark.session import get_spark

    inp = os.path.join(args.out, "docs")
    killed_dir = os.path.join(args.out, "curated")
    fresh_dir = os.path.join(args.out, "curated_fresh")
    shutil.rmtree(args.out, ignore_errors=True)
    os.makedirs(args.out, exist_ok=True)

    spark = get_spark("curate-rehearsal-prep")
    spark.sparkContext.setLogLevel("ERROR")
    # Zipf-ish host skew + lang/quality/dup variety so every stage drops
    n = args.docs
    did = F.col("id")
    # host bucket from a squared term so host sizes are skewed
    host = F.concat(F.lit("h"), ((did * did) % 97).cast("string"))
    body = F.concat(
        F.lit("the and of "),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda i: F.concat(
                    F.lit("w"), ((did * 41 + i) % 99991).cast("string")
                ),
            ),
            " ",
        ),
    )
    text = (
        F.when(did % 13 == 0, F.lit("the and of short"))
        .when(
            did % 11 == 0,
            F.concat(F.lit("the and of "), F.repeat(F.lit("rep "), 60)),
        )
        .when(
            did % 17 == 0,
            F.lit("the and of one duplicate body shared by every seventeenth "
                  "document in the rehearsal corpus with enough words to pass "
                  "the quality gate one two three four five six seven eight "
                  "nine ten eleven twelve thirteen fourteen fifteen sixteen"),
        )
        .otherwise(body)
    )
    spark.range(n).select(
        did.alias("doc_id"), text.alias("text"), F.lit("en").alias("lang"),
        host.alias("source"),
    ).write.mode("overwrite").parquet(inp)
    spark.stop()
    t_prep = time.time()

    # run 1: kill -9 mid-flight -- adaptively, AFTER the first stage
    # manifest lands (so the resume genuinely has committed work to
    # skip) and a grace period into the downstream stages
    p = _launch(inp, killed_dir, "r1")
    first_manifest = os.path.join(
        killed_dir, "stage=signals", "_commits", "slice-0.json"
    )
    deadline = time.time() + args.kill_after * 10
    while time.time() < deadline and not os.path.exists(first_manifest):
        if p.poll() is not None:
            raise SystemExit("run 1 finished before the kill (corpus too small)")
        time.sleep(0.2)
    assert os.path.exists(first_manifest), "signals never committed"
    time.sleep(args.kill_grace)
    p.send_signal(signal.SIGKILL)
    p.wait()

    # run 2: resume to completion
    t0 = time.time()
    p2 = _launch(inp, killed_dir, "r2")
    out2, _ = p2.communicate()
    resume_wall = time.time() - t0
    assert p2.returncode == 0, "resume run failed"
    resumed = json.loads(out2.strip().splitlines()[-1])

    # fresh single-shot reference
    t0 = time.time()
    p3 = _launch(inp, fresh_dir, "rf")
    out3, _ = p3.communicate()
    fresh_wall = time.time() - t0
    assert p3.returncode == 0, "fresh run failed"
    fresh = json.loads(out3.strip().splitlines()[-1])

    spark = get_spark("curate-rehearsal-audit")
    spark.sparkContext.setLogLevel("ERROR")
    from xhtml_parser_spark.plans.curate_job import read_curated
    from xhtml_parser_spark.sources.table import SnapshotTable

    a = read_curated(spark, killed_dir)
    b = read_curated(spark, fresh_dir)
    same_keep = (
        a.select("doc_id").exceptAll(b.select("doc_id")).count() == 0
        and b.select("doc_id").exceptAll(a.select("doc_id")).count() == 0
        and a.count() == b.count()
    )
    run_ids = {}
    for d in sorted(os.listdir(killed_dir)):
        if d.startswith("stage="):
            t = SnapshotTable(os.path.join(killed_dir, d))
            ms = t.manifests()
            if ms:
                run_ids[d] = ms[0]["run_id"]
    spark.stop()

    report = {
        "docs": n,
        "kill_after_s": args.kill_after,
        "metrics_match": resumed["metrics"] == fresh["metrics"],
        "keep_list_match": same_keep,
        "resumed_skipped": resumed["skipped"],
        "resumed_computed": resumed["computed"],
        "stage_run_ids": run_ids,
        "r1_survived_stages": sorted(
            k for k, v in run_ids.items() if v == "r1"
        ),
        "resume_wall_s": round(resume_wall, 2),
        "fresh_wall_s": round(fresh_wall, 2),
        "metrics": resumed["metrics"],
        "prep_unix": t_prep,
    }
    ok = (
        report["metrics_match"]
        and report["keep_list_match"]
        and len(report["r1_survived_stages"]) >= 1
        and set(resumed["skipped"]).isdisjoint(resumed["computed"])
    )
    report["pass"] = bool(ok)
    with open(os.path.join(REPO, "BENCH_CURATE_REHEARSAL.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
