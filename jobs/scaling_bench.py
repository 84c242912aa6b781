#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (north_rule: efficiency >= 0.8).

No real cluster exists in the sandbox, so per the task instruction the
same job runs at two parallelism levels on the SAME input:
local[N] stands in for N executors, local[4N] for 4N. Efficiency
E = (T_N * N) / (T_4N * 4N).

Each measurement runs in its own subprocess (a JVM cannot change its
local[...] master after startup). Results land in BENCH_SCALING.json
and are meant to be copied into BASELINE.md.

Usage:
  python jobs/scaling_bench.py              # full comparison (N=8 vs 32)
  python jobs/scaling_bench.py --cores 8    # one measurement (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "12000"))
CORPUS = f"/tmp/xps_bench_corpus_{N_DOCS}"
RUNS = 3


def measure(cores: int) -> dict:
    from xhtml_parser_spark.session import get_spark

    spark = get_spark(f"xps-scaling-{cores}", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    entry._ensure_pkg(spark)
    from xhtml_parser_spark.operators import parse_pages
    from xhtml_parser_spark.sources import synthesize_pages

    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        synthesize_pages(spark, N_DOCS, max_b=1 << 17, partitions=128).write.mode(
            "overwrite"
        ).parquet(CORPUS)

    total_bytes = (
        spark.read.parquet(CORPUS).selectExpr("sum(length(html)) b").collect()[0]["b"]
    )
    # identical work at both sizes; split so each core sees >= 5 task
    # waves (doc sizes are log-uniform, so many small waves keep the
    # final-wave straggler tail short)
    split = max(2 * 1024 * 1024, int(total_bytes / (5 * cores)))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
    pages = spark.read.parquet(CORPUS)

    def once() -> float:
        t0 = time.monotonic()
        parse_pages(pages).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    once()  # warm up
    t = min(once() for _ in range(RUNS))
    spark.stop()
    return {
        "cores": cores,
        "wall_sec": round(t, 3),
        "docs_per_sec": round(N_DOCS / t, 1),
        "mb_per_sec": round(total_bytes / t / 1e6, 1),
        "bytes": int(total_bytes),
        "docs": N_DOCS,
        "runs": RUNS,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--n", type=int, default=8, help="small cluster size N")
    args = ap.parse_args()

    if args.cores:
        print(json.dumps(measure(args.cores)))
        return

    results = {}
    for c in (args.n, 4 * args.n):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cores", str(c)],
            capture_output=True,
            text=True,
            cwd=REPO,
            check=True,
        )
        results[c] = json.loads(out.stdout.strip().splitlines()[-1])

    n, n4 = args.n, 4 * args.n
    eff = (results[n]["wall_sec"] * n) / (results[n4]["wall_sec"] * n4)
    summary = {
        "metric": "scaling_efficiency_N_to_4N",
        "N": n,
        "4N": n4,
        "T_N_sec": results[n]["wall_sec"],
        "T_4N_sec": results[n4]["wall_sec"],
        "docs_per_sec_N": results[n]["docs_per_sec"],
        "docs_per_sec_4N": results[n4]["docs_per_sec"],
        "mb_per_sec_N": results[n]["mb_per_sec"],
        "mb_per_sec_4N": results[n4]["mb_per_sec"],
        "efficiency": round(eff, 3),
        "gate": eff >= 0.8,
        "corpus_docs": results[n]["docs"],
        "corpus_bytes": results[n]["bytes"],
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
