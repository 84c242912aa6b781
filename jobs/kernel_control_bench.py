#!/usr/bin/env python3
"""No-Spark control for the scaling evidence: the bare parse kernel in
K multiprocessing workers, process affinity pinned to K cores.

Separates ENGINE scaling from HOST ceilings: if the bare kernel (no
JVM, no Arrow IPC, no scheduler) stops scaling at some K on this box,
anything the Spark pipeline loses beyond that at the same K is the
host's shared memory/IO path, not pipeline structure -- a real cluster
adds those resources with every executor.

Usage:
  python jobs/kernel_control_bench.py                 # K in 1,2,8,32
  python jobs/kernel_control_bench.py --cores 2,8     # subset
  XPS_ACCEL=0 python jobs/kernel_control_bench.py     # pure-python kernel

Writes BENCH_KERNEL_CONTROL.json.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "12000"))
CORPUS = f"/tmp/xps_bench_corpus_{N_DOCS}"


def _load_htmls() -> list[bytes]:
    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(CORPUS, f) for f in os.listdir(CORPUS) if f.endswith(".parquet")
    )
    if not files:
        raise FileNotFoundError(
            f"{CORPUS} missing -- generate with jobs/scaling_bench.py first"
        )
    out: list[bytes] = []
    for f in files:
        for rb in pq.ParquetFile(f).iter_batches(batch_size=1024, columns=["html"]):
            out.extend(v.as_py() for v in rb.column(0))
    return out


def _worker(htmls: list[bytes], lo: int, hi: int, repeats: int, q: mp.Queue) -> None:
    from xhtml_parser_spark.kernel.parser import parse_texts

    n = 0
    for _ in range(repeats):
        for j in range(lo, hi):
            parse_texts(htmls[j])
            n += 1
    q.put(n)


def measure(htmls: list[bytes], cores: int, target_bytes: int) -> dict:
    total = sum(len(h) for h in htmls)
    repeats = max(1, target_bytes // total)
    os.sched_setaffinity(0, set(range(cores)))  # children inherit
    n = len(htmls)
    step = (n + cores - 1) // cores
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(
            target=_worker, args=(htmls, i * step, min(n, (i + 1) * step), repeats, q)
        )
        for i in range(cores)
    ]
    t0 = time.monotonic()
    for p in procs:
        p.start()
    done = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    wall = time.monotonic() - t0
    os.sched_setaffinity(0, set(range(os.cpu_count() or cores)))
    mb = total * repeats / 1e6
    return {
        "cores": cores,
        "repeats": repeats,
        "docs_parsed": done,
        "wall_sec": round(wall, 3),
        "mb_per_sec": round(mb / wall, 1),
        "mb_per_sec_per_core": round(mb / wall / cores, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", default="1,2,8,32")
    ap.add_argument(
        "--target-mb",
        type=int,
        default=None,
        help="bytes to parse per measurement (default: 300 MB/core python, "
        "2 GB/core C kernel)",
    )
    args = ap.parse_args()

    from xhtml_parser_spark.kernel.parser import _get_cparser

    accel = _get_cparser() is not None
    htmls = _load_htmls()
    per_core_mb = args.target_mb or (2000 if accel else 300)
    results = []
    for c in (int(x) for x in args.cores.split(",")):
        r = measure(htmls, c, per_core_mb * 1_000_000 * c)
        r["kernel"] = "c" if accel else "pure_python"
        print(json.dumps(r))
        results.append(r)
    base = results[0]
    summary = {
        "metric": "bare_kernel_multiprocessing_scaling",
        "kernel": "c" if accel else "pure_python",
        "corpus_docs": N_DOCS,
        "points": results,
        "per_core_efficiency_vs_smallest": {
            str(r["cores"]): round(
                r["mb_per_sec_per_core"] / base["mb_per_sec_per_core"], 3
            )
            for r in results
        },
    }
    out = os.path.join(
        REPO,
        "BENCH_KERNEL_CONTROL.json" if accel else "BENCH_KERNEL_CONTROL_PY.json",
    )
    with open(out, "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
