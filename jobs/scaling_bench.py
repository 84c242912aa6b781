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


def _pinned(cores: int) -> list[str]:
    """CPU-affinity prefix so 'local[N]' really means an N-core box.

    Without pinning, a local[8] run schedules its 8 JVM task threads
    AND 8 python workers across all 32 physical cores -- the "N
    executor" measurement secretly uses ~2N cores and the N->4N
    efficiency is understated (the 4N run has no spare cores to
    borrow). taskset confines the whole process tree (JVM + python
    workers) to exactly N cores, which is what one executor with N
    cores gets on a real cluster."""
    import shutil

    if shutil.which("taskset"):
        return ["taskset", "-c", f"0-{cores - 1}"]
    return []


def measure(cores: int, path: str = "mapinarrow", n_docs: int | None = None) -> dict:
    from xhtml_parser_spark.session import get_spark

    n_docs = n_docs or N_DOCS
    corpus = f"/tmp/xps_bench_corpus_{n_docs}"
    spark = get_spark(f"xps-scaling-{cores}", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    entry._ensure_pkg(spark)
    from xhtml_parser_spark.operators import parse_pages
    from xhtml_parser_spark.sources import synthesize_pages

    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        synthesize_pages(spark, n_docs, max_b=1 << 17, partitions=128).write.mode(
            "overwrite"
        ).parquet(corpus)

    total_bytes = (
        spark.read.parquet(corpus).selectExpr("sum(length(html)) b").collect()[0]["b"]
    )
    if path == "fused":
        # full fused job: read+parse+WRITE parquet inside the task; the
        # JVM sees one lineage row per partition. This is the only mode
        # whose wall includes a real output sink.
        import shutil

        from xhtml_parser_spark.sources.fused_extract import fused_extract_slice

        outdir = f"/tmp/xps_fused_bench_{cores}"

        def df_action() -> None:
            shutil.rmtree(outdir, ignore_errors=True)
            fused_extract_slice(
                spark, corpus, outdir, 0, 1, num_partitions=4 * cores
            ).collect()

        df = None
    elif path == "datasource":
        # fused scan+parse python data source, files grouped into ~4
        # task waves per core (python-datasource task launch is not free)
        from xhtml_parser_spark.sources.parse_datasource import read_parsed

        df = read_parsed(spark, corpus, num_partitions=4 * cores)
    else:
        # identical work at both sizes; split COMPRESSED size (what
        # maxPartitionBytes sees) so each core gets >= 4 task waves
        disk_bytes = sum(
            os.path.getsize(os.path.join(corpus, f))
            for f in os.listdir(corpus)
            if f.endswith(".parquet")
        )
        split = max(1 * 1024 * 1024, int(disk_bytes / (4 * cores)))
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
        df = parse_pages(spark.read.parquet(corpus))

    def once() -> float:
        t0 = time.monotonic()
        if df is None:
            df_action()
        else:
            df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    once()  # warm up
    t = min(once() for _ in range(RUNS))
    spark.stop()
    return {
        "cores": cores,
        "wall_sec": round(t, 3),
        "docs_per_sec": round(n_docs / t, 1),
        "mb_per_sec": round(total_bytes / t / 1e6, 1),
        "bytes": int(total_bytes),
        "docs": n_docs,
        "runs": RUNS,
    }


def measure_weak(n: int, docs_small: int, path: str) -> dict:
    """Cluster-faithful weak scaling: N cores on X docs vs 4N cores on
    4X docs -- per-core work is constant, so ideal wall-clock is EQUAL
    at both sizes and E_weak = T_N / T_4N (gate >= 0.8). This is the
    truest sandbox stand-in for adding executors to a cluster: each
    added "executor" (core) brings its own slice of input, exactly how
    a crawl-extraction backfill grows. Runs in subprocesses (a JVM
    cannot change local[...] after startup)."""
    sizes = {n: docs_small, 4 * n: 4 * docs_small}
    results = {}
    for c, nd in sizes.items():
        out = subprocess.run(
            _pinned(c) + [
                sys.executable, os.path.abspath(__file__),
                "--cores", str(c), "--path", path, "--docs", str(nd),
            ],
            capture_output=True, text=True, cwd=REPO, check=True,
            env=dict(os.environ),
        )
        results[c] = json.loads(out.stdout.strip().splitlines()[-1])
    t_n, t_4n = results[n]["wall_sec"], results[4 * n]["wall_sec"]
    return {
        "metric": "weak_scaling_N_to_4N_constant_per_core_input",
        "path": path,
        "N": n,
        "4N": 4 * n,
        "docs_N": docs_small,
        "docs_4N": 4 * docs_small,
        "T_N_sec": t_n,
        "T_4N_sec": t_4n,
        "mb_per_sec_N": results[n]["mb_per_sec"],
        "mb_per_sec_4N": results[4 * n]["mb_per_sec"],
        "weak_efficiency": round(t_n / t_4n, 3),
        "gate": (t_n / t_4n) >= 0.8,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--n", type=int, default=8, help="small cluster size N")
    ap.add_argument("--path", default="mapinarrow", choices=["mapinarrow", "datasource", "fused"])
    ap.add_argument("--docs", type=int, default=None)
    ap.add_argument("--weak", action="store_true")
    ap.add_argument("--out", default="BENCH_SCALING.json")
    ap.add_argument(
        "--modes",
        default="pure_python,c_kernel,c_kernel_datasource",
        help="comma-separated subset of modes to run",
    )
    args = ap.parse_args()

    if args.cores:
        print(json.dumps(measure(args.cores, path=args.path, n_docs=args.docs)))
        return

    if args.weak:
        # weak scaling (constant per-core input) across the C-kernel paths
        res = {
            "mapinarrow": measure_weak(args.n, N_DOCS, "mapinarrow"),
            "datasource": measure_weak(args.n, N_DOCS, "datasource"),
            "fused": measure_weak(args.n, N_DOCS, "fused"),
        }
        with open(os.path.join(REPO, "BENCH_WEAK_SCALING.json"), "w") as fh:
            json.dump(res, fh, indent=2)
        print(json.dumps(res))
        return

    n, n4 = args.n, 4 * args.n
    summary: dict = {"metric": "scaling_efficiency_N_to_4N", "N": n, "4N": n4}
    # Three modes:
    #  * pure Python (XPS_ACCEL=0): the job is CPU-bound well below the
    #    host's data-path ceiling, so local[N] vs local[4N] emulates
    #    N vs 4N executors faithfully -> this is the pipeline-structure
    #    scaling gate.
    #  * C kernel (mapInArrow): per-core parse is ~30x faster and the
    #    single host's parquet/Arrow/memory path saturates early -- a
    #    real cluster adds those resources per executor. Transparency.
    #  * C kernel via the fused scan+parse python data source: html
    #    bytes never cross the JVM, so the per-core data path is the
    #    lightest -- the production fast path.
    known = {"pure_python", "c_kernel", "c_kernel_datasource", "c_kernel_fused"}
    wanted = set(args.modes.split(","))
    if not wanted <= known:
        raise SystemExit(f"unknown --modes {sorted(wanted - known)}; known: {sorted(known)}")
    modes = tuple(
        m
        for m in (
            ("pure_python", {"XPS_ACCEL": "0"}, "mapinarrow"),
            ("c_kernel", {}, "mapinarrow"),
            ("c_kernel_datasource", {}, "datasource"),
            ("c_kernel_fused", {}, "fused"),
        )
        if m[0] in wanted
    )
    for mode, env_extra, path in modes:
        results = {}
        for c in (n, n4):
            env = dict(os.environ, **env_extra)
            out = subprocess.run(
                _pinned(c) + [
                    sys.executable, os.path.abspath(__file__),
                    "--cores", str(c), "--path", path,
                ],
                capture_output=True,
                text=True,
                cwd=REPO,
                check=True,
                env=env,
            )
            results[c] = json.loads(out.stdout.strip().splitlines()[-1])
        eff = (results[n]["wall_sec"] * n) / (results[n4]["wall_sec"] * n4)
        summary[mode] = {
            "T_N_sec": results[n]["wall_sec"],
            "T_4N_sec": results[n4]["wall_sec"],
            "docs_per_sec_N": results[n]["docs_per_sec"],
            "docs_per_sec_4N": results[n4]["docs_per_sec"],
            "mb_per_sec_N": results[n]["mb_per_sec"],
            "mb_per_sec_4N": results[n4]["mb_per_sec"],
            "efficiency": round(eff, 3),
        }
    # the gate is the PRODUCTION path (fused read+parse+write job, else
    # the fused scan data source); the other modes are reported for
    # transparency (pure_python = fallback kernel, c_kernel = mapInArrow).
    gate_mode = modes[-1][0]
    for cand in ("c_kernel_fused", "c_kernel_datasource", "pure_python"):
        if cand in summary:
            gate_mode = cand
            break
    summary["gate_mode"] = gate_mode
    summary["efficiency"] = summary[gate_mode]["efficiency"]
    summary["gate"] = summary["efficiency"] >= 0.8
    summary["corpus_docs"] = N_DOCS
    # Regime guard (measured, BENCH.md "why 2->8"): fixed job overhead
    # is ~1.1 s, so short walls are overhead-dominated and the N->4N
    # ratio is fiction -- a default-size (12k-doc) run must never pass
    # as gate evidence. The flag is IN the JSON so a stale artifact
    # self-identifies. Thresholds: the accepted 384k-doc evidence has
    # walls >= ~13 s, the bogus default-regime runs ~1.6-9.5 s.
    min_wall = min(
        m["T_4N_sec"] for m in summary.values() if isinstance(m, dict)
    )
    if N_DOCS < 96000 or min_wall < 10.0:
        summary["regime_warning"] = (
            f"corpus_docs={N_DOCS}, shortest wall {min_wall:.1f}s: "
            "fixed overhead dominates; NOT gate evidence. Re-run with "
            "SPARK_GRAFT_SCALING_DOCS>=384000 (see BENCH.md)"
        )
        print(
            f"WARNING: {summary['regime_warning']}",
            file=sys.stderr,
        )
    with open(os.path.join(REPO, args.out), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
