#!/usr/bin/env python3
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline: end-to-end extraction throughput (docs/s and MB/s of HTML
parsed) over a deterministic synthetic CC-style corpus written to
parquet, scan -> mapInPandas parse kernel -> noop sink. Plus wall-time
for representative operator queries at $SPARK_GRAFT_SF_DIR.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all), SPARK_GRAFT_BENCH_DOCS (override).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def _sf() -> float:
    import re

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    return float(m.group(1)) if m else 0.1


def _corpus_path(n_docs: int) -> str:
    return f"/tmp/xps_bench_corpus_{n_docs}"


def main() -> None:
    sf = _sf()
    # sampled BEFORE any work starts: a non-trivial 1-minute load here
    # means another process was competing and the walls are suspect
    load_at_start = round(os.getloadavg()[0], 2)
    from xhtml_parser_spark.session import get_spark

    spark = get_spark("xps-bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    entry._ensure_pkg(spark)

    # ---- headline: parse throughput over the synthetic corpus ----
    # sized for the C-accelerated kernel (~GB/s machine-wide): small
    # corpora are fixed-overhead-bound and understate throughput
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", max(500, int(1_200_000 * sf))))
    corpus = _corpus_path(n_docs)
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        from xhtml_parser_spark.sources import synthesize_pages

        synthesize_pages(
            spark, n_docs, max_b=1 << 17, partitions=4 * CPUS
        ).write.mode("overwrite").parquet(corpus)

    # CPU-bound parse stage: right-size input splits so every core gets
    # multiple task waves (no shuffle needed -- parse is map-side; the
    # url-hash repartition lives in the extract JOB where the output
    # layout needs it, not in front of the parse kernel)
    total_bytes = (
        spark.read.parquet(corpus).selectExpr("sum(length(html)) b").collect()[0]["b"]
    )
    # split by COMPRESSED size (what maxPartitionBytes actually sees):
    # target ~4 task waves per core
    disk_bytes = sum(
        os.path.getsize(os.path.join(corpus, f))
        for f in os.listdir(corpus)
        if f.endswith(".parquet")
    )
    split = max(1 * 1024 * 1024, int(disk_bytes / (4 * CPUS)))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
    pages = spark.read.parquet(corpus)

    from xhtml_parser_spark.operators import parse_pages

    def run_parse() -> float:
        t0 = time.monotonic()
        parse_pages(pages).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    # noise-bar protocol (round-2 verdict item #1): every parse-family
    # bench records ALL its timed runs, and the JSON carries min AND
    # spread -- one noisy driver run can no longer masquerade as a
    # regression (or hide one). Repeats via SPARK_GRAFT_PARSE_REPEATS
    # (default 3; the reconciliation protocol uses 5 on an idle host).
    repeats = int(os.environ.get("SPARK_GRAFT_PARSE_REPEATS", "3"))
    spread: dict[str, list[float]] = {}

    run_parse()  # warm up JVM + python workers
    times = [run_parse() for _ in range(repeats)]
    spread["parse_pipeline"] = [round(t, 3) for t in times]
    parse_sec = min(times)

    # python-datasource path: scan+parse fused in the worker (html
    # bytes never cross the JVM) -- the full-corpus extraction fast path
    from xhtml_parser_spark.sources.parse_datasource import read_parsed

    ds = read_parsed(spark, corpus, num_partitions=4 * CPUS)

    def run_ds() -> float:
        t0 = time.monotonic()
        ds.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    run_ds()
    ds_times = [run_ds() for _ in range(repeats)]
    spread["parse_pipeline_datasource"] = [round(t, 3) for t in ds_times]
    ds_sec = min(ds_times)

    # full fused job: read+parse+WRITE parquet inside the task (the
    # production sink path; the only number that includes a real sink)
    import shutil

    from xhtml_parser_spark.sources.fused_extract import fused_extract_slice

    fused_out = "/tmp/xps_bench_fused_out"

    def run_fused() -> float:
        shutil.rmtree(fused_out, ignore_errors=True)
        t0 = time.monotonic()
        fused_extract_slice(
            spark, corpus, fused_out, 0, 1, num_partitions=4 * CPUS
        ).collect()
        return time.monotonic() - t0

    run_fused()
    fused_times = [run_fused() for _ in range(repeats)]
    spread["parse_pipeline_fused_sink"] = [round(t, 3) for t in fused_times]
    fused_sec = min(fused_times)
    shutil.rmtree(fused_out, ignore_errors=True)

    # WARC-source path: the same corpus as .warc.gz crawl shards (one
    # gzip member per record, CC packaging), scan -> parse. Shards are
    # generated distributed ONCE and cached like the parquet corpus;
    # the timed pass includes per-record gzip decode, which is the real
    # ingest cost a crawl-delivery backfill pays.
    warc_dir = f"/tmp/xps_bench_warc_{n_docs}"
    if not os.path.exists(os.path.join(warc_dir, "_SUCCESS")):
        # a crashed prior generation (no _SUCCESS) may have left shards
        # for a DIFFERENT partition count; stale seg-*.warc.gz would be
        # re-ingested as duplicate docs, so start from an empty dir
        shutil.rmtree(warc_dir, ignore_errors=True)

        from xhtml_parser_spark.sources.warc import write_warc_shards

        write_warc_shards(pages, warc_dir)
        open(os.path.join(warc_dir, "_SUCCESS"), "w").close()

    from xhtml_parser_spark.operators import parse_pages as _pp
    from xhtml_parser_spark.sources.warc import read_parsed_warc, read_warc

    # primary warc number = the FUSED scan+parse datasource (round-3:
    # gzip decode + framing + parse inside the task, html never crosses
    # the JVM -- the production crawl-ingest path); the two-step
    # read_warc -> parse_pages walk stays as _unfused for r02 continuity
    warc_fused = read_parsed_warc(spark, warc_dir, num_partitions=4 * CPUS)
    warc_pages = read_warc(spark, warc_dir, num_partitions=4 * CPUS)

    def run_warc() -> float:
        t0 = time.monotonic()
        warc_fused.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    def run_warc_unfused() -> float:
        t0 = time.monotonic()
        _pp(warc_pages).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    run_warc()
    # parse-bench protocol: warm once + min-of-N (same as the other
    # parse_pipeline rows, so the numbers stay comparable)
    warc_times = [run_warc() for _ in range(repeats)]
    spread["parse_pipeline_warc_source"] = [round(t, 3) for t in warc_times]
    warc_sec = min(warc_times)
    run_warc_unfused()
    warc_unfused_times = [run_warc_unfused() for _ in range(repeats)]
    spread["parse_pipeline_warc_unfused"] = [round(t, 3) for t in warc_unfused_times]
    warc_unfused_sec = min(warc_unfused_times)

    best_sec = min(parse_sec, ds_sec)
    docs_per_sec = n_docs / best_sec
    mb_per_sec = total_bytes / best_sec / 1e6

    # ---- representative operator queries at SF_DIR ----
    qtimes: dict[str, float] = {
        "parse_pipeline": round(parse_sec, 3),
        "parse_pipeline_datasource": round(ds_sec, 3),
        "parse_pipeline_fused_sink": round(fused_sec, 3),
        "parse_pipeline_warc_source": round(warc_sec, 3),
        "parse_pipeline_warc_unfused": round(warc_unfused_sec, 3),
    }
    # the registry IS the coverage list: every registered query gets a
    # wall (a hand-kept literal list silently drops the next addition).
    # SPARK_GRAFT_PARSE_ONLY=1 skips it: the reconciliation protocol
    # (BENCH.md) re-times just the parse family on an idle host.
    from xhtml_parser_spark.caching import cache_scope

    queries = (
        {} if os.environ.get("SPARK_GRAFT_PARSE_ONLY") == "1" else entry.queries()
    )
    for name in queries:
        # warm once: the first execution of a query pays JVM codegen/JIT
        # compilation (measured ~1.2 s on md5+regexp chains), which is a
        # per-process cost, not per-query work -- steady state is what a
        # long-running job sees. Each run (warm-up included) executes
        # inside cache_scope so persisted intermediates (lsh/ann
        # signature caches) are dropped and every timed run pays the
        # full per-job cost, JIT excluded -- and one query's leftover
        # cache can never skew the next query's wall.
        with cache_scope(spark):
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        best = float("inf")
        for _ in range(2):
            with cache_scope(spark):
                t0 = time.monotonic()
                queries[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.monotonic() - t0)
        qtimes[name] = round(best, 3)

    out = {
        "metric": "parse_docs_per_sec",
        "value": round(docs_per_sec, 2),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "extra": {
            "parse_mb_per_sec": round(mb_per_sec, 2),
            "fused_sink_mb_per_sec": round(total_bytes / fused_sec / 1e6, 2),
            "fused_sink_docs_per_sec": round(n_docs / fused_sec, 2),
            "corpus_docs": n_docs,
            "corpus_bytes": int(total_bytes),
            "cpus": CPUS,
            # all timed runs per parse bench (noise bar): a min that
            # sits far below the other runs means interference, not
            # code -- compare spreads before calling a regression
            "parse_runs": spread,
            "load_avg_at_start": load_at_start,
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
