"""Ad-hoc single-query bench: same protocol as bench.py's query loop
(warm once for JIT, then min-of-2, each run inside cache_scope so
persisted intermediates never leak between runs).

Usage: python jobs/qbench.py q1 [q2 ...]   [--runs N]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS   (default all cores).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def main() -> None:
    argv = sys.argv[1:]
    runs = 2
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        del argv[i : i + 2]
    args = [a for a in argv if not a.startswith("--")]

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__spark_entry__.py"),
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    from xhtml_parser_spark.caching import cache_scope
    from xhtml_parser_spark.session import get_spark

    spark = get_spark("qbench", master=f"local[{CPUS}]")
    qs = entry.queries()
    out: dict = {"sf_dir": SF_DIR, "cpus": CPUS,
                 "load_avg_at_start": round(os.getloadavg()[0], 2),
                 "queries": {}, "runs": {}, "spill": {}}
    for name in args:
        with cache_scope(spark):
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        walls = []
        before = _stage_totals(spark)
        for _ in range(runs):
            with cache_scope(spark):
                t0 = time.monotonic()
                qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
                walls.append(round(time.monotonic() - t0, 3))
        after = _stage_totals(spark)
        out["queries"][name] = min(walls)
        out["runs"][name] = walls
        if after is not None and before is not None:
            out["spill"][name] = {
                k: round((after[k] - before[k]) / max(runs, 1))
                for k in after
            }
    print(json.dumps(out))
    spark.stop()


def _stage_totals(spark):
    """Cumulative spill/shuffle bytes across all completed stages, via
    the UI REST API (diff around a run -> that run's totals; divided
    by the run count for a per-run average). None when the UI is off."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return None
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10,
        ) as r:
            stages = json.load(r)
    except Exception:
        return None
    tot = {"spill_mem_b": 0, "spill_disk_b": 0, "shuffle_write_b": 0}
    for s in stages:
        tot["spill_mem_b"] += s.get("memoryBytesSpilled", 0)
        tot["spill_disk_b"] += s.get("diskBytesSpilled", 0)
        tot["shuffle_write_b"] += s.get("shuffleWriteBytes", 0)
    return tot


if __name__ == "__main__":
    main()
