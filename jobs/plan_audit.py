"""Physical-plan audit over every registered query.

For each ``__spark_entry__.queries()`` entry, builds the DataFrame at a
small SF and inspects the Spark physical plan for the properties that
decide 100 TB behavior:

  * exchanges   -- shuffle count (every one is a full network pass at
                   scale; reused exchanges are netted out)
  * bhj / smj   -- broadcast vs sort-merge joins (an unexpected SMJ on
                   a small dimension side is a missed broadcast)
  * python      -- Arrow/pandas evaluation stages (the deliberate
                   Python passes; anything unexpected is a slow path)
  * codegen     -- WholeStageCodegen spans (wider is better)
  * pushed      -- whether any parquet scan carries PushedFilters

Writes one markdown table to PLAN_AUDIT.md plus a FLAGS section for
heuristic smells. Run: ``python jobs/plan_audit.py [--sf DIR]``.

Each query is EXECUTED once (noop sink) and the audit reads the final
adaptive plan -- the one AQE actually ran, with runtime SMJ->broadcast
conversions applied -- so a flagged SortMergeJoin really survived AQE
at this SF.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PY_OPS = (
    "ArrowEvalPython",
    "MapInPandas",
    "PythonMapInArrow",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "BatchEvalPython",
)


def audit_plan(plan: str) -> dict:
    # Two rendering artifacts would overcount: (1) AQE appends an
    # "== Initial Plan ==" section re-printing the whole pre-adaptive
    # plan with fresh plan_ids -- cut it; (2) every InMemoryTableScan
    # re-prints the cached relation's full lineage, so a persisted
    # subtree's exchanges appear once per cache READ while executing
    # once -- dedup Exchange nodes by their plan_id.
    plan = plan.split("== Initial Plan ==")[0]
    # \bExchange\b does NOT match inside "ReusedExchange" (no word
    # boundary between 'd' and 'E'), so the count is already net of
    # reuse -- do not subtract again
    exch_ids = re.findall(r"\bExchange\b[^\n]*?plan_id=(\d+)", plan)
    n_exch = len(set(exch_ids)) if exch_ids else len(re.findall(r"\bExchange\b", plan))
    reused_ids = re.findall(r"\bReusedExchange\b[^\n]*?plan_id=(\d+)", plan)
    n_reused = (
        len(set(reused_ids))
        if reused_ids
        else len(re.findall(r"\bReusedExchange\b", plan))
    )
    return {
        "exchanges": n_exch,
        "reused": n_reused,
        "bhj": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "smj": len(re.findall(r"\bSortMergeJoin\b", plan)),
        # dedup python-stage LINES: the same physical node re-printed
        # under a cached-relation lineage must not count twice
        "python": len(
            {
                ln.lstrip(" :+-*()0123456789")
                for ln in plan.splitlines()
                if any(op in ln for op in PY_OPS)
            }
        ),
        # executedPlan().toString() renders codegen stages as "*(n) Op"
        "codegen": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "pushed": "PushedFilters: [" in plan
        and bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        # longest FILTER line: a predicate carrying a grotesquely long
        # expression is the macro-expansion signature
        # (PushDownPredicates substituting staged aliases into a
        # condition -- host_link_graph once carried a 149 KB filter;
        # see the CLAUDE.md pushdown gotcha). Project lines are exempt:
        # within one ProjectExec, whole-stage codegen's subexpression
        # elimination computes duplicated subtrees once, and measured
        # walls confirm it (extract_links' 44 KB collapsed Project runs
        # at its documented speed); Filter conditions short-circuit, so
        # CSE can't save them, and they run BEFORE the Project that
        # recomputes the same values.
        "maxfilter": max(
            (
                len(ln)
                for ln in plan.splitlines()
                if re.match(r"[\s:+\-*()0-9]*Filter\b", ln)
            ),
            default=0,
        ),
    }


# Filter lines above this are flagged as likely alias-substitution
# macro expansion (normal predicates top out well under a few KB here)
MAXFILTER_FLAG = 20_000

# Big filter lines that are reviewed and accepted -- annotated rather
# than raised (anchor_index's 75 KB gate was here until its gate moved
# to the raw-column scheme derivation; empty is the goal state)
KNOWN_MAXFILTER: dict[str, str] = {}

# SMJs that are the INTENDED plan at scale, reviewed and documented --
# annotated in Flags rather than raised as smells
KNOWN_SMJ = {
    "ann_lsh_topk": (
        "the candidate semi-join is deliberately NOT broadcast: multi-probe "
        "candidates are a constant fraction of the corpus (~3.5% at "
        "n_bits=8), which exceeds the 8 GB broadcast cap at 10^12 rows; a "
        "shuffle semi-join is the scale-safe strategy and AQE may still "
        "convert it when the runtime size allows"
    ),
    "crawl_delta": (
        "FULL OUTER equi-join of two crawl snapshots: Spark cannot "
        "broadcast either side of a full outer hash join, and at scale "
        "both snapshots are corpus-sized anyway -- SortMergeJoin IS the "
        "correct strategy for this operator"
    ),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLAN_AUDIT.md"))
    args = ap.parse_args()

    import __spark_entry__ as entry
    from xhtml_parser_spark.session import get_spark

    spark = get_spark("plan_audit", master="local[8]")
    rows = []
    flags = []
    for name, fn in sorted(entry.queries().items()):
        try:
            df = fn(spark, args.sf)
            # execute via collect() so THIS DataFrame's QueryExecution
            # finalizes (a noop write would execute a separate plan
            # instance and leave this one at isFinalPlan=false), then
            # read the final adaptive plan -- the one AQE actually ran
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 -- audit must not die mid-sweep
            first = str(e).splitlines() or [type(e).__name__]
            rows.append((name, dict(error=first[0][:80])))
            continue
        m = audit_plan(plan)
        rows.append((name, m))
        if m["smj"] and name in KNOWN_SMJ:
            flags.append(f"`{name}` ({m['smj']} SMJ, known): {KNOWN_SMJ[name]}")
        elif m["smj"]:
            flags.append(
                f"`{name}`: {m['smj']} SortMergeJoin(s) survived AQE at this "
                "SF -- check whether the build side is genuinely large or a "
                "broadcast opportunity is being missed"
            )
        if m["maxfilter"] > MAXFILTER_FLAG and name in KNOWN_MAXFILTER:
            flags.append(
                f"`{name}` ({m['maxfilter'] // 1000} KB filter, known): "
                f"{KNOWN_MAXFILTER[name]}"
            )
        elif m["maxfilter"] > MAXFILTER_FLAG:
            flags.append(
                f"`{name}`: a Filter condition line is "
                f"{m['maxfilter'] // 1000} KB -- likely alias-substitution "
                "macro expansion (PushDownPredicates inlining staged "
                "projections into a predicate; see the CLAUDE.md gotcha "
                "and host_link_graph's raw-column gate for the fix pattern)"
            )
        spark.catalog.clearCache()

    lines = [
        "# PLAN_AUDIT — physical-plan metrics for every registered query",
        "",
        f"Input: `{args.sf}`; FINAL adaptive (post-AQE) physical plans after",
        "one execution per query. Exchange counts are deduped by plan_id and",
        "the `== Initial Plan ==` section is excluded, so a persisted subtree",
        "re-printed under each InMemoryTableScan counts once -- these are the",
        "shuffles that actually executed. Regenerate: `python jobs/plan_audit.py`.",
        "",
        "| query | exchanges | reused | bcast joins | sortmerge joins | python stages | codegen spans | pushed filters | max filter line |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, m in rows:
        if "error" in m:
            lines.append(f"| {name} | ERROR: {m['error']} | | | | | | | |")
            continue
        lines.append(
            f"| {name} | {m['exchanges']} | {m['reused']} | {m['bhj']} | "
            f"{m['smj']} | {m['python']} | {m['codegen']} | "
            f"{'yes' if m['pushed'] else '-'} | {m['maxfilter']} |"
        )
    lines += ["", "## Flags", ""]
    lines += [f"- {f}" for f in flags] if flags else ["- none"]
    lines.append("")
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {args.out}: {len(rows)} queries, {len(flags)} flags")
    spark.stop()


if __name__ == "__main__":
    main()
