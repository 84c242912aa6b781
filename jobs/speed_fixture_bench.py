#!/usr/bin/env python3
"""Single-core kernel timing on the reference's own speed_test workload.

The reference's only published performance number is its speed test
(README.md:19-22: 5.5 MB parsed in 3 246 us +- 79 us, one core, default
features, release build; driven by tests/tests_xml.rs:52-91 over
tests/test_data/speed_test/). This harness times OUR kernels on the
exact vendored files (tests/fixtures/speed_test/test_case/) the same
way: in-memory bytes -> full parse (Document::new equivalent =
parse_document, building the packed tree + mutated buffer), min over
repeats, one process, no Spark.

Prints one JSON line:
  {"files": {name: {"bytes": n, "c_us": x, "py_us": y}},
   "c_mb_per_sec": ..., "py_mb_per_sec": ...,
   "ref_mb_per_sec": 1694.0}

Numbers land in BASELINE.md's single-core comparison table.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURES = pathlib.Path(REPO) / "tests" / "fixtures" / "speed_test" / "test_case"

# reference: 5.5 MB / 3246 us (README.md:19-22) -- their corpus is the
# speed_test pair parsed repeatedly; per-byte rate is the comparable unit
REF_MB_PER_SEC = 5.5e6 / 3246e-6 / 1e6


def _time_parse(fn, data: bytes, repeats: int) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter_ns()
        doc = fn(data)
        dt = time.perf_counter_ns() - t0
        assert doc.ok
        best = min(best, dt)
    return best / 1e3  # us


def _time_parse_only(data: bytes, repeats: int) -> float:
    """cp.parse_only: run_parse and free, nothing extracted or
    marshalled -- the apples-to-apples twin of the reference's speed
    test (Document::new builds the tree and RETURNS; the published
    1.69 GB/s pays no text extraction). The stats differential
    (test_accel.py::test_parse_only_probe_stats_match_parse_texts)
    pins the probe to the shipped parse."""
    from xhtml_parser_spark.kernel.parser import _get_cparser

    cp = _get_cparser()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter_ns()
        ok = cp.parse_only(data)[0]
        dt = time.perf_counter_ns() - t0
        assert ok
        best = min(best, dt)
    return best / 1e3


def _time_hot(data: bytes, repeats: int) -> float:
    """parse_texts: the pipeline hot path (packed C parse + extraction,
    NO Python-list materialization of the node arrays -- what
    parse_pages/the fused sink actually execute per document)."""
    from xhtml_parser_spark.kernel.parser import parse_texts

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter_ns()
        ok = parse_texts(data)[0]
        dt = time.perf_counter_ns() - t0
        assert ok
        best = min(best, dt)
    return best / 1e3


def main() -> None:
    from xhtml_parser_spark.kernel.parser import (
        _get_cparser,
        parse_document,
        parse_document_pure,
    )

    have_c = _get_cparser() is not None
    out: dict = {"files": {}}
    tot_bytes = 0
    tot_hot_us = 0.0
    tot_po_us = 0.0
    tot_c_us = 0.0
    tot_py_us = 0.0
    for f in sorted(FIXTURES.glob("*.xhtml")):
        data = f.read_bytes()
        repeats = max(5, int(2_000_000 / max(len(data), 1)))
        hot_us = _time_hot(data, repeats) if have_c else None
        po_us = _time_parse_only(data, repeats) if have_c else None
        c_us = _time_parse(parse_document, data, repeats) if have_c else None
        py_us = _time_parse(parse_document_pure, data, max(3, repeats // 10))
        out["files"][f.name] = {
            "bytes": len(data),
            "hot_us": round(hot_us, 1) if hot_us is not None else None,
            "parse_only_us": round(po_us, 1) if po_us is not None else None,
            "c_us": round(c_us, 1) if c_us is not None else None,
            "py_us": round(py_us, 1),
        }
        tot_bytes += len(data)
        tot_hot_us += hot_us or 0.0
        tot_po_us += po_us or 0.0
        tot_c_us += c_us or 0.0
        tot_py_us += py_us
    if have_c:
        out["hot_mb_per_sec"] = round(tot_bytes / tot_hot_us, 2)
        out["parse_only_mb_per_sec"] = round(tot_bytes / tot_po_us, 2)
        out["c_api_mb_per_sec"] = round(tot_bytes / tot_c_us, 2)
    out["py_mb_per_sec"] = round(tot_bytes / tot_py_us, 2)
    out["ref_mb_per_sec"] = round(REF_MB_PER_SEC, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
