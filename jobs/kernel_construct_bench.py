#!/usr/bin/env python3
"""Per-construct C-kernel throughput probes (regression guard for the
parser's worst-case cliffs).

Each probe isolates one syntactic construct at ~1 MB so pathological
complexity shows up as MB/s, not as noise inside a mixed corpus. The
entity-dense probe is the one that caught the quadratic '&'/CR/';'
rescan (0.9 MB/s before the round-2 memoization, ~200 MB/s after).

Usage: taskset -c 0 python jobs/kernel_construct_bench.py
Writes one JSON line; numbers land in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TARGET = 1 << 20


def _docs() -> dict[str, bytes]:
    return {
        "plain_text": b"<r>" + b"hello world this is plain text " * (TARGET // 32) + b"</r>",
        "element_dense": b"<r>" + b"<p>word here</p>" * (TARGET // 16) + b"</r>",
        "attr_amp_no_semi": b"<r>" + b"<a b='& x'/>" * (TARGET // 12) + b"</r>",
        "entity_dense": b"<r>" + b"x &amp; y &lt;z&gt; " * (TARGET // 20) + b"</r>",
        "amp_no_semi": b"<r>" + b"& no semis here " * (TARGET // 16) + b"&#65;</r>",
        "attr_dense": b"<r>" + b"<p a='1' bb='two three' c='x'>t</p>" * (TARGET // 35) + b"</r>",
        "attr_entities": b"<r>" + b"<p a='x &amp; y'>t</p>" * (TARGET // 22) + b"</r>",
        "comment_bypass": b"<r>" + (b"<!-- " + b"c" * 80 + b" -->x") * (TARGET // 90) + b"</r>",
        "deep_nesting": b"<r>" + b"<d>" * 200 + b"x" + b"</d>" * 200 + b"</r>",
    }


def main() -> None:
    from xhtml_parser_spark.kernel.parser import _get_cparser

    cp = _get_cparser()
    if cp is None:
        print(json.dumps({"error": "C kernel unavailable"}))
        return
    out: dict = {}
    for name, d in _docs().items():
        res = cp.parse(d)
        assert res is not None and res[0], name
        for _ in range(3):
            cp.parse(d)
        n = max(5, int(60_000_000 / len(d)))
        t0 = time.perf_counter_ns()
        for _ in range(n):
            cp.parse(d)
        dt = (time.perf_counter_ns() - t0) / n
        out[name] = {
            "bytes": len(d),
            "us": round(dt / 1e3, 1),
            "mb_per_sec": round(len(d) / dt * 1e3, 1),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
