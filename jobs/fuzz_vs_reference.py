#!/usr/bin/env python3
"""Live differential fuzz against the REFERENCE'S OWN BINARY.

The golden suite pins byte-identity on the reference's committed
fixture corpus; this harness goes further: it feeds the same randomly
generated documents (jobs/fuzz_differential.py's generator, weighted
toward the constructs the reference treats specially) to BOTH the
repo's kernel (``debug_format``, the Debug-formatter reimplementation)
and the reference parser itself (built by jobs/rust_baseline.sh,
``--pipe`` mode: length-prefixed docs in, ``OK <Debug tree>`` /
``ERR <error Debug>`` out) and fails on the first byte difference.

Scope: documents that PARSE on the repo kernel (error-path message
parity is separately pinned by the 75-case negative corpus, where the
expected messages come from the reference's own asserts). Documents
containing raw CR in text are skipped (reference UB -> documented
UnsupportedCR deviation, kernel/parser.py), as are docs our parser
rejects.

Usage:
  bash jobs/rust_baseline.sh          # build the reference first
  python jobs/fuzz_vs_reference.py [--seconds 60] [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import random
import struct
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BIN = "/tmp/xps_rust_baseline/bench_harness/target/release/bench_harness"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if not os.path.exists(BIN):
        print(f"reference harness missing: run jobs/rust_baseline.sh first")
        sys.exit(2)

    from jobs.fuzz_differential import _gen_doc
    from xhtml_parser_spark.kernel.document import debug_format
    from xhtml_parser_spark.kernel.parser import parse_document

    proc = subprocess.Popen(
        [BIN, "--pipe"], stdin=subprocess.PIPE, stdout=subprocess.PIPE
    )

    def ref_parse(doc: bytes) -> bytes:
        proc.stdin.write(struct.pack("<I", len(doc)) + doc)
        proc.stdin.flush()
        n = struct.unpack("<I", proc.stdout.read(4))[0]
        return proc.stdout.read(n)

    rng = random.Random(args.seed)
    t0 = time.time()
    n = skipped = compared = 0
    while time.time() - t0 < args.seconds:
        doc = _gen_doc(rng)
        n += 1
        if b"\r" in doc:  # reference UB (UnsupportedCR deviation)
            skipped += 1
            continue
        ours = parse_document(doc)
        if not ours.ok:
            skipped += 1
            continue
        want = ("OK " + debug_format(ours)).encode()
        got = ref_parse(doc)
        if got != want:
            # show the first divergence with context
            i = next(
                (k for k, (a, b) in enumerate(zip(got, want)) if a != b),
                min(len(got), len(want)),
            )
            print("DIVERGENCE on doc:", doc[:200])
            print("ref   :", got[max(0, i - 60): i + 60])
            print("kernel:", want[max(0, i - 60): i + 60])
            sys.exit(1)
        compared += 1
    proc.stdin.close()
    proc.wait()
    print(
        f"OK: {compared} documents byte-identical vs the reference binary "
        f"({n} generated, {skipped} skipped: CR/parse-error, "
        f"{args.seconds:.0f}s, seed {args.seed})"
    )


if __name__ == "__main__":
    main()
