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

Both outcomes are compared: parsing documents by full Debug tree,
rejecting documents by the error Debug (``InvalidXml("<msg>")`` --
our ``error_msg`` is the reference's message with its ``Invalid
XML: `` Display prefix, so the mapping strips the prefix and applies
Rust's Debug string escaping). Documents containing raw CR are
skipped (reference UB -> documented UnsupportedCR deviation,
kernel/parser.py), as are the two documented error-behavior
deviations (error classes UnsupportedCR / AttrNormCorruption).

``--profile`` selects a reference feature profile (default /
trim_pcdata / keep_ws_only_pcdata / no_feature): the harness builds
the reference with the matching cargo features (per-profile target
dir) and passes the matching kwargs to the repo kernel. Under
``no_feature`` (parse_escapes off) raw-CR handling is DEFINED
(CR/CRLF -> LF), so CR documents are compared rather than skipped.

Usage:
  bash jobs/rust_baseline.sh          # build the reference first
  python jobs/fuzz_vs_reference.py [--seconds 60] [--seed 0]
      [--profile default]
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

BUILD = "/tmp/xps_rust_baseline"

SIZES = "small_node_count,small_attr_count,medium_xml_size"
PROFILES = {
    # name -> (cargo features, kernel kwargs, compare raw-CR docs?)
    "default": (None, {}, False),
    "trim_pcdata": (
        f"namespace_removal,parse_escapes,trim_pcdata,{SIZES}",
        dict(trim_pcdata=True),
        False,
    ),
    "keep_ws_only_pcdata": (
        f"namespace_removal,parse_escapes,keep_ws_only_pcdata,{SIZES}",
        dict(keep_ws_only_pcdata=True),
        False,
    ),
    "no_feature": (
        SIZES,
        dict(parse_escapes=False, namespace_removal=False),
        True,  # CR/CRLF -> LF is defined without parse_escapes
    ),
}


def _build_profile(features: str | None) -> str:
    """Build the pipe harness for a cargo feature set; returns the
    binary path (per-profile target dir, so profiles coexist)."""
    import subprocess as sp

    tag = "default" if features is None else features.replace(",", "_")
    tdir = os.path.join(BUILD, "bench_harness", f"target_{tag}")
    binp = os.path.join(tdir, "release", "bench_harness")
    if os.path.exists(binp):
        return binp
    manifest = os.path.join(BUILD, "bench_harness", "Cargo.toml")
    src = open(manifest).read()
    if features is None:
        dep = 'xhtml_parser = { path = ".." }'
    else:
        dep = ('xhtml_parser = { path = "..", default-features = false, '
               f'features = [{", ".join(repr(f) for f in features.split(","))}] }}')
    import re

    src = re.sub(r"xhtml_parser = .*", dep.replace("'", '"'), src)
    open(manifest, "w").write(src)
    sp.run(
        ["cargo", "build", "--release", "--offline", "--target-dir", tdir,
         "--manifest-path", manifest],
        check=True, capture_output=True,
    )
    return binp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--profile", default="default", choices=sorted(PROFILES))
    args = ap.parse_args()

    if not os.path.exists(BUILD):
        print("reference build missing: run jobs/rust_baseline.sh first")
        sys.exit(2)
    features, kernel_kwargs, compare_cr = PROFILES[args.profile]
    BIN = _build_profile(features)

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

    from xhtml_parser_spark.kernel.document import _rust_str_debug

    def rust_debug_str(s: str) -> str:
        """Rust Debug escaping via the kernel's measured-exact
        _rust_str_debug (quotes stripped -- the caller adds them)."""
        return _rust_str_debug(s)[1:-1]

    rng = random.Random(args.seed)
    t0 = time.time()
    n = skipped = compared = err_compared = 0
    while time.time() - t0 < args.seconds:
        doc = _gen_doc(rng)
        n += 1
        if not compare_cr and b"\r" in doc:  # ref UB (UnsupportedCR)
            skipped += 1
            continue
        ours = parse_document(doc, **kernel_kwargs)
        if ours.ok:
            want = ("OK " + debug_format(ours)).encode()
        elif ours.error_class == "InvalidXml" and ours.error_msg.startswith(
            "Invalid XML: "
        ):
            msg = ours.error_msg[len("Invalid XML: "):]
            want = f'ERR InvalidXml("{rust_debug_str(msg)}")'.encode()
            err_compared += 1
        else:  # documented deviations (UnsupportedCR etc.)
            skipped += 1
            continue
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
        f"OK[{args.profile}]: {compared} documents byte-identical vs the "
        f"reference binary ({err_compared} of them on the error path; "
        f"{n} generated, {skipped} skipped: raw-CR / deviation classes, "
        f"{args.seconds:.0f}s, seed {args.seed})"
    )


if __name__ == "__main__":
    main()
