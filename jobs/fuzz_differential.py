#!/usr/bin/env python3
"""Deep differential fuzz: C kernel vs pure-Python kernel.

The pytest suite (tests/test_accel.py) runs a few hundred hypothesis
examples per run; this harness throws millions of structured +
random-binary documents at both kernels across all cores and fails on
the FIRST divergence in tree arrays, mutated buffer, extracted/main
text, stats, or error class/pos/message. The generator is weighted
toward the constructs the reference treats specially (entities incl.
broken ones, numeric/hex refs, comments/CDATA/PI/DOCTYPE bypass with
bounded windows, namespace colons, duplicate attrs, self-closing
roots, multi-root siblings, ws-only text).

Usage:
  python jobs/fuzz_differential.py [--seconds 120] [--procs N] [--seed 0]
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_TAGS = [b"a", b"div", b"ns:p", b"x:y:z", b"_u", b"A", b"xml:lang", b":c", b"e\xc3\xa9"]
_ENT = [b"&amp;", b"&lt;", b"&nbsp;", b"&euro;", b"&foo;", b"&;", b"&#65;",
        b"&#x42;", b"&#xD800;", b"&#0;", b"&#38;amp;", b"&#13;", b"&#X41;",
        b"&unterminated", b"&#999999999999;", b"&#xffffffffff;"]
_TEXT = [b"hello", b" ", b"\t\n", b"x" * 50, b"\xe2\x98\x83", b"", b"a&b",
         b"]]>", b"--", b"<", b"\x00"]
_MISC = [b"<!-- c -->", b"<![CDATA[zap]]>", b"<?pi junk?>", b"<!DOCTYPE r>",
         b"<!DOCTYPE r [ <!x> ]>", b"<!-- " + b"c" * 5100 + b" -->",
         b"\xef\xbb\xbf", b"junk<", b"</", b"<>", b"<123>", b"='"]


def _gen_doc(rng: random.Random) -> bytes:
    mode = rng.random()
    if mode < 0.15:
        # raw binary
        n = rng.randrange(0, 300)
        return bytes(rng.randrange(256) for _ in range(n))
    out = bytearray()
    if rng.random() < 0.1:
        out += rng.choice(_MISC)
    depth = 0
    stack: list[bytes] = []
    for _ in range(rng.randrange(1, 40)):
        r = rng.random()
        if r < 0.35:
            tag = rng.choice(_TAGS)
            out += b"<" + tag
            for _ in range(rng.randrange(0, 3)):
                q = b"'" if rng.random() < 0.5 else b'"'
                out += (b" " + rng.choice(_TAGS) + b"=" + q
                        + rng.choice(_TEXT + _ENT) + q)
            if rng.random() < 0.2:
                out += b"/>"
            else:
                out += b">"
                stack.append(tag)
                depth += 1
        elif r < 0.6 and stack:
            tag = stack.pop() if rng.random() < 0.8 else rng.choice(_TAGS)
            out += b"</" + tag + b">"
            depth -= 1
        elif r < 0.8:
            out += rng.choice(_TEXT) + rng.choice(_ENT) + rng.choice(_TEXT)
        else:
            out += rng.choice(_MISC)
    while stack and rng.random() < 0.7:
        out += b"</" + stack.pop() + b">"
    return bytes(out)


def _diff(xml: bytes) -> str | None:
    from xhtml_parser_spark.kernel.extract import extract_main_text
    from xhtml_parser_spark.kernel.parser import (
        parse_document,
        parse_document_pure,
    )

    a = parse_document(xml)
    b = parse_document_pure(xml)
    if a.ok != b.ok:
        return f"ok {a.ok} vs {b.ok}"
    if a.ok:
        for f in ("buf", "parent", "prev_sib", "next_sib", "first_child",
                  "kind", "loc_start", "loc_end", "attr_start", "attr_end",
                  "a_name_start", "a_name_end", "a_val_start", "a_val_end",
                  "n_text_nodes", "max_depth"):
            if getattr(a, f) != getattr(b, f):
                return f"field {f}"
        if a.extracted_text() != b.extracted_text():
            return "extracted_text"
        if extract_main_text(a) != extract_main_text(b):
            return "main_text"
        # round-2 C outputs: packed depth/last_descendant arrays vs the
        # Python derivation
        from xhtml_parser_spark.kernel.extract import (
            compute_depth_and_last_descendant,
        )

        depth, last_desc = compute_depth_and_last_descendant(b)
        if memoryview(a.c_depth_b).cast("i").tolist() != depth:
            return "depth"
        if memoryview(a.c_last_desc_b).cast("i").tolist() != last_desc:
            return "last_descendant"
    else:
        if (a.error_class, a.error_pos, a.error_msg) != (
            b.error_class, b.error_pos, b.error_msg
        ):
            return f"error {a.error_class}@{a.error_pos} vs {b.error_class}@{b.error_pos}"
    # texts-only C entry (cp.parse_texts): separate marshalling and
    # error branch from cp.parse, so fuzz it against the pure tuple too
    from xhtml_parser_spark.kernel.parser import parse_texts

    ct = parse_texts(xml)
    if b.ok:
        want = (True, b.extracted_text(), extract_main_text(b),
                b.n_nodes - 1, b.n_attrs, b.n_text_nodes, b.max_depth,
                None, None, None)
    else:
        want = (False, b"", b"", 0, 0, 0, 0,
                b.error_class, b.error_pos, b.error_msg)
    if ct != want:
        return "parse_texts tuple"
    return None


def _worker(seed: int, seconds: float, q: mp.Queue) -> None:
    rng = random.Random(seed)
    n = 0
    t_end = time.monotonic() + seconds
    while time.monotonic() < t_end:
        for _ in range(200):
            xml = _gen_doc(rng)
            d = _diff(xml)
            if d is not None:
                q.put((n, d, xml))
                return
            n += 1
    q.put((n, None, None))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=120)
    ap.add_argument("--procs", type=int, default=max(1, (os.cpu_count() or 4) - 2))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from xhtml_parser_spark.kernel.parser import _get_cparser

    if _get_cparser() is None:
        raise SystemExit("C accel unavailable; nothing to differential-fuzz")

    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(args.seed * 10007 + i, args.seconds, q))
        for i in range(args.procs)
    ]
    for p in procs:
        p.start()
    total, failures, expected = 0, [], len(procs)
    # Don't block forever on q.get(): a worker that SEGFAULTS inside the
    # C kernel (the most severe divergence class) dies before putting a
    # result. Poll the queue and the process table together.
    import queue as _queue

    got = 0
    while got < expected:
        try:
            n, d, xml = q.get(timeout=2)
        except _queue.Empty:
            dead = [p for p in procs if not p.is_alive() and p.exitcode not in (0, None)]
            if dead and q.empty():
                failures.append(
                    (f"worker crashed with exitcode {dead[0].exitcode} "
                     f"(likely a C-kernel segfault)", None)
                )
                expected -= len(dead)
                for p in dead:
                    procs.remove(p)
            continue
        got += 1
        total += n
        if d is not None:
            failures.append((d, xml))
    for p in procs:
        p.join()
    if failures:
        d, xml = failures[0]
        print(f"DIVERGENCE after {total} cases: {d}\ninput: {xml!r}")
        raise SystemExit(1)
    print(f"OK: {total} documents agree across {args.procs} procs "
          f"({args.seconds:.0f}s)")


if __name__ == "__main__":
    main()
