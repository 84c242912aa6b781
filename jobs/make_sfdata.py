"""Deterministic scale-up of the driver's documents/embeddings tables.

The driver ships read-only testdata up to sf0.1 (5 000 documents,
2 000 embeddings); the sf-step-up evidence (VERDICT r03 item #2) needs
the same WORKLOAD SHAPE at 10x+ to surface memory/spill/skew behavior
invisible at sf0.1. This generator synthesizes documents.parquet and
embeddings.parquet at an arbitrary multiplier with the sf0.1 corpus's
own statistics, so operator walls are comparable across sf:

  * vocabulary and unigram frequencies: EMPIRICAL from the base corpus
    (dedup/LSH bucket sizes, BPE merges and vocab mining all key on the
    word distribution -- an iid-uniform draw would change the workload
    character, not just its size);
  * per-doc word counts uniform 10..100, langs by empirical share,
    sources uniform src0..src19 (matching the base's exact layout);
  * embeddings: unit-norm 64-d vectors with the base's weak label
    structure (per-label center bias calibrated to the measured
    mean-norm ~0.07, per-coordinate std ~0.125).

Near-duplicate density stays NATURAL (independent draws) -- a naive
replicate-10x of the base rows would turn every document into a
10-way exact duplicate and blow the pair-generating operators into a
different (quadratic) workload.

Seeded (default 42) + doc-count-keyed streams: same args -> identical
bytes. Usage:
  python jobs/make_sfdata.py --mult 10 --out /tmp/xps_sf1
"""

from __future__ import annotations

import argparse
import os

import numpy as np

BASE = "/root/testdata/sf0.1"


def _base_stats(base: str):
    import duckdb

    con = duckdb.connect()
    words = con.execute(
        "SELECT w, count(*) c FROM (SELECT unnest(string_split(text, ' ')) w "
        f"FROM '{base}/documents.parquet') GROUP BY w ORDER BY w"
    ).fetchall()
    langs = con.execute(
        f"SELECT lang, count(*) FROM '{base}/documents.parquet' "
        "GROUP BY lang ORDER BY lang"
    ).fetchall()
    n_docs, n_vecs = (
        con.execute(
            f"SELECT (SELECT count(*) FROM '{base}/documents.parquet'), "
            f"(SELECT count(*) FROM '{base}/embeddings.parquet')"
        ).fetchone()
    )
    return words, langs, int(n_docs), int(n_vecs)


def make(out: str, mult: int, seed: int = 42, base: str = BASE) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    words, langs, base_docs, base_vecs = _base_stats(base)
    n_docs, n_vecs = base_docs * mult, base_vecs * mult
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)

    vocab = np.array([w for w, _ in words])
    wp = np.array([c for _, c in words], dtype=np.float64)
    wp /= wp.sum()
    lv = np.array([l for l, _ in langs])
    lp = np.array([c for _, c in langs], dtype=np.float64)
    lp /= lp.sum()

    lens = rng.integers(10, 101, size=n_docs)
    flat = rng.choice(len(vocab), size=int(lens.sum()), p=wp)
    bounds = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=bounds[1:])
    texts = [
        " ".join(vocab[flat[bounds[i] : bounds[i + 1]]]) for i in range(n_docs)
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(lv[rng.choice(len(lv), size=n_docs, p=lp)]),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )
    pq.write_table(docs, os.path.join(out, "documents.parquet"))

    dim, n_labels = 64, 10
    centers = rng.standard_normal((n_labels, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_labels, size=n_vecs)
    g = rng.standard_normal((n_vecs, dim)) + 0.56 * centers[labels]
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(n_vecs, dtype=np.int64)),
            "embedding": pa.array(
                list(g.astype(np.float32)), type=pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32)),
        }
    )
    pq.write_table(emb, os.path.join(out, "embeddings.parquet"))
    print(
        f"wrote {n_docs} docs / {n_vecs} vecs to {out} "
        f"({sum(len(t) for t in texts) / 1e6:.1f} MB text)"
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--base", default=BASE)
    args = ap.parse_args()
    make(args.out, args.mult, args.seed, args.base)
