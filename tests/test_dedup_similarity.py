"""Differential tests for dedup and similarity operators on corpora
with KNOWN near-duplicate structure (the driver testdata has none, so
these prove the recall/verify path actually fires)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from xhtml_parser_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_list,
    simhash64,
    simhash_pairs,
)
from xhtml_parser_spark.operators.similarity import (
    ann_lsh_topk,
    brute_force_topk,
    cosine_topk,
    ivf_topk,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "archivists catalogue ancient manuscripts beneath flickering "
    "lamplight and distant engines hum through the northern valley"
)


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("lazy", "sleepy")),  # near-dup of 0
        (3, BASE + " every winter morning brings fresh snow"),  # superset
        (4, "completely different content about basalt canyon geometry"),
        (5, "another unrelated document mentioning copper rooftops"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingle_list():
    assert shingle_list("a b c d") == ["a b c", "b c d"]
    assert shingle_list("a b") == ["a b"]
    assert shingle_list("") == [""]
    assert shingle_list("  a\t b \n c ") == ["a b c"]


def test_exact_dedup_keeps_min_id(spark, near_dup_docs):
    got = exact_dedup(near_dup_docs).collect()
    kept = sorted(r["doc_id"] for r in got)
    assert kept == [0, 2, 3, 4, 5]  # doc 1 deduped into 0


def test_minhash_identical_docs_share_signature(spark, near_dup_docs):
    sigs = {r["doc_id"]: (r["h0"], r["h1"], r["h2"], r["h3"])
            for r in minhash_signatures(near_dup_docs).collect()}
    assert sigs[0] == sigs[1]
    # near-dup shares at least one band with the original
    assert any(a == b for a, b in zip(sigs[0], sigs[2]))
    # unrelated docs share no band
    assert all(a != b for a, b in zip(sigs[0], sigs[4]))


def test_lsh_pairs_find_near_dups(spark, near_dup_docs):
    """r=1 exact-recall setting (any shared minhash is a candidate) —
    pinned explicitly since the operator default is the sub-quadratic
    production r=2 (VERDICT r04 item 4)."""
    pairs = {
        (r["a"], r["b"]): r["jac"]
        for r in lsh_candidate_pairs(
            near_dup_docs, jaccard_min=0.5, rows_per_band=1
        ).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert (0, 3) in pairs  # superset keeps high containment-ish jaccard
    assert not any(4 in p or 5 in p for p in pairs)


def test_lsh_banding_subsets_and_validates(spark, near_dup_docs):
    """rows_per_band=r keys each band on r CONCATENATED minhashes, so a
    band collision needs all r rows equal: candidates at r=2 must be a
    subset of r=1, exact dups always survive (identical signatures =>
    identical banded keys), and r must divide n_hashes."""
    def pairset(r):
        return {
            (row["a"], row["b"])
            for row in lsh_candidate_pairs(
                near_dup_docs, jaccard_min=0.0, rows_per_band=r
            ).collect()
        }

    p1, p2, p4 = pairset(1), pairset(2), pairset(4)
    assert p2 <= p1 and p4 <= p2
    assert (0, 1) in p4  # exact dup collides at every selectivity
    assert not any(4 in p or 5 in p for p in p1)
    # the DEFAULT is the sub-quadratic production setting r=2
    default_pairs = {
        (row["a"], row["b"])
        for row in lsh_candidate_pairs(near_dup_docs, jaccard_min=0.0).collect()
    }
    assert default_pairs == p2
    with pytest.raises(ValueError, match="rows_per_band"):
        lsh_candidate_pairs(near_dup_docs, rows_per_band=3)


def test_connected_components_chain_and_islands(spark):
    """A 5-node chain (worst-case diameter for min-label propagation:
    the min label walks one hop per round) plus a separate 2-clique
    and a pair; labels must reach every component's minimum."""
    from xhtml_parser_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 13), (13, 14),  # chain, min=10
         (20, 21), (21, 22), (20, 22),            # triangle, min=20
         (30, 31)],                               # pair, min=30
        "a long, b long",
    )
    got = {r["id"]: r["cluster_id"] for r in connected_components(edges).collect()}
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
                   20: 20, 21: 20, 22: 20, 30: 30, 31: 30}


def test_connected_components_raises_past_max_iter(spark):
    from xhtml_parser_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "a long, b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)


def test_dedup_clusters_and_keep(spark, near_dup_docs):
    """docs 0-3 are one near-dup cluster (via LSH pairs), 4 and 5 are
    singletons; dedup_keep retains exactly the cluster minima with all
    original columns."""
    from xhtml_parser_spark.operators.dedup import dedup_clusters, dedup_keep

    # r=1 exact recall: the superset doc 3 pairs with 0 via a single
    # shared minhash, so 0-3 are one cluster
    got1 = {
        r["doc_id"]: (r["cluster_id"], r["csize"])
        for r in dedup_clusters(near_dup_docs, rows_per_band=1).collect()
    }
    assert got1 == {0: (0, 4), 1: (0, 4), 2: (0, 4), 3: (0, 4),
                    4: (4, 1), 5: (5, 1)}
    # production default r=2: doc 3's extra tail flips one minhash of
    # each band, so it falls out to a singleton — selectivity working
    got2 = {
        r["doc_id"]: (r["cluster_id"], r["csize"])
        for r in dedup_clusters(near_dup_docs).collect()
    }
    assert got2 == {0: (0, 3), 1: (0, 3), 2: (0, 3), 3: (3, 1),
                    4: (4, 1), 5: (5, 1)}
    kept = dedup_keep(near_dup_docs, rows_per_band=1).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in kept] == [0, 4, 5]
    assert kept[0]["text"].startswith("the quick")  # columns preserved
    kept2 = dedup_keep(near_dup_docs).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in kept2] == [0, 3, 4, 5]


def test_simhash_hamming_structure(spark, near_dup_docs):
    hs = {r["doc_id"]: r["simhash"] & ((1 << 64) - 1)
          for r in simhash64(near_dup_docs).collect()}
    assert hs[0] == hs[1]

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(hs[0], hs[2]) <= 8  # near-dup: few bits flip
    assert hamming(hs[0], hs[4]) > 12  # unrelated: many bits differ


def test_simhash_pairs_complete_within_hamming_3(spark, near_dup_docs):
    """The 4x16-bit band join is pigeonhole-COMPLETE for Hamming <= 3:
    the operator's pair set must equal brute-force over all signatures
    (and carry the exact distance)."""
    sigs = {r["doc_id"]: r["simhash"] for r in simhash64(near_dup_docs).collect()}
    want = {
        (a, b, bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1"))
        for a in sigs
        for b in sigs
        if a < b
        and bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    got = {tuple(r) for r in simhash_pairs(near_dup_docs, max_hamming=3).collect()}
    assert got == want
    assert (0, 1, 0) in got  # the exact dup pair surfaces at distance 0


@pytest.fixture(scope="module")
def clustered_emb(spark):
    # two tight clusters around orthogonal axes + the query vector
    rows = []
    for i in range(10):
        rows.append((i, [1.0, 0.001 * i, 0.0, 0.0]))
    for i in range(10, 20):
        rows.append((i, [0.0, 0.0, 1.0, 0.001 * i]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_finds_cluster(spark, clustered_emb):
    top = brute_force_topk(clustered_emb, query_vec_id=0, k=5).collect()
    ids = [r["vec_id"] for r in top]
    assert set(ids) <= set(range(1, 10))  # same cluster only


def test_cosine_topk_matches_dot_ranking(spark, clustered_emb):
    c = [r["vec_id"] for r in cosine_topk(clustered_emb, query_vec_id=0, k=5).collect()]
    assert set(c) <= set(range(1, 10))


def test_ann_lsh_recall_on_clusters(spark, clustered_emb):
    got = {r["vec_id"] for r in ann_lsh_topk(clustered_emb, query_vec_id=0, k=5).collect()}
    brute = {r["vec_id"] for r in brute_force_topk(clustered_emb, query_vec_id=0, k=5).collect()}
    # hyperplane buckets keep the query's own tight cluster together
    assert got
    assert got <= set(range(1, 10))
    assert len(got & brute) >= 3  # recall on a trivially-clustered set


def test_simhash_signed_roundtrip(spark):
    df = spark.createDataFrame([(1, "x " * 100)], "doc_id long, text string")
    r = simhash64(df).collect()[0]
    assert -(1 << 63) <= r["simhash"] < (1 << 63)


def _simhash_ref(t: str | None) -> int:
    """Slow per-word reference of the simhash spec (tokens = [ \\t\\n]+
    split; word hash = md5 first 8 bytes, little-endian u64; bit b set
    iff sum(count * ±1_b) > 0; two's-complement int64)."""
    import hashlib
    import re

    words = [w for w in re.split(r"[ \t\n]+", t or "") if w]
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    acc = [0] * 64
    for w, c in counts.items():
        hv = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
        for b in range(64):
            acc[b] += c if (hv >> b) & 1 else -c
    h = 0
    for b in range(64):
        if acc[b] > 0:
            h |= 1 << b
    return h - (1 << 64) if h >= (1 << 63) else h


def test_simhash_vectorized_matches_reference(spark):
    """The NumPy-vectorized batch kernel is differentially checked
    against the per-word reference on edge-heavy inputs."""
    texts = [
        None, "", " \t\n ", "x", "x x x", "a b c d e f g",
        "the quick brown fox " * 40,
        "word\nnewline\ttab  multi   space",
        "\rcarriage stays in token\r", "héllo wörld ünïcode",
        "dup dup dup unique", BASE, BASE.replace("lazy", "sleepy"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["simhash"] for r in simhash64(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _simhash_ref(t), f"doc {i}: {t!r}"


def test_neardup_cosine_exact_pairs(spark, clustered_emb):
    """All-pairs exact path: within-cluster pairs pass tau=0.35,
    cross-cluster (orthogonal) pairs never do; dot values match a
    NumPy int64 reference bit-for-bit."""
    import numpy as np

    from xhtml_parser_spark.operators.similarity import (
        embedding_neardup_pairs_exact,
    )

    got = {
        (r["id_a"], r["id_b"]): r["dot"]
        for r in embedding_neardup_pairs_exact(clustered_emb).collect()
    }
    rows = sorted(clustered_emb.collect(), key=lambda r: r["vec_id"])
    s = np.array([r["embedding"] for r in rows], dtype=np.float64) * 1000
    q = (np.sign(s) * np.floor(np.abs(s) + 0.5)).astype(np.int64)
    na2 = (q * q).sum(1)
    want = {}
    for a in range(len(rows)):
        for b in range(a + 1, len(rows)):
            d = int(q[a] @ q[b])
            if d > 0 and 400 * d * d >= 49 * int(na2[a]) * int(na2[b]):
                want[(a, b)] = d
    assert got == want
    assert all(a < 10 and b < 10 or (a >= 10 and b >= 10) for a, b in got)
    assert any(a < 10 for a, _ in got) and any(a >= 10 for a, _ in got)


def test_neardup_cosine_lsh_subset_of_exact(spark, clustered_emb):
    from xhtml_parser_spark.operators.similarity import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_exact,
    )

    exact = {
        (r["id_a"], r["id_b"], r["dot"])
        for r in embedding_neardup_pairs_exact(clustered_emb).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"], r["dot"])
        for r in embedding_neardup_pairs(clustered_emb, n_bits=4).collect()
    }
    assert lsh <= exact
    assert lsh  # tight clusters land in shared buckets -> nonzero recall


def test_ivf_topk_exact_when_all_cells_probed(spark, clustered_emb):
    """Probing every cell makes IVF equal to the exact scan (assignment
    partitions the corpus, so the union of all inverted lists is the
    whole corpus); a partial probe returns a subset of the exact top-k
    scores, never a higher one."""
    exact = [
        (r["vec_id"], r["dot"])
        for r in brute_force_topk(clustered_emb, 0, k=5).collect()
    ]
    full = [
        (r["vec_id"], r["dot"])
        for r in ivf_topk(clustered_emb, 0, k=5, n_cells=4, n_probe=4).collect()
    ]
    assert full == exact
    # two probes cover the query's cluster even when the query ties
    # between two same-cluster centroids and sits alone in its own
    # cell (dot(q, c0) == dot(q, c2) at this geometry, so single-probe
    # legitimately returns the empty inverted list): probing by
    # (dot DESC, cell) reaches the sibling cell next and recovers the
    # whole cluster, making the partial probe exact here
    part = [
        (r["vec_id"], r["dot"])
        for r in ivf_topk(clustered_emb, 0, k=5, n_cells=4, n_probe=2).collect()
    ]
    assert part == exact


def test_ann_multi_probe_recall_dominates_single_bucket(spark, clustered_emb):
    """Hamming-1 multi-probe must find at least the single-bucket
    candidates and close the gap toward the exact scan."""
    single = {r["vec_id"] for r in ann_lsh_topk(clustered_emb, query_vec_id=0, k=5).collect()}
    probed = {
        r["vec_id"]
        for r in ann_lsh_topk(
            clustered_emb, query_vec_id=0, k=5, multi_probe=1
        ).collect()
    }
    brute = {r["vec_id"] for r in brute_force_topk(clustered_emb, query_vec_id=0, k=5).collect()}
    assert len(probed & brute) >= len(single & brute)
    assert probed <= set(range(1, 10))  # still never crosses clusters


def test_quantization_half_away_from_zero_matches_sql(spark):
    """x*1000 landing exactly on .5 (float32 x = odd/16, e.g. 0.0625 ->
    62.5) must round AWAY from zero like SQL round(), not half-to-even
    like np.rint -- the cross-engine identity of every quantized
    operator depends on it."""
    from xhtml_parser_spark.operators.similarity import (
        embedding_neardup_pairs_exact,
    )

    df = spark.createDataFrame(
        [(0, [0.0625, 0.0]), (1, [0.0625, 0.0]), (2, [-0.0625, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {(r["id_a"], r["id_b"]): r["dot"]
           for r in embedding_neardup_pairs_exact(df).collect()}
    # 0.0625*1000 = 62.5 -> 63 (np.rint would give 62): dot = 63*63
    assert got == {(0, 1): 63 * 63}
    # and the SQL side agrees
    import duckdb

    v = duckdb.sql(
        "SELECT CAST(round(CAST(CAST(0.0625 AS FLOAT) AS DOUBLE)*1000) "
        "AS BIGINT) x"
    ).fetchone()[0]
    assert v == 63


def test_ann_topk_batch_matches_single_calls(spark, clustered_emb):
    """The batch operator's per-query result must equal the single-query
    ann_lsh_topk at the same multi_probe (same candidate ball, same
    deterministic ordering), and its caches must release cleanly."""
    from xhtml_parser_spark.caching import released_after
    from xhtml_parser_spark.operators.similarity import ann_topk_batch

    qids = [0, 3, 15]
    queries = spark.createDataFrame([(q,) for q in qids], "vec_id long")
    from xhtml_parser_spark.caching import live_persists

    with released_after(
        ann_topk_batch(clustered_emb, queries, k=5, multi_probe=1),
        blocking=True,
    ) as batch:
        handles = live_persists(batch)
        assert handles, "batch ANN must attach its bucket cache"
        got = {}
        for r in batch.collect():
            got.setdefault(r["qid"], []).append(
                (r["rank"], r["vec_id"], r["dot"])
            )
    # handle-level check (global storage counts are unstable: the
    # ContextCleaner may GC another test's orphaned cache mid-run)
    for h in handles:
        lvl = h.storageLevel
        assert not (lvl.useMemory or lvl.useDisk), "cache must be released"
    for q in qids:
        single = [
            (i + 1, r["vec_id"], r["dot"])
            for i, r in enumerate(
                ann_lsh_topk(
                    clustered_emb, query_vec_id=q, k=5, multi_probe=1,
                    persist_buckets=False,
                ).collect()
            )
        ]
        assert sorted(got.get(q, [])) == sorted(single), q


def test_ann_topk_batch_null_query_embedding(spark):
    from xhtml_parser_spark.operators.similarity import ann_topk_batch

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, None)],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame([(0,), (2,)], "vec_id long")
    rows = ann_topk_batch(emb, queries, k=3, persist_buckets=False).collect()
    assert {r["qid"] for r in rows} == {0}  # null-embedding query -> no rows


def test_ivf_topk_batch_matches_single_calls(spark, clustered_emb):
    """Batch IVF == per-query ivf_topk at the same codebook/probes."""
    from xhtml_parser_spark.caching import live_persists, released_after
    from xhtml_parser_spark.operators.similarity import ivf_topk_batch

    qids = [0, 3, 15]
    queries = spark.createDataFrame([(q,) for q in qids], "vec_id long")
    with released_after(
        ivf_topk_batch(clustered_emb, queries, k=5, n_cells=4, n_probe=2),
        blocking=True,
    ) as batch:
        handles = live_persists(batch)
        assert handles, "batch IVF must attach its assignment cache"
        got = {}
        for r in batch.collect():
            got.setdefault(r["qid"], []).append((r["rank"], r["vec_id"], r["dot"]))
    for h in handles:
        lvl = h.storageLevel
        assert not (lvl.useMemory or lvl.useDisk)
    for q in qids:
        single = [
            (i + 1, r["vec_id"], r["dot"])
            for i, r in enumerate(
                ivf_topk(
                    clustered_emb, query_vec_id=q, k=5, n_cells=4, n_probe=2,
                    persist_assignments=False,
                ).collect()
            )
        ]
        assert sorted(got.get(q, [])) == sorted(single), q


def _semdedup_replay(rows, n_cells, tau_num, tau_den):
    """Independent plain-Python replay of semantic_dedup: md5-sample
    codebook, argmax assignment (ties to smaller cell), first-wins
    same-cell cosine drop."""
    import hashlib

    def quant(v):
        return [
            int(math.copysign(math.floor(abs(x * 1000.0) + 0.5), x * 1000.0))
            for x in v
        ]

    e = [(i, quant(v)) for i, v in rows if v is not None]
    code = sorted(
        e, key=lambda t: (hashlib.md5(str(t[0]).encode()).hexdigest(), t[0])
    )[:n_cells]
    cells = {}
    for i, q in e:
        dots = [sum(a * b for a, b in zip(q, cv)) for _, cv in code]
        cells[i] = max(range(len(code)), key=lambda c: (dots[c], -c))
    out = {}
    for i, q in sorted(e):
        n2 = sum(x * x for x in q)
        dup = False
        for j, qj in sorted(e):
            if j >= i or cells[j] != cells[i]:
                continue
            d = sum(a * b for a, b in zip(q, qj))
            nj = sum(x * x for x in qj)
            if d > 0 and tau_den**2 * d * d >= tau_num**2 * n2 * nj:
                dup = True
                break
        out[i] = (cells[i], not dup)
    return out


def test_semantic_dedup_matches_replay(spark, clustered_emb):
    """Operator == independent replay on the tight-cluster corpus,
    incl. a null embedding (no row) and a tiny chunk size so the
    blockwise Gram path crosses block boundaries."""
    from xhtml_parser_spark.operators.similarity import semantic_dedup

    emb = clustered_emb.unionByName(
        spark.createDataFrame(
            [(99, None)], "vec_id long, embedding array<float>"
        )
    )
    got = {
        r["vec_id"]: (r["cell"], r["kept"])
        for r in semantic_dedup(
            emb, n_cells=4, tau_num=9, tau_den=10, chunk=3
        ).collect()
    }
    rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]
    want = _semdedup_replay(rows, n_cells=4, tau_num=9, tau_den=10)
    assert got == want
    assert 99 not in got
    # the tight clusters must actually deduplicate at cos >= 0.9
    assert sum(1 for _, k in got.values() if not k) >= 10


def test_semantic_dedup_max_cell_raises(spark, clustered_emb):
    from xhtml_parser_spark.operators.similarity import semantic_dedup

    with pytest.raises(Exception, match="max_cell"):
        semantic_dedup(clustered_emb, n_cells=1, max_cell=5).collect()


def test_kmeans_refine_matches_replay(spark, clustered_emb):
    """2-round Lloyd refinement == an independent plain-Python replay
    (squared-Euclidean argmax, trunc-toward-zero integer means,
    empty-cell carry-over) on the tight-cluster corpus, incl. a null
    embedding; with 4 seeds over 2 real clusters some cells MUST end
    empty, exercising the carry-over path."""
    import hashlib

    from xhtml_parser_spark.operators.similarity import kmeans_refine

    emb = clustered_emb.unionByName(
        spark.createDataFrame(
            [(99, None)], "vec_id long, embedding array<float>"
        )
    )
    got = sorted(
        (r["cell"], tuple(r["cv"]), r["n_members"])
        for r in kmeans_refine(emb, n_cells=4, n_iter=2).collect()
    )

    def quant(v):
        return [
            int(math.copysign(math.floor(abs(x * 1000.0) + 0.5), x * 1000.0))
            for x in v
        ]

    rows = [
        (r["vec_id"], quant(r["embedding"]))
        for r in emb.collect()
        if r["embedding"] is not None
    ]
    code = [
        q
        for _, q in sorted(
            rows,
            key=lambda t: (hashlib.md5(str(t[0]).encode()).hexdigest(), t[0]),
        )[:4]
    ]
    counts = [0] * 4
    for _ in range(2):
        sums = [[0] * len(code[0]) for _ in range(4)]
        counts = [0] * 4
        for _, q in rows:
            best = max(
                range(4),
                key=lambda c: (
                    2 * sum(a * b for a, b in zip(q, code[c]))
                    - sum(x * x for x in code[c]),
                    -c,
                ),
            )
            counts[best] += 1
            for d, x in enumerate(q):
                sums[best][d] += x
        code = [
            [
                (1 if s >= 0 else -1) * (abs(s) // counts[c])
                for s in sums[c]
            ]
            if counts[c]
            else code[c]
            for c in range(4)
        ]
    want = sorted(
        (c, tuple(code[c]), counts[c]) for c in range(4)
    )
    assert got == want
    assert sum(n for _, _, n in got) == 20

    # empty-cell carry-over: identical vectors make both seeds equal,
    # ties send every row to cell 0 and cell 1 must keep its seed
    same = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(3)],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["cell"]: (tuple(r["cv"]), r["n_members"])
        for r in kmeans_refine(same, n_cells=2, n_iter=2).collect()
    }
    assert out[0] == ((1000, 2000), 3)
    assert out[1] == ((1000, 2000), 0)


def test_semantic_dedup_accepts_kmeans_codebook(spark, clustered_emb):
    """Composition: semantic_dedup over a kmeans_refine codebook ==
    the replay run against those refined centroids (dot-based
    assignment, as semantic_dedup defines it)."""
    from xhtml_parser_spark.operators.similarity import (
        kmeans_refine,
        semantic_dedup,
    )

    cb = kmeans_refine(clustered_emb, n_cells=4, n_iter=2)
    got = {
        r["vec_id"]: (r["cell"], r["kept"])
        for r in semantic_dedup(
            clustered_emb, tau_num=9, tau_den=10, codebook=cb
        ).collect()
    }
    code = {r["cell"]: list(r["cv"]) for r in cb.collect()}

    def quant(v):
        return [
            int(math.copysign(math.floor(abs(x * 1000.0) + 0.5), x * 1000.0))
            for x in v
        ]

    e = sorted(
        (r["vec_id"], quant(r["embedding"]))
        for r in clustered_emb.collect()
        if r["embedding"] is not None
    )
    cells = {
        i: max(
            sorted(code),
            key=lambda c: (sum(a * b for a, b in zip(q, code[c])), -c),
        )
        for i, q in e
    }
    want = {}
    for i, q in e:
        n2 = sum(x * x for x in q)
        dup = any(
            cells[j] == cells[i]
            and (d := sum(a * b for a, b in zip(q, qj))) > 0
            and 100 * d * d >= 81 * n2 * sum(x * x for x in qj)
            for j, qj in e
            if j < i
        )
        want[i] = (cells[i], not dup)
    assert got == want
    assert len(got) == 20


def test_ivf2_assign_matches_replay_and_plan(spark, clustered_emb):
    """Two-level assignment == plain-Python replay (coarse argmax,
    per-cell md5-sampled fine codebook, fine argmax); nulls drop; the
    plan must run the fine stage as a COGROUP (FlatMapCoGroupsInPandas)
    with no broadcast -- the fine codebook never enters a closure."""
    import contextlib
    import hashlib
    import io

    from xhtml_parser_spark.operators.similarity import ivf2_assign

    emb = clustered_emb.unionByName(
        spark.createDataFrame(
            [(99, None)], "vec_id long, embedding array<float>"
        )
    )
    out_df = ivf2_assign(emb, n1=2, n2=3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out_df.explain("formatted")
    plan = buf.getvalue()
    assert "FlatMapCoGroupsInPandas" in plan, plan
    assert "BroadcastExchange" not in plan, plan
    got = sorted(tuple(r) for r in out_df.collect())

    def quant(v):
        return [
            int(math.copysign(math.floor(abs(x * 1000.0) + 0.5), x * 1000.0))
            for x in v
        ]

    e = sorted(
        (r["vec_id"], quant(r["embedding"]))
        for r in emb.collect()
        if r["embedding"] is not None
    )

    def md5key(i):
        return (hashlib.md5(str(i).encode()).hexdigest(), i)

    code = [q for _, q in sorted(e, key=lambda t: md5key(t[0]))[:2]]

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    coarse = {i: max(range(2), key=lambda c: (dot(q, code[c]), -c))
              for i, q in e}
    fine_cb = {}
    for c in range(2):
        members = sorted(
            (i for i, _ in e if coarse[i] == c), key=md5key
        )[:3]
        fine_cb[c] = [dict(e)[i] for i in members]
    want = sorted(
        (
            i,
            coarse[i],
            max(
                range(len(fine_cb[coarse[i]])),
                key=lambda f: (dot(q, fine_cb[coarse[i]][f]), -f),
            ),
        )
        for i, q in e
    )
    assert got == want
    assert len(got) == 20


def test_codebook_noncontiguous_cells_raise(spark, clustered_emb):
    """A caller-supplied codebook whose cell ids are not exactly
    0..K-1 must raise instead of silently relabeling cells (every
    consumer sorts by cell and reports the POSITIONAL argmax)."""
    from xhtml_parser_spark.operators.similarity import semantic_dedup

    cb = spark.createDataFrame(
        [(0, [1000, 0, 0, 0]), (2, [0, 0, 1000, 0])],
        "cell bigint, cv array<bigint>",
    )
    with pytest.raises(Exception, match="0..1"):
        semantic_dedup(clustered_emb, codebook=cb).collect()


def test_tau_ratio_validated_at_entry(spark, clustered_emb):
    """tau_num > tau_den (cosine threshold > 1) must raise at entry in
    BOTH rational-cosine operators: past the guard, the tn2*na2*nb2
    side of the int64 exactness test can wrap silently and flip
    kept/pair decisions instead of erroring."""
    from xhtml_parser_spark.operators.similarity import (
        embedding_neardup_pairs,
        semantic_dedup,
    )

    with pytest.raises(ValueError, match="tau_num"):
        embedding_neardup_pairs(clustered_emb, tau_num=21, tau_den=20)
    with pytest.raises(ValueError, match="tau_num"):
        semantic_dedup(clustered_emb, tau_num=21, tau_den=20)
    with pytest.raises(ValueError, match="tau_num"):
        embedding_neardup_pairs(clustered_emb, tau_num=0, tau_den=20)


def test_kmeans_refine_overflow_guard_raises(spark):
    """Coordinate sums that could exceed int64 must raise (np.add.at
    wraps silently): 3 rows with |q| ~ 5e18 push n_rows * max|q| past
    2^63 while each individual quantized coordinate still fits."""
    from xhtml_parser_spark.operators.similarity import kmeans_refine

    big = 5.0e15  # quantized x1000 -> ~5e18; 3 * 5e18 > 2^63-1
    emb = spark.createDataFrame(
        [(i, [big, 1.0 * i]) for i in range(3)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="int64"):
        kmeans_refine(emb, n_cells=2, n_iter=1).collect()
