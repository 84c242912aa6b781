"""Unit tests for corpus-curation operators (operators/corpus.py):
per-host quota, deterministic hash sampling, duplicate n-gram stats,
Bloom-gated incremental dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from xhtml_parser_spark.operators.corpus import (
    build_bloom,
    curation_funnel,
    duplicate_ngram_stats,
    hash_sample,
    host_cap,
    incremental_dedup,
)


def _skewed_docs(spark, n_hot=200, n_cold=5):
    rows = [(i, "hot.example") for i in range(n_hot)]
    rows += [(1000 + i, f"cold{i}.example") for i in range(n_cold)]
    return spark.createDataFrame(rows, "doc_id bigint, source string")


def test_host_cap_matches_plain_rank(spark):
    """The two-phase salted top-k must equal the textbook single
    row_number() per host, including rank values."""
    docs = _skewed_docs(spark)
    got = host_cap(docs, k=7, n_salts=4).collect()
    w = Window.partitionBy("source").orderBy("doc_id")
    want = (
        docs.withColumn("host_rank", F.row_number().over(w))
        .where(F.col("host_rank") <= 7)
        .select("doc_id", F.col("source").alias("host"), "host_rank")
        .collect()
    )
    assert sorted([tuple(r) for r in got], key=lambda t: (t[1], t[2])) == sorted(
        [tuple(r) for r in want], key=lambda t: (t[1], t[2])
    )
    # the hot host is capped, cold hosts keep everything
    hosts = [r["host"] for r in got]
    assert hosts.count("hot.example") == 7
    assert hosts.count("cold0.example") == 1


def test_host_cap_k_larger_than_host(spark):
    docs = _skewed_docs(spark, n_hot=3, n_cold=2)
    got = host_cap(docs, k=10, n_salts=4).collect()
    assert len(got) == 5  # nothing dropped


def test_hash_sample_is_deterministic_partition_of_ids(spark):
    docs = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["bucket"] for r in hash_sample(docs, 3, 10).collect()}
    b = {r["doc_id"]: r["bucket"] for r in hash_sample(docs, 3, 10).collect()}
    assert a == b
    assert all(0 <= v < 3 for v in a.values())
    # num=den keeps everything; num=0 keeps nothing
    assert hash_sample(docs, 10, 10).count() == 300
    assert hash_sample(docs, 0, 10).count() == 0
    # a 3/10 sample is a subset of the 5/10 sample (bucket monotone)
    big = {r["doc_id"] for r in hash_sample(docs, 5, 10).collect()}
    assert set(a) <= big


def test_duplicate_ngram_stats_handmade(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # grams: "a b c", "b c d"
            (2, "a b c x"),        # grams: "a b c", "b c x"
            (3, "zz yy"),          # short doc -> one whole-text gram
            (4, "zz yy"),          # identical short doc
            (5, "q r s t"),        # all-unique grams
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: (r["n_grams"], r["dup_grams"])
           for r in duplicate_ngram_stats(docs).collect()}
    assert got == {
        1: (2, 1),   # shares "a b c" with doc 2
        2: (2, 1),
        3: (1, 1),   # whole-text gram shared with doc 4
        4: (1, 1),
        5: (2, 0),
    }


@pytest.mark.parametrize("m_bits", [8, 1 << 16])
def test_incremental_dedup_equals_anti_join(spark, m_bits):
    """Exactness must hold at both extremes: a saturated 8-bit Bloom
    (everything takes the maybe/anti-join path) and a roomy one
    (most rows take the definite-new fast path)."""
    base = spark.createDataFrame(
        [(i, f"text {i}") for i in range(50)], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [(100 + i, f"text {i * 2}") for i in range(50)],  # evens overlap base
        "doc_id bigint, text string",
    )
    got = incremental_dedup(new, base, m_bits=m_bits, k=3).collect()
    kept = sorted(r["doc_id"] for r in got)
    want = sorted(
        r["doc_id"]
        for r in new.join(
            base.select(
                F.md5(F.encode(F.col("text"), "UTF-8")).alias("h")
            ).distinct(),
            F.md5(F.encode(F.col("text"), "UTF-8")) == F.col("h"),
            "left_anti",
        ).collect()
    )
    assert kept == want
    if m_bits == 8:
        assert all(r["was_maybe"] == 1 for r in got)  # saturated filter


def test_curation_funnel_every_stage_drops(spark):
    """Handcrafted corpus where each stage removes a known doc."""
    good = "the and of " * 4 + " ".join(f"w{i}" for i in range(20))
    rep = "the and of " + "spam " * 30 + "x y z"  # top word 30 of ~36
    rows = [
        (1, good, "en", "h1"),            # survives everything
        (2, good, "en", "h1"),            # exact dup of 1 -> dedup drop
        (3, good, "fr", "h1"),            # pred en != fr -> lang drop
        (4, "the and of tiny", "en", "h1"),  # 4 words -> quality drop
        (5, rep, "en", "h1"),             # repetition drop
        (6, good + " tail6", "en", "h1"),  # survives; h1 now has 3 survivors
        (7, good + " tail7", "en", "h1"),  # host_cap k=2 drops the 3rd
        (8, good + " tail8", "en", "h2"),  # other host, survives
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string, source string")
    got = {
        r["stage"]: r["rows_kept"]
        for r in curation_funnel(
            docs, min_words=10, rep_mult=8, k_host=2,
            sample_num=1, sample_den=1,  # keep-all sample stage
        ).collect()
    }
    assert got == {
        "input": 8,
        "lang": 7,        # doc 3 out
        "quality": 6,     # doc 4 out
        "repetition": 5,  # doc 5 out
        "dedup": 4,       # doc 2 out
        "host_cap": 3,    # one of 1/6/7 out (h1 capped at 2)
        "sample": 3,
    }


def test_paragraph_dedup_first_wins(spark):
    from xhtml_parser_spark.operators.corpus import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta\ngamma"),
            (2, "beta\ndelta"),        # beta seen in doc 1 -> dropped
            (3, "alpha\nbeta"),        # everything seen -> empty doc
            (4, ""),                   # one empty paragraph, first seen
            (5, "eps\neps"),           # within-doc dup: keep first only
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: (r["clean_text"], r["n_paras"], r["kept_paras"])
           for r in paragraph_dedup(docs).collect()}
    assert got == {
        1: ("alpha\nbeta\ngamma", 3, 3),
        2: ("delta", 2, 1),
        3: ("", 2, 0),
        4: ("", 1, 1),
        5: ("eps", 2, 1),
    }


def _random_corpus(n_docs=200, seed=7):
    """Deterministic random corpus with real collision structure:
    small vocab, geometric doc lengths, 20% exact-dup docs, newlines
    sprinkled in so paragraphs exist."""
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(n_docs):
        if texts and rng.random() < 0.2:
            texts.append(rng.choice(texts))  # exact dup
            continue
        n = rng.randint(0, 40)
        words = [rng.choice(vocab) for _ in range(n)]
        s = " ".join(words)
        # fold some spaces to newlines for paragraph structure
        s = "\n".join(p for p in s.split(" w3 ")) if "w3" in s else s
        texts.append(s)
    return [(i, t, f"h{i % 7}") for i, t in enumerate(texts)]


def test_paragraph_dedup_matches_python_replica(spark):
    from xhtml_parser_spark.operators.corpus import paragraph_dedup

    rows = _random_corpus()
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: (r["clean_text"], r["n_paras"], r["kept_paras"])
           for r in paragraph_dedup(docs).collect()}

    seen: set[str] = set()
    want = {}
    for i, t, _ in rows:  # replica: first occurrence in (doc_id, pos) order
        paras = (t or "").split("\n")
        kept = []
        for p in paras:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        want[i] = ("\n".join(kept), len(paras), len(kept))
    assert got == want


def test_host_cap_matches_python_replica(spark):
    from xhtml_parser_spark.operators.corpus import host_cap

    rows = _random_corpus()
    docs = spark.createDataFrame(
        [(i, h) for i, _, h in rows], "doc_id bigint, source string"
    )
    got = sorted(tuple(r) for r in host_cap(docs, k=9, n_salts=3).collect())
    by_host: dict[str, list[int]] = {}
    for i, _, h in sorted(rows):
        by_host.setdefault(h, []).append(i)
    want = sorted(
        (i, h, rank + 1)
        for h, ids in by_host.items()
        for rank, i in enumerate(sorted(ids)[:9])
    )
    assert got == want


def test_duplicate_ngram_stats_matches_python_replica(spark):
    from xhtml_parser_spark.operators.corpus import duplicate_ngram_stats
    from xhtml_parser_spark.operators.dedup import shingle_list

    rows = _random_corpus()
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: (r["n_grams"], r["dup_grams"])
           for r in duplicate_ngram_stats(docs).collect()}
    sets = {i: set(shingle_list(t)) for i, t, _ in rows}
    from collections import Counter

    df = Counter(g for s in sets.values() for g in s)
    want = {
        i: (len(s), sum(1 for g in s if df[g] >= 2)) for i, s in sets.items()
    }
    assert got == want


def test_curation_funnel_zero_survivors_counts_are_zero(spark):
    """SUM over zero rows is NULL in Spark; the funnel must coalesce
    so stage counts read 0 (matching the oracle's count(*))."""
    docs = spark.createDataFrame(
        [(1, "tiny", "en", "h1")], "doc_id bigint, text string, lang string, source string"
    )
    got = {r["stage"]: r["rows_kept"]
           for r in curation_funnel(docs, min_words=100).collect()}
    assert got == {
        "input": 1, "lang": 1, "quality": 0, "repetition": 0,
        "dedup": 0, "host_cap": 0, "sample": 0,
    }


def test_paragraph_dedup_oracle_handles_wordless_docs(spark):
    """The entry-query oracle must keep zero-word documents (they
    carry one empty paragraph on the Spark side) -- regression for a
    row-count mismatch on corpora containing empty/NULL/whitespace
    texts."""
    import duckdb
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    import tempfile

    rows = [(0, "a b c d e f g h i j"), (1, ""), (2, None), (3, "  \t ")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "documents.parquet")
        docs.toPandas().to_parquet(p)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
        oracle = con.execute(entrymod.oracle_sql()["paragraph_dedup"]).fetchall()
        got = entrymod.queries()["paragraph_dedup"](spark, d).collect()
    assert len(oracle) == len(got) == 4
    o = {r[0]: (r[1], r[2], r[3]) for r in oracle}
    s = {r["doc_id"]: (r["clean_text"], r["n_paras"], r["kept_paras"]) for r in got}
    assert o == s
    # the three wordless docs share the '' paragraph: first one wins
    assert s[1] == ("", 1, 1) and s[2] == ("", 1, 0) and s[3] == ("", 1, 0)


def test_build_bloom_validates_params(spark):
    df = spark.createDataFrame([("00" * 16,)], "h string")
    with pytest.raises(ValueError):
        build_bloom(df, m_bits=1 << 10, k=5)
    with pytest.raises(ValueError):
        build_bloom(df, m_bits=12, k=3)


def test_decontaminate_handmade(spark):
    from xhtml_parser_spark.operators.corpus import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),      # shares "a b c" with the benchmark
            (2, "x y z w"),      # clean
            (3, "a b c"),        # exactly one benchmark gram
            (4, "zz"),           # short doc -> whole-text gram, clean
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "q q a b c q q")], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: (r["n_grams"], r["bench_grams"])
           for r in decontaminate(docs, bench).collect()}
    assert got == {1: (2, 1), 2: (2, 0), 3: (1, 1), 4: (1, 0)}


def test_decontaminate_self_benchmark_is_total(spark):
    from xhtml_parser_spark.operators.corpus import decontaminate

    docs = spark.createDataFrame(
        [(i, f"w{i} common words here {i}") for i in range(10)],
        "doc_id bigint, text string",
    )
    got = decontaminate(docs, docs).collect()
    assert all(r["bench_grams"] == r["n_grams"] for r in got)


def test_remove_duplicate_ngrams_handmade(spark):
    from xhtml_parser_spark.operators.corpus import remove_duplicate_ngrams

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),   # "a b c" dup with doc 2 -> drop a,b,c
            (2, "z a b c y"),   # covered positions 1..3 -> keep z,y
            (3, "p q r s"),     # unique -> intact
            (4, "m m m m m m"), # self-repeating trigram -> fully covered
            (5, "xx yy"),       # < n words, no grams -> intact
            (6, None),          # null text
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: (r["clean_text"], r["n_words"], r["kept_words"])
           for r in remove_duplicate_ngrams(docs, n=3, min_count=2).collect()}
    assert got == {
        1: ("d e", 5, 2),
        2: ("z y", 5, 2),
        3: ("p q r s", 4, 4),
        4: ("", 6, 0),
        5: ("xx yy", 2, 2),
        6: ("", 0, 0),
    }


def test_remove_duplicate_ngrams_matches_python_replica(spark):
    """Differential vs a direct per-corpus Python replica on a random
    small-vocabulary corpus (dense duplicate structure)."""
    import random

    from collections import Counter

    from xhtml_parser_spark.operators.corpus import remove_duplicate_ngrams

    rng = random.Random(7)
    vocab = ["a", "b", "c", "d"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 12))))
        for i in range(60)
    ]
    n = 3
    words = {i: [w for w in t.split(" ") if w] for i, t in rows}
    cnt = Counter(
        " ".join(ws[j : j + n])
        for ws in words.values()
        for j in range(len(ws) - n + 1)
    )
    want = {}
    for i, ws in words.items():
        cov = set()
        for j in range(len(ws) - n + 1):
            if cnt[" ".join(ws[j : j + n])] >= 2:
                cov.update(range(j, j + n))
        kept = [w for j, w in enumerate(ws) if j not in cov]
        want[i] = (" ".join(kept), len(ws), len(kept))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_words"], r["kept_words"])
           for r in remove_duplicate_ngrams(docs, n=n, min_count=2).collect()}
    assert got == want


def test_remove_duplicate_ngrams_validates_n(spark):
    from xhtml_parser_spark.operators.corpus import remove_duplicate_ngrams

    docs = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        remove_duplicate_ngrams(docs, n=1)


def test_pack_sequences_matches_single_window(spark):
    """The two-level parallel prefix sum must equal one global ordered
    running sum, including across bucket boundaries and zero-token
    docs; sparse non-contiguous ids exercise empty buckets."""
    import random

    from xhtml_parser_spark.operators.corpus import pack_sequences

    rng = random.Random(3)
    rows = [
        (i * 13 + (i % 3), " ".join("w" for _ in range(rng.randrange(0, 9))))
        for i in range(200)
    ]
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_offset"], r["first_seq"], r["last_seq"])
        for r in pack_sequences(
            spark.createDataFrame(rows, "doc_id bigint, text string"),
            seq_len=7,
            bucket_size=64,
        ).collect()
    }
    off = 0
    for i, text in sorted(rows):
        n = len([w for w in text.split(" ") if w])
        fs = -1 if n == 0 else off // 7
        ls = -1 if n == 0 else (off + n - 1) // 7
        assert got[i] == (n, off, fs, ls), i
        off += n


def test_pack_sequences_degenerate_bucket_sizes(spark):
    """bucket_size=1 (every doc its own bucket) and a huge bucket
    (single window) must agree."""
    from xhtml_parser_spark.operators.corpus import pack_sequences

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(10)], "doc_id bigint, text string"
    )
    a = sorted(map(tuple, pack_sequences(docs, 4, bucket_size=1).collect()))
    b = sorted(map(tuple, pack_sequences(docs, 4, bucket_size=1 << 30).collect()))
    assert a == b


def test_pack_sequences_validates_params(spark):
    from xhtml_parser_spark.operators.corpus import pack_sequences

    docs = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        pack_sequences(docs, seq_len=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, seq_len=8, bucket_size=0)


def test_mixture_sample(spark):
    """Domain rebalancing: quota arithmetic, keep-all saturation,
    absent-target drop, and agreement with a Python integer replica."""
    import hashlib

    from pyspark.sql import functions as F

    from xhtml_parser_spark.operators.corpus import mixture_sample

    n, den = 1000, 10_000
    docs = spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), (F.col("id") % 4).cast("string")).alias("domain"),
    )
    weights = {"d0": 1, "d1": 1, "d2": 8}  # d3 absent -> dropped
    targets = spark.createDataFrame(
        list(weights.items()), "domain string, weight int"
    )
    got = {
        (r["doc_id"], r["domain"], r["bucket"], r["keep_num"])
        for r in mixture_sample(docs, targets, den=den).collect()
    }
    # exact integer replica
    wsum = sum(weights.values())
    cnt = {f"d{i}": n // 4 for i in range(4)}
    want = set()
    for i in range(n):
        dom = f"d{i % 4}"
        w = weights.get(dom)
        if w is None:
            continue
        share = w * den // wsum
        keep = min(den, share * n // cnt[dom])
        bucket = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % den
        if bucket < keep:
            want.add((i, dom, bucket, keep))
    assert got == want
    # saturation: the over-weighted domain keeps everything
    assert all(k == den for (_, d, _, k) in got if d == "d2")
    assert sum(1 for (_, d, _, _) in got if d == "d2") == cnt["d2"]
    assert not any(d == "d3" for (_, d, _, _) in got)


def test_distinct_kmv_sketch(spark):
    """KMV sketch: duplicate-invariant, exact below k, ~accurate above
    it, deterministic across partitionings, k bounds enforced."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from xhtml_parser_spark.operators.corpus import distinct_kmv

    base = spark.range(5000).select(F.col("id").alias("value"))
    r = distinct_kmv(base, k=256).collect()[0]
    assert r["k_used"] == 256
    assert abs(r["est_distinct"] - 5000) / 5000 < 0.25
    # duplicates don't move the sketch
    r3 = distinct_kmv(base.unionAll(base), k=256).collect()[0]
    assert tuple(r3) == tuple(r)
    # repartitioning doesn't either (the estimate is a pure function
    # of the value SET)
    r4 = distinct_kmv(base.repartition(17), k=256).collect()[0]
    assert tuple(r4) == tuple(r)
    # exact regime
    small = distinct_kmv(
        spark.range(40).select(F.col("id").alias("value")), k=256
    ).collect()[0]
    assert (small["k_used"], small["est_distinct"]) == (40, 40)
    # empty input
    empty = distinct_kmv(
        spark.range(0).select(F.col("id").alias("value")), k=256
    ).collect()[0]
    assert (empty["k_used"], empty["kth_hash"], empty["est_distinct"]) == (
        0, None, 0,
    )
    with _pytest.raises(ValueError):
        distinct_kmv(base, k=1)


def test_value_quantiles_nearest_rank(spark):
    """Exact nearest-rank semantics: uniform domain hits the exact
    percentiles, a skewed two-value distribution picks the mass
    holder, nulls drop, bad q raises."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from xhtml_parser_spark.operators.corpus import value_quantiles

    df = spark.range(101).select(F.col("id").alias("value"))
    got = {r["q"]: r["value"] for r in value_quantiles(df).collect()}
    assert got == {25: 25, 50: 50, 75: 75, 90: 90, 99: 99}

    skew = spark.createDataFrame(
        [(5,)] * 90 + [(50,)] * 10 + [(None,)], "value long"
    )
    got2 = {
        r["q"]: (r["value"], r["n_total"])
        for r in value_quantiles(skew, [50, 95]).collect()
    }
    assert got2 == {50: (5, 100), 95: (50, 100)}  # null dropped from n
    with _pytest.raises(ValueError):
        value_quantiles(df, [101])
