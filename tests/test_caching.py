"""Scoped cache lifecycle (xhtml_parser_spark.caching).

The contract under test: operators that persist an intermediate attach
the handle to their returned DataFrame, and ``released_after`` /
``cache_scope`` return executor storage to its pre-call baseline after
the result is materialized -- VERDICT round-2 item #6 (live persists
behind lsh_candidate_pairs, ivf_topk, curation_funnel,
duplicate_ngram_stats, remove_duplicate_ngrams, lm_surprisal).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xhtml_parser_spark.caching import (
    attach_persists,
    cache_scope,
    live_persists,
    release,
    released_after,
)


def _cached_rdd_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def _storage_entries(spark) -> int:
    """RDDs currently holding storage (cached + materialized)."""
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


@pytest.fixture(autouse=True)
def _clean_storage(spark):
    """These tests measure storage deltas; start each from a clean
    slate so another module's leftover cache (shared session) cannot
    skew the baseline."""
    spark.catalog.clearCache()
    for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray():
        spark.sparkContext._jsc.getPersistentRDDs().get(k).unpersist(True)
    yield


@pytest.fixture()
def docs(spark):
    return spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta doc "),
            (F.col("id") % 7).cast("string"),
        ).alias("text"),
        F.concat(F.lit("h"), (F.col("id") % 5).cast("string")).alias("source"),
    )


def test_attach_and_release_roundtrip(spark, docs):
    baseline = _cached_rdd_ids(spark)
    cached = docs.persist()
    out = attach_persists(docs.select("doc_id"), cached)
    assert live_persists(out) == (cached,)
    out.count()
    assert _cached_rdd_ids(spark) - baseline
    release(out)
    assert _cached_rdd_ids(spark) == baseline
    assert live_persists(out) == ()
    release(out)  # idempotent


def test_attach_propagates_chained_handles(spark, docs):
    inner = docs.persist()
    mid = attach_persists(docs.select("doc_id"), inner)
    outer_cache = mid.persist()
    out = attach_persists(mid.select("doc_id"), outer_cache)
    handles = live_persists(out)
    assert inner in handles and outer_cache in handles
    release(out)
    assert _storage_entries(spark) == 0


def test_released_after_context(spark, docs):
    from xhtml_parser_spark.operators.dedup import lsh_candidate_pairs

    baseline = _cached_rdd_ids(spark)
    with released_after(
        lsh_candidate_pairs(docs, n_hashes=2), blocking=True
    ) as pairs:
        pairs.count()
        assert live_persists(pairs), "lsh must attach its signature cache"
        assert _cached_rdd_ids(spark) - baseline, "cache must be live inside"
    assert _cached_rdd_ids(spark) == baseline


def test_released_after_releases_on_error(spark, docs):
    cached = docs.persist()
    out = attach_persists(docs.select("doc_id"), cached)
    out.count()
    baseline_exceeded = bool(_cached_rdd_ids(spark))
    with pytest.raises(RuntimeError):
        with released_after(out):
            raise RuntimeError("boom")
    assert baseline_exceeded and not live_persists(out)
    assert _storage_entries(spark) == 0


@pytest.mark.parametrize(
    "opname",
    [
        "duplicate_ngram_stats",
        "remove_duplicate_ngrams",
        "pack_sequences",
        "curation_funnel",
        "lm_surprisal",
        "ivf_topk",
        "ann_lsh_topk",
        "bm25_topk",
        "nb_classify",
    ],
)
def test_operators_attach_their_persists(spark, docs, opname):
    """Every operator the round-2 verdict flagged (plus pack_sequences
    and lm_surprisal) must attach its live persists so released_after
    frees ALL storage it allocated."""
    emb = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: (F.col("id") % 13 + i).cast("float"),
        ).alias("embedding"),
    )
    import xhtml_parser_spark.operators.corpus as corpus
    import xhtml_parser_spark.operators.similarity as similarity
    import xhtml_parser_spark.operators.retrieval as retrieval
    import xhtml_parser_spark.operators.textops as textops

    builders = {
        "duplicate_ngram_stats": lambda: corpus.duplicate_ngram_stats(docs),
        "remove_duplicate_ngrams": lambda: corpus.remove_duplicate_ngrams(docs),
        "pack_sequences": lambda: corpus.pack_sequences(docs, 32),
        "curation_funnel": lambda: corpus.curation_funnel(
            docs.withColumn("lang", F.lit("en")), target_match_col="lang"
        ),
        "lm_surprisal": lambda: textops.lm_surprisal(
            docs, docs.where(F.col("doc_id") % 3 == 0)
        ),
        "ivf_topk": lambda: similarity.ivf_topk(
            emb, query_vec_id=1, k=5, n_cells=4, n_probe=2, id_col="doc_id"
        ),
        "ann_lsh_topk": lambda: similarity.ann_lsh_topk(
            emb, 1, k=5, id_col="doc_id"
        ),
        "bm25_topk": lambda: retrieval.bm25_topk(
            docs, docs.where(F.col("doc_id") % 3 == 0), persist_postings=True
        ),
        "nb_classify": lambda: retrieval.nb_classify(
            docs.withColumn("lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("fr")),
            label_col="lang",
            persist_model=True,
        ),
    }
    assert _storage_entries(spark) == 0, "dirty storage before test"
    baseline = _cached_rdd_ids(spark)
    with released_after(builders[opname](), blocking=True) as out:
        assert live_persists(out), f"{opname} did not attach its persists"
        out.count()
    assert _cached_rdd_ids(spark) == baseline
    assert _storage_entries(spark) == 0


def test_cache_scope_releases_only_inner(spark, docs):
    outer = docs.persist()
    outer.count()
    before = _cached_rdd_ids(spark)
    assert before
    with cache_scope(spark):
        inner = docs.select("doc_id", "text").persist()
        inner.count()
        assert _cached_rdd_ids(spark) - before
    assert _cached_rdd_ids(spark) == before, "outer cache must survive"
    outer.unpersist(True)
    assert _storage_entries(spark) == 0
