"""Corpus-curation operators for web-scale training-data pipelines:
per-host quotas, deterministic hash sampling, corpus-wide duplicate
n-gram statistics, benchmark decontamination, duplicated-passage
removal, and Bloom-gated incremental dedup.

These are the selection/curation steps a Common-Crawl-style pipeline
runs between extraction and training-set assembly. Scale notes:

  host_cap            two-phase (salted) top-k per host: phase 1 caps
                      each (host, salt) shard to k rows so the phase-2
                      per-host shuffle carries at most salt*k rows per
                      host no matter how hot the host is -- a plain
                      row_number() over host would funnel a 10^9-page
                      host into ONE task
  hash_sample         pure map-side (md5-bucket predicate, codegen);
                      no shuffle, deterministic across engines
  duplicate_ngram_stats
                      one Arrow shingling pass (map-side), then
                      relational gram-frequency join: shuffles distinct
                      (doc, gram) pairs twice (gram-count aggregate +
                      join back) and aggregates per doc
  incremental_dedup   Bloom-gated anti-join of a new batch against a
                      base corpus: the base is folded into an m-bit
                      Bloom bitmap (one binary row per partition,
                      OR-combined on the driver, broadcast back), so
                      only the maybe-duplicate sliver of the new batch
                      pays the anti-join shuffle; definite-new rows
                      never shuffle at all

All outputs are integers / md5 hex strings so the DuckDB oracle can
replay them exactly (including the Bloom maybe-flag, which is pure
md5 arithmetic).

Operators that persist an intermediate the returned DataFrame still
reads attach the handle via ``caching.attach_persists``; release with
``caching.released_after(df)`` after materializing.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..caching import attach_persists
from .dedup import shingle_list


def host_cap(
    docs: DataFrame,
    k: int,
    host_col: str = "source",
    id_col: str = "doc_id",
    n_salts: int = 16,
) -> DataFrame:
    """Per-host quota: keep at most ``k`` documents per host, the k
    smallest ``id_col`` values (deterministic). Output
    (doc_id, host, host_rank) with host_rank in 1..k.

    Two-phase exact top-k: phase 1 partitions by (host, salt) where
    salt = doc_id % n_salts and keeps k rows per shard; phase 2 ranks
    the survivors per host. The phase-2 input is bounded at
    n_salts * k rows per host, so a host with 10^9 pages costs the
    same as one with 10^3 -- the skew-safe shape of "top-k per key"
    at web scale (a single row_number() over host is the textbook
    hot-key funnel).
    """
    h = F.col(host_col).alias("host")
    base = docs.select(F.col(id_col).alias("doc_id"), h)
    salt = (F.col("doc_id") % F.lit(n_salts)).alias("salt")
    w1 = Window.partitionBy("host", "salt").orderBy("doc_id")
    phase1 = (
        base.select("doc_id", "host", salt)
        .withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= k)
        .drop("rn", "salt")
    )
    w2 = Window.partitionBy("host").orderBy("doc_id")
    return (
        phase1.withColumn("host_rank", F.row_number().over(w2))
        .where(F.col("host_rank") <= k)
        .select("doc_id", "host", F.col("host_rank").cast("int").alias("host_rank"))
    )


def hash_sample(
    docs: DataFrame,
    num: int,
    den: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic hash sampling: keep rows whose md5-derived bucket
    (first 32 bits of md5(id) mod den) is < num -- i.e. a num/den
    sample that is stable across runs, engines, and partitionings.
    Output (doc_id, bucket).

    Pure map-side codegen predicate (no shuffle, no RNG state); the
    same row set is selected by any engine that has md5, which is what
    makes held-out splits reproducible across a pipeline rewrite.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % F.lit(den)
    ).alias("bucket")
    return (
        docs.select(F.col(id_col).alias("doc_id"), bucket)
        .where(F.col("bucket") < num)
        .select("doc_id", F.col("bucket").cast("bigint").alias("bucket"))
    )


def _shingle_only_batches(text_col: str, id_col: str):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "sh": [sorted(set(shingle_list(t))) for t in pdf[text_col]],
                }
            )

    return run


def _shingle_sets_batches(text_col: str):
    """Shingles only -- no id column, so the text never rides back out
    of the Python worker alongside its grams."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"sh": [sorted(set(shingle_list(t))) for t in pdf[text_col]]}
            )

    return run


def duplicate_ngram_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide duplicate n-gram fraction (the Lee et al. 2021
    "Deduplicating Training Data Makes Language Models Better" signal,
    at shingle granularity): for each document, how many of its
    distinct word-trigrams occur in at least one OTHER document.
    Output (doc_id, n_grams, dup_grams); the downstream filter divides.

    Shingling (the per-row heavy step) is ONE map-side Arrow pass,
    persisted before the plan fans out -- the exploded pairs feed both
    the gram-frequency aggregate and the join probe side, which
    without the persist would duplicate the scan+shingle subtree under
    each join input. Shingles are embarrassingly per-document, so
    shuffling raw tokens to form grams relationally would move the
    whole corpus for no reason. Only distinct (doc, gram) pairs
    shuffle: once into the gram-frequency aggregate (map-side partial
    agg, so the wire carries one row per distinct gram per map task)
    and once to join document-frequency back. Gram strings could be
    md5-compressed before the shuffle at 100 TB; kept raw here so the
    oracle join is byte-transparent. The persist is left live because
    the returned DataFrame reads through it; the handle is attached,
    release with caching.released_after(df) after the action.
    """
    schema = StructType(
        [
            StructField("doc_id", docs.schema[id_col].dataType),
            StructField("sh", ArrayType(StringType())),
        ]
    )
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias(text_col))
    sh = src.mapInPandas(_shingle_only_batches(text_col, "doc_id"), schema)
    pairs = sh.select("doc_id", F.explode("sh").alias("g")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    gram_df = pairs.groupBy("g").agg(F.count("*").alias("df"))
    return attach_persists(
        pairs.join(gram_df, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("dup_grams"),
        ),
        pairs,
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n_partitions: int | None = None,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C / Lee et al.
    overlap rule at shingle granularity): for each training document,
    count how many of its distinct word-trigrams also occur anywhere
    in the ``benchmark`` (eval-set) corpus. Output
    (doc_id, n_grams, bench_grams); the downstream policy drops or
    flags docs with bench_grams > 0 (or a fraction threshold).

    Scale shape: the training side is shingled in ONE map-side Arrow
    pass; the benchmark side (eval sets are tiny next to a 100 TB
    corpus) collapses to a distinct-gram dimension that Spark
    broadcast-joins, so the only shuffle is the per-doc aggregate of
    already-joined slim rows (map-side partial agg). Nothing about the
    plan grows with corpus size except the number of map tasks.
    ``n_partitions`` opts into an upfront round-robin repartition for
    the skinny-scan/heavy-compute case (few input splits would
    otherwise serialize the Arrow shingling into few tasks).
    ``broadcast_bench=False`` switches the gram join to a shuffle join
    for the rare benchmark too large to broadcast (the hint is a hard
    requirement to Spark, not advisory -- an oversized broadcast fails
    the job rather than degrading).
    """
    schema = StructType(
        [
            StructField("doc_id", docs.schema[id_col].dataType),
            StructField("sh", ArrayType(StringType())),
        ]
    )
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias(text_col))
    if n_partitions:
        src = src.repartition(n_partitions)
    pairs = (
        src.mapInPandas(_shingle_only_batches(text_col, "doc_id"), schema)
        .select("doc_id", F.explode("sh").alias("g"))
    )
    bench_grams = (
        benchmark.select(F.col(bench_text_col).alias(bench_text_col))
        .mapInPandas(
            _shingle_sets_batches(bench_text_col),
            StructType([StructField("sh", ArrayType(StringType()))]),
        )
        .select(F.explode("sh").alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    return (
        pairs.join(bench_grams, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("bench_grams"),
        )
    )


def remove_duplicate_ngrams(
    docs: DataFrame,
    n: int = 3,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Duplicated-passage removal (the Lee et al. 2021 ExactSubstr idea
    at word-n-gram granularity): drop every word that is covered by an
    n-gram occurring >= ``min_count`` times corpus-wide (total
    occurrences, so within-document repetition counts too), then
    reassemble the survivors in order. Output
    (doc_id, clean_text, n_words, kept_words); documents shorter than
    ``n`` words have no grams and come back intact.

    Unlike suffix-array ExactSubstr this removes EVERY copy of a
    duplicated span, not all-but-one -- that makes the result a pure
    function of the corpus (deterministic, order-free) and therefore
    SQL-replayable; the keep-one-copy policy needs paragraph_dedup /
    exact_dedup instead.

    Scale shape: ONE posexplode of the corpus into slim
    (doc_id, pos, word) rows, persisted because three consumers read
    it (gram build, word counts, the keep anti-join) -- at 100 TB this
    intermediate would be written as a table once rather than cached.
    The gram table persists as well: its window (per-doc sort + lead)
    feeds both the frequency aggregate and the covered-position probe.
    Grams are a per-doc window (lead), so gram building shuffles the
    words table once by doc; the gram-frequency aggregate has map-side
    partial agg; covered positions explode <= n rows per duplicated
    gram occurrence and dedup before the anti-join.
    """
    if n < 2:
        raise ValueError("n must be >= 2 (unigram removal is a stopword filter)")
    t = F.coalesce(F.col(text_col), F.lit(""))
    ws = F.filter(F.split(t, "[ \t\n]+"), lambda w: w != F.lit(""))
    words = (
        docs.select(F.col(id_col).alias("doc_id"), F.posexplode(ws).alias("pos", "w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", i).over(w) for i in range(1, n)]
    # persisted too: dup_g and the covered-position probe both consume
    # grams, and the per-doc sort + lead window would otherwise
    # re-evaluate under each (ReusedExchange dedupes the shuffle write,
    # not the window compute)
    grams = (
        words.select("doc_id", "pos", F.concat_ws(" ", *parts).alias("g"),
                     F.lead("w", n - 1).over(w).isNotNull().alias("full"))
        .where(F.col("full"))
        .drop("full")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dup_g = grams.groupBy("g").agg(F.count("*").alias("cnt")).where(
        F.col("cnt") >= min_count
    ).select("g")
    covered = (
        grams.join(dup_g, "g")
        .select("doc_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("pos"))
        .distinct()
    )
    kept = words.join(covered, ["doc_id", "pos"], "left_anti")
    counts = words.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n_words"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))), lambda s: s["w"]
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").cast("bigint").alias("kept_words"),
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    return attach_persists(
        base.join(counts, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce("kept_words", F.lit(0)).cast("bigint").alias("kept_words"),
        ),
        words,
        grams,
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_size: int = 1 << 20,
) -> DataFrame:
    """Training-sequence packing (the concat-and-chunk step of LM data
    prep): lay every document's tokens end-to-end in doc_id order and
    cut the stream into fixed ``seq_len``-token training sequences.
    Output per doc: (doc_id, n_tokens, start_offset, first_seq,
    last_seq) -- the global token offset where the doc starts and the
    range of training sequences it lands in (inclusive; -1/-1 for
    zero-token docs). Token count = whitespace word count (swap in any
    integer tokenizer column upstream).

    The global running sum is computed as a TWO-LEVEL parallel prefix
    sum, not one global window (a single unpartitioned window funnels
    the whole corpus through one task): docs bucket by
    doc_id div bucket_size; per-bucket token totals aggregate map-side
    (one tiny row per bucket), the bucket-prefix offsets cumulate in a
    window over just the bucket rows (thousands of rows at 10^12 docs,
    one task but trivially sized), broadcast-join back, and the
    within-bucket running sum is a window partitioned BY bucket --
    fully parallel. Exactly the oracle's single-window semantics, at
    any scale. All divisions are integral (SQL ``div``): ``/`` would
    route the bigint offsets through doubles and lose exactness past
    2^53 cumulative tokens -- precisely the scale this is for. The
    slim (doc_id, n_tokens, bkt) projection is persisted because both
    the bucket-total aggregate and the join probe consume it (the
    probe side has no exchange for ReuseExchange to dedupe, so the
    text scan + tokenization would otherwise run twice).
    """
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    if bucket_size < 1:
        raise ValueError("bucket_size must be >= 1")
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(
            F.filter(F.split(t, "[ \t\n]+"), lambda w: w != F.lit(""))
        ).cast("bigint").alias("n_tokens"),
        F.col(id_col).cast("bigint").alias("_id"),
    ).select(
        "doc_id",
        "n_tokens",
        F.expr(f"_id div {int(bucket_size)}").alias("bkt"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    bucket_tot = toks.groupBy("bkt").agg(F.sum("n_tokens").alias("bt"))
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    bucket_off = bucket_tot.select(
        "bkt", F.coalesce(F.sum("bt").over(wb), F.lit(0)).alias("boff")
    )
    win = (
        Window.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = (
        toks.join(F.broadcast(bucket_off), "bkt")
        .withColumn(
            "start_offset",
            F.col("boff") + F.coalesce(F.sum("n_tokens").over(win), F.lit(0)),
        )
    )
    sl = int(seq_len)
    first_seq = F.when(F.col("n_tokens") == 0, F.lit(-1)).otherwise(
        F.expr(f"start_offset div {sl}")
    )
    last_seq = F.when(F.col("n_tokens") == 0, F.lit(-1)).otherwise(
        F.expr(f"(start_offset + n_tokens - 1) div {sl}")
    )
    return attach_persists(
        placed.select(
            "doc_id",
            "n_tokens",
            F.col("start_offset").cast("bigint").alias("start_offset"),
            first_seq.cast("bigint").alias("first_seq"),
            last_seq.cast("bigint").alias("last_seq"),
        ),
        toks,
    )


def funnel_signals(
    docs: DataFrame,
    target_match_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    host_col: str = "source",
) -> DataFrame:
    """The per-document signal projection every funnel stage filters
    on: (doc_id, rec_lang, host, h, pred_lang, n_words, top_word_cnt).
    TWO text scans total -- one projection computing the per-row
    signals (digest, predicted language, word count) and one explode
    pass for the word mode, joined back as slim integers. Shared by
    curation_funnel (in-plan, persisted) and run_curation (written as
    the checkpointed signals stage)."""
    from .textops import _words, pred_lang_expr

    t = F.coalesce(F.col(text_col), F.lit(""))
    sig = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(target_match_col).alias("rec_lang"),
        F.col(host_col).alias("host"),
        F.md5(F.encode(t, "UTF-8")).alias("h"),
        pred_lang_expr(text_col).alias("pred_lang"),
        F.size(_words(t)).alias("n_words"),
    )
    top = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(_words(t)).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_word_cnt"))
    )
    return (
        sig.join(top, "doc_id", "left")
        .withColumn("top_word_cnt", F.coalesce("top_word_cnt", F.lit(0)))
    )


def curation_funnel(
    docs: DataFrame,
    target_match_col: str = "lang",
    min_words: int = 30,
    rep_mult: int = 8,
    k_host: int = 6,
    sample_num: int = 9,
    sample_den: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    host_col: str = "source",
) -> DataFrame:
    """The end-to-end training-data curation funnel, composed from the
    individual operators and counted per stage:

      input -> lang (classifier agrees with recorded lang) ->
      quality (n_words >= min_words) ->
      repetition (rep_mult * top_word_cnt <= n_words) ->
      dedup (first doc per md5(text)) ->
      host_cap (k_host smallest ids per host) ->
      sample (md5 bucket < sample_num of sample_den)

    Output: (stage_ord, stage, rows_kept) -- seven rows, every number
    exactly replayable in SQL.

    Scale shape: TWO scans of the text column total -- one projection
    computing all per-row signals (digest, predicted language, word
    count) and one explode pass for the word-mode (top word count,
    joined back as slim integers); the joined signal table is
    persisted before the head/tail fan-out so neither scan repeats.
    Everything downstream operates on slim survivor rows: a
    row_number window on the digest, then the host-cap rank expressed
    as a windowed running sum over dedup survivors (so dedup + host +
    sample flags come out of ONE pass and ONE aggregation, not three
    chained count jobs). The per-stage counts are conditional
    aggregations with map-side partial agg.

    The persist is left live because the returned DataFrame reads
    through it (Spark's CacheManager also silently substitutes it
    into any identical sub-plan); the handle is attached to the result,
    so callers running the funnel inside a larger job release it with
    ``caching.released_after(df)`` after the action.
    """
    sig = funnel_signals(
        docs,
        target_match_col=target_match_col,
        text_col=text_col,
        id_col=id_col,
        host_col=host_col,
    ).persist(StorageLevel.MEMORY_AND_DISK)

    f_lang = F.col("pred_lang") == F.col("rec_lang")
    f_qual = f_lang & (F.col("n_words") >= min_words)
    f_rep = f_qual & (F.lit(rep_mult) * F.col("top_word_cnt") <= F.col("n_words"))

    # dedup rank among repetition survivors; host rank = running count
    # of dedup survivors per host (rank-among-a-filtered-set without a
    # second filtered window); sample = map-side predicate
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % F.lit(sample_den)
    )
    surv = (
        sig.where(f_rep)
        .withColumn(
            "dr", F.row_number().over(Window.partitionBy("h").orderBy("doc_id"))
        )
        .withColumn(
            "hr",
            F.sum((F.col("dr") == 1).cast("long")).over(
                Window.partitionBy("host")
                .orderBy("doc_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    f_dedup = F.col("dr") == 1
    f_host = f_dedup & (F.col("hr") <= k_host)
    f_sample = f_host & (bucket < sample_num)

    def _cnt(flag, name):  # SUM over zero rows is NULL, not 0
        return F.coalesce(F.sum(flag.cast("long")), F.lit(0)).alias(name)

    head = sig.agg(
        F.count("*").alias("c_input"),
        _cnt(f_lang, "c_lang"),
        _cnt(f_qual, "c_quality"),
        _cnt(f_rep, "c_repetition"),
    )
    tail = surv.agg(
        _cnt(f_dedup, "c_dedup"),
        _cnt(f_host, "c_host_cap"),
        _cnt(f_sample, "c_sample"),
    )
    stages = ["input", "lang", "quality", "repetition", "dedup", "host_cap", "sample"]
    stack = ", ".join(f"{i}, '{s}', c_{s}" for i, s in enumerate(stages))
    return attach_persists(
        head.crossJoin(tail)
        .selectExpr(f"stack({len(stages)}, {stack}) AS (stage_ord, stage, rows_kept)")
        .select(
            F.col("stage_ord").cast("int").alias("stage_ord"),
            "stage",
            F.col("rows_kept").cast("bigint").alias("rows_kept"),
        ),
        sig,
    )


def paragraph_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """CCNet-style paragraph-level dedup: split each document on
    ``sep`` (a Java regex in the split; keep it a literal like the
    default newline, since survivors are re-joined with the same
    string verbatim), drop every paragraph that already occurred
    earlier in the corpus (first occurrence wins, ordered by
    (doc_id, position)), and reassemble the survivors in original
    order. Output
    (doc_id, clean_text, n_paras, kept_paras); documents whose every
    paragraph was seen elsewhere come back with clean_text = ''.

    This is the dedup used by CCNet/RefinedWeb-class pipelines for
    boilerplate paragraphs that exact doc-level dedup misses (cookie
    banners, nav footers) -- see Wenzek et al. 2020 (CCNet) section
    3.1.

    Scale shape: posexplode -> md5(paragraph) -> ONE min_by aggregate
    per digest (map-side partial agg; the shuffle carries one row per
    distinct paragraph per map task) -> self-join back on the digest
    -> groupBy doc to reassemble. Keeping or dropping is decided by
    integer (doc_id, pos) comparison, so the result is deterministic
    and SQL-replayable. Paragraph strings could be md5-only through
    the winner aggregate at 100 TB; kept raw here so the oracle join
    stays byte-transparent.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    paras = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(t, sep)).alias("pos", "para"),
    ).withColumn("h", F.md5(F.encode(F.col("para"), "UTF-8")))
    # first corpus-wide occurrence of each paragraph: min (doc_id, pos)
    winners = paras.groupBy("h").agg(
        F.min(F.struct("doc_id", "pos")).alias("win")
    )
    kept = paras.join(winners, "h").where(
        (F.col("doc_id") == F.col("win.doc_id")) & (F.col("pos") == F.col("win.pos"))
    )
    counts = paras.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n_paras"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias("clean_text"),
        F.count("*").cast("bigint").alias("kept_paras"),
    )
    return (
        counts.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_paras",
            F.coalesce("kept_paras", F.lit(0)).cast("bigint").alias("kept_paras"),
        )
    )


# --------------------------------------------------------------------------
# Bloom-gated incremental dedup
# --------------------------------------------------------------------------


def _bloom_positions_np(hexes, m_bits: int, k: int):
    """k bit positions per md5 hex digest: position j = the j-th
    big-endian 32-bit word of the digest, mod m_bits (k <= 4)."""
    import numpy as np

    if len(hexes) == 0:
        return np.empty((0, k), dtype=np.int64)
    buf = bytes.fromhex("".join(hexes))
    words = np.frombuffer(buf, dtype=">u4").reshape(-1, 4).astype(np.int64)
    return words[:, :k] % m_bits


def _bitmap_batches(m_bits: int, k: int):
    """Fold a partition's digests into one m_bits-wide bitmap row.
    The working array stays PACKED (m_bits/8 bytes; little bit order:
    bit j of byte b is position b*8+j) -- an unpacked bool array would
    cost 8x the bitmap size per task, which at the ~2^33-bit sizes the
    docstring budgets for is the difference between 1 GiB and 8 GiB of
    executor memory."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        packed = np.zeros(m_bits // 8, dtype=np.uint8)
        seen = False
        for pdf in batches:
            seen = True
            pos = _bloom_positions_np(pdf["h"].tolist(), m_bits, k).ravel()
            np.bitwise_or.at(
                packed, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
            )
        if seen:
            yield pd.DataFrame({"bm": [packed.tobytes()]})

    return run


def build_bloom(base_hashes: DataFrame, m_bits: int, k: int) -> bytes:
    """Aggregate an m_bits Bloom bitmap over ``base_hashes`` (a
    single-column DF of md5 hex digests named ``h``). One binary row
    of m_bits/8 bytes per partition is collected and OR-combined on
    the driver -- the collect is O(partitions * m_bits/8), independent
    of row count, so a 10^12-row base costs the same driver memory as
    a 10^3-row one. m_bits up to ~2^33 (1 GiB bitmap) is broadcastable
    on a real cluster; size m_bits ~ 10 * expected distinct digests
    for a ~1% false-maybe rate with k=4.
    """
    import numpy as np

    if not 1 <= k <= 4:
        raise ValueError("k must be 1..4 (positions come from md5's four 32-bit words)")
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    rows = base_hashes.select("h").mapInPandas(
        _bitmap_batches(m_bits, k), StructType([StructField("bm", BinaryType())])
    ).collect()
    out = np.zeros(m_bits // 8, dtype=np.uint8)
    for r in rows:
        out |= np.frombuffer(r["bm"], dtype=np.uint8)
    return out.tobytes()


def _maybe_flag_batches(bloom_bc, m_bits: int, k: int):
    """Probe the PACKED bitmap directly ((byte >> (pos & 7)) & 1) --
    no unpacked copy, so the per-executor footprint is exactly the
    broadcast's m_bits/8 bytes."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        packed = np.frombuffer(bloom_bc.value, dtype=np.uint8)
        for pdf in batches:
            pos = _bloom_positions_np(pdf["h"].tolist(), m_bits, k)
            hit = (packed[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
            out = pdf[["doc_id", "h"]].copy()
            out["was_maybe"] = hit.all(axis=1).astype(np.int32)
            yield out

    return run


def incremental_dedup(
    new_docs: DataFrame,
    base_docs: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup a NEW batch against an existing BASE corpus: exact result
    = rows of ``new_docs`` whose md5(text) digest does not occur in
    ``base_docs``, i.e. a plain anti-join -- but on the NEW side only
    the sliver of rows whose k Bloom probes all hit pays the anti-join
    shuffle; definite-new rows take the map-side fast path. The BASE
    side still pays one digest projection + distinct shuffle per run
    (unavoidable without precomputed state); a daily-increment
    deployment amortizes it by persisting the distinct base digests
    bucketed by digest alongside the snapshot -- then the anti-join is
    shuffle-free on the base side too and only the bitmap fold reads
    it. When the maybe sliver is small enough to broadcast, AQE
    converts the anti-join to a broadcast join automatically (it does
    at test scale).

    Output (doc_id, h, was_maybe): every kept (genuinely new) row,
    with was_maybe=1 iff the Bloom filter could not rule it out (these
    are the Bloom's false positives among kept rows -- the measured FP
    rate, for free). Both the kept set AND the flag are deterministic
    md5 arithmetic, so the DuckDB oracle replays the filter
    bit-for-bit.

    Scale shape at 10^12 base docs: build_bloom's collect is bounded
    by partitions * m_bits/8 bytes (not rows); the broadcast ships
    m_bits/8 bytes once per executor; definite-new rows take the
    map-side fast path and never shuffle. The daily-increment pattern
    would persist the bitmap alongside the snapshot and fold only the
    new day's digests in.
    """
    md5_of = lambda c: F.md5(F.encode(F.coalesce(F.col(c), F.lit("")), "UTF-8"))  # noqa: E731
    base_h = base_docs.select(md5_of(text_col).alias("h")).distinct()
    bloom = build_bloom(base_h, m_bits, k)
    bc = new_docs.sparkSession.sparkContext.broadcast(bloom)

    new_h = new_docs.select(F.col(id_col).alias("doc_id"), md5_of(text_col).alias("h"))
    flagged = new_h.mapInPandas(
        _maybe_flag_batches(bc, m_bits, k),
        StructType(
            [
                StructField("doc_id", new_docs.schema[id_col].dataType),
                StructField("h", StringType()),
                StructField("was_maybe", IntegerType()),
            ]
        ),
    ).persist(StorageLevel.MEMORY_AND_DISK)  # ONE probe pass feeds both branches
    definite_new = flagged.where(F.col("was_maybe") == 0)
    survivors = (
        flagged.where(F.col("was_maybe") == 1)
        .join(base_h, "h", "left_anti")
    )
    return attach_persists(
        definite_new.unionByName(survivors.select("doc_id", "h", "was_maybe")),
        flagged,
    )


def mixture_sample(
    docs: DataFrame,
    targets: DataFrame,
    den: int = 10_000,
    id_col: str = "doc_id",
    domain_col: str = "domain",
) -> DataFrame:
    """Domain rebalancing -- sample each domain down toward a target
    mixture (the data-mixing step every LLM pretraining corpus runs:
    "N%% web, M%% code, ..."). ``targets`` is the tiny (domain, weight)
    dimension; a domain's keep quota is

        share  = weight * den DIV sum(weights)          (0..den)
        keep_n = min(den, share * total_docs DIV n_domain)

    and a doc survives iff its md5-derived bucket (hash_sample's exact
    convention, so splits stay reproducible across engines) is below
    keep_n. All-integer arithmetic -- no float probabilities -- so the
    selected row set is deterministic and the oracle replays it
    bit-for-bit. Bounds: den * total_docs must fit int64 (den=10^4
    covers 9*10^14 docs). Domains absent from ``targets`` are dropped
    (weight 0); over-represented targets saturate at keep_n = den
    (sampling never duplicates rows -- upsampling is an epoch-level
    concern, not a filter's).

    Scale shape: ONE partial-aggregated count shuffle over the corpus;
    totals and the quota dimension are single-row/broadcast joins; the
    final filter is a broadcast equi-join + map-side predicate. Output
    (doc_id, domain, bucket, keep_num)."""
    d = F.col(domain_col).alias("domain")
    base = docs.select(F.col(id_col).alias("doc_id"), d)
    counts = base.groupBy("domain").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("bigint").alias("total"))
    wsum = targets.agg(F.sum("weight").cast("bigint").alias("wsum"))
    dims = (
        counts.crossJoin(F.broadcast(total))
        .join(F.broadcast(targets.select("domain", "weight")), "domain")
        .crossJoin(F.broadcast(wsum))
        .selectExpr(
            "domain",
            f"least(CAST({den} AS BIGINT), "
            f"((CAST(weight AS BIGINT) * {den}) DIV wsum) "
            "* total DIV cnt) AS keep_num",
        )
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % F.lit(den)
    )
    return (
        base.join(F.broadcast(dims), "domain")
        .withColumn("bucket", bucket)
        .where(F.col("bucket") < F.col("keep_num"))
        .select("doc_id", "domain", "bucket", "keep_num")
    )


def distinct_kmv(
    values: DataFrame,
    k: int = 256,
    value_col: str = "value",
) -> DataFrame:
    """K-minimum-values distinct-cardinality sketch, fully
    deterministic (md5-based, no RNG) so any engine reproduces the
    SAME estimate bit-for-bit: h(value) = first 60 bits of
    md5(value); keep the k smallest DISTINCT hashes; with the k-th
    smallest at H, estimate = (k-1) * (2^60 DIV H) -- the classic
    KMV/bottom-k estimator in pure integer arithmetic (relative
    error ~ 1/sqrt(k-2)). When fewer than k distinct hashes exist
    the sketch is EXACT and the estimate is the count itself.

    Scale shape (the whole point vs count(DISTINCT)): one Arrow pass
    keeps <= k distinct hashes PER PARTITION (np.unique on the
    partition's hashes -- bounded memory however many rows), the
    global merge sees at most n_partitions * k rows, and the final
    distinct+top-k runs on that tiny set. No shuffle of the full
    value or hash domain ever happens; cardinality of 10^12-row
    columns costs one scan + a kilobyte-scale merge. 60-bit hashes
    keep every product in int64 ((k-1) * 2^60/H < 2^63 for k <= 4096
    at the H >= k-1 regime where the estimator is used).

    Output ONE row: (k_used, kth_hash, est_distinct) with
    k_used = min(k, n_distinct_hashes); kth_hash is NULL when the
    input is empty (est 0)."""
    import numpy as np
    import pyarrow as pa

    if not 2 <= k <= 4096:
        raise ValueError("k must be in [2, 4096]")

    h = (
        F.conv(
            F.substring(F.md5(F.col(value_col).cast("string")), 1, 15),
            16,
            10,
        )
        .cast("bigint")
        .alias("h")
    )

    def partial(batches):
        seen = np.empty(0, dtype=np.int64)
        got = False
        for rb in batches:
            a = rb.column(0).to_numpy(zero_copy_only=False)
            if len(a) == 0:
                continue
            got = True
            seen = np.unique(np.concatenate([seen, a]))[:k]
        if got:
            yield pa.RecordBatch.from_arrays(
                [pa.array(seen, type=pa.int64())], names=["h"]
            )

    local = (
        values.select(h)
        .where(F.col("h").isNotNull())
        .mapInArrow(partial, "h bigint")
    )
    merged = local.distinct().orderBy("h").limit(k)
    return merged.agg(
        F.count("*").alias("k_used"),
        F.max("h").alias("kth_hash"),
    ).select(
        "k_used",
        "kth_hash",
        F.when(F.col("k_used") < k, F.col("k_used").cast("bigint"))
        .otherwise(F.expr(f"{k - 1} * ({2**60} DIV kth_hash)"))
        .alias("est_distinct"),
    )


def value_quantiles(
    values: DataFrame,
    quantiles: list[int] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """EXACT nearest-rank quantiles of a bounded-domain integer column
    (doc lengths, token counts, status codes -- the corpus-statistics
    staples), deterministic across engines: quantile q = the smallest
    value whose cumulative count reaches rank floor((n-1)*q/100) + 1.
    Output (q, value, rank, n_total), one row per requested q.

    Scale shape: the shuffle is a partial-agg histogram over DISTINCT
    values -- the bounded DOMAIN, not the row count -- so 10^12 rows
    with, say, <= 10^6 distinct lengths aggregate into <= 10^6
    histogram rows; the cumulative window then sorts only those. This
    is exact where approx_percentile is sketchy and engine-specific
    (its t-digest is not replayable in DuckDB); the explicit contract
    is integer values with a bounded distinct domain -- for unbounded
    or continuous columns, bucket first."""
    qs = quantiles if quantiles is not None else [25, 50, 75, 90, 99]
    if not qs or not all(0 <= q <= 100 for q in qs):
        raise ValueError("quantiles must be percentages in [0, 100]")
    hist = (
        values.where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).cast("bigint").alias("v"))
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    spark = values.sparkSession
    qdf = spark.createDataFrame([(int(q),) for q in sorted(set(qs))], "q int")
    # rank = floor((n-1)*q/100) + 1 (nearest-rank, 1-based); n from the
    # histogram total (one extra tiny agg, broadcast with the q list)
    total = hist.agg(F.sum("cnt").alias("n_total"))
    ranked = qdf.crossJoin(F.broadcast(total)).withColumn(
        "rank",
        F.expr("CAST((n_total - 1) * q DIV 100 AS BIGINT) + 1"),
    )
    return (
        cum.join(
            F.broadcast(ranked),
            F.col("cum") >= F.col("rank"),
        )
        .groupBy("q", "rank", "n_total")
        .agg(F.min("v").alias("value"))
        .select("q", "value", "rank", "n_total")
    )
