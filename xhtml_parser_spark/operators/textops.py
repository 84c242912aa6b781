"""Text-analysis operators for training-data pipelines: quality
scoring, language ID, token counting, fingerprinting.

Everything is built-in pyspark.sql.functions (JVM, codegen) -- no
Python in the hot path. The formulas are deliberately expressible in
ANSI SQL so the DuckDB oracle can replay them exactly; all outputs are
integers or md5 hex strings (no float divergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WS = "[ \t\n]+"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

# token pattern shared with the oracle: letter runs, digit runs, single
# other non-ws chars (a BPE-ish first segmentation)
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n]"

LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "fr": ("le", "et", "les"),
    "es": ("el", "de", "los"),
    "de": ("der", "und", "die"),
    "zh": ("de", "le", "shi"),
}


def _words(text) -> "F.Column":
    return F.filter(F.split(F.coalesce(text, F.lit("")), _WS), lambda w: w != F.lit(""))


def _lines(text) -> "F.Column":
    """Non-empty lines; shared by repetition_signals and gopher_quality
    so their line-count denominators can never drift apart."""
    return F.filter(F.split(F.coalesce(text, F.lit("")), "\n"), lambda x: x != F.lit(""))


def text_quality(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_chars, n_words, stop_cnt, punct_cnt, token_cnt) --
    integer quality features; ratios are downstream divisions."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    w = _words(t)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return docs.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        F.size(w).alias("n_words"),
        F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x))).alias("stop_cnt"),
        F.size(F.regexp_extract_all(t, F.lit("[^A-Za-z0-9 \t\n]"), 0)).alias("punct_cnt"),
        F.size(F.regexp_extract_all(t, F.lit(TOKEN_RE), 0)).alias("token_cnt"),
    )


def pred_lang_expr(text_col: str = "text") -> "F.Column":
    """The lang_id prediction as a reusable column expression:
    argmax of marker-word hits, ties broken in fixed language order."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    w = _words(F.lower(t))
    def _contains(arr):
        # NB: a 2-arg lambda would be treated as (element, index) by
        # Spark's higher-order functions -- close over arr instead
        return lambda x: F.array_contains(arr, x)

    counts = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        counts[lang] = F.size(F.filter(w, _contains(arr)))
    langs = list(LANG_MARKERS)
    pred = None
    best = F.greatest(*[counts[lg] for lg in langs])
    for lg in langs:  # first language reaching the max wins
        cond = counts[lg] == best
        pred = F.when(cond, F.lit(lg)) if pred is None else pred.when(cond, F.lit(lg))
    return pred


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID: predicted = argmax of marker hits, ties
    broken in fixed language order. Output (doc_id, pred_lang)."""
    return docs.select(F.col(id_col), pred_lang_expr(text_col).alias("pred_lang"))


def repetition_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals, all exact integers:
    (doc_id, n_lines, n_distinct_lines, top_word_cnt, n_words).
    Downstream filters divide: duplicate-line fraction =
    1 - n_distinct_lines/n_lines; top-word fraction =
    top_word_cnt/n_words (repetitious machine text scores high on
    both).

    Line stats are per-row array built-ins (codegen); the word mode
    needs a per-doc argmax, expressed relationally (explode ->
    two-level aggregate with map-side partial aggregation) rather than
    as an interpreted O(words^2) higher-order expression."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = _lines(t)
    line_stats = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(F.array_distinct(lines)).cast("bigint").alias("n_distinct_lines"),
    )
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_words(F.col(text_col))).alias("w"),
    )
    word_stats = (
        words.groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").cast("bigint").alias("top_word_cnt"),
            F.sum("c").cast("bigint").alias("n_words"),
        )
    )
    return (
        line_stats.join(word_stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            "n_distinct_lines",
            F.coalesce("top_word_cnt", F.lit(0)).cast("bigint").alias("top_word_cnt"),
            F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
        )
    )


# PII patterns shared verbatim with the DuckDB oracle. Kept inside the
# Java-regex / RE2 common subset: character classes, bounded + greedy
# quantifiers, no alternation / lookaround / backrefs -- the constructs
# where backtracking (Java) and leftmost-longest (RE2) agree.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
PHONE_RE = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
IPV4_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


def pii_scrub(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII redaction (the RefinedWeb/FineWeb scrub step): replace
    email addresses, +CC-NNN-NNNN phone numbers, and dotted-quad IPs
    with fixed tokens, in that order. Output
    (doc_id, clean_text, n_emails, n_phones, n_ipv4).

    Each count is taken on the text AS SEEN BY that replacement stage
    (emails on the raw text, phones after email redaction, IPs after
    phone redaction), so n_* always equals the number of tokens that
    stage actually emitted -- a phone embedded in an email's local
    part is redacted once as part of the email, counted zero times as
    a phone. Counting every pattern on the raw text instead would
    over-count such nested matches relative to the redactions.

    Pure map-side codegen (regexp_replace / regexp_extract_all
    built-ins) -- no shuffle, no Python; the scan cost is the regex
    passes themselves. The staged text is carried as intermediate
    projection columns, not recomputed per count.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))

    def _cnt(col, pat):
        return F.size(F.regexp_extract_all(col, F.lit(pat), 0)).cast("bigint")

    s0 = docs.select(F.col(id_col).alias("doc_id"), t.alias("t0"))
    s1 = s0.select(
        "doc_id",
        "t0",
        F.regexp_replace(F.col("t0"), EMAIL_RE, "<EMAIL>").alias("t1"),
    )
    s2 = s1.select(
        "doc_id",
        "t0",
        "t1",
        F.regexp_replace(F.col("t1"), PHONE_RE, "<PHONE>").alias("t2"),
    )
    return s2.select(
        "doc_id",
        F.regexp_replace(F.col("t2"), IPV4_RE, "<IP>").alias("clean_text"),
        _cnt(F.col("t0"), EMAIL_RE).alias("n_emails"),
        _cnt(F.col("t1"), PHONE_RE).alias("n_phones"),
        _cnt(F.col("t2"), IPV4_RE).alias("n_ipv4"),
    )


def gopher_quality(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-rule quality signals (Rae et al. 2021 table A1) as exact
    integers; downstream filters divide / threshold:
    (doc_id, n_words, word_chars, max_word_len, alpha_words,
    bullet_lines, ellipsis_lines, hash_cnt).

      mean word length      = word_chars / n_words
      non-alpha-word frac   = 1 - alpha_words / n_words
      bullet/ellipsis fracs = *_lines / line count (repetition_signals
                              carries n_lines)
      symbol-to-word ratio  = hash_cnt / n_words

    All per-row array built-ins; word_chars is length(text minus
    whitespace) rather than an interpreted per-word fold. No shuffle.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        _words(t).alias("ws"),
        _lines(t).alias("lines"),
        F.length(F.regexp_replace(t, "[ \t\n]", "")).cast("bigint").alias("word_chars"),
        F.size(F.regexp_extract_all(t, F.lit("#"), 0)).cast("bigint").alias("hash_cnt"),
    )
    ws, lines = F.col("ws"), F.col("lines")
    return base.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("n_words"),
        "word_chars",
        F.coalesce(F.array_max(F.transform(ws, F.length)), F.lit(0))
        .cast("bigint")
        .alias("max_word_len"),
        F.size(F.filter(ws, lambda x: x.rlike("[A-Za-z]")))
        .cast("bigint")
        .alias("alpha_words"),
        F.size(
            F.filter(
                lines,
                lambda x: x.startswith("-") | x.startswith("*") | x.startswith("•"),
            )
        )
        .cast("bigint")
        .alias("bullet_lines"),
        F.size(F.filter(lines, lambda x: x.endswith("...")))
        .cast("bigint")
        .alias("ellipsis_lines"),
        "hash_cnt",
    )


def lm_surprisal(
    docs: DataFrame,
    ref_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref_text_col: str = "text",
    oov_extra_bits: int = 8,
) -> DataFrame:
    """CCNet-style language-model quality gate (Wenzek et al. 2020
    §3.2) with an INTEGER surprisal proxy: train a unigram count model
    on ``ref_docs`` (the "clean" reference corpus -- CCNet uses
    Wikipedia), then score every document by

        surprisal(w)   = length(bin(total_tokens div cnt(w)))
                       ~ floor(log2(1/p(w))) + 1, exactly computed in
                         integer arithmetic (no float log whose last
                         bit differs across engines)
        oov surprisal  = length(bin(total_tokens)) + oov_extra_bits

    Output (doc_id, n_tokens, surprisal_bits); the downstream filter
    thresholds surprisal_bits / n_tokens (mean bits per token --
    monotone in perplexity), e.g. keeping the head/middle of the
    distribution exactly as CCNet buckets by perplexity.

    Scale shape: the model is one partial-agg word count over the
    reference (a small fraction of the corpus); scoring explodes the
    corpus to words and joins the count dimension -- Spark broadcasts
    it when it fits (vocabularies are ~10^6-10^8 rows; at the high end
    AQE picks a shuffle join and the plan still holds). One aggregate
    back to docs. Everything integer, so the oracle replays bit-for-bit.
    """
    ref_words = ref_docs.select(
        F.explode(_words(F.coalesce(F.col(ref_text_col), F.lit("")))).alias("w")
    )
    # Persist the AGGREGATED model (vocabulary-sized, tiny vs the raw
    # explode) and derive the total from it: the reference corpus is
    # scanned and word-exploded exactly once -- without the persist the
    # scalar job and the scoring join would each pay the full explode.
    # The persist stays live behind the returned DataFrame (the scoring
    # join reads it); release with functions.caching.released_after.
    model = ref_words.groupBy("w").agg(F.count("*").alias("cnt")).persist()
    total_row = model.agg(F.sum("cnt").alias("t")).collect()[0]
    total = int(total_row["t"] or 0)
    if total == 0:
        model.unpersist()
        raise ValueError("reference corpus has no tokens")
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = docs.select(F.col(id_col).alias("doc_id"), F.explode(_words(t)).alias("w"))
    oov_bits = len(bin(total)) - 2 + oov_extra_bits
    scored = words.join(model, "w", "left").select(
        "doc_id",
        F.when(
            F.col("cnt").isNotNull(),
            # integral div (float '/' would lose exactness for huge totals)
            F.length(F.bin(F.expr(f"CAST({int(total)} AS BIGINT) div cnt"))),
        )
        .otherwise(F.lit(oov_bits))
        .cast("bigint")
        .alias("bits"),
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum("bits").cast("bigint").alias("surprisal_bits"),
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    from ..caching import attach_persists

    return attach_persists(
        base.join(per_doc, "doc_id", "left").select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("surprisal_bits", F.lit(0))
            .cast("bigint")
            .alias("surprisal_bits"),
        ),
        model,
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace-normalized md5 document fingerprint (doc_id, fp)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    norm = F.trim(F.regexp_replace(F.lower(t), _WS, " "))
    return docs.select(F.col(id_col), F.md5(F.encode(norm, "UTF-8")).alias("fp"))


def hash_embedding(
    docs: DataFrame,
    dim: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Feature-hashing document embedding (the hashing trick,
    fastText/VW-style featurization): whitespace tokens land in
    bucket = first-32-bits(md5(word)) % dim with a +/-1 sign from the
    9th hex nibble's parity; the embedding is the signed token-count
    vector, array<bigint>. Deterministic and engine-independent (md5
    only), so any engine reproduces it bit-for-bit -- the bridge from
    the raw text table into the integer-exact similarity stack:
    semantic_dedup / kmeans_refine / embedding_neardup_pairs consume
    its output directly (their round(x*1000) quantization maps the
    integer-valued coordinates exactly, it just scales them).

    Plan: one explode + one (id, bucket) partial-agg shuffle + one
    per-id map-assembly agg; every expression is a codegen built-in,
    no Python anywhere. Docs with no tokens (null/empty text) emit
    the zero vector."""
    w = F.explode(
        F.split(F.coalesce(F.col(text_col), F.lit("")), _WS)
    ).alias("w")
    words = docs.select(F.col(id_col), w).where(F.col("w") != "")
    h = F.md5(F.encode(F.col("w"), "UTF-8"))
    bucket = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % F.lit(dim)
    ).alias("b")
    sign = (
        F.when(
            F.conv(F.substring(h, 9, 1), 16, 10).cast("bigint") % 2 == 0,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .cast("bigint")
        .alias("s")
    )
    sums = (
        words.select(id_col, bucket, sign)
        .groupBy(id_col, "b")
        .agg(F.sum("s").alias("v"))
    )
    vecs = (
        sums.groupBy(id_col)
        .agg(
            F.map_from_entries(F.collect_list(F.struct("b", "v"))).alias("m")
        )
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("m"), i.cast("bigint")),
                    F.lit(0).cast("bigint"),
                ),
            ).alias("embedding"),
        )
    )
    zero = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.lit(0).cast("bigint"),
    )
    return (
        docs.select(id_col)
        .join(vecs, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("embedding"), zero).alias("embedding"),
        )
    )


def vocab_topk(
    docs: DataFrame,
    k: int = 100,
    n: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level token / n-gram frequency ranking (vocabulary
    mining -- the tokenizer-training / frequent-phrase-analysis prep
    step): global top-k grams by (count DESC, gram ASC), output
    (gram, cnt, rank) with rank 1..k. n=1 counts whitespace tokens;
    n>1 counts n-grams of consecutive tokens joined by single spaces
    (the dedup operators' shingle convention).

    Scale shape: one partial-agg count shuffle, then ORDER BY+LIMIT
    compiles to TakeOrderedAndProject (per-partition partial top-k +
    a k-row merge) -- no global sort; the final rank window runs over
    the k collected rows only. The token array is STAGED as its own
    projection before the n-gram transform so the slice lambda
    references a column, not the split expression (a lambda over the
    raw expression re-evaluates it per element -- the O(n^2)
    interpreted trap in CLAUDE.md); the size guard wraps the
    sequence because Spark's sequence(1, stop) turns DESCENDING when
    stop < 1 rather than empty."""
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), _WS),
        lambda x: x != "",
    )
    staged = docs.select(toks.alias("t"))
    if n == 1:
        grams = staged.select(F.explode("t").alias("gram"))
    else:
        windows = F.when(
            F.size("t") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("t") - n + 1),
                lambda i: F.array_join(F.slice("t", i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = staged.select(F.explode(windows).alias("gram"))
    top = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "gram")
        .limit(k)
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("cnt").desc(), "gram")
    return top.select("gram", "cnt", F.row_number().over(w).alias("rank"))


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking (RAG / context-window prep):
    each document's whitespace tokens split into windows of
    ``chunk_tokens`` with ``overlap`` tokens shared between
    consecutive windows (stride = chunk_tokens - overlap). The last
    window keeps the tail even when shorter; documents with no tokens
    yield no chunks. Output (id, chunk_id, chunk_text, n_tokens),
    chunk_id 0-based in document order.

    Pure map-side codegen: the token array is staged once, window
    starts enumerated with an integer-exact DIV (never float
    division), windows gathered by slice (which truncates at the
    array end) inside one posexplode -- no shuffle, no Python. Window
    count = 1 + ceil(max(L - chunk, 0) / stride), the standard
    cover-the-tail formula."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), _WS),
        lambda x: x != "",
    )
    staged = (
        docs.select(F.col(id_col), toks.alias("t"))
        .withColumn("L", F.size("t"))
        .where(F.col("L") > 0)
        .withColumn(
            "n_chunks",
            F.expr(
                f"1 + CAST((greatest(L - {chunk_tokens}, 0) "
                f"+ {stride - 1}) DIV {stride} AS INT)"
            ),
        )
    )
    return staged.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_chunks") - 1),
                lambda k: F.slice("t", k * stride + 1, chunk_tokens),
            )
        ).alias("chunk_id", "ctoks"),
    ).select(
        id_col,
        "chunk_id",
        F.array_join("ctoks", " ").alias("chunk_text"),
        F.size("ctoks").alias("n_tokens"),
    )


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    word_re: str = "^[a-z]+$",
    batch_size: int = 1,
) -> DataFrame:
    """Learn the first ``n_merges`` byte-pair-encoding merges over the
    corpus vocabulary (the tokenizer-training step, Sennrich et al.
    2016; marker-free word-internal variant). The corpus is touched
    ONCE -- the distinct-word vocabulary with frequencies is the only
    corpus-sized shuffle, and every merge round then works on the
    vocab table, whose size is bounded by the language, not the
    corpus. Per round: adjacent symbol pairs via one sliced
    arrays_zip (overlapping occurrences count, weighted by word
    frequency), a bounded top-candidate collect (the index-build
    shape), and a greedy leftmost-nonoverlapping re-segmentation of
    the vocab in one pandas pass. Output (rank, lhs, rhs, cnt),
    rank 1..n_merges.

    ``batch_size`` is the scale knob (VERDICT r04 item 3): a real
    tokenizer train is ~32k merges, and one driver round-trip per
    merge is a driver-side scale-killer. With ``batch_size=m`` each
    round collects the top ``4m`` candidate pairs and greedily accepts
    up to ``m`` whose symbols are pairwise DISJOINT (no candidate's
    lhs/rhs/merged string appears in an already-accepted candidate's
    {lhs, rhs, merged}); all accepted merges are applied in ONE
    re-segmentation pass. Disjointness makes the batch sound: applying
    (a,b) can neither create nor destroy an adjacency (c,d) when
    {a,b,ab} and {c,d} share no symbol, so every accepted merge's
    recorded cnt is exactly what sequential BPE would have recorded
    had it picked that pair. The compromise (standard for distributed
    BPE) is selection order only: sequential BPE might have preferred
    a pair minted earlier in the same round. ``batch_size=1`` is
    bit-exact classic BPE and stays the default (the DuckDB oracle
    replays it); driver round-trips = ceil(n_merges / accepted-per-
    round) instead of n_merges.

    The vocab is persisted (it derives from a corpus explode and is
    consumed every round) and released before returning -- the
    returned merge table is a local relation. ``word_re`` restricts
    the training words (default lowercase-alpha: keeps the SQL
    oracle's delimiter-fold replay byte-safe and sidesteps multibyte
    segmentation; segmentation of arbitrary text with the learned
    table is a downstream concern)."""
    import pandas as pd  # noqa: PLC0415 (worker-side)
    from pyspark import StorageLevel

    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    vocab = (
        docs.select(F.explode(_words(F.col(text_col))).alias("w"))
        .where(F.col("w").rlike(word_re))
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
        .select(F.split("w", "").alias("syms"), "wc")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    spark = docs.sparkSession
    merges: list[tuple[int, str, str, int]] = []
    caches = [vocab]
    rounds = 0
    while len(merges) < n_merges:
        pairs = vocab.select(
            "wc",
            F.explode(
                F.arrays_zip(
                    F.slice("syms", 1, F.size("syms") - 1).alias("l"),
                    F.slice("syms", 2, F.size("syms") - 1).alias("r"),
                )
            ).alias("p"),
        ).select(
            F.col("p.l").alias("lhs"), F.col("p.r").alias("rhs"), "wc"
        )
        top = (
            pairs.groupBy("lhs", "rhs")
            .agg(F.sum("wc").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "lhs", "rhs")
            .limit(4 * batch_size)
            .collect()
        )
        rounds += 1
        if not top:
            break
        # greedy conflict filter: accept candidates in rank order whose
        # symbols are disjoint from every already-accepted candidate's
        used: set = set()
        accepted: list[tuple[str, str]] = []
        for row in top:
            if len(accepted) == batch_size or len(merges) == n_merges:
                break
            a, b = row["lhs"], row["rhs"]
            if a in used or b in used or (a + b) in used:
                continue
            used.update((a, b, a + b))
            accepted.append((a, b))
            merges.append((len(merges) + 1, a, b, int(row["cnt"])))
        if not accepted:  # all top-4m conflicted (degenerate tiny vocab)
            break
        if len(merges) == n_merges:
            break
        mseq = [(a, b, a + b) for a, b in accepted]

        def reseg(it, mseq=mseq):
            for pdf in it:
                out = []
                for syms in pdf["syms"]:
                    for a, b, ab in mseq:
                        acc: list = []
                        for x in syms:
                            if x == b and acc and acc[-1] == a:
                                acc[-1] = ab
                            else:
                                acc.append(x)
                        syms = acc
                    out.append(syms)
                yield pd.DataFrame({"syms": out, "wc": pdf["wc"]})

        vocab = vocab.mapInPandas(
            reseg, "syms array<string>, wc bigint"
        ).persist(StorageLevel.MEMORY_AND_DISK)
        caches.append(vocab)
        # iterative-lineage truncation (the dedup_clusters pattern):
        # without it a long sequential train chains one mapInPandas
        # plan per round and the JVM OOMs just STRINGIFYING the plan
        # (measured: heap-space in QueryExecution.explainString at
        # n_merges=64, batch_size=1, sf1). Vocab is language-bounded,
        # so the checkpoint copy is small.
        if len(caches) % 8 == 0:
            vocab = vocab.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    out = spark.createDataFrame(
        merges or [], "rank int, lhs string, rhs string, cnt bigint"
    )
    out._bpe_rounds = rounds  # driver round-trip count, for scale bench
    return out


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    word_re: str = "^[a-z]+$",
) -> DataFrame:
    """Apply a learned BPE merge table (the inference half of
    bpe_merges): each matching word is split to characters and the
    merges are applied IN RANK ORDER, each as a greedy
    leftmost-nonoverlapping pass -- exactly the segmentation the
    training loop's re-segmentation produced, so training-corpus words
    round-trip to their final training segmentation. Words not
    matching ``word_re`` pass through as single opaque tokens (they
    never trained, same filter as bpe_merges). Output
    (id, tokens array<string>), tokens in document order.

    Map-side only: the merge table is a plain Python list in the task
    closure (bounded -- it's the learned artifact, thousands of rows
    at real vocab sizes, collected once by the caller from
    bpe_merges), the pass is one mapInPandas, zero shuffle."""
    import re as _re

    import pandas as pd  # noqa: PLC0415 (worker-side)

    mseq = [(a, b, a + b) for a, b in merges]
    wre = _re.compile(word_re)
    ws = _re.compile(_WS)
    id_type = docs.schema[id_col].dataType.simpleString()

    def run(it):
        cache: dict = {}

        def seg(w):
            got = cache.get(w)
            if got is None:
                if wre.match(w):
                    syms = list(w)
                    for a, b, ab in mseq:
                        acc: list = []
                        for x in syms:
                            if x == b and acc and acc[-1] == a:
                                acc[-1] = ab
                            else:
                                acc.append(x)
                        syms = acc
                else:
                    syms = [w]
                got = cache[w] = syms
            return got

        for pdf in it:
            toks = [
                [s for w in ws.split(txt or "") if w for s in seg(w)]
                for txt in pdf[text_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "tokens": toks})

    return docs.select(id_col, text_col).mapInPandas(
        run, f"{id_col} {id_type}, tokens array<string>"
    )
