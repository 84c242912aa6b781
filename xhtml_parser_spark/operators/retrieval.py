"""Retrieval + supervised classification over the document corpus:
integer-exact BM25-lite ranking and a log2-bits naive-Bayes text
classifier.

Both operators follow the repo's exactness contract (CLAUDE.md): every
score is computed in INTEGER arithmetic -- log2 terms via bit length
(``length(bin(x))``, the same device as ``textops.lm_surprisal``) and
the BM25 tf-saturation as one scaled integer division -- so a DuckDB
oracle replays every value bit-for-bit and rank ties break on integer
columns, never on float rounding.

Scale posture (100 TB): both are explode -> partial-agg -> one shuffle
join on the term dimension shapes. The BM25 corpus statistics (N,
total tokens) ride along as a 1-row broadcast cross join -- no
driver-side collect anywhere; the NB model is vocabulary x classes
sized (classes are small: languages, quality buckets), so AQE
broadcast-joins it under ~10M terms and falls back to a shuffle join
above, both correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import _words


def _bits(col: "F.Column") -> "F.Column":
    """floor(log2(x)) + 1 for positive integer x, exactly: the length
    of the binary representation. Mirrors DuckDB ``length(bin(x))``."""
    return F.length(F.bin(col)).cast("bigint")


def bm25_topk(
    docs: DataFrame,
    query_docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist_postings: bool = False,
) -> DataFrame:
    """BM25-lite top-k retrieval with integer-exact scoring.

    Classic BM25 (k1=1.2, b=0.75) scores a document d for query term t

        idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

    This operator computes a monotone integer surrogate of the same
    functional form, exactly:

      * ``idf_bits = length(bin(N div df)) - 1``  --  floor(log2(N/df)),
        0 for terms in more than half the corpus, growing ~1 per
        halving of df (the floor-log2 idf, same device as
        ``lm_surprisal``'s surprisal bits).
      * tf saturation: multiply numerator and denominator by
        ``10 * total`` (avgdl = total/N stays rational, never a float):

            sat = (22_000 * tf * total)
                  div (10 * total * tf + 3 * total + 9 * dl * N)

        which is ``round_down(1000 * tf * 2.2 / (tf + 1.2*(0.25 +
        0.75*dl*N/total)))`` -- three significant digits of the real
        BM25 saturation curve, in pure int64.
      * contribution = ``idf_bits * sat``; doc score = sum over the
        query's distinct terms.

    Query terms are the DISTINCT whitespace tokens of each row of
    ``query_docs``; output is the top ``k`` corpus docs per query by
    (score desc, doc_id asc) as (query_id, rank, doc_id, score).

    Scale shape: corpus postings = ONE explode + partial-agg groupBy
    (doc, term), persisted before the DAG fans out (dl = sum(tf) per
    doc, df and the candidate join all read it -- the repo's
    persist-before-fanout discipline; release with
    ``caching.released_after``); the (N, total) scalars are a 1-row
    aggregate CROSS JOIN (broadcast -- no collect, the plan stays one
    job). The per-query fan-out is bounded by |query terms| x
    df -- at web scale the idf_bits=0 head terms dominate that product
    and contribute nothing, so filter them out BEFORE the join (done
    below), which is what keeps this sublinear per query. int64 bounds:
    22_000 * tf * total must fit -- holds to ~10^10 total corpus
    tokens with 10^4-token docs; beyond that flip the marked casts to
    DECIMAL(38,0) (DuckDB side is already hugeint-safe).
    """
    from pyspark import StorageLevel

    from ..caching import attach_persists

    t = F.coalesce(F.col(text_col), F.lit(""))
    words = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_words(t)).alias("w")
    )
    # (doc, term) postings with tf -- the ONE corpus explode+agg pass.
    # dl, df, and the candidate join all derive from it, so persist
    # before the DAG fans out (three consumers = three full corpus
    # explodes otherwise; postings is the distinct-terms-per-doc table,
    # far smaller than the raw explode). OFF by default per the repo's
    # input-persist rule (CLAUDE.md): in a warm session the AQE
    # broadcast plan runs the sf0.1 entry in 0.97 s while the persisted
    # plan pays materialization + fixed-partition InMemoryRelation
    # stages for 4.7 s (a cold-JIT interleaved A/B first read as
    # neutral -- the 2-4 s of first-plans codegen masked the gap).
    # At true scale the three extra corpus explodes dominate instead:
    # flip persist_postings on when the corpus no longer fits the
    # broadcast/codegen sweet spot.
    postings = words.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    if persist_postings:
        postings = postings.persist(StorageLevel.MEMORY_AND_DISK)
    dl = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # corpus scalars as a 1-row broadcast, not a collect
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total")
    )
    df_ = postings.groupBy("w").agg(F.count("*").alias("df"))
    idf = df_.join(F.broadcast(stats), how="cross").select(
        "w",
        (_bits(F.expr("n_docs div df")) - F.lit(1)).alias("idf_bits"),
    )
    qt = F.coalesce(F.col(text_col), F.lit(""))
    # the query batch is BOUNDED (operator contract), so qterms and
    # qidf are a few thousand rows: hard-hint them broadcast -- the
    # 1000x plan smoke showed the planner flipping both joins to
    # SortMergeJoin once the vocab/postings stats grow, which would
    # shuffle the corpus-sized postings just to probe a bounded set
    qterms = F.broadcast(
        query_docs.select(
            F.col(id_col).alias("query_id"), F.explode(_words(qt)).alias("w")
        ).distinct()
    )
    # idf_bits = 0 terms can't change any score: drop them before the
    # postings join (at web scale this removes the high-df head that
    # dominates the candidate fan-out).
    qidf = F.broadcast(qterms.join(idf, "w").where(F.col("idf_bits") > 0))
    cand = (
        qidf.join(postings, "w")
        .join(dl, "doc_id")
        .join(F.broadcast(stats), how="cross")
        .select(
            "query_id",
            "doc_id",
            (
                F.col("idf_bits")
                * F.expr(
                    # DECIMAL(38,0) intermediates: 22000*tf*total
                    # overflows int64 around 10^10 corpus tokens (tens
                    # of GB of text), which under ANSI mode RAISES at
                    # the module's documented scale posture. div
                    # (IntegralDivide) still returns BIGINT and the
                    # quotient is bounded by 2200, so output values
                    # and schema are unchanged.
                    "(22000 * CAST(tf AS DECIMAL(38,0)) * total) div "
                    "(10 * CAST(total AS DECIMAL(38,0)) * tf "
                    " + 3 * total + 9 * CAST(dl AS DECIMAL(38,0)) * n_docs)"
                )
            ).alias("contrib"),
        )
    )
    scores = cand.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").cast("bigint").alias("score")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    out = (
        scores.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
    return attach_persists(out, postings) if persist_postings else out


def nb_classify(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    train_mod: int = 3,
    persist_model: bool = False,
) -> DataFrame:
    """Multinomial naive-Bayes text classifier with integer log2-bits
    likelihoods -- the trained-classifier counterpart of the heuristic
    ``textops.lang_id`` and the quality-classifier slot of a CCNet /
    fastText-style curation pipeline (train a classifier on a labeled
    slice, score the whole corpus).

    Train split = rows with ``doc_id % train_mod != 0``; test split is
    the rest. Add-one-smoothed class-conditional surprisal, exactly in
    integers (``lm_surprisal``'s device, per class):

        bits_c(w) = length(bin((tot_c + V) div (cnt_c(w) + 1)))

    with ``tot_c`` the class's training token count and ``V`` the
    training vocabulary size. A test doc's class score is
    ``sum_w bits_c(w)`` over its tokens (OOV words included -- they
    cost ``length(bin(tot_c + V))``, the cnt=0 smoothing mass);
    prediction = argmin score, ties broken by class name asc.
    Class priors are uniform by construction of the synthetic corpus
    and deliberately omitted: an integer prior term (bits of
    n_train/n_c) adds nothing at equal priors and the oracle stays
    simpler.

    Output: the confusion matrix over the test split,
    (actual, predicted, n) -- classes^2-bounded, so the driver hash is
    stable at any corpus size.

    Scale shape: the model is one partial-agg groupBy (class, term)
    over the train split, persisted before its three consumers
    (totals, the vocab scalar, the scoring join -- release with
    ``caching.released_after``), plus a classes-sized totals dim; scoring
    cross-joins each test token with the CLASS dimension (a broadcast
    of C rows -- C is languages or quality buckets, single digits) and
    left-joins the vocab x C model on (w, class), which AQE broadcasts
    when it fits and shuffle-joins above that. One agg to (doc, class),
    a C-row window per doc for the argmin, one classes^2 agg out. No
    collect anywhere.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).alias("label"),
        F.explode(_words(t)).alias("w"),
    )
    train = base.where(F.col("doc_id") % train_mod != 0)
    test = base.where(F.col("doc_id") % train_mod == 0)
    # vocab x classes sized; consumed three times (totals, vocab
    # scalar, scoring join) -- persist so training is one corpus pass
    from pyspark import StorageLevel

    from ..caching import attach_persists

    model = train.groupBy("label", "w").agg(F.count("*").alias("cnt"))
    if persist_model:
        model = model.persist(StorageLevel.MEMORY_AND_DISK)
    # classes-sized totals dim + the vocab scalar ride along broadcast
    totals = model.groupBy("label").agg(F.sum("cnt").alias("tot_c"))
    vocab = model.select("w").distinct().agg(F.count("*").alias("v"))
    classes = totals.join(F.broadcast(vocab), how="cross").select(
        F.col("label").alias("cls"), "tot_c", "v"
    )
    scored = (
        test.join(F.broadcast(classes), how="cross")
        .join(
            model.withColumnRenamed("label", "cls"),
            ["cls", "w"],
            "left",
        )
        .select(
            "doc_id",
            "label",
            "cls",
            _bits(
                F.expr("(tot_c + v) div (coalesce(cnt, 0) + 1)")
            ).alias("bits"),
        )
    )
    per_class = scored.groupBy("doc_id", "label", "cls").agg(
        F.sum("bits").alias("score")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").asc(), F.col("cls").asc()
    )
    pred = (
        per_class.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "label", F.col("cls").alias("predicted"))
    )
    out = (
        pred.groupBy(F.col("label").alias("actual"), "predicted")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("actual", "predicted")
    )
    return attach_persists(out, model) if persist_model else out
