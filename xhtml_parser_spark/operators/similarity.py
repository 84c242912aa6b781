"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force top-k against a query vector -- the correctness
    baseline. The query vector rides a broadcast join (one row), the
    scan side never shuffles, and top-k is a single takeOrdered-style
    ORDER BY ... LIMIT that Spark executes as partial top-k per
    partition + merge (no full sort at scale).
  * LSH-bucketed (random-hyperplane signs) -- the scale path: map-side
    signature, shuffle only (bucket, id) pairs, search within buckets.

Exactness note: for cross-engine verification the vectors are
quantized to int64 (round(x*1000)); integer dot products are exact and
order-independent, unlike float sums which differ per engine's
reduction order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_Q = 1000  # quantization scale


def quantized(col) -> "F.Column":
    return F.transform(col, lambda x: F.round(x * _Q).cast("bigint"))


def dot_q(a, b) -> "F.Column":
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def brute_force_scores(
    emb: DataFrame, query_vec_id: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact integer dot product of every vector against the query
    vector (broadcast one-row join). Output (vec_id, dot)."""
    q = (
        emb.where(F.col(id_col) == query_vec_id)
        .select(quantized(F.col(vec_col)).alias("qv"))
    )
    return (
        emb.where(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            dot_q(quantized(F.col(vec_col)), F.col("qv")).alias("dot"),
        )
    )


def brute_force_topk(
    emb: DataFrame, query_vec_id: int, k: int = 10, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by integer dot product, ties broken by id (deterministic).
    ORDER BY + LIMIT compiles to per-partition partial top-k."""
    return (
        brute_force_scores(emb, query_vec_id, id_col, vec_col)
        .orderBy(F.col("dot").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk(
    emb: DataFrame, query_vec_id: int, k: int = 10, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Float cosine top-k (the production form; not used for the
    cross-engine hash check because float reduction order differs)."""
    v = F.col(vec_col)
    norm = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                              F.lit(0.0), lambda a, x: a + x))
    q = emb.where(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qv"),
        norm.alias("qnorm"),
    )
    dot = F.aggregate(
        F.zip_with(v, F.col("qv"), lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    return (
        emb.where(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            (dot / (norm * F.col("qnorm"))).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def label_centroid_sums(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label centroid accumulators via grouped applyInPandas:
    (label, dim, s, cnt) where s = exact int64 sum of quantized
    components. The grouped-map pattern for per-cluster work (centroid
    refinement, per-group statistics) -- one shuffle on the group key,
    then a vectorized NumPy pass per group.

    Exact integers so any engine reproduces the result; the float
    centroid is s / (cnt * 1000) downstream.
    """
    import numpy as np
    import pandas as pd  # noqa: PLC0415 (worker-side)

    def per_label(pdf: pd.DataFrame) -> pd.DataFrame:
        label = int(pdf[label_col].iloc[0])
        # np.rint is half-to-even vs SQL round's half-away-from-zero,
        # but float32*1000 in double can never land on exactly .5
        # (1/2000 is not dyadic), so the quantizations agree
        m = np.stack(
            [np.rint(np.asarray(v, dtype=np.float64) * _Q) for v in pdf[vec_col]]
        ).astype(np.int64)
        s = m.sum(axis=0)
        return pd.DataFrame(
            {
                "label": label,
                "dim": np.arange(m.shape[1], dtype=np.int32),
                "s": s,
                "cnt": np.int64(m.shape[0]),
            }
        )

    return emb.select(label_col, vec_col).groupBy(label_col).applyInPandas(
        per_label, "label int, dim int, s bigint, cnt bigint"
    )


def hyperplane_lsh_buckets(
    emb: DataFrame, n_bits: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign bits of dot products with
    n_bits fixed pseudo-hyperplanes (deterministic, derived from index
    arithmetic -- no RNG state). Map-side only. Output (vec_id, bucket).

    At scale: ANN = self-join within buckets (shuffle keyed on a
    16-bit-ish bucket id instead of all-pairs).
    """
    dim_probe = emb.select(F.size(F.col(vec_col)).alias("d")).limit(1)
    dim = dim_probe.collect()[0]["d"]
    v = F.col(vec_col)
    bucket = F.lit(0).cast("bigint")
    for b in range(n_bits):
        # pseudo-hyperplane h_b[i] = +1 if (i*2654435761 + b*40503) odd else -1
        plane = [1 if ((i * 2654435761 + b * 40503) >> 8) & 1 else -1 for i in range(dim)]
        s = F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(float(p)) for p in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        bucket = bucket + F.when(s > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return emb.select(F.col(id_col), bucket.alias("bucket"))


def ann_lsh_topk(
    emb: DataFrame, query_vec_id: int, k: int = 10, n_bits: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: restrict the brute-force scan to the query's
    bucket, then exact re-rank. Recall < 1 by construction (multi-probe
    is a straightforward extension: OR adjacent buckets)."""
    buckets = hyperplane_lsh_buckets(emb, n_bits, id_col, vec_col)
    qb = buckets.where(F.col(id_col) == query_vec_id).select(
        F.col("bucket").alias("qbucket")
    )
    cand = (
        buckets.crossJoin(F.broadcast(qb))
        .where(F.col("bucket") == F.col("qbucket"))
        .select(id_col)
    )
    return (
        brute_force_scores(emb.join(cand, id_col, "left_semi").unionByName(
            emb.where(F.col(id_col) == query_vec_id)
        ), query_vec_id, id_col, vec_col)
        .orderBy(F.col("dot").desc(), F.col(id_col))
        .limit(k)
    )
