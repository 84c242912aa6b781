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
from pyspark.sql.window import Window

_Q = 1000  # quantization scale


def quantized(col) -> "F.Column":
    return F.transform(col, lambda x: F.round(x * _Q).cast("bigint"))


def _np_quantize(m):
    """NumPy quantization matching SQL round() exactly: half away from
    zero. np.rint rounds half to EVEN and diverges from Spark/DuckDB
    whenever x*1000 lands exactly on .5 -- which float32 values CAN
    produce (any x = (2k+1)/16, e.g. 0.0625 -> 62.5)."""
    import numpy as np

    s = m * _Q
    return (np.sign(s) * np.floor(np.abs(s) + 0.5)).astype(np.int64)


def _quantized_from_batch(rb, vec_idx, dim):
    """(filtered_batch, (n, dim) int64 quantized matrix) from a
    RecordBatch whose ``vec_idx`` column is a list of numerics --
    null-vector rows dropped, then ONE flat-buffer reshape over the
    Arrow values buffer. The per-row ``np.stack([np.asarray(v) ...])``
    ingestion this replaces was the measured bottleneck of every
    vector pass at the 10x step-up (assignment scan of 50 k x 32:
    3.0 s stacked vs ~0.2 s flat; BENCH.md round 4): iterating a
    pandas object column costs a Python round-trip per ROW, while the
    Arrow list column already holds one contiguous values buffer.
    Raises (like np.stack before it) when a non-null list is ragged."""
    import numpy as np
    import pyarrow.compute as pc

    vc = rb.column(vec_idx)
    valid = pc.is_valid(vc)
    nv = pc.sum(valid).as_py() or 0
    if nv == 0:
        return None, None
    if nv < rb.num_rows:
        rb = rb.filter(valid)
        vc = rb.column(vec_idx)
    flat = vc.flatten().to_numpy(zero_copy_only=False)
    return rb, _np_quantize(flat.astype(np.float64, copy=False).reshape(-1, dim))


def _gram_exact(a, b):
    """Integer matrix product via float64 BLAS when provably exact,
    else the (BLAS-less, ~14x slower at dim 32) int64 matmul. Exact
    whenever every partial sum is an integer below 2^53: any partial
    sum of products is bounded by sum|a_i b_i| <= sqrt(|a|^2 |b|^2)
    (Cauchy-Schwarz on the absolute values), and reordered addition of
    exactly-representable integers is exact, so the cheap sufficient
    check is max_row_norm2(a) * max_row_norm2(b) < 2^106 -- checked
    here as dim * max|a| * max|b| < 2^53 per element (conservative,
    one pass). The int64 guard semantic_dedup/embedding_neardup_pairs
    already enforce (norms <= 3_037_000_499 / tau_den) implies this
    bound with room to spare."""
    import numpy as np

    ab = float(np.abs(a).max(initial=0)) * float(np.abs(b).max(initial=0))
    if a.shape[-1] * ab < 2.0**53:
        return (a.astype(np.float64) @ b.astype(np.float64)).astype(np.int64)
    return a @ b


def _packed_binary(pa, m):
    """pyarrow binary column of one little-endian int64 blob per row of
    ``m`` (n, dim) -- the shuffle-friendly fixed-width encoding of a
    quantized vector (8*dim bytes, one buffer, no per-row objects)."""
    import numpy as np

    data = np.ascontiguousarray(m, dtype="<i8").tobytes()
    off = np.arange(len(m) + 1, dtype=np.int32) * (m.shape[1] * 8)
    return pa.Array.from_buffers(
        pa.binary(), len(m), [None, pa.py_buffer(off), pa.py_buffer(data)]
    )


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
        m = _np_quantize(
            np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        )
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


def embedding_neardup_pairs(
    emb: DataFrame,
    tau_num: int = 7,
    tau_den: int = 20,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, dot) with
    id_a < id_b and cos(a, b) >= tau_num/tau_den (exact rational
    threshold). Output dot is the int64 dot product of the quantized
    (round(x*1000)) vectors, so any engine reproduces it bit-for-bit.

    The cosine test is evaluated in EXACT integer arithmetic --
    ``tau_den^2 * dot^2 >= tau_num^2 * |a|^2 * |b|^2 and dot > 0`` --
    no float reduction order anywhere.

    Default n_bits=8: random-hyperplane LSH buckets (map-side
    signature), then pairs only WITHIN a bucket -- the scale path: the
    shuffle is keyed on the bucket id and each group runs one
    vectorized NumPy Gram matrix, trading recall (cross-bucket pairs
    are lost) for a 1/2^n_bits candidate-set reduction. Buckets are
    integer-deterministic (hyperplane_lsh_buckets), so even this path
    is SQL-oracle-checkable.

    n_bits=0 routes EVERY row into one task's O(n^2) Gram matrix --
    never at scale; use embedding_neardup_pairs_exact, which exists so
    the recall baseline is an explicit choice rather than a default
    footgun.
    """
    import numpy as np
    import pandas as pd  # noqa: PLC0415 (worker-side)

    # the int64 exactness guard below divides by tau_den and assumes
    # tau_num <= tau_den (a cosine threshold > 1 is meaningless); with
    # tau_num > tau_den the tn2*na2*nb2 side could exceed int64 and
    # NumPy would wrap silently instead of raising
    if not (0 < tau_num <= tau_den):
        raise ValueError(
            f"tau_num/tau_den must satisfy 0 < tau_num <= tau_den "
            f"(got {tau_num}/{tau_den})"
        )

    if n_bits > 0:
        # ONE map pass emits (id, vec, bucket) together: joining a
        # separately-computed bucket table back onto emb would read the
        # source twice and shuffle the heavy vector payload through an
        # id-join before the bucket groupBy -- three vector shuffles
        # where one suffices
        withb = _with_buckets(emb, n_bits, id_col, vec_col)
    else:
        withb = emb.withColumn("bucket", F.lit(0).cast("bigint"))

    tn2, td2 = tau_num * tau_num, tau_den * tau_den

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        # null vectors cannot form pairs (SQL: NULL dot fails dot > 0)
        keep = pdf[vec_col].notna()
        pdf = pdf[keep]
        if len(pdf) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "dot": []})
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        q = _np_quantize(
            np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])[order]
        )
        na2 = (q * q).sum(axis=1)
        # int64 exactness bound: td2 * dot^2 <= td2 * na2_max^2 must fit
        # exactness precondition: |dot| <= na2_max (Cauchy-Schwarz), so
        # td^2*dot^2 and tn^2*na2*nb2 both fit int64 iff
        # tau_den * na2_max <= floor(sqrt(2^63 - 1)) = 3_037_000_499
        # (integer hash embeddings have much larger norms than
        # unit-float vectors, so the bound is the true one, not a
        # round conservative margin)
        if int(na2.max(initial=0)) > 3_037_000_499 // tau_den:
            raise ValueError("quantized norms too large for exact int64 test")
        g = _gram_exact(q, q.T)
        ia, ib = np.triu_indices(len(ids), 1)
        d = g[ia, ib]
        keep = (d > 0) & (td2 * d * d >= tn2 * na2[ia] * na2[ib])
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "dot": d[keep]}
        )

    return (
        withb.select(id_col, vec_col, "bucket")
        .groupBy("bucket")
        .applyInPandas(per_bucket, "id_a bigint, id_b bigint, dot bigint")
    )


def embedding_neardup_pairs_exact(
    emb: DataFrame,
    tau_num: int = 7,
    tau_den: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ALL-pairs exact near-dup baseline: single-group O(n^2) Gram
    matrix in ONE task. The 100%-recall oracle reference for
    embedding_neardup_pairs -- correct at test scale, never at 10^12
    rows (no partitioning by construction)."""
    return embedding_neardup_pairs(
        emb, tau_num=tau_num, tau_den=tau_den, n_bits=0,
        id_col=id_col, vec_col=vec_col,
    )


def _plane_matrix(dim: int, n_bits: int):
    """Deterministic ±1 hyperplane matrix (dim x n_bits): entry (i, b)
    is +1 iff bit 8 of (i*2654435761 + b*40503) is set -- pure index
    arithmetic, no RNG state, so any engine replays it exactly."""
    import numpy as np

    i = np.arange(dim, dtype=np.int64)[:, None]
    b = np.arange(n_bits, dtype=np.int64)[None, :]
    return np.where(((i * 2654435761 + b * 40503) >> 8) & 1 == 1, 1, -1).astype(
        np.int64
    )


def _bucket_of(pdf, vec_col: str, n_bits: int, planes_box: list):
    """Bucket ids for one pandas batch; null vectors -> bucket 0 (the
    pre-round-2 SQL formulation's behavior: NULL dot signs contribute
    no bits). planes_box caches the ±1 matrix across batches."""
    import numpy as np

    vecs = pdf[vec_col]
    notna = vecs.notna().to_numpy()
    bucket = np.zeros(len(pdf), dtype=np.int64)
    if notna.any():
        m = _np_quantize(
            np.stack([np.asarray(v, dtype=np.float64) for v in vecs[notna]])
        )
        if not planes_box or planes_box[0].shape[0] != m.shape[1]:
            planes_box[:] = [_plane_matrix(m.shape[1], n_bits)]
        s = m @ planes_box[0]  # exact int64
        bucket[notna] = (
            (s > 0).astype(np.int64) << np.arange(n_bits, dtype=np.int64)
        ).sum(axis=1)
    return bucket


def _with_buckets(
    emb: DataFrame, n_bits: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, vec, bucket) in ONE map pass -- the single-scan form used
    when the vectors themselves ride to the bucketed shuffle."""
    import pandas as pd  # noqa: PLC0415 (worker-side)

    id_type = emb.schema[id_col].dataType.simpleString()
    vec_type = emb.schema[vec_col].dataType.simpleString()

    def batches(it):
        planes_box: list = []
        for pdf in it:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    vec_col: pdf[vec_col],
                    "bucket": _bucket_of(pdf, vec_col, n_bits, planes_box),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        batches, f"{id_col} {id_type}, {vec_col} {vec_type}, bucket bigint"
    )


def hyperplane_lsh_buckets(
    emb: DataFrame, n_bits: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign bits of EXACT integer dot
    products of the quantized (round(x*1000) int64) vector with n_bits
    deterministic ±1 pseudo-hyperplanes. Integer arithmetic makes the
    bucket reduction-order-independent, so any engine (and the DuckDB
    oracle) reproduces it bit-for-bit -- a float sum's sign could flip
    with summation order for near-orthogonal vectors.

    Map-side only: one Arrow-batched NumPy pass (quantize -> one matmul
    -> packbits); no driver-side action, no per-bit array scans. Output
    (id_col, bucket).

    At scale: ANN = self-join within buckets (shuffle keyed on a
    16-bit-ish bucket id instead of all-pairs).
    """
    import pandas as pd  # noqa: PLC0415 (worker-side)

    id_type = emb.schema[id_col].dataType.simpleString()

    def batches(it):
        planes_box: list = []
        for pdf in it:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "bucket": _bucket_of(pdf, vec_col, n_bits, planes_box),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        batches, f"{id_col} {id_type}, bucket bigint"
    )


def ivf_centroid_rows(
    emb: DataFrame, n_cells: int = 16, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF coarse codebook: the ``n_cells`` vectors whose
    md5(id) hex digests sort lowest, numbered 0..n_cells-1 in that
    order. A uniform reproducible sample standing in for k-means
    training (real IVF trains centroids offline; the INDEX structure --
    assign, probe, rerank -- is what matters for the Spark plan, and a
    hash-ordered sample keeps every engine's codebook bit-identical).
    Output (cell, cv) with cv the quantized int64 centroid."""
    w = Window.orderBy("_h", "_src")
    return (
        emb.where(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("_src"),
            quantized(F.col(vec_col)).alias("cv"),
            F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8")).alias("_h"),
        )
        .orderBy("_h", "_src")
        .limit(n_cells)
        # single-partition window over n_cells rows -- fine post-limit
        .select((F.row_number().over(w) - 1).alias("cell"), "cv")
    )


def _collect_codebook(emb, n_cells, id_col, vec_col, codebook):
    """(cell, cv) rows of the coarse codebook: ``codebook`` (any
    DataFrame carrying cell + cv columns, e.g. kmeans_refine output --
    cells numbered 0..K-1, cv the quantized int64 centroid) when
    given, else the default deterministic hash sample. Bounded collect
    (<= K rows): the index-build step documented in ivf_topk."""
    src = (
        codebook.select("cell", "cv")
        if codebook is not None
        else ivf_centroid_rows(emb, n_cells, id_col, vec_col)
    )
    rows = src.collect()
    # every consumer sorts by cell and then reports the POSITIONAL
    # argmax as the cell id; a caller-supplied codebook with
    # non-contiguous cells would be silently relabeled, so enforce the
    # documented 0..K-1 contract here instead
    cells = sorted(r["cell"] for r in rows)
    if cells != list(range(len(rows))):
        raise ValueError(
            f"codebook cells must be exactly 0..{len(rows) - 1} "
            f"(got {cells[:8]}{'...' if len(cells) > 8 else ''})"
        )
    return rows


def ivf_topk(
    emb: DataFrame, query_vec_id: int, k: int = 10, n_cells: int = 16,
    n_probe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
    persist_assignments: bool = True, codebook: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: assign every vector to its nearest
    coarse centroid (one Arrow matmul pass, codebook in the closure),
    probe the ``n_probe`` cells nearest the query, exact-rerank the
    candidates. The inverted-list counterpart to ann_lsh_topk's
    hash-bucket partitioning: cells adapt to the data's density instead
    of to random hyperplanes.

    The codebook is collected ONCE here (bounded at n_cells rows --
    the IVF index-build step, not a per-row action); probe selection
    stays relational (centroids x broadcast query, top n_probe by
    exact integer dot, ties to the smaller cell). Assignment ties go
    to the smaller cell id in both engines (np.argmax first-max ==
    row_number ordered cell ASC), so the whole operator is
    SQL-oracle-checkable. Output (vec_id, dot), exact within probed
    cells; recall < 1 across cell boundaries by construction."""
    import numpy as np
    import pandas as pd  # noqa: PLC0415 (worker-side)
    from pyspark import StorageLevel

    rows = _collect_codebook(emb, n_cells, id_col, vec_col, codebook)
    # index build: n_cells rows, bounded. The probes plan below reuses
    # these collected rows as a local relation instead of referencing
    # the centroid DataFrame again -- that would re-run the md5
    # sort/limit scan of the whole embedding table a second time per
    # call
    cmat = np.array(
        [r["cv"] for r in sorted(rows, key=lambda r: r["cell"])], dtype=np.int64
    ).T  # (dim, n_cells)
    cents = emb.sparkSession.createDataFrame(
        [(int(r["cell"]), [int(x) for x in r["cv"]]) for r in rows],
        "cell bigint, cv array<bigint>",
    )

    id_type = emb.schema[id_col].dataType.simpleString()

    dim = cmat.shape[0]

    def assign(batches):
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            frb, m = _quantized_from_batch(rb, 1, dim)
            if m is None:
                continue
            cell = np.argmax(_gram_exact(m, cmat), axis=1)  # first max = smallest
            yield pa.RecordBatch.from_arrays(
                [frb.column(0), pa.array(cell)], names=[id_col, "cell"]
            )

    asg = emb.select(id_col, vec_col).mapInArrow(
        assign, f"{id_col} {id_type}, cell bigint"
    )
    if persist_assignments:
        # consumed once per query but rebuilt per ivf_topk call;
        # persisting lets a session issuing many queries against the
        # same index reuse the assignment scan (cache caveat as in
        # ann_lsh_topk)
        asg = asg.persist(StorageLevel.MEMORY_AND_DISK)

    # a NULL query embedding must yield the empty result, matching the
    # SQL oracle whose quantized CTE filters nulls up front (without
    # this the rerank would emit k rows with NULL dot)
    qv = (
        emb.where(
            (F.col(id_col) == query_vec_id) & F.col(vec_col).isNotNull()
        )
        .select(quantized(F.col(vec_col)).alias("qq"))
    )
    probes = (
        cents.crossJoin(F.broadcast(qv))
        .select("cell", dot_q(F.col("cv"), F.col("qq")).alias("qd"))
        .orderBy(F.col("qd").desc(), F.col("cell"))
        .limit(n_probe)
        .select("cell")
    )
    cand = (
        asg.join(F.broadcast(probes), "cell")
        .where(F.col(id_col) != query_vec_id)
        .select(id_col)
    )
    out = (
        brute_force_scores(
            emb.join(cand, id_col, "left_semi").unionByName(
                emb.where(F.col(id_col) == query_vec_id)
            ),
            query_vec_id, id_col, vec_col,
        )
        .orderBy(F.col("dot").desc(), F.col(id_col))
        .limit(k)
    )
    if persist_assignments:
        from ..caching import attach_persists

        out = attach_persists(out, asg)
    return out


def ivf_topk_batch(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    persist_assignments: bool = True,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """IVF top-k for EVERY id in a query table, one relational pass --
    the inverted-list twin of ann_topk_batch. Output
    (qid, id_col, dot, rank), rank 1..k per query (dot desc, id asc;
    integer-exact, full SQL oracle).

    The corpus is scanned ONCE for the whole batch: the Arrow
    assignment pass emits (id, cell, quantized vector) together
    (_np_quantize is the exact-integer twin of the SQL ``quantized``,
    so downstream dots replay identically), and that persisted frame
    serves BOTH the probe-candidate lookup and the exact rerank -- no
    second JVM-side quantize scan, no corpus-keyed id-join (the r03
    shape paid three corpus scans plus an id-join that shuffled the
    vector payload). Probe selection is free: the assignment pass has
    every row's n_cells centroid dots in hand (the argmax input), so
    it emits each row's top-n_probe cell list alongside the
    assignment -- no (queries x centroids) join, no per-qid window
    shuffle (a literal-centroid-array JVM expression was tried and
    REJECTED: 16x64 literals make Catalyst analysis of the plan cost
    more driver time than the window it replaced). The only shuffle
    after the corpus scan is the scalar (qid, id, dot) top-k window;
    the (qid, cell, query-vector) probe set broadcasts (bounded by
    #queries * n_probe * dim -- the batch API's contract is a bounded
    query table; corpus-sized "query" sets belong in
    embedding_neardup_pairs/semantic_dedup). Null-embedding queries
    yield no rows. The assignment cache handle is attached; release
    with ``caching.released_after(df)``.
    """
    import numpy as np
    import pandas as pd  # noqa: PLC0415 (worker-side)
    from pyspark import StorageLevel
    from pyspark.sql.window import Window as W

    rows = _collect_codebook(emb, n_cells, id_col, vec_col, codebook)
    cmat = np.array(
        [r["cv"] for r in sorted(rows, key=lambda r: r["cell"])], dtype=np.int64
    ).T
    id_type = emb.schema[id_col].dataType.simpleString()
    npb = min(n_probe, cmat.shape[1])

    dim = cmat.shape[0]

    def assign(batches):
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            frb, m = _quantized_from_batch(rb, 1, dim)
            if m is None:
                continue
            s = _gram_exact(m, cmat)
            # stable argsort of -s == (dot desc, cell asc) -- cells
            # are positions 0..K-1, so stability IS the tie-break, and
            # probes[:, 0] == argmax(s) (first max) by the same rule
            probes = np.argsort(-s, axis=1, kind="stable")[:, :npb]
            n = len(m)
            i32 = np.int32
            yield pa.RecordBatch.from_arrays(
                [
                    frb.column(0),
                    pa.array(probes[:, 0]),
                    pa.ListArray.from_arrays(
                        pa.array(np.arange(n + 1, dtype=i32) * dim),
                        pa.array(m.reshape(-1)),
                    ),
                    pa.ListArray.from_arrays(
                        pa.array(np.arange(n + 1, dtype=i32) * npb),
                        pa.array(np.ascontiguousarray(probes).reshape(-1)),
                    ),
                ],
                names=[id_col, "cell", "qv", "probes"],
            )

    asg = emb.select(id_col, vec_col).mapInArrow(
        assign,
        f"{id_col} {id_type}, cell bigint, qv array<bigint>, "
        "probes array<bigint>",
    )
    if persist_assignments:
        asg = asg.persist(StorageLevel.MEMORY_AND_DISK)

    # bounded query batch (operator contract): broadcast the qid set so
    # the corpus-sized assignment table is never shuffled just to pick
    # out the query rows (1000x plan smoke: this flipped to SMJ)
    q = F.broadcast(queries.select(F.col(id_col).alias("qid")).distinct())
    probes = (
        asg.join(q, F.col(id_col) == F.col("qid"), "left_semi")
        .select(
            F.col(id_col).alias("qid"),
            F.col("qv").alias("qq"),
            F.explode("probes").alias("cell"),
        )
    )
    kw = W.partitionBy("qid").orderBy(F.col("dot").desc(), F.col(id_col))
    out = (
        asg.join(F.broadcast(probes), "cell")
        .where(F.col(id_col) != F.col("qid"))
        .select("qid", id_col, dot_q(F.col("qv"), F.col("qq")).alias("dot"))
        .withColumn("rank", F.row_number().over(kw))
        .where(F.col("rank") <= k)
        .select("qid", id_col, "dot", F.col("rank").cast("int").alias("rank"))
    )
    if persist_assignments:
        from ..caching import attach_persists

        out = attach_persists(out, asg)
    return out


def ann_lsh_topk(
    emb: DataFrame, query_vec_id: int, k: int = 10, n_bits: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    multi_probe: int = 0,
    persist_buckets: bool = True,
) -> DataFrame:
    """LSH-bucketed ANN: restrict the brute-force scan to the query's
    bucket, then exact re-rank. Recall < 1 by construction.

    ``multi_probe``: also search buckets within that Hamming distance
    of the query's bucket (each flipped sign bit is a hyperplane the
    query sits close to, so Hamming-adjacent buckets hold the likeliest
    missed neighbors). multi_probe=1 probes 1+n_bits buckets and
    typically recovers most of the recall an exact scan would add, at
    1/2^(n_bits-log2(1+n_bits)) of its cost."""
    from pyspark import StorageLevel

    # consumed twice (query-bucket lookup + candidate filter): persist
    # so the signature pass scans the corpus once, not twice. As with
    # lsh_candidate_pairs, the cache stays live behind the returned
    # DataFrame -- release it with caching.released_after(df) (the
    # handle is attached), or persist_buckets=False.
    buckets = hyperplane_lsh_buckets(emb, n_bits, id_col, vec_col)
    if persist_buckets:
        buckets = buckets.persist(StorageLevel.MEMORY_AND_DISK)
    qb = buckets.where(F.col(id_col) == query_vec_id).select(
        F.col("bucket").alias("qbucket")
    )
    cand = buckets.crossJoin(F.broadcast(qb))
    if multi_probe <= 0:
        cand = cand.where(F.col("bucket") == F.col("qbucket"))
    else:
        # popcount(bucket XOR qbucket) <= multi_probe, via bit_count
        cand = cand.where(
            F.bit_count(
                F.col("bucket").bitwiseXOR(F.col("qbucket"))
            ) <= multi_probe
        )
    # the query's own bucket always matches; it must not enter the
    # candidate set or the unionByName below would carry the query row
    # twice and the broadcast one-row query side would duplicate every
    # score (caught by the ann_lsh_topk SQL oracle)
    # the candidate set is one query's probed buckets -- SMALL next to
    # the corpus but a constant FRACTION of it (multi_probe at n_bits=8
    # keeps ~3.5%), so a hard broadcast hint would bypass
    # autoBroadcastJoinThreshold and abort past the 8 GB broadcast cap
    # at 10^12 rows. Leave the strategy to AQE: it converts the
    # semi-join to broadcast at runtime whenever the candidate side
    # measures small, which is every realistic invocation.
    cand = cand.where(F.col(id_col) != query_vec_id).select(id_col)
    out = (
        brute_force_scores(emb.join(cand, id_col, "left_semi").unionByName(
            emb.where(F.col(id_col) == query_vec_id)
        ), query_vec_id, id_col, vec_col)
        .orderBy(F.col("dot").desc(), F.col(id_col))
        .limit(k)
    )
    if persist_buckets:
        from ..caching import attach_persists

        out = attach_persists(out, buckets)
    return out


def ann_topk_batch(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multi_probe: int = 0,
    persist_buckets: bool = True,
) -> DataFrame:
    """Top-k LSH-bucketed neighbors for EVERY id in a query TABLE, in
    one relational pass. Output (qid, id_col, dot, rank) with rank
    1..k per query (dot desc, id asc -- integer-deterministic, full
    SQL oracle).

    Real similarity workloads score a query table, not one id:
    calling ann_lsh_topk N times builds the bucket table N times and
    pays N corpus scans. Here the signature pass runs ONCE, and the
    candidate lookup is one EQUI-join of corpus buckets against the
    (query x probe) table -- multi-probe buckets are enumerated
    driver-side as all XOR masks with popcount <= multi_probe over
    n_bits bits (sum of C(n_bits, i), e.g. 9 masks at n_bits=8 m=1),
    which turns the single-query form's Hamming-ball theta-filter
    into a plain shuffle/broadcast-able equi-join. Per-query top-k is
    one window over qid; per-query candidate counts are bounded by
    bucket sizes, so no hot key outlives its bucket.

    Queries whose embedding is NULL (no bucket row) contribute no
    output rows. The bucket cache handle is attached; release with
    ``caching.released_after(df)``.
    """
    from itertools import combinations

    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    masks = [0]
    for m in range(1, multi_probe + 1):
        for bits in combinations(range(n_bits), m):
            masks.append(sum(1 << b for b in bits))

    buckets = hyperplane_lsh_buckets(emb, n_bits, id_col, vec_col)
    if persist_buckets:
        buckets = buckets.persist(StorageLevel.MEMORY_AND_DISK)
    # the query-id set is BOUNDED by the operator's query-batch
    # contract: hard-hint every join against it (the 1000x plan smoke
    # showed the planner flipping these to SortMergeJoin once corpus
    # file stats grow past the auto-broadcast threshold, shuffling the
    # whole corpus to filter it by a few thousand qids)
    q = F.broadcast(queries.select(F.col(id_col).alias("qid")).distinct())
    qb = buckets.join(q, F.col(id_col) == F.col("qid")).select("qid", "bucket")
    probes = qb.select(
        "qid",
        F.explode(
            F.array(*[F.lit(int(m)).cast("long") for m in masks])
        ).alias("mask"),
        "bucket",
    ).select("qid", F.col("bucket").bitwiseXOR(F.col("mask")).alias("bucket"))
    cand = (
        # probes = queries x probe-masks, bounded like q
        buckets.join(F.broadcast(probes), "bucket")
        .where(F.col(id_col) != F.col("qid"))
        .select("qid", id_col)
    )
    e = emb.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col), quantized(F.col(vec_col)).alias("qv")
    )
    qe = e.join(q, F.col(id_col) == F.col("qid"), "left_semi").select(
        F.col(id_col).alias("qid"), F.col("qv").alias("qq")
    )
    # cand join e stays stats-driven: candidates are bucket-sized (a
    # corpus fraction at scale), so a hard broadcast would abort past
    # the 8 GB cap -- SMJ is the correct strategy there at 10^12 rows
    scored = (
        cand.join(e, id_col)
        .join(F.broadcast(qe), "qid")
        .select("qid", id_col, dot_q(F.col("qv"), F.col("qq")).alias("dot"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("dot").desc(), F.col(id_col))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", id_col, "dot", F.col("rank").cast("int").alias("rank"))
    )
    if persist_buckets:
        from ..caching import attach_persists

        out = attach_persists(out, buckets)
    return out


def semantic_dedup(
    emb: DataFrame,
    n_cells: int = 16,
    tau_num: int = 7,
    tau_den: int = 20,
    max_cell: int = 1_000_000,
    chunk: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
    persist_input: bool = False,
) -> DataFrame:
    """SemDeDup-style cluster-scoped semantic deduplication: assign
    every embedding to its nearest coarse centroid (the ivf_topk
    codebook + Arrow matmul assignment), then WITHIN each cell mark a
    vector dropped when any smaller-id vector in the same cell has
    cosine >= tau_num/tau_den. Output (id, cell, kept) for every
    non-null-embedding row; kept=False rows are the semantic
    near-duplicates a curation pipeline removes before training.

    Scale shape: the O(n^2) similarity graph is confined to one cell
    (SemDeDup's point -- n_cells must grow with the corpus so cells
    stay bounded; the per-cell Gram matrix additionally runs in
    ``chunk``-row blocks so peak memory is O(chunk * cell), and a cell
    above ``max_cell`` raises rather than silently funneling a corpus
    into one task). The flat codebook's driver collect caps usable
    n_cells at ~10^6; past that, assign with ivf2_assign (two-level,
    fine codebook never collected) and run the same within-cell
    first-wins drop grouped on (coarse, fine). One shuffle total (the cell groupBy); the
    assignment emits (id, vec, cell) in a single map pass so the
    vector payload shuffles exactly once.

    Semantics note: the keep rule is first-wins against ALL earlier
    same-cell rows (a dropped row still shadows later lookalikes) --
    the same convention as paragraph/passage dedup, chosen over
    connected-component representatives so the decision is
    order-independent, blockwise-parallel, and SQL-replayable (the
    oracle is one self-join + EXISTS); dedup_clusters provides CC
    semantics where those are wanted. The cosine test is the exact
    rational integer predicate of embedding_neardup_pairs; the
    codebook collect is the bounded index-build step documented in
    ivf_topk. The assignment is an Arrow pass (flat-buffer vector
    ingestion, no per-row Python) that ships each quantized vector
    onward as ONE fixed-width binary blob, so the cell shuffle moves
    packed bytes and the within-cell pass rebuilds its matrix with a
    single frombuffer -- the stacked-ndarray ingestion this replaced
    cost ~3 s per 50 k x 32 scan at the 10x step-up (BENCH.md
    round 4). Pass ``codebook`` (e.g. kmeans_refine's output) to
    dedup against density-adapted cells instead of the default hash
    sample -- tighter clusters catch more near-duplicates at the same
    threshold.

    When the default codebook is sampled from ``emb`` itself, the
    input is consumed twice (codebook collect + assignment pass).
    Pass ``persist_input=True`` when ``emb`` is a DERIVED plan (e.g.
    hash_embedding's explode+aggs) so the featurization executes once
    -- measured 3.3 -> 2.7 s on the text path; for a plain columnar
    scan the cache write/read costs MORE than the pruned re-scan
    (measured 0.65 -> 0.97 s), hence opt-in, not default. The handle
    rides on the returned DataFrame; release with
    ``caching.released_after(df)``."""
    import numpy as np
    import pandas as pd  # noqa: PLC0415 (worker-side)
    from pyspark import StorageLevel

    from ..caching import attach_persists

    # same precondition as embedding_neardup_pairs: the int64 guard in
    # the within-cell pass divides by tau_den and assumes the tn2 side
    # never dominates; tau_num > tau_den would wrap silently
    if not (0 < tau_num <= tau_den):
        raise ValueError(
            f"tau_num/tau_den must satisfy 0 < tau_num <= tau_den "
            f"(got {tau_num}/{tau_den})"
        )

    cached: list[DataFrame] = []
    if persist_input and codebook is None:
        emb = emb.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(emb)
    rows = _collect_codebook(emb, n_cells, id_col, vec_col, codebook)
    cmat = np.array(
        [r["cv"] for r in sorted(rows, key=lambda r: r["cell"])],
        dtype=np.int64,
    ).T
    id_type = emb.schema[id_col].dataType.simpleString()
    tn2, td2 = tau_num * tau_num, tau_den * tau_den
    dim = cmat.shape[0]

    def assign(batches):
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            frb, m = _quantized_from_batch(rb, 1, dim)
            if m is None:
                continue
            cell = np.argmax(_gram_exact(m, cmat), axis=1)  # first max = smallest cell
            yield pa.RecordBatch.from_arrays(
                [
                    frb.column(0),
                    _packed_binary(pa, m),
                    pa.array(cell, type=pa.int64()),
                ],
                names=[id_col, "qv", "cell"],
            )

    withc = emb.select(id_col, vec_col).mapInArrow(
        assign, f"{id_col} {id_type}, qv binary, cell bigint"
    )

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n == 0:
            return pd.DataFrame({id_col: [], "cell": [], "kept": []})
        if n > max_cell:
            raise ValueError(
                f"cell of {n} rows exceeds max_cell={max_cell}: raise "
                "n_cells so cells stay bounded (SemDeDup's contract)"
            )
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        q = np.frombuffer(
            b"".join(pdf["qv"].to_numpy()), dtype="<i8"
        ).reshape(n, dim)[order]
        na2 = (q * q).sum(axis=1)
        # exactness precondition: |dot| <= na2_max (Cauchy-Schwarz), so
        # td^2*dot^2 and tn^2*na2*nb2 both fit int64 iff
        # tau_den * na2_max <= floor(sqrt(2^63 - 1)) = 3_037_000_499
        # (integer hash embeddings have much larger norms than
        # unit-float vectors, so the bound is the true one, not a
        # round conservative margin)
        if int(na2.max(initial=0)) > 3_037_000_499 // tau_den:
            raise ValueError("quantized norms too large for exact int64 test")
        # the guard just passed => every Gram partial sum is an integer
        # <= max(na2) <= 3.04e9 << 2^53, so the float64 BLAS product is
        # exact (and ~14x faster than the BLAS-less int64 matmul; the
        # 25k-row skewed cell at the 10x step-up went 15 s -> ~1 s)
        qf = q.astype(np.float64)
        kept = np.ones(n, dtype=bool)
        for lo in range(1, n, chunk):
            hi = min(lo + chunk, n)
            d = (qf[lo:hi] @ qf[:hi].T).astype(np.int64)
            cond = (d > 0) & (
                td2 * d * d >= tn2 * na2[lo:hi, None] * na2[None, :hi]
            )
            # only SMALLER-id columns count (col index < row index)
            valid = np.arange(hi)[None, :] < np.arange(lo, hi)[:, None]
            kept[lo:hi] = ~(cond & valid).any(axis=1)
        return pd.DataFrame(
            {id_col: ids, "cell": pdf["cell"].iloc[0], "kept": kept}
        )

    out = withc.groupBy("cell").applyInPandas(
        per_cell, f"{id_col} {id_type}, cell bigint, kept boolean"
    )
    return attach_persists(out, *cached) if cached else out


def kmeans_refine(
    emb: DataFrame,
    n_cells: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd k-means refinement of the deterministic hash-sampled
    codebook, exact-integer end to end: each round assigns every
    quantized vector to its nearest centroid by TRUE squared Euclidean
    distance (argmax of 2*dot - |c|^2, ties to the smaller cell -- the
    |x|^2 term is constant per row and drops out) and recomputes each
    centroid as the coordinate-wise integer mean of its members,
    sign(s) * (|s| div n): truncation toward zero written explicitly
    so Spark, NumPy and the SQL oracle share one division semantics
    even on negative coordinate sums. Empty cells keep their previous
    centroid. Output (cell, cv, n_members) after ``n_iter`` rounds
    with n_members from the LAST assignment.

    Scale shape: per round = ONE map pass over the embeddings emitting
    per-(partition, cell) partial sums + counts, then a bounded
    driver-side reduce of ~n_partitions * n_cells rows (the classic
    distributed-Lloyd aggregate; same bounded index-build contract as
    ivf_topk's codebook collect). Integer sums are reduction-order
    independent, so the refined codebook is a pure function of the
    input -- fixed n_iter, no convergence probe, exactly the pagerank
    determinism recipe. Feed the result to ivf/semdedup-style
    assignment for a density-adapted index.

    The input is consumed n_iter+1 times (codebook + one scan per
    round). It is deliberately NOT persisted here: a pruned columnar
    scan re-reads cheaper than a cache round-trips (measured 0.89 vs
    1.21 s at sf0.1) -- callers with a derived input should persist
    it themselves around the call."""
    import numpy as np

    rows = ivf_centroid_rows(emb, n_cells, id_col, vec_col).collect()
    cmat = np.array(
        [r["cv"] for r in sorted(rows, key=lambda r: r["cell"])],
        dtype=np.int64,
    )  # (n_cells, dim)
    k, dim = cmat.shape
    counts = np.zeros(k, dtype=np.int64)
    for _ in range(n_iter):
        cm = cmat  # bind the CURRENT codebook into this round's closure
        c2 = (cm * cm).sum(axis=1)

        def partials(batches):
            import pyarrow as pa

            sums = np.zeros((k, dim), dtype=np.int64)
            cnts = np.zeros(k, dtype=np.int64)
            maxabs = 0
            seen = False
            for rb in batches:
                if rb.num_rows == 0:
                    continue
                _frb, q = _quantized_from_batch(rb, 0, dim)
                if q is None:
                    continue
                seen = True
                maxabs = max(maxabs, int(np.abs(q).max(initial=0)))
                score = 2 * _gram_exact(q, cm.T) - c2[None, :]
                cell = np.argmax(score, axis=1)  # first max = smaller cell
                np.add.at(sums, cell, q)
                np.add.at(cnts, cell, 1)
            if seen:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.arange(k)),
                        pa.ListArray.from_arrays(
                            pa.array(np.arange(k + 1, dtype=np.int32) * dim),
                            pa.array(sums.reshape(-1)),
                        ),
                        pa.array(cnts),
                        pa.array(np.full(k, maxabs, dtype=np.int64)),
                    ],
                    names=["cell", "s", "cnt", "maxabs"],
                )

        part = (
            emb.select(vec_col)
            .mapInArrow(
                partials,
                "cell bigint, s array<bigint>, cnt bigint, maxabs bigint",
            )
            .collect()
        )
        sums = np.zeros((k, dim), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for r in part:
            sums[r["cell"]] += np.array(r["s"], dtype=np.int64)
            counts[r["cell"]] += r["cnt"]
        # int64 exactness guard, mirroring embedding_neardup_pairs'
        # norm bound: every running per-cell coordinate sum (worker
        # np.add.at partials AND this driver reduce) is bounded by
        # total_rows * max|q|, so checking that product post-hoc is
        # sound -- if it fits int64 no intermediate can have wrapped,
        # and if it doesn't we raise instead of returning a silently
        # wrapped codebook (np.add.at wraps without warning).
        total_rows = int(counts.sum())
        gmax = max((int(r["maxabs"]) for r in part), default=0)
        if total_rows * gmax > np.iinfo(np.int64).max:
            raise ValueError(
                f"quantized coordinate sums may exceed int64 "
                f"({total_rows} rows * max|q|={gmax}): exact-integer "
                "k-means needs n_rows * max|q| < 2^63"
            )
        nonempty = counts > 0
        means = np.zeros_like(sums)
        s_ne = sums[nonempty]
        means[nonempty] = np.sign(s_ne) * (
            np.abs(s_ne) // counts[nonempty, None]
        )
        cmat = np.where(nonempty[:, None], means, cmat)
    return emb.sparkSession.createDataFrame(
        [
            (int(c), [int(x) for x in cmat[c]], int(counts[c]))
            for c in range(k)
        ],
        "cell bigint, cv array<bigint>, n_members bigint",
    )


def ivf2_assign(
    emb: DataFrame,
    n1: int = 16,
    n2: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """TWO-LEVEL IVF assignment -- the 10^12-row scale path for the
    cell counts where the single-level contract breaks: a flat
    codebook must fit the driver collect + task closure, which caps
    usable cells at ~10^6; two levels give n1 * n2 effective cells
    while only the n1-row COARSE codebook is ever collected. The FINE
    codebook (n2 md5-sampled members per coarse cell, deterministic,
    same recipe as ivf_centroid_rows but per-cell via one window) is
    a DataFrame end to end: never collected, never broadcast --
    assignment joins vectors to their cell's fine centroids with one
    COGROUPED pandas pass, co-partitioned on the coarse key, so each
    task sees one cell's vectors and that cell's centroids and runs
    one matmul.

    Assignment metric is max integer dot at both levels (ties to the
    smaller cell id), matching the ivf family; everything is
    quantized-integer deterministic, so coarse, fine codebook, and
    both argmaxes replay exactly in SQL. Output
    (id, coarse, fine) with fine in [0, per-cell sample size).

    Shuffle budget: ONE coarse-keyed exchange shared by the fine-
    codebook window and the cogroup (vectors move once), plus the
    bounded coarse-codebook scan. Plug the output into cell-scoped
    operators (semantic_dedup-style within-cell work keyed on
    (coarse, fine)).

    Persist-before-fanout: the ASSIGNED frame (a python-stage output)
    feeds BOTH cogroup sides -- the fine-codebook window and the
    vector side -- so it is persisted; without the cache the coarse
    assignment pass (and the whole emb upstream) would execute twice.
    The raw ``emb`` is not cached (a pruned columnar scan re-reads
    cheaper than a cache round-trip; persist a derived input around
    the call). The handle rides on the returned DataFrame; release
    with ``caching.released_after(df)``."""
    import numpy as np
    import pandas as pd  # noqa: PLC0415 (worker-side)
    from pyspark import StorageLevel

    from ..caching import attach_persists

    rows = ivf_centroid_rows(emb, n1, id_col, vec_col).collect()
    cmat = np.array(
        [r["cv"] for r in sorted(rows, key=lambda r: r["cell"])],
        dtype=np.int64,
    ).T
    id_type = emb.schema[id_col].dataType.simpleString()
    vec_sql = emb.schema[vec_col].dataType.simpleString()

    dim = cmat.shape[0]

    def assign_coarse(batches):
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            frb, m = _quantized_from_batch(rb, 1, dim)
            if m is None:
                continue
            coarse = np.argmax(_gram_exact(m, cmat), axis=1)
            yield pa.RecordBatch.from_arrays(
                [frb.column(0), frb.column(1), pa.array(coarse)],
                names=[id_col, vec_col, "coarse"],
            )

    withc = emb.select(id_col, vec_col).mapInArrow(
        assign_coarse, f"{id_col} {id_type}, {vec_col} {vec_sql}, coarse bigint"
    ).persist(StorageLevel.MEMORY_AND_DISK)

    w = Window.partitionBy("coarse").orderBy(
        F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8")),
        F.col(id_col),
    )
    fine_cb = (
        withc.withColumn("fine", F.row_number().over(w) - 1)
        .where(F.col("fine") < n2)
        .select("coarse", "fine", quantized(F.col(vec_col)).alias("cv"))
    )

    def per_cell(vecs: pd.DataFrame, cents: pd.DataFrame) -> pd.DataFrame:
        if len(vecs) == 0 or len(cents) == 0:
            return pd.DataFrame({id_col: [], "coarse": [], "fine": []})
        q = _np_quantize(
            np.stack([np.asarray(v, dtype=np.float64) for v in vecs[vec_col]])
        )
        order = np.argsort(cents["fine"].to_numpy())
        fmat = np.stack(
            [np.asarray(v, dtype=np.int64) for v in cents["cv"]]
        )[order].T
        fine_ids = cents["fine"].to_numpy()[order]
        best = np.argmax(_gram_exact(q, fmat), axis=1)  # first max = smallest fine
        return pd.DataFrame(
            {
                id_col: vecs[id_col].to_numpy(),
                "coarse": vecs["coarse"].to_numpy(),
                "fine": fine_ids[best],
            }
        )

    out = (
        withc.groupby("coarse")
        .cogroup(fine_cb.groupby("coarse"))
        .applyInPandas(
            per_cell, f"{id_col} {id_type}, coarse bigint, fine bigint"
        )
    )
    return attach_persists(out, withc)
