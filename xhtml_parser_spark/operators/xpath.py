"""Relational XPath-lite over the exploded nodes table (north_star
"XPath-lite node location", Spark-first form).

The kernel-side selector (kernel/document.py::select_path) walks one
in-memory document; this operator runs the SAME path semantics over
the ``parse_nodes`` table as pure DataFrame algebra, so path queries
distribute across 10^12 documents:

  * child step      -> equi-join nodes.parent_id = ctx.node_id
  * ``//`` step     -> RANGE join on the contiguous descendant
                       invariant: ctx.node_id < node_id <=
                       ctx.last_descendant (reference
                       src/document.rs:539-583) -- no recursion, no
                       per-document work
  * ``[k]``         -> row_number over (url, context node) in document
                       order, exactly the kernel's per-context 1-based
                       position
  * node-set union  -> dropDuplicates per step, like XPath

Every join carries the url key, so with the nodes table hash- or
range-partitioned by url the steps are co-partitioned shuffles; the
nodes input is consumed once per path segment -- persist it when
running many paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..kernel.document import _path_segments


def xpath_nodes(
    nodes: DataFrame, path: str, attrs: DataFrame | None = None
) -> DataFrame:
    """All node rows matching an ``a/b//c[2]``-style path, per url.

    ``nodes`` must have the parse_nodes schema (url, node_id,
    parent_id, kind, tag, last_descendant, ...). Attribute predicates
    (``div[@id]``, ``div[@class='x']``) additionally need ``attrs``
    with the parse_attrs schema (url, node_id, attr_idx, name, value);
    equality matches the FIRST-WINS value among duplicate attribute
    names (min attr_idx), exactly Node.get_attribute -- duplicates are
    real here because the reference's stale-from quirk produces them.
    Each predicate is one broadcast-able semi-join keyed on
    (url, node_id). Returns the matching rows with their full columns;
    differentially tested against the kernel selector on the fixture
    corpus.
    """
    segs = _path_segments(path)
    if not segs:
        return nodes.limit(0)
    if any(s[3] is not None for s in segs) and attrs is None:
        raise ValueError(
            "path uses an attribute predicate; pass the parse_attrs table"
        )
    ctx = None
    for step, (axis, name, idx, attr) in enumerate(segs):
        n = nodes.alias("n")
        if step == 0:
            # first step runs off the per-document head directly -- no
            # seed table, so the nodes input is consumed exactly once
            # per segment (a select('url').distinct() seed would add a
            # full scan + aggregate of the exploded table per path)
            if axis == "child":
                m = n.where(F.col("n.parent_id") == 0)
            else:
                m = n  # every node descends from the head
            ctx_key = F.lit(0)
        else:
            c = ctx.alias("c")
            if axis == "child":
                m = n.join(
                    c,
                    (F.col("n.url") == F.col("c.url"))
                    & (F.col("n.parent_id") == F.col("c.ctx_id")),
                )
            else:
                m = n.join(
                    c,
                    (F.col("n.url") == F.col("c.url"))
                    & (F.col("n.node_id") > F.col("c.ctx_id"))
                    & (F.col("n.node_id") <= F.col("c.ctx_last")),
                )
            ctx_key = F.col("c.ctx_id")
        m = m.where(F.col("n.kind") == 1)
        if name != "*":
            m = m.where(F.col("n.tag") == name)
        if attr is not None:
            k, v = attr
            named = attrs.where(F.col("name") == k)
            if v is None:
                sel = named.select("url", "node_id").distinct()
            else:
                # first-wins among duplicate names = value at min attr_idx
                sel = (
                    named.groupBy("url", "node_id")
                    .agg(F.min_by("value", "attr_idx").alias("value"))
                    .where(F.col("value") == v)
                    .select("url", "node_id")
                )
            m = m.join(
                sel.alias("a"),
                (F.col("n.url") == F.col("a.url"))
                & (F.col("n.node_id") == F.col("a.node_id")),
                "left_semi",
            )
        if idx is not None:
            w = Window.partitionBy(F.col("n.url"), ctx_key).orderBy(
                F.col("n.node_id")
            )
            m = m.withColumn("_rn", F.row_number().over(w)).where(
                F.col("_rn") == F.lit(idx)
            )
        ctx = m.select(
            F.col("n.url").alias("url"),
            F.col("n.node_id").alias("ctx_id"),
            F.col("n.last_descendant").alias("ctx_last"),
        ).dropDuplicates(["url", "ctx_id"])
    return nodes.join(
        ctx.select("url", F.col("ctx_id").alias("node_id")),
        ["url", "node_id"],
    )


def xpath_nodes_multi(
    nodes: DataFrame,
    paths: list[str],
    attrs: DataFrame | None = None,
    persist: bool = True,
) -> DataFrame:
    """Run a rule PACK of paths over one shared nodes scan: the union
    of ``xpath_nodes(nodes, p)`` for every p in ``paths``, each row
    tagged with its ``path``.

    Real extraction users run dozens of paths per document class
    (the per-doc analogue is the reference's navigation API,
    src/node.rs:575-668 -- one parsed tree, many selector walks).
    Calling xpath_nodes per path re-reads the nodes input once per
    SEGMENT, and when ``nodes`` is an unpersisted parse_nodes plan
    that means re-parsing the corpus segment*path times. Here the
    nodes table (and attrs, when any path carries an attribute
    predicate) is persisted once, so every segment join of every path
    is an InMemoryTableScan of the same cache -- the corpus is parsed
    exactly once however many paths the pack has
    (tests/test_plans.py asserts the plan shape).

    The caches stay live behind the returned DataFrame; handles are
    attached, release with ``caching.released_after(df)``.
    """
    if not paths:
        return nodes.limit(0).select(F.lit("").alias("path"), "*")
    from ..caching import attach_persists

    cached: list[DataFrame] = []
    if persist:
        nodes = nodes.persist()
        cached.append(nodes)
        if attrs is not None and any(
            s[3] is not None for p in paths for s in _path_segments(p)
        ):
            attrs = attrs.persist()
            cached.append(attrs)
    parts = [
        xpath_nodes(nodes, p, attrs).select(F.lit(p).alias("path"), "*")
        for p in paths
    ]
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return attach_persists(out, *cached)
