"""Physical-plan audits: the properties that matter at 100 TB.

These assert on .explain() output so regressions in scan pruning,
filter pushdown, or broadcast strategy fail loudly in CI rather than
silently costing a full-corpus read at scale.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from xhtml_parser_spark.operators import parse_pages
from xhtml_parser_spark.operators.similarity import brute_force_scores
from xhtml_parser_spark.sources import synthesize_pages


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "pages")
    synthesize_pages(spark, 50, max_b=4096).write.parquet(p)
    return p


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_parse_scan_prunes_to_url_html(spark, pages_path):
    """The parse stage must read ONLY (url, html) -- a scan that also
    reads text/lang/warc_ts wastes 3 columns of IO per page."""
    df = parse_pages(spark.read.parquet(pages_path))
    plan = _plan(df)
    m = re.search(r"ReadSchema: (.*)", plan)
    assert m, plan
    assert "url" in m.group(1) and "html" in m.group(1)
    for col in ("warc_ts", "lang"):
        assert col not in m.group(1), f"{col} not pruned:\n{m.group(1)}"


def test_filter_pushdown_reaches_scan(spark, pages_path):
    df = spark.read.parquet(pages_path).where(F.col("lang") == "en").select("url")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan, plan


def test_parse_is_single_stage_no_shuffle(spark, pages_path):
    """parse_pages is map-side only: no Exchange may appear."""
    df = parse_pages(spark.read.parquet(pages_path))
    assert "Exchange" not in _plan(df)


def test_ann_query_vector_is_broadcast(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5]) for i in range(20)], "vec_id long, embedding array<float>"
    )
    plan = _plan(brute_force_scores(emb, query_vec_id=0))
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_lsh_signature_stage_computed_once(spark):
    """The minhash/shingle signature pass must be persisted before the
    DAG fans out (bucket self-join + two verify joins): every consumer
    branch has to read the cache, not recompute the mapInPandas stage.
    Without the persist this operator shingles the corpus four times."""
    from xhtml_parser_spark.operators.dedup import lsh_candidate_pairs

    df = spark.createDataFrame(
        [(i, f"w{i} x y z") for i in range(8)], "doc_id long, text string"
    )
    plan = _plan(lsh_candidate_pairs(df))
    # 4 consumers (b2 twice via the self-join, sha, shb) -> >= 4 cache
    # scans; any raw MapInPandas outside an InMemoryRelation block would
    # drop the InMemoryTableScan count below that
    assert plan.count("InMemoryTableScan") >= 4, plan


def test_bucketed_join_has_no_exchange(spark, pages_path, tmp_path):
    """Tables bucketed on the join key co-join with ZERO Exchange: the
    repeated nodes-x-attrs (and extracted-x-lineage) joins of a crawl
    pipeline must not re-shuffle the corpus each time."""
    from xhtml_parser_spark.operators import parse_attrs, parse_nodes
    from xhtml_parser_spark.plans.bucketed import write_bucketed

    pages = spark.read.parquet(pages_path)
    write_bucketed(
        parse_nodes(pages), "t_nodes_b", str(tmp_path / "nodes"),
        ["url"], n_buckets=4, sort_cols=["url"],
    )
    write_bucketed(
        parse_attrs(pages), "t_attrs_b", str(tmp_path / "attrs"),
        ["url"], n_buckets=4, sort_cols=["url"],
    )
    try:
        with_conf = [
            ("spark.sql.autoBroadcastJoinThreshold", "-1"),  # force SMJ
        ]
        old = {k: spark.conf.get(k) for k, _ in with_conf}
        for k, v in with_conf:
            spark.conf.set(k, v)
        try:
            joined = (
                spark.table("t_nodes_b")
                .join(spark.table("t_attrs_b"), "url")
                .groupBy("url")
                .count()
            )
            plan = _plan(joined)
            assert "SortMergeJoin" in plan, plan
            # the join itself must not shuffle either bucketed side;
            # only the final groupBy may introduce an Exchange, and
            # grouping on the bucket key elides even that
            assert "Exchange" not in plan, plan
            assert joined.count() > 0
        finally:
            for k, v in old.items():
                spark.conf.set(k, v)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_nodes_b")
        spark.sql("DROP TABLE IF EXISTS t_attrs_b")


def test_events_window_single_shuffle(spark):
    import __spark_entry__ as entry

    df = entry.queries()["events_dedup"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    # exactly one exchange: the window partitioning
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))
    assert n_exchanges == 1, plan


def test_xpath_multi_shares_one_parse_scan(spark, pages_path):
    """A rule pack of paths must read the exploded-DOM table from ONE
    shared cache: with persist on, every per-segment join consumes an
    InMemoryTableScan of the same parsed-nodes relation (the corpus is
    parsed once per pack, not once per path segment); with persist off
    the same plan would re-run the Arrow parse stage under every
    segment."""
    from xhtml_parser_spark.caching import release
    from xhtml_parser_spark.operators import parse_nodes
    from xhtml_parser_spark.operators.xpath import xpath_nodes_multi

    nodes = parse_nodes(spark.read.parquet(pages_path))
    paths = ["html//p", "html/body/*", "//div//p"]
    shared = xpath_nodes_multi(nodes, paths)
    plan = _plan(shared)
    # 3 paths x (>=1 segment consumption + final row join) -> >= 6
    # reads of the cached relation
    assert plan.count("InMemoryTableScan") >= 6, plan
    release(shared)

    unshared = xpath_nodes_multi(nodes, paths, persist=False)
    uplan = _plan(unshared)
    assert "InMemoryTableScan" not in uplan
    assert uplan.count("MapInArrow") >= 6, "without the cache every segment re-parses"


def test_xpath_select_is_single_stage_no_shuffle(spark, pages_path):
    """The fused rule-pack selector is map-side only: one scan, one
    MapInArrow, ZERO Exchange however many paths the pack carries --
    the per-document path semantics never need one. The scan must
    still prune to (url, html)."""
    from xhtml_parser_spark.operators.xpath import xpath_select

    df = xpath_select(
        spark.read.parquet(pages_path),
        ["html//p", "html/body/*", "//div//p", "//p[1]", "//div[@class='x']"],
    )
    plan = _plan(df)
    assert "Exchange" not in plan, plan
    assert plan.count("MapInArrow (") == 1, plan
    m = re.search(r"ReadSchema: (.*)", plan)
    assert m and "url" in m.group(1) and "html" in m.group(1)
    for col in ("warc_ts", "lang", "text"):
        assert col not in m.group(1), f"{col} not pruned:\n{m.group(1)}"
