"""End-to-end pipeline tests: snapshot commits, lineage, resume-after-
kill, byte-identity through the whole job, salted host stats."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from xhtml_parser_spark.kernel import parse_document
from xhtml_parser_spark.plans import run_extract
from xhtml_parser_spark.plans.extract_job import host_stats, read_extracted, read_lineage
from xhtml_parser_spark.sources import gen_page, synthesize_pages


N_DOCS = 300


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("corpus") / "pages")
    synthesize_pages(spark, N_DOCS, max_b=8192).write.parquet(p)
    return p


def test_extract_job_end_to_end(spark, corpus_path, tmp_path):
    out = str(tmp_path / "extracted")
    summary = run_extract(spark, corpus_path, out, run_id="r1", n_slices=4)
    assert len(summary["processed"]) == 4

    ext = read_extracted(spark, out)
    assert ext.count() == N_DOCS
    assert ext.select("url").distinct().count() == N_DOCS  # no dup urls

    # lineage: per (slice, partition) rows; totals reconcile with data
    lin = read_lineage(spark, out)
    tot = lin.agg(
        F.sum("doc_count").alias("d"), F.sum("parse_error_count").alias("e")
    ).collect()[0]
    assert tot["d"] == N_DOCS
    assert tot["e"] == 3  # 1% malformed slots in 300 docs
    assert set(lin.columns) == {
        "run_id", "slice_id", "partition_id", "doc_count",
        "byte_count", "parse_error_count", "wall_ms",
    }

    # byte identity through the whole pipeline, spot-checked
    rows = ext.where(F.col("parse_ok")).orderBy("url").limit(20).collect()
    for r in rows:
        doc_id = int(r["url"].rsplit("/", 1)[1])
        local = parse_document(gen_page(doc_id, max_b=8192)[2])
        assert bytes(r["text"]) == local.extracted_text()


def test_resume_after_partial_run(spark, corpus_path, tmp_path):
    out = str(tmp_path / "extracted_resume")
    # simulate a mid-run kill: only 2 of 4 slices commit
    s1 = run_extract(spark, corpus_path, out, run_id="rA", n_slices=4, max_slices=2)
    assert len(s1["processed"]) == 2
    # partial table is readable and incomplete
    assert read_extracted(spark, out).count() < N_DOCS

    # resume: processes ONLY the remaining slices under a new run id
    s2 = run_extract(spark, corpus_path, out, run_id="rB", n_slices=4)
    assert sorted(x["slice_id"] for x in s2["processed"]) == sorted(
        set(range(4)) - {x["slice_id"] for x in s1["processed"]}
    )
    assert s2["skipped_committed"] == sorted(x["slice_id"] for x in s1["processed"])

    ext = read_extracted(spark, out)
    assert ext.count() == N_DOCS
    assert ext.select("url").distinct().count() == N_DOCS  # no duplicates

    # third run: everything committed, nothing to do
    s3 = run_extract(spark, corpus_path, out, run_id="rC", n_slices=4)
    assert s3["processed"] == []
    assert read_extracted(spark, out).count() == N_DOCS

    # lineage records both contributing runs
    lin = read_lineage(spark, out)
    runs = {r["run_id"] for r in lin.select("run_id").distinct().collect()}
    assert runs == {"rA", "rB"}


def test_uncommitted_slice_invisible(spark, corpus_path, tmp_path):
    """Orphan data without a manifest must be invisible to readers."""
    out = str(tmp_path / "extracted_orphan")
    run_extract(spark, corpus_path, out, run_id="r1", n_slices=2, max_slices=1)
    # fake an orphan: data dir exists, no manifest
    orphan = os.path.join(out, "data", "slice=1")
    os.makedirs(orphan, exist_ok=True)
    n = read_extracted(spark, out).count()
    run_extract(spark, corpus_path, out, run_id="r2", n_slices=2)
    assert read_extracted(spark, out).count() == N_DOCS
    assert n < N_DOCS


def test_host_stats_salted(spark, corpus_path):
    pages = spark.read.parquet(corpus_path)
    stats = host_stats(pages, salts=8)
    rows = stats.collect()
    assert sum(r["doc_count"] for r in rows) == N_DOCS
    top = max(rows, key=lambda r: r["doc_count"])
    assert top["doc_count"] >= N_DOCS * 0.05  # Zipf head present
    # cross-check against a plain groupBy
    from xhtml_parser_spark.functions.urls import url_host

    plain = (
        pages.select(url_host(F.col("url")).alias("host"))
        .groupBy("host")
        .count()
        .collect()
    )
    assert {r["host"]: r["count"] for r in plain} == {
        r["host"]: r["doc_count"] for r in rows
    }


def test_time_travel_read(spark, corpus_path, tmp_path):
    """Snapshot time travel: a read as-of an earlier commit instant sees
    only the slices committed by then."""
    import time as _time

    from xhtml_parser_spark.sources.table import SnapshotTable

    out = str(tmp_path / "extracted_tt")
    run_extract(spark, corpus_path, out, run_id="rA", n_slices=4, max_slices=2)
    t_mid = _time.time()
    run_extract(spark, corpus_path, out, run_id="rB", n_slices=4)

    table = SnapshotTable(out)
    n_then = table.read(spark, as_of_unix=t_mid).count()
    n_now = table.read(spark).count()
    assert 0 < n_then < n_now == N_DOCS


def test_snapshot_table_manifest_guards(spark, corpus_path, tmp_path):
    """Stray near-match files in _commits/ must not take the table down,
    and caller meta must not clobber reserved manifest fields."""
    from xhtml_parser_spark.sources.table import SnapshotTable

    out = str(tmp_path / "guards")
    run_extract(spark, corpus_path, out, run_id="rA", n_slices=2)
    table = SnapshotTable(out)
    before = table.committed_slices()
    # editor backup / manual copy beside real manifests
    stray = os.path.join(table.commits_dir, "slice-0 (copy).json")
    with open(stray, "w") as fh:
        fh.write("{}")
    assert table.committed_slices() == before  # ignored, not ValueError
    os.remove(stray)
    with pytest.raises(ValueError, match="reserved"):
        table.commit_slice_files(9, "rX", files=[], meta={"files": ["evil"]})


def test_parse_full_single_pass(spark, corpus_path):
    """parse_full emits text + nested DOM in one kernel pass, consistent
    with the per-output operators."""
    from pyspark.sql import functions as F

    from xhtml_parser_spark.operators.parse import parse_full, parse_nodes

    pages = spark.read.parquet(corpus_path).limit(20)
    full = parse_full(pages).where(F.col("parse_ok"))
    rows = {r["url"]: r for r in full.collect()}
    assert rows
    # nested node counts match the scalar stats
    for r in rows.values():
        assert len(r["nodes"]) == r["n_nodes"]
        assert len(r["attrs"]) == r["n_attrs"]
    # exploding the nested form equals the dedicated exploded operator,
    # on EVERY node column
    ncols = ["node_id", "parent_id", "kind", "tag", "depth", "text",
             "span_start", "last_descendant"]
    exploded = (
        full.select("url", F.explode("nodes").alias("n"))
        .select("url", *[f"n.{c}" for c in ncols])
        .collect()
    )
    direct = parse_nodes(pages).select("url", *ncols).collect()

    def norm(r):
        return tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else v
                     for v in r)

    assert sorted(map(norm, exploded)) == sorted(map(norm, direct))
    # and the nested attrs equal parse_attrs (attr_idx is positional)
    from xhtml_parser_spark.operators.parse import parse_attrs, parse_pages

    a_exploded = (
        full.select("url", F.explode("attrs").alias("a"))
        .select("url", "a.node_id", "a.name", "a.value")
        .collect()
    )
    a_direct = parse_attrs(pages).select("url", "node_id", "name", "value").collect()
    assert sorted(map(norm, a_exploded)) == sorted(map(norm, a_direct))
    # scalar text columns equal parse_pages byte-for-byte
    pp = {r["url"]: r for r in parse_pages(pages).where(F.col("parse_ok")).collect()}
    assert set(pp) == set(rows)
    for u, r in rows.items():
        assert bytes(r["text"]) == bytes(pp[u]["text"])
        assert bytes(r["text_main"]) == bytes(pp[u]["text_main"])
        assert r["max_depth"] == pp[u]["max_depth"]


def test_fused_extract_matches_standard(spark, corpus_path, tmp_path):
    """The zero-IPC fused sink (tasks read+parse+write parquet
    in-process) must land byte-identical rows to the standard
    scan -> mapInArrow -> JVM-write path, with reconciling lineage."""
    out_std = str(tmp_path / "std")
    out_f = str(tmp_path / "fused")
    run_extract(spark, corpus_path, out_std, run_id="s", n_slices=2)
    run_extract(spark, corpus_path, out_f, run_id="f", n_slices=2, fused=True)

    def snap(out):
        return {
            r["url"]: (
                bytes(r["text"]),
                bytes(r["text_main"]),
                r["parse_ok"],
                r["error_class"],
                r["n_nodes"],
            )
            for r in read_extracted(spark, out).collect()
        }

    assert snap(out_std) == snap(out_f)

    lin = read_lineage(spark, out_f)
    tot = lin.agg(
        F.sum("doc_count").alias("d"), F.sum("parse_error_count").alias("e")
    ).collect()[0]
    assert tot["d"] == N_DOCS and tot["e"] == 3
    assert set(lin.columns) == {
        "run_id", "slice_id", "partition_id", "doc_count",
        "byte_count", "parse_error_count", "wall_ms",
    }


def test_fused_resume_after_partial_run(spark, corpus_path, tmp_path):
    out = str(tmp_path / "fused_resume")
    s1 = run_extract(
        spark, corpus_path, out, run_id="fA", n_slices=4, max_slices=2, fused=True
    )
    assert len(s1["processed"]) == 2
    assert read_extracted(spark, out).count() < N_DOCS

    s2 = run_extract(spark, corpus_path, out, run_id="fB", n_slices=4, fused=True)
    assert s2["skipped_committed"] == sorted(x["slice_id"] for x in s1["processed"])
    ext = read_extracted(spark, out)
    assert ext.count() == N_DOCS
    assert ext.select("url").distinct().count() == N_DOCS

    s3 = run_extract(spark, corpus_path, out, run_id="fC", n_slices=4, fused=True)
    assert s3["processed"] == []


def test_fused_resume_refuses_changed_input_listing(spark, corpus_path, tmp_path):
    """Fused slice membership = files[slice_id::n_slices] of the sorted
    input listing, so a file added between runs re-keys every group;
    resume must refuse instead of silently duplicating/dropping docs."""
    import shutil

    indir = str(tmp_path / "pages_in")
    shutil.copytree(corpus_path, indir)
    out = str(tmp_path / "fused_digest")
    run_extract(
        spark, indir, out, run_id="gA", n_slices=4, max_slices=2, fused=True
    )
    # a new crawl drop lands between runs
    first = sorted(f for f in os.listdir(indir) if f.endswith(".parquet"))[0]
    shutil.copyfile(
        os.path.join(indir, first), os.path.join(indir, "zz-newdrop.parquet")
    )
    with pytest.raises(ValueError, match="input listing"):
        run_extract(spark, indir, out, run_id="gB", n_slices=4, fused=True)
    # restoring the original listing lets the resume proceed
    os.remove(os.path.join(indir, "zz-newdrop.parquet"))
    s = run_extract(spark, indir, out, run_id="gC", n_slices=4, fused=True)
    assert len(s["skipped_committed"]) == 2


def test_run_extract_rejects_layout_with_fused(spark, corpus_path, tmp_path):
    with pytest.raises(ValueError, match="layout is not supported"):
        run_extract(
            spark, corpus_path, str(tmp_path / "x"), run_id="l",
            fused=True, layout="range",
        )


def test_fused_extract_empty_input_file(spark, tmp_path):
    """A partition whose input split has zero rows must yield a
    zero-count lineage row, not crash or write an empty file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xhtml_parser_spark.sources.fused_extract import fused_extract_slice

    indir = str(tmp_path / "pages_empty")
    os.makedirs(indir)
    empty = pa.table(
        {"url": pa.array([], pa.string()), "html": pa.array([], pa.binary())}
    )
    pq.write_table(empty, os.path.join(indir, "part-0.parquet"))
    full = pa.table(
        {
            "url": pa.array(["http://a.test/1"]),
            "html": pa.array([b"<r>hi</r>"], pa.binary()),
        }
    )
    pq.write_table(full, os.path.join(indir, "part-1.parquet"))

    out = str(tmp_path / "out_empty")
    rows = fused_extract_slice(spark, indir, out).collect()
    assert sorted(r["doc_count"] for r in rows) == [0, 1]
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 1  # only the non-empty partition landed a file
    got = spark.read.parquet(out).collect()
    assert bytes(got[0]["text"]) == b"hi"


def test_reader_ignores_stray_files_in_committed_slice(spark, corpus_path, tmp_path):
    """Readers must see exactly the manifest-listed files: a leftover
    task-retry tmp file (or a stale part from an older run) inside a
    committed slice dir must not contribute rows."""
    import shutil

    out = str(tmp_path / "stray")
    run_extract(spark, corpus_path, out, run_id="r1", n_slices=2, fused=True)
    n0 = read_extracted(spark, out).count()
    sdir = os.path.join(out, "data", "slice=0")
    a_part = next(f for f in os.listdir(sdir) if f.endswith(".parquet"))
    shutil.copy(
        os.path.join(sdir, a_part),
        os.path.join(sdir, a_part + ".tmp-deadbeef"),
    )
    shutil.copy(
        os.path.join(sdir, a_part), os.path.join(sdir, "part-99999.parquet")
    )
    assert read_extracted(spark, out).count() == n0


@pytest.mark.parametrize("fused", [False, True])
def test_resume_heals_missing_lineage(spark, corpus_path, tmp_path, fused):
    """kill -9 between a slice's data commit and its lineage commit
    leaves a data slice with no lineage; resume must rebuild the
    missing lineage from the committed files (found by the 600k-doc
    backfill rehearsal)."""
    out = str(tmp_path / f"heal_{fused}")
    run_extract(spark, corpus_path, out, run_id="h1", n_slices=2, fused=fused)
    # simulate the crash window: drop slice 0's lineage manifest
    os.remove(os.path.join(out, "_lineage", "_commits", "slice-0.json"))
    lin = read_lineage(spark, out)
    partial = lin.agg(F.sum("doc_count").alias("d")).collect()[0]["d"]
    assert partial < N_DOCS

    s = run_extract(spark, corpus_path, out, run_id="h2", n_slices=2, fused=fused)
    assert s["healed_lineage"] == [0]
    assert s["processed"] == []
    lin = read_lineage(spark, out)
    tot = lin.agg(F.sum("doc_count").alias("d")).collect()[0]
    assert tot["d"] == N_DOCS
    healed_runs = {
        r["run_id"] for r in lin.where(F.col("slice_id") == 0).collect()
    }
    assert healed_runs == {"h2"}
    # the healed lineage slice must share one parquet schema with the
    # live slices: selecting partition_id used to fail with a parquet
    # column-type mismatch when the fused path wrote it as BIGINT while
    # the heal wrote INT
    pids = [r["partition_id"] for r in lin.select("partition_id").collect()]
    assert all(isinstance(p, int) for p in pids)
    assert dict(lin.dtypes)["partition_id"] == "int"
    assert dict(lin.dtypes)["slice_id"] == "int"


def test_resume_mode_mismatch_rejected(spark, corpus_path, tmp_path):
    """Resuming a partially-committed table in the other mode (or with a
    different n_slices) re-keys slice membership -- duplicated and
    missing documents with exactly-once-looking summaries. Must raise."""
    out = str(tmp_path / "mode_guard")
    run_extract(
        spark, corpus_path, out, run_id="m1", n_slices=4, max_slices=1,
        fused=True,
    )
    with pytest.raises(ValueError, match="fused"):
        run_extract(spark, corpus_path, out, run_id="m2", n_slices=4)
    with pytest.raises(ValueError, match="n_slices"):
        run_extract(
            spark, corpus_path, out, run_id="m3", n_slices=8, fused=True
        )
    # same mode + same n_slices resumes fine
    s = run_extract(spark, corpus_path, out, run_id="m4", n_slices=4, fused=True)
    assert s["skipped_committed"] == [0]
