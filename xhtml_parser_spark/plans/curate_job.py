"""Stage-checkpointed corpus curation job: the curation_funnel
operator as a RESUMABLE pipeline, each stage committed as a snapshot.

A 100 TB curation run dies mid-flight for ordinary reasons (spot
reclaim, quota, code push). The funnel's stages are sequential — each
consumes the previous stage's survivor set — so the natural checkpoint
grain is the stage: every stage writes its output through the same
atomic-manifest SnapshotTable protocol the extract job uses, and a
re-run skips any stage whose manifest already exists, recomputing
nothing upstream of the crash point.

Layout under ``output_path`` (one single-slice SnapshotTable each):

  stage=signals    per-doc signal projection (the expensive double
                   text scan: digest, predicted lang, word counts)
  stage=filtered   survivors of lang+quality+repetition (slim rows:
                   doc_id, host, h)
  stage=dedup      first doc per digest among filtered survivors
  stage=host_cap   k smallest doc_ids per host among dedup survivors
  stage=sample     deterministic hash-sample survivors (the final
                   keep list)
  stage=metrics    (stage_ord, stage, rows_kept) — identical numbers
                   to the curation_funnel operator on the same input
  stage=kept_docs  (optional, write_docs=True) the curated documents
                   themselves, input rows semi-joined by doc_id

Every manifest records the funnel parameters; resuming with different
parameters raises instead of silently mixing two different funnels'
stages (the cross-mode-resume guard pattern from extract_job).

Semantics are locked to ``operators/corpus.curation_funnel`` — the
end-to-end test asserts stage-by-stage count equality — and stage
outputs are integers / md5 hex strings, so the checkpoint adds no
engine-dependence.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.corpus import funnel_signals, hash_sample, host_cap
from ..sources.listing import files_digest, list_files
from ..sources.table import SnapshotTable

STAGES = ("signals", "filtered", "dedup", "host_cap", "sample", "metrics")


def _params_dict(**kw: Any) -> dict[str, Any]:
    return {k: v for k, v in sorted(kw.items())}


def _input_digest(input_path: str) -> str:
    """Fingerprint of the input's file listing: resuming against a
    DIFFERENT input must refuse (committed stages were computed from
    the old corpus; mixing them with new-input downstream stages
    produces a silently wrong funnel). Same guard class as
    extract_job's fused resume fingerprint."""
    if os.path.isdir(input_path):
        try:
            return files_digest(list_files(input_path, (".parquet",)))
        except FileNotFoundError:
            return "empty-dir"
    try:
        st = os.stat(input_path)
        return f"{os.path.basename(input_path)}:{st.st_size}"
    except OSError:
        # Non-local path (s3://, hdfs:// -> os.stat OSError).  The
        # fallback must still vary with the path, or two completely
        # different object-store inputs would both digest to the same
        # constant and the resume guard would silently pass -- the
        # exact mixed-input hazard it exists to prevent.
        return f"unknown:{input_path}"


class _Stage:
    """One single-slice SnapshotTable per stage, with a parameter
    fingerprint guard on resume."""

    def __init__(self, output_path: str, name: str, params: dict[str, Any]):
        self.name = name
        self.table = SnapshotTable(os.path.join(output_path, f"stage={name}"))
        self.params = params

    def committed(self) -> bool:
        done = 0 in self.table.committed_slices()
        if done:
            meta = self.table.manifests()[0]
            prev = meta.get("params")
            if prev != self.params:
                raise ValueError(
                    f"stage {self.name!r} was committed with params {prev}, "
                    f"resume requested {self.params}: refusing to mix two "
                    "different funnels' stages (delete the output dir or "
                    "match the parameters)"
                )
        return done

    def write(self, df: DataFrame, run_id: str) -> None:
        self.table.write_slice(df, 0, run_id, meta={"params": self.params})

    def read(self, spark: SparkSession) -> DataFrame:
        return self.table.read(spark)


def run_curation(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    run_id: str,
    target_match_col: str = "lang",
    min_words: int = 30,
    rep_mult: int = 8,
    k_host: int = 6,
    sample_num: int = 9,
    sample_den: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    host_col: str = "source",
    write_docs: bool = False,
    max_stages: int | None = None,
) -> dict[str, Any]:
    """Run (or resume) the stage-checkpointed curation funnel.

    ``max_stages`` stops after N newly-computed stages (the simulated
    mid-run kill used by tests and rehearsals). Returns a summary dict
    with per-stage status and the metric rows once available.
    """
    params = _params_dict(
        input_digest=_input_digest(input_path),
        target_match_col=target_match_col,
        min_words=min_words,
        rep_mult=rep_mult,
        k_host=k_host,
        sample_num=sample_num,
        sample_den=sample_den,
        text_col=text_col,
        id_col=id_col,
        host_col=host_col,
    )
    stages = {n: _Stage(output_path, n, params) for n in STAGES}
    if write_docs:
        stages["kept_docs"] = _Stage(output_path, "kept_docs", params)
    computed: list[str] = []
    skipped: list[str] = []
    budget = [max_stages if max_stages is not None else len(stages)]

    def ensure(name: str, build) -> DataFrame | None:
        st = stages[name]
        if st.committed():
            skipped.append(name)
            return st.read(spark)
        if budget[0] <= 0:
            return None  # simulated kill: stop before computing more
        df = build()
        st.write(df, run_id)
        computed.append(name)
        budget[0] -= 1
        return st.read(spark)  # downstream reads the COMMITTED bytes

    docs = spark.read.parquet(input_path)

    sig = ensure(
        "signals",
        lambda: funnel_signals(
            docs,
            target_match_col=target_match_col,
            text_col=text_col,
            id_col=id_col,
            host_col=host_col,
        ),
    )

    def _filtered() -> DataFrame:
        ok = (
            (F.col("pred_lang") == F.col("rec_lang"))
            & (F.col("n_words") >= min_words)
            & (F.lit(rep_mult) * F.col("top_word_cnt") <= F.col("n_words"))
        )
        return sig.where(ok).select("doc_id", "host", "h")

    filtered = ensure("filtered", _filtered) if sig is not None else None

    def _dedup() -> DataFrame:
        w = Window.partitionBy("h").orderBy("doc_id")
        return (
            filtered.withColumn("dr", F.row_number().over(w))
            .where(F.col("dr") == 1)
            .select("doc_id", "host", "h")
        )

    dedup = ensure("dedup", _dedup) if filtered is not None else None

    def _host_cap() -> DataFrame:
        capped = host_cap(dedup, k=k_host, host_col="host", id_col="doc_id")
        return (
            dedup.join(capped.select("doc_id"), "doc_id", "left_semi")
            .select("doc_id", "host", "h")
        )

    capped = ensure("host_cap", _host_cap) if dedup is not None else None

    def _sample() -> DataFrame:
        keep = hash_sample(capped, num=sample_num, den=sample_den)
        return (
            capped.join(keep.select("doc_id"), "doc_id", "left_semi")
            .select("doc_id", "host", "h")
        )

    sample = ensure("sample", _sample) if capped is not None else None

    def _metrics() -> DataFrame:
        names = ["input", "lang", "quality", "repetition"]
        flags = {
            "lang": F.col("pred_lang") == F.col("rec_lang"),
        }
        flags["quality"] = flags["lang"] & (F.col("n_words") >= min_words)
        flags["repetition"] = flags["quality"] & (
            F.lit(rep_mult) * F.col("top_word_cnt") <= F.col("n_words")
        )
        aggs = [F.count("*").alias("c_input")] + [
            F.coalesce(F.sum(flags[n].cast("long")), F.lit(0)).alias(f"c_{n}")
            for n in names[1:]
        ]
        head = sig.agg(*aggs).collect()[0]
        rows = [(i, n, head[f"c_{n}"]) for i, n in enumerate(names)]
        for name, df in (
            ("dedup", dedup), ("host_cap", capped), ("sample", sample)
        ):
            rows.append((len(rows), name, df.count()))
        return spark.createDataFrame(
            rows, "stage_ord int, stage string, rows_kept bigint"
        )

    metrics = ensure("metrics", _metrics) if sample is not None else None

    if write_docs and metrics is not None:
        ensure(
            "kept_docs",
            lambda: docs.join(
                sample.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
            ),
        )

    out: dict[str, Any] = {
        "run_id": run_id,
        "computed": computed,
        "skipped": skipped,
        "complete": metrics is not None
        and (not write_docs or "kept_docs" in computed + skipped),
    }
    if metrics is not None:
        out["metrics"] = {
            r["stage"]: r["rows_kept"]
            for r in metrics.orderBy("stage_ord").collect()
        }
    return out


def read_curated(spark: SparkSession, output_path: str) -> DataFrame:
    """The final keep list (doc_id, host, h) of a completed run."""
    return SnapshotTable(os.path.join(output_path, "stage=sample")).read(spark)


def read_curation_metrics(spark: SparkSession, output_path: str) -> DataFrame:
    return SnapshotTable(os.path.join(output_path, "stage=metrics")).read(spark)
