"""Distributed WET / WARC export: re-emit a corpus as sharded
Common-Crawl-interchange archives.

The reference pipeline's natural OUTPUT product (north_star: per-url
extracted text) in the format the ecosystem exchanges it in: WET
``conversion`` records (text/plain blocks, no HTTP envelope) for
extracted text, or WARC ``response`` records for filtered raw pages —
the write-side counterpart of ``sources/warc.py``'s readers, built on
its deterministic single-file writers (one gzip member per record,
mtime pinned).

Two export postures exist, intentionally:

* ``warc.write_wet_shards`` / ``write_wat_shards`` — one shard per
  INPUT PARTITION, streamed record-by-record via foreachPartition (a
  shard never materializes in worker memory; shard membership follows
  whatever partitioning the input happens to have).
* THIS module — shard membership is a pure function of the url
  (crc32 % n_shards), rows sorted within the shard, gzip mtime
  pinned: **byte-identical output for identical input regardless of
  input partitioning**, plus per-shard lineage rows. This is the
  posture for idempotent retry / resumable backfills; the cost is one
  shuffle and a shard held in task memory (size n_shards accordingly).

Scale shape:

* **Deterministic sharding**: shard = crc32(url) % n_shards, computed
  JVM-side — identical input always lands in the identical shard, so a
  re-run reproduces every archive byte-for-byte (gzip mtime pinned,
  rows sorted by url within the shard). Byte-determinism is what makes
  the export idempotent under retry without any commit protocol beyond
  atomic rename.
* **One shuffle**: the groupBy(shard) applyInPandas pass. Each task
  writes ONE .wet.gz via tmp + atomic rename and returns a lineage row
  (shard, path, records, block_bytes, file_bytes) — the job's driver
  result is n_shards lineage rows, never the data.
* **Bounded shards**: a task holds one shard in memory; size n_shards
  so shards land near the CC-conventional ~150 MB (n_shards ~
  corpus_text_bytes / 150e6). Common Crawl ships ~90k WET files per
  monthly crawl for exactly this reason.
* Hostile urls cannot break record framing: header CTL bytes are
  percent-encoded by ``warc._safe_uri`` before embedding.

Reference: the WARC/1.0 framing follows ISO 28500 as exercised by the
reader half (`sources/warc.py`); round-trip equality with
``iter_wet_records`` / ``iter_warc_records`` is the test contract.
"""

from __future__ import annotations

import datetime
import os
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .warc import _EPOCH

_LINEAGE_SCHEMA = (
    "shard int, path string, records bigint, block_bytes bigint, "
    "file_bytes bigint"
)


def _shard_writer(out_dir: str, kind: str, n_shards: int, resume: bool):
    """Per-shard pandas writer (runs in the executor): sorts the shard
    by url, writes one deterministic archive via tmp+rename, yields
    one lineage row. With ``resume``, a shard whose final file already
    exists is SKIPPED (sound because the bytes are a pure function of
    the input — the existing file is what this task would write); its
    lineage row is computed from the staged rows, and the atomic
    rename means a crashed task never leaves a partial final file."""
    import pandas as pd  # noqa: PLC0415 (worker-side)

    from .warc import write_warc_gz, write_wet_gz

    width = max(5, len(str(n_shards - 1)))
    write_one = write_wet_gz if kind == "wet" else write_warc_gz
    ext = "warc.wet.gz" if kind == "wet" else "warc.gz"

    def run(key, pdf):
        shard = int(key[0])
        # total sort key: duplicate urls (same page fetched twice --
        # routine in crawl data) would otherwise keep their
        # shuffle-arrival order and break byte-determinism. Null
        # payloads normalize to b"" first (None is not orderable
        # against bytes).
        pdf = pdf.assign(
            payload=[p if p is not None else b"" for p in pdf["payload"]]
        ).sort_values(["url", "_ts_us", "payload"], kind="mergesort")
        rows = []
        block_bytes = 0
        for url, ts_us, payload in zip(
            pdf["url"], pdf["_ts_us"], pdf["payload"]
        ):
            # epoch micros -> UTC instant, tz-proof: PySpark delivers
            # TimestampType as tz-NAIVE values in the session timezone,
            # which _format_ts would mislabel 'Z' on a non-UTC session
            # (the warc._write_shards lesson)
            t = _EPOCH + datetime.timedelta(microseconds=int(ts_us))
            b = bytes(payload) if payload is not None else b""
            rows.append((url, t, b))
            block_bytes += len(b)
        os.makedirs(out_dir, exist_ok=True)
        final = os.path.join(out_dir, f"part-{shard:0{width}d}.{ext}")
        if not (resume and os.path.exists(final)):
            tmp = final + f".tmp-{os.getpid()}"
            n = write_one(tmp, rows)
            assert n == len(rows)
            os.replace(tmp, final)
        return pd.DataFrame(
            {
                "shard": [shard],
                "path": [final],
                "records": [len(rows)],
                "block_bytes": [block_bytes],
                "file_bytes": [os.path.getsize(final)],
            }
        )

    return run


def _export(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    kind: str,
    url_col: str,
    payload_col: str,
    ts_col: str | None,
    resume: bool = False,
) -> DataFrame:
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    # timestamps travel as epoch MICROS (an instant), never as
    # TimestampType rows: the row path converts to naive session-local
    # datetimes and _format_ts would stamp the wrong instant on any
    # non-UTC session. Null ts -> epoch (deterministic default).
    ts_us = (
        F.coalesce(F.unix_micros(F.col(ts_col).cast("timestamp")), F.lit(0))
        if ts_col is not None
        else F.lit(0).cast("bigint")
    )
    staged = df.select(
        F.col(url_col).cast("string").alias("url"),
        ts_us.alias("_ts_us"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.pmod(F.crc32(F.col(url_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        # a WARC record cannot be addressed without a target URI:
        # null-url rows are dropped, documented in the public
        # docstrings (count them upstream if they matter)
    ).where(F.col("url").isNotNull())
    return staged.groupBy("shard").applyInPandas(
        _shard_writer(out_dir, kind, n_shards, resume), _LINEAGE_SCHEMA
    )


def wet_export(
    extracted: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    url_col: str = "url",
    text_col: str = "text",
    ts_col: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """Export extracted text as sharded WET archives
    (``part-<shard>.warc.wet.gz``, ``conversion`` records). Returns the
    lineage DataFrame — materialize it (``.collect()``) to run the
    export; lineage record/byte totals must reconcile with the input.

    ``ts_col`` (optional) supplies WARC-Date (shipped as epoch micros,
    so the stamped instant is correct on any session timezone); absent
    or null, the epoch is used so the output stays deterministic.
    Rows with a null url are DROPPED (a WARC record cannot be
    addressed without a target URI) — count them upstream if they
    matter.

    ``resume=True`` skips any shard whose final archive already exists
    — sound because the bytes are a pure function of the input, and a
    crashed task never leaves a partial final file (tmp + atomic
    rename). The shard's rows are still shuffled and staged (the
    upstream compute is paid); what's saved is the gzip + the write,
    which is what matters when out_dir is remote object storage."""
    return _export(
        extracted, out_dir, n_shards, "wet", url_col, text_col, ts_col, resume
    )


def warc_export(
    pages: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    url_col: str = "url",
    html_col: str = "html",
    ts_col: str | None = "warc_ts",
    resume: bool = False,
) -> DataFrame:
    """Export raw pages as sharded WARC archives (``response`` records
    with a minimal HTTP/1.1 envelope, the CC packaging) — re-emitting
    a filtered/deduplicated corpus for interchange. Same contract as
    ``wet_export`` (incl. ``resume`` shard skip)."""
    return _export(
        pages, out_dir, n_shards, "warc", url_col, html_col, ts_col, resume
    )


def read_wet(spark, path: str, num_partitions: int | None = None) -> DataFrame:
    """(url, ts, text) from a directory of .wet.gz shards — the read
    side of ``wet_export``, for round-trip verification and WET-input
    pipelines. One task per file group (python-datasource launches are
    not free; see sources/listing.group_round_robin)."""
    import glob as _glob

    from .listing import group_round_robin

    files = sorted(
        f
        for f in _glob.glob(os.path.join(path, "*.gz"))
        if not os.path.basename(f).startswith("_")
    )
    if num_partitions:
        groups = group_round_robin(files, num_partitions)
    else:
        groups = [[f] for f in files]

    def gen(it):
        import pandas as pd  # noqa: PLC0415 (worker-side)

        from .warc import iter_wet_records

        # bounded output batches: a whole shard yielded as ONE pandas
        # frame becomes one giant Arrow batch and 32 parallel tasks
        # exhaust the JVM's direct-memory pool (netty
        # OutOfDirectMemoryError at the 10x corpus, BENCH.md round 5)
        MAX_ROWS, MAX_BYTES = 4096, 32 << 20
        for pdf in it:
            for paths in pdf["paths"]:
                urls, tss, texts, nb = [], [], [], 0
                for p in paths:
                    with open(p, "rb") as fh:
                        import gzip as _gzip

                        with _gzip.open(fh) as gz:
                            for url, ts, text in iter_wet_records(gz):
                                urls.append(url)
                                tss.append(ts)
                                texts.append(text)
                                nb += len(text)
                                if len(urls) >= MAX_ROWS or nb >= MAX_BYTES:
                                    yield pd.DataFrame(
                                        {"url": urls, "ts": tss, "text": texts}
                                    )
                                    urls, tss, texts, nb = [], [], [], 0
                if urls:
                    yield pd.DataFrame(
                        {"url": urls, "ts": tss, "text": texts}
                    )

    listing = spark.createDataFrame(
        [(list(g),) for g in groups], "paths array<string>"
    )
    return listing.mapInPandas(gen, "url string, ts timestamp, text binary")
