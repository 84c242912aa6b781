"""Snapshot-committed table layer (north_star B8/B11).

Iceberg semantics on plain parquet (the sandbox has no Iceberg jars;
the module boundary keeps the swap trivial): an output table is a
directory of per-slice data dirs plus a ``_commits/`` manifest dir.
A slice exists IFF its manifest file exists -- manifests are written
via tmp-file + atomic rename AFTER the data lands, so readers never
see partial slices and a killed job leaves either a committed slice or
ignorable orphan files, exactly like an Iceberg snapshot commit.

Resume = skip slices whose manifest exists (``committed_slices``).
Readers list committed manifests and read exactly those data files.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        self.commits_dir = os.path.join(path, "_commits")
        self.data_dir = os.path.join(path, "data")

    # -- write side --

    def slice_dir(self, slice_id: int) -> str:
        return os.path.join(self.data_dir, f"slice={slice_id}")

    def _manifest_path(self, slice_id: int) -> str:
        return os.path.join(self.commits_dir, f"slice-{slice_id}.json")

    def committed_slices(self) -> set[int]:
        if not os.path.isdir(self.commits_dir):
            return set()
        out = set()
        for f in os.listdir(self.commits_dir):
            if f.startswith("slice-") and f.endswith(".json"):
                sid = f[len("slice-") : -len(".json")]
                # ignore stray near-matches (editor backups, manual
                # copies like 'slice-3 (copy).json') instead of taking
                # the whole table down with a ValueError
                if sid.isdigit():
                    out.add(int(sid))
        return out

    def _commit_manifest(
        self,
        slice_id: int,
        run_id: str,
        files: list[str],
        meta: dict[str, Any] | None,
    ) -> dict[str, Any]:
        """The one atomic-commit implementation: tmp-write the manifest,
        then rename. A slice is committed IFF its manifest exists."""
        reserved = {"slice_id", "run_id", "committed_at_unix", "files"}
        clash = reserved & set(meta or {})
        if clash:
            raise ValueError(
                f"meta keys {sorted(clash)} collide with reserved manifest "
                "fields (they would clobber the committed file list / "
                "time-travel key)"
            )
        manifest = {
            "slice_id": slice_id,
            "run_id": run_id,
            "committed_at_unix": time.time(),
            "files": files,
            **(meta or {}),
        }
        os.makedirs(self.commits_dir, exist_ok=True)
        tmp = self._manifest_path(slice_id) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, self._manifest_path(slice_id))  # the atomic commit
        return manifest

    def write_slice(
        self, df: DataFrame, slice_id: int, run_id: str, meta: dict[str, Any] | None = None
    ) -> dict[str, Any]:
        """Write a slice's data, then atomically commit its manifest."""
        sdir = self.slice_dir(slice_id)
        df.write.mode("overwrite").parquet(sdir)
        files = sorted(
            f for f in os.listdir(sdir) if f.endswith(".parquet")
        )
        return self._commit_manifest(slice_id, run_id, files, meta)

    def commit_slice_files(
        self,
        slice_id: int,
        run_id: str,
        files: list[str] | None = None,
        meta: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """Commit a slice whose data files were written by executor
        tasks directly (the fused sink path). ``files`` MUST be the
        file names this run's tasks reported -- listing the directory
        instead would commit stale orphans from a previous killed run
        with a different partition count as live data. An empty list is
        a legitimate commit (a slice whose input held zero rows).
        Kill-safety matches write_slice: no manifest, no visibility."""
        sdir = self.slice_dir(slice_id)
        if files is None:
            files = sorted(
                f for f in os.listdir(sdir) if f.endswith(".parquet")
            )
        else:
            missing = [
                f for f in files
                if not os.path.exists(os.path.join(sdir, f))
            ]
            if missing:
                raise FileNotFoundError(
                    f"slice {slice_id}: reported files missing on disk: "
                    f"{missing}"
                )
        return self._commit_manifest(slice_id, run_id, sorted(files), meta)

    # -- read side --

    def manifests(self) -> list[dict[str, Any]]:
        out = []
        for s in sorted(self.committed_slices()):
            with open(self._manifest_path(s)) as fh:
                out.append(json.load(fh))
        return out

    def read(
        self, spark: SparkSession, as_of_unix: float | None = None
    ) -> DataFrame:
        """Read exactly the files the committed manifests list.

        Reading manifest-listed files (not slice directories) is what
        makes stray files invisible: a task retry's leftover tmp file
        or a killed run's orphan part in an otherwise-committed slice
        dir never reaches a reader -- the Iceberg contract.

        ``as_of_unix`` gives snapshot time travel: only slices whose
        manifest committed at or before that instant are visible --
        the Iceberg snapshot-id read, keyed on commit time here.
        """
        manifests = self.manifests()
        if as_of_unix is not None:
            manifests = [
                m for m in manifests if m["committed_at_unix"] <= as_of_unix
            ]
        if not manifests:
            raise FileNotFoundError(f"no committed slices under {self.path}")
        paths = [
            os.path.join(self.slice_dir(m["slice_id"]), f)
            for m in manifests
            for f in m["files"]
        ]
        if not paths:
            # every committed slice is legitimately empty
            raise FileNotFoundError(
                f"committed slices under {self.path} contain no files"
            )
        return spark.read.parquet(*paths)
