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
                out.add(int(f[len("slice-") : -len(".json")]))
        return out

    def write_slice(
        self, df: DataFrame, slice_id: int, run_id: str, meta: dict[str, Any] | None = None
    ) -> dict[str, Any]:
        """Write a slice's data, then atomically commit its manifest."""
        sdir = self.slice_dir(slice_id)
        df.write.mode("overwrite").parquet(sdir)
        files = sorted(
            f for f in os.listdir(sdir) if f.endswith(".parquet")
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

    def commit_slice_files(
        self, slice_id: int, run_id: str, meta: dict[str, Any] | None = None
    ) -> dict[str, Any]:
        """Commit a slice whose data files were written by executor
        tasks directly (the fused sink path): list what landed in the
        slice dir, then the same tmp-write + atomic-rename manifest
        protocol as write_slice. Kill-safety is identical -- files
        without a manifest are invisible orphans."""
        sdir = self.slice_dir(slice_id)
        files = sorted(f for f in os.listdir(sdir) if f.endswith(".parquet"))
        if not files:
            raise FileNotFoundError(f"no parquet files landed in {sdir}")
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
        os.rename(tmp, self._manifest_path(slice_id))
        return manifest

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
        """Read committed slices only (uncommitted orphans invisible).

        ``as_of_unix`` gives snapshot time travel: only slices whose
        manifest committed at or before that instant are visible --
        the Iceberg snapshot-id read, keyed on commit time here.
        """
        if as_of_unix is None:
            slices = sorted(self.committed_slices())
        else:
            slices = [
                m["slice_id"]
                for m in self.manifests()
                if m["committed_at_unix"] <= as_of_unix
            ]
        dirs = [self.slice_dir(s) for s in slices]
        if not dirs:
            raise FileNotFoundError(f"no committed slices under {self.path}")
        return spark.read.parquet(*dirs)
