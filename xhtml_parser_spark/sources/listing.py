"""Shared input-dir listing for the python data sources.

Both custom readers (parse_datasource, fused_extract) key their
partitioning off a sorted parquet listing of one directory; keeping
the listing/grouping logic in one place means a fix (hidden-file
filtering, recursive dirs, grouping policy) cannot drift between the
two readers -- their partitioning of the same input dir must stay
identical, and the fused path's resume fingerprint hashes exactly this
listing.
"""

from __future__ import annotations

import hashlib
import os


def list_files(input_dir: str, suffixes: tuple[str, ...]) -> list[str]:
    """Sorted absolute paths of the dir's files matching ``suffixes``;
    raises on an empty listing (an empty input dir is a caller error,
    not an empty dataset). The single source for every reader's
    listing: parquet and warc paths must share hidden-file filtering /
    recursion policy or their resume fingerprints drift."""
    files = sorted(
        os.path.join(input_dir, f)
        for f in os.listdir(input_dir)
        if f.endswith(suffixes) and not f.startswith((".", "_"))
    )
    if not files:
        raise FileNotFoundError(
            f"no {'/'.join(suffixes)} files under {input_dir}"
        )
    return files


def list_parquet_files(input_dir: str) -> list[str]:
    """Sorted absolute paths of the dir's parquet files (see
    list_files)."""
    return list_files(input_dir, (".parquet",))


def group_round_robin(files: list[str], k: int) -> list[list[str]]:
    """files -> k groups, round-robin (keeps group byte-sizes even for
    same-sized files). k <= 0 or k >= len(files) means one file per
    group. Task launch for a python data source costs ~100-200 ms, so
    at low parallelism many single-file partitions serialize into pure
    overhead -- callers pass k ~ 3-4 waves per core."""
    if k <= 0 or k >= len(files):
        return [[f] for f in files]
    return [files[i::k] for i in range(k)]


def files_digest(files: list[str]) -> str:
    """md5 of the sorted basename listing -- slice membership is a pure
    function of the listing and n_slices, so resume must refuse to
    continue when it changes (an added or removed input file re-keys
    every file group)."""
    names = "\n".join(os.path.basename(f) for f in files)
    return hashlib.md5(names.encode()).hexdigest()


def listing_digest(input_dir: str) -> str:
    """md5 of the sorted parquet basename listing (see files_digest)."""
    return files_digest(list_parquet_files(input_dir))
