"""Custom stateful streaming operator: cross-batch first-seen URL
dedup via applyInPandasWithState.

An incremental crawl re-delivers URLs across micro-batches; exactly-
once file semantics (extract_stream) cannot dedup across deliveries.
This operator keys state by a bounded url-hash bucket (NOT by url --
state per key must stay small and the key space bounded) and keeps the
set of seen url digests per bucket. Emits only first-seen rows.

State sizing at scale: N_BUCKETS (= 2^12 here) x (16-byte digest *
urls/bucket) -- raise N_BUCKETS with corpus size so per-key state
stays rewrite-friendly. For 10^12 urls this state belongs in a
RocksDB-backed state store with TTL; the operator is agnostic to the
backend.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

N_BUCKETS = 1 << 12

_OUT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("bucket", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("seen", ArrayType(BinaryType()))])


def _dedup_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen: set[bytes] = set()
    if state.exists:
        (stored,) = state.get
        seen = {bytes(d) for d in stored}
    out_urls: list[str] = []
    for pdf in pdfs:
        for url in pdf["url"]:
            d = hashlib.md5(url.encode()).digest()
            if d not in seen:
                seen.add(d)
                out_urls.append(url)
    # rewrite the bucket's full digest set ONLY when it grew: in a
    # duplicate-heavy steady state most touched buckets see nothing
    # new, and skipping the update skips the dominant state-store
    # serialization cost for those batches
    if out_urls:
        state.update((list(seen),))
    yield pd.DataFrame({"url": out_urls, "bucket": [key[0]] * len(out_urls)})


def first_seen_urls(pages_stream: DataFrame) -> DataFrame:
    """Streaming first-seen filter: url -> emitted at most once across
    the stream's lifetime. One shuffle on the bucket key per batch."""
    keyed = pages_stream.select(
        "url", F.pmod(F.xxhash64("url"), F.lit(N_BUCKETS)).alias("bucket")
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _dedup_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
