#!/usr/bin/env python3
"""spark-submit entry point for the extraction pipeline.

  spark-submit --py-files dist/xhtml_parser_spark.zip jobs/extract.py \
      --input /data/pages --output /data/extracted --run-id run-001 \
      [--slices 256] [--partitions 4096] [--max-slices N]

Resumable: re-running with the same --output skips committed slices.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--slices", type=int, default=8)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--max-slices", type=int, default=None)
    ap.add_argument(
        "--fused",
        action="store_true",
        help="zero-IPC sink: tasks read+parse+write parquet in-process, "
        "JVM sees only lineage rows (input-file-group commit units)",
    )
    ap.add_argument(
        "--input-format",
        choices=["parquet", "warc"],
        default="parquet",
        help="input layout: parquet pages table, or a directory of "
        ".warc(.gz) crawl shards (standard path only)",
    )
    ap.add_argument(
        "--layout",
        choices=["range", "hash"],
        default=None,
        help="standard-path output layout: range-partition by url hash "
        "(the default, north-rule literal) or plain hash partitioning; "
        "rejected with --fused (fused output is input-file-clustered)",
    )
    args = ap.parse_args()

    from xhtml_parser_spark.session import get_spark
    from xhtml_parser_spark.plans import run_extract

    spark = get_spark("xps-extract")
    summary = run_extract(
        spark,
        input_path=args.input,
        output_path=args.output,
        run_id=args.run_id,
        n_slices=args.slices,
        partitions=args.partitions,
        max_slices=args.max_slices,
        fused=args.fused,
        layout=args.layout,
        input_format=args.input_format,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
