"""spark-submit entry point for the stage-checkpointed curation job.

    spark-submit --py-files dist/xhtml_parser_spark.zip jobs/curate.py \
        --input /data/documents --output /data/curated --run-id cur-001 \
        --write-docs

Re-running the same command after a crash resumes: stages whose
snapshot manifest exists are skipped, everything downstream of the
crash point recomputes from the committed bytes. Prints one JSON
summary line (computed/skipped stages + per-stage survivor counts).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--min-words", type=int, default=30)
    ap.add_argument("--rep-mult", type=int, default=8)
    ap.add_argument("--k-host", type=int, default=6)
    ap.add_argument("--sample-num", type=int, default=9)
    ap.add_argument("--sample-den", type=int, default=10)
    ap.add_argument("--write-docs", action="store_true")
    ap.add_argument(
        "--max-stages", type=int, default=None,
        help="stop after N newly computed stages (kill rehearsal)",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from xhtml_parser_spark.plans.curate_job import run_curation
    from xhtml_parser_spark.session import get_spark

    spark = get_spark("xps-curate", master=args.master)
    try:
        summary = run_curation(
            spark,
            input_path=args.input,
            output_path=args.output,
            run_id=args.run_id,
            min_words=args.min_words,
            rep_mult=args.rep_mult,
            k_host=args.k_host,
            sample_num=args.sample_num,
            sample_den=args.sample_den,
            write_docs=args.write_docs,
            max_stages=args.max_stages,
        )
        print(json.dumps(summary))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
