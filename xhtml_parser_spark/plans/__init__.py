from .curate_job import read_curated, read_curation_metrics, run_curation
from .extract_job import run_extract, LINEAGE_COLS

__all__ = [
    "run_extract",
    "LINEAGE_COLS",
    "run_curation",
    "read_curated",
    "read_curation_metrics",
]
