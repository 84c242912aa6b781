from .extract_job import run_extract, LINEAGE_COLS

__all__ = ["run_extract", "LINEAGE_COLS"]
