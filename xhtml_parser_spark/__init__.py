"""xhtml_parser_spark: a PySpark-native XHTML parsing and main-content
extraction engine with the query/data-processing capabilities of the
reference engine (turgu1/xhtml_parser), re-expressed Spark-first.

Layers:
  kernel/     pure-Python/NumPy batch kernels (no Spark dependency):
              parser, packed-array DOM, navigation API, golden
              serializer, boilerplate stripping
  operators/  DataFrame-level operators: parse/extract (mapInPandas),
              dedup (exact / minhash-LSH / simhash), similarity search,
              text analysis
  sources/    pages-table synthesis, snapshot/commit table layer
              (Iceberg-style, parquet fallback), lineage
  functions/  column-level helper functions (pyspark.sql.functions
              compositions)
  plans/      end-to-end job assembly (extract pipeline w/ partitioning,
              salting, lineage, resume)
  streaming/  Structured Streaming variants of the extract pipeline
"""

__version__ = "0.1.0"

# Kernel API (pure Python, no Spark dependency): the reference-shaped
# per-document surface -- ParsedDoc/Node navigation over a packed DOM.
from .kernel import Attribute, Node, ParsedDoc, parse_document  # noqa: E402,F401

# Spark-dependent names resolve lazily (PEP 562) so the kernel stays
# importable in environments without pyspark on the path.
_LAZY = {
    "parse_pages": ("xhtml_parser_spark.operators", "parse_pages"),
    "parse_nodes": ("xhtml_parser_spark.operators", "parse_nodes"),
    "parse_attrs": ("xhtml_parser_spark.operators", "parse_attrs"),
    "parse_full": ("xhtml_parser_spark.operators", "parse_full"),
    "xpath_nodes": ("xhtml_parser_spark.operators.xpath", "xpath_nodes"),
    "xpath_nodes_multi": ("xhtml_parser_spark.operators.xpath", "xpath_nodes_multi"),
    "select_path": ("xhtml_parser_spark.kernel.document", "select_path"),
    "exact_dedup": ("xhtml_parser_spark.operators.dedup", "exact_dedup"),
    "minhash_signatures": ("xhtml_parser_spark.operators.dedup", "minhash_signatures"),
    "lsh_candidate_pairs": ("xhtml_parser_spark.operators.dedup", "lsh_candidate_pairs"),
    "simhash64": ("xhtml_parser_spark.operators.dedup", "simhash64"),
    "simhash_pairs": ("xhtml_parser_spark.operators.dedup", "simhash_pairs"),
    "ann_topk_batch": ("xhtml_parser_spark.operators.similarity", "ann_topk_batch"),
    "extract_links": ("xhtml_parser_spark.operators.links", "extract_links"),
    "host_link_graph": ("xhtml_parser_spark.operators.links", "host_link_graph"),
    "pagerank": ("xhtml_parser_spark.operators.links", "pagerank"),
    "connected_components": ("xhtml_parser_spark.operators.dedup", "connected_components"),
    "dedup_clusters": ("xhtml_parser_spark.operators.dedup", "dedup_clusters"),
    "dedup_keep": ("xhtml_parser_spark.operators.dedup", "dedup_keep"),
    "brute_force_topk": ("xhtml_parser_spark.operators.similarity", "brute_force_topk"),
    "ann_lsh_topk": ("xhtml_parser_spark.operators.similarity", "ann_lsh_topk"),
    "ivf_topk": ("xhtml_parser_spark.operators.similarity", "ivf_topk"),
    "ivf_topk_batch": ("xhtml_parser_spark.operators.similarity", "ivf_topk_batch"),
    "embedding_neardup_pairs": (
        "xhtml_parser_spark.operators.similarity", "embedding_neardup_pairs"),
    "host_cap": ("xhtml_parser_spark.operators.corpus", "host_cap"),
    "hash_sample": ("xhtml_parser_spark.operators.corpus", "hash_sample"),
    "duplicate_ngram_stats": (
        "xhtml_parser_spark.operators.corpus", "duplicate_ngram_stats"),
    "paragraph_dedup": ("xhtml_parser_spark.operators.corpus", "paragraph_dedup"),
    "incremental_dedup": ("xhtml_parser_spark.operators.corpus", "incremental_dedup"),
    "build_bloom": ("xhtml_parser_spark.operators.corpus", "build_bloom"),
    "curation_funnel": ("xhtml_parser_spark.operators.corpus", "curation_funnel"),
    "decontaminate": ("xhtml_parser_spark.operators.corpus", "decontaminate"),
    "pack_sequences": ("xhtml_parser_spark.operators.corpus", "pack_sequences"),
    "remove_duplicate_ngrams": (
        "xhtml_parser_spark.operators.corpus", "remove_duplicate_ngrams"),
    "pii_scrub": ("xhtml_parser_spark.operators.textops", "pii_scrub"),
    "gopher_quality": ("xhtml_parser_spark.operators.textops", "gopher_quality"),
    "lm_surprisal": ("xhtml_parser_spark.operators.textops", "lm_surprisal"),
    "parse_robots": ("xhtml_parser_spark.operators.robots", "parse_robots"),
    "robots_filter": ("xhtml_parser_spark.operators.robots", "robots_filter"),
    "run_extract": ("xhtml_parser_spark.plans", "run_extract"),
    "run_curation": ("xhtml_parser_spark.plans", "run_curation"),
    "read_curated": ("xhtml_parser_spark.plans", "read_curated"),
    "funnel_signals": ("xhtml_parser_spark.operators.corpus", "funnel_signals"),
    "read_extracted": ("xhtml_parser_spark.plans.extract_job", "read_extracted"),
    "read_lineage": ("xhtml_parser_spark.plans.extract_job", "read_lineage"),
    "read_parsed": ("xhtml_parser_spark.sources.parse_datasource", "read_parsed"),
    "read_warc": ("xhtml_parser_spark.sources.warc", "read_warc"),
    "read_parsed_warc": ("xhtml_parser_spark.sources.warc", "read_parsed_warc"),
    "decode_png": ("xhtml_parser_spark.kernel.png", "decode_png"),
    "encode_png": ("xhtml_parser_spark.kernel.png", "encode_png"),
    "decode_gif": ("xhtml_parser_spark.kernel.gif", "decode_gif"),
    "encode_gif": ("xhtml_parser_spark.kernel.gif", "encode_gif"),
    "decode_jpeg": ("xhtml_parser_spark.kernel.jpeg", "decode_jpeg"),
    "encode_jpeg": ("xhtml_parser_spark.kernel.jpeg", "encode_jpeg"),
    "decode_image": ("xhtml_parser_spark.operators.multimodal", "decode_image"),
    "decode_audio": ("xhtml_parser_spark.operators.multimodal", "decode_audio"),
    "released_after": ("xhtml_parser_spark.caching", "released_after"),
    "cache_scope": ("xhtml_parser_spark.caching", "cache_scope"),
    "wat_metadata": ("xhtml_parser_spark.sources.warc", "wat_metadata"),
    "write_wat_shards": ("xhtml_parser_spark.sources.warc", "write_wat_shards"),
    "wet_export": ("xhtml_parser_spark.sources.wet_export", "wet_export"),
    "warc_export": ("xhtml_parser_spark.sources.wet_export", "warc_export"),
    "read_wet": ("xhtml_parser_spark.sources.wet_export", "read_wet"),
    "SnapshotTable": ("xhtml_parser_spark.sources.table", "SnapshotTable"),
    "synthesize_pages": ("xhtml_parser_spark.sources", "synthesize_pages"),
    "get_spark": ("xhtml_parser_spark.session", "get_spark"),
}


def __getattr__(name: str):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
