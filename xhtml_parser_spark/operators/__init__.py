from .parse import parse_pages, parse_nodes, parse_attrs, parse_full, PARSED_SCHEMA
from .frontier import crawl_delta, fetch_schedule
from .links import anchor_text_index, extract_links, host_link_graph, pagerank
from .corpus import (
    host_cap,
    hash_sample,
    mixture_sample,
    duplicate_ngram_stats,
    incremental_dedup,
    build_bloom,
    curation_funnel,
    funnel_signals,
    paragraph_dedup,
    decontaminate,
    pack_sequences,
    remove_duplicate_ngrams,
)
from .textops import pii_scrub, gopher_quality, lm_surprisal
from .metadata import page_metadata, web_record
from .robots import parse_robots, robots_filter
from .sitemap import parse_sitemaps
from .charset import sniff_charset_pages, transcode_utf8
from .tables import html_tables

__all__ = [
    "parse_pages",
    "parse_nodes",
    "parse_attrs",
    "parse_full",
    "PARSED_SCHEMA",
    "anchor_text_index",
    "crawl_delta",
    "extract_links",
    "fetch_schedule",
    "host_link_graph",
    "pagerank",
    "host_cap",
    "hash_sample",
    "mixture_sample",
    "duplicate_ngram_stats",
    "incremental_dedup",
    "build_bloom",
    "curation_funnel",
    "funnel_signals",
    "paragraph_dedup",
    "decontaminate",
    "pack_sequences",
    "remove_duplicate_ngrams",
    "pii_scrub",
    "gopher_quality",
    "lm_surprisal",
    "page_metadata",
    "parse_sitemaps",
    "parse_robots",
    "robots_filter",
    "sniff_charset_pages",
    "transcode_utf8",
    "web_record",
]
