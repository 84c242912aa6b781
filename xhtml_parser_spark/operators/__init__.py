from .parse import parse_pages, parse_nodes, parse_attrs, parse_full, PARSED_SCHEMA
from .links import extract_links, host_link_graph, pagerank

__all__ = [
    "parse_pages",
    "parse_nodes",
    "parse_attrs",
    "parse_full",
    "PARSED_SCHEMA",
    "extract_links",
    "host_link_graph",
    "pagerank",
]
