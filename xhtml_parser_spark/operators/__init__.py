from .parse import parse_pages, parse_nodes, parse_attrs, parse_full, PARSED_SCHEMA

__all__ = ["parse_pages", "parse_nodes", "parse_attrs", "parse_full", "PARSED_SCHEMA"]
