from .synth import gen_page, synthesize_pages, PAGES_SCHEMA

__all__ = ["gen_page", "synthesize_pages", "PAGES_SCHEMA"]
