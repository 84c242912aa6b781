from .escaping import esc, wrap_simple_doc

__all__ = ["esc", "wrap_simple_doc"]
