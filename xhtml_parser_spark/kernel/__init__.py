from .parser import ELEMENT, HEAD, TEXT, ParsedDoc, parse_document
from .document import Node, Attribute, all_nodes, debug_format, last_descendant, root

__all__ = [
    "ELEMENT",
    "HEAD",
    "TEXT",
    "ParsedDoc",
    "parse_document",
    "Node",
    "Attribute",
    "all_nodes",
    "debug_format",
    "last_descendant",
    "root",
]
