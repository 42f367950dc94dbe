from .ast import Literal, Logical, LogicalOp, Node, PipeFields, Query, Range, Term
from .parser import ParseError, parse

__all__ = [
    "Literal",
    "Logical",
    "LogicalOp",
    "Node",
    "PipeFields",
    "Query",
    "Range",
    "Term",
    "ParseError",
    "parse",
]
