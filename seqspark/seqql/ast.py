"""AST for seq-ql queries.

Semantics mirror the reference grammar (ozontech/seq-db):
- terms/literals/ranges: reference `parser/ast.go`, `parser/token_range.go:8-14`
- logical nodes and NOT propagation: reference `parser/ast_node.go:39-85`
- pipes: reference `parser/seqql_pipes.go:43-111`

This is a fresh Python implementation of the *grammar*, not a port of the
reference execution engine; the AST compiles to PySpark ``Column`` expressions
in :mod:`seqspark.compile`.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from enum import Enum
from typing import List, Optional, Union

#: Sentinel for the wildcard symbol, distinguished from a literal ``*``
#: character (reference `parser/seqql.go:61-63` uses U+E000 the same way).
WILDCARD = "\ue000"

#: Builtin field matched by every document (reference `seq/seq.go` TokenAll,
#: `proxy/bulk/indexer.go:339-343`).
TOKEN_ALL = "_all_"

#: Builtin field for existence checks (reference `seq/seq.go` TokenExists).
TOKEN_EXISTS = "_exists_"


class TermKind(Enum):
    TEXT = "text"
    SYMBOL = "symbol"  # the wildcard '*'


@dataclass(frozen=True)
class Term:
    kind: TermKind
    data: str

    @staticmethod
    def text(data: str) -> "Term":
        return Term(TermKind.TEXT, data)

    @staticmethod
    def wildcard() -> "Term":
        return Term(TermKind.SYMBOL, "*")

    @property
    def is_wildcard(self) -> bool:
        return self.kind is TermKind.SYMBOL


@dataclass
class Literal:
    """``field:value`` — value is a sequence of text terms and wildcards.

    A literal with terms ``[text("acc"), wildcard, text("s")]`` is the
    pattern ``acc*s`` matched against individual index tokens
    (reference `pattern/pattern.go:73-155`).
    """

    field: str
    terms: List[Term]

    @property
    def is_match_all(self) -> bool:
        return len(self.terms) == 1 and self.terms[0].is_wildcard

    @property
    def single_text(self) -> Optional[str]:
        if len(self.terms) == 1 and not self.terms[0].is_wildcard:
            return self.terms[0].data
        return None


@dataclass
class Range:
    """``field:[a, b)`` — bounds are single terms or ``*`` (unbounded).

    Numeric-vs-lexicographic dispatch happens at compile time, mirroring
    reference `pattern/pattern.go:264-289` (try number search, else text).
    """

    field: str
    from_term: Term
    to_term: Term
    include_from: bool
    include_to: bool


class LogicalOp(Enum):
    AND = "and"
    OR = "or"
    NOT = "not"


@dataclass
class Logical:
    op: LogicalOp
    children: List["Node"]


Node = Union[Literal, Range, Logical]


def and_node(left: Node, right: Node) -> Node:
    return Logical(LogicalOp.AND, [left, right])


def or_node(left: Node, right: Node) -> Node:
    return Logical(LogicalOp.OR, [left, right])


def not_node(child: Node) -> Node:
    return Logical(LogicalOp.NOT, [child])


def build_and_tree(tokens: List[Node]) -> Node:
    """AND-chain of token literals (reference `parser/ast_node.go:31-37`)."""
    tree = tokens[0]
    for t in tokens[1:]:
        tree = and_node(tree, t)
    return tree


@dataclass
class PipeFields:
    """``| fields a, b`` / ``| fields except a, b``

    (reference `parser/seqql_pipes.go:43-111`; max one per query).
    """

    fields: List[str]
    except_: bool = False


@dataclass
class Query:
    root: Node
    pipes: List[PipeFields] = dc_field(default_factory=list)
