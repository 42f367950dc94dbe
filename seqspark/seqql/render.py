"""Canonical seq-ql rendering of a parsed :class:`~seqspark.seqql.ast.Query`.

Mirrors the reference's ``SeqQLString()`` (`parser/seqql.go:18-26`,
`parser/ast_node.go:126-160` DumpSeqQL, `parser/token_literal.go:24-34,85-95`,
`parser/token_range.go:34-56`, `parser/seqql_pipes.go:52-121`): the string a
seq-db server would echo back for an equivalent query, used by the golden
parity tests against `parser/seqql_filter_test.go` and as a debugging
canonical form. The reference normalizes the tree with propagateNot before
rendering; :func:`seqql_string` does the same via
:func:`seqspark.seqql.legacy.normalize_not`.
"""

from __future__ import annotations

import unicodedata

from .ast import (
    TOKEN_ALL,
    Literal,
    Logical,
    LogicalOp,
    Node,
    PipeFields,
    Query,
    Range,
    Term,
    TermKind,
)
from .lexer import is_token_rune

#: `parser/seqql_pipes.go:127-152` reservedKeywords
_RESERVED = {
    "", "(", ")", "[", "]", ",", "or", "and", "not", "*", ":", "|",
    "fields", "except",
}


def _go_is_print(ch: str) -> bool:
    """Go ``unicode.IsPrint``: letters, marks, numbers, punctuation,
    symbols, and the ASCII space."""
    if ch == " ":
        return True
    return unicodedata.category(ch)[0] in ("L", "M", "N", "P", "S")


def go_quote(s: str) -> str:
    """Go ``strconv.Quote`` followed by the reference's ``*`` → ``\\*``
    rewrite (`parser/seqql_pipes.go:120-126`)."""
    out = ['"']
    for ch in s:
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif ch == "\a":
            out.append("\\a")
        elif ch == "\b":
            out.append("\\b")
        elif ch == "\f":
            out.append("\\f")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        elif ch == "\v":
            out.append("\\v")
        elif _go_is_print(ch):
            out.append(ch)
        else:
            cp = ord(ch)
            if cp < 0x80:
                out.append(f"\\x{cp:02x}")
            elif cp < 0x10000:
                out.append(f"\\u{cp:04x}")
            else:
                out.append(f"\\U{cp:08x}")
    out.append('"')
    return "".join(out).replace("*", "\\*")


def _needs_quote(token: str) -> bool:
    """`parser/seqql_pipes.go:154-165` needQuoteToken."""
    if token.lower() in _RESERVED:
        return True
    return any(not (is_token_rune(ch) or ch == "-") for ch in token)


def quote_token_if_needed(token: str) -> str:
    return go_quote(token) if _needs_quote(token) else token


def _dump_term(t: Term) -> str:
    if t.kind is TermKind.SYMBOL:
        return "*"
    return quote_token_if_needed(t.data)


def dump_seqql(node: Node) -> str:
    """DumpSeqQL over a post-`normalize_not` tree: an AND whose left child
    is NOT is the NAnd encoding and renders ``(not x and y)``
    (`parser/ast_node.go:126-160`)."""
    if isinstance(node, Literal):
        if (
            node.field == TOKEN_ALL
            and len(node.terms) == 1
            and node.terms[0].is_wildcard
        ):
            return "*"
        return (
            quote_token_if_needed(node.field)
            + ":"
            + "".join(_dump_term(t) for t in node.terms)
        )
    if isinstance(node, Range):
        return (
            quote_token_if_needed(node.field)
            + ":"
            + ("[" if node.include_from else "(")
            + _dump_term(node.from_term)
            + ", "
            + _dump_term(node.to_term)
            + ("]" if node.include_to else ")")
        )
    if isinstance(node, Logical):
        if node.op is LogicalOp.NOT:
            return f"(not {dump_seqql(node.children[0])})"
        left, right = node.children
        if node.op is LogicalOp.AND and isinstance(left, Logical) and left.op is LogicalOp.NOT:
            return f"(not {dump_seqql(left.children[0])} and {dump_seqql(right)})"
        sep = " or " if node.op is LogicalOp.OR else " and "
        return f"({dump_seqql(left)}{sep}{dump_seqql(right)})"
    raise ValueError(f"unknown node {node!r}")


def _dump_pipe(p: PipeFields) -> str:
    head = "fields except " if p.except_ else "fields "
    return head + ", ".join(quote_token_if_needed(f) for f in p.fields)


def seqql_string(query: Query) -> str:
    """The reference's ``SeqQLString()``: propagate NOT, dump the tree,
    append pipes."""
    from .legacy import normalize_not

    out = dump_seqql(normalize_not(query.root))
    for p in query.pipes:
        out += " | " + _dump_pipe(p)
    return out
