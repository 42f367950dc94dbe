"""seq-ql recursive-descent parser → :mod:`seqspark.seqql.ast`.

Grammar mirrors the reference (`parser/seqql.go:300-389`,
`parser/seqql_filter.go`, `parser/token_range.go:53-106`,
`parser/seqql_pipes.go`):

    query     := filter ( '|' pipe )*
    filter    := subexpr (('and'|'or') subexpr)*      # and binds tighter
    subexpr   := '*' | '(' filter ')' | 'not' subexpr | field_filter
    field_filter := field ':' ( range | 'in' '(' value (',' value)* ')' | value )
    range     := ('['|'(') term (','|'to') term (']'|')')

Field index types come from a :class:`seqspark.mapping.Mapping`; querying an
unmapped field is a parse error (reference `parser/seqql_filter.go:24-27`).
"""

from __future__ import annotations

import unicodedata
from typing import List, Optional

from .ast import (
    TOKEN_ALL,
    TOKEN_EXISTS,
    WILDCARD,
    Literal,
    Logical,
    LogicalOp,
    Node,
    PipeFields,
    Query,
    Range,
    Term,
    and_node,
    build_and_tree,
    not_node,
    or_node,
)
from .lexer import Lexer, is_token_rune


class ParseError(ValueError):
    pass


def _is_letter_or_number(ch: str) -> bool:
    # Mirrors Go unicode.IsLetter || unicode.IsNumber (categories L*, N*).
    return unicodedata.category(ch)[0] in ("L", "N")


def parse_seqql_keyword(token: str, case_sensitive: bool) -> List[Term]:
    """Split a composite value into text/wildcard terms for keyword/path
    fields (reference `parser/seqql_filter.go:parseSeqQLKeyword`)."""
    if token == "":
        return [Term.text("")]
    terms: List[Term] = []
    buf: List[str] = []
    for ch in token:
        if ch == WILDCARD:
            if buf:
                data = "".join(buf)
                terms.append(Term.text(data if case_sensitive else data.lower()))
                buf = []
            terms.append(Term.wildcard())
        else:
            buf.append(ch)
    if buf:
        data = "".join(buf)
        terms.append(Term.text(data if case_sensitive else data.lower()))
    return terms


def parse_seqql_text(field: str, token: str, case_sensitive: bool) -> List[Node]:
    """Tokenize a text-field query value the same way the text tokenizer
    indexes documents — runs of letter/digit/``_``/``*`` — each run becoming
    one Literal; wildcards stay wildcards
    (reference `parser/seqql_filter.go:parseSeqQLText`)."""
    if token == "":
        return [Literal(field, [Term.text("")])]
    tokens: List[Node] = []
    cur_terms: List[Term] = []
    buf: List[str] = []

    def flush_term() -> None:
        nonlocal buf
        if buf:
            data = "".join(buf)
            cur_terms.append(Term.text(data if case_sensitive else data.lower()))
            buf = []

    def flush_literal() -> None:
        nonlocal cur_terms
        flush_term()
        if cur_terms:
            tokens.append(Literal(field, cur_terms))
            cur_terms = []

    for ch in token:
        if ch == "_" or ch == "*" or _is_letter_or_number(ch):
            buf.append(ch)
        elif ch == WILDCARD:
            flush_term()
            cur_terms.append(Term.wildcard())
        else:
            flush_literal()
    flush_literal()
    if not tokens:
        tokens.append(Literal(field, [Term.text("")]))
    return tokens


def _is_composite_token(lex: Lexer) -> bool:
    """Reference `parser/seqql_filter.go:isCompositeToken`."""
    if lex.is_keyword(""):
        return False
    if lex.token == "":
        return True
    first = lex.token[0]
    if len(lex.token) > 1 or lex.token_quoted:
        return True
    return is_token_rune(first) or first in ("-", "*", WILDCARD)


def parse_composite_token(lex: Lexer) -> str:
    """Join adjacent (no-space) tokens into one composite value
    (reference `parser/seqql_filter.go:parseCompositeToken`)."""
    if lex.is_keyword(""):
        raise ParseError("unexpected end of query")
    if not _is_composite_token(lex):
        raise ParseError(f"unexpected symbol {lex.token!r}")
    parts = [lex.token]
    lex.next()
    while not lex.space_skipped and _is_composite_token(lex):
        parts.append(lex.token)
        lex.next()
    return "".join(parts)


def parse_composite_token_replace_wildcards(lex: Lexer) -> str:
    return parse_composite_token(lex).replace(WILDCARD, "*")


def _parse_range_term(lex: Lexer, case_sensitive: bool) -> Term:
    value = parse_composite_token(lex)
    terms = parse_seqql_keyword(value, case_sensitive)
    if len(terms) == 1:
        return terms[0]
    if len(terms) == 0:
        return Term.text("")
    raise ParseError("only single wildcard is allowed in range bound")


def _parse_token_range(field: str, lex: Lexer, case_sensitive: bool) -> Range:
    """Reference `parser/token_range.go:53-86`."""
    if not lex.is_keywords("(", "["):
        raise ParseError("range start not found")
    include_from = lex.token == "["
    lex.next()
    from_term = _parse_range_term(lex, case_sensitive)
    if not lex.is_keywords(",", "to"):
        raise ParseError(f"expected ',' in range, got {lex.token!r}")
    lex.next()
    to_term = _parse_range_term(lex, case_sensitive)
    if not lex.is_keywords(")", "]"):
        raise ParseError("range end not found")
    include_to = lex.token == "]"
    lex.next()
    return Range(field, from_term, to_term, include_from, include_to)


def _parse_fulltext_filter(
    lex: Lexer, field: str, index_type: str, case_sensitive: bool
) -> Node:
    value = parse_composite_token(lex)
    if index_type in ("keyword", "path"):
        return Literal(field, parse_seqql_keyword(value, case_sensitive))
    if index_type == "text":
        return build_and_tree(parse_seqql_text(field, value, case_sensitive))
    raise ParseError(f"unexpected index type {index_type!r}")


def _parse_filter_in(
    lex: Lexer, field: str, index_type: str, case_sensitive: bool
) -> Node:
    """Reference `parser/seqql_filter.go:parseFilterIn` — OR of literals."""
    if not lex.is_keyword("("):
        raise ParseError(f"expect '(' after in, got {lex.token!r}")
    lex.next()
    if lex.is_keyword(")"):
        raise ParseError("empty 'in' filter")
    root = _parse_fulltext_filter(lex, field, index_type, case_sensitive)
    while lex.is_keyword(","):
        lex.next()
        root = or_node(root, _parse_fulltext_filter(lex, field, index_type, case_sensitive))
    if not lex.is_keyword(")"):
        raise ParseError(f"expect ')' closing in(), got {lex.token!r}")
    lex.next()
    return root


def _parse_field_filter(lex: Lexer, mapping, case_sensitive: bool) -> Node:
    field = parse_composite_token_replace_wildcards(lex)
    if field == "":
        raise ParseError("empty field name")
    index_type = mapping.index_type(field)
    if index_type is None:
        raise ParseError(f"field {field!r} is not indexed")
    if not lex.is_keyword(":"):
        raise ParseError(f"missing ':' after {field!r}")
    lex.next()
    if lex.is_keyword(""):
        raise ParseError(f"missing filter value for field {field!r}")
    sensitive = case_sensitive or field == TOKEN_EXISTS
    if lex.is_keywords("[", "("):
        return _parse_token_range(field, lex, sensitive)
    if lex.is_keyword("in"):
        lex.next()
        return _parse_filter_in(lex, field, index_type, sensitive)
    return _parse_fulltext_filter(lex, field, index_type, sensitive)


def _parse_subexpr(lex: Lexer, mapping, depth: int, case_sensitive: bool) -> Node:
    if lex.is_end():
        raise ParseError("unexpected end of query")
    if lex.is_keyword(WILDCARD) and depth == 0:
        lex.next()
        return Literal(TOKEN_ALL, [Term.wildcard()])
    if lex.is_keyword("("):
        lex.next()
        expr = _parse_filter(lex, mapping, depth + 1, case_sensitive)
        if not lex.is_keyword(")"):
            raise ParseError("missing ')'")
        lex.next()
        return expr
    if lex.is_keyword("not"):
        lex.next()
        return not_node(_parse_subexpr(lex, mapping, depth, case_sensitive))
    return _parse_field_filter(lex, mapping, case_sensitive)


def _parse_filter(lex: Lexer, mapping, depth: int, case_sensitive: bool) -> Node:
    """'and' binds tighter than 'or' (reference `parser/seqql.go:300-344`)."""
    res: Optional[Node] = None
    cur = _parse_subexpr(lex, mapping, depth, case_sensitive)
    while True:
        if lex.is_keyword("and"):
            lex.next()
            nxt = _parse_subexpr(lex, mapping, depth, case_sensitive)
            cur = and_node(cur, nxt)
            continue
        if lex.is_keyword("or"):
            lex.next()
            nxt = _parse_subexpr(lex, mapping, depth, case_sensitive)
            res = cur if res is None else or_node(res, cur)
            cur = nxt
            continue
        if lex.is_end() or (lex.is_keyword(")") and depth > 0) or lex.is_keyword("|"):
            return cur if res is None else or_node(res, cur)
        raise ParseError(f"expected 'and', 'or', 'not', got {lex.token!r}")


def _parse_field_list(lex: Lexer) -> List[str]:
    fields: List[str] = []
    trailing_comma = False
    while not (lex.is_keyword("|") or lex.is_keyword("")):
        trailing_comma = False
        fields.append(parse_composite_token_replace_wildcards(lex))
        if lex.is_keyword(","):
            lex.next()
            trailing_comma = True
    if trailing_comma:
        raise ParseError("trailing comma not allowed")
    if not fields:
        raise ParseError("empty field list")
    return fields


def _parse_pipes(lex: Lexer) -> List[PipeFields]:
    """Only the 'fields' pipe exists; max one (reference
    `parser/seqql_pipes.go:14-41`)."""
    pipes: List[PipeFields] = []
    while not lex.is_end():
        if not lex.is_keyword("|"):
            raise ParseError(f"expect pipe separator '|', got {lex.token!r}")
        lex.next()
        if not lex.is_keyword("fields"):
            raise ParseError(f"unknown pipe: {lex.token!r}")
        lex.next()
        except_ = False
        if lex.is_keyword("except"):
            except_ = True
            lex.next()
        pipes.append(PipeFields(_parse_field_list(lex), except_))
        if len(pipes) > 1:
            raise ParseError("multiple field filters is not allowed")
    return pipes


def parse(q: str, mapping, case_sensitive: bool = False) -> Query:
    """Parse a seq-ql query string (reference `parser/seqql.go:28-58`).

    NOT-pushdown (`parser/ast_node.go:39-85` propagateNot) is intentionally
    omitted: the AST compiles to PySpark boolean expressions and Catalyst's
    ``BooleanSimplification`` performs the equivalent rewrite.
    """
    lex = Lexer(q)
    root = _parse_filter(lex, mapping, 0, case_sensitive)
    pipes: List[PipeFields] = []
    if lex.is_keyword("|"):
        pipes = _parse_pipes(lex)
    if not lex.is_end():
        raise ParseError(f"unexpected trailing input: {lex.token!r}")
    return Query(root, pipes)
