"""Legacy query-dialect parser → :mod:`seqspark.seqql.ast`.

The reference serves TWO query dialects, chosen per request by the
``use-seq-ql`` gRPC metadata key (reference `storeapi/grpc_search.go:206-216`;
the default, ``conf.UseSeqQLByDefault=false``, is THIS legacy dialect).

Grammar mirrors the reference char-level recursive descent
(`parser/query_parser.go:38-158`, `parser/token_parser.go`,
`parser/term_builder.go`):

    expr     := subexpr { ('AND'|'OR') subexpr }...   # AND binds tighter,
                                                      # both left-associative
    subexpr  := '(' expr ')' | 'NOT' subexpr | field ':' literal
    literal  := range | quoted-terms | bare-terms
    range    := ('['|'{') bound ('TO') bound (']'|'}')

Differences from seq-ql worth knowing:

- no pipes, no ``in(...)``, no bare ``*`` match-all (``field:*`` works);
- ranges use ``[a TO b]`` / ``{a TO b}`` (curly = exclusive) instead of
  ``[a, b)``;
- a text-field value is split into tokens exactly like the index-time text
  tokenizer (runs of letter/digit/``_``/``*``), each token AND-ed
  (`parser/token_parser.go:237-250`);
- escaping is graylog-flavored: ``\\`` before specials, spaces, ``-`` and
  ``/`` (`parser/token_literal.go:93-115`);
- range bounds are NOT case-folded (`parser/term_builder.go:136-162`
  singleTermBuilder keeps runes verbatim), unlike seq-ql bounds.

The reference's NOT-pushdown (`parser/query_parser.go:148-158` +
`parser/ast_node.go:39-85` propagateNot) is an engine-side optimization of
an equivalent boolean tree; here the raw tree compiles to PySpark ``~`` and
Catalyst's BooleanSimplification performs the same rewrite.
"""

from __future__ import annotations

import unicodedata
from typing import List, Optional

from .ast import (
    TOKEN_EXISTS,
    Literal,
    Node,
    Query,
    Range,
    Term,
    TermKind,
    and_node,
    build_and_tree,
    not_node,
    or_node,
)
from .parser import ParseError

#: `parser/token_literal.go:93-104`
_SPECIAL = set('(){}[]*"\\:')
#: `parser/token_literal.go:106-109` — graylog compatibility escapes
_GRAYLOG_ESCAPED = {"-", "/"}
#: `parser/token_literal.go:111-115` — escapes recognized inside quotes
_QUOTE_ESCAPED = {'"', "\\", "*"}


def _is_letter_or_number(ch: str) -> bool:
    # Go unicode.IsLetter || unicode.IsNumber (categories L*, N*)
    return unicodedata.category(ch)[0] in ("L", "N")


def _text_indexed(ch: str) -> bool:
    """Runes the text tokenizer keeps (`parser/token_parser.go:241-249`)."""
    return ch == "_" or ch == "*" or _is_letter_or_number(ch)


class _KeywordBuilder:
    """`parser/term_builder.go:96-111` — one token, wildcards inline;
    adjacent ``**`` is an error."""

    def __init__(self, field: str, case_sensitive: bool):
        self.field = field
        self.case_sensitive = case_sensitive
        self.terms: List[Term] = []
        self.buf: List[str] = []

    def _flush_text(self) -> None:
        if self.buf:
            data = "".join(self.buf)
            self.terms.append(
                Term.text(data if self.case_sensitive else data.lower())
            )
            self.buf = []

    def _ends_with_wildcard(self) -> bool:
        if not self.buf and self.terms:
            return self.terms[-1].kind is TermKind.SYMBOL
        return False

    def append_rune(self, ch: str) -> None:
        self.buf.append(ch)

    def append_wildcard(self) -> None:
        if self._ends_with_wildcard():
            raise ParseError("duplicate wildcard symbol '*'")
        self._flush_text()
        self.terms.append(Term.wildcard())

    def get_tokens(self) -> List[Node]:
        self._flush_text()
        if not self.terms:
            return []
        return [Literal(self.field, self.terms)]


class _TextBuilder:
    """`parser/term_builder.go:113-134` — non-indexed runes split tokens;
    ``**`` splits into two tokens (``a**b`` → ``a*`` AND ``*b``)."""

    def __init__(self, field: str, case_sensitive: bool):
        self.field = field
        self.case_sensitive = case_sensitive
        self.tokens: List[Node] = []
        self.terms: List[Term] = []
        self.buf: List[str] = []

    def _flush_text(self) -> None:
        if self.buf:
            data = "".join(self.buf)
            self.terms.append(
                Term.text(data if self.case_sensitive else data.lower())
            )
            self.buf = []

    def _flush_token(self) -> None:
        self._flush_text()
        if self.terms:
            self.tokens.append(Literal(self.field, self.terms))
            self.terms = []

    def _ends_with_wildcard(self) -> bool:
        if not self.buf and self.terms:
            return self.terms[-1].kind is TermKind.SYMBOL
        return False

    def append_rune(self, ch: str) -> None:
        if _text_indexed(ch):
            self.buf.append(ch)
        else:
            self._flush_token()

    def append_wildcard(self) -> None:
        if self._ends_with_wildcard():
            self._flush_token()
        self._flush_text()
        self.terms.append(Term.wildcard())

    def get_tokens(self) -> List[Node]:
        self._flush_token()
        return self.tokens


class _SingleTermBuilder:
    """`parser/term_builder.go:136-162` — range bound: a lone ``*`` XOR
    verbatim text (no case folding)."""

    def __init__(self):
        self.wildcard = False
        self.buf: List[str] = []

    def append_rune(self, ch: str) -> None:
        if self.wildcard:
            raise ParseError("only single wildcard is allowed")
        self.buf.append(ch)

    def append_wildcard(self) -> None:
        if self.wildcard or self.buf:
            raise ParseError("only single wildcard is allowed")
        self.wildcard = True

    def get_term(self) -> Term:
        if self.wildcard:
            return Term.wildcard()
        return Term.text("".join(self.buf))


class _LegacyParser:
    """Mirrors `parser/query_parser.go` queryParser + tokenParser state."""

    def __init__(self, data: str, mapping, case_sensitive: bool):
        self.data = data
        self.pos = 0
        self.mapping = mapping
        self.case_sensitive = case_sensitive

    # ------------------------------------------------------------ low level

    def eof(self) -> bool:
        return self.pos == len(self.data)

    def cur(self) -> str:
        return self.data[self.pos]

    def _err(self, msg: str) -> ParseError:
        return ParseError(f"{msg} at pos {self.pos}")

    def _err_eof(self, expected: str) -> ParseError:
        return ParseError(f"unexpected end of query, expected {expected}")

    def _err_unexpected_symbol(self, where: str) -> ParseError:
        pos = self.pos
        word = self.parse_simple_term()
        self.pos = pos
        if word:
            return ParseError(f'unexpected term "{word}" {where} at pos {pos}')
        return ParseError(
            f"unexpected symbol '{self.cur()}' {where} at pos {pos}"
        )

    def skip_spaces(self) -> None:
        while not self.eof() and self.cur().isspace():
            self.pos += 1

    def parse_simple_term(self) -> str:
        """Field names / operators (`parser/token_parser.go:74-82`)."""
        start = self.pos
        while (
            not self.eof()
            and not self.cur().isspace()
            and self.cur() not in _SPECIAL
        ):
            self.pos += 1
        finish = self.pos
        self.skip_spaces()
        return self.data[start:finish]

    # ---------------------------------------------------------------- terms

    def parse_terms(self, builder) -> None:
        """Unquoted value (`parser/token_parser.go:84-109`)."""
        while not self.eof():
            ch = self.cur()
            if ch == "*":
                builder.append_wildcard()
                self.pos += 1
                continue
            if ch == "\\":
                self.pos += 1
                if self.eof():
                    raise self._err_eof("escaped symbol")
                ch = self.cur()
                if not (
                    ch.isspace() or ch in _SPECIAL or ch in _GRAYLOG_ESCAPED
                ):
                    raise self._err_unexpected_symbol("after '\\'")
            elif ch.isspace() or ch in _SPECIAL:
                break
            builder.append_rune(ch)
            self.pos += 1
        self.skip_spaces()

    def parse_quoted_terms(self, builder) -> None:
        """Quoted value (`parser/token_parser.go:111-146`)."""
        assert self.cur() == '"'
        self.pos += 1
        while not self.eof():
            ch = self.cur()
            if ch == "\\":
                self.pos += 1
                if self.eof():
                    raise self._err_eof("escaped symbol and closing quote '\"'")
                if self.cur() not in _QUOTE_ESCAPED:
                    builder.append_rune("\\")
                builder.append_rune(self.cur())
            elif ch == "*":
                builder.append_wildcard()
            elif ch == '"':
                self.pos += 1
                self.skip_spaces()
                return
            else:
                builder.append_rune(ch)
            self.pos += 1
        raise self._err_eof("closing quote '\"'")

    # ---------------------------------------------------------------- range

    def _parse_range_term(self) -> Term:
        """`parser/token_parser.go:148-169`."""
        builder = _SingleTermBuilder()
        quoted = False
        if not self.eof() and self.cur() == '"':
            quoted = True
            self.parse_quoted_terms(builder)
        else:
            self.parse_terms(builder)
        term = builder.get_term()
        if term.kind is TermKind.TEXT and term.data == "" and not quoted:
            if self.eof():
                raise self._err_eof("range bounding term")
            raise self._err_unexpected_symbol("instead of range bounding term")
        return term

    def parse_range(self, field: str) -> Range:
        """`parser/token_parser.go:171-214`: ``[``/``{`` a TO b ``]``/``}``."""
        if self.cur() == "[":
            include_from = True
        elif self.cur() == "{":
            include_from = False
        else:
            raise self._err("range start not found")
        self.pos += 1
        self.skip_spaces()
        from_term = self._parse_range_term()
        to_pos = self.pos
        to_kw = self.parse_simple_term()
        if to_kw.lower() != "to":
            if self.eof():
                raise self._err_eof('"to" keyword')
            if to_kw == "":
                self.pos = to_pos
                raise self._err_unexpected_symbol(
                    'instead of "to" keyword in range'
                )
            raise ParseError(
                f'unexpected term "{to_kw}" instead of "to" keyword in range'
                f" at pos {to_pos}"
            )
        to_term = self._parse_range_term()
        if self.eof():
            raise self._err_eof("closing bracket (either ']' or '}') of range")
        if self.cur() == "]":
            include_to = True
        elif self.cur() == "}":
            include_to = False
        else:
            raise self._err_unexpected_symbol(
                "in place of range closing bracket (either ']' or '}')"
            )
        self.pos += 1
        self.skip_spaces()
        return Range(field, from_term, to_term, include_from, include_to)

    # -------------------------------------------------------------- literal

    def parse_literal(self, field: str, index_type: str) -> List[Node]:
        """`parser/token_parser.go:216-286`."""
        case_sensitive = self.case_sensitive
        if field == TOKEN_EXISTS:
            # the value is a field NAME — never folded
            # (`parser/token_parser.go:217-220`)
            case_sensitive = True
        if self.eof():
            raise self._err_eof("search term")
        if self.cur() in "[{":
            return [self.parse_range(field)]
        if index_type == "text":
            builder = _TextBuilder(field, case_sensitive)
        else:  # keyword / path
            builder = _KeywordBuilder(field, case_sensitive)
        pos = self.pos
        if self.cur() == '"':
            self.parse_quoted_terms(builder)
            tokens = builder.get_tokens()
            if not tokens:
                # `field:""` matches the empty token
                return [Literal(field, [Term.text("")])]
            return tokens
        self.parse_terms(builder)
        tokens = builder.get_tokens()
        if not tokens:
            if pos == self.pos:
                raise self._err_unexpected_symbol("instead of search term")
            raise ParseError(
                f'unexpected sequence "{self.data[pos:self.pos]}" instead of'
                f" token query term at pos {pos}"
            )
        return tokens

    def parse_token_query(self, field: str, index_type: str) -> List[Node]:
        """`parser/token_parser.go:288-298`."""
        if self.eof():
            raise self._err_eof("field name separator ':'")
        if self.cur() != ":":
            raise self._err_unexpected_symbol(
                f"instead of field name separator ':' after \"{field}\""
            )
        self.pos += 1
        self.skip_spaces()
        return self.parse_literal(field, index_type)

    # ----------------------------------------------------------- expression

    def parse_subexpr(self, depth: int) -> Node:
        """`parser/query_parser.go:38-81`."""
        if self.eof():
            raise self._err_eof("token expression")
        if self.cur() == "(":
            self.pos += 1
            self.skip_spaces()
            expr = self.parse_expr(depth + 1)
            if self.eof():
                raise self._err_eof("closing round bracket ')'")
            if self.cur() != ")":
                raise self._err_unexpected_symbol(
                    "in place of closing round bracket ')'"
                )
            self.pos += 1
            self.skip_spaces()
            return expr
        pos = self.pos
        field = self.parse_simple_term()
        if field.lower() == "not":
            return not_node(self.parse_subexpr(depth))
        if field == "":
            raise self._err_unexpected_symbol("in place of field name")
        # nil mapping = every field keyword (`parser/query_parser.go:21-23`)
        index_type = (
            "keyword" if self.mapping is None else self.mapping.index_type(field)
        )
        if index_type is None:
            self.pos = pos
            raise self._err(f'unindexed field "{field}"')
        tokens = self.parse_token_query(field, index_type)
        return build_and_tree(tokens)

    def parse_expr(self, depth: int) -> Node:
        """Simplified-Dijkstra precedence: AND > OR, both left-associative
        (`parser/query_parser.go:83-135`)."""
        left_high = self.parse_subexpr(depth)
        left_low: Optional[Node] = None
        while True:
            pos = self.pos
            operator = self.parse_simple_term()
            op = operator.lower()
            if op == "and":
                kind = "and"
            elif op == "or":
                kind = "or"
            elif op == "":
                if self.eof() or (self.cur() == ")" and depth > 0):
                    if left_low is not None:
                        return or_node(left_low, left_high)
                    return left_high
                raise self._err_unexpected_symbol(
                    'instead of operator (only "and", "or" and "not" are'
                    " supported)"
                )
            else:
                raise ParseError(
                    f'unexpected operator "{operator}" (only "and"/"or" are'
                    f" supported here) at pos {pos}"
                )
            right = self.parse_subexpr(depth)
            if kind == "and":
                # leftLow OR leftHigh AND right = leftLow OR (leftHigh AND r)
                left_high = and_node(left_high, right)
            else:
                if left_low is None:
                    left_low = left_high
                else:
                    left_low = or_node(left_low, left_high)
                left_high = right


def parse_legacy(q: str, mapping, case_sensitive: bool = False) -> Query:
    """Parse a legacy-dialect query (reference `parser/query_parser.go:148`
    ParseQuery). The legacy dialect has no pipes."""
    p = _LegacyParser(q, mapping, case_sensitive)
    p.skip_spaces()
    root = p.parse_expr(0)
    if not p.eof():  # defensive; parse_expr only returns at eof/')'-top
        raise ParseError(f"unexpected trailing input at pos {p.pos}")
    return Query(root, [])


def _dump_term(t: Term) -> str:
    """Reference `parser/token_literal.go:61-79` Term.Dump: ``*`` for the
    wildcard symbol, ``\"\"`` for the empty token, backslash before
    specials and whitespace."""
    if t.kind is TermKind.SYMBOL:
        return "*"
    if t.data == "":
        return '""'
    out = []
    for ch in t.data:
        if ch in _SPECIAL or ch.isspace():
            out.append("\\")
        out.append(ch)
    return "".join(out)


def dump(node: Node) -> str:
    """Golden-string form matching the reference's test Dump
    (`parser/ast_node.go:88-125`, `parser/token_literal.go:16-22,61-79`,
    `parser/token_range.go:16-32`) so parity tests can assert the exact
    strings of `parser/ast_test.go` / `parser/process_test.go`."""
    from .ast import Logical, LogicalOp

    if isinstance(node, Literal):
        # the reference's legacy Literal.Dump writes the field RAW
        # (`parser/token_literal.go:15-21`) — only Range quotes it
        return node.field + ":" + "".join(_dump_term(t) for t in node.terms)
    if isinstance(node, Range):
        from .render import quote_token_if_needed

        return (
            quote_token_if_needed(node.field)
            + ":"
            + ("[" if node.include_from else "{")
            + _dump_term(node.from_term)
            + " TO "
            + _dump_term(node.to_term)
            + ("]" if node.include_to else "}")
        )
    if isinstance(node, Logical):
        if node.op is LogicalOp.NOT:
            return f"(NOT {dump(node.children[0])})"
        sep = " OR " if node.op is LogicalOp.OR else " AND "
        return f"({dump(node.children[0])}{sep}{dump(node.children[1])})"
    raise ValueError(f"unknown node {node!r}")


def propagate_not(node: Node) -> tuple:
    """Reference `parser/ast_node.go:39-85` propagateNot: push NOT down to
    NAND positions. Returns ``(node, pending_not)``; NAND is encoded in
    this AST as ``AND(NOT(x), y)`` — after propagation, NOT appears ONLY
    in that position (or wrapping the root), which is exactly what the
    reference's NAnd operator expresses. The engine itself doesn't need
    this (Catalyst's BooleanSimplification does the same rewrite); it
    exists for golden parse-tree parity with `parser/process_test.go`."""
    from .ast import Logical, LogicalOp

    if not isinstance(node, Logical):
        return node, False
    if node.op is LogicalOp.NOT:
        nested, flag = propagate_not(node.children[0])
        return nested, not flag
    left, left_not = propagate_not(node.children[0])
    right, right_not = propagate_not(node.children[1])
    out_not = False
    if node.op is LogicalOp.OR:
        if left_not or right_not:
            # De Morgan: (±a OR ±b) == NOT (∓a AND ∓b)
            out_not = True
            left_not, right_not = not left_not, not right_not
        else:
            return Logical(LogicalOp.OR, [left, right]), False
    if left_not and right_not:
        # De Morgan: (NOT a AND NOT b) == NOT (a OR b)
        return Logical(LogicalOp.OR, [left, right]), True
    if left_not:
        return Logical(LogicalOp.AND, [not_node(left), right]), out_not
    if right_not:
        # reference swaps children so the negated side leads (`sic!`)
        return Logical(LogicalOp.AND, [not_node(right), left]), out_not
    return Logical(LogicalOp.AND, [left, right]), out_not


def normalize_not(root: Node) -> Node:
    """`parser/query_parser.go:148-158` ParseQuery tail: propagate NOT and
    wrap the root when a negation remains pending."""
    node, flag = propagate_not(root)
    return not_node(node) if flag else node


def dump_normalized(node: Node) -> str:
    """Reference `ASTNode.String()` on post-`propagate_not` trees: an AND
    whose left child is NOT is the NAnd encoding and renders as
    ``(NOT x AND y)`` — matching `parser/process_test.go` expectations."""
    from .ast import Logical, LogicalOp

    if isinstance(node, Logical) and node.op is LogicalOp.AND:
        left, right = node.children
        if isinstance(left, Logical) and left.op is LogicalOp.NOT:
            return (
                f"(NOT {dump_normalized(left.children[0])}"
                f" AND {dump_normalized(right)})"
            )
        return f"({dump_normalized(left)} AND {dump_normalized(right)})"
    if isinstance(node, Logical):
        if node.op is LogicalOp.NOT:
            return f"(NOT {dump_normalized(node.children[0])})"
        return (
            f"({dump_normalized(node.children[0])}"
            f" OR {dump_normalized(node.children[1])})"
        )
    return dump(node)
