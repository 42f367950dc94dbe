"""Compile a seq-ql AST into a PySpark ``Column`` predicate.

A document matches a field filter when ANY of the field's index tokens
satisfies the token-level check — the DataFrame equivalent of walking a
posting list (reference `pattern/pattern.go:295-309` Search):

- literal:  token == value                    (`pattern/pattern.go:34-71`)
- wildcard: glob over the token              (`pattern/pattern.go:73-155`)
- range:    numeric when both bounds parse as finite floats (tokens that
            don't parse never match), else lexicographic byte compare
            (`pattern/pattern.go:157-262`, dispatch `:264-289`)

Everything compiles to built-in ``pyspark.sql.functions`` so the predicates
stay inside whole-stage codegen and push down to Parquet scans where the
resolver exposes a scalar column — no Python UDFs anywhere on the hot path.

Boolean structure maps 1:1 onto Column ``& | ~``; the reference's NOT
pushdown (`parser/ast_node.go:39-85`) is left to Catalyst's
BooleanSimplification.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, Dict, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from .seqql.ast import (
    TOKEN_ALL,
    TOKEN_EXISTS,
    Literal,
    Logical,
    LogicalOp,
    Node,
    Range,
    Term,
    TermKind,
)

#: Go strconv.ParseFloat decimal syntax; the reference additionally
#: rejects NaN/Inf results (`pattern/pattern.go:294-296` isNaNOrInf).
#: ASCII digits ONLY — Python's ``\d`` also matches unicode digits
#: (e.g. arabic-indic ``٤``), which Go rejects, and a bound like ``٤٢``
#: must dispatch the range LEXICOGRAPHIC exactly like the reference
#: (caught by the r12 differential fuzz). Documented delta vs real Go:
#: ParseFloat also accepts Go-literal underscores (``1_0``) and hex
#: floats (``0x1Ap0``); both are rejected here and by the token guard
#: below — the stricter decimal-only model, applied consistently to
#: bounds and tokens.
_GO_FLOAT_SYNTAX = r"[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?"
_GO_FLOAT_RE = re.compile(r"^" + _GO_FLOAT_SYNTAX + r"$")

#: Java-regex form for guarding TOKENS on the numeric-range path:
#: ``try_cast(double)`` alone is LOOSER than Go ParseFloat (it trims
#: whitespace, so token ``' 5'`` would match a numeric range the
#: reference rejects). ``\A``/``\z`` anchors, not ``^``/``$`` — Java's
#: ``$`` matches before a final newline, and keyword tokens can contain
#: one.
_GO_FLOAT_JAVA_RE = r"\A" + _GO_FLOAT_SYNTAX + r"\z"


def parses_as_number(s: str) -> Optional[float]:
    if not _GO_FLOAT_RE.match(s):
        return None
    try:
        v = float(s)
    except ValueError:
        return None
    if v != v or v in (float("inf"), float("-inf")):
        return None
    return v


class CompileError(ValueError):
    pass


@dataclass
class FieldSpec:
    """How one queryable field is physically stored.

    ``tokens``  — Column of ``array<string>`` folded index tokens (null when
                  the field is absent from the document).
    ``scalar``  — optional fast path: when the field always has exactly one
                  token, the folded token itself as a string Column; lets
                  equality/range compile to directly pushable comparisons.
    ``exists``  — boolean Column: the field is present (``_exists_:f``).
    ``numeric`` — optional native-numeric fast path: when the underlying
                  Spark column is already numeric, the RAW column; numeric
                  ranges then compile to bare comparisons that reach
                  Parquet ``PushedFilters`` and prune row groups — at
                  100 TB the difference between skipping and decoding the
                  column. Results are identical: a numeric token always
                  parses back to the same double.
    ``numeric_is_float`` — the native column is float/double, so NaN/±Inf
                  values exist and must be rejected like the reference
                  rejects NaN/Inf tokens (`pattern/pattern.go:294-296`).
    ``guard``   — optional boolean Column ANDed into scalar-path wildcard /
                  range checks: true iff the value was actually indexed
                  (e.g. within ``--max-token-size``). Equality does NOT
                  need it — see ``max_token_bytes``.
    ``max_token_bytes`` — the ``--max-token-size`` byte cap the field was
                  indexed under (`consts` MaxTokenSize, default 72). An
                  equality literal LONGER than the cap can never match an
                  indexed token, so it compiles to FALSE; a literal within
                  the cap can only equal a value that is itself within the
                  cap, so the bare pushable ``col = 'v'`` stays correct
                  without the guard.
    """

    tokens: Callable[[], Column]
    scalar: Optional[Callable[[], Column]] = None
    exists: Optional[Callable[[], Column]] = None
    numeric: Optional[Callable[[], Column]] = None
    numeric_is_float: bool = False
    guard: Optional[Callable[[], Column]] = None
    max_token_bytes: Optional[int] = None
    #: the UNGUARDED folded column (no byte-cap CASE). When set together
    #: with ``guard``, filters compile to ``guard AND <bare check>`` so
    #: the comparison pushes into the scan; ``scalar`` (guard-nulled)
    #: remains the aggregation-path accessor, where the NULL is the
    #: `_not_exists` bucket signal, not a filter.
    scalar_raw: Optional[Callable[[], Column]] = None
    #: equality compiler for natively-typed columns: given the query
    #: literal, return a bare comparison on the RAW column (pushable;
    #: engages the store's id blooms) or None to fall back to the string
    #: path. Must preserve string-token semantics exactly — e.g. integral
    #: columns match only the canonical decimal rendering, so a
    #: non-canonical literal ('042') compiles to lit(False), same verdict
    #: the string comparison would reach row by row.
    eq_native: Optional[Callable[[str], Optional[Column]]] = None

    def exists_col(self) -> Column:
        if self.exists is not None:
            return self.exists()
        return self.tokens().isNotNull()


class Resolver:
    """Resolves a queried field name to a :class:`FieldSpec`."""

    def __init__(self, specs: Dict[str, FieldSpec]):
        self._specs = specs

    def resolve(self, field: str) -> FieldSpec:
        try:
            return self._specs[field]
        except KeyError:
            raise CompileError(f"field {field!r} is not indexed") from None

    def fields(self) -> Dict[str, FieldSpec]:
        return dict(self._specs)


def wildcard_like(terms) -> str:
    """SQL LIKE pattern equivalent to the reference wildcard matcher
    (`pattern/pattern.go:73-155`): text terms in order, ``*`` = any run
    (``%``); LIKE metacharacters in literal terms escaped with ``\\``.

    LIKE over an anchored regex for two reasons, both measured on plans:

    - Catalyst's LikeSimplification rewrites prefix/suffix/contains
      shapes into StartsWith/EndsWith/Contains, and a StartsWith on a
      scan column reaches the parquet scan as a pushed
      ``StringStartsWith`` — ``rlike`` never simplifies or pushes;
    - LIKE ``%`` crosses newlines, exactly like the reference matcher's
      any-byte-run ``*``; Java-regex ``.*`` (no DOTALL) silently does
      not."""
    parts = []
    for t in terms:
        if t.kind is TermKind.SYMBOL:
            parts.append("%")
        else:
            parts.append(
                t.data.replace("\\", "\\\\")
                .replace("%", "\\%")
                .replace("_", "\\_")
            )
    return "".join(parts)


def _token_check_literal(lit: Literal) -> Callable[[Column], Column]:
    single = lit.single_text
    if single is not None:
        return lambda tok: tok == F.lit(single)
    if lit.is_match_all:
        # bare '*' matches every token, including the empty one
        return lambda tok: tok.isNotNull()
    pat = wildcard_like(lit.terms)
    return lambda tok: tok.like(pat)


def range_bounds(rng: Range) -> tuple[bool, Optional[float], Optional[float]]:
    """(is_numeric, from, to): a range is numeric when every non-``*`` bound
    parses as a finite Go float (`pattern/pattern.go:264-289` dispatch)."""
    from_num = to_num = None
    if not rng.from_term.is_wildcard:
        from_num = parses_as_number(rng.from_term.data)
    if not rng.to_term.is_wildcard:
        to_num = parses_as_number(rng.to_term.data)
    numeric = (rng.from_term.is_wildcard or from_num is not None) and (
        rng.to_term.is_wildcard or to_num is not None
    )
    return numeric, from_num, to_num


def range_on_native_numeric(rng: Range, col: Column, is_float: bool) -> Column:
    """Numeric range directly on a native numeric column — same result as
    the cast-token path (a numeric value's token round-trips through
    ParseFloat to itself) but the comparisons reach Parquet
    ``PushedFilters``/row-group min-max skipping."""
    _, from_num, to_num = range_bounds(rng)
    cond = col.isNotNull()
    if is_float:
        # reference rejects tokens parsing to NaN/Inf (`pattern/pattern.go:
        # 294-296`); Spark orders NaN above all doubles, so guard explicitly
        cond = (
            cond
            & ~F.isnan(col)
            & (col != F.lit(float("inf")))
            & (col != F.lit(float("-inf")))
        )
    if from_num is not None:
        cond = cond & (col >= F.lit(from_num) if rng.include_from else col > F.lit(from_num))
    if to_num is not None:
        cond = cond & (col <= F.lit(to_num) if rng.include_to else col < F.lit(to_num))
    return cond


def _token_check_range(rng: Range) -> Callable[[Column], Column]:
    numeric, from_num, to_num = range_bounds(rng)

    if numeric:
        def check_num(tok: Column) -> Column:
            v = tok.try_cast("double")
            # rlike guard: try_cast alone trims whitespace and accepts
            # 'Infinity'/'NaN' spellings — Go ParseFloat does not trim,
            # and the decimal-syntax guard keeps token semantics exactly
            # on the reference's dispatch (caught by the differential
            # fuzz: token ' 5' must NOT match [0, 10])
            cond = (
                tok.rlike(_GO_FLOAT_JAVA_RE)
                & v.isNotNull()
                & ~F.isnan(v)
                & (v != F.lit(float("inf")))
                & (v != F.lit(float("-inf")))
            )
            if from_num is not None:
                cond = cond & (v >= F.lit(from_num) if rng.include_from else v > F.lit(from_num))
            if to_num is not None:
                cond = cond & (v <= F.lit(to_num) if rng.include_to else v < F.lit(to_num))
            return cond

        return check_num

    def check_text(tok: Column) -> Column:
        cond = F.lit(True)
        if not rng.from_term.is_wildcard:
            b = F.lit(rng.from_term.data)
            cond = cond & (tok >= b if rng.include_from else tok > b)
        if not rng.to_term.is_wildcard:
            b = F.lit(rng.to_term.data)
            cond = cond & (tok <= b if rng.include_to else tok < b)
        return cond

    return check_text


def _apply_check(
    spec: FieldSpec,
    check: Callable[[Column], Column],
    eq_value: Optional[str] = None,
) -> Column:
    if (
        eq_value is not None
        and spec.max_token_bytes is not None
        and len(eq_value.encode("utf-8")) > spec.max_token_bytes
    ):
        # the literal is longer than the index-time token cap — such a
        # token was never indexed (`tokenizer/keyword_tokenizer.go:22-42`)
        return F.lit(False)
    if eq_value is not None and spec.eq_native is not None:
        native = spec.eq_native(eq_value)
        if native is not None:
            # bare comparison on the raw typed column: pushes into the
            # scan AND engages per-row-group id blooms on store tables —
            # the string path compiles to EqualTo(cast(col as string), v),
            # which parquet cannot use
            return native
    if spec.scalar is not None:
        if spec.scalar_raw is not None and spec.guard is not None:
            # PUSHDOWN-SHAPED form: the bare folded column with the
            # byte-cap guard as a SEPARATE conjunct. Identical semantics
            # to checking the guard-nulled scalar (under guard-true the
            # two columns are equal; under guard-false both forms are
            # false), but check(s) stays a bare EqualTo/StartsWith/LIKE
            # that reaches the parquet scan — wrapped in the guard CASE,
            # Catalyst keeps the conditional and pushes NOTHING (a silent
            # full-scan regression this shape fixes; plan-pinned in
            # tests/test_search.py).
            s = spec.scalar_raw()
            return spec.guard() & s.isNotNull() & check(s)
        s = spec.scalar()
        cond = s.isNotNull() & check(s)
        if spec.guard is not None and eq_value is None:
            # wildcard / lexicographic range could otherwise match a value
            # that was over the cap and therefore never indexed; equality
            # is safe bare (see FieldSpec.max_token_bytes)
            cond = spec.guard() & cond
        return cond
    toks = spec.tokens()
    if eq_value is not None:
        # native array_contains is ~2x faster than an exists() lambda and
        # codegen-friendly — the hot path for every text-token match
        return toks.isNotNull() & F.array_contains(toks, eq_value)
    return toks.isNotNull() & F.exists(toks, check)


def compile_node(node: Node, resolver: Resolver) -> Column:
    if isinstance(node, Literal):
        if node.field == TOKEN_ALL:
            return F.lit(True)
        if node.field == TOKEN_EXISTS:
            target = node.single_text
            if target is None:
                raise CompileError("_exists_ requires a plain field name")
            return resolver.resolve(target).exists_col()
        spec = resolver.resolve(node.field)
        return _apply_check(spec, _token_check_literal(node), eq_value=node.single_text)
    if isinstance(node, Range):
        spec = resolver.resolve(node.field)
        if spec.numeric is not None and range_bounds(node)[0]:
            return range_on_native_numeric(node, spec.numeric(), spec.numeric_is_float)
        return _apply_check(spec, _token_check_range(node))
    if isinstance(node, Logical):
        if node.op is LogicalOp.AND:
            return compile_node(node.children[0], resolver) & compile_node(
                node.children[1], resolver
            )
        if node.op is LogicalOp.OR:
            return compile_node(node.children[0], resolver) | compile_node(
                node.children[1], resolver
            )
        if node.op is LogicalOp.NOT:
            return ~compile_node(node.children[0], resolver)
    raise CompileError(f"unknown AST node {node!r}")
