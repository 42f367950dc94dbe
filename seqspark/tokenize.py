"""Tokenizer *expressions* — JVM-side column builders, no Python UDFs.

Each builder returns a PySpark ``Column`` computing the array of index tokens
for one field value, reproducing the reference tokenizers bit-for-bit on
their observable output:

- text:    runs of unicode letter/digit/``_``/``*``; per-token max size;
           case folding (`tokenizer/text_tokenizer.go:27-106`)
- keyword: whole value, dropped if longer than max token size
           (`tokenizer/keyword_tokenizer.go:22-42`)
- path:    every ``/``-prefix plus the full value
           (`tokenizer/path_tokenizer.go:32-70`)
- exists:  no value tokens (`tokenizer/exists_tokenizer.go:11-13`)

All operations stay inside Catalyst/whole-stage codegen (split/filter/
transform/lower) so tokenization vectorizes on executors — the scale path
for 100 TB ingest.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: default per-token size cap, reference `consts/consts.go` MaxTokenSize=72
DEFAULT_MAX_TOKEN_SIZE = 72
#: max indexed text field value length, reference `consts/consts.go:46` (32KB)
MAX_TEXT_FIELD_VALUE_LENGTH = 32 * 1024

#: separator class for the text tokenizer: anything that is NOT a unicode
#: letter/number or ``_``/``*`` (`tokenizer/text_tokenizer.go:55-77`).
TEXT_SEPARATOR_RE = r"[^\p{L}\p{N}_*]+"
#: DuckDB (RE2) spelling of the same class, used by oracle SQL.
TEXT_SEPARATOR_RE_DUCKDB = r"[^\p{L}\p{N}_*]+"


def fold_case(col: Column, case_sensitive: bool = False) -> Column:
    """Case folding (`tokenizer/tokenizer.go:15-48`)."""
    return col if case_sensitive else F.lower(col)


def text_tokens(
    col: Column,
    case_sensitive: bool = False,
    max_token_size: int = DEFAULT_MAX_TOKEN_SIZE,
    max_field_value_length: int = MAX_TEXT_FIELD_VALUE_LENGTH,
    partial_indexing: bool = False,
) -> Column:
    """Array of text tokens for a string column.

    Matches `tokenizer/text_tokenizer.go:27-106`: a value longer than the
    field cap is skipped entirely — or TRUNCATED to the cap and tokenized
    when ``partial_indexing`` is on (`--partial-indexing`; the reference's
    TestTokenizePartial* vectors: truncate-then-tokenize vs skip). Empty
    runs are dropped, tokens longer than ``max_token_size`` are dropped,
    case is folded. Null input → null (field absent → no tokens).
    """
    value = col
    if partial_indexing:
        # truncate-then-tokenize (`text_tokenizer.go:45-48` maxLength cut);
        # substring counts characters — only multi-byte values near the
        # cap can differ from the reference's byte cut, same caveat as the
        # keyword tokenizer's partial mode
        value = F.when(
            F.octet_length(col) > max_field_value_length,
            F.substring(col, 1, max_field_value_length),
        ).otherwise(col)
    toks = F.split(fold_case(value, case_sensitive), TEXT_SEPARATOR_RE)
    # size caps compare BYTE lengths like the reference (len([]byte):
    # MaxTokenSize=72 bytes, 32KB field cap) — octet_length, not length,
    # so multi-byte UTF-8 behaves identically
    toks = F.filter(
        toks, lambda t: (F.length(t) > 0) & (F.octet_length(t) <= max_token_size)
    )
    # empty value indexes a single empty token (text_tokenizer.go:41-44)
    out = F.when(F.length(col) == 0, F.array(F.lit(""))).otherwise(toks)
    if not partial_indexing:
        # without partial indexing an over-cap value is skipped entirely;
        # with it, the truncation above already bounded `toks`
        out = F.when(
            F.octet_length(col) > max_field_value_length,
            F.array().cast("array<string>"),
        ).otherwise(out)
    return F.when(col.isNull(), F.lit(None).cast("array<string>")).otherwise(out)


def keyword_tokens(
    col: Column,
    case_sensitive: bool = False,
    max_token_size: int = DEFAULT_MAX_TOKEN_SIZE,
    partial_indexing: bool = False,
) -> Column:
    """Single-element token array for a keyword column: the folded whole
    value; values over the BYTE-size cap are skipped — or truncated to the
    cap when ``partial_indexing`` is on, mirroring ``--partial-indexing``
    (`tokenizer/keyword_tokenizer.go:22-42` + `docs/en/02-flags.md`).
    Truncation counts characters (safe rune boundaries); only multi-byte
    values near the cap can differ from the reference's byte cut."""
    folded = fold_case(col, case_sensitive)
    if partial_indexing:
        over = F.array(F.substring(folded, 1, max_token_size))
    else:
        over = F.array().cast("array<string>")
    return F.when(col.isNull(), F.lit(None).cast("array<string>")).otherwise(
        F.when(F.octet_length(col) > max_token_size, over)
        .otherwise(F.array(folded))
    )


def path_tokens(
    col: Column,
    case_sensitive: bool = False,
    max_token_size: int = DEFAULT_MAX_TOKEN_SIZE,
    separator: str = "/",
) -> Column:
    """Token array for a path column: every proper ``/``-prefix plus the full
    value (`tokenizer/path_tokenizer.go:32-70`).

    ``/a/b/c`` → ``['/a', '/a/b', '/a/b/c']``;  ``a/b`` → ``['a', 'a/b']``.
    Implemented with split + transform over an index sequence — pure Catalyst.
    """
    from .pipeline.hof import let

    folded = fold_case(col, case_sensitive)

    def build(parts: Column) -> Column:
        # parts is let-bound: a raw split reference inside the transform
        # would re-split the value once per prefix
        n = F.size(parts)
        # prefix i = join of parts[0..i] — build via transform over an
        # index sequence. sequence(1, 0) would auto-step downward in
        # Spark; guard the n==1 case
        idx = F.when(n > 1, F.sequence(F.lit(1), n - F.lit(1))).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            idx, lambda i: F.array_join(F.slice(parts, 1, i), separator)
        )

    # '' leading element when value starts with sep. split takes a Java
    # regex while array_join takes a literal — escape so a regex-special
    # separator ('.', '|', '+') splits on the literal character and the
    # prefixes re-join to real substrings of the input
    import re

    prefixes = let(F.split(folded, re.escape(separator)), build)
    # Drop the empty first prefix produced by a leading separator, then
    # append the full value.
    prefixes = F.filter(prefixes, lambda p: F.length(p) > 0)
    all_tokens = F.concat(prefixes, F.array(folded))
    return F.when(col.isNull(), F.lit(None).cast("array<string>")).otherwise(
        F.when(F.octet_length(col) > max_token_size, F.array().cast("array<string>"))
        .otherwise(all_tokens)
    )


def tokens_for_type(index_type: str, col: Column, case_sensitive: bool = False,
                    max_token_size: int = DEFAULT_MAX_TOKEN_SIZE,
                    partial_indexing: bool = False) -> Column:
    if index_type == "text":
        return text_tokens(col, case_sensitive, max_token_size,
                           partial_indexing=partial_indexing)
    if index_type in ("keyword", "tags", "object", "nested"):
        return keyword_tokens(col, case_sensitive, max_token_size, partial_indexing)
    if index_type == "path":
        return path_tokens(col, case_sensitive, max_token_size)
    if index_type == "exists":
        return F.when(col.isNull(), F.lit(None).cast("array<string>")).otherwise(
            F.array().cast("array<string>")
        )
    raise ValueError(f"unknown index type {index_type!r}")
