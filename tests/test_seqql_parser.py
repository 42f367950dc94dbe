"""Parser golden tests, mirroring the reference's parser test strategy
(`parser/seqql_filter_test.go`, `parser/parser_test.go`)."""

import pytest

from seqspark.mapping import AutoMapping, Mapping
from seqspark.seqql.ast import Literal, Logical, LogicalOp, Range, Term, TermKind
from seqspark.seqql.parser import ParseError, parse

M = Mapping(
    {
        "service": "keyword",
        "level": "keyword",
        "message": "text",
        "status": "keyword",
        "size": "keyword",
        "path": "path",
    }
)


def test_keyword_eq():
    q = parse("service:auth", M)
    assert isinstance(q.root, Literal)
    assert q.root.field == "service"
    assert q.root.terms == [Term.text("auth")]


def test_case_folding_of_query_value():
    q = parse("service:AuTh", M)
    assert q.root.terms == [Term.text("auth")]


def test_composite_token_with_dash():
    q = parse("service:payment-api", M)
    assert q.root.terms == [Term.text("payment-api")]


def test_and_binds_tighter_than_or():
    q = parse("service:a or service:b and service:c", M)
    root = q.root
    assert isinstance(root, Logical) and root.op is LogicalOp.OR
    right = root.children[1]
    assert isinstance(right, Logical) and right.op is LogicalOp.AND


def test_parentheses():
    q = parse("(service:a or service:b) and service:c", M)
    assert q.root.op is LogicalOp.AND
    assert q.root.children[0].op is LogicalOp.OR


def test_not():
    q = parse("not service:a", M)
    assert q.root.op is LogicalOp.NOT


def test_text_multi_token_is_and_tree():
    q = parse('message:"err code 500"', M)
    # AND(AND(err, code), 500)
    assert q.root.op is LogicalOp.AND
    assert q.root.children[1].terms == [Term.text("500")]
    inner = q.root.children[0]
    assert inner.children[0].terms == [Term.text("err")]
    assert inner.children[1].terms == [Term.text("code")]


def test_text_separators_split_tokens():
    # separators inside a text value must be quoted; the value is then
    # tokenized like the indexer tokenizes documents
    q = parse('message:"foo:bar"', M)
    assert q.root.op is LogicalOp.AND
    assert q.root.children[0].terms == [Term.text("foo")]
    assert q.root.children[1].terms == [Term.text("bar")]


def test_unquoted_separator_is_parse_error():
    with pytest.raises(ParseError):
        parse("message:foo:bar", M)


def test_wildcard_terms():
    q = parse("service:acc*s*", M)
    kinds = [(t.kind, t.data) for t in q.root.terms]
    assert kinds == [
        (TermKind.TEXT, "acc"),
        (TermKind.SYMBOL, "*"),
        (TermKind.TEXT, "s"),
        (TermKind.SYMBOL, "*"),
    ]


def test_match_all():
    q = parse("*", M)
    assert q.root.field == "_all_"
    assert q.root.is_match_all


def test_in_filter_is_or():
    q = parse("service:in(a, b)", M)
    assert q.root.op is LogicalOp.OR


def test_in_with_wildcard():
    q = parse("service:in(a, b*)", M)
    lit = q.root.children[1]
    assert lit.terms[-1].is_wildcard


def test_range_inclusive_exclusive():
    q = parse("size:[1, 10)", M)
    r = q.root
    assert isinstance(r, Range)
    assert r.include_from and not r.include_to
    assert r.from_term.data == "1" and r.to_term.data == "10"


def test_range_legacy_to_keyword():
    q = parse("size:[1 to 10]", M)
    assert q.root.include_to


def test_range_open_bound():
    q = parse("size:[5, *]", M)
    assert q.root.to_term.is_wildcard


def test_quoted_value_keeps_spaces():
    q = parse("service:'hello world'", M)
    assert q.root.terms == [Term.text("hello world")]


def test_quoted_wildcard_is_wildcard_and_escaped_is_literal():
    q = parse("service:'a*b'", M)
    assert q.root.terms[1].is_wildcard
    q2 = parse(r"service:'a\*b'", M)
    assert q2.root.terms == [Term.text("a*b")]


def test_raw_string_star_is_literal():
    q = parse("service:`a*b`", M)
    assert q.root.terms == [Term.text("a*b")]


def test_comment_stripped():
    q = parse("service:a # trailing comment\nor service:b", M)
    assert q.root.op is LogicalOp.OR


def test_pipe_fields():
    q = parse("* | fields service, level", M)
    assert q.pipes[0].fields == ["service", "level"]
    assert not q.pipes[0].except_


def test_pipe_fields_except():
    q = parse("* | fields except message", M)
    assert q.pipes[0].except_


def test_unmapped_field_errors():
    with pytest.raises(ParseError):
        parse("nope:1", M)


def test_automapping_allows_all():
    q = parse("anything:x", AutoMapping())
    assert q.root.field == "anything"


def test_exists_is_case_sensitive():
    q = parse("_exists_:MyField", M.__class__({"MyField": "keyword"}))
    assert q.root.terms == [Term.text("MyField")]


def test_multiple_field_pipes_rejected():
    with pytest.raises(ParseError):
        parse("* | fields a | fields b", AutoMapping())


def test_errors():
    for bad in ["service:", "and", "service:a and", "(service:a", "size:[1, ", "service:a | bogus x"]:
        with pytest.raises(ParseError):
            parse(bad, M)


def test_mapping_duplicate_titles_rejected():
    """`seq/mapping_test.go` TestReadMappingError vectors: duplicate
    titles — including two untitled types — and unknown types are mapping
    errors, not last-one-wins."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="duplicate field title"):
        Mapping.from_yaml_obj({"mapping-list": [{"name": "message", "types": [
            {"title": "path", "type": "path", "size": 255},
            {"type": "text"},
            {"title": "path", "type": "path", "size": 255}]}]})
    with _pytest.raises(ValueError, match=r"duplicate field title.*_empty_"):
        Mapping.from_yaml_obj({"mapping-list": [{"name": "message", "types": [
            {"type": "text"}, {"type": "keyword"}]}]})
    with _pytest.raises(ValueError, match="unknown index type"):
        Mapping.from_yaml_obj({"mapping-list": [{"name": "message", "types": [
            {"title": "x", "type": "unknown"}, {"type": "text"}]}]})
