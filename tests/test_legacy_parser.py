"""Legacy query-dialect parser tests, mirroring the reference's golden
strings (`parser/ast_test.go` TestParsingAST), error table
(`parser/parser_test.go` TestParserErr) and permutation fuzz
(TestParserFuzz), plus engine-level equivalence against the already
oracle-verified seq-ql dialect."""

import pytest

from seqspark.mapping import Mapping
from seqspark.seqql.legacy import dump, parse_legacy
from seqspark.seqql.parser import ParseError

M = Mapping(
    {
        "service": "keyword",
        "s": "keyword",
        "l": "keyword",
        "q": "keyword",
        "m": "keyword",
        "a": "keyword",
        "b": "keyword",
        "c": "keyword",
        "level": "keyword",
        "message": "text",
        "message12": "text",
        "path": "path",
    }
)


# `parser/ast_test.go` TestParsingAST — exact golden strings
GOLDEN = [
    ("service: composer-api", "service:composer-api"),
    ("  s    : a   OR   l     :   3  ", "(s:a OR l:3)"),
    ("s: a OR l: 3 AND q:b", "(s:a OR (l:3 AND q:b))"),
    ("s: a OR l: 3 OR q:b", "((s:a OR l:3) OR q:b)"),
    (" NOT  s : a ", "(NOT s:a)"),
    ("s:a OR NOT s:b OR s:c", "((s:a OR (NOT s:b)) OR s:c)"),
    ("NOT (s:a OR s:c)", "(NOT (s:a OR s:c))"),
    ("NOT NOT s:a", "(NOT (NOT s:a))"),
    ("service:*", "service:*"),
    (" service : * ", "service:*"),
]


@pytest.mark.parametrize("query,expected", GOLDEN)
def test_golden_ast(query, expected):
    got = dump(parse_legacy(query, M).root)
    assert got == expected
    # reparse stability: dump(parse(dump(...))) is a fixed point
    assert dump(parse_legacy(got, M).root) == got


# `parser/parser_test.go` TestParserErr — every one of these must fail
ERRORS = [
    "",
    "service:",
    'service:"some',
    'service:some"',
    "service: some thing",
    'service:"some thing',
    'service: some thing"',
    "AND",
    "NOT",
    "service: AND level: 3",
    "service: some AND level:",
    "nosuchfieldinlist: some",
    'service:"some text AND level:"3"',
    'service:some text" AND level:"3"',
    "m:a AND OR m:b",
    "m:a NOT AND m:b",
    "m:a NOT",
    "NOT NOT",
    "level:[1 3]",
    "level:[1TO3]",
    "level:[1 TO 3",
    "level:1 TO 3]",
    "level:[]",
    "level:[1 TO [3]]",
    "level:[1 TO 3]]",
    "level:[[1 TO 3]]",
    "level:[[1 TO 3]",
    "level:[1 TP 3]",
    "level:[1 TO 3[",
    "level:]1 TO 3]",
    ":some",
    ":[1 TO 3]",
    "[1 TO 3]:some",
    "(m:a",
    "m:a)",
    "m:a AND (",
    "m:a (",
    "m:a )",
    "m:a( AND m:a",
    "m:a (AND m:a)",
    "m:a) AND m:a",
    "service:**",
    "service:a**",
    "service:**b",
    "service:a**b",
    "some field:abc",
    "level service:abc",
    "(level:3 AND level level:abc)",
    ':"abc"',
    'NOT (:"abc")',
    "level:[** TO 1]",
    "level:[1 TO a*]",
    "level:[1 TO a*b]",
    "level:[1 TO *b]",
    'level:["**" TO 1]',
    'level:[1 TO "a*"]',
    "level:[",
    "level:[ ",
    "level:[1",
    "level:[*",
    'level:["1"',
    "level:[ 1 to",
    "level:[1 to *",
    "level:[1 to 2",
    "level:[1 to 2*",
    'level:[1 to "2',
    'level:[1 to "2"',
    "level:[1]",
    "level:[*]",
    'level:[1 to "2]',
]


@pytest.mark.parametrize("query", ERRORS)
def test_parse_errors(query):
    with pytest.raises(ParseError):
        parse_legacy(query, M)


def test_fuzz_permutations():
    """`parser/parser_test.go` TestParserFuzz: every permutation of these
    character templates is invalid."""
    from itertools import permutations

    for template in ["m:a[]", "m::a", "m:()", 'm:"', "m:()\\"]:
        for p in set(permutations(template)):
            q = "".join(p)
            with pytest.raises(ParseError):
                parse_legacy(q, M)


# pinned dialect behaviors (probed against the reference grammar,
# `parser/token_parser.go` + `parser/term_builder.go`)
PINNED = [
    # quoted keyword keeps the space as one term
    ('service:"some thing"', "service:some\\ thing"),
    # ranges: inclusive / exclusive / open bounds; quoted bounds unwrap
    ("level:[1 TO 3]", "level:[1 TO 3]"),
    ("level:{1 TO 3}", "level:{1 TO 3}"),
    ("level:[* TO 5]", "level:[* TO 5]"),
    ("level:[1 TO *]", "level:[1 TO *]"),
    ('level:["1" TO "3"]', "level:[1 TO 3]"),
    # text values tokenize like the index-time tokenizer, AND-ed
    ("message:hello-world", "(message:hello AND message:world)"),
    ('message:"exact phrase"', "(message:exact AND message:phrase)"),
    ("message: foo_bar*baz", "message:foo_bar*baz"),
    # graylog escapes
    ("service:a\\ b", "service:a\\ b"),
    # keyword values case-fold
    ("service:A", "service:a"),
]


@pytest.mark.parametrize("query,expected", PINNED)
def test_pinned_behaviors(query, expected):
    assert dump(parse_legacy(query, M).root) == expected


# ------------------------------------------------- reference golden corpus
# `parser/process_test.go` verbatim: the reference normalizes the tree with
# propagateNot before String(), so these compare through
# normalize_not + dump_normalized.

#: `seq.TestMapping` (reference `seq/mapping.go:13-44`) restricted to the
#: fields the vectors touch
MREF = Mapping(
    {
        "service": "keyword",
        "span_id": "keyword",
        "trace_id": "keyword",
        "message": "text",
        "text": "text",
        "k8s_pod": "keyword",
        "level": "keyword",
        "traceID": "keyword",
        "request_uri": "path",
        "m": "keyword",
        "id": "keyword",
    }
)

# `process_test.go` TestAll (seq.TestMapping)
REF_GOLDEN_MAPPED = [
    (r"service:some", r"service:some"),
    (r'service:"some text"', r"service:some\ text"),
    (r'text:"some text"', r"(text:some AND text:text)"),
    (r'text:"some very long text"',
     r"(((text:some AND text:very) AND text:long) AND text:text)"),
    (r'text:"a b" AND text:"c d f" OR text:"e f"',
     r"(((text:a AND text:b) AND ((text:c AND text:d) AND text:f)) OR (text:e AND text:f))"),
    (r"service:some*", r"service:some*"),
    (r"service:some*thing", r"service:some*thing"),
    (r"service:some*thing*", r"service:some*thing*"),
    (r"service:*thing*", r"service:*thing*"),
    (r"service:*", r"service:*"),
    (r"text:some*thing", r"text:some*thing"),
    (r"text:a**b**", r"((text:a* AND text:*b*) AND text:*)"),
    (r"level:[1 TO 3]", r"level:[1 TO 3]"),
    (r"level:{1 TO 3}", r"level:{1 TO 3}"),
    (r"level:[* TO *]", r"level:[* TO *]"),
    (r"level:[abc TO cbd]", r"level:[abc TO cbd]"),
    (r"service:some AND level:[1 TO 3] AND level:[3 TO 5]",
     r"((service:some AND level:[1 TO 3]) AND level:[3 TO 5])"),
    # `process_test.go` TestWildcardText (seq.TestMapping)
    (r'text:"some* weird* *cases"',
     r"((text:some* AND text:weird*) AND text:*cases)"),
    (r'text:"some *weird cases* hmm very*intrs"',
     r"((((text:some AND text:*weird) AND text:cases*) AND text:hmm) AND text:very*intrs)"),
    (r"text:value=* AND text:value=\** AND text:value=\*\** AND text:\*\* AND text:\*\**",
     r"(((((text:value AND text:*) AND (text:value AND text:\**)) AND (text:value AND text:\*\**)) AND text:\*\*) AND text:\*\**)"),
    (r"text:val* AND text:val\**", r"(text:val* AND text:val\**)"),
]

# `process_test.go` TestTokenization + TestPropagateNot (nil mapping →
# every field keyword, `parser/query_parser.go:21-23`)
REF_GOLDEN_NIL = [
    (r"service:abc", r"service:abc"),
    (r'service:"quoted"', r"service:quoted"),
    (r'service:"quoted spaces"', r"service:quoted\ spaces"),
    (r"service:\"symbols\"", r"service:\"symbols\""),
    (r'message:"[1 TO 3]"', r"message:\[1\ to\ 3\]"),
    (r"  message  :   hi  ", r"message:hi"),
    (r"MiXeD_CaSe:TeSt", r"MiXeD_CaSe:test"),
    (r'MiXeD_CaSe:"TeSt"', r"MiXeD_CaSe:test"),
    (r'service:""', r'service:""'),
    (r"service:cms*", r"service:cms*"),
    (r"service:cms*api", r"service:cms*api"),
    (r"service:cms*inter*api", r"service:cms*inter*api"),
    (r'service:"cms*inter*api"', r"service:cms*inter*api"),
    (r'service:"cms* inter* *api"', r"service:cms*\ inter*\ *api"),
    (r"level:[1 to 3]", r"level:[1 TO 3]"),
    (r"level:[* to 3]", r"level:[* TO 3]"),
    (r"level:{1 to *]", r"level:{1 TO *]"),
    (r'level:[1 to 3] AND id:[* TO "*"]', r"(level:[1 TO 3] AND id:[* TO *])"),
    (r'level:["from" to "to"]', r"level:[from TO to]"),
    (r"level:[from to to]", r"level:[from TO to]"),
    (r'level:["a b c" to "d e f"]', r"level:[a\ b\ c TO d\ e\ f]"),
    (r'level:["hi" to "ho"]', r"level:[hi TO ho]"),
    (r"level:[-123 to -456]", r"level:[-123 TO -456]"),
    (r"  level  :  [  1  to  3  ]  ", r"level:[1 TO 3]"),
    (r'level:["" to "a\*b"]', r'level:["" TO a\*b]'),
    (r'id:[-3 to 6} OR (message:"hel lo" AND level:[1 to 3])',
     r"(id:[-3 TO 6} OR (message:hel\ lo AND level:[1 TO 3]))"),
    (r"level:  foo\-bar-baz-\/ban", r"level:foo-bar-baz-/ban"),
    (r'level:  "foo\-bar-baz-\/ban"', r"level:foo\\-bar-baz-\\/ban"),
    (r'level:"\"foo\"bar\"\\"', r"level:\"foo\"bar\"\\"),
    # TestPropagateNot
    (r"NOT NOT m:a", r"m:a"),
    (r"m:a AND NOT NOT m:b", r"(m:a AND m:b)"),
    (r"m:a AND NOT m:b", r"(NOT m:b AND m:a)"),
    (r"NOT NOT m:a OR m:b", r"(m:a OR m:b)"),
    (r"NOT m:a OR m:b", r"(NOT (NOT m:b AND m:a))"),
    (r"NOT (NOT m:a AND NOT m:b)", r"(m:a OR m:b)"),
    (r"NOT m:a OR m:b OR m:c OR m:d",
     r"(NOT (NOT m:d AND (NOT m:c AND (NOT m:b AND m:a))))"),
    (r"m:a OR m:b OR m:c OR NOT m:d",
     r"(NOT (NOT ((m:a OR m:b) OR m:c) AND m:d))"),
    (r"NOT m:a AND m:b AND m:c AND m:d",
     r"(((NOT m:a AND m:b) AND m:c) AND m:d)"),
    (r"m:a AND m:b AND m:c AND NOT m:d",
     r"(NOT m:d AND ((m:a AND m:b) AND m:c))"),
    (r"NOT ((NOT m:a OR (NOT m:b AND m:c)) AND (NOT m:d AND NOT m:e))",
     r"((NOT (NOT m:b AND m:c) AND m:a) OR (m:d OR m:e))"),
]


@pytest.mark.parametrize("query,expected", REF_GOLDEN_MAPPED)
def test_reference_golden_mapped(query, expected):
    from seqspark.seqql.legacy import dump_normalized, normalize_not

    root = parse_legacy(query, MREF).root
    assert dump_normalized(normalize_not(root)) == expected


@pytest.mark.parametrize("query,expected", REF_GOLDEN_NIL)
def test_reference_golden_nil_mapping(query, expected):
    from seqspark.seqql.legacy import dump_normalized, normalize_not

    root = parse_legacy(query, None).root
    assert dump_normalized(normalize_not(root)) == expected


def test_reference_golden_case_sensitive():
    """`process_test.go` TestTokenizationCaseSensitive +
    TestExistsCaseSensitive."""
    from seqspark.seqql.legacy import dump_normalized, normalize_not

    for q, exp in ((r"service:AbCdEf", r"service:AbCdEf"),
                   (r'service:"AbC"', r"service:AbC")):
        root = parse_legacy(q, None, case_sensitive=True).root
        assert dump_normalized(normalize_not(root)) == exp
    # _exists_ values are field names: never folded in either mode
    for cs in (True, False):
        root = parse_legacy(r"_exists_:AbCdEfG", None, case_sensitive=cs).root
        assert dump_normalized(normalize_not(root)) == r"_exists_:AbCdEfG"


def test_reference_parse_range_structure():
    """`process_test.go` TestParseRange: bound kinds and inclusivity."""
    from seqspark.seqql.ast import Range, TermKind

    root = parse_legacy(r"level:{1 TO *]", MREF).root
    assert isinstance(root, Range)
    assert root.field == "level"
    assert root.include_from is False and root.include_to is True
    assert root.from_term.kind is TermKind.TEXT and root.from_term.data == "1"
    assert root.to_term.kind is TermKind.SYMBOL


# ------------------------------------------------------------------ engine


def test_search_dialect_equivalence(events_table):
    """A legacy query and its seq-ql twin select the same rows."""
    pairs = [
        (
            "event_type: click OR event_type: view AND value:[10 TO 50]",
            "event_type:click or event_type:view and value:[10, 50]",
        ),
        ("NOT event_type:error AND value:{10 TO 50}", "not event_type:error and value:(10, 50)"),
        ("event_type:c*", "event_type:c*"),
        ("event_type:*", "_exists_:event_type"),
    ]
    for legacy_q, seqql_q in pairs:
        a = {
            r["event_id"]
            for r in events_table.search(
                legacy_q, dialect="legacy", size=None
            ).collect()
        }
        b = {
            r["event_id"]
            for r in events_table.search(seqql_q, size=None).collect()
        }
        assert a == b, legacy_q
        assert a, f"vacuous: {legacy_q}"


def test_table_level_default_dialect(events_table):
    events_table.dialect = "legacy"
    try:
        # pipes exist only in seq-ql: raising here proves the legacy
        # parser is now the table default...
        with pytest.raises(ParseError):
            events_table.search("event_type:click | fields event_id")
        # ...and a legacy-shaped query still runs
        n = events_table.search(
            "event_type: click OR event_type: view", size=None
        ).count()
        # per-call dialect overrides the table default
        m = events_table.search("event_type:click | fields event_id", dialect="seqql")
    finally:
        events_table.dialect = "seqql"
    assert n > 0
    assert m.columns == ["event_id"]


def test_legacy_has_no_pipes(events_table):
    with pytest.raises(ParseError):
        events_table.search("event_type:click | fields event_id", dialect="legacy")


def test_empty_query_is_match_all(events_table):
    """Empty/whitespace query maps to `_all_:*` before dialect parse
    (`storeapi/grpc_search.go:184-188`) in BOTH dialects."""
    total = events_table.df.count()
    for dialect in ("seqql", "legacy"):
        assert (
            events_table.search("", dialect=dialect, size=None).count() == total
        )
        assert (
            events_table.search("  ", dialect=dialect, size=None).count() == total
        )
        assert (
            events_table.search("_all_:*", dialect=dialect, size=None).count()
            == total
        )


# -------------------------------------------------------------- hypothesis


def test_random_ast_dump_parse_fixpoint():
    """`parser/ast_test.go` TestParsingASTStress: dump a random boolean
    tree of keyword literals, reparse it, dump again — identical string."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from seqspark.seqql.ast import Literal, Term, and_node, not_node, or_node

    fields = st.sampled_from(["s", "l", "m", "service", "level"])
    # keyword-safe token data: reparse must produce the same single term
    tokens = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789_", min_size=1, max_size=8)
    leaves = st.builds(lambda f, t: Literal(field=f, terms=[Term.text(t)]), fields, tokens)

    def trees(children):
        return st.one_of(
            st.builds(and_node, children, children),
            st.builds(or_node, children, children),
            st.builds(not_node, children),
        )

    ast = st.recursive(leaves, trees, max_leaves=12)

    @settings(max_examples=200, deadline=None)
    @given(ast)
    def check(root):
        q = dump(root)
        assert dump(parse_legacy(q, M).root) == q

    check()


def test_legacy_range_reaches_parquet_pushdown(spark):
    """A legacy numeric range compiles to the same bare comparison as
    seq-ql and reaches the Parquet scan as a pushed filter (the shared
    events_table fixture is cached, which hides the scan — build fresh)."""
    from seqspark import SearchTable
    from seqspark.data import load_table

    # sf0.01, not sf0.001: the session-shared events fixture caches the
    # sf0.001 scan and Spark's cache manager would substitute
    # InMemoryTableScan for the identical plan, hiding PushedFilters
    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    st = SearchTable.from_typed(
        ev, {"value": "keyword", "event_id": "keyword"},
        ts_col="ts", rid_col="event_id",
    )
    df = st.search("value:[10 TO 50]", dialect="legacy", size=None)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1][:200]
    assert "GreaterThanOrEqua" in pushed, pushed


def test_legacy_bare_star_default_is_match_all(events_table):
    """The engine's own q='*' default (and the server's) must work under
    the legacy dialect: SearchTable.parse rewrites bare `*` to `_all_:*`
    (the raw legacy grammar still rejects it, per the reference error
    table)."""
    total = events_table.df.count()
    assert events_table.search(dialect="legacy", size=None).count() == total
    assert events_table.total(dialect="legacy").collect()[0]["total"] == total


def test_range_dump_quotes_field_like_reference():
    """Range.Dump quotes the FIELD via quoteTokenIfNeeded
    (`parser/token_range.go:17`) while Literal.Dump writes it raw
    (`parser/token_literal.go:15-21`) — a reserved-word or special-rune
    range field must render quoted, byte-for-byte with the reference
    (ADVICE r6)."""
    from seqspark.seqql.ast import Range, Term

    node = Range(
        field="and",
        from_term=Term.text("1"),
        to_term=Term.text("2"),
        include_from=True,
        include_to=True,
    )
    assert dump(node) == '"and":[1 TO 2]'
    plain = Range(
        field="size",
        from_term=Term.text("1"),
        to_term=Term.text("2"),
        include_from=True,
        include_to=False,
    )
    assert dump(plain) == "size:[1 TO 2}"
