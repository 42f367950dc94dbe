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
