"""Property-based parity tests (hypothesis): the Spark tokenizer and range
predicates agree with direct Python models of the reference semantics on
randomized inputs. Each example batch runs as ONE Spark job over a list of
generated strings, keeping runtime bounded."""

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from seqspark.compile import parses_as_number

# alphabet chosen to exercise boundaries (runs, multi-byte UTF-8 vs byte
# caps, '*'/'_' retention) while avoiding chars where Java and Python
# disagree on \p{N}/lower() (e.g. Nl/No numerals, dotted-I)
ALPHABET = (
    "abcxyz XYZ 0189 _*-,.!/:"  # ascii letters/digits/retained/separators
    "äßéñ"                      # 2-byte UTF-8 letters
    "日本語中"                   # 3-byte CJK letters
)

texts = st.lists(
    st.text(alphabet=ALPHABET, min_size=0, max_size=120), min_size=1, max_size=24
)


def model_text_tokens(s: str, max_token: int = 72) -> list:
    """Python model of `tokenizer/text_tokenizer.go:27-106`: runs of
    letter/digit/'_'/'*', folded, per-token byte cap, empty value → ['']."""
    if len(s) == 0:
        return [""]
    toks = re.split(r"[^\w*]+", s.lower(), flags=re.UNICODE)
    return [t for t in toks if t and len(t.encode("utf-8")) <= max_token]


@settings(max_examples=8, deadline=None)
@given(texts)
def test_text_tokenizer_matches_python_model(spark, samples):
    from seqspark.tokenize import text_tokens

    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i int, s string")
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", text_tokens(F.col("s")).alias("toks")).collect()
    }
    for i, s in enumerate(samples):
        assert got[i] == model_text_tokens(s), repr(s)


printable = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs", "Cc", "Cn")
    ),
    min_size=1,
    max_size=40,
)


def quote_single(v: str) -> str:
    """Quote a value for seq-ql single quotes: escape backslash, the quote,
    and `*` (so the literal stays a literal, `parser/seqql.go:276-292`)."""
    out = []
    for ch in v:
        if ch in ("\\", "'", "*"):
            out.append("\\" + ch)
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        else:
            out.append(ch)
    return "'" + "".join(out) + "'"


@settings(max_examples=200, deadline=None)
@given(printable)
def test_quoting_roundtrip(v):
    """parse(field:'<escaped v>') must recover v exactly as one literal —
    the lexer's unquote is the inverse of quoting for any printable text."""
    from seqspark.mapping import AutoMapping
    from seqspark.seqql.parser import parse

    q = "f:" + quote_single(v)
    lit = parse(q, AutoMapping()).root
    assert [t.data for t in lit.terms] == [v.lower()]
    assert not any(t.is_wildcard for t in lit.terms)


paths = st.lists(
    st.text(alphabet="abc0/ _.", min_size=0, max_size=40), min_size=1, max_size=16
)


def model_path_tokens(s: str, max_token: int = 72) -> list:
    """Python model of `tokenizer/path_tokenizer.go:32-70`: every proper
    '/'-prefix plus the full folded value; oversized values skipped."""
    if len(s.encode("utf-8")) > max_token:
        return []
    folded = s.lower()
    parts = folded.split("/")
    prefixes = []
    for i in range(1, len(parts)):
        p = "/".join(parts[:i])
        if p:
            prefixes.append(p)
    return prefixes + [folded]


@settings(max_examples=8, deadline=None)
@given(paths)
def test_path_tokenizer_matches_python_model(spark, samples):
    from seqspark.tokenize import path_tokens

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i int, s string"
    )
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", path_tokens(F.col("s")).alias("toks")).collect()
    }
    for i, s in enumerate(samples):
        assert got[i] == model_path_tokens(s), repr(s)


range_tokens = st.lists(
    st.one_of(
        st.text(alphabet="abc019.-+e", min_size=0, max_size=12),
        st.floats(allow_nan=False, allow_infinity=False, width=32).map(str),
        st.integers(-10**6, 10**6).map(str),
    ),
    min_size=1,
    max_size=24,
)
bounds = st.one_of(
    st.integers(-1000, 1000).map(str), st.text(alphabet="ab1.", min_size=1, max_size=4)
)


def model_range_match(tok, lo, hi, inc_lo=True, inc_hi=True):
    """`pattern/pattern.go:157-262`: numeric compare when both bounds and
    the token parse as finite Go floats, else lexicographic."""
    lo_n, hi_n = parses_as_number(lo), parses_as_number(hi)
    if lo_n is not None and hi_n is not None:
        t = parses_as_number(tok)
        if t is None:
            return False
        return (t >= lo_n if inc_lo else t > lo_n) and (
            t <= hi_n if inc_hi else t < hi_n
        )
    return (tok >= lo if inc_lo else tok > lo) and (
        tok <= hi if inc_hi else tok < hi
    )


@settings(max_examples=8, deadline=None)
@given(range_tokens, bounds, bounds)
def test_range_predicate_matches_python_model(spark, toks, lo, hi):
    from seqspark import SearchTable

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "i int, v string"
    ).withColumn("ts", F.timestamp_millis(F.col("i")))
    stbl = SearchTable.from_typed(
        df, {"v": "keyword"}, ts_col="ts", rid_col="i", case_sensitive=True
    )
    try:
        pred = stbl.predicate(f"v:['{lo}', '{hi}']")
    except Exception:
        return  # bound strings the grammar rejects are out of scope here
    got = {r["i"] for r in df.filter(pred).select("i").collect()}
    want = {i for i, t in enumerate(toks) if model_range_match(t, lo, hi)}
    assert got == want, (lo, hi, toks)


# corpora of small docs built from a tiny paragraph vocabulary so
# cross-document duplicates are frequent
para_vocab = st.sampled_from(
    ["alpha beta", "gamma", "delta epsilon zeta", "eta", "theta iota kappa"]
)
docs_corpus = st.lists(
    st.lists(para_vocab, min_size=1, max_size=5), min_size=1, max_size=8
)


def model_paragraph_dedup(corpus):
    """Python model: first (doc, pos) occurrence of each paragraph wins."""
    seen = set()
    out = {}
    for doc_id, paras in enumerate(corpus):
        kept = []
        for p in paras:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        out[doc_id] = "\n\n".join(kept)
    return out


@settings(max_examples=8, deadline=None)
@given(docs_corpus)
def test_paragraph_dedup_matches_python_model(spark, corpus):
    from seqspark.pipeline.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(i, "\n\n".join(paras)) for i, paras in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["text"]
        for r in paragraph_dedup(df, "doc_id").collect()
    }
    assert got == model_paragraph_dedup(corpus)


def test_incremental_dedup_matches_reference(spark):
    """Property (randomized fixed-seed corpus): incremental_dedup equals
    a brute-force python reference — batch doc survives iff its text is
    not in the corpus and it has the lowest id among batch docs sharing
    that text."""
    import random

    from seqspark.pipeline.dedup import corpus_digests, incremental_dedup

    rng = random.Random(41)
    vocab = [f"t{i}" for i in range(12)]
    def text():
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 4)))

    for trial in range(4):
        corpus_rows = [(i, text()) for i in range(rng.randint(0, 15))]
        batch_rows = [(100 + i, text()) for i in range(rng.randint(1, 25))]
        corpus = spark.createDataFrame(
            corpus_rows or [(0, "seed corpus doc")], "doc_id long, text string"
        )
        batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
        got = {r["doc_id"]
               for r in incremental_dedup(batch, corpus_digests(corpus)).collect()}
        seen = {t for _, t in (corpus_rows or [(0, "seed corpus doc")])}
        first = {}
        for i, t in sorted(batch_rows):
            if t not in seen and t not in first:
                first[t] = i
        assert got == set(first.values()), f"trial {trial}"


@settings(max_examples=200, deadline=None)
@given(
    body=st.one_of(
        st.binary(max_size=512),
        st.binary(max_size=64).map(
            lambda b: b"\x1f\x8b" + b  # gzip magic + garbage tail
        ),
    ),
    gzipped=st.booleans(),
)
def test_bulk_parse_total_error_contract(body, gzipped):
    """parse_bulk_body over arbitrary bytes either returns a BulkResult or
    raises BadBulkRequest — never a raw gzip/unicode/json exception. The
    HTTP handler relies on this split: BadBulkRequest -> 400 without
    touching circuit-breaker health, anything else -> 500 + breaker."""
    from seqspark.bulk import BadBulkRequest, BulkResult, parse_bulk_body

    try:
        res = parse_bulk_body(body, gzipped=gzipped)
    except BadBulkRequest:
        return
    assert isinstance(res, BulkResult)
    assert len(res.items) >= len(res.docs)


auto_docs = st.lists(
    st.dictionaries(
        st.text(alphabet="abcxyz_", min_size=1, max_size=8).filter(
            lambda k: k not in ("timestamp", "time", "ts", "original_timestamp")
        ),
        st.one_of(
            st.text(alphabet=ALPHABET, min_size=0, max_size=20),
            st.integers(-10**6, 10**6),
            st.booleans(),
        ),
        max_size=5,
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=8, deadline=None)
@given(auto_docs)
def test_auto_mapping_ingest_matches_python_model(spark, docs):
    """--mapping=auto tokenizes every top-level field as keyword: parity
    with a Python model (json value -> literal text -> case-folded,
    72-byte cap), including numbers and booleans as their JSON text."""
    import json as _json

    from seqspark.ingest import ingest_docs
    from seqspark.mapping import AutoMapping

    raws = [(_json.dumps(d),) for d in docs]
    frame = ingest_docs(
        spark.createDataFrame(raws, "raw string"),
        AutoMapping(),
        allowed_drift_ms=10**15,
        future_drift_ms=10**15,
    )
    got = [dict(r["tokens"] or {}) for r in frame.collect()]

    def model(d):
        out = {}
        for k, v in d.items():
            if isinstance(v, bool):
                text = "true" if v else "false"
            else:
                text = str(v)
            text = text.lower()
            if len(text.encode()) <= 72:
                out[k] = [text]
            else:
                out[k] = []
        return out

    for d, g in zip(docs, got):
        assert g == model(d), (d, g)


# arbitrary JSON values, nested to depth 3 (the reference fuzzes its
# ingest with RandomDocJSON the same way, `tests/setup/doc_test.go:33`)
_JSON_LEAF = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**12), max_value=10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=12),
)
_JSON_VAL = st.recursive(
    _JSON_LEAF,
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(st.text(min_size=1, max_size=6), children,
                        max_size=3),
    ),
    max_leaves=8,
)
_RANDOM_DOC = st.dictionaries(
    st.text(min_size=1, max_size=8), _JSON_VAL, max_size=4
).map(lambda d: {k: v for k, v in d.items() if k != "timestamp"})


@settings(max_examples=10, deadline=None)
@given(docs=st.lists(_RANDOM_DOC, min_size=1, max_size=25))
def test_random_json_ingest_never_crashes(spark, docs):
    """Arbitrary nested JSON through the full ingest stack — including
    mapped fields carrying the WRONG shape (objects/arrays/numbers where
    the mapping says keyword/text) — must never raise, must conserve the
    row count, and must round-trip every raw line byte-exact."""
    import json as _json

    from seqspark import Mapping, SearchTable
    from seqspark.ingest import ingest_docs

    mapping = Mapping({"service": "keyword", "message": "text"})
    # force type collisions on the mapped fields in half the docs
    for i, d in enumerate(docs):
        if i % 2 == 0:
            d["service"] = d.get("service", [1, {"x": None}])
            d["message"] = {"nested": ["not", "a", "string"]}
    lines = [_json.dumps(d, sort_keys=True) for d in docs]
    frame = ingest_docs(
        spark.createDataFrame([(l,) for l in lines], "raw string"),
        mapping, allowed_drift_ms=10**15, future_drift_ms=10**15,
    )
    rows = frame.select("raw", "mid", "rid").collect()
    assert len(rows) == len(lines)
    assert sorted(r["raw"] for r in rows) == sorted(lines)
    assert all(r["mid"] is not None and r["rid"] is not None for r in rows)
    # the table stays searchable; match-all sees every doc
    st_ = SearchTable.from_docs(frame, mapping)
    assert st_.search("*", size=100).count() == len(lines)


# ---------------------------------------------------------------------------
# Wildcard matcher parity vs a direct Python port of the reference's
# matcher (pattern/pattern.go:73-155 check path + pattern/substring.go
# KMP greedy middle-term automaton). The port is a TEST MODEL ONLY —
# the engine compiles wildcards to SQL LIKE (compile.wildcard_like) and
# this property pins that the two agree on adversarial inputs:
# overlapping terms (a*aa on aaa), LIKE metacharacters (% _ \) in DATA,
# newlines (LIKE % must cross them like the reference's any-byte *),
# multi-byte unicode (byte-level vs char-level matching — equal for
# valid UTF-8 because the encoding is self-synchronizing), and empty
# prefix/suffix (leading/trailing stars).


class _GoSubstring:
    """Port of substring.calcPrefFunc/findSubstring (substring.go)."""

    def __init__(self, val: bytes):
        assert val, "reference terms are never empty"
        self.val = val
        pf = [0] * len(val)
        cur = 0
        for i, b in enumerate(val[1:]):
            while cur > 0 and b != val[cur]:
                cur = pf[cur - 1]
            if b == val[cur]:
                cur += 1
            pf[i + 1] = cur
        self.pf = pf

    def find(self, s: bytes) -> int:
        cur = 0
        for i, b in enumerate(s):
            while cur > 0 and b != self.val[cur]:
                cur = self.pf[cur - 1]
            if b == self.val[cur]:
                cur += 1
            if cur == len(self.val):
                return i + 1
        return -1


class _GoWildcard:
    """Port of wildcardSearch (pattern/pattern.go:73-155): terms are
    ('*' | non-empty text) with prefix = first term if text, suffix =
    last term if text, middles = interior text terms found greedily
    left-to-right in the region between prefix and suffix."""

    def __init__(self, terms):
        assert any(t is None for t in terms), "literal path handles no-star"
        self.prefix = terms[0].encode() if terms[0] is not None else b""
        self.suffix = (
            terms[-1].encode() if len(terms) > 1 and terms[-1] is not None else b""
        )
        self.middle = [
            _GoSubstring(t.encode()) for t in terms[1:-1] if t is not None
        ]
        self.middle_len = sum(len(m.val) for m in self.middle)

    def check(self, val: str) -> bool:
        v = val.encode()
        np, ns = len(self.prefix), len(self.suffix)
        if np and (np > len(v) or v[:np] != self.prefix):
            return False
        if ns and (len(v) - np < ns or v[-ns:] != self.suffix):
            return False
        if self.middle:
            if len(v) - np - ns < self.middle_len:
                return False
            s = v[np : len(v) - ns]
            for m in self.middle:
                end = m.find(s)
                if end == -1:
                    return False
                s = s[end:]
        return True


_WC_ALPHABET = "ab%_\\\n\tßẞé K"  # LIKE metachars, newline, multibyte, case pairs


def _wc_text():
    return st.text(alphabet=_WC_ALPHABET, min_size=1, max_size=4)


@st.composite
def _wildcard_case(draw):
    texts = draw(st.lists(_wc_text(), min_size=0, max_size=3))
    lead = draw(st.booleans())
    trail = draw(st.booleans())
    terms: list = []
    if lead or not texts:
        terms.append(None)  # '*'
    for i, t in enumerate(texts):
        if i:
            terms.append(None)
        terms.append(t)
    if texts and trail:
        terms.append(None)
    if not any(t is None for t in terms):
        terms.append(None)
    # adversarial values: random, or a splice of the pattern's own text
    # terms (overlap traps like a*aa on aaa come from here)
    value = draw(
        st.one_of(
            st.text(alphabet=_WC_ALPHABET, min_size=0, max_size=10),
            st.builds(
                lambda sep, reps: sep.join(texts * reps),
                st.sampled_from(["", "a", "aa"]),
                st.integers(min_value=1, max_value=2),
            )
            if texts
            else st.just(""),
        )
    )
    return terms, value


@settings(max_examples=10, deadline=None)
@given(st.lists(_wildcard_case(), min_size=1, max_size=60))
def test_wildcard_like_matches_go_matcher_model(spark, cases):
    from seqspark.compile import wildcard_like
    from seqspark.seqql.parser import Term

    rows, expected = [], []
    for terms_spec, value in cases:
        terms = [
            Term.wildcard() if t is None else Term.text(t) for t in terms_spec
        ]
        rows.append((value, wildcard_like(terms)))
        expected.append(_GoWildcard(terms_spec).check(value))
    df = spark.createDataFrame(rows, "v string, p string")
    got = [r["m"] for r in df.select(F.expr("v LIKE p").alias("m")).collect()]
    mism = [
        (rows[i], expected[i], got[i])
        for i in range(len(rows))
        if bool(got[i]) != expected[i]
    ]
    assert not mism, f"LIKE vs Go-matcher divergence: {mism[:5]}"


def test_wildcard_like_overlap_traps(spark):
    # the named adversarial shapes, pinned explicitly (not just sampled):
    # greedy-overlap, suffix-overlap-prefix, metachars in data, newline
    # crossing, escaped backslash in data
    from seqspark.compile import wildcard_like
    from seqspark.seqql.parser import Term

    T, W = Term.text, Term.wildcard
    cases = [
        ([T("a"), W(), T("aa")], "aaa", True),   # a*aa on aaa
        ([T("a"), W(), T("aa")], "aa", False),   # suffix may not eat prefix
        ([T("aa"), W(), T("a")], "aaa", True),
        ([W(), T("a%b"), W()], "xa%by", True),   # % literal in data+term
        ([W(), T("a_b"), W()], "axb", False),    # _ must not be a wildcard
        ([W(), T("a_b"), W()], "a_b", True),
        ([W(), T("\\"), W()], "a\\b", True),     # backslash in data+term
        ([T("a"), W(), T("b")], "a\nb", True),   # * crosses newlines
        ([T("ab"), W()], "a", False),            # prefix longer than value
        ([W(), T("ab")], "ab", True),            # *ab on ab (empty run)
    ]
    rows = [(v, wildcard_like(t)) for t, v, _ in cases]
    df = spark.createDataFrame(rows, "v string, p string")
    got = [r["m"] for r in df.select(F.expr("v LIKE p").alias("m")).collect()]
    for (terms, value, want), g in zip(cases, got):
        assert bool(g) == want, (value, wildcard_like(terms), want, g)
        assert _GoWildcard(
            [None if t.kind.name == "SYMBOL" else t.data for t in terms]
        ).check(value) == want
