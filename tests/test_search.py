"""Search-path integration tests over the driver's events table, mirroring
the reference integration scenarios
(`tests/integration_tests/integration_test.go`: search one/many/nothing,
backwards, NOT, wildcard, range, from/to)."""

from pyspark.sql import functions as F


def duck_count(duck, sql):
    return duck.execute(sql).fetchone()[0]


def test_keyword_eq_matches_oracle(events_table, duck):
    assert events_table.search("event_type:click").count() == duck_count(
        duck, "SELECT count(*) FROM events WHERE lower(event_type)='click'"
    )


def test_search_nothing(events_table):
    assert events_table.search("event_type:nosuch").count() == 0


def test_bool_precedence(events_table, duck):
    got = events_table.search(
        "event_type:click and value:[10, *] or event_type:error and value:[30, *]"
    ).count()
    want = duck_count(
        duck,
        "SELECT count(*) FROM events WHERE (lower(event_type)='click' AND value>=10)"
        " OR (lower(event_type)='error' AND value>=30)",
    )
    assert got == want


def test_not(events_table, duck):
    got = events_table.search("not event_type:click").count()
    want = duck_count(duck, "SELECT count(*) FROM events WHERE lower(event_type)<>'click'")
    assert got == want


def test_wildcard(events_table, duck):
    got = events_table.search("event_type:c*ck").count()
    want = duck_count(
        duck, "SELECT count(*) FROM events WHERE regexp_matches(lower(event_type), '^c.*ck$')"
    )
    assert got == want


def test_range_numeric_half_open(events_table, duck):
    got = events_table.search("value:[10, 20)").count()
    want = duck_count(duck, "SELECT count(*) FROM events WHERE value>=10 AND value<20")
    assert got == want


def test_range_lexicographic(events_table, duck):
    got = events_table.search("event_type:[click, error]").count()
    want = duck_count(
        duck,
        "SELECT count(*) FROM events WHERE lower(event_type)>='click' AND lower(event_type)<='error'",
    )
    assert got == want


def test_time_window(events_table, duck):
    from_ms, to_ms = 1704067200000, 1704672000000
    got = events_table.search("*", from_ms=from_ms, to_ms=to_ms).count()
    want = duck_count(
        duck,
        f"SELECT count(*) FROM events WHERE epoch_ms(ts)>={from_ms} AND epoch_ms(ts)<={to_ms}",
    )
    assert got == want


def test_order_desc_and_asc_are_reverses(events_table):
    desc = [r[0] for r in events_table.search("*", size=10, order="desc").select("event_id").collect()]
    asc = [r[0] for r in events_table.search("*", size=10, order="asc").select("event_id").collect()]
    assert len(desc) == 10 and len(asc) == 10
    assert desc[0] != asc[0]


def test_offset_pagination_contiguous(events_table):
    p1 = [r[0] for r in events_table.search("*", size=5, offset=0, order="asc").select("event_id").collect()]
    p2 = [r[0] for r in events_table.search("*", size=5, offset=5, order="asc").select("event_id").collect()]
    all10 = [r[0] for r in events_table.search("*", size=10, offset=0, order="asc").select("event_id").collect()]
    assert p1 + p2 == all10


def test_fields_pipe_projection(events_table):
    df = events_table.search("* | fields event_id, event_type", size=3)
    assert df.columns == ["event_id", "event_type"]


def test_fetch_by_ids(events_table):
    got = events_table.fetch_ids([1, 5, 9], "event_id").count()
    assert got == 3


def test_dedup_on_id(events_table, events):
    doubled = events.union(events)
    st2 = events_table.__class__(
        doubled, events_table.mapping, events_table.resolver, "ts", "event_id"
    )
    n = st2.search("event_type:click", dedup_cols=["event_id"]).count()
    assert n == events_table.search("event_type:click").count()


def test_text_field_token_and(events_table, documents, duck):
    from seqspark import SearchTable

    st = SearchTable.from_typed(
        documents.withColumn("ts", F.timestamp_millis(F.col("doc_id") * 1000)),
        {"text": "text", "lang": "keyword", "source": "keyword", "doc_id": "keyword"},
        ts_col="ts",
        rid_col="doc_id",
    )
    got = st.search('text:"table scan"').count()
    want = duck_count(
        duck,
        r"""SELECT count(*) FROM documents
        WHERE len(list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}_*]+'), t -> t='table'))>0
          AND len(list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}_*]+'), t -> t='scan'))>0""",
    )
    assert got == want


def test_text_wildcard_per_token(documents, duck):
    from seqspark import SearchTable

    st = SearchTable.from_typed(
        documents.withColumn("ts", F.timestamp_millis(F.col("doc_id") * 1000)),
        {"text": "text", "doc_id": "keyword"},
        ts_col="ts",
    )
    got = st.search("text:sc*n").count()
    want = duck_count(
        duck,
        r"""SELECT count(*) FROM documents
        WHERE len(list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}_*]+'),
                  t -> regexp_matches(t, '^sc.*n$')))>0""",
    )
    assert got == want


def test_max_search_docs_cap(events_table):
    import pytest

    with pytest.raises(ValueError):
        events_table.search("*", size=200_000)


def test_search_after_sub_ms_timestamps_lossless(spark):
    """Keyset paging over sub-millisecond timestamps: the wire cursor can
    only carry (ms, rid), so result order is (ms, rid) — sorting by raw
    micros would disagree with the cursor's equality class and lose rows
    like (same ms, smaller sub-ms, larger rid). Page through a corpus
    where every ms bucket holds several sub-ms rows and assert the pages
    tile the full result exactly."""
    from seqspark import SearchTable

    rows = []
    rid = 0
    base_us = 1704067200 * 1_000_000
    for ms in range(40):
        for sub in (900, 100, 500):  # deliberately non-monotone sub-ms
            rows.append((base_us + ms * 1000 + sub, rid))
            rid += 1
    df = spark.createDataFrame(rows, "us long, event_id long").select(
        F.timestamp_micros(F.col("us")).alias("ts"), "event_id"
    )
    st = SearchTable.from_typed(
        df, {"event_id": "keyword"}, ts_col="ts", rid_col="event_id"
    )
    full = [(r["event_id"]) for r in st.search("*", size=200, order="asc").collect()]
    assert len(full) == len(rows)
    paged = []
    cursor = None
    while True:
        page = st.search_after(
            "*",
            last_ts_ms=cursor[0] if cursor else None,
            last_rid=cursor[1] if cursor else None,
            size=7, order="asc",
        ).collect()
        if not page:
            break
        paged.extend(r["event_id"] for r in page)
        last = page[-1]
        cursor = (int(last["ts"].timestamp() * 1000), last["event_id"])
    assert paged == full, "keyset pages must tile the full ordered result"


def test_keyword_filters_reach_parquet_pushdown(spark):
    """Keyword equality AND wildcard shapes must reach the parquet scan
    as pushed filters on an at-rest-folded table (the deployment shape):
    the r9 byte-cap CASE silently swallowed ALL keyword pushdown (plan
    showed PushedFilters: []), turning every keyword filter into a full
    scan at 100 TB. compile._apply_check now emits guard AND <bare
    check>; this pins EqualTo / StringStartsWith / StringEndsWith."""
    from seqspark import SearchTable
    from seqspark.data import load_table

    # sf0.01 (not the cached sf0.001 fixture): the cache manager would
    # substitute InMemoryTableScan and hide PushedFilters
    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    st = SearchTable.from_typed(
        ev, {"event_type": "keyword", "event_id": "keyword"},
        ts_col="ts", rid_col="event_id", assume_folded=True,
    )
    for q, want in (
        ("event_type:click", "EqualTo(event_type,click)"),
        ("event_type:cli*", "StringStartsWith(event_type,cli)"),
        ("event_type:*ick", "StringEndsWith(event_type,ick)"),
    ):
        plan = st.search(q, size=10)._jdf.queryExecution().executedPlan().toString()
        i = plan.find("PushedFilters")
        assert i != -1 and want in plan[i:i + 200], (q, plan[i:i + 200])


def test_integral_keyword_equality_native_pushdown(spark):
    """Equality on an integral-typed keyword column compiles to a bare
    typed comparison (pushed EqualTo; OR-of-EqualTo for in()) while
    keeping string-token semantics: only the canonical decimal rendering
    matches — '042', 'abc', '+7', and out-of-range literals compile to
    lit(False), the verdict the string compare reaches row by row."""
    from seqspark import SearchTable
    from seqspark.data import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    st = SearchTable.from_typed(
        ev, {"event_id": "keyword", "user_id": "keyword"},
        ts_col="ts", rid_col="event_id", assume_folded=True,
    )
    plan = st.search("user_id:42", size=10)._jdf.queryExecution(
    ).executedPlan().toString()
    i = plan.find("PushedFilters")
    assert "EqualTo(user_id,42)" in plan[i:i + 200], plan[i:i + 200]
    # string-compare parity on the whole result set
    want = ev.filter(F.col("user_id").cast("string") == "42").count()
    assert st.search("user_id:42", size=None).count() == want
    # canonical-rendering semantics
    # ("+42" never reaches compile: the lexer rejects a bare '+' term)
    for q in ("user_id:042", "user_id:abc",
              "user_id:99999999999999999999999"):
        assert st.search(q, size=None).count() == 0, q
    got = st.search("event_id:in(3, 5, 9)", size=None).count()
    assert got == ev.filter(F.col("event_id").isin(3, 5, 9)).count()


def test_integral_keyword_negation_keeps_null_rows(spark):
    """`not field:v` must MATCH rows where the field is NULL (no token ⇒
    the negation holds — reference semantics). A bare `col == v` leaf is
    NULL on those rows and `~NULL` silently drops them; the isNotNull
    conjunct keeps every leaf two-valued."""
    from seqspark import SearchTable

    df = spark.createDataFrame(
        [(1, 7, "2024-01-01 00:00:01"), (2, None, "2024-01-01 00:00:02"),
         (3, 8, "2024-01-01 00:00:03")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    st = SearchTable.from_typed(
        df, {"user_id": "keyword", "event_id": "keyword"},
        ts_col="ts", rid_col="event_id", assume_folded=True,
    )
    got = {r["event_id"] for r in st.search("not user_id:7", size=None).collect()}
    assert got == {2, 3}, got
