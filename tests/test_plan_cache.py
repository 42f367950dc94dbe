"""r17 optimization internals: the prepared-plan cache and the
single-pass count+group_by `_not_exists` fold.

The cache must be a pure plan-construction memo — identical results,
same lazy object back, execution recomputed per call — and must be
invalidated by the "store changed" signals. The count fold must produce
the exact row set the old union shape produced, from ONE scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seqspark import AggQuery, SearchTable

MAPPING = {"grp": "keyword", "value": "keyword", "event_id": "keyword"}


def _table(spark):
    data = [
        (1, None, 5.0),
        (2, "a", 1.0),
        (3, "_not_exists", 2.0),
        (4, "a", None),
        (5, "b", 7.5),
    ]
    df = spark.createDataFrame(
        data, "event_id long, grp string, value double"
    ).withColumn("ts", F.timestamp_millis(F.col("event_id") * 1000))
    return SearchTable.from_typed(
        df, MAPPING, ts_col="ts", rid_col="event_id"
    )


def test_search_plan_cache_hits_and_matches(spark):
    st = _table(spark)
    df1 = st.search("grp:a", size=10, order="asc")
    df2 = st.search("grp:a", size=10, order="asc")
    assert df2 is df1, "identical request should reuse the prepared plan"
    rows = [r["event_id"] for r in df1.collect()]
    assert rows == [2, 4]
    # different args miss the cache
    df3 = st.search("grp:a", size=10, order="desc")
    assert df3 is not df1
    assert [r["event_id"] for r in df3.collect()] == [4, 2]


def test_search_plan_cache_cleared_by_width_cache(spark):
    st = _table(spark)
    df1 = st.search("grp:b")
    st.clear_width_cache()
    assert st.search("grp:b") is not df1, "invalidation must drop entries"


def test_search_plan_cache_lru_bound(spark):
    st = _table(spark)
    for i in range(st._PLAN_CACHE_CAP + 10):
        st.search("*", size=i + 1)
    assert len(st._plan_cache) <= st._PLAN_CACHE_CAP


def test_aggregate_cache_reexecutes_per_call(spark):
    st = _table(spark)
    a1 = st.aggregate(AggQuery(func="count", field="grp"))
    before = len(st.drain_agg_plan_dfs())
    a2 = st.aggregate(AggQuery(func="count", field="grp"))
    after = len(st.drain_agg_plan_dfs())
    # eager agg executed BOTH times (probe appended per call), results equal
    assert before == after == 1
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_count_group_not_exists_single_scan_plan(spark):
    st = _table(spark)
    st.aggregate(AggQuery(func="count", field="grp"))
    probe = st.last_agg_plan_df()
    jvm = spark._jvm
    plan = probe._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    # the r17 fold: one pass — no Union of a second aggregation, one scan
    # (an executed AQE plan prints Final AND Initial sections — check the
    # final one)
    plan = plan.split("== Initial Plan ==")[0]
    assert "Union" not in plan
    assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") == 1


def test_count_group_not_exists_rows_exact(spark):
    st = _table(spark)
    out = st.aggregate(AggQuery(func="count", field="grp"))
    rows = sorted(
        (r["name"], r["value"], r["mid_ms"], r["not_exists"])
        for r in out.collect()
    )
    # 'a' x2, 'b' x1, a REAL token spelled _not_exists x1, and the
    # synthetic missing-group bucket x1 — kept as SEPARATE rows exactly
    # like the old union shape
    assert rows == [
        ("_not_exists", 1.0, None, 0),
        ("_not_exists", 1.0, None, 0),
        ("a", 2.0, None, 0),
        ("b", 1.0, None, 0),
    ]


def test_count_group_not_exists_timeseries_mid_null(spark):
    st = _table(spark)
    out = st.aggregate(
        AggQuery(func="count", field="grp", interval_ms=2000)
    )
    rows = {(r["name"], r["mid_ms"]): r["value"] for r in out.collect()}
    # missing-group docs collapse into ONE bucket with NULL mid even
    # under an interval (legacy union behavior)
    assert rows[("_not_exists", None)] == 1.0
    assert sum(1 for (n, _m) in rows if n == "_not_exists") == 2


def test_load_table_memo_identity(spark):
    from seqspark.data import load_table

    a = load_table(spark, "/root/testdata/sf0.001", "events")
    b = load_table(spark, "/root/testdata/sf0.001", "events")
    assert a is b
    assert a.count() > 0


@pytest.mark.parametrize("order", ["asc", "desc"])
def test_cached_pages_disjoint(spark, order):
    st = _table(spark)
    p0 = [r["event_id"] for r in st.search("*", size=2, offset=0, order=order).collect()]
    p1 = [r["event_id"] for r in st.search("*", size=2, offset=2, order=order).collect()]
    p0b = [r["event_id"] for r in st.search("*", size=2, offset=0, order=order).collect()]
    assert p0 == p0b and not set(p0) & set(p1)


def test_agg_built_schema_state_set_at_build(spark):
    # r18: the eager path's LocalRelation schema state is computed in
    # _agg_build, BEFORE the object is published to the plan cache —
    # concurrent executes share immutable state instead of racing a
    # lazy memo write
    st = _table(spark)
    aq = AggQuery(func="count", group_by="grp")
    st.aggregate(aq).collect()
    (built,) = [v[0] for k, v in st._plan_cache.items() if k[0] == "agg"]
    assert built.eager
    assert built.local_schema is not None
    assert built.local_names is not None
    assert built.local_arrow is not None


def test_concurrent_aggregate_execute(spark):
    # concurrent executes of ONE cached shape: identical results, no
    # errors (the pre-r18 lazy local_schema write was the only shared
    # mutation on this path)
    import threading

    st = _table(spark)
    aq = AggQuery(func="count", group_by="grp")
    expected = sorted(
        tuple(r) for r in st.aggregate(aq).collect()
    )
    results: list = []
    errors: list = []

    def run():
        try:
            rows = sorted(tuple(r) for r in st.aggregate(aq).collect())
            results.append(rows)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=run) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert all(r == expected for r in results)


def test_plan_cache_epoch_blocks_stale_insert(spark):
    # r18 (advice): a clear_width_cache() firing between plan build and
    # cache insert must win — the plan built against superseded state
    # never enters the cache
    st = _table(spark)
    orig_build = st._agg_build

    def build_then_invalidate(*a, **kw):
        built = orig_build(*a, **kw)
        st.clear_width_cache()  # concurrent attach_index analog
        return built

    st._agg_build = build_then_invalidate
    st.aggregate(AggQuery(func="count", group_by="grp")).collect()
    st._agg_build = orig_build
    assert not st._plan_cache, "stale-epoch plan must not be cached"
    # and the same request afterwards caches normally again
    st.aggregate(AggQuery(func="count", group_by="grp")).collect()
    assert st._plan_cache
