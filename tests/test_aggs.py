"""Aggregation semantics vs the DuckDB oracle
(reference `frac/processor/aggregator.go`, integration cases at
`tests/integration_tests/integration_test.go:666,751,923`)."""

import math

from seqspark import AggQuery


def rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_count_by_group(events_table, duck):
    got = rows(events_table.aggregate(AggQuery(func="count", field="event_type")), "name", "value")
    want = sorted(
        (g, float(c))
        for g, c in duck.execute(
            "SELECT lower(event_type), count(*) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert got == want


def test_unique(events_table, duck):
    got = rows(events_table.aggregate(AggQuery(func="unique", field="event_type")), "name")
    want = sorted(
        (g,) for (g,) in duck.execute("SELECT DISTINCT lower(event_type) FROM events").fetchall()
    )
    assert got == want


def test_min_max_sum_avg_by_group(events_table, duck):
    for fn in ("min", "max", "sum", "avg"):
        got = rows(
            events_table.aggregate(AggQuery(func=fn, field="value", group_by="event_type")),
            "name",
            "value",
        )
        want = sorted(
            (g, float(v))
            for g, v in duck.execute(
                f"SELECT lower(event_type), {fn}(value) FROM events GROUP BY 1"
            ).fetchall()
        )
        for (gn, gv), (wn, wv) in zip(got, want):
            assert gn == wn
            assert math.isclose(gv, wv, rel_tol=1e-9)


def test_agg_with_filter(events_table, duck):
    got = rows(
        events_table.aggregate(AggQuery(func="sum", field="value", group_by="event_type"), q="value:[10, *]"),
        "name",
        "value",
    )
    want = sorted(
        (g, float(v))
        for g, v in duck.execute(
            "SELECT lower(event_type), sum(value) FROM events WHERE value>=10 GROUP BY 1"
        ).fetchall()
    )
    for (gn, gv), (wn, wv) in zip(got, want):
        assert gn == wn and math.isclose(gv, wv, rel_tol=1e-9)


def test_quantile_close_to_exact(events_table, duck):
    df = events_table.aggregate(AggQuery(func="quantile", field="value", quantiles=[0.5, 0.9]))
    r = df.collect()[0]
    exact = duck.execute(
        "SELECT quantile_cont(value, 0.5), quantile_cont(value, 0.9) FROM events"
    ).fetchone()
    # reference quantiles are reservoir-sampled approximations
    # (`seq/qpr.go:316-415`); compare with tolerance per SURVEY §7.3.4
    assert abs(r["q0"] - exact[0]) / max(exact[0], 1) < 0.05
    assert abs(r["q1"] - exact[1]) / max(exact[1], 1) < 0.05


def test_timeseries_count(events_table, duck):
    week = 7 * 86400000
    got = rows(
        events_table.aggregate(AggQuery(func="count", field="event_type", interval_ms=week)),
        "mid_ms",
        "name",
        "value",
    )
    want = sorted(
        (m, g, float(c))
        for m, g, c in duck.execute(
            f"SELECT epoch_ms(ts) - epoch_ms(ts)%{week}, lower(event_type), count(*)"
            " FROM events GROUP BY 1,2"
        ).fetchall()
    )
    assert got == want


def test_histogram(events_table, duck):
    day = 86400000
    got = rows(events_table.histogram("event_type:click", interval_ms=day), "bucket_ms", "cnt")
    want = sorted(
        (b, c)
        for b, c in duck.execute(
            f"SELECT epoch_ms(ts) - epoch_ms(ts)%{day}, count(*) FROM events"
            " WHERE lower(event_type)='click' GROUP BY 1"
        ).fetchall()
    )
    assert got == want


def test_with_total(events_table, duck):
    got = events_table.total("event_type:click").collect()[0][0]
    want = duck.execute("SELECT count(*) FROM events WHERE lower(event_type)='click'").fetchone()[0]
    assert got == want


def test_agg_guard(events_table):
    import pytest

    from seqspark import TooManyUniqValuesError

    events_table.agg_guard("event_type")  # 5 groups, fine
    with pytest.raises(TooManyUniqValuesError):
        events_table.agg_guard("event_id", limit=10)
