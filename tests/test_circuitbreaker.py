"""Circuit breaker for the bulk path (`network/circuitbreaker/
circuitbreaker.go` + README) and the `--search-requests-limit` admission
gate."""

import json
import os

import pytest

from seqspark.circuitbreaker import (
    CLOSED,
    HALF_OPEN,
    OPEN,
    CircuitBreaker,
    CircuitOpenError,
)


def make_clock(start=0.0):
    state = {"t": start}

    def advance(dt):
        state["t"] += dt

    return (lambda: state["t"]), advance


def breaker(clock, **kw):
    kw.setdefault("num_buckets", 10)
    kw.setdefault("bucket_width_s", 1.0)
    kw.setdefault("request_volume_threshold", 15)
    kw.setdefault("error_threshold_percentage", 50)
    kw.setdefault("sleep_window_s", 5.0)
    return CircuitBreaker(clock=clock, **kw)


def test_volume_gate_keeps_circuit_closed():
    # README scenario 1: 10 requests, 5 failed — under the volume threshold
    # of 15, so even a 50% error rate must NOT open the circuit
    clock, advance = make_clock()
    cb = breaker(clock)
    for i in range(10):
        cb.record(i % 2 == 0)
        advance(1.0)
    assert cb.state == CLOSED and cb.allow()


def test_opens_past_volume_and_error_thresholds():
    # README scenario 2: 17 requests with 10 failures → 59% > 50% → open
    clock, _ = make_clock()
    cb = breaker(clock)
    for ok in [True] * 7 + [False] * 10:
        cb.record(ok)
    assert cb.state == OPEN
    assert not cb.allow()
    with pytest.raises(CircuitOpenError):
        cb.execute(lambda: 1)


def test_half_open_probe_closes_on_success():
    clock, advance = make_clock()
    cb = breaker(clock)
    for _ in range(15):
        cb.record(False)
    assert cb.state == OPEN
    advance(5.0)  # sleep window elapses → one probe allowed
    assert cb.state == HALF_OPEN
    probe = cb.allow()
    assert probe
    assert not cb.allow()  # only one half-open attempt
    cb.record(True, probe)  # probe succeeds → closed, window reset
    assert cb.state == CLOSED
    assert cb.allow()


def test_half_open_probe_reopens_on_failure():
    clock, advance = make_clock()
    cb = breaker(clock)
    for _ in range(15):
        cb.record(False)
    advance(5.0)
    probe = cb.allow()
    assert probe
    cb.record(False, probe)  # probe fails → sleep window restarts
    assert cb.state == OPEN
    assert not cb.allow()
    advance(5.0)
    assert cb.allow()  # next probe after another full sleep window


def test_straggler_success_does_not_close_open_circuit():
    # a request admitted while CLOSED that completes after the trip must
    # NOT act as the half-open probe: only the token granted by allow()
    # during HALF_OPEN may close the circuit (hystrix semantics)
    clock, advance = make_clock()
    cb = breaker(clock)
    straggler = cb.allow()  # admitted while closed (returns True)
    for _ in range(15):
        cb.record(False)
    assert cb.state == OPEN
    cb.record(True, straggler)  # in-flight success lands after the trip
    assert cb.state == OPEN  # sleep window NOT bypassed
    assert not cb.allow()
    advance(5.0)
    probe = cb.allow()
    cb.record(True)  # token-less straggler during HALF_OPEN: also ignored
    assert cb.state != CLOSED
    cb.record(True, probe)  # the granted probe decides
    assert cb.state == CLOSED


def test_stale_probe_token_from_prior_window_is_ignored():
    clock, advance = make_clock()
    cb = breaker(clock)
    for _ in range(15):
        cb.record(False)
    advance(5.0)
    stale = cb.allow()  # probe #1 granted...
    cb.record(False, stale)  # ...fails → re-open, window restarts
    advance(5.0)
    probe2 = cb.allow()
    cb.record(True, stale)  # late duplicate from probe #1: ignored
    assert cb.state != CLOSED
    cb.record(True, probe2)
    assert cb.state == CLOSED


def test_old_buckets_roll_out_of_window():
    clock, advance = make_clock()
    cb = breaker(clock, request_volume_threshold=5)
    for _ in range(4):
        cb.record(False)
    advance(20.0)  # failures age out of the 10s rolling window
    for _ in range(4):
        cb.record(True)
    cb.record(False)  # 1/5 failures = 20% < 50% → stays closed
    assert cb.state == CLOSED


def test_execute_records_and_propagates():
    clock, _ = make_clock()
    cb = breaker(clock, request_volume_threshold=1)
    assert cb.execute(lambda: 42) == 42
    for _ in range(2):
        with pytest.raises(RuntimeError):
            cb.execute(_boom)
    assert cb.state == OPEN  # 2/3 ≈ 67% > 50%


def _boom():
    raise RuntimeError("boom")


def test_server_bulk_breaker_and_search_limit(spark, tmp_path):
    from seqspark import Mapping
    from seqspark.ingest import ingest_docs
    from seqspark.server import SeqSparkServer
    from seqspark.store import DocStore
    import urllib.request
    import urllib.error

    mapping = Mapping({"service": "keyword"})
    store = DocStore(spark, os.path.join(str(tmp_path), "store"))
    store.append(
        ingest_docs(
            spark.createDataFrame([('{"service": "a"}',)], "raw string"),
            mapping,
        )
    )
    cb = CircuitBreaker(
        request_volume_threshold=2,
        error_threshold_percentage=50,
        sleep_window_s=3600.0,
    )
    srv = SeqSparkServer(
        spark, store, mapping, bulk_breaker=cb, max_inflight_searches=0
    ).start()

    def post(path, payload=b"{}"):
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}{path}", data=payload
        )
        try:
            with urllib.request.urlopen(req) as r:
                return r.status
        except urllib.error.HTTPError as e:
            return e.code

    try:
        # force bulk failures below the HTTP layer
        def failing_bulk(body, gzipped):
            raise RuntimeError("store down")

        srv.bulk = failing_bulk
        assert post("/_bulk", b'{"index":{}}\n{}\n') == 500
        assert post("/_bulk", b'{"index":{}}\n{}\n') == 500
        # 2 failures of 2 ≥ volume threshold and 100% > 50% → open → shed
        assert post("/_bulk", b'{"index":{}}\n{}\n') == 503
        # search admission gate: zero slots → 429 before any Spark work
        assert post("/search", b'{"query": "*"}') == 429
    finally:
        srv.stop()


def test_breaker_exact_threshold_is_not_over():
    # fails/total == threshold% must stay closed (strict > comparison,
    # `hystrix.ConfigureOpener.ErrorThresholdPercentage` semantics)
    clock, _ = make_clock()
    cb = breaker(clock, request_volume_threshold=2)
    cb.record(True)
    cb.record(False)  # 50% == 50% → closed
    assert cb.state == CLOSED
    cb.record(False)  # 2/3 = 66% > 50% → open
    assert cb.state == OPEN
