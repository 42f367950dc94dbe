"""r16 (verdict #2): width-aware two-phase routing — SearchTable.search
picks the posting-page search→fetch plan (two_phase_search) over the
column scan when the index is attached with a width threshold, the query
is fully index-covered and bounded, and the average stored doc width
(parquet footers, zero jobs) clears the threshold. The reference's wire
architecture IS search→fetch (`proxy/search/ingestor.go:140-151`), so
the router must be reachable from every transport: engine, HTTP, gRPC.

Every precondition failure must fall back to the scan plan silently —
the router may only ever pick a plan, never change results or errors.
"""

import hashlib
import time
import json

import pytest
from pyspark.sql import functions as F

from seqspark import Mapping, SearchTable
from seqspark.engine import materialize_tokens
from seqspark.index import StoreIndex, build_inverted_index, collect_index_stats

BIG = 10**15


def _wide_table(spark, tmp_path, n=120):
    """Parquet-backed wide-doc table: ~1.5 KB incompressible body per row
    so the footer width probe sees a genuinely wide corpus."""
    rows = []
    for i in range(n):
        body = " ".join(
            hashlib.sha256(f"{i}:{j}".encode()).hexdigest() for j in range(24)
        )
        word = "alpha" if i % 12 == 0 else "beta"  # df 10/120 <= max_sel
        rows.append((1_700_000_000_000 + i * 1000, i, f"{word} {body}",
                     "even" if i % 2 == 0 else "odd"))
    spark.createDataFrame(
        rows, "mid long, rid long, text string, kind string"
    ).withColumn("ts", F.timestamp_millis(F.col("mid"))).write.parquet(
        str(tmp_path / "wide"))
    df = spark.read.parquet(str(tmp_path / "wide"))
    tok = materialize_tokens(df, {"text": "text"})
    idx = build_inverted_index(
        tok, {"text": "__tok_text", "kind": F.array(F.col("kind"))},
        id_cols=["mid", "rid"])
    stats = collect_index_stats(idx, total_docs=n)
    m = {"text": "text", "kind": "keyword"}
    return df, idx, stats, m


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_router_fires_and_matches_scan(spark, tmp_path):
    df, idx, stats, m = _wide_table(spark, tmp_path)

    def table(**kw):
        return SearchTable.from_typed(
            df, m, ts_col="ts", rid_col="rid", assume_folded=True,
        ).attach_index(idx, ["text", "kind"], ["mid", "rid"],
                       stats=stats, **kw)

    st_scan = table()                                  # routing off
    st = table(two_phase_min_doc_bytes=64)
    w = st.avg_doc_bytes()
    assert w is not None and w > 64  # the fixture really is wide
    out = st.search("text:alpha", size=10, offset=2, order="desc")
    want = [tuple(r) for r in st_scan.search(
        "text:alpha", size=10, offset=2, order="desc"
    ).select("mid", "rid").collect()]
    got = [tuple(r) for r in out.select("mid", "rid").collect()]
    assert got == want
    # the routed plan is the two-phase fetch: pushed per-value In on rid
    plan = _plan(out)
    i = plan.find("PushedFilters")
    assert i >= 0 and "In(rid" in plan[i:i + 300], plan[i:i + 300]
    assert "LeftSemi" not in plan  # not the in-plan semi-join route


def test_router_falls_back_silently(spark, tmp_path):
    df, idx, stats, m = _wide_table(spark, tmp_path)
    st = SearchTable.from_typed(
        df, m, ts_col="ts", rid_col="rid", assume_folded=True,
    ).attach_index(idx, ["text", "kind"], ["mid", "rid"], stats=stats,
                   two_phase_min_doc_bytes=64)
    st_scan = SearchTable.from_typed(
        df, m, ts_col="ts", rid_col="rid", assume_folded=True)

    def assert_scan(df_out):
        plan = _plan(df_out)
        i = plan.find("PushedFilters")
        assert "In(rid" not in (plan[i:i + 300] if i >= 0 else ""), plan

    # unbounded (export mode): no page to fetch
    assert_scan(st.search("text:alpha"))
    # residual conjunct: router requires full cover (refill is the
    # explicit two_phase_search API, not the silent default)
    assert_scan(st.search("text:alpha and not text:beta", size=5))
    # match-all: no covered conjunct
    assert_scan(st.search("*", size=5))
    # caller-supplied dedup override
    assert_scan(st.search("text:alpha", size=5, dedup_cols=["kind"]))
    # width below threshold
    st_narrow = SearchTable.from_typed(
        df, m, ts_col="ts", rid_col="rid", assume_folded=True,
    ).attach_index(idx, ["text", "kind"], ["mid", "rid"], stats=stats,
                   two_phase_min_doc_bytes=10**9)
    assert_scan(st_narrow.search("text:alpha", size=5))
    # no selective conjunct: every conjunct hotter than max_selectivity
    st_hot = SearchTable.from_typed(
        df, m, ts_col="ts", rid_col="rid", assume_folded=True,
    ).attach_index(idx, ["text", "kind"], ["mid", "rid"], stats=stats,
                   max_selectivity=0.001, two_phase_min_doc_bytes=64)
    assert_scan(st_hot.search("text:beta", size=5))
    # non-file-backed frame: width unknown -> never routes
    st_mem = SearchTable.from_typed(
        df.limit(50).cache(), m, ts_col="ts", rid_col="rid",
        assume_folded=True,
    ).attach_index(idx, ["text", "kind"], ["mid", "rid"], stats=stats,
                   two_phase_min_doc_bytes=1)
    res = st_mem.search("text:alpha", size=5)
    assert res.count() >= 0  # must not raise
    # results stay right on every fallback
    assert (st.search("text:alpha and not text:beta", size=5).count()
            == st_scan.search("text:alpha and not text:beta", size=5).count())


def test_transports_reach_two_phase(spark, tmp_path, monkeypatch):
    """HTTP and gRPC search must hit the two-phase plan on a wide corpus
    — and return exactly what an index-less server returns."""
    from seqspark.grpcapi import SeqProxyGrpc
    from seqspark.server import SeqSparkServer
    from seqspark.store import DocStore
    from seqspark.wire import seqproxy as sp
    from seqspark.wire.grpc import GrpcChannel

    mapping = Mapping({"service": "keyword", "message": "text"})
    store = DocStore(spark, str(tmp_path / "store"))
    lines = []
    for i in range(40):
        body = " ".join(
            hashlib.sha256(f"d{i}:{j}".encode()).hexdigest()
            for j in range(24))
        svc = "auth" if i % 8 == 0 else "pay"
        lines.append('{"index": {}}')
        lines.append(json.dumps({
            "timestamp": f"2024-01-01 10:00:{i:02d}.000",
            "service": svc, "message": f"login{i % 10} {body}"}))
    payload = "\n".join(lines).encode()

    core_plain = SeqSparkServer(
        spark, store, mapping, allowed_drift_ms=BIG, future_drift_ms=BIG)
    core_plain.bulk(payload, gzipped=False)

    sidx = StoreIndex(store, str(tmp_path / "index"),
                      {"message": F.col("tokens")["message"]})
    sidx.refresh()
    core = SeqSparkServer(
        spark, store, mapping, allowed_drift_ms=BIG, future_drift_ms=BIG,
        index=sidx, two_phase_min_doc_bytes=64)

    calls = []
    orig = SearchTable.two_phase_search

    def spy(self, *a, **k):
        calls.append((a, k))
        return orig(self, *a, **k)

    monkeypatch.setattr(SearchTable, "two_phase_search", spy)

    req = {"query": "message:login1", "size": 10}
    http = core.search(dict(req))
    assert calls, "HTTP search never reached two_phase_search"
    # observability: the route is counted (debug-server /metrics)
    assert core._counters["two_phase_searches_total"] == 1
    plain = core_plain.search(dict(req))
    assert core_plain._counters["two_phase_searches_total"] == 0
    assert http["docs"] == plain["docs"] and len(http["docs"]) == 4

    calls.clear()
    srv = SeqProxyGrpc(core).start()
    ch = GrpcChannel("127.0.0.1", srv.port)
    try:
        resp = ch.unary(
            "/seqproxyapi.v1.SeqProxyApi/Search",
            {"query": {"query": "message:login1",
                       "from": sp.ms_to_ts(0),
                       "to": sp.ms_to_ts(4102444800000)},
             "size": 10},
            sp.SEARCH_REQUEST, sp.SEARCH_RESPONSE,
        )
    finally:
        ch.close()
        srv.stop()
    assert calls, "gRPC search never reached two_phase_search"
    assert [json.loads(d["data"])["service"] for d in resp["docs"]] == [
        json.loads(d["data"])["service"] for d in plain["docs"]]

    # a query the router can't serve still works through the same server
    calls.clear()
    before = core._counters["two_phase_searches_total"]
    resid = core.search({"query": "message:login1 and not message:login2",
                         "size": 10})
    assert calls == [] and len(resid["docs"]) == 4
    assert core._counters["two_phase_searches_total"] == before

    # r16: keyset deep-paging routes too — cursor pages through the
    # routed table must equal the index-less table's pages exactly
    st_routed = core._table()
    st_plain = core_plain._table()
    calls.clear()
    cursor = None
    walked = 0
    while True:
        kw = {} if cursor is None else {
            "last_ts_ms": cursor[0], "last_rid": cursor[1]}
        want = [(r["mid"], r["rid"]) for r in st_plain.search_after(
            "message:login1", size=3, order="asc", **kw
        ).select("mid", "rid").collect()]
        got = [(r["mid"], r["rid"]) for r in st_routed.search_after(
            "message:login1", size=3, order="asc", **kw
        ).select("mid", "rid").collect()]
        assert got == want, cursor
        if cursor is not None:
            assert st_routed.route == "two_phase"
        walked += len(got)
        if not want:
            break
        cursor = want[-1]
    assert walked == 4 and calls, "cursor pages never routed"


def test_index_freshness_guard(spark, tmp_path):
    """r16: an attached index is AUTHORITATIVE (the semi-join drops docs
    it doesn't list), so a bulk landing after the last refresh must
    DISARM index routing — searches still see the new doc through the
    scan plan — and refresh_index() must re-arm it. A search served
    from a stale index would silently hide durable docs."""
    from seqspark.server import SeqSparkServer
    from seqspark.store import DocStore

    mapping = Mapping({"service": "keyword", "message": "text"})
    store = DocStore(spark, str(tmp_path / "store"))

    def bulk_lines(i):
        body = " ".join(
            hashlib.sha256(f"f{i}:{j}".encode()).hexdigest()
            for j in range(24))
        return ('{"index": {}}\n'
                + json.dumps({"timestamp": f"2024-01-01 10:00:{i:02d}.000",
                              "service": "auth",
                              "message": f"needle {body}"}))

    seed = SeqSparkServer(spark, store, mapping,
                          allowed_drift_ms=BIG, future_drift_ms=BIG)
    seed.bulk("\n".join(bulk_lines(i) for i in range(6)).encode(),
              gzipped=False)
    sidx = StoreIndex(store, str(tmp_path / "index"),
                      {"message": F.col("tokens")["message"]})
    sidx.refresh()
    core = SeqSparkServer(spark, store, mapping, allowed_drift_ms=BIG,
                          future_drift_ms=BIG, index=sidx,
                          two_phase_min_doc_bytes=1)
    # armed: the index serves (semi-join or two-phase — either way the
    # index frame is attached)
    assert core._table()._index is not None
    assert len(core.search({"query": "message:needle",
                            "size": 50})["docs"]) == 6
    # a bulk through THIS server disarms routing until refresh...
    core.bulk(bulk_lines(7).encode(), gzipped=False)
    assert core._index_fresh_seq != core._index_append_seq
    assert core._table()._index is None
    # ...and the new doc is searchable immediately (scan plan)
    assert len(core.search({"query": "message:needle",
                            "size": 50})["docs"]) == 7
    # refresh re-arms; the index now lists the new doc too
    assert core.refresh_index() is True
    assert core._table()._index is not None
    assert len(core.search({"query": "message:needle",
                            "size": 50})["docs"]) == 7


def test_cli_index_flag_end_to_end(spark, tmp_path):
    """--index-dir wires posting + two-phase routing into the binary
    analog: startup refresh covers pre-existing docs, searches route,
    and the maintenance loop's refresh_index re-arms after a bulk."""
    import urllib.request

    from seqspark.__main__ import main

    (tmp_path / "m.yaml").write_text(
        "mapping-list:\n"
        "  - {name: service, type: keyword}\n"
        "  - {name: message, type: text}\n")
    rt = main([
        "--data-dir", str(tmp_path / "data"),
        "--mapping", str(tmp_path / "m.yaml"),
        "--index-dir", str(tmp_path / "index"),
        "--two-phase-min-doc-bytes", "1",
        "--allowed-time-drift", "20000d",
        "--future-allowed-time-drift", "20000d",
        "--maintenance-period", "1s",
    ], spark=spark, block=False)
    try:
        def post(path, body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{rt.http.port}{path}", data=body)
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())

        body = " ".join(
            hashlib.sha256(f"c{j}".encode()).hexdigest() for j in range(24))
        lines = []
        for i in range(5):
            lines.append('{"index": {}}')
            lines.append(json.dumps(
                {"timestamp": f"2024-01-01 10:00:0{i}.000",
                 "service": "auth", "message": f"clineedle {body}"}))
        post("/_bulk", "\n".join(lines).encode())
        # new docs visible right away (scan while the index is stale)
        out = post("/search", json.dumps(
            {"query": "message:clineedle", "size": 10}).encode())
        assert len(out["docs"]) == 5
        # the maintenance loop re-arms index routing within a few periods
        deadline = time.time() + 30
        while time.time() < deadline:
            if rt.http._index_fresh_seq == rt.http._index_append_seq:
                break
            time.sleep(0.5)
        assert rt.http._index_fresh_seq == rt.http._index_append_seq
        out = post("/search", json.dumps(
            {"query": "message:clineedle", "size": 10}).encode())
        assert len(out["docs"]) == 5
        assert rt.http._table()._index is not None
    finally:
        rt.stop()


def test_tiered_store_index_follows_ownership(spark, tmp_path):
    """r16: a StoreIndex over a TieredStore indexes each bucket's
    AUTHORITATIVE copy (read_with_status's ownership rule). The killer
    case is the tombstone-recreate: after rotation drops a hot bucket, a
    late append re-creates it in hot with ONLY the new rows while cold
    holds everything — the index must build from cold, or pre-rotation
    docs silently vanish from routed searches."""
    from seqspark.server import SeqSparkServer
    from seqspark.store import DocStore, TieredStore

    mapping = Mapping({"service": "keyword", "message": "text"})
    hot = DocStore(spark, str(tmp_path / "hot"))
    cold = DocStore(spark, str(tmp_path / "cold"))
    store = TieredStore(hot, cold)

    def bulk(core, i, msg):
        core.bulk((
            '{"index": {}}\n' + json.dumps(
                {"timestamp": f"2024-01-0{i} 00:00:00.000",
                 "service": "auth", "message": msg})).encode(),
            gzipped=False)

    sidx = StoreIndex(store, str(tmp_path / "index"),
                      {"message": F.col("tokens")["message"]})
    core = SeqSparkServer(spark, store, mapping, allowed_drift_ms=BIG,
                          future_drift_ms=BIG, index=sidx,
                          two_phase_min_doc_bytes=10**12)
    for d in (1, 2, 3):
        bulk(core, d, f"needle old{d}")
    assert core.refresh_index() is True
    assert {r["mid"] for r in core.search(
        {"query": "message:needle", "size": 10})["docs"]} and len(
        core.search({"query": "message:needle", "size": 10})["docs"]) == 3
    # rotate EVERYTHING out of hot; cold keeps full history
    res = store.maintain(hot_max_total_bytes=0)
    assert res["hot_dropped"]
    # rotation changed ownership -> those buckets are stale, rebuild
    assert sidx.stale_buckets()
    assert core.refresh_index() is True
    assert len(core.search({"query": "message:needle",
                            "size": 10})["docs"]) == 3
    # tombstone-recreate: late append lands the bucket back in hot with
    # only the new row; cold owns it and holds all rows
    bulk(core, 1, "needle late")
    assert core.refresh_index() is True
    docs = core.search({"query": "message:needle", "size": 10})["docs"]
    assert len(docs) == 4  # 3 old + 1 late; nothing vanished
    owner = store.owner_store(store.partitions()[0])
    assert owner is cold  # tombstoned bucket stays cold-owned
    # the index itself lists all 4 docs (authoritative copies)
    assert sidx.read().filter(F.col("token") == "needle").count() == 4
