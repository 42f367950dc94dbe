"""Store mutation generations + the server's generation-keyed SearchTable
memo (r18): the serving layer reuses one table across requests and
rebuilds exactly when the store changed — append, compact, retention,
rotation, index arm/disarm, cold-tier reachability. Freshness is the
invariant: a bulk acked before a request must be visible to it."""

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from seqspark import Mapping
from seqspark.ingest import ingest_docs
from seqspark.server import SeqSparkServer
from seqspark.store import DocStore, TieredStore

MAPPING = Mapping({"service": "keyword", "message": "text"})
BIG = 10**15


@pytest.fixture()
def tmp(tmp_path):
    return str(tmp_path)


def _docs_df(spark, rows):
    return ingest_docs(
        spark.createDataFrame([(json.dumps(d),) for d in rows], "raw string"),
        MAPPING, allowed_drift_ms=BIG, future_drift_ms=BIG,
    )


def _doc(day, hour, service="auth", msg="hello world"):
    return {"timestamp": f"2024-01-0{day} {hour:02d}:00:00.000",
            "service": service, "message": msg}


def test_generation_bumps_on_every_mutation(spark, tmp):
    store = DocStore(spark, os.path.join(tmp, "store"))
    g0 = store.generation
    store.append(_docs_df(spark, [_doc(1, 1), _doc(1, 2)]))
    g1 = store.generation
    assert g1 > g0
    # second append to the same bucket so compact has >1 file
    store.append(_docs_df(spark, [_doc(1, 1, "pay")]))
    g2 = store.generation
    assert g2 > g1
    bucket = store.partitions()[0]
    store.compact(bucket)
    g3 = store.generation
    assert g3 > g2
    store.retain(min_bucket="2024-01-01-02")
    g4 = store.generation
    assert g4 > g3


def test_generation_is_shared_across_instances_on_one_path(spark, tmp):
    path = os.path.join(tmp, "store")
    a = DocStore(spark, path)
    b = DocStore(spark, path)
    before = b.generation
    a.append(_docs_df(spark, [_doc(2, 3)]))
    # instance b observes instance a's append (same-path counter, like
    # the write locks: a streaming ingest + a server over one path)
    assert b.generation > before


def test_tiered_generation_and_rotation(spark, tmp):
    hot = DocStore(spark, os.path.join(tmp, "hot"))
    cold = DocStore(spark, os.path.join(tmp, "cold"))
    tiered = TieredStore(hot, cold)
    g0 = tiered.generation
    tiered.append(_docs_df(spark, [_doc(1, h) for h in range(3)]))
    g1 = tiered.generation
    assert g1 > g0  # both tiers bumped
    out = tiered.maintain(hot_min_bucket="2024-01-01-01")
    assert out["hot_dropped"]
    assert tiered.generation > g1  # retention + tombstone persist


def test_server_table_memo_hits_and_rebuilds(spark, tmp):
    store = DocStore(spark, os.path.join(tmp, "store"))
    core = SeqSparkServer(
        spark, store, MAPPING,
        allowed_drift_ms=BIG, future_drift_ms=BIG,
        async_dir=os.path.join(tmp, "async"),
    )
    t1 = core._table()
    t2 = core._table()
    assert t1 is t2  # unchanged store: the SAME prepared table serves
    # a bulk through the real ingest path invalidates the memo...
    body = ('{"index":{}}\n' + json.dumps(_doc(1, 5, "fresh")) + "\n").encode()
    core.bulk(body, gzipped=False)
    t3 = core._table()
    assert t3 is not t2
    # ...and the fresh doc is visible to the very next search
    out = core.search({"query": "service:fresh", "size": 10})
    assert len(out["docs"]) == 1
    # compaction through any instance over the path invalidates too
    store.append(_docs_df(spark, [_doc(1, 5, "other")]))
    t4 = core._table()
    bucket = store.partitions()[0]
    store.compact(bucket)
    assert core._table() is not t4
    # post-compact searches serve the swapped-in files without error
    out = core.search({"query": "service:fresh", "size": 10})
    assert len(out["docs"]) == 1
    core._httpd.server_close()


def test_server_table_memo_transient_invalidate(spark, tmp):
    store = DocStore(spark, os.path.join(tmp, "store"))
    store.append(_docs_df(spark, [_doc(1, 1)]))
    core = SeqSparkServer(
        spark, store, MAPPING,
        allowed_drift_ms=BIG, future_drift_ms=BIG,
        async_dir=os.path.join(tmp, "async"),
    )
    st = core._table()
    assert core._st_memo is not None
    # a transient read failure must drop the memo before the replan:
    # the retried build then pins a FRESH listing
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("FAILED_READ_FILE: raced a compaction swap")
        return "ok"

    assert core._retry_transient(flaky) == "ok"
    assert core._st_memo is None
    assert core._table() is not st
    core._httpd.server_close()


def test_route_is_thread_local(spark, tmp):
    store = DocStore(spark, os.path.join(tmp, "store"))
    store.append(_docs_df(spark, [_doc(1, 1)]))
    st = store.search_table(MAPPING)
    st.search("service:auth", size=5)
    assert st.route == "scan"
    seen = {}

    def other():
        # a thread that never searched sees None, not this thread's route
        seen["route"] = st.route

    t = threading.Thread(target=other)
    t.start()
    t.join()
    assert seen["route"] is None
    assert st.route == "scan"
