"""DocStore + Structured Streaming + async search, mirroring the reference's
Active/Sealed/Restarted parity suite (`tests/suites/single.go:96-120`) and
rotation/retention (`fracmanager/fracmanager.go:106-148`)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from seqspark import Mapping, SearchTable
from seqspark.ingest import ingest_docs
from seqspark.store import DocStore
from seqspark.streaming import AsyncSearcher, stream_ingest

MAPPING = Mapping({"service": "keyword", "message": "text"})
BIG = 10**15

DOCS = [
    {"timestamp": f"2024-01-0{d} 0{h}:00:00.000", "service": s, "message": f"msg {s} {h}"}
    for d in (1, 2, 3)
    for h in range(3)
    for s in ("auth", "pay")
]


@pytest.fixture()
def tmp(tmp_path):
    return str(tmp_path)


def write_ndjson(path, docs):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")


def streamed_store(spark, tmp):
    indir = os.path.join(tmp, "in")
    write_ndjson(os.path.join(indir, "docs.ndjson"), DOCS)
    store = DocStore(spark, os.path.join(tmp, "store"))
    q = stream_ingest(
        spark, indir, store, MAPPING, os.path.join(tmp, "ckpt"),
        allowed_drift_ms=BIG, future_drift_ms=BIG,
    )
    q.awaitTermination(120)
    return store


def test_stream_equals_batch(spark, tmp):
    store = streamed_store(spark, tmp)
    streamed = SearchTable.from_docs(store.read(), MAPPING)
    batch_frame = ingest_docs(
        spark.createDataFrame([(json.dumps(d),) for d in DOCS], "raw string"),
        MAPPING,
        allowed_drift_ms=BIG,
        future_drift_ms=BIG,
    )
    batch = SearchTable.from_docs(batch_frame, MAPPING)
    for q in ("service:auth", "message:pay", "*", "service:auth and message:msg"):
        assert streamed.search(q).count() == batch.search(q).count(), q


def test_checkpoint_replay_no_duplicates(spark, tmp):
    store = streamed_store(spark, tmp)
    n1 = store.read().count()
    # restart the stream with the same checkpoint — nothing new to ingest
    q2 = stream_ingest(
        spark, os.path.join(tmp, "in"), store, MAPPING, os.path.join(tmp, "ckpt"),
        allowed_drift_ms=BIG, future_drift_ms=BIG,
    )
    q2.awaitTermination(120)
    assert store.read().count() == n1


def test_partitioned_layout_and_time_pruning(spark, tmp):
    store = streamed_store(spark, tmp)
    assert len(store.partitions()) == 9  # 3 days x 3 hours
    st = SearchTable.from_docs(store.read(), MAPPING)
    # 2024-01-02 window only
    n = st.search("service:auth", from_ms=1704153600000, to_ms=1704239999999).count()
    assert n == 3


def test_retention_by_age_and_size(spark, tmp):
    store = streamed_store(spark, tmp)
    parts = store.partitions()
    dropped = store.retain(min_bucket=parts[3])
    assert dropped == parts[:3]
    assert store.read().count() == len(DOCS) - 6
    dropped2 = store.retain(max_total_bytes=1)
    assert len(dropped2) == 6
    assert store.partitions() == []


def test_compaction_preserves_rows(spark, tmp):
    store = streamed_store(spark, tmp)
    bucket = store.partitions()[0]
    before = store.read().count()
    store.compact(bucket)
    assert store.read().count() == before


def test_async_search_lifecycle(spark, tmp):
    a = AsyncSearcher(spark, os.path.join(tmp, "async"))
    job = a.start(spark.range(5).toDF("x"), "demo-query", ttl_sec=3600)
    meta = a.status(job)
    assert meta["status"] == "done"
    assert meta["query"] == "demo-query"
    assert a.fetch(job).count() == 5
    assert a.status("missing") is None
    # expire with ttl 0 drops the job
    meta["ttl_sec"] = -1
    with open(os.path.join(tmp, "async", job, "meta.json"), "w") as f:
        json.dump(meta, f)
    assert job in a.expire()
    assert a.status(job) is None


def test_es_bulk_roundtrip(spark, tmp):
    from seqspark.bulk import bulk_to_df, parse_bulk_body

    body = "\n".join(
        [
            '{"index": {}}',
            '{"timestamp": "2024-01-01 10:00:00.000", "service": "auth", "message": "ok"}',
            '{"create": {}}',
            '{"timestamp": "2024-01-01 11:00:00.000", "service": "pay", "message": "paid"}',
            '{"delete": {"_id": "1"}}',
            '{"index": {}}',
            "[1, 2]",
        ]
    ).encode()
    res = parse_bulk_body(body)
    assert len(res.docs) == 2
    assert res.errors  # delete unsupported + non-object doc
    statuses = [list(i.values())[0]["status"] for i in res.items]
    assert statuses == [201, 201, 400, 400]
    df = bulk_to_df(spark, res)
    frame = ingest_docs(df, MAPPING, allowed_drift_ms=BIG, future_drift_ms=BIG)
    st = SearchTable.from_docs(frame, MAPPING)
    assert st.search("service:auth").count() == 1
    assert st.search("message:paid").count() == 1


def test_es_bulk_gzip(spark):
    import gzip

    from seqspark.bulk import parse_bulk_body

    body = b'{"index": {}}\n{"service": "a"}\n'
    res = parse_bulk_body(gzip.compress(body), gzipped=True)
    assert len(res.docs) == 1 and not res.errors
