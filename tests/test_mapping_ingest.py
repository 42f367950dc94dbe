"""Mapping YAML + object/tags/nested/multi-type ingest parity, mirroring the
reference scenarios (`tests/integration_tests/single_test.go:190`
TestSearchNestedWithAND, `integration_test.go:1773,1825` multi-type fields,
`seq/mapping.go` mapping compilation)."""

import json

import pytest
from pyspark.sql import functions as F

from seqspark import Mapping, SearchTable
from seqspark.ingest import ingest_docs

YAML_OBJ = {
    "mapping-list": [
        {"name": "service", "type": "keyword"},
        {"name": "request_uri", "type": "path"},
        {
            "name": "message",
            "types": [
                {"type": "text"},
                {"title": "keyword", "type": "keyword", "size": 18},
            ],
        },
        {
            "name": "someobj",
            "type": "object",
            "mapping-list": [
                {"name": "inner", "type": "keyword"},
                {"name": "innertext", "type": "text"},
            ],
        },
        {
            "name": "labels",
            "type": "tags",
            "mapping-list": [{"name": "env", "type": "keyword"}],
        },
        {
            "name": "items",
            "type": "nested",
            "mapping-list": [
                {"name": "kind", "type": "keyword"},
                {"name": "state", "type": "keyword"},
            ],
        },
    ]
}


@pytest.fixture(scope="module")
def mapping():
    return Mapping.from_yaml_obj(YAML_OBJ)


def make_docs(spark, docs):
    return spark.createDataFrame([(json.dumps(d),) for d in docs], "raw string")


def ingest(spark, mapping, docs):
    ingest_ts = F.to_timestamp(F.lit("2024-01-01 12:00:00"))
    return ingest_docs(make_docs(spark, docs), mapping, ingest_ts=ingest_ts)


def test_yaml_index_types(mapping):
    assert mapping.index_type("service") == "keyword"
    assert mapping.index_type("request_uri") == "path"
    assert mapping.index_type("message") == "text"
    assert mapping.index_type("message.keyword") == "keyword"
    assert mapping.index_type("someobj.inner") == "keyword"
    assert mapping.index_type("someobj.innertext") == "text"
    assert mapping.index_type("labels.env") == "keyword"
    assert mapping.index_type("items.kind") == "keyword"
    assert mapping.index_type("not_mapped") is None


def test_object_dotted_field(spark, mapping):
    frame = ingest(spark, mapping, [{"someobj": {"inner": "ABC", "innertext": "x y"}}])
    st = SearchTable.from_docs(frame, mapping)
    assert st.search("someobj.inner:abc").count() == 1
    assert st.search("someobj.innertext:y").count() == 1
    assert st.search("someobj.inner:zzz").count() == 0


def test_multi_type_title_field(spark, mapping):
    frame = ingest(spark, mapping, [{"message": "Hello Brave World"}])
    st = SearchTable.from_docs(frame, mapping)
    # text main type: per-token match
    assert st.search("message:brave").count() == 1
    # keyword sub-field: whole (folded) value
    assert st.search("message.keyword:'hello brave world'").count() == 1
    assert st.search("message.keyword:brave").count() == 0


def test_multi_type_size_cap(spark, mapping):
    # keyword sub-type has size: 18 — longer values are not keyword-indexed
    long_msg = "exceedingly long message value"  # 30 chars > 18
    frame = ingest(spark, mapping, [{"message": long_msg}])
    st = SearchTable.from_docs(frame, mapping)
    assert st.search("message:exceedingly").count() == 1
    assert st.search(f"message.keyword:'{long_msg}'").count() == 0


def test_path_prefix_search(spark, mapping):
    frame = ingest(spark, mapping, [{"request_uri": "/api/v1/users"}])
    st = SearchTable.from_docs(frame, mapping)
    assert st.search("request_uri:'/api'").count() == 1
    assert st.search("request_uri:'/api/v1'").count() == 1
    assert st.search("request_uri:'/api/v1/users'").count() == 1
    assert st.search("request_uri:'/api/v2'").count() == 0


def test_tags_indexing(spark, mapping):
    frame = ingest(
        spark,
        mapping,
        [
            {"labels": [{"key": "env", "value": "Prod"}], "service": "a"},
            {"labels": [{"key": "env", "value": "dev"}], "service": "b"},
            {"labels": [{"key": "other", "value": "x"}], "service": "c"},
        ],
    )
    st = SearchTable.from_docs(frame, mapping)
    assert st.search("labels.env:prod").count() == 1
    assert st.search("labels.env:dev").count() == 1
    assert st.search("_exists_:labels.env").count() == 2


def test_nested_element_scoped_and(spark, mapping):
    # the defining nested behavior: AND across sibling fields matches only
    # within ONE array element (single_test.go:190)
    docs = [
        {"service": "s1", "items": [{"kind": "a", "state": "ok"}, {"kind": "b", "state": "bad"}]},
        {"service": "s2", "items": [{"kind": "a", "state": "bad"}, {"kind": "b", "state": "ok"}]},
    ]
    frame = ingest(spark, mapping, docs)
    st = SearchTable.from_docs(frame, mapping)
    assert st.search("items.kind:a and items.state:ok").count() == 1
    assert st.search("items.kind:a and items.state:bad").count() == 1
    assert st.search("items.kind:b and items.state:ok").count() == 1
    # parent fields AND nested fields still combine
    assert st.search("service:s1 and items.kind:a and items.state:ok").count() == 1
    assert st.search("service:s2 and items.kind:a and items.state:ok").count() == 0
    # no double counting: each parent doc matches at most once
    assert st.search("items.kind:a").count() == 2


def test_nested_child_rows_share_id(spark, mapping):
    frame = ingest(spark, mapping, [{"items": [{"kind": "a"}, {"kind": "b"}]}])
    rows = frame.select("mid", "rid", "size").collect()
    assert len(rows) == 3  # parent + 2 children
    assert len({(r["mid"], r["rid"]) for r in rows}) == 1
    assert sorted(r["size"] for r in rows)[0:2] == [0, 0]


def test_auto_mapping_indexes_everything(spark):
    from seqspark import AutoMapping

    frame = ingest(spark, AutoMapping(), [{"anything": "X", "num": 5}])
    # every top-level field keyword-tokenized under its own name, numbers
    # as their literal text (`proxy/bulk/indexer.go:67-76` nil mapping)
    row = frame.collect()[0]
    toks = dict(row["tokens"])
    assert toks["anything"] == ["x"]
    assert toks["num"] == ["5"]


def test_auto_mapping_value_rendering(spark):
    """encodeInsaneNode parity (`proxy/bulk/indexer.go:169-177`): bools,
    nulls and containers index as their JSON text; integers keep their
    literal digits."""
    from seqspark import AutoMapping

    frame = ingest(
        spark, AutoMapping(),
        [{"b": True, "z": None, "o": {"x": 1}, "arr": [1, 2], "n": 4130134}],
    )
    toks = dict(frame.collect()[0]["tokens"])
    assert toks["b"] == ["true"]
    assert toks["z"] == ["null"]
    assert toks["o"] == ['{"x":1}']
    assert toks["arr"] == ["[1,2]"]
    assert toks["n"] == ["4130134"]


# ------------------------------------------------- live mapping updates

INITIAL_YAML = """mapping-list:
  - name: "k8s_pod"
    type: "keyword"
"""

CHANGED_YAML = """mapping-list:
  - name: "k8s_pod"
    type: "keyword"
  - name: "trace_id"
    type: "keyword"
"""


def test_mapping_provider_reload_semantics(tmp_path):
    """Mirror of the reference's TestMappingProvider
    (`mappingprovider/mapping_provider_test.go`): a changed file swaps
    the mapping; an unchanged checksum, a bad file and a missing file are
    all no-ops that keep the previous mapping serving."""
    from seqspark import MappingProvider

    path = str(tmp_path / "mappings.yaml")
    with open(path, "w") as f:
        f.write(INITIAL_YAML)
    p = MappingProvider(path, update_period_s=0.05)
    assert p.get().index_type("k8s_pod") == "keyword"
    assert p.get().index_type("trace_id") is None

    fired = []
    p.subscribe(lambda: fired.append(1))
    assert p.reload() is False  # unchanged checksum: no swap, no callback
    assert not fired

    with open(path, "w") as f:
        f.write(CHANGED_YAML)
    assert p.reload() is True
    assert p.get().index_type("trace_id") == "keyword"
    assert fired == [1]

    # a BAD new file is logged and ignored — the old mapping keeps serving
    with open(path, "w") as f:
        f.write("mapping-list: [{name: x, type: nosuchtype}]")
    assert p.reload() is False
    assert p.get().index_type("trace_id") == "keyword"

    # a missing file is likewise a no-op
    import os
    os.remove(path)
    assert p.reload() is False
    assert p.get().index_type("trace_id") == "keyword"


def test_mapping_provider_watcher_picks_up_change(tmp_path):
    """The WatchUpdates analog: the daemon thread applies a file change
    within a few periods (reference asserts EventuallyWithT)."""
    import time

    from seqspark import MappingProvider

    path = str(tmp_path / "mappings.yaml")
    with open(path, "w") as f:
        f.write(INITIAL_YAML)
    p = MappingProvider(path, update_period_s=0.05).watch()
    try:
        with open(path, "w") as f:
            f.write(CHANGED_YAML)
        deadline = time.time() + 5
        while time.time() < deadline:
            if p.get().index_type("trace_id") == "keyword":
                break
            time.sleep(0.05)
        assert p.get().index_type("trace_id") == "keyword"
    finally:
        p.stop()


def test_mapping_provider_modes(tmp_path):
    from seqspark import AutoMapping, Mapping, MappingProvider

    # index_all_fields never touches the file
    p = MappingProvider(index_all_fields=True)
    assert isinstance(p.get(), AutoMapping)
    # pinned mapping, no file read
    p2 = MappingProvider(mapping=Mapping({"a": "keyword"}))
    assert p2.get().index_type("a") == "keyword"
    # missing everything is a configuration error
    with pytest.raises(ValueError):
        MappingProvider()
    # a broken INITIAL file propagates (initMapping semantics)
    bad = str(tmp_path / "bad.yaml")
    with open(bad, "w") as f:
        f.write("mapping-list: [{name: x, type: nosuchtype}]")
    with pytest.raises(Exception):
        MappingProvider(bad)


def test_server_applies_mapping_update_without_restart(spark, tmp_path):
    """End to end over HTTP: a field added to the mapping file becomes
    searchable and ingest-indexed after a reload — no server restart.
    Before the swap, querying it is the reference's parse error."""
    import urllib.request

    from seqspark import MappingProvider
    from seqspark.server import SeqSparkServer
    from seqspark.store import DocStore

    path = str(tmp_path / "mappings.yaml")
    with open(path, "w") as f:
        f.write(INITIAL_YAML)
    provider = MappingProvider(path, update_period_s=3600)  # manual reload
    store = DocStore(spark, str(tmp_path / "store"))
    srv = SeqSparkServer(
        spark, store, provider,
        allowed_drift_ms=10**15, future_drift_ms=10**15,
    ).start()

    def post(p, body):
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}{p}", data=body)
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        bulk = (
            '{"index": {}}\n'
            '{"timestamp": "2024-01-01 10:00:00.000", "k8s_pod": "p1",'
            ' "trace_id": "t1"}\n'
        ).encode()
        assert post("/_bulk", bulk)[0] == 200
        code, _ = post("/search", b'{"query": "k8s_pod:p1"}')
        assert code == 200
        code, err = post("/search", b'{"query": "trace_id:t1"}')
        assert code == 400 and "not indexed" in err["error"]

        with open(path, "w") as f:
            f.write(CHANGED_YAML)
        assert provider.reload() is True

        # the new field resolves for search AND the next bulk indexes it
        code, res = post("/search", b'{"query": "trace_id:t1"}')
        assert code == 200
        # the pre-swap doc was ingested under the OLD mapping: trace_id
        # was not tokenized then (reference: unmapped fields are skipped
        # at indexing), so re-ship the doc post-swap
        assert post("/_bulk", bulk)[0] == 200
        code, res = post("/search", b'{"query": "trace_id:t1"}')
        assert code == 200 and len(res["docs"]) == 1
    finally:
        srv.stop()


def test_server_does_not_auto_watch_provider(spark, tmp_path):
    """Updates are gated by the OWNER starting the watcher (the CLI's
    --enable-mapping-updates; the reference default is disabled): a
    server over a provider must not reload the file on its own."""
    import time

    from seqspark import MappingProvider
    from seqspark.server import SeqSparkServer
    from seqspark.store import DocStore

    path = str(tmp_path / "mappings.yaml")
    with open(path, "w") as f:
        f.write(INITIAL_YAML)
    provider = MappingProvider(path, update_period_s=0.05)
    srv = SeqSparkServer(
        spark, DocStore(spark, str(tmp_path / "store")), provider,
        allowed_drift_ms=10**15, future_drift_ms=10**15,
    )
    with open(path, "w") as f:
        f.write(CHANGED_YAML)
    time.sleep(0.5)  # many periods — nothing should fire
    assert srv.mapping.index_type("trace_id") is None
    # explicit reload still applies (and the server sees it immediately)
    assert provider.reload() is True
    assert srv.mapping.index_type("trace_id") == "keyword"
