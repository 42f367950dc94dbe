"""CLI entry point (`python -m seqspark`) — the seq-db binary analog:
reference flag names, Go duration/size syntax, HTTP + gRPC + maintenance
loop over one engine."""

import json
import time
import urllib.request

import pytest

from seqspark.__main__ import build_parser, duration_ms, main, size_bytes


def test_duration_and_size_parsers():
    assert duration_ms("24h") == 86_400_000
    assert duration_ms("5m") == 300_000
    assert duration_ms("1h30m") == 5_400_000
    assert duration_ms("500ms") == 500
    assert size_bytes("128MB") == 128_000_000
    assert size_bytes("1GiB") == 2**30
    assert size_bytes("4096") == 4096
    with pytest.raises(Exception):
        duration_ms("fortnight")
    with pytest.raises(Exception):
        size_bytes("12 parsecs")


def test_parser_defaults_match_reference():
    """`cmd/seq-db/flags.go` defaults: drift 24h/5m, total-size 1GB,
    search-fraction-limit 6000, legacy dialect unless opted in."""
    a = build_parser().parse_args(
        ["--data-dir", "/tmp/x", "--mapping", "auto"]
    )
    assert a.allowed_time_drift == 86_400_000
    assert a.future_allowed_time_drift == 300_000
    assert a.total_size == 1_000_000_000
    assert a.search_fraction_limit == 6000
    assert a.use_seq_ql_by_default is False
    assert a.log_bulk_threshold_ms == 0
    assert a.log_fetch_threshold_ms == 3000


def _post(port, path, body, headers=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body, headers=headers or {}
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_cli_serves_end_to_end(spark, tmp_path):
    """Boot via main() with reference-shaped flags: bulk over HTTP,
    legacy-dialect default search, gRPC status, mapping reload wired,
    maintenance loop compacts + rotates."""
    mapping_file = tmp_path / "mapping.yaml"
    mapping_file.write_text(
        "mapping-list:\n"
        "  - {name: service, type: keyword}\n"
        "  - {name: message, type: text}\n"
    )
    rt = main(
        [
            "--data-dir", str(tmp_path / "store"),
            "--mapping", str(mapping_file),
            "--enable-mapping-updates",
            "--mapping-update-period", "100ms",
            "--allowed-time-drift", "100000d",
            "--future-allowed-time-drift", "100000d",
            "--maintenance-period", "500ms",
            # threshold 1: compact any bucket with >=2 files. Group
            # commit can coalesce the 4 bulks into as few as 2 appends
            # (or 1), so a higher threshold may simply never trip and
            # the file-count==1 wait below times out (seen flaking when
            # the suite runs under load)
            "--max-files-per-partition", "1",
            "--es-version", "8.12.0",
        ],
        spark=spark,
        block=False,
    )
    try:
        for i in range(4):  # several small appends → compactable bucket
            # docs must be DISTINCT: identical content at the same
            # timestamp can synthesize colliding (mid, rid) ids, which
            # the engine (correctly) dedups at read
            code, body = _post(
                rt.http.port, "/_bulk",
                b'{"index": {}}\n'
                b'{"timestamp": "2024-01-01 10:00:0%d.000", "service": '
                b'"auth", "message": "login ok %d"}\n' % (i, i),
            )
            assert code == 200 and not body["errors"]
        # legacy dialect is the CLI default (`--use-seq-ql-by-default`
        # absent): an uppercase-AND legacy query parses; seq-ql opt-in
        # works per request via the header
        code, res = _post(rt.http.port, "/search", json.dumps(
            {"query": "service:auth AND message:login"}).encode())
        assert code == 200 and len(res["docs"]) == 4
        code, res = _post(
            rt.http.port, "/search",
            json.dumps({"query": "service:auth and message:login"}).encode(),
            headers={"use-seq-ql": "true"},
        )
        assert code == 200 and len(res["docs"]) == 4
        # banner carries --es-version
        with urllib.request.urlopen(
            f"http://127.0.0.1:{rt.http.port}/", timeout=30
        ) as r:
            assert json.loads(r.read())["version"]["number"] == "8.12.0"
        # gRPC transport is live
        from seqspark.wire import seqproxy as sp
        from seqspark.wire.grpc import GrpcChannel

        ch = GrpcChannel("127.0.0.1", rt.grpc.port)
        try:
            st = ch.unary("/seqproxyapi.v1.SeqProxyApi/Status", {},
                          sp.STATUS_REQUEST, sp.STATUS_RESPONSE)
            assert st["number_of_stores"] == 1
        finally:
            ch.close()
        # live mapping reload: a field added to the YAML becomes
        # searchable without restart (watcher period 100ms)
        mapping_file.write_text(
            "mapping-list:\n"
            "  - {name: service, type: keyword}\n"
            "  - {name: message, type: text}\n"
            "  - {name: trace_id, type: keyword}\n"
        )
        deadline = time.time() + 10
        code = 400
        while time.time() < deadline and code == 400:
            code, _ = _post(rt.http.port, "/search", json.dumps(
                {"query": "trace_id:x"}).encode())
            time.sleep(0.1)
        assert code == 200
        # maintenance loop sealed the bucket (4 append files → 1)
        deadline = time.time() + 20
        bucket = rt.store.partitions()[0]
        while time.time() < deadline:
            if rt.store.partition_file_count(bucket) == 1:
                break
            time.sleep(0.25)
        assert rt.store.partition_file_count(bucket) == 1
    finally:
        rt.stop()


def test_cli_tiered_store_rotation(spark, tmp_path):
    """--long-term-dir wires the hot/cold TieredStore; the maintenance
    loop rotates hot buckets past --total-size WITH tombstones (via
    TieredStore.maintain), and full history stays readable through the
    cold tier."""
    mapping_file = tmp_path / "mapping.yaml"
    mapping_file.write_text(
        "mapping-list:\n  - {name: service, type: keyword}\n"
    )
    rt = main(
        [
            "--data-dir", str(tmp_path / "hot"),
            "--long-term-dir", str(tmp_path / "cold"),
            "--mapping", str(mapping_file),
            "--allowed-time-drift", "100000d",
            "--future-allowed-time-drift", "100000d",
            "--maintenance-period", "500ms",
            "--total-size", "1",  # any hot byte is over budget → rotate
        ],
        spark=spark,
        block=False,
    )
    try:
        assert hasattr(rt.store, "hot")  # tiered wiring
        lines = []
        for h in (10, 11, 12):
            lines.append('{"index": {}}')
            lines.append(json.dumps({
                "timestamp": f"2024-01-01 {h}:00:00.000",
                "service": f"svc{h}",
            }))
        code, body = _post(rt.http.port, "/_bulk",
                           "\n".join(lines).encode())
        assert code == 200 and not body["errors"]
        # rotation drops hot buckets (total-size 1 byte) within a few
        # maintenance periods; tombstones hand ownership to cold
        deadline = time.time() + 30
        while time.time() < deadline and rt.store.hot.partitions():
            time.sleep(0.25)
        assert rt.store.hot.partitions() == []
        assert len(rt.store._rotated) == 3  # tombstoned, not forgotten
        # full history still served — through the cold tier
        code, res = _post(rt.http.port, "/search",
                          json.dumps({"query": "*", "with_total": True,
                                      "dialect": "seqql"}).encode())
        assert code == 200 and res["total"] == 3
        assert "partial_response" not in res  # healthy tiers: not partial
    finally:
        rt.stop()


def test_cli_doc_bloom_at_reaches_both_tiers(spark, tmp_path):
    """--doc-bloom-at plumbs through to the DocStore(s): 'seal' on a
    tiered launch configures hot AND cold; default is 'always'."""
    from seqspark.__main__ import main

    rt = main(
        ["--data-dir", str(tmp_path / "hot"),
         "--long-term-dir", str(tmp_path / "cold"),
         "--mapping", "auto", "--doc-bloom-at", "seal",
         "--addr", "127.0.0.1:0", "--proxy-grpc-addr", "127.0.0.1:0"],
        spark=spark, block=False)
    try:
        assert rt.store.hot.bloom_at == "seal"
        assert rt.store.cold.bloom_at == "seal"
    finally:
        rt.stop()
    rt = main(
        ["--data-dir", str(tmp_path / "hot2"), "--mapping", "auto",
         "--addr", "127.0.0.1:0", "--proxy-grpc-addr", "127.0.0.1:0"],
        spark=spark, block=False)
    try:
        assert rt.store.bloom_at == "always"
    finally:
        rt.stop()


def test_cli_arrow_byte_cap_reaches_session(tmp_path):
    """--arrow-max-bytes-per-batch (r18): the CLI session builder caps
    Arrow batches by BYTES (multimodal mapInArrow stages carry multi-MB
    assets; a rows-only cap can let one batch hold GBs). Default 64MiB,
    overridable. getOrCreate applies runtime confs to an existing
    session too, which is what this asserts through."""
    from pyspark.sql import SparkSession

    from seqspark.__main__ import build_parser, main

    KEY = "spark.sql.execution.arrow.maxBytesPerBatch"
    assert build_parser().get_default("arrow_max_bytes_per_batch") == 64 * 2**20

    active = SparkSession.getActiveSession()
    saved = active.conf.get(KEY, None) if active else None
    rt = main(
        ["--data-dir", str(tmp_path / "store"), "--mapping", "auto",
         "--addr", "127.0.0.1:0", "--proxy-grpc-addr", "127.0.0.1:0",
         "--arrow-max-bytes-per-batch", "16MiB"],
        spark=None, block=False)
    try:
        assert rt.spark.conf.get(KEY) == str(16 * 2**20)
    finally:
        rt.stop()
        if saved is not None:
            rt.spark.conf.set(KEY, saved)
        else:
            rt.spark.conf.unset(KEY)
