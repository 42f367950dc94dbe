"""Server request-latency probe (r18): how much of a repeated identical
HTTP search/complex request is per-request overhead.

Builds a DocStore with a few time buckets of docs, starts the HTTP
server, and measures (a) median end-to-end latency of repeated identical
``/search`` and ``/complex`` requests, (b) the driver-side cost of
``core._table()`` alone (the per-request SearchTable construction the
r17 verdict flagged at ~100-150 ms), and (c) a post-append request to
show freshness is preserved. One JSON line on stdout.

Usage: python tools/bench_serve.py [--index] [--requests N]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _post(port: int, path: str, body: dict) -> dict:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", action="store_true")
    ap.add_argument("--requests", type=int, default=40)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from seqspark.bulk import ES_BANNER  # noqa: F401  (import sanity)
    from seqspark.server import SeqSparkServer
    from seqspark.store import DocStore

    from seqspark.mapping import Mapping

    tmp = tempfile.mkdtemp(prefix="bench_serve_")
    store = DocStore(spark, os.path.join(tmp, "store"))
    mapping = Mapping({"service": "keyword", "message": "text"})
    BIG = 10**15

    sidx = None
    if args.index:
        from pyspark.sql import functions as F

        from seqspark.index import StoreIndex

        sidx = StoreIndex(
            store, os.path.join(tmp, "index"),
            {"message": F.col("tokens")["message"],
             "service": F.col("tokens")["service"]},
        )

    core = SeqSparkServer(
        spark, store, mapping,
        allowed_drift_ms=BIG, future_drift_ms=BIG,
        async_dir=os.path.join(tmp, "async"),
        index=sidx, two_phase_min_doc_bytes=1 if args.index else 1024,
    ).start()

    # ingest: 3 hour-buckets x 400 docs through the real bulk path
    def bulk_lines(hour: int, n: int) -> bytes:
        lines = []
        for i in range(n):
            lines.append('{"index":{}}')
            lines.append(json.dumps({
                "timestamp": f"2024-03-01 {hour:02d}:{i % 60:02d}:00",
                "service": f"svc{i % 7}",
                "message": f"request {i} handled in {i % 90} ms path /api/{i % 13}",
            }))
        return ("\n".join(lines) + "\n").encode()

    for h in (9, 10, 11):
        req = urllib.request.Request(
            f"http://127.0.0.1:{core.port}/_bulk", data=bulk_lines(h, 400),
            headers={"Content-Type": "application/x-ndjson"},
        )
        urllib.request.urlopen(req, timeout=120).read()
    if sidx is not None:
        core.refresh_index()

    search_req = {"query": "service:svc3 and message:request", "size": 50}
    complex_req = {
        "query": "message:handled", "size": 10, "with_total": True,
        "aggs": [{"func": "count", "group_by": "service"}],
    }

    # warmup
    for _ in range(3):
        _post(core.port, "/search", search_req)
        _post(core.port, "/complex", complex_req)

    def med(path: str, body: dict) -> tuple:
        wall, cpu = [], []
        for _ in range(args.requests):
            c0 = time.process_time()
            t0 = time.perf_counter()
            _post(core.port, path, body)
            wall.append(time.perf_counter() - t0)
            cpu.append(time.process_time() - c0)
        return (round(statistics.median(wall) * 1000, 2),
                round(statistics.median(cpu) * 1000, 2))

    search_ms, search_cpu = med("/search", search_req)
    complex_ms, complex_cpu = med("/complex", complex_req)

    # driver-side table construction alone
    tbl = []
    for _ in range(20):
        t0 = time.perf_counter()
        core._table()
        tbl.append(time.perf_counter() - t0)
    table_ms = round(statistics.median(tbl) * 1000, 2)

    # freshness: an appended doc must be visible to the very next search
    n_before = _post(core.port, "/search",
                     {"query": "service:fresh0", "size": 10})
    req = urllib.request.Request(
        f"http://127.0.0.1:{core.port}/_bulk",
        data=('{"index":{}}\n' + json.dumps({
            "timestamp": "2024-03-01 12:00:00", "service": "fresh0",
            "message": "freshness probe"}) + "\n").encode(),
        headers={"Content-Type": "application/x-ndjson"},
    )
    urllib.request.urlopen(req, timeout=120).read()
    n_after = _post(core.port, "/search",
                    {"query": "service:fresh0", "size": 10})
    fresh_ok = (len(n_before["docs"]) == 0 and len(n_after["docs"]) == 1)

    print(json.dumps({
        "metric": "serve_request_latency",
        "indexed": bool(args.index),
        "requests": args.requests,
        "search_ms": search_ms, "search_cpu_ms": search_cpu,
        "complex_ms": complex_ms, "complex_cpu_ms": complex_cpu,
        "table_build_ms": table_ms,
        "fresh_append_visible": fresh_ok,
    }))
    core.stop()


if __name__ == "__main__":
    main()
