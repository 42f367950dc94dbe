"""Ingest-throughput benchmark: the two write paths, measured in docs/s.

The reference's own benchmark rig (`benchmarks/README.md`) is an
ES-bulk ingest harness — file.d ships the Elasticsearch http_logs
dataset into seq-db's `POST /_bulk` and the dashboard tracks docs/s —
so ingest rate is the reference's headline write metric (it publishes
no absolute numbers; `docs/en/11-benchmarks.md` is TBD). This measures
the equivalent paths here:

1. **bulk_http** — ES-bulk NDJSON through a live `SeqSparkServer`
   (`POST /_bulk`, gzip off) from concurrent shipper threads: the
   driver-side parse + distributed tokenize (`ingest_docs`) + store
   append, end to end, exactly what a file.d/Filebeat shipper would
   exercise.
2. **distributed_files** — the 100 TB path: NDJSON files read by Spark
   (`spark.read.text`) → `ingest_docs` → `DocStore.append`, i.e. the
   backfill/bootstrap route where the corpus never touches the driver.

Docs are the sf events table rendered to raw JSON (testdata-derived,
deterministic; timestamps rewritten to an ES format `ingest_docs`
parses). Prints one JSON line.

Usage:
    python tools/bench_ingest.py [--docs 40000] [--shippers 4]
        [--bulk-size 2000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from seqspark import Mapping
from seqspark.data import load_table
from seqspark.ingest import ingest_docs
from seqspark.server import SeqSparkServer
from seqspark.store import DocStore

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

MAPPING = Mapping(
    {
        "event_id": "keyword",
        "event_type": "keyword",
        "user_id": "keyword",
        "value": "keyword",
        "props": "text",
    }
)
BIG = 10**15  # fixture timestamps are years old — disable the drift clamp


def raw_docs_df(spark, cluster_hours: int = 0):
    """Events rendered to raw JSON. ``cluster_hours > 0`` folds every
    timestamp into that many hours (deterministic modulo), modelling the
    live-shipper regime where docs arrive near-now and each bulk lands in
    1-2 time buckets; 0 keeps the fixture's 30-day spread (the backfill
    worst case: every bulk fans out across ~720 hour-buckets)."""
    ev = load_table(spark, SF_DIR, "events")
    ts = F.col("ts")
    if cluster_hours:
        span = cluster_hours * 3600 * 1000
        ts = F.timestamp_millis(
            F.lit(1704067200000) + F.pmod(F.unix_millis(ts), F.lit(span))
        )
    return ev.select(
        F.to_json(
            F.struct(
                F.date_format(ts, "yyyy-MM-dd HH:mm:ss.SSS").alias("timestamp"),
                F.col("event_id").cast("string").alias("event_id"),
                F.col("event_type"),
                F.col("user_id").cast("string").alias("user_id"),
                F.col("value").cast("string").alias("value"),
                F.col("props"),
            )
        ).alias("raw")
    )


def bench_bulk_http(spark, docs: list, shippers: int, bulk_size: int) -> dict:
    tmp = tempfile.mkdtemp(prefix="ingest_bulk_")
    store = DocStore(spark, os.path.join(tmp, "store"))
    srv = SeqSparkServer(
        spark, store, MAPPING, allowed_drift_ms=BIG, future_drift_ms=BIG
    ).start()
    bulks = []
    for i in range(0, len(docs), bulk_size):
        chunk = docs[i : i + bulk_size]
        lines = []
        for d in chunk:
            lines.append('{"index": {}}')
            lines.append(d)
        bulks.append("\n".join(lines).encode())
    url = f"http://127.0.0.1:{srv.port}/_bulk"
    errors = []
    lock = threading.Lock()
    queue = list(enumerate(bulks))

    def ship():
        while True:
            with lock:
                if not queue:
                    return
                _, body = queue.pop()
            try:
                with urllib.request.urlopen(
                    urllib.request.Request(url, data=body), timeout=600
                ) as r:
                    resp = json.loads(r.read())
                if resp.get("errors"):
                    errors.append("item errors")
            except Exception as e:  # noqa: BLE001 - recorded, not raised
                errors.append(str(e))

    t0 = time.perf_counter()
    threads = [threading.Thread(target=ship) for _ in range(shippers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t0
    stored = store.read().count()
    srv.stop()
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "docs": len(docs),
        "stored": stored,
        "sec": round(elapsed, 3),
        "docs_per_sec": round(len(docs) / elapsed, 1),
        "bulks": len(bulks),
        "shippers": shippers,
        "errors": len(errors),
    }


def bench_distributed(spark, ndjson_dir: str, n_docs: int) -> dict:
    tmp = tempfile.mkdtemp(prefix="ingest_dist_")
    store = DocStore(spark, os.path.join(tmp, "store"))
    raw = spark.read.text(ndjson_dir).withColumnRenamed("value", "raw")
    t0 = time.perf_counter()
    docs = ingest_docs(
        raw, MAPPING, allowed_drift_ms=BIG, future_drift_ms=BIG
    )
    store.append(docs)
    elapsed = time.perf_counter() - t0
    stored = store.read().count()
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "docs": n_docs,
        "stored": stored,
        "sec": round(elapsed, 3),
        "docs_per_sec": round(n_docs / elapsed, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=40_000)
    ap.add_argument("--shippers", type=int, default=4)
    ap.add_argument("--bulk-size", type=int, default=2_000)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    raws = raw_docs_df(spark)
    n_all = raws.count()

    # corpus materialization (untimed)
    docs = [r["raw"] for r in raws.limit(args.docs).collect()]
    docs_clustered = [
        r["raw"]
        for r in raw_docs_df(spark, cluster_hours=2).limit(args.docs).collect()
    ]
    ndjson_dir = tempfile.mkdtemp(prefix="ingest_corpus_")
    raws.write.mode("overwrite").text(ndjson_dir)

    out = {
        "metric": "seqspark_ingest_throughput",
        "sf_dir": SF_DIR,
        "bulk_http_scattered_30d": bench_bulk_http(
            spark, docs, args.shippers, args.bulk_size
        ),
        "bulk_http_clustered_2h": bench_bulk_http(
            spark, docs_clustered, args.shippers, args.bulk_size
        ),
        "distributed_files": bench_distributed(spark, ndjson_dir, n_all),
    }
    shutil.rmtree(ndjson_dir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
