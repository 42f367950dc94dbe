"""Fetch-by-id bench: parquet rid bloom filters vs plain stats.

Builds two identical DocStores (one with the default rid bloom, one with
bloom_cols=()) holding N synthetic docs spread over HOURS hourly buckets
with hash-random rids — the layout where min/max stats can never prune an
id fetch — then times a K-id fetch on each and reports the rows the scan
actually read (the row-group-skip evidence). One JSON line.

Usage: python tools/bench_fetch.py [--docs 1000000] [--hours 24] [--k 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scan_rows(q) -> int:
    """numOutputRows of the scan leaf after executing q."""
    q.collect()
    node = q._jdf.queryExecution().executedPlan()
    stack = [node]
    while stack:
        n = stack.pop()
        if n.children().isEmpty():
            m = n.metrics()
            if m.contains("numOutputRows"):
                return int(m.apply("numOutputRows").value())
        it = n.children().iterator()
        while it.hasNext():
            stack.append(it.next())
    return -1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--hours", type=int, default=24)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from seqspark.store import DocStore

    docs = (
        spark.range(args.docs)
        .select(
            F.col("id").alias("mid"),
            # hash-random rid: min/max spans every row group, the
            # fetch-by-id worst case the bloom exists for. shiftleft by
            # docs.bit_length() keeps the construction INJECTIVE — a
            # fixed multiplier would let the id term overflow its slot
            # and collide two rows on one rid, flaking the count assert
            (F.shiftleft(
                F.abs(F.hash(F.col("id").cast("string"))).cast("bigint"),
                args.docs.bit_length(),
            ) + F.col("id")).alias("rid"),
            (F.lit("2024-01-01 00:00:00").cast("timestamp")
             + F.make_interval(secs=(F.col("id") % (args.hours * 3600))
                               .cast("double"))).alias("ts"),
            F.md5(F.col("id").cast("string")).alias("raw"),
            F.lit(32).alias("size"),
        )
    )
    out = {"metric": "seqspark_fetch_bloom", "docs": args.docs,
           "hours": args.hours, "k": args.k}
    ids = [r.rid for r in
           docs.filter(F.col("mid") % (args.docs // args.k) == 17)
           .select("rid").limit(args.k).collect()]
    # throwaway write: JVM/codegen warmup would otherwise bill ~2x onto
    # whichever store is written first (measured: the entire apparent
    # bloom "write cost" at 1M docs was warmup)
    with tempfile.TemporaryDirectory() as d:
        DocStore(spark, d + "/warm").append(docs.limit(50_000))
    for label, bloom in (("bloom", ("rid",)), ("plain", ())):
        with tempfile.TemporaryDirectory() as d:
            store = DocStore(spark, d + "/store", bloom_cols=bloom)
            t0 = time.time()
            store.append(docs)
            write_s = time.time() - t0
            ts = []
            rows = None
            for _ in range(3):
                t0 = time.time()
                q = store.read().filter(F.col("rid").isin(ids))
                n = q.count()
                ts.append(time.time() - t0)
                assert n == len(ids), (n, len(ids))
            rows = scan_rows(
                store.read().filter(F.col("rid").isin(ids)))
            out[label] = {"write_s": round(write_s, 2),
                          "fetch_s_min": round(min(ts), 3),
                          "rows_scanned": rows}
    out["rows_scanned_ratio"] = round(
        out["plain"]["rows_scanned"] / max(1, out["bloom"]["rows_scanned"]),
        1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
