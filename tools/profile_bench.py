"""Decompose bench.py's per-query seconds into driver-side phases.

For each bench query (same builders, same session confs as bench.py):

- ``build``   — Python/py4j DataFrame construction (parse + compile)
- ``plan``    — analysis + optimization + physical planning
  (forcing ``queryExecution().executedPlan()``)
- ``exec``    — first execution + collect after the plan is forced
- ``jobs``    — Spark jobs launched by the exec phase (statusTracker)

This tells the optimization round whether a 300 ms query is spending its
time in py4j chatter, in Catalyst, or in actual task execution —
guide §1.1's "decide where the time is going" applied to a
fixed-overhead-dominated local bench.

Usage: python tools/profile_bench.py [--runs 5]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# reuse bench.py's setup wholesale so the profile matches the bench
import bench as benchmod  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from seqspark import AggQuery, SearchTable  # noqa: E402
from seqspark.data import load_table  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    SF_DIR = benchmod.SF_DIR
    CPUS = benchmod.CPUS
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("seqspark-profile")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    events = load_table(spark, SF_DIR, "events")
    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "ts", F.timestamp_millis(F.col("doc_id") * 1000)
    )
    lineitem = load_table(spark, SF_DIR, "lineitem")
    st = SearchTable.from_typed(
        events, benchmod.EVENTS_MAPPING, ts_col="ts", rid_col="event_id",
        assume_folded=True,
    )
    DOCS_MAPPING = {
        "text": "text", "lang": "keyword", "source": "keyword",
        "doc_id": "keyword",
    }
    import tempfile

    from seqspark.engine import materialize_tokens

    tok_dir = tempfile.mkdtemp(prefix="seqspark-prof-") + "/docs_at_rest"
    materialize_tokens(docs, DOCS_MAPPING).write.parquet(tok_dir)
    docs_at_rest = spark.read.parquet(tok_dir)
    sd = SearchTable.from_typed(
        docs_at_rest, DOCS_MAPPING, ts_col="ts", rid_col="doc_id",
        assume_folded=True,
    )
    events.count()
    docs_at_rest.count()
    lineitem.count()
    st.aggregate(AggQuery(func="max", field="value", group_by="event_type")).collect()

    def b1():
        return [
            st.search("*", size=100, offset=page * 100, order="asc")
            for page in range(3)
        ]

    def b2():
        return [
            st.search(
                "event_type:click or event_type:signup or event_type:error",
                size=5000,
            )
        ]

    def b3():
        return [sd.search('text:"table scan row"', size=5000)]

    def b4():
        return [
            st.search("value:[50, 100)", size=5000),
            st.search("value:[50, *]", size=5000),
        ]

    def b5():
        return [st.aggregate(AggQuery(func="count", field="event_type"))]

    def b6():
        return [
            st.aggregate(AggQuery(func="min", field="value", group_by="event_type"))
        ]

    def b7():
        return [
            lineitem.filter(
                F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02"))
            )
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum("l_extendedprice").alias("sum_base_price"),
                F.avg("l_discount").alias("avg_disc"),
                F.count(F.lit(1)).alias("count_order"),
            )
        ]

    builders = [
        ("q1", b1), ("q2", b2), ("q3", b3), ("q4", b4),
        ("q5", b5), ("q6", b6), ("q7", b7),
    ]

    tracker = spark.sparkContext.statusTracker()
    out = {}
    for name, b in builders:
        phases = {"build": [], "plan": [], "exec": [], "total": []}
        jobs = 0
        for i in range(args.runs):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            dfs = b()
            t1 = time.perf_counter()
            for df in dfs:
                df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            for df in dfs:
                df.collect()
            t3 = time.perf_counter()
            phases["build"].append(t1 - t0)
            phases["plan"].append(t2 - t1)
            phases["exec"].append(t3 - t2)
            phases["total"].append(t3 - t0)
            jobs = len(tracker.getJobIdsForGroup(None) or []) - j0
        out[name] = {
            k: round(statistics.median(v), 4) for k, v in phases.items()
        }
        out[name]["jobs_last_run"] = jobs
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)

    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "profile": out}))
    import shutil

    shutil.rmtree(os.path.dirname(tok_dir), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
