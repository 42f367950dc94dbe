"""Contract-drift guards for __spark_entry__.py.

Round 3 grew queries() after the driver snapshotted its correctness file, so
19 green entries were invisible to the official record; these tests pin the
contract shape so every queries() entry is either oracle-checked or
explicitly declared rows-only, and that the TPC-H-shaped entries never force
a broadcast hint onto the fact side (orders / lineitem) — a plan that OOMs
executors at the 100x scale target.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def test_queries_and_oracles_cover_each_other():
    qkeys = set(entry_mod.queries())
    okeys = set(entry_mod.oracle_sql())
    assert okeys.isdisjoint(entry_mod.ROWS_ONLY), (
        "rows-only entries must not carry an oracle: "
        f"{okeys & entry_mod.ROWS_ONLY}"
    )
    assert qkeys == okeys | entry_mod.ROWS_ONLY, (
        f"missing oracles: {qkeys - okeys - entry_mod.ROWS_ONLY}; "
        f"orphan oracles: {okeys - qkeys}"
    )


def test_driver_window_shape():
    # the driver checks the FIRST 50 queries() entries; DRIVER_WINDOW is
    # the rotation. The window must stay exactly 50 names, all real,
    # and queries() must actually lead with it — a dict-building change
    # that silently reorders would un-rotate the official record.
    win = entry_mod.DRIVER_WINDOW
    assert len(win) == 50 and len(set(win)) == 50
    q = list(entry_mod.queries())
    assert q[:50] == win
    assert set(q) == set(entry_mod._all_queries())


def test_driver_window_is_the_mechanical_rotation():
    # r15 (verdict #2): the rotation is computed, not hand-picked —
    # tools/rotate_window.py ranks entries by last driver-green round
    # (never-checked first, contract order within a round) over the
    # committed CORRECTNESS_r*.json artifacts. The committed window must
    # equal the mechanism's output for the round it was authored against
    # (bump AS_OF when regenerating the window for a new round).
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from tools.rotate_window import compute_window, last_green

    AS_OF = 17
    names = list(entry_mod._all_queries().keys())
    want = compute_window(names, last_green(as_of=AS_OF))
    assert entry_mod.DRIVER_WINDOW == want, (
        "DRIVER_WINDOW drifted from rotate_window.py --as-of "
        f"{AS_OF}; regenerate it from the tool")


def test_rows_only_is_empty():
    # r11: every contract entry is hash-verified against a DuckDB oracle
    # (the last three binary-kernel entries moved to frozen expected
    # digests). Adding a new rows-only entry is a deliberate contract
    # weakening — it must update this pin with a justification.
    assert entry_mod.ROWS_ONLY == frozenset()


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name,n_dim_hints",
    [("shipping_priority", 1), ("local_supplier_volume", 4)],
)
def test_no_forced_broadcast_on_fact_side(spark, name, n_dim_hints):
    """With autoBroadcastJoinThreshold=-1 only HINTED sides broadcast, so the
    plan exposes exactly which joins are forced: the dim hints must survive
    and the orders (fact) join must plan as a non-broadcast join."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = entry_mod.queries()[name](spark, SF_DIR)
        plan = _physical_plan(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    n_broadcast = plan.count("BroadcastExchange")
    assert n_broadcast == n_dim_hints, (
        f"{name}: expected {n_dim_hints} broadcast joins (dims only), "
        f"plan has {n_broadcast}:\n{plan}"
    )
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, (
        f"{name}: the orders fact join must be a shuffle join when "
        f"broadcast is not auto-chosen:\n{plan}"
    )


def test_store_bloom_fetch_reads_through_the_store(spark):
    """The bloom-equivalence entry must actually scan the DocStore it
    builds (a regression to scanning the raw parquet would make the
    entry a vacuous twin of fetch_by_ids), and the store files must
    carry the event_id bloom filters the entry exists to pin."""
    df = entry_mod.queries()["store_bloom_fetch"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "seqspark-bloom-entry" in plan, plan
    assert "/root/testdata" not in plan, plan
    # at least one store file has a bloom filter on event_id
    import re

    m = re.search(r"(/[^\s\[\],]*seqspark-bloom-entry[^\s\[\],]*/store)", plan)
    assert m, plan
    store_dir = m.group(1)
    import glob

    files = glob.glob(store_dir + "/*/*.parquet")
    assert files, store_dir
    from test_store_streaming import _bloom_offsets

    offsets = _bloom_offsets(spark, files[0])
    assert offsets.get("event_id", -1) != -1, offsets


def test_bench_plan_canonicalizer_masks_run_specific_noise():
    """bench._canon must strip exactly the run-varying parts of a
    formatted plan — expression ids, file paths, digit runs — so two
    sessions' plans of the same shape digest identically, while operator
    names and pushed-filter FIELDS survive (the thing the digest pins)."""
    import bench

    a = (
        "(1) Scan parquet\n"
        "Output [2]: [event_type#123, ts#45L]\n"
        "Location: InMemoryFileIndex [file:/tmp/x1/events.parquet]\n"
        "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]\n"
        "(2) Exchange hashpartitioning(event_type#123, 32)"
    )
    b = (
        "(1) Scan parquet\n"
        "Output [2]: [event_type#9, ts#8811L]\n"
        "Location: InMemoryFileIndex [file:/tmp/other-99/events.parquet]\n"
        "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]\n"
        "(2) Exchange hashpartitioning(event_type#9, 16)"
    )
    assert bench._canon(a) == bench._canon(b)
    # a different operator shape must NOT collapse to the same canon
    c = b.replace("EqualTo(event_type,click)", "StringStartsWith(event_type,cli)")
    assert bench._canon(b) != bench._canon(c)
    d = b.replace("Exchange hashpartitioning", "Sort [event_type")
    assert bench._canon(b) != bench._canon(d)


def test_scale_plan_pins_cover_all_scale_queries():
    # bench_plans_scale.json must pin EVERY scale-check query at BOTH
    # scale points — including the r12 pipeline skew operators — so a
    # scale-point plan regression is a committed-artifact diff, not an
    # ad-hoc observation. (tools/bench_scale.py --write-plans regenerates
    # after an intended plan change.)
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_plans_scale.json")
    with open(path) as f:
        pins = json.load(f)
    names = {
        "q2_keyword_or", "q4_range", "q5_agg_count", "q6_agg_min_group",
        "q7_pricing", "q8_time_window",
        "p1_sessionize_scalable", "p2_cap_salted", "p3_top_salted",
        "p4_span_dedup",
        # r13 (verdict #4): the r12b ML operators' scale pins
        "p5_pq_topk", "p6_unigram_encode", "p7_keyframes",
        "p8_ivfpq_residual",
    }
    missing = [
        f"{n}@{s}" for n in sorted(names) for s in ("x1", "x10")
        if f"{n}@{s}" not in pins
    ]
    assert not missing, missing
    assert all(isinstance(v, str) and v for v in pins.values())
