"""Deterministic sampling / splitting / source mixing
(`seqspark/pipeline/sampling.py`) — training-data curation operators."""

import pytest
from pyspark.sql import functions as F

from seqspark.pipeline.sampling import (
    BUCKETS,
    hash_bucket,
    hash_sample,
    hash_split,
    mix_sources,
)


@pytest.fixture(scope="module")
def docs(documents):
    return documents.select("doc_id", "source", "text")


def test_sample_deterministic_across_partitioning(docs):
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, "s").collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(7), "doc_id", 0.3, "s").collect()
    }
    assert a == b  # membership is a pure function of (key, seed)
    # a different seed draws a different (but still deterministic) subset
    c = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, "s2").collect()}
    assert a != c


def test_sample_fraction_roughly_honored(docs):
    n = docs.count()
    got = hash_sample(docs, "doc_id", 0.5, "x").count()
    assert abs(got / n - 0.5) < 0.15


def test_sample_nested_subset_property(docs):
    # bucket < f1*B implies bucket < f2*B for f1 <= f2: smaller samples are
    # strict subsets of larger ones at the same seed — lets a pipeline grow
    # its sample without reshuffling previous membership
    small = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1, "s").collect()}
    large = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.4, "s").collect()}
    assert small <= large


def test_split_disjoint_and_total(docs):
    out = hash_split(docs, "doc_id", {"train": 8, "val": 1, "test": 1}, "s")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()  # every row in exactly one split
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"]


def test_split_stable_per_key(docs):
    # same (key, seed) → same split on every run, regardless of weights'
    # absolute scale (8/1/1 == 0.8/0.1/0.1)
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", {"train": 8, "val": 1, "test": 1}, "s").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, "s").collect()}
    assert a == b


def test_mix_sources_counts(spark):
    rows = [(i, "web" if i % 2 == 0 else "code", f"t{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = mix_sources(df, "source", {"web": 2.0, "code": 0.0}, key_col="doc_id")
    got = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got == {"web": 200}  # 100 web rows × 2 copies; code dropped
    # copy index is 1-based and dense
    assert {r["copy"] for r in out.select("copy").distinct().collect()} == {1, 2}


def test_mix_sources_fractional_weight(spark):
    rows = [(i, "web", f"t{i}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    n = mix_sources(df, "source", {"web": 1.5}, key_col="doc_id", seed="s").count()
    assert abs(n / 400 - 1.5) < 0.15  # 1 copy always + hash-chosen ~50% extra


def test_default_weight_and_validation(spark, docs):
    out = mix_sources(docs, "source", {}, key_col="doc_id", default_weight=1.0)
    assert out.count() == docs.count()
    with pytest.raises(ValueError):
        mix_sources(docs, "source", {"a": -1.0}, key_col="doc_id")
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", 1.5)
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"a": 0.0})


def test_sampling_plan_stays_jvm_side(docs):
    # the 100 TB contract: a narrow scan+filter/project — no shuffle
    # (Exchange), no Python (BatchEvalPython/ArrowEvalPython)
    for df in (
        hash_sample(docs, "doc_id", 0.25, "v1"),
        hash_split(docs, "doc_id", {"train": 0.9, "test": 0.1}, "v1"),
        mix_sources(docs, "source", {"src0": 2.5}, key_col="doc_id"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "EvalPython" not in plan


def test_bucket_range(docs):
    mm = docs.select(
        F.min(hash_bucket(F.col("doc_id"))).alias("lo"),
        F.max(hash_bucket(F.col("doc_id"))).alias("hi"),
    ).collect()[0]
    assert 0 <= mm["lo"] and mm["hi"] < BUCKETS

def test_operator_seeds_are_independent(docs):
    # the same user seed must yield INDEPENDENT hash streams per operator:
    # a 0.25 sample under seed s intersects the 0.8/0.1/0.1 split under the
    # same s in ≈0.8/0.1/0.1 proportions — not entirely inside train (which
    # is what a shared, un-namespaced hash would produce)
    split = hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed="s"
    )
    sampled = hash_sample(split, "doc_id", 0.25, seed="s")
    counts = {
        r["split"]: r["n"]
        for r in sampled.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    total = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}  # sample straddles splits
    assert abs(counts["train"] / total - 0.8) < 0.12


def test_stratified_sample_quotas(docs):
    from seqspark.pipeline.sampling import stratified_sample

    fr = {"src0": 0.5, "src1": 0.2, "src2": 1.0}
    out = stratified_sample(docs, "doc_id", "source", fr, seed="s1",
                            default_fraction=0.0)
    base = {r["source"]: r["n"] for r in
            docs.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    # src2 keeps everything, absent strata (default 0.0) keep nothing
    assert got.get("src2") == base.get("src2")
    assert set(got) <= set(fr)
    # src0/src1 land near their quotas
    for src in ("src0", "src1"):
        ratio = got.get(src, 0) / base[src]
        assert abs(ratio - fr[src]) < 0.12, (src, ratio)


def test_stratified_sample_deterministic_and_namespaced(docs):
    from seqspark.pipeline.sampling import hash_sample, stratified_sample

    a = {r["doc_id"] for r in stratified_sample(
        docs, "doc_id", "source", {"src0": 0.4}, seed="s1").select("doc_id").collect()}
    b = {r["doc_id"] for r in stratified_sample(
        docs, "doc_id", "source", {"src0": 0.4}, seed="s1").select("doc_id").collect()}
    assert a == b and a
    # same seed string, different operator namespace -> independent stream:
    # the 0.4 stratified draw must not be a subset of a 0.5 hash_sample
    plain = {r["doc_id"] for r in hash_sample(
        docs, "doc_id", 0.5, seed="s1").select("doc_id").collect()}
    assert not a <= plain


def test_stratified_sample_no_exchange(docs):
    from seqspark.pipeline.sampling import stratified_sample

    out = stratified_sample(docs, "doc_id", "source", {"src0": 0.5}, seed="s1")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_cap_per_group(docs):
    from seqspark.pipeline.sampling import cap_per_group

    out = cap_per_group(docs, "doc_id", "source", 5, seed="s1")
    sizes = {r["source"]: r["n"] for r in
             out.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    assert sizes and all(n <= 5 for n in sizes.values())
    # deterministic across repartitioning
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in cap_per_group(
        docs.repartition(7), "doc_id", "source", 5, seed="s1").collect()}
    assert a == b
    # different seed -> (almost surely) different survivors
    c = {r["doc_id"] for r in cap_per_group(
        docs, "doc_id", "source", 5, seed="s2").collect()}
    assert a != c


def test_top_per_group(spark):
    from seqspark.pipeline.sampling import top_per_group

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 30.0), (3, "a", 20.0), (4, "a", 30.0),
         (5, "b", 1.0)],
        "id long, g string, v double",
    )
    got = {r["id"] for r in top_per_group(df, "g", "v", 2, key_col="id").collect()}
    # n=2 keeps both tied 30.0 rows, excluding 20.0
    assert got == {2, 4, 5}
    # n=1 actually pins the key tie-break: of the tied 30.0 rows (ids 2, 4),
    # the LOWER id must win deterministically
    top1 = {r["id"] for r in top_per_group(df, "g", "v", 1, key_col="id").collect()}
    assert top1 == {2, 5}
    asc = {r["id"] for r in top_per_group(df, "g", "v", 1, key_col="id", desc=False).collect()}
    assert asc == {1, 5}


def test_train_shuffle_deterministic_and_dense(docs, spark):
    from seqspark.pipeline.sampling import train_shuffle

    out = train_shuffle(docs, "doc_id", shards=8, seed="t").select(
        "doc_id", "shard", "pos"
    )
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, train_shuffle(
        docs.repartition(13), "doc_id", shards=8, seed="t"
    ).select("doc_id", "shard", "pos").collect()))
    assert a == b  # layout is a pure function of (id, seed)
    rows = out.collect()
    n = len(rows)
    assert len({(r["shard"], r["pos"]) for r in rows}) == n  # injective
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))  # dense 0..k-1
    # balanced in expectation: no shard is pathologically loaded
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) < 3 * n / 8
    # a different seed produces a different permutation
    c = sorted(map(tuple, train_shuffle(
        docs, "doc_id", shards=8, seed="u"
    ).select("doc_id", "shard", "pos").collect()))
    assert a != c


def test_train_shuffle_single_shuffle_plan(docs):
    """The 100 TB property: ONE hash exchange (by shard) feeds the
    per-shard window rank — no global sort, no second exchange."""
    from seqspark.pipeline.sampling import train_shuffle

    plan = train_shuffle(docs, "doc_id", shards=8)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "rangepartitioning" not in plan
    # the write path's variant: a shard-aligned exchange of exactly
    # `shards` partitions satisfies the window's distribution, so
    # write_shards pays ONE exchange total (no re-repartition)
    plan2 = train_shuffle(docs, "doc_id", shards=8, partitions=8)._jdf \
        .queryExecution().executedPlan().toString()
    assert plan2.count("Exchange") == 1
    assert "REPARTITION_BY_NUM" in plan2


def test_write_shards_layout(docs, spark, tmp_path):
    from seqspark.pipeline.sampling import train_shuffle, write_shards

    path = str(tmp_path / "shards")
    write_shards(docs, path, "doc_id", shards=4, seed="w")
    back = spark.read.parquet(path)
    want = train_shuffle(docs, "doc_id", shards=4, seed="w").select(
        "doc_id", "shard", "pos"
    )
    assert sorted(map(tuple, back.select("doc_id", "shard", "pos").collect())) \
        == sorted(map(tuple, want.collect()))
    import os
    dirs = {d for d in os.listdir(path) if d.startswith("shard=")}
    assert dirs == {f"shard={k}" for k in range(4)}
    # rows inside each shard's files are in pos order (a trainer streams
    # a shard directory without sorting)
    import pyarrow.parquet as pq
    for d in sorted(dirs):
        full = os.path.join(path, d)
        files = [f for f in os.listdir(full) if f.endswith(".parquet")]
        assert len(files) == 1  # shard boundary == file boundary
        t = pq.read_table(os.path.join(full, files[0]), columns=["pos"])
        poss = t.column("pos").to_pylist()
        assert poss == sorted(poss)


def test_salted_rank_exactness_under_mega_group(spark):
    # skew stress: one mega-group holds ~60% of rows. The two-stage salted
    # rank must return EXACTLY the unsalted result for both operators —
    # every member of the true top-n/cap-n survives its salt slice — while
    # bounding the final per-group window to n*salt_groups rows.
    from seqspark.pipeline.sampling import cap_per_group, top_per_group

    rows = [(i, "mega" if i % 5 < 3 else f"g{i % 17}", float((i * 7919) % 1000))
            for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, g string, v double")

    plain_top = sorted(
        map(tuple, top_per_group(df, "g", "v", 9, key_col="id").collect())
    )
    salted_top = sorted(
        map(tuple,
            top_per_group(df, "g", "v", 9, key_col="id", salt_groups=8).collect())
    )
    assert plain_top == salted_top and plain_top

    plain_cap = sorted(
        map(tuple, cap_per_group(df, "id", "g", 9, seed="s").collect())
    )
    salted_cap = sorted(
        map(tuple, cap_per_group(df, "id", "g", 9, seed="s", salt_groups=8).collect())
    )
    assert plain_cap == salted_cap and plain_cap

    # the salted plan really has the hot-only two-stage shape: two window
    # exchanges (the pre-stage keyed by (group, salt)) AND the hot-key
    # detection joined back as a BROADCAST, never a shuffle join
    plan = (
        top_per_group(df, "g", "v", 9, key_col="id", salt_groups=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Window") >= 2 and "pmod" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    # degenerate knobs fall back to the single-stage plan
    one = top_per_group(df, "g", "v", 9, key_col="id", salt_groups=1)
    assert sorted(map(tuple, one.collect())) == plain_top


def test_salted_rank_survives_reserved_column_names(spark):
    # a caller's frame may carry __hot/__prk columns; the skew knob must
    # not raise ambiguous-reference and must still be exact
    from seqspark.pipeline.sampling import cap_per_group, top_per_group

    rows = [(i, f"g{i % 3}", float(i % 7), 1, 2) for i in range(300)]
    df = spark.createDataFrame(
        rows, "id long, g string, v double, __hot int, __prk int"
    )
    plain = sorted(map(tuple, top_per_group(df, "g", "v", 4, key_col="id").collect()))
    salted = sorted(map(tuple, top_per_group(
        df, "g", "v", 4, key_col="id", salt_groups=4).collect()))
    assert plain == salted and plain
    pc = sorted(map(tuple, cap_per_group(df, "id", "g", 4).collect()))
    sc = sorted(map(tuple, cap_per_group(df, "id", "g", 4, salt_groups=4).collect()))
    assert pc == sc and pc


def test_salted_rank_detects_null_mega_group(spark):
    # advisor r11 (low): the hot-detection broadcast join must be
    # null-safe — a NULL group key (missing domain/source) is often THE
    # hot key, and a plain equi-join left it undetected (exact results,
    # but the skew mitigation silently never fired). Both operators must
    # also stay exact with NULL groups present.
    from seqspark.pipeline.sampling import (
        _pre_cap_hot_groups, cap_per_group, top_per_group,
    )
    from pyspark.sql import functions as F

    rows = [(i, None if i % 5 < 3 else f"g{i % 17}", float((i * 7919) % 1000))
            for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, g string, v double")

    # the pre-stage must actually shrink the NULL mega-group (detection
    # fired): 2400 NULL rows -> at most n*salt_groups survivors
    pre = _pre_cap_hot_groups(
        df, "g", "id", 9, 8,
        (F.xxhash64(F.col("id")), F.col("id")),
    )
    null_rows = pre.filter(F.col("g").isNull()).count()
    assert null_rows <= 9 * 8

    plain_top = sorted(
        map(tuple, top_per_group(df, "g", "v", 9, key_col="id").collect()),
        key=str,
    )
    salted_top = sorted(
        map(tuple,
            top_per_group(df, "g", "v", 9, key_col="id", salt_groups=8).collect()),
        key=str,
    )
    assert plain_top == salted_top and plain_top

    plain_cap = sorted(
        map(tuple, cap_per_group(df, "id", "g", 9, seed="s").collect()), key=str
    )
    salted_cap = sorted(
        map(tuple,
            cap_per_group(df, "id", "g", 9, seed="s", salt_groups=8).collect()),
        key=str,
    )
    assert plain_cap == salted_cap and plain_cap


def test_salted_rank_precomputed_hot_keys(spark):
    # the amortizable detection pass: hot_keys from hot_group_keys must
    # give the same exact results as per-call detection; a GENEROUS set
    # (every group) and a frame with duplicate keys must also stay exact
    from pyspark.sql import functions as F

    from seqspark.pipeline.sampling import (
        cap_per_group, hot_group_keys, top_per_group,
    )

    rows = [(i, "mega" if i % 5 < 3 else f"g{i % 17}", float((i * 7919) % 1000))
            for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    plain_top = sorted(
        map(tuple, top_per_group(df, "g", "v", 9, key_col="id").collect())
    )
    plain_cap = sorted(
        map(tuple, cap_per_group(df, "id", "g", 9, seed="s").collect())
    )

    hot = hot_group_keys(df, "g", 200)  # mega has 2400 rows; g* ~94
    assert [r["g"] for r in hot.collect()] == ["mega"]
    for hk in (
        hot,
        df.select("g"),                      # generous: every group, dup keys
        hot.unionByName(hot),                # explicit duplicates
        spark.createDataFrame([], "g string"),  # empty: nothing pre-capped
    ):
        got_top = sorted(map(tuple, top_per_group(
            df, "g", "v", 9, key_col="id", salt_groups=8, hot_keys=hk
        ).collect()))
        assert got_top == plain_top
        got_cap = sorted(map(tuple, cap_per_group(
            df, "id", "g", 9, seed="s", salt_groups=8, hot_keys=hk
        ).collect()))
        assert got_cap == plain_cap

    # hot_keys alone engages the pre-stage with the default salt
    got = sorted(map(tuple, cap_per_group(
        df, "id", "g", 9, seed="s", hot_keys=hot).collect()))
    assert got == plain_cap

    # the precomputed path really skips the per-call detection count:
    # its plan carries hot_group_keys' __n filter, never the internal
    # __gn detection aggregate the threshold path would add
    pre_plan = top_per_group(
        df, "g", "v", 9, key_col="id", salt_groups=8, hot_keys=hot
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "__gn" not in pre_plan and "__n" in pre_plan
    det_plan = top_per_group(
        df, "g", "v", 9, key_col="id", salt_groups=8
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "__gn" in det_plan


class TestWeightedSample:
    """Efraimidis-Spirakis A-ES weighted sampling (r13)."""

    def test_frequency_tracks_weight(self, spark):
        # over many seeds, a row with weight 9 should appear ~9x as
        # often as weight 1 (inclusion probability ∝ weight for k=1)
        from seqspark.pipeline.sampling import weighted_sample

        rows = [(i, 9.0 if i == 0 else 1.0) for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, w double").cache()
        wins = 0
        trials = 120
        for s in range(trials):
            got = weighted_sample(df, 1, "w", "doc_id", seed=str(s)).collect()
            wins += got[0]["doc_id"] == 0
        # p = 9/18 = 0.5; binomial(120, 0.5) within ±5 sigma
        assert 33 <= wins <= 87, wins

    def test_without_replacement_and_plan(self, spark):
        from seqspark.pipeline.sampling import weighted_sample

        rows = [(i, float(1 + i % 7)) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        got = weighted_sample(df, 25, "w", "doc_id", seed="x")
        ids = [r["doc_id"] for r in got.collect()]
        assert len(ids) == 25 and len(set(ids)) == 25
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "Exchange" not in plan  # per-partition heaps, no shuffle

    def test_null_and_nonpositive_weights_excluded(self, spark):
        from seqspark.pipeline.sampling import weighted_sample

        df = spark.createDataFrame(
            [(1, 2.0), (2, None), (3, 0.0), (4, -1.0), (5, 1.0)],
            "doc_id long, w double")
        ids = {r["doc_id"] for r in
               weighted_sample(df, 10, "w", "doc_id").collect()}
        assert ids == {1, 5}

    def test_oracle_parity(self, spark):
        import duckdb
        import pandas as pd

        from seqspark.pipeline.sampling import (
            weighted_sample, weighted_sample_oracle_sql)

        rows = [(i, float(1 + (i * 13) % 11)) for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        got = pd.DataFrame(
            [(r["doc_id"], r["w"]) for r in
             weighted_sample(df, 40, "w", "doc_id", seed="par").collect()],
            columns=["doc_id", "w"])
        con = duckdb.connect()
        con.register("t", pd.DataFrame(
            {"doc_id": [r[0] for r in rows], "w": [r[1] for r in rows]}))
        want = con.execute(weighted_sample_oracle_sql(
            40, "w", "doc_id", "t", "doc_id, w", seed="par")).df()
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True))

    def test_deterministic_across_layouts(self, spark):
        from seqspark.pipeline.sampling import weighted_sample

        rows = [(i, float(1 + i % 5)) for i in range(120)]
        df1 = spark.createDataFrame(rows, "doc_id long, w double")
        df2 = spark.createDataFrame(
            list(reversed(rows)), "doc_id long, w double").repartition(7)
        a = {r["doc_id"] for r in
             weighted_sample(df1, 15, "w", "doc_id", seed="z").collect()}
        b = {r["doc_id"] for r in
             weighted_sample(df2, 15, "w", "doc_id", seed="z").collect()}
        assert a == b
