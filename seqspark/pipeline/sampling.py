"""Deterministic sampling, dataset splitting and source mixing for
training-data curation.

Beyond the reference (seq-db has no sampling surface) — these are the
operations a 100 TB pretraining pipeline runs after dedup/quality filtering:

- :func:`hash_sample` — content-keyed Bernoulli sampling. Membership is a
  pure function of (key, seed): reruns, repartitions and incremental
  appends all agree on which rows are in, unlike ``df.sample`` whose
  output depends on partition layout. Narrow (no shuffle), whole-stage
  codegen, and the predicate prunes nothing extra — a scan + filter.
- :func:`hash_split` — disjoint train/val/test assignment from the same
  hash. A document can never leak between splits across runs, the property
  eval-contamination audits depend on.
- :func:`mix_sources` — per-source up/down-weighting by deterministic
  repetition (epoch mixing): weight 2.5 → every row twice, plus a
  hash-chosen 50% a third time. ``explode(sequence(...))`` is JVM-side;
  output size = sum(weight_s * rows_s) with no Python in the loop.

All three build on one primitive, :func:`hash_bucket`: the first 15 hex
digits of md5(key || seed) read as a bigint, mod ``buckets``. md5 keeps the
DuckDB oracle bit-identical (both engines expose it); 15 hex digits = 60
bits stay exact in a signed 64-bit int on both sides.

Each operator NAMESPACES the user seed (``sample:``/``split:``/``mix:``
prefix) so the same seed string across operators yields independent hash
streams — otherwise a 0.25 sample under seed s would fall entirely inside
the 0.8 train prefix of a split under the same s, silently correlating
sample membership with split assignment.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: resolution of the hash bucket space; 1e6 keeps three-decimal fractions
#: exact (0.125 → 125000 buckets) while staying far under 2^60
BUCKETS = 1_000_000


def hash_bucket(key: Column, seed: str = "", buckets: int = BUCKETS) -> Column:
    """Uniform bucket in [0, buckets) as a pure function of (key, seed)."""
    h = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(seed))), 1, 15), 16, 10
    ).cast("bigint")
    return F.pmod(h, F.lit(buckets))


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = ""
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, keyed on ``key_col``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(
        hash_bucket(F.col(key_col), "sample:" + seed)
        < int(round(fraction * BUCKETS))
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str,
    seed: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (r13): k rows with
    inclusion probability proportional to ``weight_col`` — the
    Efraimidis-Spirakis A-ES algorithm (public, 2006): each row gets
    key ``ln(u)/w`` with ``u ~ U(0,1]``, and the k LARGEST keys are the
    sample. The training-data use: sample documents proportional to a
    quality score instead of uniformly.

    Deterministic and layout-independent: ``u`` derives from a portable
    md5 hash of (key, seed) — 13 hex digits = 52 bits, exact in a
    float64 on BOTH engines, so the DuckDB oracle replays the selection
    bit-for-bit (the md5-prefix standing). Rows with NULL or
    non-positive weights have zero inclusion probability and are
    filtered (A-ES is undefined for them).

    Plan: one narrow projection + ``orderBy(key desc).limit(k)`` =
    TakeOrderedAndProject — per-partition heaps, no shuffle, no Python;
    at 100 TB the sample costs one scan."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"),
                           F.lit("wsample:" + seed))), 1, 13),
        16, 10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float(1 << 52))  # (0, 1]
    w = F.col(weight_col).cast("double")
    key = (F.log(u) / w).alias("__es_key")
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("__es_key", key)
        .orderBy(F.col("__es_key").desc(), F.col(key_col).asc())
        .limit(k)
        .drop("__es_key")
    )


def weighted_sample_oracle_sql(
    k: int,
    weight_expr: str,
    key_col: str,
    table: str,
    select_cols: str,
    seed: str = "",
    where: str = "TRUE",
) -> str:
    """DuckDB replay of :func:`weighted_sample`: the identical md5-
    prefix uniform, the identical ``ln(u)/w`` key, the identical
    order-and-limit."""
    h = (f"('0x' || substring(md5({key_col}::VARCHAR || "
         f"'wsample:{seed}'), 1, 13))::BIGINT")
    u = f"(({h})::DOUBLE + 1.0) / {float(1 << 52)!r}"
    key = f"(ln({u}) / ({weight_expr})::DOUBLE)"
    return (
        f"SELECT {select_cols} FROM {table} "
        f"WHERE {where} AND ({weight_expr}) IS NOT NULL "
        f"AND ({weight_expr}) > 0 "
        f"ORDER BY {key} DESC, {key_col} ASC LIMIT {k}"
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Dict[str, float],
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to one named split with probability proportional to
    its weight; assignment is deterministic and disjoint."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    bucket = hash_bucket(F.col(key_col), "split:" + seed)
    expr = None
    upper = 0.0
    names = list(weights)
    for name in names[:-1]:
        upper += weights[name] / total * BUCKETS
        branch = F.when(bucket < int(round(upper)), F.lit(name))
        expr = branch if expr is None else expr.when(
            bucket < int(round(upper)), F.lit(name)
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: Dict[str, float],
    seed: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling: keep ``fractions[s]``
    of each stratum ``s`` (e.g. per-language or per-source quotas in a
    corpus rebalance). Same guarantees as :func:`hash_sample` — membership
    is a pure function of (key, seed), so reruns and incremental appends
    agree — and the plan stays a narrow scan + filter (no shuffle, no
    per-stratum jobs, unlike ``df.sampleBy``'s layout-dependent draw).

    Strata absent from ``fractions`` keep ``default_fraction`` of rows.
    """
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0, 1]")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError("default_fraction must be in [0, 1]")
    cut = None
    for name, frac in fractions.items():
        branch = (F.col(strata_col) == name, F.lit(int(round(frac * BUCKETS))))
        cut = F.when(*branch) if cut is None else cut.when(*branch)
    default_cut = F.lit(int(round(default_fraction * BUCKETS)))
    cut = default_cut if cut is None else cut.otherwise(default_cut)
    return df.filter(hash_bucket(F.col(key_col), "strata:" + seed) < cut)


def hot_group_keys(df: DataFrame, col: str, min_rows: int) -> DataFrame:
    """One-column frame of the keys holding more than ``min_rows`` rows —
    the detection pass behind every skew-aware operator here, exposed so a
    pipeline can pay it ONCE and share the result: compute it (optionally
    persist it), then pass it as ``hot_keys=`` to
    :func:`cap_per_group`/:func:`top_per_group` and as ``hot_actors=`` to
    :func:`seqspark.pipeline.sessions.sessionize_scalable`. The per-call
    detection costs a full map-side-combined count of the frame (measured
    1.59x on uniform data, BASELINE.md round 11); chained skew-aware
    operators over the same frame should not pay it repeatedly."""
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > min_rows)
        .select(col)
    )


def cap_per_group(
    df: DataFrame,
    key_col: str,
    group_col: str,
    n: int,
    seed: str = "",
    salt_groups: Optional[int] = None,
    hot_keys: Optional[DataFrame] = None,
) -> DataFrame:
    """Keep at most ``n`` rows per group, chosen deterministically by hash
    rank (per-domain / per-source caps after :func:`stratified_sample`'s
    fraction quotas; a boilerplate domain contributes at most ``n`` docs).

    The hash rank makes the survivors a uniform, rerun-stable draw rather
    than "whatever sorted first". One shuffle on the group key; skewed hot
    groups are exactly the rows the cap discards, so the window never
    materializes more than it must — but row_number still SORTS the whole
    hot group in one task first. ``salt_groups=S`` bounds that: an EXACT
    hot-only two-stage rank (:func:`_pre_cap_hot_groups`) first caps each
    of S hash-of-key salt slices at ``n`` for groups detected larger than
    ``n*S``, so the final per-group task sorts at most ``n*S`` rows
    however hot the group, while balanced groups pay nothing. AQE cannot
    split a window partition (its skew handling is join/shuffle-read
    only), so the salt is the only lever for single-key window skew.

    ``hot_keys`` (a one-column frame of group keys, e.g. from
    :func:`hot_group_keys`) replaces the per-call detection count —
    chained skew-aware operators over one frame should compute the hot
    set once and share it. Exactness does not depend on the set's
    accuracy (pre-capping a small group is wasted work, never a wrong
    answer), so a stale or generous hot list is safe.
    """
    if n < 0:
        raise ValueError("n must be >= 0")
    from pyspark.sql import Window

    order = (hash_bucket(F.col(key_col), "cap:" + seed), F.col(key_col))
    if (salt_groups is not None and salt_groups > 1) or hot_keys is not None:
        df = _pre_cap_hot_groups(
            df, group_col, key_col, n,
            salt_groups if salt_groups and salt_groups > 1 else 2,
            order, hot_keys,
        )
    rank = F.row_number().over(Window.partitionBy(group_col).orderBy(*order))
    return (
        df.withColumn("__rk", rank).filter(F.col("__rk") <= n).drop("__rk")
    )


def _pre_cap_hot_groups(
    df: DataFrame,
    group_col: str,
    key_col: str,
    n: int,
    salt_groups: int,
    order,
    hot_keys: Optional[DataFrame] = None,
) -> DataFrame:
    """The EXACT hot-only pre-stage behind ``salt_groups``: rank within
    (group, hash(key) % salt_groups) and keep ``n`` per slice — but ONLY
    for groups larger than ``n * salt_groups`` rows, detected by one
    map-side-combined count and broadcast back. Every member of a
    group's true top/cap ``n`` is in its slice's top ``n``, so the final
    rank sees ≤ ``n * salt_groups`` rows per hot group and the result is
    identical (pytest-pinned).

    Why hot-only: pre-capping a group smaller than ``n * salt_groups``
    cannot shrink it, so an unconditional pre-stage just re-shuffles the
    whole frame for nothing — measured at 20M rows / 50%-hot-key it LOST
    2.5x (BASELINE.md skew stress); gated on detected-hot groups only
    the hot rows pay the extra exchange. The broadcast is bounded:
    at most N / (n * salt_groups) groups can exceed the threshold."""
    cols = df.columns
    # collision-proof temp names: a caller's frame may legitimately carry
    # __hot/__prk columns, and an ambiguous-reference AnalysisException
    # from the skew knob would break a previously-working pipeline
    hot_c, prk_c, hk_c = "__hot", "__prk", "__hgk"
    while hot_c in cols:
        hot_c += "_"
    while prk_c in cols:
        prk_c += "_"
    while hk_c in cols:
        hk_c += "_"
    if hot_keys is not None:
        # precomputed hot set (hot_group_keys): skip the detection count;
        # distinct() guards against a caller-supplied frame with repeats,
        # which would DUPLICATE tagged rows through the join. Empty hot
        # set → no pre-stage at all (driver-side take(1) on the tiny,
        # typically cached frame) — the common nothing-is-hot case then
        # pays nothing beyond that probe.
        if not hot_keys.take(1):
            return df
        src = hot_keys.columns[0]
        hot = (
            hot_keys.select(F.col(src).alias(hk_c))
            .distinct()
            .withColumn(hot_c, F.lit(1))
        )
    else:
        hot = (
            df.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("__gn"))
            .filter(F.col("__gn") > n * salt_groups)
            .select(F.col(group_col).alias(hk_c))
            .withColumn(hot_c, F.lit(1))
        )
    # null-safe tag: a mega NULL-key group (missing domain/source) is
    # often the hottest of all and must still route through the pre-cap.
    tagged = df.join(
        F.broadcast(hot), F.col(group_col).eqNullSafe(F.col(hk_c)), "left"
    ).drop(hk_c)
    cold = tagged.filter(F.col(hot_c).isNull()).select(*cols)
    pre = F.row_number().over(
        Window.partitionBy(
            F.col(group_col),
            F.pmod(F.xxhash64(F.col(key_col)), F.lit(salt_groups)),
        ).orderBy(*order)
    )
    capped = (
        tagged.filter(F.col(hot_c).isNotNull())
        .select(*cols)
        .withColumn(prk_c, pre)
        .filter(F.col(prk_c) <= n)
        .select(*cols)
    )
    return cold.unionByName(capped)


def top_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    n: int,
    key_col: str,
    desc: bool = True,
    salt_groups: Optional[int] = None,
    hot_keys: Optional[DataFrame] = None,
) -> DataFrame:
    """Keep the top ``n`` rows of each group by ``order_col`` (ties broken
    by ``key_col`` ascending, so the draw is deterministic) — e.g. the
    best-quality documents per source after scoring. One shuffle on the
    group key; rank + filter, no join.

    Skew: a mega-group (one domain holding half the corpus) funnels into
    a single window task — AQE does not split window partitions.
    ``salt_groups=S`` makes the rank a two-stage EXACT computation for
    DETECTED-HOT groups only (:func:`_pre_cap_hot_groups`): stage 1 ranks
    hot groups within (group, hash(key) % S) and keeps ``n`` per slice
    (every member of the true top-n is in its slice's top-n, so nothing
    is lost), stage 2 ranks the ≤ ``n*S`` survivors per group. The hot
    group's serial work drops from |group| log |group| to ~|group|/S per
    task, and balanced groups bypass the pre-stage entirely; measured
    numbers in BASELINE.md (skew stress). ``hot_keys`` (see
    :func:`hot_group_keys`) replaces the per-call detection count so
    chained skew-aware operators share one detection pass."""
    if n < 0:
        raise ValueError("n must be >= 0")
    from pyspark.sql import Window

    order = F.col(order_col).desc() if desc else F.col(order_col).asc()
    if (salt_groups is not None and salt_groups > 1) or hot_keys is not None:
        df = _pre_cap_hot_groups(
            df, group_col, key_col, n,
            salt_groups if salt_groups and salt_groups > 1 else 2,
            (order, F.col(key_col)), hot_keys,
        )
    rank = F.row_number().over(
        Window.partitionBy(group_col).orderBy(order, F.col(key_col))
    )
    return df.withColumn("__rk", rank).filter(F.col("__rk") <= n).drop("__rk")


def mix_sources(
    df: DataFrame,
    source_col: str,
    weights: Dict[str, float],
    key_col: str,
    seed: str = "",
    default_weight: float = 1.0,
    out_col: str = "copy",
) -> DataFrame:
    """Repeat each row ``weight[source]`` times (fractional part resolved
    per-row by hash), emitting a 1-based ``copy`` index.

    Weight 0 drops the source; weight <1 downsamples it; weight 2.5 yields
    2 copies always and a 3rd for a deterministic 50% of rows.
    """
    if any(w < 0 for w in weights.values()) or default_weight < 0:
        raise ValueError("weights must be >= 0")
    w = None
    for name, weight in weights.items():
        branch = (F.col(source_col) == name, F.lit(float(weight)))
        w = F.when(*branch) if w is None else w.when(*branch)
    w = F.lit(float(default_weight)) if w is None else w.otherwise(
        F.lit(float(default_weight))
    )
    whole = F.floor(w).cast("int")
    frac_buckets = F.round((w - F.floor(w)) * BUCKETS).cast("bigint")
    extra = (hash_bucket(F.col(key_col), "mix:" + seed) < frac_buckets).cast("int")
    n = whole + extra
    copies = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(out_col, F.explode(copies))


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    seq_len: int,
    shard_col: Column | None = None,
    shards: int = 1024,
    seed: str = "pack",
) -> DataFrame:
    """Concat-then-chunk sequence packing — assign every document its
    token span in fixed-length training sequences (the GPT-style packing
    step: shuffle docs, concatenate, cut every ``seq_len`` tokens;
    documents may span a boundary).

    Documents are first placed in a shard (``shard_col`` if given, else
    :func:`hash_bucket` of the id with ``seed`` — deterministic like
    every sampler here), then laid out in (shard, id) order. Output adds:

    - ``pack_shard``      — the shard;
    - ``start_tok``       — the doc's first token offset WITHIN the shard
      stream;
    - ``first_seq`` / ``last_seq`` — the range of seq_len-sized sequences
      the doc touches (``shard * 2**32 + local_seq`` would globalize;
      sequence ids here are shard-local).

    100 TB shape: the running offset is a window sum partitioned BY SHARD
    — there is no global ordering and no single-task funnel; each shard's
    prefix sum is an independent partition of one shuffle, exactly how
    production packers scale (pack within shards, shards are the unit of
    parallelism). Rows-per-shard ≈ N/shards keeps every window partition
    small; raise ``shards`` with corpus size.
    """
    shard = (
        shard_col
        if shard_col is not None
        else (hash_bucket(F.col(id_col).cast("string"), seed) % shards)
    )
    out = df.withColumn("pack_shard", shard)
    w = (
        Window.partitionBy("pack_shard")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    end = F.sum(F.col(n_tokens_col)).over(w)
    out = out.withColumn("__end_tok", end)
    out = out.withColumn(
        "start_tok", (F.col("__end_tok") - F.col(n_tokens_col)).cast("long")
    )
    return (
        out.withColumn(
            "first_seq", F.floor(F.col("start_tok") / seq_len).cast("long")
        )
        .withColumn(
            # a doc's last token is end_tok - 1; empty docs (0 tokens)
            # occupy no sequence — pin last_seq = first_seq for them
            "last_seq",
            F.greatest(
                F.floor((F.col("__end_tok") - 1) / seq_len),
                F.floor(F.col("start_tok") / seq_len),
            ).cast("long"),
        )
        .drop("__end_tok")
    )


def train_shuffle(
    df: DataFrame, id_col: str, shards: int, seed: str = "",
    partitions: Optional[int] = None,
) -> DataFrame:
    """Deterministic global shuffle + fixed shard layout — the training
    OUTPUT stage: every document gets a ``(shard, pos)`` coordinate that
    is a pure function of (id, seed), so reruns, repartitions and
    incremental rebuilds all produce the identical layout (the property
    resumable training jobs depend on: step N reads the same batch on
    every rerun).

    - ``shard``: :func:`hash_bucket` of the id under the ``shard:``
      namespace, mod ``shards`` — balanced in expectation (±√(N/shards)).
    - ``pos``: 0-based rank within the shard, ordered by an INDEPENDENT
      ``order:``-namespaced md5 (ties by id). Two namespaces, like every
      sampler here: one hash for placement and the same hash for order
      would make pos a monotone function of shard-local hash — fine — but
      correlating with any other operator seeded the same way.

    Reading shard 0 pos 0.., then shard 1 pos 0.. is a deterministic
    pseudorandom permutation of the corpus: cross-shard order comes from
    the shard hash, within-shard order from the order hash.

    100 TB shape: ONE hash-partitioned shuffle (by shard); each window
    partition holds ≈N/shards rows and ranks independently — no global
    sort, no single-task funnel, no two-pass rank whose second job could
    see different range boundaries. Raise ``shards`` with corpus size to
    keep window partitions executor-sized.
    """
    if shards <= 0:
        raise ValueError(f"shards must be positive, got {shards}")
    key = F.col(id_col).cast("string")
    out = df.withColumn(
        "shard", hash_bucket(key, "shard:" + seed, shards).cast("int")
    ).withColumn(
        "__okey", F.md5(F.concat(key, F.lit("order:" + seed)))
    )
    if partitions is not None:
        # pre-satisfy the window's ClusteredDistribution(shard) with an
        # exchange of exactly this partition count — a downstream
        # consumer that wants shard-aligned partitions (write_shards)
        # then pays ONE exchange total instead of window-shuffle +
        # re-repartition of the full corpus
        out = out.repartition(partitions, "shard")
    w = Window.partitionBy("shard").orderBy("__okey", F.col(id_col))
    return out.withColumn(
        "pos", (F.row_number().over(w) - 1).cast("long")
    ).drop("__okey")


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    shards: int,
    seed: str = "",
    fmt: str = "parquet",
    mode: str = "error",
) -> None:
    """Materialize the :func:`train_shuffle` layout: one directory per
    shard (``shard=K/``), rows inside each shard's files in ``pos``
    order — the terasort-free way to write a globally shuffled corpus.
    ``repartition(shards, shard)`` lines file boundaries up with shard
    boundaries so a trainer maps one shard directory to one reader."""
    out = train_shuffle(df, id_col, shards, seed, partitions=shards)
    (
        # the window above already hash-partitioned by shard into exactly
        # `shards` partitions (partitions=shards satisfies the window's
        # required distribution), so the write needs NO second exchange —
        # each task holds one whole shard, already in pos order
        out.sortWithinPartitions("shard", "pos")
        .write.partitionBy("shard")
        .mode(mode)
        .format(fmt)
        .save(path)
    )


def sketch_balanced_sample(
    emb: DataFrame,
    per_bucket: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    lsh_seed: int = 7,
    dim: int = None,
    seed: str = "",
) -> DataFrame:
    """Topic-balanced corpus selection over an embedding column: bucket by
    the deterministic hyperplane sign-sketch (each bucket ≈ a region of
    embedding space, :func:`seqspark.pipeline.ann.hyperplane_sketch`), then
    keep a hash-uniform draw of at most ``per_bucket`` rows per bucket —
    so no topic region contributes more than its cap, the cheap
    deterministic counterpart of cluster-balanced sampling (SemDeDup /
    IVF k-means are the learned-centroid variants; this one needs no
    training pass and is ORACLE-reproducible end to end: literal planes +
    md5 ranks).

    Plan: one narrow sketch projection (``bits`` dot products per row,
    whole-stage codegen), one shuffle on the sketch key for the windowed
    cap — skewed mega-buckets are exactly what the cap discards. Returns
    the input columns plus ``sketch``."""
    if per_bucket < 0:
        raise ValueError("per_bucket must be >= 0")
    from .ann import hyperplane_sketch

    sk = hyperplane_sketch(emb, vec_col, bits=bits, seed=lsh_seed, dim=dim)
    rank = F.row_number().over(
        Window.partitionBy("sketch").orderBy(
            hash_bucket(F.col(id_col).cast("string"), "balance:" + seed),
            F.col(id_col),
        )
    )
    return sk.withColumn("__rk", rank).filter(
        F.col("__rk") <= per_bucket
    ).drop("__rk")
