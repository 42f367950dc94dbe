"""Gap-based sessionization of event streams.

Beyond the reference (seq-db has no session operator) — the classic
log-analytics transform: consecutive events of the same actor belong to one
session until a silence gap exceeds ``gap_ms``.

One shuffle on the actor key (the window partition); the session id is a
running count of gap-breaks, so the whole operator is two window
expressions inside one partitioning — no joins, no iteration, and the
partition key (actor) is the natural high-cardinality key that spreads
evenly at 100 TB.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    actor_col: str,
    ts_col: str = "ts",
    gap_ms: int = 30 * 60 * 1000,
    out_col: str = "session_seq",
) -> DataFrame:
    """Append a per-actor session sequence number (1-based).

    A new session starts at the actor's first event and whenever the gap
    since their previous event is STRICTLY greater than ``gap_ms``.
    Deterministic for ties via the (ts) ordering within the actor.

    Skew: lag/running-sum chain EVERY consecutive event pair of an actor,
    so a mega-actor (a bot emitting half the stream) is irreducibly one
    sorted window partition — salting would sever the chains it must
    count, and AQE cannot split window partitions (its skew handling is
    join/shuffle-read only). Measured envelope in BASELINE.md (skew
    stress): the operator stays O(|actor| log |actor|) on the hot key and
    the mitigation is upstream — bound per-actor volume first
    (:func:`seqspark.pipeline.sampling.cap_per_group` with
    ``salt_groups``), :func:`sessionize_bucketed` when cross-bucket
    session continuity is not required, or :func:`sessionize_scalable`
    — the EXACT two-phase variant whose window partitions are bounded
    by construction.
    """
    if gap_ms < 0:
        raise ValueError("gap_ms must be >= 0")
    w = Window.partitionBy(actor_col).orderBy(F.col(ts_col))
    ts_ms = F.unix_millis(F.col(ts_col))
    prev = F.lag(ts_ms).over(w)
    is_break = F.when(
        prev.isNull() | ((ts_ms - prev) > F.lit(gap_ms)), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        out_col,
        F.sum(is_break).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("int"),
    )


def sessionize_bucketed(
    df: DataFrame,
    actor_col: str,
    ts_col: str = "ts",
    gap_ms: int = 30 * 60 * 1000,
    bucket_ms: int = 24 * 3600 * 1000,
    out_col: str = "session_seq",
    bucket_col: str = "session_bucket",
) -> DataFrame:
    """:func:`sessionize` with the window partition key split into
    (actor, coarse time bucket) — the skew mitigation its docstring
    points at when one actor dominates the stream and cross-bucket
    session continuity is not required. A mega-actor's event chain
    shards into ``bucket_ms`` slices, so no window task ever sorts more
    than one bucket's worth of one actor (measured envelope: the
    unbucketed single-key window costs 73 s for a 10M-event actor,
    BASELINE.md round 11).

    Semantics delta, stated exactly: a session whose silence-free run
    STRADDLES a bucket boundary is split in two (the first event of the
    new bucket always starts session 1 of that bucket), and ``out_col``
    is bucket-local — (actor, bucket, session_seq) is the session key.
    Appropriate when ``bucket_ms`` >> the session gap (e.g. day buckets
    for 30-minute-gap sessions: only sessions spanning midnight split).
    """
    if gap_ms < 0:
        raise ValueError("gap_ms must be >= 0")
    if bucket_ms <= 0:
        raise ValueError("bucket_ms must be > 0")
    ts_ms = F.unix_millis(F.col(ts_col))
    # floor-aligned for ALL timestamps (Spark % keeps the dividend's
    # sign, which would right-align pre-epoch buckets and disagree with
    # sessionize_scalable's floor(ts/bucket) boundaries).
    bucket = (F.floor(ts_ms / F.lit(bucket_ms)) * F.lit(bucket_ms)).alias(
        bucket_col
    )
    out = df.withColumn(bucket_col, bucket)
    w = Window.partitionBy(actor_col, bucket_col).orderBy(F.col(ts_col))
    prev = F.lag(ts_ms).over(w)
    is_break = F.when(
        prev.isNull() | ((ts_ms - prev) > F.lit(gap_ms)), F.lit(1)
    ).otherwise(F.lit(0))
    return out.withColumn(
        out_col,
        F.sum(is_break).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("int"),
    )


def sessionize_scalable(
    df: DataFrame,
    actor_col: str,
    ts_col: str = "ts",
    gap_ms: int = 30 * 60 * 1000,
    bucket_ms: int = 24 * 3600 * 1000,
    out_col: str = "session_seq",
    hot_threshold: Optional[int] = 1_000_000,
    hot_actors: Optional[DataFrame] = None,
) -> DataFrame:
    """EXACT :func:`sessionize` with bounded window partitions — the
    answer to the hot-actor skew this module documents, without the
    boundary-splitting compromise of :func:`sessionize_bucketed`.

    ``hot_threshold`` (default 1M rows) routes ONLY detected-hot actors
    (one map-side count + broadcast, the
    :func:`~seqspark.pipeline.sampling._pre_cap_hot_groups` pattern)
    through the two-phase computation below; everyone else takes the
    plain single window. Measured reason (BASELINE.md round 11): on
    UNIFORM actors the unconditional two-phase path cost 4.7x (the
    extra agg + stitch window + join buy nothing when no partition is
    hot), while on a 10M-event hot actor it wins 2.7x — the hybrid
    takes each side's better branch, exactly. ``hot_threshold=None``
    forces every actor through the two-phase path.

    ``hot_actors`` (a one-column frame of actor keys, e.g. from
    :func:`seqspark.pipeline.sampling.hot_group_keys`) replaces the
    detection count entirely — a pipeline chaining several skew-aware
    operators over one frame should pay that pass once and share it.
    Exact for ANY supplied set (the two-phase path is exact for every
    actor; a generous or stale hot list only shifts which branch runs).

    Two phases (for the hot rows):

    1. events window per (actor, time bucket): bucket-local session seq
       plus per-bucket summaries (first/last ts, session count) — no
       window task ever sorts more than ``bucket_ms`` of one actor;
    2. summary window per actor ORDERED BY BUCKET: consecutive
       non-empty buckets chain when ``first_ts(k) - last_ts(k-1) <=
       gap_ms`` (exactly the event-gap rule — buckets between them are
       empty, so that delta IS the real event gap). With ``S_k`` local
       sessions in bucket k and merge flag ``m_k``, the global offset
       for bucket k is ``Σ_{j<k} S_j − Σ_{j<=k} m_j``: each chained
       boundary collapses two sessions into one, and bucket k's local
       seq 1 lands exactly on the previous bucket's last global seq
       when merged. The summary frame has one row per (actor, non-empty
       bucket) — a 10M-event bot across 1000 day-buckets is 1000
       summary rows, so phase 2's per-actor window partition is tiny
       by construction.

    Output: the input plus ``out_col`` — IDENTICAL to
    :func:`sessionize` (hash-pinned by the ``sessionize_scalable``
    contract entry against the single-window SQL oracle, and
    property-tested including gap > bucket_ms, empty buckets, and
    boundary ties). One extra aggregation + one (actor, bucket)-keyed
    join over :func:`sessionize`'s single window — the cost of making
    the partition key safe at any skew."""
    if gap_ms < 0:
        raise ValueError("gap_ms must be >= 0")
    if bucket_ms <= 0:
        raise ValueError("bucket_ms must be > 0")
    cols = df.columns
    if hot_actors is not None or hot_threshold is not None:
        h_c, k_c = "__shot", "__shk"
        while h_c in cols:
            h_c += "_"
        while k_c in cols:
            k_c += "_"
        if hot_actors is not None:
            # precomputed hot set: skip the detection count; distinct()
            # guards a frame with repeats from duplicating joined rows.
            # Driver-side emptiness check first: with nothing hot, the
            # tag-join + two-filter + union machinery costs ~3x the plain
            # window for zero benefit (measured, BASELINE.md round 12) —
            # take(1) on the (typically cached, tiny) hot frame is the
            # cheap escape to the exact plain path.
            if not hot_actors.take(1):
                return sessionize(df, actor_col, ts_col, gap_ms, out_col)
            src = hot_actors.columns[0]
            hot = (
                hot_actors.select(F.col(src).alias(k_c))
                .distinct()
                .withColumn(h_c, F.lit(1))
            )
        else:
            if hot_threshold < 1:
                raise ValueError("hot_threshold must be >= 1 (or None)")
            hot = (
                df.groupBy(actor_col)
                .agg(F.count(F.lit(1)).alias("__sn"))
                .filter(F.col("__sn") > hot_threshold)
                .select(F.col(actor_col).alias(k_c))
                .withColumn(h_c, F.lit(1))
            )
        # null-safe tag: a mega NULL-actor group is often the hottest
        # key of all (missing/unknown actor) and must still be detected.
        tagged = df.join(
            F.broadcast(hot),
            F.col(actor_col).eqNullSafe(F.col(k_c)),
            "left",
        ).drop(k_c)
        cold = sessionize(
            tagged.filter(F.col(h_c).isNull()).select(*cols),
            actor_col, ts_col, gap_ms, out_col,
        )
        hot_rows = tagged.filter(F.col(h_c).isNotNull()).select(*cols)
        return cold.unionByName(
            sessionize_scalable(
                hot_rows, actor_col, ts_col, gap_ms, bucket_ms, out_col,
                hot_threshold=None,
            )
        )
    b_c, l_c = "__sb", "__sl"
    while b_c in cols:
        b_c += "_"
    while l_c in cols:
        l_c += "_"
    ts_ms = F.unix_millis(F.col(ts_col))
    bucketed = df.withColumn(b_c, F.floor(ts_ms / F.lit(bucket_ms)))
    w = Window.partitionBy(actor_col, b_c).orderBy(F.col(ts_col))
    prev = F.lag(ts_ms).over(w)
    is_break = F.when(
        prev.isNull() | ((ts_ms - prev) > F.lit(gap_ms)), F.lit(1)
    ).otherwise(F.lit(0))
    local = bucketed.withColumn(
        l_c,
        F.sum(is_break).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    summary = local.groupBy(actor_col, b_c).agg(
        F.min(ts_ms).alias("__first"),
        F.max(ts_ms).alias("__last"),
        F.max(F.col(l_c)).alias("__n"),
    )
    sw = Window.partitionBy(actor_col).orderBy(b_c)
    merged = F.when(
        (F.col("__first") - F.lag("__last").over(sw)) <= F.lit(gap_ms),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = sw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    oa_c, ob_c = "__soa", "__sob"
    while oa_c in cols:
        oa_c += "_"
    while ob_c in cols:
        ob_c += "_"
    offsets = (
        summary.withColumn("__m", merged)
        .withColumn(
            "__base",
            F.coalesce(F.sum("__n").over(run) - F.col("__n"), F.lit(0))
            - F.sum("__m").over(run),
        )
        .select(
            F.col(actor_col).alias(oa_c),
            F.col(b_c).alias(ob_c),
            "__base",
        )
    )
    # null-safe join: plain sessionize keeps NULL-actor (and NULL-ts)
    # rows — an inner equi-join here would silently drop them, breaking
    # the documented exact equivalence.
    return (
        local.join(
            offsets,
            F.col(actor_col).eqNullSafe(F.col(oa_c))
            & F.col(b_c).eqNullSafe(F.col(ob_c)),
        )
        .withColumn(out_col, (F.col("__base") + F.col(l_c)).cast("int"))
        .select(*cols, out_col)
    )


def session_stats(
    df: DataFrame,
    actor_col: str,
    ts_col: str = "ts",
    gap_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """(actor, session_seq, n_events, start_ms, end_ms, duration_ms) —
    one extra aggregation over the sessionized frame, same partitioning."""
    s = sessionize(df, actor_col, ts_col, gap_ms)
    ts_ms = F.unix_millis(F.col(ts_col))
    return (
        s.groupBy(F.col(actor_col), F.col("session_seq"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_ms).alias("start_ms"),
            F.max(ts_ms).alias("end_ms"),
        )
        .withColumn("duration_ms", F.col("end_ms") - F.col("start_ms"))
    )
