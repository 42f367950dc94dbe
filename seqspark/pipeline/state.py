"""Crash-safe persisted-state folds for incremental pipeline operators.

Several operators maintain additive sufficient statistics next to the
corpus (DSIR bucket counts, BPE word counts, LSH band state) so the
historical corpus is NEVER rescanned when it grows. This module holds
the one write-then-swap discipline they share — the same shape as the
doc store's compaction (`seqspark/store.py:compact`,
reference `fracmanager/fracmanager.go` seal-then-swap): the merged frame
lands in an underscore-prefixed ``_tmp`` sibling first (Spark ignores
it), the live directory is moved aside, tmp renamed in, the old state
dropped. A crash at any point leaves either the old or the new state
readable, never a half-written directory.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame


def update_parquet_state(
    spark,
    state_path: str,
    batch: DataFrame,
    merge_fn: Callable[[DataFrame, DataFrame], DataFrame],
    coalesce: Optional[int] = 1,
) -> DataFrame:
    """Fold ``batch`` into the parquet state at ``state_path`` (created
    on first call) and return the updated state frame.

    ``merge_fn(saved, batch)`` produces the merged frame when state
    exists; state frames are expected to be small (bounded by model
    dimensionality, not corpus size), hence ``coalesce=1`` by default —
    pass None to keep the batch's partitioning for larger states.

    Safe under concurrent callers in ONE process (per-path lock, the
    store's); cross-process coordination is the caller's job, as with
    the doc store."""
    from ..store import _HadoopFS, _write_lock

    fs = _HadoopFS(spark, state_path)

    def must(ok: bool, what: str) -> None:
        # Hadoop FileSystem.rename reports failure as False, not an
        # exception — an unchecked failed rename here would fall through
        # to the old-state delete and destroy the only surviving copy
        if not ok:
            raise IOError(f"state swap failed: {what} under {state_path}")

    with _write_lock(state_path):
        live = fs.path()
        parent = live.getParent()
        Path = spark._jvm.org.apache.hadoop.fs.Path
        tmp = Path(parent, "_tmp-" + live.getName())
        old = Path(parent, "_old-" + live.getName())
        # CRASH RECOVERY before reading: a previous process may have died
        # between its two renames, leaving no live dir. tmp (written
        # COMPLETELY before any rename starts) is then the finished new
        # state — complete its swap; failing that, _old- is the previous
        # state — restore it. Without this, the next update would treat
        # its batch as the entire state and the old-state delete below
        # would silently drop all history.
        if not fs.exists(live):
            if fs.exists(tmp) and fs.exists(old):
                must(fs.rename(tmp, live), "recover tmp -> live")
                fs.delete(old)
            elif fs.exists(old):
                must(fs.rename(old, live), "recover old -> live")
        if fs.exists(live):
            merged = merge_fn(spark.read.parquet(state_path), batch)
        else:
            merged = batch
        # materialize BEFORE touching the live dir: the merged plan reads it
        if coalesce is not None:
            merged = merged.coalesce(coalesce)
        merged.write.mode("overwrite").parquet(str(tmp.toUri()))
        if fs.exists(old):
            fs.delete(old)
        if fs.exists(live):
            must(fs.rename(live, old), "live -> old")
        must(fs.rename(tmp, live), "tmp -> live")
        fs.delete(old)
    return spark.read.parquet(state_path)
