"""Loaders for the driver's synthetic tables (/root/testdata/sf*/).

The testdata parquet stores timestamps as INT64 TIMESTAMP(NANOS), which
Spark's vectorized reader rejects; we read them with
``spark.sql.legacy.parquet.nanosAsLong`` and convert to proper TIMESTAMP
columns with integer division (``DIV 1000`` — no double round-trip, no
precision loss on large epoch-nanos).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: nanos-encoded timestamp columns per table
TS_COLS = {
    "events": ["ts"],
    "lineitem": ["l_shipdate"],
    "orders": ["o_orderdate"],
}

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ntz_as_utc(col):
    """TIMESTAMP_NTZ → TIMESTAMP, reading the naive wall time as UTC
    regardless of ``spark.sql.session.timeZone``. Pure date arithmetic —
    no cast through the session zone, so wall times inside a DST
    spring-forward gap convert exactly instead of shifting an hour."""
    micros = (
        F.unix_date(col.cast("date")).cast("long") * F.lit(86_400_000_000)
        + F.date_part(F.lit("HOUR"), col).cast("long") * F.lit(3_600_000_000)
        + F.date_part(F.lit("MINUTE"), col).cast("long") * F.lit(60_000_000)
        + (F.date_part(F.lit("SECOND"), col) * F.lit(1_000_000)).cast("long")
    )
    return F.timestamp_micros(micros)


#: confs every testdata read needs; applied by :func:`load_table`
_SCAN_CONFS = {
    # INT64 TIMESTAMP(NANOS) columns: read as long, converted below
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # read TIMESTAMP(isAdjustedToUTC=false) parquet as plain TIMESTAMP at
    # the scan (not TIMESTAMP_NTZ + cast): keeps ts a raw scan column so
    # time-range predicates still push down to parquet row groups
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


#: per-session memo of loaded tables (r17): `spark.read.parquet` costs
#: ~100 ms of file listing + footer schema read per call, and a contract
#: run loads the same handful of immutable testdata tables hundreds of
#: times. The cached object is a LAZY DataFrame — every action re-reads
#: the parquet bytes; only the plan construction is reused.
#: RETENTION (r18, honest version): entries live for the PROCESS
#: lifetime. The weak key never fires, because the value dict's
#: DataFrames strongly reference their SparkSession — the same cycle
#: would defeat a finalize-based eviction, so none is pretended.
#: A handful of cached frames per session is the intended cost; callers
#: that must drop them call :func:`clear_table_memo`.
_TABLE_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def clear_table_memo(spark: SparkSession) -> None:
    """Drop the session's memoized table frames. The memo pins each
    frame's FILE LISTING and schema at first read — correct for the
    immutable testdata it targets, wrong for a directory whose files
    change; call this (or reopen a new session) after rewriting files
    under a previously loaded path."""
    try:
        _TABLE_MEMO.pop(spark, None)
    except TypeError:
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with timestamp columns normalized to UTC
    TIMESTAMP.

    SESSION-WIDE SIDE EFFECT (documented, deliberate): the two parquet
    scan confs in ``_SCAN_CONFS`` are applied to the shared session — scan
    behavior is resolved from session confs at read/plan time, so they
    cannot be scoped to one DataFrame. Every read this engine performs
    needs the same values; if other code on the session reads parquet with
    nanos timestamps or relies on TIMESTAMP_NTZ inference, set the confs
    back after loading. Values already equal are skipped (no redundant
    set); DIFFERING values are overwritten.

    CACHING CAVEAT: results are memoized per (session, sf_dir, name),
    and a cached lazy frame re-reads parquet BYTES on every action but
    pins its file LISTING and schema at first read — files added,
    removed or rewritten under ``sf_dir`` later are invisible (or raise
    FileNotFound) for the session's lifetime. Intended for immutable
    test/benchmark data; for a changing directory call
    :func:`clear_table_memo` first."""
    for k, v in _SCAN_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)
    try:
        memo = _TABLE_MEMO.setdefault(spark, {})
    except TypeError:  # session type not weak-referenceable
        memo = {}
    cached = memo.get((sf_dir, name))
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c, t in df.dtypes:
        if c in TS_COLS.get(name, ()) and t == "bigint":
            # nanos-encoded INT64 timestamps (older testdata layout)
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
        elif t == "timestamp_ntz":
            # TIMESTAMP_NTZ reaching here (e.g. the conf above couldn't
            # apply to an already-analyzed plan): reinterpret the wall time
            # as a UTC instant INDEPENDENT of the session timezone — a bare
            # cast would shift epochs by the session offset. Matches
            # DuckDB's epoch() over the same naive value.
            df = df.withColumn(c, _ntz_as_utc(F.col(c)))
    memo[(sf_dir, name)] = df
    return df
