"""Loaders for the driver's synthetic tables (/root/testdata/sf*/).

The testdata parquet stores timestamps as INT64 TIMESTAMP(NANOS), which
Spark's vectorized reader rejects; we read them with
``spark.sql.legacy.parquet.nanosAsLong`` and convert to proper TIMESTAMP
columns with integer division (``DIV 1000`` — no double round-trip, no
precision loss on large epoch-nanos).
"""

from __future__ import annotations

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in TS_COLS.get(name, []):
        # only nanos-encoded (read back as bigint) columns need conversion;
        # some sf dirs store these as plain micros timestamps already
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return df
