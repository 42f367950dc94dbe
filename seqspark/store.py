"""Time-partitioned parquet document store.

Spark-first replacement for the reference's fraction files
(`docs/en/internal/fractions.md`, `fracmanager/fracmanager.go`):

- *active fraction / sealing*  → micro-batch parquet appends + a compaction
  job (`compact`) that rewrites small files per partition
  (`fracmanager/fracmanager.go:344-385` seal);
- *rotation / retention*       → oldest time-partition deletes when the
  store exceeds a byte budget or an age bound
  (`fracmanager/fracmanager.go:106-148`);
- *time pruning at search*     → the `ts_bucket` partition column lets any
  `from`/`to` window prune whole directories before a single row is read —
  the 100 TB path: a 1h query over a month of data touches 1/720 of files.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "ts_bucket"


class DocStore:
    """A parquet-backed document store partitioned by time bucket."""

    def __init__(self, spark: SparkSession, path: str, bucket_fmt: str = "yyyy-MM-dd-HH"):
        self.spark = spark
        self.path = path
        self.bucket_fmt = bucket_fmt

    def append(self, df: DataFrame, ts_col: str = "ts") -> None:
        (
            df.withColumn(PARTITION_COL, F.date_format(F.col(ts_col), self.bucket_fmt))
            .write.partitionBy(PARTITION_COL)
            .mode("append")
            .parquet(self.path)
        )

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    # ------------------------------------------------------------- retention

    def partitions(self) -> list[str]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            d.split("=", 1)[1]
            for d in os.listdir(self.path)
            if d.startswith(f"{PARTITION_COL}=")
        )

    def _partition_size(self, bucket: str) -> int:
        p = os.path.join(self.path, f"{PARTITION_COL}={bucket}")
        total = 0
        for root, _dirs, files in os.walk(p):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
        return total

    def total_size(self) -> int:
        return sum(self._partition_size(b) for b in self.partitions())

    def retain(
        self,
        max_total_bytes: Optional[int] = None,
        min_bucket: Optional[str] = None,
    ) -> list[str]:
        """Drop oldest partitions while the store exceeds ``max_total_bytes``,
        and any partition older than ``min_bucket``
        (reference `fracmanager/fracmanager.go:106-148` rotation: oldest
        fractions deleted when total size exceeds --total-size)."""
        dropped: list[str] = []
        buckets = self.partitions()
        if min_bucket is not None:
            for b in [b for b in buckets if b < min_bucket]:
                self._drop(b)
                dropped.append(b)
            buckets = [b for b in buckets if b >= min_bucket]
        if max_total_bytes is not None:
            sizes = {b: self._partition_size(b) for b in buckets}
            total = sum(sizes.values())
            for b in buckets:  # oldest first
                if total <= max_total_bytes:
                    break
                self._drop(b)
                total -= sizes[b]
                dropped.append(b)
        return dropped

    def _drop(self, bucket: str) -> None:
        shutil.rmtree(os.path.join(self.path, f"{PARTITION_COL}={bucket}"), ignore_errors=True)

    # ------------------------------------------------------------ compaction

    def compact(self, bucket: str, target_files: int = 1) -> None:
        """Rewrite one partition into ``target_files`` files — the sealing
        analog (`frac/active_sealer.go`): many small append files become one
        immutable well-sorted file; sorting by (ts, rid) maximizes parquet
        min/max pruning for time predicates."""
        part_path = os.path.join(self.path, f"{PARTITION_COL}={bucket}")
        df = self.spark.read.parquet(part_path)
        tmp = part_path + ".compact"
        (
            df.sort("ts")
            .coalesce(target_files)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        shutil.rmtree(part_path)
        os.rename(tmp, part_path)
