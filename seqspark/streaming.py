"""Structured Streaming ingest + async search.

- :func:`stream_ingest` — the reference's continuously-appending active
  fraction (`frac/active.go`) becomes a checkpointed file-source stream:
  each micro-batch runs the same ingest transform and appends to the
  :class:`seqspark.store.DocStore`; checkpoint replay replaces the
  reference's crash-replay of unsealed data
  (`docs/en/internal/fractions.md` "Replaying").
- :class:`AsyncSearcher` — persisted long-running search jobs
  (`fracmanager/async_searcher.go:32-200`): the request is recorded, the
  result set written to its own parquet table, status is queryable, results
  survive restarts and expire with retention.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from .ingest import ingest_docs
from .mapping import Mapping
from .store import DocStore


def stream_ingest(
    spark: SparkSession,
    input_dir: str,
    store: DocStore,
    mapping: Mapping,
    checkpoint_dir: str,
    trigger_once: bool = True,
    case_sensitive: bool = False,
    allowed_drift_ms: Optional[int] = None,
    future_drift_ms: Optional[int] = None,
):
    """File-source streaming ingest: NDJSON files dropped into ``input_dir``
    are tokenized per mapping and appended to the store.

    Uses ``foreachBatch`` so the batch path (:func:`ingest_docs` +
    ``DocStore.append``) is reused verbatim — the streaming/batch parity the
    reference tests as Active-vs-Sealed (`tests/suites/single.go:96-120`).
    """
    raw_stream = spark.readStream.format("text").load(input_dir).withColumnRenamed(
        "value", "raw"
    )

    from .ingest import ALLOWED_DRIFT_MS, FUTURE_DRIFT_MS

    drift = ALLOWED_DRIFT_MS if allowed_drift_ms is None else allowed_drift_ms
    future = FUTURE_DRIFT_MS if future_drift_ms is None else future_drift_ms

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        docs = ingest_docs(
            batch_df,
            mapping,
            case_sensitive=case_sensitive,
            allowed_drift_ms=drift,
            future_drift_ms=future,
        )
        store.append(docs)

    writer = (
        raw_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


class AsyncSearcher:
    """Persisted search jobs with status + retention
    (reference `fracmanager/async_searcher.go`, API
    `proxyapi/grpc_async_search.go:15-62`)."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    def _job_dir(self, job_id: str) -> str:
        return os.path.join(self.base_dir, job_id)

    def start(self, result_df: DataFrame, query: str, ttl_sec: int = 3600) -> str:
        job_id = uuid.uuid4().hex
        jd = self._job_dir(job_id)
        os.makedirs(jd, exist_ok=True)
        meta = {
            "job_id": job_id,
            "query": query,
            "status": "running",
            "started_at": time.time(),
            "ttl_sec": ttl_sec,
        }
        with open(os.path.join(jd, "meta.json"), "w") as f:
            json.dump(meta, f)
        result_df.write.mode("overwrite").parquet(os.path.join(jd, "result"))
        meta["status"] = "done"
        meta["finished_at"] = time.time()
        with open(os.path.join(jd, "meta.json"), "w") as f:
            json.dump(meta, f)
        return job_id

    def status(self, job_id: str) -> Optional[dict]:
        p = os.path.join(self._job_dir(job_id), "meta.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def fetch(self, job_id: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._job_dir(job_id), "result"))

    def expire(self) -> list[str]:
        """Drop jobs past their TTL (`fracmanager/async_searcher.go`
        retention loop)."""
        import shutil

        dropped = []
        for job_id in os.listdir(self.base_dir):
            meta = self.status(job_id)
            if meta and time.time() - meta["started_at"] > meta.get("ttl_sec", 3600):
                shutil.rmtree(self._job_dir(job_id), ignore_errors=True)
                dropped.append(job_id)
        return dropped
