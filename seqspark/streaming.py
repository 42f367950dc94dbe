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
from pyspark.sql import functions as F

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
    index=None,
    dedup_watermark: Optional[str] = None,
):
    """File-source streaming ingest: NDJSON files dropped into ``input_dir``
    are tokenized per mapping and appended to the store.

    Uses ``foreachBatch`` so the batch path (:func:`ingest_docs` +
    ``DocStore.append``) is reused verbatim — the streaming/batch parity the
    reference tests as Active-vs-Sealed (`tests/suites/single.go:96-120`).

    ``dedup_watermark`` (e.g. ``"1 hour"``) switches on at-ingest exact
    dedup via :func:`stream_dedup`: byte-identical documents re-delivered
    within the watermark window (shipper retries, at-least-once sources)
    are dropped BEFORE they hit storage, keyed by md5 of the raw line
    with the document's parsed event time as the state clock. Off by
    default — the engine also dedups at read, like the reference.
    """
    raw_stream = spark.readStream.format("text").load(input_dir).withColumnRenamed(
        "value", "raw"
    )
    if dedup_watermark is not None:
        from .ingest import parse_event_time

        raw_stream = (
            raw_stream.withColumn(
                "__ts",
                # ingest-time fallback for docs without a parseable
                # timestamp — the clamp path's own default
                F.coalesce(
                    parse_event_time(F.col("raw")), F.current_timestamp()
                ),
            )
            .withColumn("__digest", F.md5(F.col("raw")))
        )
        raw_stream = stream_dedup(
            raw_stream, ["__digest"], ts_col="__ts",
            watermark=dedup_watermark,
        ).drop("__ts", "__digest")

    from .ingest import ALLOWED_DRIFT_MS, FUTURE_DRIFT_MS, make_ingest_transform

    drift = ALLOWED_DRIFT_MS if allowed_drift_ms is None else allowed_drift_ms
    future = FUTURE_DRIFT_MS if future_drift_ms is None else future_drift_ms
    # one projection build for the life of the stream — per-micro-batch
    # rebuilds cost ~0.3 s of driver py4j each at small trigger intervals
    transform = make_ingest_transform(
        mapping,
        case_sensitive=case_sensitive,
        allowed_drift_ms=drift,
        future_drift_ms=future,
    )

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        docs = transform(batch_df)
        if index is not None:
            docs = docs.persist()  # one transform pass for append + buckets
        store.append(docs)
        if index is not None:
            # refresh exactly the buckets this micro-batch touched — the
            # seal-time index build of `frac/active_sealer.go`, incremental
            touched = [
                r["b"]
                for r in docs.select(
                    F.date_format("ts", store.bucket_fmt).alias("b")
                )
                .distinct()
                .collect()
            ]
            index.refresh(touched)
            docs.unpersist()

    writer = (
        raw_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_histogram(
    stream_df: DataFrame,
    ts_col: str = "ts",
    interval_ms: int = 60_000,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Continuously-maintained date histogram over a streaming frame: the
    tumbling `window(ts, interval)` is the streaming twin of the batch
    histogram's `MID - MID % interval` bucketing (`frac/processor/search.go:
    169-179`), and the watermark bounds state for late data — which the
    reference needs no state for because it clamps timestamps at ingest
    (`proxy/bulk/processor.go:88-99`); we clamp too, so the watermark only
    guards the clamp window.

    Returns (bucket_ms BIGINT, cnt BIGINT); append output mode emits a
    bucket once its window is older than the watermark.
    """
    win = F.window(F.col(ts_col), f"{interval_ms} milliseconds")
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.unix_millis(F.col("w.start")).alias("bucket_ms"), "cnt")
    )


def stream_dedup(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop any row whose ``key_cols`` were already
    seen, with state bounded by the watermark — the at-ingest half of the
    reference's at-least-once story (duplicated bulks are collapsed at
    READ by replica merge, `proxy/search/ingestor.go` dedup; a training
    pipeline wants them gone before they hit storage).

    Pure built-in operator: ``dropDuplicatesWithinWatermark`` keeps one
    row per key and expires its state once the key's event time falls
    behind the watermark — so state is O(keys per watermark window), not
    O(stream history); at 100 TB/day this is the only state bound that
    survives. Exactly-once within the window, at-least-once across
    windows (a dup arriving after expiry passes — same trade the
    reference makes by deduping at read within a fetch).
    """
    wm = stream_df.withWatermark(ts_col, watermark)
    return wm.dropDuplicatesWithinWatermark(key_cols)


def sessionize_native(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    gap_ms: int = 30 * 60 * 1000,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap sessionization with Spark's BUILT-IN ``session_window`` — the
    whole state machine runs JVM-side in the streaming state store, no
    Python crossing at all. This is the preferred path whenever the
    per-session output is (start, end, count)-shaped; :func:`sessionize`
    (``applyInPandasWithState``) stays for custom per-session state the
    built-in cannot express (the §2.10 stance: built-ins first, Arrow
    state second, never row-at-a-time Python).

    Output: ``(key, session_start_ms, session_end_ms, n_events)`` where
    ``session_end_ms`` is the LAST EVENT's time (max event ts), matching
    :func:`sessionize` — the raw ``session_window.end`` is last-event +
    gap, an implementation detail of the built-in, so it is not exposed.
    Works identically on a batch frame (session_window is a grouping
    expression, not a streaming-only operator)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), f"{gap_ms} milliseconds"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.col(ts_col)).alias("__last_ts"),
        )
        .select(
            key_col,
            F.unix_millis(F.col("session_window.start")).alias(
                "session_start_ms"
            ),
            F.unix_millis(F.col("__last_ts")).alias("session_end_ms"),
            "n_events",
        )
    )


def sessionize(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    gap_ms: int = 30 * 60 * 1000,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization with
    ``applyInPandasWithState`` (the sanctioned Arrow-batched path for state
    Spark's built-ins can't express — the reference has no stateful
    operators, this is a beyond-reference addition for event analytics).

    Emits one row per CLOSED session — ``(key, session_start_ms,
    session_end_ms, n_events)`` — when no event for ``key`` arrives within
    ``gap_ms`` of the last one (decided by event-time timeout as the
    watermark passes). State per key is three numbers; the watermark bounds
    it. Scales: state is partitioned by key across executors, batches move
    via Arrow.
    """
    import pandas as pd  # noqa: F401 (imported for executors)
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        f"{key_col} string, session_start_ms long, session_end_ms long, "
        "n_events long"
    )
    state_schema = "start_ms long, last_ms long, n long"

    def update(key, pdf_iter, state):
        import pandas as pd

        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "session_start_ms": [start_ms],
                    "session_end_ms": [last_ms],
                    "n_events": [n],
                }
            )
            return
        # keys WITH data in a batch never get a separate timeout call, so
        # session splits must happen inline: walk the sorted event times,
        # closing the open session whenever the gap is exceeded
        times = []
        for pdf in pdf_iter:
            times.extend(int(v) for v in pdf["__ts_ms"])
        times.sort()
        start_ms = last_ms = None
        n = 0
        if state.exists:
            start_ms, last_ms, n = state.get
        closed = []
        for t in times:
            if last_ms is None:
                start_ms, last_ms, n = t, t, 1
            elif t - last_ms <= gap_ms:
                last_ms = max(last_ms, t)
                n += 1
            else:
                closed.append((start_ms, last_ms, n))
                start_ms, last_ms, n = t, t, 1
        state.update((start_ms, last_ms, n))
        # clamp to just past the watermark: Spark rejects a timeout at or
        # below the current watermark with an IllegalArgumentException,
        # which a backfill of events older than watermark - gap would
        # otherwise trigger, failing the whole query. A clamped (late)
        # session simply times out on the next batch instead.
        state.setTimeoutTimestamp(
            max(last_ms + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(closed),
                "session_start_ms": [c[0] for c in closed],
                "session_end_ms": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
            }
        )

    from pyspark.sql import functions as FX

    prepared = (
        stream_df.withWatermark(ts_col, watermark)
        .withColumn("__ts_ms", FX.unix_millis(FX.col(ts_col)))
        .select(key_col, ts_col, "__ts_ms")
    )
    return prepared.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


class AsyncSearcher:
    """Persisted long-running search jobs, executed in the background
    (reference `fracmanager/async_searcher.go:32-200`, API
    `proxyapi/grpc_async_search.go:15-62`):

    - :meth:`start` records the request and returns IMMEDIATELY; the result
      set is computed on a background thread (Spark job submission is
      thread-safe on one SparkSession) and written to the job's own parquet
      table — ``status`` is observably ``running`` until then, mirroring
      the reference's background-goroutine processing
      (`async_searcher.go:104-160`);
    - the request (the query string) is persisted with the job, so
      :meth:`resume_pending` can re-execute jobs that were still
      running/pending when the process died — the reference's
      restart-resume of unfinished searches (`async_searcher.go:77-82`);
    - :meth:`expire` drops jobs past their TTL (retention loop).
    """

    def __init__(self, spark: SparkSession, base_dir: str,
                 parallelism: Optional[int] = None):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)
        self._threads: dict[str, object] = {}
        # serializes the check-then-write in _run/cancel so a cancel
        # landing between a finishing job's status read and its meta
        # write can never be overwritten by "done"
        import threading as _threading

        self._meta_lock = _threading.Lock()
        # `--async-searches-concurrency` (default numCPU,
        # `cmd/seq-db/flags.go:109`): a FIXED pool of daemon workers
        # drains a job queue, so at most ``parallelism`` async searches
        # execute at once AND a flood of starts costs queue entries, not
        # parked OS threads (thread-per-job with a semaphore would leak a
        # blocked stack per queued job). start() still returns
        # immediately; queued jobs report "running" until a worker picks
        # them up. Workers spawn lazily on the first background job.
        import queue as _queue

        self._n_workers = max(
            1, parallelism if parallelism is not None
            else (os.cpu_count() or 4)
        )
        self._queue: "_queue.Queue" = _queue.Queue()
        self._workers: list = []
        self._pool_lock = _threading.Lock()

    def _job_dir(self, job_id: str) -> str:
        return os.path.join(self.base_dir, job_id)

    def _write_meta(self, job_id: str, meta: dict) -> None:
        # write-then-rename so readers never observe a torn meta.json
        p = os.path.join(self._job_dir(job_id), "meta.json")
        with open(p + ".tmp", "w") as f:
            json.dump(meta, f)
        os.replace(p + ".tmp", p)

    class _JobHandle:
        """Completion handle for a queued/running job — the Thread-shaped
        surface ``wait``/``expire`` rely on (``join``/``is_alive``)."""

        def __init__(self) -> None:
            import threading

            self._done = threading.Event()

        def is_alive(self) -> bool:
            return not self._done.is_set()

        def join(self, timeout: Optional[float] = None) -> None:
            self._done.wait(timeout)

        def finish(self) -> None:
            self._done.set()

    def _ensure_workers(self) -> None:
        import threading

        with self._pool_lock:
            if self._workers:
                return
            for i in range(self._n_workers):
                t = threading.Thread(
                    target=self._worker, daemon=True,
                    name=f"async-search-{i}",
                )
                self._workers.append(t)
                t.start()

    def _worker(self) -> None:
        while True:
            job_id, factory, handle = self._queue.get()
            try:
                # a job canceled while queued must not execute at all
                if (self.status(job_id) or {}).get("status") != "canceled":
                    self._run(job_id, factory)
            finally:
                handle.finish()
                self._queue.task_done()

    def _submit(self, job_id: str, df_factory) -> None:
        handle = self._JobHandle()
        self._threads[job_id] = handle
        self._ensure_workers()
        self._queue.put((job_id, df_factory, handle))

    def _run(self, job_id: str, df_factory) -> None:
        meta = self.status(job_id) or {}
        try:
            df = df_factory()
            df.write.mode("overwrite").parquet(
                os.path.join(self._job_dir(job_id), "result")
            )
            meta["status"] = "done"
        except Exception as e:  # surfaced via status(), like the reference's
            meta["status"] = "error"  # per-job error field
            meta["error"] = str(e)
        meta["finished_at"] = time.time()
        # a concurrent cancel() wins: its meta rewrite marked the job
        # canceled, and a canceled job must never flip to done/error
        # (`proxyapi/grpc_async_search.go` CancelAsyncSearch). The lock
        # makes check-then-write atomic against cancel()'s own
        # check-then-write.
        with self._meta_lock:
            current = self.status(job_id)
            if current is None or current.get("status") == "canceled":
                # canceled jobs never publish; a None status means the job
                # dir was expired/deleted mid-run — writing meta.json would
                # resurrect a deleted job (or raise into the daemon thread)
                return
            self._write_meta(job_id, meta)

    def cancel(self, job_id: str) -> bool:
        """Cancel an ongoing async search (CancelAsyncSearch,
        `proxyapi/grpc_async_search.go`): marks the persisted job canceled
        so its result is never published; the in-flight Spark job drains
        harmlessly (its completion sees the canceled marker and discards).
        Canceling a finished/unknown job is a no-op returning False."""
        with self._meta_lock:
            meta = self.status(job_id)
            if meta is None or meta.get("status") != "running":
                return False
            meta["status"] = "canceled"
            meta["finished_at"] = time.time()
            self._write_meta(job_id, meta)
            return True

    def start(
        self,
        query: str,
        df_factory,
        ttl_sec: int = 3600,
        background: bool = True,
        job_id: str = None,
    ) -> str:
        """Register and launch a job. ``df_factory`` is a zero-arg callable
        producing the result DataFrame (so resume can re-create it from the
        persisted query). Returns the job id immediately.

        ``job_id`` (r13): caller-supplied id — the internal StoreApi's
        StartAsyncSearch carries the PROXY-generated search_id
        (`api/storeapi/store_api.proto` StartAsyncSearchRequest.search_id),
        so the store must accept it instead of minting its own. Sanitized
        to [A-Za-z0-9._-] because it becomes a directory name."""
        if job_id is not None:
            if not job_id or any(
                not (c.isalnum() or c in "._-") for c in job_id
            ):
                raise ValueError(f"invalid job id {job_id!r}")
        else:
            job_id = uuid.uuid4().hex
        jd = self._job_dir(job_id)
        os.makedirs(jd, exist_ok=True)
        self._write_meta(
            job_id,
            {
                "job_id": job_id,
                "query": query,
                "status": "running",
                "started_at": time.time(),
                "ttl_sec": ttl_sec,
            },
        )
        if background:
            self._submit(job_id, df_factory)
        else:
            self._run(job_id, df_factory)
        return job_id

    def wait(self, job_id: str, timeout: Optional[float] = None) -> Optional[dict]:
        t = self._threads.get(job_id)
        if t is not None:
            t.join(timeout)
        return self.status(job_id)

    def status(self, job_id: str) -> Optional[dict]:
        p = os.path.join(self._job_dir(job_id), "meta.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def jobs(self) -> list[dict]:
        out = []
        for job_id in sorted(os.listdir(self.base_dir)):
            meta = self.status(job_id)
            if meta:
                out.append(meta)
        return out

    def fetch(self, job_id: str) -> DataFrame:
        meta = self.status(job_id)
        if not meta or meta.get("status") != "done":
            raise RuntimeError(
                f"job {job_id} is not done: {meta and meta.get('status')}"
            )
        return self.spark.read.parquet(os.path.join(self._job_dir(job_id), "result"))

    def resume_pending(self, df_factory_for_query) -> list[str]:
        """Re-execute jobs that never finished (process died mid-run):
        reference `fracmanager/async_searcher.go:77-82` resumes persisted
        unfinished requests on startup. ``df_factory_for_query(query_str)``
        rebuilds the result DataFrame from the persisted request."""
        resumed = []
        for meta in self.jobs():
            if meta.get("status") == "running" and meta["job_id"] not in self._threads:
                job_id = meta["job_id"]
                self._submit(
                    job_id, lambda q=meta["query"]: df_factory_for_query(q)
                )
                resumed.append(job_id)
        return resumed

    def expire(self) -> list[str]:
        """Drop jobs past their TTL (`fracmanager/async_searcher.go`
        retention loop).

        A job whose executing thread is still alive is never rmtree'd —
        deleting under a running Spark write would race the result write
        (the parquet job recreates the directory, resurrecting the job) or
        crash the daemon thread mid-meta-rewrite. Instead the job is marked
        canceled (so ``_run`` discards its result on completion) and the
        directory is reclaimed on a later pass once the thread has drained.
        """
        import shutil

        dropped = []
        for job_id in os.listdir(self.base_dir):
            t = self._threads.get(job_id)
            if t is not None and t.is_alive():
                with self._meta_lock:
                    meta = self.status(job_id)
                    if (
                        meta
                        and meta.get("status") == "running"
                        and time.time() - meta["started_at"]
                        > meta.get("ttl_sec", 3600)
                    ):
                        meta["status"] = "canceled"
                        meta["finished_at"] = time.time()
                        self._write_meta(job_id, meta)
                continue
            with self._meta_lock:
                meta = self.status(job_id)
                if meta and time.time() - meta["started_at"] > meta.get(
                    "ttl_sec", 3600
                ):
                    shutil.rmtree(self._job_dir(job_id), ignore_errors=True)
                    self._threads.pop(job_id, None)
                    dropped.append(job_id)
        return dropped
