"""Hystrix-style circuit breaker for the bulk ingest path.

Mirrors the reference's overload protection
(`network/circuitbreaker/circuitbreaker.go`, `network/circuitbreaker/
README.md`, wired to bulk in `proxy/bulk/seqdb_client.go:127-137` with the
`--bulk-*` flags, `cmd/seq-db/seq-db.go:179-187`):

- a rolling window of ``num_buckets`` x ``bucket_width_s`` seconds collects
  per-bucket success/failure counts;
- the circuit OPENS when the window holds at least
  ``request_volume_threshold`` requests AND the failure ratio exceeds
  ``error_threshold_percentage`` — the volume gate stops a handful of
  errors on a quiet channel from tripping the breaker;
- while OPEN every request is refused immediately (the caller sheds load
  instead of queueing doomed work);
- after ``sleep_window_s`` one half-open probe is allowed: success closes
  the circuit (window reset), failure re-opens it for another sleep window
  (`defaultHalfOpenAttempts = 1`).

Driver-side admission control, same rationale as :mod:`seqspark.ratelimit`:
a bulk that will fail (store down, bad mapping reload) should fail fast at
the front end rather than fan out to executors first.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Dict

#: reference flag defaults (`docs/en/02-flags.md` Bulk Request Flags)
DEFAULT_NUM_BUCKETS = 10  # --bulk-err-count
DEFAULT_BUCKET_WIDTH_S = 1.0  # --bulk-bucket-width
DEFAULT_VOLUME_THRESHOLD = 5  # --bulk-request-volume-threshold
DEFAULT_ERROR_PERCENTAGE = 50  # --bulk-err-percentage
DEFAULT_SLEEP_WINDOW_S = 5.0  # --bulk-sleep-window

CLOSED, OPEN, HALF_OPEN = "closed", "open", "half-open"


class CircuitOpenError(Exception):
    """Raised (or mapped to HTTP 503) while the circuit is open."""


class ProbeToken:
    """Identity of the single half-open probe granted by :meth:`allow`.

    Truthy, so ``if cb.allow():`` keeps working; carries a sequence number
    so ``record`` can tell the granted probe apart from straggler requests
    that were admitted before the circuit tripped.
    """

    __slots__ = ("seq",)

    def __init__(self, seq: int):
        self.seq = seq

    def __bool__(self) -> bool:  # pragma: no cover - trivial
        return True


class CircuitBreaker:
    """Rolling-window error-rate breaker; thread-safe."""

    def __init__(
        self,
        num_buckets: int = DEFAULT_NUM_BUCKETS,
        bucket_width_s: float = DEFAULT_BUCKET_WIDTH_S,
        request_volume_threshold: int = DEFAULT_VOLUME_THRESHOLD,
        error_threshold_percentage: float = DEFAULT_ERROR_PERCENTAGE,
        sleep_window_s: float = DEFAULT_SLEEP_WINDOW_S,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.num_buckets = num_buckets
        self.bucket_width_s = bucket_width_s
        self.request_volume_threshold = request_volume_threshold
        self.error_threshold_percentage = error_threshold_percentage
        self.sleep_window_s = sleep_window_s
        self._clock = clock
        self._lock = threading.Lock()
        self._state = CLOSED
        self._opened_at = 0.0
        self._probing = False
        self._probe_seq = 0
        # bucket index -> [successes, failures]; indices outside the rolling
        # window are evicted lazily on access
        self._buckets: Dict[int, list] = {}

    # ------------------------------------------------------------- window

    def _bucket_idx(self, now: float) -> int:
        return int(now / self.bucket_width_s)

    def _evict(self, now: float) -> None:
        floor = self._bucket_idx(now) - self.num_buckets + 1
        for idx in [i for i in self._buckets if i < floor]:
            del self._buckets[idx]

    def _window_counts(self, now: float) -> tuple:
        self._evict(now)
        ok = sum(v[0] for v in self._buckets.values())
        fail = sum(v[1] for v in self._buckets.values())
        return ok, fail

    # -------------------------------------------------------------- state

    @property
    def state(self) -> str:
        with self._lock:
            now = self._clock()
            if self._state == OPEN and now - self._opened_at >= self.sleep_window_s:
                return HALF_OPEN
            return self._state

    def allow(self):
        """Admission decision — truthy if the request may proceed.

        Returns ``True`` while CLOSED; returns a :class:`ProbeToken` when
        granting THE half-open probe (pass it to :meth:`record` — while
        OPEN only that token's outcome may close or re-open the circuit);
        returns ``False`` when the request must be refused.
        """
        with self._lock:
            now = self._clock()
            if self._state == CLOSED:
                return True
            if now - self._opened_at >= self.sleep_window_s and not self._probing:
                self._probing = True  # one half-open attempt per sleep window
                self._probe_seq += 1
                return ProbeToken(self._probe_seq)
            return False

    def record(self, ok: bool, token=None) -> None:
        """Record a completed request and re-evaluate the circuit.

        ``token`` is the value :meth:`allow` returned for this request.
        While OPEN, only the granted half-open probe's ``record`` decides
        (success closes + resets the window, failure restarts the sleep
        window); stragglers admitted before the trip are ignored — an
        in-flight success must NOT bypass the sleep window.
        """
        with self._lock:
            now = self._clock()
            if self._state == OPEN:
                if (
                    not isinstance(token, ProbeToken)
                    or token.seq != self._probe_seq
                    or not self._probing
                ):
                    return  # straggler from before the trip — ignore
                self._probing = False
                if ok:
                    self._state = CLOSED
                    self._buckets = {}
                else:
                    self._opened_at = now
                return
            b = self._buckets.setdefault(self._bucket_idx(now), [0, 0])
            b[0 if ok else 1] += 1
            total_ok, total_fail = self._window_counts(now)
            total = total_ok + total_fail
            if (
                total >= self.request_volume_threshold
                and total > 0
                and total_fail / total * 100.0 > self.error_threshold_percentage
            ):
                self._state = OPEN
                self._opened_at = now
                self._probing = False

    def execute(self, fn: Callable[[], object]) -> object:
        """Run ``fn`` under the breaker (`circuitbreaker.go:112-121`)."""
        token = self.allow()
        if not token:
            raise CircuitOpenError("circuit breaker open")
        try:
            out = fn()
        except Exception:
            self.record(False, token)
            raise
        self.record(True, token)
        return out
