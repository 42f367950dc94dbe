"""Per-key request rate limiting for the query front end.

Mirrors the reference's leaky-bucket limiter
(`network/ratelimiter/ratelimiter.go`, `docs/en/08-rate-limiting.md`):

- every accounted request adds a fixed cost (10) to its key's counter;
- counters drain continuously at ``limit_per_sec * 10`` per second (the
  reference drains ``limitPerSec`` every 100 ms from a background
  goroutine; we drain lazily from elapsed time — same steady state, no
  thread);
- a request is refused while its counter exceeds ``limit_per_sec * 10``,
  i.e. a key sustaining more than ``limit_per_sec`` requests/second gets
  throttled, with a burst allowance of ~``limit_per_sec`` requests.

Two identical search queries share a key when they have the same query
string, aggregations and histogram interval
(`proxyapi/grpc_v1.go:156-167` getSearchQueryFromGRPCReqForRateLimiter);
fetches are keyed by their joined ID list (`proxyapi/grpc_fetch.go:27-34`).

This is driver-side admission control — by the time a query reaches the
cluster it fans out to thousands of tasks, so the cheap place to stop a
buggy UI retry-loop is before submission, exactly where the reference
proxy stops it.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Dict, Optional, Sequence

#: reference `docs/en/02-flags.md` --query-rate-limit default
DEFAULT_QUERY_RATE_LIMIT = 2.0

#: cost added per accounted request (`ratelimiter.go:63` Account)
_COST = 10.0


class RateLimiter:
    """Leaky-bucket per-key limiter; thread-safe; lazily drained."""

    def __init__(
        self,
        limit_per_sec: float = DEFAULT_QUERY_RATE_LIMIT,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.limit_per_sec = float(limit_per_sec)
        self._clock = clock
        self._lock = threading.Lock()
        self._counters: Dict[str, float] = {}
        self._last_drain = clock()

    def _drain(self, now: float) -> None:
        elapsed = now - self._last_drain
        if elapsed <= 0:
            return
        self._last_drain = now
        leak = self.limit_per_sec * _COST * elapsed
        for key in list(self._counters):
            c = self._counters[key] - leak
            if c <= 0:
                del self._counters[key]
            else:
                self._counters[key] = c

    def account(self, key: str) -> bool:
        """Charge one request against ``key``; False = rate-limited."""
        with self._lock:
            self._drain(self._clock())
            if self._counters.get(key, 0.0) > self.limit_per_sec * _COST:
                return False
            self._counters[key] = self._counters.get(key, 0.0) + _COST
            return True

    def active_keys(self) -> int:
        with self._lock:
            self._drain(self._clock())
            return len(self._counters)


def search_key(
    query: str,
    aggs: Sequence[object] = (),
    hist_interval: Optional[object] = None,
) -> str:
    """Rate-limit key for a search/complex request: identical query string
    + aggregations + histogram interval share one bucket
    (`proxyapi/grpc_v1.go:156-167`)."""
    def get(a: object, name: str) -> str:
        v = a.get(name) if isinstance(a, dict) else getattr(a, name, None)
        return str(v) if v else ""

    parts = [query]
    for a in aggs:
        parts.extend([get(a, "field"), get(a, "group_by"), get(a, "func")])
    if hist_interval is not None:
        parts.append(str(hist_interval))
    return ",".join(parts)


def fetch_key(ids: Sequence[object]) -> str:
    """Rate-limit key for fetch-by-ID (`proxyapi/grpc_fetch.go:27-34`)."""
    return ",".join(str(i) for i in ids)
