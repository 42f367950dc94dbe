"""seqspark — a PySpark-native log analytics engine with the query and
data-processing capabilities of ozontech/seq-db, re-expressed Spark-first.

Public surface:
- :class:`seqspark.engine.SearchTable` — search / aggregate / histogram /
  fetch over typed tables or ingested document stores
- :func:`seqspark.ingest.ingest_docs` — ES-bulk-style JSON ingest transform
- :class:`seqspark.store.DocStore` — time-partitioned parquet store with
  retention + compaction
- :mod:`seqspark.streaming` — Structured Streaming ingest + async search
- :mod:`seqspark.pipeline` — LLM-data-pipeline operators (dedup, ANN,
  text analysis, multimodal plumbing)
- :class:`seqspark.server.SeqSparkServer` / :class:`seqspark.grpcapi.
  SeqProxyGrpc` — the HTTP JSON and gRPC (seqproxyapi.v1) transports
  over one engine (imported from their modules to keep the base import
  light)
"""

from .engine import (
    AggParseError,
    AggQuery,
    ComplexSearchResult,
    SearchTable,
    TooManyUniqValuesError,
    materialize_tokens,
)
from .circuitbreaker import CircuitBreaker, CircuitOpenError
from .index import StoreIndex, build_inverted_index, search_tokens
from .mapping import AutoMapping, Mapping, MappingProvider
from .ratelimit import RateLimiter
from .seqql.legacy import parse_legacy
from .seqql.parser import ParseError, parse
from .store import DocStore, TieredStore

__all__ = [
    "AggParseError",
    "AggQuery",
    "ComplexSearchResult",
    "SearchTable",
    "TooManyUniqValuesError",
    "materialize_tokens",
    "StoreIndex",
    "build_inverted_index",
    "search_tokens",
    "AutoMapping",
    "MappingProvider",
    "Mapping",
    "RateLimiter",
    "CircuitBreaker",
    "CircuitOpenError",
    "DocStore",
    "TieredStore",
    "ParseError",
    "parse",
    "parse_legacy",
]
