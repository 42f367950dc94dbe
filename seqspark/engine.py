"""The query engine: Spark-first equivalent of seq-db's search path.

One :class:`SearchTable` replaces the reference's proxy/store/fracmanager
stack (`proxy/search/ingestor.go`, `storeapi/grpc_search.go:30-291`,
`fracmanager/searcher.go`): Catalyst + executors do the fan-out, partial
aggregation, merge and top-k that the reference hand-schedules across
shards/fractions/goroutines.

Query lifecycle (reference `storeapi/grpc_search.go:63-221` doSearch):
  parse seq-ql → compile to a Column predicate → filter(time range & pred)
  → branch into docs (orderBy/limit/offset), total (count), histogram
  (time-bucket groupBy) and aggregations (groupBy per AggQuery).

Scale notes:
- the doc-time range is applied on the timestamp column, so with a
  time-partitioned store it prunes partitions/row-groups (the fraction
  pruning of `fracmanager/searcher.go:89-101` for free);
- top-k + offset compile to one TakeOrderedAndProject(limit, offset) via
  native ``offset()``; deep paging has a keyset path (:meth:`SearchTable.
  search_after`) that costs one pruned top-k scan instead of O(offset);
- numeric ranges over native numeric columns reach Parquet PushedFilters;
  text predicates hit persisted token columns (tokens at rest) or, via
  :meth:`SearchTable.attach_index`, a materialized inverted index;
- aggregations are plain groupBy → partial+final HashAggregate, the QPR
  merge tree of `seq/qpr.go:417-462` done by Spark; the bounded bucket set
  is finalized driver-side like the reference's proxy merge;
- :meth:`SearchTable.complex_search` serves docs + total + histogram + N
  aggregations from ONE cached filtered scan.
"""

from __future__ import annotations

import math
import threading
from collections import OrderedDict
from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .compile import (
    _GO_FLOAT_JAVA_RE,
    CompileError,
    FieldSpec,
    Resolver,
    compile_node,
)
from .mapping import Mapping
from .seqql.ast import PipeFields, Query
from .seqql.legacy import parse_legacy
from .seqql.parser import parse
from .tokenize import DEFAULT_MAX_TOKEN_SIZE, keyword_tokens, tokens_for_type

#: reference `conf/conf.go:24` MaxRequestedDocuments
MAX_SEARCH_DOCS = 100_000

#: guardrails, reference `docs/en/02-flags.md`
AGG_MAX_GROUP_TOKENS = 2_000

#: `--agg-max-field-tokens` default (`cmd/seq-db/flags.go:67`): max unique
#: AggQuery.Field values a field aggregation may parse; 0 disables
AGG_MAX_FIELD_TOKENS = 1_000_000


class TooManyUniqValuesError(RuntimeError):
    """Reference `consts` ErrTooManyUniqValues (`frac/processor/eval_tree.go:78-85`)."""


class AggParseError(RuntimeError):
    """Strict-mode aggregation hit a non-numeric field token (reference
    `frac/processor/aggregator.go:150-157` parseNum fails the whole agg)."""


def materialize_tokens(
    df: DataFrame,
    mapping_types: Dict[str, object],
    case_sensitive: bool = False,
    max_token_size: int = DEFAULT_MAX_TOKEN_SIZE,
    partial_indexing: bool = False,
) -> DataFrame:
    """Tokens-at-rest: attach a persisted ``__tok_<field>`` column per
    tokenized (text/path) field so the token arrays are computed ONCE at
    ingest and stored in the table (reference: sealed fractions carry
    precomputed token dictionaries + posting lists,
    `frac/sealed_index.go:218-266` — queries never re-tokenize).

    Write the result through :class:`seqspark.store.DocStore` (or any
    parquet/Delta sink); :meth:`SearchTable.from_typed` detects the columns
    on read and skips per-query tokenization entirely.
    """
    mapping = Mapping(dict(mapping_types))
    for fm in mapping.fields():
        pairs = [(fm.name, fm.main_type)] + [
            (f"{fm.name}.{t}", st) for t, (st, _s) in fm.sub_types.items()
        ]
        for qname, itype in pairs:
            if itype in ("keyword",):
                continue  # scalar fast path needs no token column
            tokcol = "__tok_" + qname.replace(".", "__")
            if tokcol not in df.columns:
                df = df.withColumn(
                    tokcol,
                    tokens_for_type(
                        itype,
                        F.col(fm.name).cast("string"),
                        case_sensitive,
                        max_token_size,
                        partial_indexing,
                    ),
                )
    return df


@dataclass
class AggQuery:
    """One aggregation request (reference `proxyapi/grpc_v1.go:296-333`).

    func ∈ {count, unique, sum, min, max, avg, quantile}.
    For count/unique, ``field`` is the legacy alias of ``group_by``
    (`proxyapi/grpc_v1.go:357-363`).
    """

    func: str
    field: Optional[str] = None
    group_by: Optional[str] = None
    quantiles: Sequence[float] = dc_field(default_factory=tuple)
    interval_ms: Optional[int] = None
    #: exact percentile (full sort per group) vs percentile_approx (the
    #: reference itself is approximate via seeded reservoir sampling,
    #: `seq/qpr.go:316-415`; approx is the 100 TB path)
    exact_quantiles: bool = False


def _local_frame_schemas(schema) -> tuple:
    """(relaxed StructType, matching pyarrow schema) for a LocalRelation
    build — split out (r18) so repeated executions of one cached
    aggregate shape prepare these once at build time (~17 ms of
    conversion per call otherwise) instead of per execution."""
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructField, StructType

    # relax nullability: collected rows may hold NULLs in fields Catalyst
    # inferred non-nullable (codegen would read them unchecked otherwise)
    relaxed = StructType(
        [StructField(f.name, f.dataType, True, f.metadata) for f in schema.fields]
    )
    return relaxed, to_arrow_schema(relaxed)


def _local_frame(spark, data, schema, prepared=None) -> DataFrame:
    """Build a JVM-side LocalRelation (`LocalTableScan`) from driver rows.

    A tuples-based ``createDataFrame`` routes through a pickled Python RDD
    whose every action pays one Python-worker round-trip per partition
    (~0.2–0.4 s for a 30-row frame on local[32]); a pyarrow Table embeds
    the rows in the plan itself, so downstream collects are pure JVM
    (~0.03 s). pyarrow (unlike the pandas conversion path) also preserves
    the null-vs-NaN distinction exactly: ``float('nan')`` stays a DOUBLE
    value, ``None`` stays SQL NULL — both occur in bucket frames (NaN =
    zero parsed samples, NULL = quantile columns of NotExists-only
    buckets). ``prepared`` takes the pre-computed
    :func:`_local_frame_schemas` pair for callers on a hot path.
    """
    import pyarrow as pa

    relaxed, aschema = (
        prepared if prepared is not None else _local_frame_schemas(schema)
    )
    cols = list(zip(*data)) if data else [[] for _ in relaxed.fields]
    tbl = pa.Table.from_arrays(
        [pa.array(list(c), type=f.type) for c, f in zip(cols, aschema)],
        schema=aschema,
    )
    return spark.createDataFrame(tbl, relaxed)


@dataclass
class _AggBuilt:
    """Prepared (lazy) frames + flags for one aggregation shape — the
    cacheable product of :meth:`SearchTable._agg_build`. Holds NO
    executed state: every action (strict probe, guard collect, persist)
    belongs to :meth:`SearchTable._agg_execute`, so reusing a cached
    construction still computes results from parquet on every call."""

    out: DataFrame                    # bucket frame (field aggs keep __ftok)
    post: DataFrame                   # out minus __ftok, bucket-ordered
    probe: Optional[DataFrame]        # eager guard path: limit-capped probe
    bad: Optional[DataFrame]          # strict mode: unparsable-token frame
    src: DataFrame                    # pre-agg frame (field-guard confirm)
    func: str
    group_by: Optional[str]
    fieldname: Optional[str]
    group_guard: bool
    field_guard: bool
    eager: bool
    timeseries_guard: bool
    #: LocalRelation schema state for the EAGER path, computed at build
    #: time (r18 — a schema read costs a py4j parse, and the pyarrow
    #: conversion ~17 ms; doing it in _agg_build sets the fields before
    #: the object is published to the plan cache, so concurrent
    #: executes never mutate shared state)
    local_schema: Optional[object] = None
    local_names: Optional[List[str]] = None
    local_arrow: Optional[tuple] = None  # (_local_frame_schemas pair)


def validate_agg(aggq: "AggQuery") -> None:
    """Request validation, mirroring `proxyapi/grpc_v1.go:356-399`
    validateAgg: COUNT needs group_by-or-field (legacy alias), UNIQUE needs
    a group and never an interval, field funcs need a field, QUANTILE needs
    quantiles all within [0, 1]."""
    func = aggq.func.lower()
    if func == "count":
        if not aggq.group_by and not aggq.field:
            raise ValueError("'group_by' or 'field' must be set")
    elif func == "unique":
        if not aggq.group_by and not aggq.field:
            raise ValueError("'group_by' must be set")
        if aggq.interval_ms:
            raise ValueError(
                "remove 'interval' parameter: 'unique' aggregations do not "
                "support timeseries"
            )
    elif func in ("sum", "min", "max", "avg"):
        if not aggq.field:
            raise ValueError("'field' must be set")
    elif func == "quantile":
        if not aggq.field:
            raise ValueError("'field' must be set")
        if not aggq.quantiles:
            raise ValueError(
                "aggregation query with QUANTILE function must contain at "
                "least one quantile"
            )
        for qv in aggq.quantiles:
            if qv < 0 or qv > 1:
                raise ValueError("quantile must be between 0 and 1")
    else:
        raise ValueError(f"unknown agg func {func!r}")


def mapping_dict(mapping) -> Dict[str, object]:
    """Mapping as field → type(s), the Mapping-endpoint rendering
    (`proxyapi/grpc_mapping.go:9`). Module-level because the endpoint
    must answer from configuration alone — an empty store with no
    parquet yet still has a mapping to report."""
    out: Dict[str, object] = {}
    for fm in mapping.fields():
        if fm.sub_types:
            out[fm.name] = {
                "type": fm.main_type,
                "titles": {t: st for t, (st, _s) in fm.sub_types.items()},
            }
        else:
            out[fm.name] = fm.main_type
    return out


class SearchTable:
    """A searchable table: a DataFrame + mapping + physical field layout.

    Two layouts:
    - :meth:`from_typed` — an existing typed table (e.g. the driver's
      ``events``): each mapped field is a real column; keyword fields get a
      scalar fast path so predicates push down to the Parquet scan.
    - :meth:`from_docs` — an ingested document store produced by
      :mod:`seqspark.ingest`: fields live in extracted columns + a
      ``tokens`` map column.
    """

    def __init__(
        self,
        df: DataFrame,
        mapping: Mapping,
        resolver: Resolver,
        ts_col: str = "ts",
        rid_col: Optional[str] = None,
        case_sensitive: bool = False,
    ):
        self.df = df
        self.mapping = mapping
        self.resolver = resolver
        self.ts_col = ts_col
        self.rid_col = rid_col
        self.case_sensitive = case_sensitive
        #: default query dialect — the reference serves two, chosen per
        #: request by the `use-seq-ql` metadata key
        #: (`storeapi/grpc_search.go:206-216`); per-call ``dialect=`` wins
        self.dialect = "seqql"
        #: dedup keys applied on every search — set for doc stores whose
        #: mapping has `nested` fields (child rows share the parent ID,
        #: `proxy/bulk/indexer.go:162-167`; duplicates collapse at read like
        #: `seq/qpr.go:465-487`)
        self.default_dedup: Optional[Sequence[str]] = None
        #: True when the table was built from a degraded store read (cold
        #: tier down): results are served from what's reachable and the
        #: transports mark the response PARTIAL_RESPONSE
        self.partial = False
        #: optional inverted-index routing (attach_index)
        self._index: Optional[tuple] = None
        #: width-aware two-phase routing threshold (attach_index
        #: two_phase_min_doc_bytes); None = routing off
        self._two_phase_min_bytes: Optional[int] = None
        #: which plan served the LAST search() call — "two_phase" or
        #: "scan"; observability for transports/explain (None before
        #: any search). Backed by a thread-local (r18): the server
        #: shares ONE memoized table across request handler threads,
        #: and each must read the route of ITS OWN search, not whichever
        #: ran last globally (see the `route` property below)
        self._route_local = threading.local()
        #: memoized avg_doc_bytes() — () = not yet computed; a server
        #: fronting many requests may pre-seed this from its own cache
        self._avg_doc_bytes_cache: tuple = ()
        #: two_phase_search conf ownership (r17 knob): when True (the
        #: default) the operator raises the SESSION-global
        #: ``spark.sql.parquet.pushdown.inFilterThreshold`` to cover its
        #: id page so per-value bloom/dictionary pushdown happens with
        #: zero deployment conf. The raise is sticky and shared-session
        #: visible (a larger In threshold only widens per-value pushdown
        #: — monotone-safe, never result-changing); deployments that
        #: must not see any session mutation set this False and own the
        #: threshold themselves
        self.own_in_filter_threshold = True
        #: optional (partition_col, bucket_fmt) for time-bucket directory
        #: pruning (set by from_docs(bucket_fmt=...))
        self._partition_hint: Optional[tuple] = None
        #: bounded FIFO of guard-persisted bucket frames (timeseries
        #: aggregate() calls with no owning ComplexSearchResult); the lock
        #: makes append/evict safe from concurrent HTTP handler threads
        self._guard_cache: List[DataFrame] = []
        self._guard_cache_lock = threading.Lock()
        #: r17 prepared-plan cache (guide §1.2 "per-task work" applied to
        #: the DRIVER): building a search/aggregate frame costs hundreds
        #: of py4j round trips (~60 ms a search, ~200 ms an aggregate,
        #: measured); a repeated query re-uses the constructed LAZY frame
        #: — the prepared-statement shape every engine has. EXECUTION is
        #: never cached: collect() on a cached frame re-runs the scan from
        #: parquet every time. Only plans whose construction is
        #: side-effect-free are cached (scan-route searches, non-persisted
        #: aggregates); invalidated by :meth:`clear_width_cache` /
        #: :meth:`attach_index` (the "store changed" signals).
        self._plan_cache: "OrderedDict[tuple, tuple]" = OrderedDict()
        self._plan_cache_lock = threading.Lock()
        #: invalidation epoch (r18): bumped by clear_width_cache() under
        #: the lock. Builders capture it before constructing a plan and
        #: insert only if it is unchanged — without this, an
        #: attach_index() firing between build and insert would leave a
        #: plan built against the OLD index cached indefinitely (for
        #: aggregates, an embedded stale posting semi-join could silently
        #: exclude docs added by the refresh)
        self._plan_cache_epoch = 0

    @property
    def route(self) -> Optional[str]:
        """Which plan served THIS THREAD's last :meth:`search` on this
        table — "two_phase" or "scan"; None before any search. Request-
        local by design: concurrent server threads sharing one table
        each observe their own route (the metric/explain signal), never
        a neighbor's."""
        return getattr(self._route_local, "value", None)

    @route.setter
    def route(self, value: Optional[str]) -> None:
        self._route_local.value = value

    def attach_index(
        self,
        index_df: DataFrame,
        fields: Sequence[str],
        id_cols: Sequence[str] = ("mid", "rid"),
        stats: Optional["IndexStats"] = None,
        max_selectivity: float = 0.1,
        broadcast_max_docs: int = 200_000,
        two_phase_min_doc_bytes: Optional[int] = None,
    ) -> "SearchTable":
        """Route text-token predicates through a materialized inverted index
        (SURVEY §7.2; the posting-list path of `frac/sealed_index.go:
        218-266`).

        Every query whose top level is AND-decomposable and contains at
        least one exact-token literal on a covered field is PREFILTERED by a
        semi-join against the index id set — one pruned index scan sized by
        posting-list length, not corpus size — and the full predicate is
        then applied on the surviving rows, so results are identical for
        every query shape (the index only ever shrinks the scan).

        With ``stats`` (:func:`seqspark.index.collect_index_stats`), routing
        becomes SELECTIVE — the dictionary-narrowing heuristic of
        `pattern/pattern.go:50-64`: a conjunct routes through the index only
        when its estimated doc-frequency ratio is ≤ ``max_selectivity``;
        stop-word-grade tokens (and prefixless wildcards, whose posting
        union is unbounded) stay on the scan path, where the predicate
        matches most rows anyway and a semi-join would only add a shuffle.
        Results are identical either way — the heuristic picks the plan,
        never the answer.

        ``broadcast_max_docs`` extends the stats routing to the JOIN
        STRATEGY (r14, measured at ×1/×10/×100 in tools/bench_scale.py:
        the plain semi-join's marginal cost grew FASTER than the column
        scan's because the corpus side shuffles on the id): when the
        stats upper-bound on the posting id set — min conjunct ratio ×
        total docs for an AND group, the ratio sum for an OR group — is
        at most this many docs, the id set is broadcast-hinted and the
        semi-join runs map-side, shuffle-free on the corpus at any
        scale. Prefix wildcards have no bounded posting estimate and
        never broadcast. 0 disables the hint.

        ``two_phase_min_doc_bytes`` (r16) enables WIDTH-AWARE two-phase
        routing — the reference's search→fetch wire architecture
        (`proxy/search/ingestor.go:140-151`) picked by a cost signal: a
        bounded, fully index-covered :meth:`search` whose average stored
        doc width (parquet footer bytes/rows, driver-side metadata only,
        zero Spark jobs) is at least this many bytes is served by
        :meth:`two_phase_search`, whose phase-1 I/O is independent of
        document width (measured crossover ≈3 KB bodies from ×10,
        BASELINE.md §r15). Any precondition failure falls back silently
        to the scan plan; results are identical either way. ``None``
        (default) disables routing.
        """
        self._index = (
            index_df,
            set(fields),
            tuple(id_cols),
            stats,
            max_selectivity,
            broadcast_max_docs,
        )
        self._two_phase_min_bytes = two_phase_min_doc_bytes
        # a (re)attach is the library user's "the store changed" signal
        # (the server re-attaches after refresh_index): drop the memoized
        # doc width so routing decisions track the current store rather
        # than the first-ever sample (the server additionally TTLs this)
        self.clear_width_cache()
        return self

    def clear_width_cache(self) -> None:
        """Invalidate the memoized :meth:`avg_doc_bytes` sample AND the
        prepared-plan cache. Called automatically by :meth:`attach_index`;
        long-lived library holders of a table over a growing/compacting
        store can also call it directly (the server layer instead
        re-samples on a 30 s TTL)."""
        self._avg_doc_bytes_cache = ()
        with self._plan_cache_lock:
            self._plan_cache.clear()
            self._plan_cache_epoch += 1

    def _index_leaf(self, node) -> Optional[tuple]:
        """(field, exact_token_or_None, prefix, like_pattern_or_None) when
        ``node`` is an index-covered literal, else None."""
        from .compile import wildcard_like
        from .seqql.ast import TOKEN_ALL, TOKEN_EXISTS, Literal, TermKind

        covered = self._index[1]
        if (
            not isinstance(node, Literal)
            or node.field in (TOKEN_ALL, TOKEN_EXISTS)
            or node.field not in covered
            or node.is_match_all
        ):
            return None
        if node.single_text is not None:
            return (node.field, node.single_text, "", None)
        prefix = (
            node.terms[0].data
            if node.terms and node.terms[0].kind is TermKind.TEXT
            else ""
        )
        return (node.field, None, prefix, wildcard_like(node.terms))

    def _or_leaves(self, node) -> Optional[List[tuple]]:
        """Leaves of a pure-OR subtree when EVERY disjunct is index-covered
        (otherwise routing would drop matches of uncovered disjuncts)."""
        from .seqql.ast import Logical, LogicalOp

        if isinstance(node, Logical) and node.op is LogicalOp.OR:
            left = self._or_leaves(node.children[0])
            right = self._or_leaves(node.children[1])
            if left is None or right is None:
                return None
            return left + right
        leaf = self._index_leaf(node)
        return [leaf] if leaf is not None else None

    @staticmethod
    def _or_group_ratio(leaves, stats) -> float:
        """Upper-bound df ratio of an OR group: sum of exact-token ratios;
        prefix leaves count at the hot-list floor (they are narrowed but
        unlisted); a prefixless wildcard leaf is an unbounded dictionary
        scan → never selective."""
        total = 0.0
        for fld, token, prefix, _regex in leaves:
            if token is not None:
                total += stats.ratio(fld, token)
            elif prefix:
                total += stats.floor
            else:
                return float("inf")
        return total

    def _index_conjuncts(self, node) -> tuple:
        """Index-routable conjuncts: walk AND nodes; each conjunct routes as
        an exact (field, token) pair, a wildcard (prefix narrowing), or a
        fully-covered OR group (``in()`` / keyword-OR → posting-list
        union). Anything else — NOT, partially-covered OR — is left to the
        residual predicate."""
        from .seqql.ast import Logical, LogicalOp

        if isinstance(node, Logical) and node.op is LogicalOp.AND:
            l0, w0, o0 = self._index_conjuncts(node.children[0])
            l1, w1, o1 = self._index_conjuncts(node.children[1])
            return l0 + l1, w0 + w1, o0 + o1
        leaf = self._index_leaf(node)
        if leaf is not None:
            fld, token, prefix, rx = leaf
            if token is not None:
                return [(fld, token)], [], []
            return [], [(fld, prefix, rx)], []
        ors = self._or_leaves(node)
        if ors is not None:
            return [], [], [ors]
        return [], [], []

    @staticmethod
    def _public(df: DataFrame) -> DataFrame:
        internal = [c for c in df.columns if c.startswith("__tok_")]
        return df.drop(*internal) if internal else df

    # ------------------------------------------------------------------ build

    @classmethod
    def from_typed(
        cls,
        df: DataFrame,
        mapping_types: Dict[str, object],
        ts_col: str = "ts",
        rid_col: Optional[str] = None,
        case_sensitive: bool = False,
        assume_folded: bool = False,
        max_token_size: int = DEFAULT_MAX_TOKEN_SIZE,
        partial_indexing: bool = False,
    ) -> "SearchTable":
        """``mapping_types`` maps a column name to its index type — either a
        plain type string (``"keyword"``) or a multi-type spec
        ``{"types": [{"type": "text"}, {"title": "keyword", "type":
        "keyword"}]}`` that additionally registers ``name.title`` sub-fields
        over the same column (`seq/mapping.go:125-166`,
        `tests/integration_tests/integration_test.go:1773-1860`).

        ``assume_folded=True`` declares that keyword column values are
        already lower-case on disk (the reference guarantees this by folding
        at index time, `tokenizer/tokenizer.go:15-48`); equality then
        compiles to a bare ``col = 'v'`` that pushes down into the Parquet
        scan — at 100 TB that is the difference between pruning row groups
        and evaluating ``lower()`` on every row.

        Natively numeric columns additionally get a ``numeric`` fast path:
        numeric ranges compile to bare comparisons on the raw column
        (Parquet ``PushedFilters`` + row-group min/max skipping) instead of
        ``CAST(CAST(c AS STRING) AS DOUBLE)``.

        Tokenized (text/path) fields: if the frame already carries a
        ``__tok_<field>`` column (tokens persisted at ingest by
        :func:`materialize_tokens` + :class:`seqspark.store.DocStore`), it
        is used as-is — queries then pay ZERO tokenization cost, mirroring
        the reference's tokens-at-rest posting lists
        (`frac/sealed_index.go:218-266`). Otherwise the token array is
        materialized once per scan as a hidden column so a multi-token
        query tokenizes each row once, not once per query token."""
        mapping = Mapping(dict(mapping_types))
        dtypes = dict(df.dtypes)
        if dtypes.get(ts_col) == "timestamp_ntz":
            # TIMESTAMP_NTZ (parquet isAdjustedToUTC=false under Spark 4)
            # breaks unix_millis/watermarks; reinterpret the wall time as a
            # UTC instant independent of the session timezone (a bare cast
            # shifts epochs by the session offset)
            from .data import _ntz_as_utc

            df = df.withColumn(ts_col, _ntz_as_utc(F.col(ts_col)))
            dtypes[ts_col] = "timestamp"
        _INT_TYPES = {"tinyint", "smallint", "int", "bigint"}
        _FLOAT_TYPES = {"float", "double"}
        specs: Dict[str, FieldSpec] = {}

        def add_spec(qname: str, colname: str, itype: str, nonlocal_df: list) -> None:
            col = F.col(colname).cast("string")
            dtype = dtypes.get(colname, "")
            numeric = None
            numeric_is_float = False
            if dtype in _INT_TYPES | _FLOAT_TYPES or dtype.startswith("decimal"):
                numeric = lambda c=colname: F.col(c)
                numeric_is_float = dtype in _FLOAT_TYPES
            if itype == "keyword" and partial_indexing:
                # `--partial-indexing`: over-cap values are indexed as
                # their first max_token_size chars. The truncation makes
                # the bare-scalar fast path unsound (a cap-length literal
                # may equal the TRUNCATION of a longer value), so this
                # opt-in mode routes through the token array instead —
                # parity over pushdown, like the reference flag trades
                # exactness for coverage.
                specs[qname] = FieldSpec(
                    tokens=(
                        lambda c=col: keyword_tokens(
                            c, case_sensitive, max_token_size, True
                        )
                    ),
                    exists=(lambda c=col: c.isNotNull()),
                    numeric=numeric,
                    numeric_is_float=numeric_is_float,
                )
            elif itype == "keyword":
                folded = col if (case_sensitive or assume_folded) else F.lower(col)
                eq_native = None
                if dtype in _INT_TYPES:
                    # integral column: equality against the CANONICAL
                    # decimal rendering compiles to a bare typed
                    # comparison (pushable + bloom-skippable); any other
                    # literal can never equal a rendering → lit(False),
                    # the verdict the string compare reaches row by row
                    _INT_LO_HI = {
                        "tinyint": (-(1 << 7), (1 << 7) - 1),
                        "smallint": (-(1 << 15), (1 << 15) - 1),
                        "int": (-(1 << 31), (1 << 31) - 1),
                        "bigint": (-(1 << 63), (1 << 63) - 1),
                    }
                    lo, hi = _INT_LO_HI[dtype]

                    def eq_native(v, c=colname, lo=lo, hi=hi):
                        try:
                            n = int(v)
                        except ValueError:
                            return F.lit(False)
                        if str(n) != v or not (lo <= n <= hi):
                            return F.lit(False)
                        # isNotNull conjunct: every compile leaf must be
                        # two-valued — a bare `col == n` is NULL on NULL
                        # rows and `not field:v` would then silently DROP
                        # them instead of matching. Both conjuncts push.
                        return F.col(c).isNotNull() & (F.col(c) == F.lit(n))
                # over-cap values were never indexed (`tokenizer/
                # keyword_tokenizer.go:22-42`): equality stays a bare
                # pushable comparison (compile proves a within-cap literal
                # can't equal an over-cap value); wildcard/range AND in the
                # byte-cap guard
                specs[qname] = FieldSpec(
                    tokens=(
                        lambda c=col, fc=folded: F.when(
                            c.isNull(), F.lit(None).cast("array<string>")
                        ).otherwise(
                            F.when(
                                F.octet_length(c) > max_token_size,
                                F.array().cast("array<string>"),
                            ).otherwise(F.array(fc))
                        )
                    ),
                    # over-cap values were never indexed: the scalar agg
                    # fast path must send them to the `_not_exists` bucket
                    # (NULL) exactly like the token path — without the cap,
                    # the same data aggregated differently depending on
                    # whether tokens were materialized at ingest
                    scalar=(
                        lambda c=col, fc=folded: F.when(
                            F.octet_length(c) <= max_token_size, fc
                        )
                    ),
                    # filters use the bare folded column + guard conjunct
                    # (compile._apply_check) so EqualTo/StartsWith push
                    # into the scan instead of hiding inside the cap CASE
                    scalar_raw=(lambda fc=folded: fc),
                    eq_native=eq_native,
                    exists=(lambda c=col: c.isNotNull()),
                    numeric=numeric,
                    numeric_is_float=numeric_is_float,
                    guard=(lambda c=col: F.octet_length(c) <= max_token_size),
                    max_token_bytes=max_token_size,
                )
            else:
                tokcol = "__tok_" + qname.replace(".", "__")
                if tokcol not in nonlocal_df[0].columns:
                    nonlocal_df[0] = nonlocal_df[0].withColumn(
                        tokcol,
                        tokens_for_type(
                            itype, col, case_sensitive, max_token_size,
                            partial_indexing,
                        ),
                    )
                specs[qname] = FieldSpec(
                    tokens=(lambda tc=tokcol: F.col(tc)),
                    exists=(lambda c=col: c.isNotNull()),
                    numeric=numeric,
                    numeric_is_float=numeric_is_float,
                )

        holder = [df]
        for fm in mapping.fields():
            add_spec(fm.name, fm.name, fm.main_type, holder)
            for title, (sub_type, _size) in fm.sub_types.items():
                add_spec(f"{fm.name}.{title}", fm.name, sub_type, holder)
        df = holder[0]
        return cls(df, mapping, Resolver(specs), ts_col, rid_col, case_sensitive)

    @classmethod
    def from_store(cls, store, mapping: Mapping, **kw) -> "SearchTable":
        """Open a :class:`seqspark.store.DocStore` (or
        :class:`~seqspark.store.TieredStore`) for search, wiring the
        store's ``bucket_fmt`` so request time ranges prune whole bucket
        directories (PartitionFilters). Before round 7 only
        ``store.search_table`` passed the hint — the HTTP/gRPC server
        built its table through here and silently scanned every bucket's
        footers on time-ranged queries."""
        kw.setdefault("bucket_fmt", store.bucket_fmt)
        if hasattr(store, "read_with_status"):
            # tiered store: a down cold tier degrades to hot-only results
            # marked partial (the reference's PARTIAL_RESPONSE semantics)
            df, partial = store.read_with_status()
        else:
            df, partial = store.read(), False
        st = cls.from_docs(df, mapping, **kw)
        st.partial = partial
        return st

    @classmethod
    def from_docs(
        cls,
        df: DataFrame,
        mapping: Mapping,
        ts_col: str = "ts",
        rid_col: str = "rid",
        case_sensitive: bool = False,
        bucket_fmt: Optional[str] = None,
    ) -> "SearchTable":
        """Docs frame from :func:`seqspark.ingest.ingest_docs`:
        ``id``, ``ts``, ``rid``, ``raw``, ``tokens MAP<STRING,ARRAY<STRING>>``.

        Pass ``bucket_fmt`` (the owning :class:`~seqspark.store.DocStore`'s
        ``bucket_fmt`` — :meth:`DocStore.search_table` does this for you)
        to enable time-bucket PARTITION pruning: request time ranges then
        also filter the ``ts_bucket`` partition column, so Spark skips
        whole bucket directories, not just row groups. The format string
        MUST match the store's exactly — a mismatched granularity would
        compare differently-shaped strings and silently drop buckets,
        which is why this is opt-in rather than inferred."""
        specs: Dict[str, FieldSpec] = {}

        def spec_for(fname: str) -> FieldSpec:
            return FieldSpec(
                tokens=(lambda f=fname: F.col("tokens").getItem(f)),
                exists=(lambda f=fname: F.col("tokens").getItem(f).isNotNull()),
            )

        for fm in mapping.fields():
            specs[fm.name] = spec_for(fm.name)
            for title in fm.sub_types:
                sub = f"{fm.name}.{title}"
                specs[sub] = spec_for(sub)
        # drift-clamped docs carry an indexed original_timestamp token even
        # when absent from the mapping (`docs/en/07-long-term-store.md`
        # §"Avoid old docs in hot store")
        specs.setdefault("original_timestamp", spec_for("original_timestamp"))

        class DocResolver(Resolver):
            def resolve(self, fieldname: str) -> FieldSpec:  # lazy dotted paths
                if fieldname not in self._specs:
                    if mapping.index_type(fieldname) is None:
                        raise CompileError(f"field {fieldname!r} is not indexed")
                    self._specs[fieldname] = spec_for(fieldname)
                return self._specs[fieldname]

        table = cls(df, mapping, DocResolver(specs), ts_col, rid_col, case_sensitive)
        if any(fm.main_type == "nested" for fm in mapping.fields()):
            table.default_dedup = ["mid", "rid"]
        # store-read frames carry the time-bucket partition column: derive
        # bucket bounds from request time ranges so Spark prunes whole
        # partition DIRECTORIES (PartitionFilters), not just row groups —
        # the fraction-level time pruning of `proxy/search/ingestor.go`
        if bucket_fmt is not None:
            from .store import MONOTONE_BUCKET_FMTS, PARTITION_COL as _PCOL

            if bucket_fmt not in MONOTONE_BUCKET_FMTS:
                # a non-zero-padded pattern (e.g. yyyy-M-d) breaks the
                # lexicographic-order-equals-time-order property the prune
                # bounds rely on — refusing beats silently dropping buckets
                raise ValueError(
                    f"bucket_fmt {bucket_fmt!r} is not lexicographically "
                    f"monotone; use one of {MONOTONE_BUCKET_FMTS}"
                )
            # partition type inference turns yyyy labels into INT and
            # yyyy-MM-dd into DATE directories — the hint carries the
            # inferred type so the bounds compare in the column's own
            # type (a silent string-only check used to disable directory
            # pruning entirely for those two documented formats)
            pdtype = dict(df.dtypes).get(_PCOL)
            if pdtype in ("string", "date", "int", "bigint"):
                table._partition_hint = (_PCOL, bucket_fmt, pdtype)
        return table

    # ----------------------------------------------------------------- basics

    def parse(self, q: str, dialect: Optional[str] = None) -> Query:
        d = dialect or self.dialect
        if not q or not q.strip():
            # empty query → match-all, applied BEFORE dialect parse like the
            # reference store (`storeapi/grpc_search.go:184-188`)
            q = "_all_:*"
        elif d == "legacy" and q.strip() == "*":
            # bare `*` is this engine's own match-all default (and seq-ql's
            # idiom); the legacy grammar spells it `_all_:*` — rewrite so
            # every q-defaulting API works under a legacy dialect
            q = "_all_:*"
        if d == "legacy":
            return parse_legacy(q, self.mapping, self.case_sensitive)
        if d != "seqql":
            raise ValueError(f"unknown query dialect {d!r}")
        return parse(q, self.mapping, self.case_sensitive)

    def predicate(self, q: str, dialect: Optional[str] = None) -> Column:
        return compile_node(self.parse(q, dialect).root, self.resolver)

    def _time_filter(
        self, from_ms: Optional[int], to_ms: Optional[int]
    ) -> Optional[Column]:
        """Request-level [from, to] window on doc time, millisecond
        granularity inclusive on both ends (reference
        `proxyapi/grpc_v1.go:189-234`, MID is a unix-ms value).

        Compiled as BARE comparisons on the timestamp column — a
        ``unix_millis(ts) >= lit`` wrapper blocks Parquet pushdown
        entirely, so the most common log-search filter would scan every
        row group at 100 TB. ``floor(ts_ms) >= from ⟺ ts >= from`` and
        ``floor(ts_ms) <= to ⟺ ts < to+1`` for integer ms bounds, so the
        bare forms are exactly the reference's MID semantics."""
        dtype = dict(self.df.dtypes).get(self.ts_col)
        if dtype == "timestamp":
            ts = F.col(self.ts_col)
            cond = None
            if from_ms is not None:
                cond = ts >= F.timestamp_millis(F.lit(from_ms))
            if to_ms is not None:
                c2 = ts < F.timestamp_millis(F.lit(to_ms + 1))
                cond = c2 if cond is None else (cond & c2)
            return cond
        # non-TIMESTAMP ts (e.g. TIMESTAMP_NTZ reaching a user-built
        # frame): fall back to the wrapper form, correct but not pushable
        ts_ms = F.unix_millis(F.col(self.ts_col))
        cond = None
        if from_ms is not None:
            cond = ts_ms >= F.lit(from_ms)
        if to_ms is not None:
            c2 = ts_ms <= F.lit(to_ms)
            cond = c2 if cond is None else (cond & c2)
        return cond

    def _filtered(
        self,
        q: str = "*",
        from_ms: Optional[int] = None,
        to_ms: Optional[int] = None,
        dedup_cols: Optional[Sequence[str]] = None,
        dialect: Optional[str] = None,
    ) -> tuple[DataFrame, List[PipeFields]]:
        """Filter by time + predicate, then collapse ID repetitions.

        Dedup happens HERE so that search, total, histogram and aggregate
        all see the same row set — the reference removes repetitions from
        the total count and the histogram too at merge
        (`seq/qpr.go:417-462` MergeQPRs → removeRepetitionsAdvanced:
        ``dst.Total -= repetitionsCount`` + removeHistogramRepetition)."""
        query = self.parse(q, dialect)
        pred = compile_node(query.root, self.resolver)
        df = self.df
        tf = self._time_filter(from_ms, to_ms)
        if tf is not None:
            df = df.filter(tf)
        df = self._apply_bucket_bounds(df, from_ms, to_ms)
        if self._index is not None:
            pairs, wildcards, or_groups = self._index_conjuncts(query.root)
            index_df, _, id_cols, stats, max_sel, bcast_max = self._index
            # the index is time-partitioned like the store (one directory
            # per ts_bucket, index.py) — apply the SAME bucket bounds to
            # the posting scan, or a 1-hour query over a month-old corpus
            # reads every index bucket before the semi-join
            index_df = self._apply_bucket_bounds(index_df, from_ms, to_ms)
            if stats is not None:
                # selectivity routing: hot tokens (df ratio > max_sel) match
                # most of the corpus — the semi-join would not shrink the
                # scan, so leave those conjuncts to the scan predicate
                pairs = [p for p in pairs if stats.ratio(*p) <= max_sel]
                wildcards = [w for w in wildcards if w[1]]  # need a prefix
                or_groups = [
                    g
                    for g in or_groups
                    if self._or_group_ratio(g, stats) <= max_sel
                ]
            if pairs or wildcards or or_groups:
                from .index import (
                    matching_ids_multi,
                    matching_ids_or,
                    matching_ids_wildcard,
                )

                def sized(ids, est_docs):
                    # stats-driven join strategy: a provably-small id set
                    # broadcasts, so the corpus side never shuffles on the
                    # id — the distinction between "smaller scan" and
                    # "shuffle-free scan" is what dominates at 100 TB
                    if (
                        stats is not None
                        and est_docs is not None
                        and est_docs <= bcast_max
                    ):
                        return F.broadcast(ids)
                    return ids

                if pairs:
                    ids = matching_ids_multi(index_df, pairs, id_cols)
                    est = (
                        min(stats.ratio(*p) for p in pairs)
                        * stats.total_docs
                        if stats is not None
                        else None
                    )
                    df = df.join(sized(ids, est), on=list(id_cols),
                                 how="left_semi")
                for fld, prefix, pat in wildcards:
                    ids = matching_ids_wildcard(index_df, fld, prefix, pat, id_cols)
                    # prefix-dictionary bound (index.prefix_bound): only
                    # a full (untruncated) hot list can bound the union
                    # of matching tokens' postings — truncated stats
                    # yield None and the join stays unhinted
                    est = (
                        stats.prefix_bound(fld, prefix)
                        if stats is not None
                        else None
                    )
                    df = df.join(sized(ids, est), on=list(id_cols),
                                 how="left_semi")
                for leaves in or_groups:
                    ids = matching_ids_or(index_df, leaves, id_cols)
                    est = (
                        self._or_group_ratio(leaves, stats)
                        * stats.total_docs
                        if stats is not None
                        else None
                    )
                    df = df.join(sized(ids, est), on=list(id_cols),
                                 how="left_semi")
        df = df.filter(pred)
        dedup = dedup_cols if dedup_cols is not None else self.default_dedup
        if dedup:
            df = df.dropDuplicates(list(dedup))
        return df, query.pipes

    def _apply_bucket_bounds(
        self, df: DataFrame, from_ms: Optional[int], to_ms: Optional[int]
    ) -> DataFrame:
        """Redundant-but-prunable time-bucket partition bounds on any
        frame that carries the store's partition column (store scan OR
        posting index): lexicographic compare is valid because
        date_format patterns like yyyy-MM-dd-HH order fields
        most-significant first; bucket granularity ⊇ the ts window, so
        the bounds are conservative (never drop matches). Bucket labels
        follow the session timezone, same as DocStore.append wrote
        them. No-op without a partition hint, a window, or the column."""
        if self._partition_hint is None or (from_ms is None and to_ms is None):
            return df
        pcol, fmt, _pdtype = self._partition_hint
        if pcol not in df.columns:
            return df
        # partition type inference can differ between store and index
        # directories — compare in THIS frame's own column type
        pdtype = dict(df.dtypes).get(pcol)

        def bound(ms: int) -> Column:
            label = F.date_format(F.timestamp_millis(F.lit(ms)), fmt)
            if pdtype == "date":
                return F.to_date(label)
            if pdtype in ("int", "bigint"):
                return label.cast(pdtype)
            return label

        if from_ms is not None:
            df = df.filter(F.col(pcol) >= bound(from_ms))
        if to_ms is not None:
            df = df.filter(F.col(pcol) <= bound(to_ms))
        return df

    def _sort_cols(self, order: str) -> List[Column]:
        """Result order is (MID, RID) = (millisecond timestamp, rid) — the
        reference's document identity (`seq/seq.go:37-90`), NOT raw
        sub-ms timestamp order: the wire cursor (`search_after`) can only
        carry ms+rid, so sorting by raw micros would disagree with the
        cursor's equality class and skip/duplicate rows whose timestamps
        differ only below the millisecond. Raw ts rides as a final
        tiebreak for deterministic output when rid is absent."""
        dtype = dict(self.df.dtypes).get(self.ts_col, "")
        if dtype.startswith("timestamp"):
            key: Column = F.unix_millis(
                F.col(self.ts_col).cast("timestamp")
                if dtype == "timestamp_ntz"
                else F.col(self.ts_col)
            )
        else:
            key = F.col(self.ts_col)
        cols = [key]
        if self.rid_col:
            cols.append(F.col(self.rid_col))
        cols.append(F.col(self.ts_col))
        if order == "desc":
            return [c.desc() for c in cols]
        return [c.asc() for c in cols]

    # ----------------------------------------------------------------- search

    def search(
        self,
        q: str = "*",
        from_ms: Optional[int] = None,
        to_ms: Optional[int] = None,
        size: Optional[int] = None,
        offset: int = 0,
        order: str = "desc",
        dedup_cols: Optional[Sequence[str]] = None,
        dialect: Optional[str] = None,
    ) -> DataFrame:
        """Filter + order by (ts, rid) + offset/size pagination
        (reference `seq/qpr.go:417-494` merge/paginate,
        `proxy/search/ingestor.go:195-208`).

        Returns the matching rows (all columns; apply pipes/projection on
        top). ``size=None`` returns every match (export mode,
        `proxyapi/grpc_export.go:27-77`).
        """
        if size is not None and size > MAX_SEARCH_DOCS:
            raise ValueError(f"size {size} exceeds max-search-docs {MAX_SEARCH_DOCS}")
        # prepared-plan cache: only when index routing is fully off — a
        # routed two_phase frame embeds an EXECUTED phase-1 id page and a
        # cached scan route could pin a decision the width TTL would
        # revisit; the un-indexed scan plan has neither concern. The
        # cached object is a lazy frame: every collect re-scans parquet.
        cacheable = self._index is None and self._two_phase_min_bytes is None
        key = (
            "search", q, from_ms, to_ms, size, offset, order,
            tuple(dedup_cols) if dedup_cols is not None else None,
            tuple(self.default_dedup) if self.default_dedup else None,
            dialect or self.dialect,
        )
        epoch = None
        if cacheable:
            with self._plan_cache_lock:
                hit = self._plan_cache.get(key)
                if hit is not None:
                    self._plan_cache.move_to_end(key)
                    self.route = "scan"
                    return hit[0]
                epoch = self._plan_cache_epoch
        routed = self._route_two_phase(
            q, from_ms, to_ms, size, offset, order, dedup_cols, dialect
        )
        if routed is not None:
            self.route = "two_phase"
            return routed
        self.route = "scan"
        df, pipes = self._filtered(q, from_ms, to_ms, dedup_cols, dialect)
        df = self._paginate(df, size, offset, order)
        df = self.apply_pipes(self._public(df), pipes)
        if cacheable:
            with self._plan_cache_lock:
                # insert only if no attach_index()/clear_width_cache()
                # fired since the epoch was captured (and the table is
                # STILL index-free): a plan built against superseded
                # state must never outlive the invalidation
                if (self._plan_cache_epoch == epoch
                        and self._index is None
                        and self._two_phase_min_bytes is None):
                    self._plan_cache[key] = (df,)
                    while len(self._plan_cache) > self._PLAN_CACHE_CAP:
                        self._plan_cache.popitem(last=False)
        return df

    def avg_doc_bytes(self, sample_files: int = 16) -> Optional[float]:
        """Average stored bytes per document — compressed parquet file
        size over footer record count, sampled over at most
        ``sample_files`` files spread across the table. Driver-side
        metadata reads only (Hadoop FileStatus + parquet footers, the
        same channel as DocStore's footer row counts): ZERO Spark jobs,
        works on any Hadoop filesystem. ``None`` when the frame is not
        file-backed (nothing to sample) or the metadata read fails —
        callers must treat that as "width unknown", never as narrow."""
        if self._avg_doc_bytes_cache:
            return self._avg_doc_bytes_cache[0]
        value: Optional[float] = None
        try:
            files = [f for f in self.df.inputFiles()
                     if f.endswith(".parquet")]
            if files:
                step = max(1, len(files) // sample_files)
                sample = files[::step][:sample_files]
                spark = self.df.sparkSession
                jvm = spark._jvm
                conf = spark._jsc.hadoopConfiguration()
                total_b = total_r = 0
                for p in sample:
                    jpath = jvm.org.apache.hadoop.fs.Path(p)
                    fs = jpath.getFileSystem(conf)
                    total_b += fs.getFileStatus(jpath).getLen()
                    inf = (jvm.org.apache.parquet.hadoop.util
                           .HadoopInputFile.fromPath(jpath, conf))
                    reader = (jvm.org.apache.parquet.hadoop
                              .ParquetFileReader.open(inf))
                    try:
                        total_r += reader.getRecordCount()
                    finally:
                        reader.close()
                if total_r:
                    value = total_b / total_r
        except Exception:
            value = None
        self._avg_doc_bytes_cache = (value,)
        return value

    def _route_two_phase(
        self,
        q: str,
        from_ms: Optional[int],
        to_ms: Optional[int],
        size: Optional[int],
        offset: int,
        order: str,
        dedup_cols: Optional[Sequence[str]],
        dialect: Optional[str],
        after: Optional[Tuple[int, int]] = None,
    ) -> Optional[DataFrame]:
        """Width-aware scan-vs-two-phase router (r16, verdict #2): when
        :meth:`attach_index` enabled it, a bounded, fully index-covered
        search over a WIDE corpus is served by :meth:`two_phase_search`
        — the reference's search→fetch architecture
        (`proxy/search/ingestor.go:140-151`) — because only the
        posting-page plan's I/O is independent of document width. The
        decision reads two zero-job signals: IndexStats selectivity
        (the same conjunct-ratio test the in-plan semi-join uses — a
        query with no selective conjunct stays on the scan, where the
        predicate matches most rows anyway) and the average stored doc
        width from parquet footers. Results are identical on both paths
        (pinned by the parity suite); EVERY precondition failure returns
        None and the caller falls back to the scan plan, so the router
        can never turn a servable query into an error."""
        if self._two_phase_min_bytes is None or self._index is None:
            return None
        if size is None or size + offset > MAX_SEARCH_DOCS:
            return None
        _idx, _f, id_cols, stats, max_sel, _b = self._index
        if tuple(id_cols) != ("mid", self.rid_col):
            return None
        dedup = dedup_cols if dedup_cols is not None else self.default_dedup
        if dedup and not set(id_cols) <= set(dedup):
            return None
        if dedup_cols is not None and list(dedup_cols) != list(
                self.default_dedup or []):
            # two_phase_search applies default_dedup; a caller-supplied
            # override must not be silently swapped for it
            return None
        try:
            query = self.parse(q, dialect)
        except Exception:
            return None  # the scan path re-parses and raises identically
        if not self._index_covers(query.root):
            return None
        pairs, wildcards, or_groups = self._index_conjuncts(query.root)
        if not (pairs or wildcards or or_groups):
            return None
        if stats is not None:
            ests = [stats.ratio(f, t) for f, t in pairs]
            ests += [self._or_group_ratio(g, stats) for g in or_groups]
            for fld, prefix, _pat in wildcards:
                bound = stats.prefix_bound(fld, prefix)
                if bound is not None:
                    ests.append(bound / max(1, stats.total_docs))
            if not ests or min(ests) > max_sel:
                return None
        width = self.avg_doc_bytes()
        if width is None or width < self._two_phase_min_bytes:
            return None
        try:
            return self.two_phase_search(
                q, from_ms=from_ms, to_ms=to_ms, size=size, offset=offset,
                order=order, dialect=dialect, after=after,
            )
        except ValueError:
            return None

    def _paginate(
        self, df: DataFrame, size: Optional[int], offset: int, order: str
    ) -> DataFrame:
        """Top-k + offset via native Offset: ``orderBy().offset(o).limit(n)``
        compiles to one ``TakeOrderedAndProject(limit=o+n, offset=o)`` —
        limit pushdown with no window, no single-partition stage (the
        early-exit top-k of `frac/processor/search.go:150-206` +
        the offset slice of `proxy/search/ingestor.go:195-208`)."""
        sort = self._sort_cols(order)
        df = df.orderBy(*sort)
        if offset > 0:
            df = df.offset(offset)
        if size is not None:
            df = df.limit(size)
        return df

    def two_phase_search(
        self,
        q: str,
        from_ms: Optional[int] = None,
        to_ms: Optional[int] = None,
        size: int = 100,
        offset: int = 0,
        order: str = "desc",
        dialect: Optional[str] = None,
        after: Optional[Tuple[int, int]] = None,
    ) -> DataFrame:
        """The reference's actual search architecture as one operator:
        top-(size+offset) ids from the POSTING LISTS alone (a narrow
        index scan + TakeOrdered — cost independent of document width),
        then ONE id-page fetch against the store, where parquet blooms /
        dictionary pages skip row groups that hold no page doc
        (`storeapi/grpc_fetch.go:42-216`; posting iteration in MID order,
        `frac/sealed_index.go:218-266`).

        Measured motivation (BASELINE.md §r15): on ~3 KB bodies this
        shape beats the tokens-at-rest column scan from ×10 on (0.28×)
        and stays ahead at ×100 (0.67×), while the in-plan routed
        semi-join returns to parity — only the two-phase plan's I/O is
        width-independent, which is the 100 TB text-search story.

        Residual conjuncts (r16): a query that is only PARTIALLY
        index-covered (e.g. ``text:alpha and not text:beta``) runs the
        covered conjuncts in phase 1 and the FULL predicate in phase 2,
        refilling with geometrically larger id pages until
        ``size + offset`` rows survive the re-filter or the postings are
        exhausted — the reference's own fetch-then-re-check shape
        (`storeapi/grpc_fetch.go:42-216` applies `FieldsFilter` after
        the fetch). Still bounded: the id page never exceeds
        ``MAX_SEARCH_DOCS``; if that cap underfills while postings
        remain, the method raises rather than silently truncating.

        Strictness (correctness over convenience — each would silently
        change results, so they raise instead):

        - at least one conjunct must be index-covered (an exact token,
          prefix wildcard or covered OR group at the top AND level) —
          otherwise there is no posting-only phase 1,
        - the index ``id_cols`` must be ``("mid", rid_col)`` — phase 1
          TakeOrders by ``id_cols``, which must agree with the engine's
          (mid, rid) search order (`seq/seq.go:37-90`; ms-granular
          windows apply exactly on the posting side),
        - ``default_dedup``, when set, must contain every id column —
          a dedup key coarser than the id would collapse rows AFTER
          pagination here but BEFORE it in :meth:`search`, underfilling
          pages without an error.

        The id-page ``isin`` reaches the parquet reader per-value
        (bloom + dictionary probes) only while
        ``spark.sql.parquet.pushdown.inFilterThreshold`` >= the page
        size — above it Spark degrades the push to a min/max RANGE,
        which random ids never prune. The operator OWNS that conf
        (r16): it raises the session threshold to cover its own page
        before returning, so the row-group-skipping win needs no
        deployment folklore. The raise is sticky session-wide and
        bounded by ``MAX_SEARCH_DOCS``; a larger In threshold only ever
        widens per-value pushdown, it cannot change results. Set
        ``table.own_in_filter_threshold = False`` (r17) to opt out and
        manage the threshold externally.

        ``after=(last_mid, last_rid)`` (r16) is the KEYSET cursor —
        resume strictly after that id, the deep-paging/export-resume
        shape of :meth:`search_after`: the cursor prunes the POSTING
        scan (phase 1 reads only ids past it) and re-filters the fetch,
        so page N of a wide-corpus drain stays width-independent
        instead of re-scanning O(cursor) documents. Mutually exclusive
        with ``offset``; ms-granular exactly like the posting mids.
        """
        if size is None or size + offset > MAX_SEARCH_DOCS:
            raise ValueError(
                f"two_phase_search pages are bounded: size+offset must be "
                f"<= {MAX_SEARCH_DOCS}")
        if after is not None and offset:
            raise ValueError("after (keyset cursor) and offset are "
                             "mutually exclusive")
        if self._index is None:
            raise ValueError("two_phase_search requires attach_index()")
        index_df, _fields, id_cols, _stats, _max_sel, _bcast = self._index
        if self.rid_col not in id_cols:
            raise ValueError(
                f"index id_cols {tuple(id_cols)} must include rid_col "
                f"{self.rid_col!r} — the fetch pages by rid")
        if tuple(id_cols) != ("mid", self.rid_col):
            raise ValueError(
                f"index id_cols {tuple(id_cols)} must be "
                f"('mid', {self.rid_col!r}) — phase 1 TakeOrders by "
                f"id_cols, which must agree with the (mid, rid) search "
                f"order or pages silently diverge from search()")
        if self.default_dedup and not set(id_cols) <= set(self.default_dedup):
            raise ValueError(
                f"default_dedup {tuple(self.default_dedup)} is coarser "
                f"than id_cols {tuple(id_cols)}: search() dedups the full "
                f"match set before paginating, a page-local dedup would "
                f"underfill — use search()")
        query = self.parse(q, dialect)
        pairs, wildcards, or_groups = self._index_conjuncts(query.root)
        if not (pairs or wildcards or or_groups):
            raise ValueError(
                "query has no index-covered conjunct; there is no "
                "posting-only phase 1 — use search()")
        fully_covered = self._index_covers(query.root)
        from .index import (
            matching_ids_multi,
            matching_ids_or,
            matching_ids_wildcard,
        )

        # same bucket-directory pruning as search(): a windowed query
        # must not list every time bucket of the index or the store
        index_df = self._apply_bucket_bounds(index_df, from_ms, to_ms)
        if from_ms is not None:
            index_df = index_df.filter(F.col("mid") >= F.lit(from_ms))
        if to_ms is not None:
            index_df = index_df.filter(F.col("mid") <= F.lit(to_ms))
        if after is not None:
            a_mid, a_rid = after
            im, ir = F.col("mid"), F.col(self.rid_col)
            if order == "desc":
                index_df = index_df.filter(
                    (im < F.lit(a_mid))
                    | ((im == F.lit(a_mid)) & (ir < F.lit(a_rid))))
            else:
                index_df = index_df.filter(
                    (im > F.lit(a_mid))
                    | ((im == F.lit(a_mid)) & (ir > F.lit(a_rid))))
        ids: Optional[DataFrame] = None

        def meet(nxt: DataFrame) -> DataFrame:
            # conjunct intersection stays on the narrow id frames
            return nxt if ids is None else ids.join(nxt, on=list(id_cols),
                                                    how="left_semi")

        if pairs:
            ids = meet(matching_ids_multi(index_df, pairs, id_cols))
        for fld, prefix, pat in wildcards:
            ids = meet(matching_ids_wildcard(index_df, fld, prefix, pat,
                                             id_cols))
        for leaves in or_groups:
            ids = meet(matching_ids_or(index_df, leaves, id_cols))
        sort = [F.col(c).desc() if order == "desc" else F.col(c).asc()
                for c in id_cols]
        spark = self.df.sparkSession
        thr_key = "spark.sql.parquet.pushdown.inFilterThreshold"

        def page_ids(k: int) -> list:
            page = ids.orderBy(*sort).limit(k).collect()
            rid_page = [row[self.rid_col] for row in page]
            # own the pushdown conf: per-value In push (bloom/dictionary
            # probes) only happens while the threshold covers the page.
            # Sticky session mutation by design (see
            # own_in_filter_threshold) — restore-after-return cannot
            # work because the conf is read at ACTION time, after this
            # method's lazy DataFrame has been handed back
            if self.own_in_filter_threshold:
                cur = int(spark.conf.get(thr_key, "10") or 10)
                if cur < len(rid_page):
                    spark.conf.set(thr_key, str(len(rid_page)))
            return rid_page

        def fetch(rid_page: list) -> DataFrame:
            # phase 2: one pushed-In fetch — rid blooms / dictionary
            # pages skip whole row groups; then <= page rows remain
            df = self._apply_bucket_bounds(self.df, from_ms, to_ms)
            df = df.filter(F.col(self.rid_col).isin(rid_page))
            if from_ms is not None or to_ms is not None:
                mid = self._mid_col()
                if from_ms is not None:
                    df = df.filter(mid >= F.lit(from_ms))
                if to_ms is not None:
                    df = df.filter(mid <= F.lit(to_ms))
            if after is not None:
                a_mid, a_rid = after
                fm, fr = self._mid_col(), F.col(self.rid_col)
                if order == "desc":
                    df = df.filter(
                        (fm < F.lit(a_mid))
                        | ((fm == F.lit(a_mid)) & (fr < F.lit(a_rid))))
                else:
                    df = df.filter(
                        (fm > F.lit(a_mid))
                        | ((fm == F.lit(a_mid)) & (fr > F.lit(a_rid))))
            df = df.filter(compile_node(query.root, self.resolver))
            if self.default_dedup:
                df = df.dropDuplicates(list(self.default_dedup))
            return df

        need = size + offset
        if fully_covered:
            df = fetch(page_ids(need))
        else:
            # residual re-filter: over-fetch, count survivors, refill
            # geometrically (O(log MAX/need) bounded iterations)
            k = min(MAX_SEARCH_DOCS, max(2 * need, need + 64))
            while True:
                rid_page = page_ids(k)
                df = fetch(rid_page)
                exhausted = len(rid_page) < k
                if exhausted or df.count() >= need:
                    break
                if k >= MAX_SEARCH_DOCS:
                    raise ValueError(
                        f"residual conjuncts underfill even the maximum "
                        f"id page ({MAX_SEARCH_DOCS}) with postings "
                        f"remaining — use search()")
                k = min(MAX_SEARCH_DOCS, k * 2)
        df = df.orderBy(*self._sort_cols(order))
        if offset > 0:
            df = df.offset(offset)
        return self.apply_pipes(self._public(df.limit(size)), query.pipes)

    def _index_covers(self, node) -> bool:
        """True when the ENTIRE predicate decomposes into index-routable
        conjuncts — the precondition for posting-only id pages."""
        from .seqql.ast import Logical, LogicalOp

        if isinstance(node, Logical) and node.op is LogicalOp.AND:
            return all(self._index_covers(c) for c in node.children)
        if self._index_leaf(node) is not None:
            return True
        return self._or_leaves(node) is not None

    def _mid_col(self) -> Column:
        """Millisecond identity of ``ts_col`` (MID, `seq/seq.go:37-90`)."""
        dtype = dict(self.df.dtypes).get(self.ts_col, "")
        if dtype.startswith("timestamp"):
            return F.unix_millis(
                F.col(self.ts_col).cast("timestamp")
                if dtype == "timestamp_ntz"
                else F.col(self.ts_col)
            )
        return F.col(self.ts_col)

    def search_after(
        self,
        q: str = "*",
        last_ts_ms: Optional[int] = None,
        last_rid: Optional[int] = None,
        size: Optional[int] = 100,
        order: str = "desc",
        from_ms: Optional[int] = None,
        to_ms: Optional[int] = None,
        dialect: Optional[str] = None,
    ) -> DataFrame:
        """Keyset ("search after") pagination: resume strictly after the
        (ts, rid) cursor of the last doc on the previous page.

        The 100 TB path for deep paging/export: page N costs one pruned
        top-k scan instead of the O(offset) re-scan that offset pagination
        pays (the reference's iterative fraction search exists for exactly
        this reason, `fracmanager/searcher.go:50-123`). The cursor predicate
        on ``ts`` also prunes time partitions/row groups.

        r16: when width-aware two-phase routing is enabled
        (:meth:`attach_index` ``two_phase_min_doc_bytes``) and the
        cursor is complete, eligible pages route through
        :meth:`two_phase_search` with its keyset cursor — a wide-corpus
        export drain then reads postings + page rows per page instead
        of re-scanning wide documents. Same silent-fallback contract as
        :meth:`search`.
        """
        if last_ts_ms is not None and last_rid is not None:
            routed = self._route_two_phase(
                q, from_ms, to_ms, size, 0, order, None, dialect,
                after=(last_ts_ms, last_rid),
            )
            if routed is not None:
                self.route = "two_phase"
                return routed
        self.route = "scan"
        df, pipes = self._filtered(q, from_ms, to_ms, dialect=dialect)
        if last_ts_ms is not None:
            # bare ts comparisons (not unix_millis(ts) wrappers) so the
            # cursor actually reaches PushedFilters — the whole point of
            # keyset paging at scale. ms-cursor semantics on a possibly
            # sub-ms column: "ms == last" ⟺ last ≤ ts < last+1.
            dtype = dict(self.df.dtypes).get(self.ts_col)
            if dtype == "timestamp":
                ts = F.col(self.ts_col)
                t0 = F.timestamp_millis(F.lit(last_ts_ms))
                t1 = F.timestamp_millis(F.lit(last_ts_ms + 1))
                lt, gt, eq = ts < t0, ts >= t1, (ts >= t0) & (ts < t1)
            else:
                ts_ms = F.unix_millis(F.col(self.ts_col))
                lt = ts_ms < F.lit(last_ts_ms)
                gt = ts_ms > F.lit(last_ts_ms)
                eq = ts_ms == F.lit(last_ts_ms)
            if order == "desc":
                cond = lt
                if last_rid is not None and self.rid_col:
                    cond = cond | (eq & (F.col(self.rid_col) < F.lit(last_rid)))
            else:
                cond = gt
                if last_rid is not None and self.rid_col:
                    cond = cond | (eq & (F.col(self.rid_col) > F.lit(last_rid)))
            df = df.filter(cond)
        df = df.orderBy(*self._sort_cols(order))
        if size is not None:  # None = unbounded (export-resume mode)
            df = df.limit(size)
        return self.apply_pipes(self._public(df), pipes)

    def apply_pipes(self, df: DataFrame, pipes: List[PipeFields]) -> DataFrame:
        """`fields a,b` / `fields except a,b` projection
        (reference `storeapi/grpc_fetch.go:170-216`).

        On a document store (a ``raw`` JSON column) the pipe filters the
        JSON text of each returned document, exactly like the reference's
        FieldsFilter on fetched docs; on a typed table it selects/drops
        columns (the columnar analog, oracle-verified)."""
        for p in pipes:
            if "raw" in df.columns:
                from .ingest import project_fields

                df = df.withColumn(
                    "raw", project_fields(F.col("raw"), list(p.fields), p.except_)
                )
                continue
            existing = set(df.columns)
            if p.except_:
                df = df.drop(*[f for f in p.fields if f in existing])
            else:
                keep = [f for f in p.fields if f in existing]
                df = df.select(*keep)
        return df

    def total(
        self,
        q: str = "*",
        from_ms: Optional[int] = None,
        to_ms: Optional[int] = None,
        dialect: Optional[str] = None,
    ) -> DataFrame:
        """`with_total` — match count independent of size
        (reference `frac/processor/search.go:95-116`)."""
        df, _ = self._filtered(q, from_ms, to_ms, dialect=dialect)
        return df.agg(F.count(F.lit(1)).alias("total"))

    def fetch(self, ids_df: DataFrame, id_cols: Sequence[str]) -> DataFrame:
        """Fetch-by-ID as a broadcast left-semi join (reference
        `storeapi/grpc_fetch.go:42-216`; ID lists are small, the table is
        not — broadcast keeps it shuffle-free at 100 TB)."""
        return self._public(
            self.df.join(F.broadcast(ids_df), on=list(id_cols), how="left_semi")
        )

    def fetch_ids(self, ids: Sequence, id_col: str) -> DataFrame:
        return self._public(self.df.filter(F.col(id_col).isin(list(ids))))

    # ----------------------------------------------------------------- status

    def mapping_dict(self) -> Dict[str, object]:
        """Active mapping as field → type(s) — the Mapping endpoint
        (`proxyapi/grpc_mapping.go:9`)."""
        return mapping_dict(self.mapping)

    def explain(
        self,
        q: str = "*",
        from_ms: Optional[int] = None,
        to_ms: Optional[int] = None,
        dialect: Optional[str] = None,
    ) -> str:
        """Explain trace for a query — the analog of the reference's
        per-request explain output (`proxyapi/grpc_complex_search.go:34-60`
        attaches an explain tree to responses): the parsed AST plus Spark's
        full queryExecution trace (logical → optimized → physical), which
        shows whether predicates reached PushedFilters and whether the
        inverted index routed the query (LeftSemi)."""
        query = self.parse(q, dialect)
        df, _ = self._filtered(q, from_ms, to_ms, dialect=dialect)
        # canonical echo: the normalized seq-ql form of the query, like the
        # server's SeqQLString round-trip (`parser/seqql.go:18-26`) — shows
        # the user exactly how both dialects were understood
        from .seqql.render import seqql_string

        canonical = seqql_string(query)
        return (
            f"Query: {canonical}\nAST: {query.root}\n"
            f"{df._jdf.queryExecution().toString()}"
        )

    def explain_tree(
        self,
        q: str = "*",
        from_ms: Optional[int] = None,
        to_ms: Optional[int] = None,
        dialect: Optional[str] = None,
    ) -> Dict[str, object]:
        """Structured explain: a span tree ``{message, duration_sec,
        children}`` — the shape of the reference's query tracer
        (`proxy/search/ingestor.go:576` builds nested ExplainEntry spans,
        `grpc_complex_search.go:58` attaches the root). Children time the
        actual phases: parse, predicate compilation + logical planning,
        and physical planning; the physical plan text rides in the last
        child so a gRPC client sees the same pushdown/routing evidence the
        string explain carries."""
        import time as _time

        from .seqql.render import seqql_string

        t_root = _time.perf_counter()
        children: List[Dict[str, object]] = []

        t0 = _time.perf_counter()
        query = self.parse(q, dialect)
        canonical = seqql_string(query)
        children.append(
            {
                "message": f"parse [{dialect or self.dialect}]: {canonical}",
                "duration_sec": _time.perf_counter() - t0,
                "children": [
                    {
                        "message": f"AST: {query.root}",
                        "duration_sec": 0.0,
                        "children": [],
                    }
                ],
            }
        )

        t0 = _time.perf_counter()
        df, _ = self._filtered(q, from_ms, to_ms, dialect=dialect)
        children.append(
            {
                "message": "compile predicates + logical plan",
                "duration_sec": _time.perf_counter() - t0,
                "children": [],
            }
        )

        t0 = _time.perf_counter()
        plan = df._jdf.queryExecution().executedPlan().toString()
        children.append(
            {
                "message": f"physical plan:\n{plan}",
                "duration_sec": _time.perf_counter() - t0,
                "children": [],
            }
        )
        return {
            "message": f"explain: {canonical}",
            "duration_sec": _time.perf_counter() - t_root,
            "children": children,
        }

    def status(self) -> Dict[str, object]:
        """Store status — doc count + time bounds, the Status endpoint
        analog (`proxyapi/grpc_status.go:12`, `proxy/search/ingestor.go:
        644-700` reports per-store oldest time). One aggregate scan."""
        row = self.df.agg(
            F.count(F.lit(1)).alias("docs"),
            F.unix_millis(F.min(self.ts_col)).alias("oldest_ms"),
            F.unix_millis(F.max(self.ts_col)).alias("newest_ms"),
        ).head()
        return {
            "docs": row["docs"],
            "oldest_ms": row["oldest_ms"],
            "newest_ms": row["newest_ms"],
            "fields": self.mapping_dict(),
        }

    # -------------------------------------------------------------- histogram

    def histogram(
        self,
        q: str = "*",
        interval_ms: int = 60_000,
        from_ms: Optional[int] = None,
        to_ms: Optional[int] = None,
        dialect: Optional[str] = None,
    ) -> DataFrame:
        """Date histogram: doc count per time bucket, bucket = MID - MID %
        interval (reference `frac/processor/search.go:169-179`,
        `seq/qpr.go:113-136`). Output: (bucket_ms BIGINT, cnt BIGINT)."""
        df, _ = self._filtered(q, from_ms, to_ms, dialect=dialect)
        ts_ms = F.unix_millis(F.col(self.ts_col))
        bucket = (ts_ms - ts_ms % F.lit(interval_ms)).alias("bucket_ms")
        return df.groupBy(bucket).agg(F.count(F.lit(1)).alias("cnt"))

    # ------------------------------------------------------------ aggregation

    def _field_scalar_or_explode(self, df: DataFrame, fieldname: str, out: str) -> DataFrame:
        """Attach one row per (doc, token-of-field); docs without the field
        keep a single row with NULL (NotExists accounting,
        `frac/processor/aggregator.go:77-117`)."""
        spec = self.resolver.resolve(fieldname)
        if spec.scalar is not None:
            return df.withColumn(out, spec.scalar())
        return df.withColumn(out, F.explode_outer(spec.tokens()))

    def last_agg_plan_df(self) -> Optional[DataFrame]:
        """The DataFrame whose plan the last EAGER aggregate executed.

        Guarded non-timeseries aggregates run in-job and return a
        LocalRelation whose plan says nothing about the work done; this
        accessor exposes the probe frame for plan diagnostics. None if no
        eager aggregate has run. CAVEAT: this is the LAST probe only —
        a caller that ran multiple aggregates sees one of them; plan
        pinning must use :meth:`drain_agg_plan_dfs` instead."""
        return getattr(self, "_last_agg_plan_df", None)

    #: bounded probe buffer: a long-running server that never drains must
    #: not accumulate DataFrame handles without bound
    _AGG_PLAN_BUFFER_CAP = 32
    #: prepared-plan cache entries per table (search + aggregate shapes);
    #: LRU-evicted, cleared by clear_width_cache()/attach_index()
    _PLAN_CACHE_CAP = 64
    #: class-level lock: append (aggregate) and drain race under the
    #: server's concurrent searchers — an unsynchronized read-modify-write
    #: could resurrect drained probes or drop fresh ones. Shared across
    #: instances; the critical sections are tiny list ops.
    _agg_plan_lock = threading.Lock()

    def drain_agg_plan_dfs(self) -> List[DataFrame]:
        """ALL probe frames executed by eager aggregates since the last
        drain, oldest first — and resets the buffer. bench.py drains
        around each agg bench query so a multi-aggregate query
        fingerprints EVERY executed probe plan, not silently just the
        last one. The buffer keeps the most recent 32 probes; a server
        that never drains stays bounded."""
        with self._agg_plan_lock:
            out = getattr(self, "_agg_plan_dfs", [])
            self._agg_plan_dfs = []
        return out

    def aggregate(
        self,
        aggq: AggQuery,
        q: str = "*",
        from_ms: Optional[int] = None,
        to_ms: Optional[int] = None,
        max_group_tokens: int = AGG_MAX_GROUP_TOKENS,
        strict: bool = False,
        enforce_guard: bool = True,
        ordered: bool = True,
        max_field_tokens: int = AGG_MAX_FIELD_TOKENS,
        dialect: Optional[str] = None,
    ) -> DataFrame:
        """One aggregation over the filtered set (reference
        `frac/processor/aggregator.go:34-346`, finalize `seq/qpr.go:199-314`).

        Output schema (stable): ``mid_ms BIGINT`` (time bin start; NULL
        without interval), ``name STRING`` (group token; NULL when no
        group_by; the legacy ``_not_exists`` bucket name for count),
        ``value DOUBLE`` (NaN for buckets with zero parsed samples,
        `seq/qpr.go:288-290`), ``not_exists BIGINT`` (docs in this group
        whose agg field is missing → bucket NotExists,
        `frac/processor/aggregator.go:83-87`), plus ``q0..qN`` DOUBLE for
        quantile requests. Result-level NotExists: :meth:`agg_not_exists`.

        ``strict=True`` reproduces fail-on-first-unparsable-token
        (`aggregator.go:150-157`); the default skips unparsable tokens
        (cheaper at scale; both modes pinned in tests).

        ``enforce_guard=True`` applies the ErrTooManyUniqValues guard
        (`frac/processor/eval_tree.go:78-85`) on the aggregated bucket set.

        ``ordered=True`` returns buckets in the reference order
        (`seq/qpr.go:216-253`).
        """
        key = (
            "agg", q, from_ms, to_ms,
            aggq.func.lower(), aggq.field, aggq.group_by,
            tuple(aggq.quantiles or ()), aggq.interval_ms,
            bool(aggq.exact_quantiles),
            max_group_tokens, strict, enforce_guard, ordered,
            max_field_tokens, dialect or self.dialect,
            tuple(self.default_dedup) if self.default_dedup else None,
        )
        built = None
        with self._plan_cache_lock:
            hit = self._plan_cache.get(key)
            if hit is not None:
                self._plan_cache.move_to_end(key)
                built = hit[0]
            epoch = self._plan_cache_epoch
        if built is None:
            df, _ = self._filtered(q, from_ms, to_ms, dialect=dialect)
            built = self._agg_build(
                df, aggq, max_group_tokens, strict, enforce_guard,
                ordered, max_field_tokens,
            )
            # the timeseries-guard path persists per call (FIFO-owned);
            # caching its construction would alias persist bookkeeping
            # across calls — leave it uncached. The epoch guard keeps a
            # plan built across a concurrent attach_index() (whose
            # embedded posting semi-join is already stale) out of the
            # cache — see clear_width_cache()
            if not built.timeseries_guard:
                with self._plan_cache_lock:
                    if self._plan_cache_epoch == epoch:
                        self._plan_cache[key] = (built,)
                        while len(self._plan_cache) > self._PLAN_CACHE_CAP:
                            self._plan_cache.popitem(last=False)
        return self._agg_execute(built, max_group_tokens, max_field_tokens, ordered)

    def _aggregate_on(
        self,
        df: DataFrame,
        aggq: AggQuery,
        max_group_tokens: int = AGG_MAX_GROUP_TOKENS,
        strict: bool = False,
        enforce_guard: bool = True,
        ordered: bool = True,
        persisted_sink: Optional[List[DataFrame]] = None,
        max_field_tokens: int = AGG_MAX_FIELD_TOKENS,
    ) -> DataFrame:
        built = self._agg_build(
            df, aggq, max_group_tokens, strict, enforce_guard, ordered,
            max_field_tokens,
        )
        return self._agg_execute(
            built, max_group_tokens, max_field_tokens, ordered,
            persisted_sink=persisted_sink,
        )

    def _agg_build(
        self,
        df: DataFrame,
        aggq: AggQuery,
        max_group_tokens: int,
        strict: bool,
        enforce_guard: bool,
        ordered: bool,
        max_field_tokens: int,
    ) -> "_AggBuilt":
        """Construct every LAZY frame one aggregation needs — the
        expensive py4j half of :meth:`aggregate`, split from execution
        (r17) so repeated identical requests reuse the prepared plans.
        No Spark job runs here; :meth:`_agg_execute` owns every action."""
        validate_agg(aggq)
        func = aggq.func.lower()
        group_by = aggq.group_by
        fieldname = aggq.field
        if func in ("count", "unique") and group_by is None:
            group_by, fieldname = fieldname, None  # legacy alias

        if aggq.interval_ms:
            ts_ms = F.unix_millis(F.col(self.ts_col))
            df = df.withColumn("__mid", ts_ms - ts_ms % F.lit(aggq.interval_ms))
        else:
            df = df.withColumn("__mid", F.lit(None).cast("long"))

        if group_by is not None:
            df = self._field_scalar_or_explode(df, group_by, "__group")
        else:
            df = df.withColumn("__group", F.lit(None).cast("string"))

        zero = F.lit(0).cast("long")
        bad = None
        if func == "count":
            if group_by is None:
                out = (
                    df.groupBy("__mid", "__group")
                    .agg(F.count(F.lit(1)).cast("double").alias("value"))
                    .withColumn("not_exists", zero)
                )
            else:
                # legacy `_not_exists` bucket (docs whose group token is
                # missing, `frac/processor/aggregator.go:219-227`) folded
                # into the SAME aggregation pass (r17, guide §2.4): the
                # union shape this replaced scanned the corpus twice and
                # paid two exchanges; mapping missing rows to the
                # synthetic bucket key pre-shuffle yields identical rows
                # from one scan + one exchange. __missing keeps a REAL
                # group token spelled "_not_exists" in its own bucket,
                # exactly as the union kept it a separate row.
                missing = F.col("__group").isNull()
                out = (
                    df.select(
                        F.when(missing, F.lit(None).cast("long"))
                        .otherwise(F.col("__mid"))
                        .alias("__mid"),
                        F.when(missing, F.lit("_not_exists"))
                        .otherwise(F.col("__group"))
                        .alias("__group"),
                        missing.alias("__missing"),
                    )
                    .groupBy("__mid", "__group", "__missing")
                    .agg(F.count(F.lit(1)).cast("double").alias("value"))
                    .drop("__missing")
                    .withColumn("not_exists", zero)
                )
        elif func == "unique":
            # distinct group tokens as buckets, value 0 (the reference's
            # unique buckets carry empty sample containers,
            # `aggregator.go:236-283` + `seq/qpr.go:263-264`); the distinct
            # count the API exposes = number of buckets
            out = (
                df.filter(F.col("__group").isNotNull())
                .select("__mid", "__group")
                .distinct()
                .withColumn("value", F.lit(0.0))
                .withColumn("not_exists", zero)
            )
        else:
            if fieldname is None:
                raise ValueError(f"agg func {func!r} requires a field")
            df = self._field_scalar_or_explode(df, fieldname, "__fieldtok")
            # __val is non-NULL exactly for tokens the reference's parseNum
            # accepts (`frac/processor/aggregator.go:150-157`: ParseFloat
            # AND not NaN/Inf). A bare try_cast is LOOSER — it trims
            # whitespace (token ' 5' would contribute 5.0) and passes
            # 'Infinity'/'nan' spellings through as non-finite doubles that
            # poison sum/min/max/avg in the skip-unparsable default mode
            # (r12 agg-fuzz class of bug; the same Go-decimal guard the
            # range matcher uses). 1e309-style overflows pass the regex but
            # cast to inf — rejected by the finite checks.
            raw = F.col("__fieldtok").try_cast("double")
            ok = (
                F.col("__fieldtok").rlike(_GO_FLOAT_JAVA_RE)
                & raw.isNotNull()
                & ~F.isnan(raw)
                & (raw != F.lit(float("inf")))
                & (raw != F.lit(float("-inf")))
            )
            df = df.withColumn("__val", F.when(ok, raw))
            if strict:
                # fail the aggregation on the first unparsable token
                # (`frac/processor/aggregator.go:128-133`: parseNum errors
                # PROPAGATE — the reference always fails; here opt-in) —
                # one extra pruned pass over the filtered set, executed by
                # _agg_execute before the aggregation runs
                bad = df.filter(
                    F.col("__fieldtok").isNotNull() & F.col("__val").isNull()
                ).select("__fieldtok")
            has_field = F.col("__fieldtok").isNotNull()
            # Single-pass bucket accounting: with group_by, keep the
            # missing-field rows IN the aggregation — every value expr runs
            # on __val, which is NULL exactly when the field token is
            # missing (nulls are skipped by sum/min/max/avg/percentile/
            # count/HLL), so the agg results are unchanged and a
            # count(missing) column yields the per-bucket NotExists
            # (`frac/processor/aggregator.go:83-87`) with NO second
            # aggregation and NO full-outer join — one shuffle total.
            if group_by is not None:
                base = df.filter(F.col("__group").isNotNull())
                ne_cols = [
                    F.count(F.when(~has_field, F.lit(1))).alias("not_exists")
                ]
            else:
                base = df.filter(has_field)
                ne_cols = []
            agg_exprs = {
                "sum": F.sum("__val"),
                "min": F.min("__val"),
                "max": F.max("__val"),
                "avg": F.avg("__val"),
            }
            n_samples = F.count("__val").alias("__n")
            # per-bucket approx-distinct of the raw field tokens: summed
            # over buckets it upper-bounds the GLOBAL distinct-token count,
            # so the `--agg-max-field-tokens` guard rides the same
            # aggregation job (`frac/processor/eval_tree.go:78-85`,
            # MaxFieldTokens); only a sum past the limit triggers a real
            # second pass to confirm. Measured r17: the HLL is an
            # ImperativeAggregate, so it keeps the agg operator out of
            # whole-stage codegen (~+40-100 ms on a 100k-row job) — still
            # far cheaper than the second full pass it replaces, and at
            # scale the scan dominates
            ftok = F.approx_count_distinct("__fieldtok").alias("__ftok")
            if func in agg_exprs:
                out = base.groupBy("__mid", "__group").agg(
                    agg_exprs[func].alias("value"), n_samples, ftok, *ne_cols
                )
            elif func == "quantile":
                qs = list(aggq.quantiles)
                if not qs:
                    raise ValueError("quantile agg requires quantiles")
                pct = F.percentile if aggq.exact_quantiles else F.percentile_approx
                qcols = [
                    pct("__val", float(qv)).alias(f"q{i}") for i, qv in enumerate(qs)
                ]
                out = base.groupBy("__mid", "__group").agg(
                    *qcols, n_samples, ftok, *ne_cols
                )
                out = out.withColumn("value", F.col("q0"))
            else:
                raise ValueError(f"unknown agg func {func!r}")
            # buckets with rows but zero parsed samples -> NaN
            # (`seq/qpr.go:288-290`)
            out = out.withColumn(
                "value",
                F.when(F.col("__n") == 0, F.lit(float("nan"))).otherwise(
                    F.col("value")
                ),
            ).drop("__n")
            if group_by is None:
                out = out.withColumn("not_exists", zero)
            # with group_by, not_exists was computed inside the single
            # aggregation pass above; groups that only have missing-field
            # docs still get a bucket (their __n is 0 -> value NaN)

        out = out.withColumnRenamed("__mid", "mid_ms").withColumnRenamed(
            "__group", "name"
        )
        is_field_agg = func not in ("count", "unique")
        group_guard = enforce_guard and group_by is not None
        field_guard = enforce_guard and is_field_agg and max_field_tokens > 0
        eager = (group_guard or field_guard) and not aggq.interval_ms
        timeseries_guard = (group_guard or field_guard) and bool(aggq.interval_ms)
        probe = None
        if eager:
            # group guard BOUNDS the bucket set; limit(cap+2) keeps the
            # failure path bounded too (a runaway group collects at most
            # cap+2 rows before the error, never the full bucket set).
            # +2, not +1: the synthetic `_not_exists` bucket (count aggs,
            # missing-field docs) rides along and must NOT count toward
            # the group-token guard — the reference guard counts unique
            # group TOKENS (`eval_tree.go:78-85`), and a field with
            # exactly max_group_tokens values plus missing docs would
            # otherwise fail spuriously
            probe = out.limit(max_group_tokens + 2) if group_guard else out
        dropped = out.drop("__ftok")
        post = dropped
        if ordered:
            post = self.order_buckets(post, func)
        local_schema = local_names = local_arrow = None
        if eager:
            # the eager path rebuilds its result as a LocalRelation —
            # prepare the schema state HERE so a cached construction
            # never pays the py4j schema parse + pyarrow conversion per
            # execute, and concurrent executes share immutable state
            local_schema = dropped.schema
            local_names = [fld.name for fld in local_schema.fields]
            local_arrow = _local_frame_schemas(local_schema)
        return _AggBuilt(
            out=out,
            post=post,
            probe=probe,
            bad=bad,
            src=df,
            func=func,
            group_by=group_by,
            fieldname=fieldname,
            group_guard=group_guard,
            field_guard=field_guard,
            eager=eager,
            timeseries_guard=timeseries_guard,
            local_schema=local_schema,
            local_names=local_names,
            local_arrow=local_arrow,
        )

    def _agg_execute(
        self,
        built: "_AggBuilt",
        max_group_tokens: int,
        max_field_tokens: int,
        ordered: bool,
        persisted_sink: Optional[List[DataFrame]] = None,
    ) -> DataFrame:
        """Run one aggregation from its prepared frames — every Spark
        ACTION of the aggregate path lives here, so a cached construction
        still computes from parquet on every call."""
        if built.bad is not None:
            sample = built.bad.head(1)
            if sample:
                raise AggParseError(
                    f"parse errors reached, last_value={sample[0][0]!r}"
                )
        out = built.out
        func = built.func
        if built.eager:
            # Non-timeseries guarded agg: the group guard BOUNDS the bucket
            # set (<= max_group_tokens rows; a single bucket without
            # group_by), so materialize the buckets driver-side in the ONE
            # job the caller would run anyway and check both guards on the
            # collected rows — no persist, no second job, no cache
            # bookkeeping. This is the reference-proxy shape: buckets merge
            # on the coordinator (`seq/qpr.go:199-254`) before the guard
            # verdict (`frac/processor/eval_tree.go:78-85`).
            probe = built.probe
            # the returned LocalRelation hides the executed plan; keep the
            # probe frame so diagnostics (bench.py plan-digest pinning) can
            # fingerprint what actually ran
            self._last_agg_plan_df = probe
            with self._agg_plan_lock:
                buf = getattr(self, "_agg_plan_dfs", [])
                buf.append(probe)
                self._agg_plan_dfs = buf[-self._AGG_PLAN_BUFFER_CAP:]
            rows = probe.collect()
            real_groups = sum(1 for r in rows if r["name"] != "_not_exists")
            if built.group_guard and real_groups > max_group_tokens:
                n = out.count()  # failure path only: exact n for the message
                raise TooManyUniqValuesError(
                    f"group_by {built.group_by!r} has {n} unique tokens > "
                    f"{max_group_tokens}"
                )
            if built.field_guard and (
                sum(r["__ftok"] or 0 for r in rows) > max_field_tokens
            ):
                self._confirm_field_guard(
                    built.src, built.fieldname, max_field_tokens
                )
            # rebuild as a JVM-side LocalRelation: the caller's collect (and
            # any downstream op) then reads <= guard-cap rows without
            # re-running the aggregation. Ordering happens driver-side in
            # Python (`_bucket_sort_key` mirrors `bucket_order_cols`
            # exactly, property-tested) because orderBy on a LocalRelation
            # still pays a range-partitioning sampling job.
            names = built.local_names
            data = [tuple(r[nm] for nm in names) for r in rows]
            if ordered:
                data.sort(key=self._bucket_sort_key(func, names))
            return _local_frame(
                out.sparkSession, data, built.local_schema,
                prepared=built.local_arrow,
            )
        if built.timeseries_guard:
            # Timeseries guarded agg: bins x groups rows are NOT bounded by
            # the group guard (which counts distinct group tokens), so stay
            # lazy/distributed. Persist so the guard action and the caller's
            # collect share ONE aggregation run — the cache plays the role of
            # the reference proxy's materialized bucket merge
            # (`seq/qpr.go:199-254`) without a driver round-trip. The
            # persisted frame is handed to ``persisted_sink`` so the owner
            # (e.g. ComplexSearchResult.unpersist) can release it.
            out = out.persist()
            if persisted_sink is not None:
                persisted_sink.append(out)
            else:
                # direct aggregate() calls have no owner to release the
                # cache: keep a small FIFO per table so repeated requests
                # don't accumulate persisted frames for the session's life.
                # The lock guards concurrent HTTP handler threads: without
                # it one request could evict (unpersist) a frame another
                # request is still collecting from. That eviction is NOT
                # just a recompute: Spark's CacheManager dedupes entries
                # by canonicalized plan, and dropping blocks under an
                # in-flight collect fails the task ("Block rdd_N_M does
                # not exist") — fatal under local mode's single-attempt
                # tasks. The server's _retry_transient replays such
                # requests once (soak-verified); library callers invoking
                # aggregate() directly should expect one retryable error
                # under identical-plan concurrency.
                with self._guard_cache_lock:
                    self._guard_cache.append(out)
                    evicted = (
                        self._guard_cache.pop(0)
                        if len(self._guard_cache) > 8
                        else None
                    )
                if evicted is not None:
                    evicted.unpersist()
            stat_cols = [
                F.count(F.lit(1)).alias("__rows"),
                # exclude the synthetic `_not_exists` bucket — the guard
                # counts real group tokens (same rule as the eager path)
                F.count_distinct(
                    F.when(F.col("name") != "_not_exists", F.col("name"))
                ).alias("__groups"),
            ]
            if built.field_guard:
                stat_cols.append(F.sum("__ftok").alias("__ftoks"))
            stats = out.agg(*stat_cols).head()
            if built.group_guard:
                # the guard counts distinct group tokens, not bins x groups
                n = stats["__groups"]
                if n > max_group_tokens:
                    out.unpersist()
                    raise TooManyUniqValuesError(
                        f"group_by {built.group_by!r} has {n} unique tokens > "
                        f"{max_group_tokens}"
                    )
            if built.field_guard and (stats["__ftoks"] or 0) > max_field_tokens:
                try:
                    self._confirm_field_guard(
                        built.src, built.fieldname, max_field_tokens
                    )
                except TooManyUniqValuesError:
                    out.unpersist()
                    raise
        return built.post

    @staticmethod
    def _confirm_field_guard(df, fieldname, max_field_tokens) -> None:
        """The per-bucket __ftok sum is only an UPPER bound on the global
        distinct count (a token may occur in many buckets) — confirm with
        one real pass before failing the request. Shared by the eager and
        timeseries guard paths (it was duplicated verbatim before)."""
        n_f = df.agg(
            F.approx_count_distinct("__fieldtok").alias("n")
        ).head()["n"]
        if n_f > max_field_tokens:
            raise TooManyUniqValuesError(
                f"field {fieldname!r} has ~{n_f} unique tokens > "
                f"{max_field_tokens} (--agg-max-field-tokens)"
            )

    @staticmethod
    def _bucket_sort_key(func: str, cols: Sequence[str]):
        """Python mirror of :meth:`bucket_order_cols` for driver-side
        ordering of guard-bounded bucket rows (eager non-timeseries path).
        Property-tested against the Spark exprs in
        ``test_bucket_sort_key_matches_order_buckets``."""
        i_mid = cols.index("mid_ms")
        i_name = cols.index("name")
        i_val = cols.index("value")

        def key(row):
            mid, name, val = row[i_mid], row[i_name], row[i_val]
            midk = (0, 0) if mid is None else (1, mid)
            namek = (0, "") if name is None else (1, name)
            nan = val is None or (isinstance(val, float) and math.isnan(val))
            # inside the NaN group every value is equal; collapse so the
            # next key breaks ties deterministically (matches the Spark
            # side's `eff`)
            eff = 0.0 if nan else float(val)
            flag = 1 if nan else 0
            if func == "min":
                # value ASC, NaN strictly below all numbers → NaN first
                return (midk, -flag, eff, namek)
            if func == "quantile":
                return (midk, namek, flag, -eff)
            # default: value DESC → NaN last
            return (midk, flag, -eff, namek)

        return key

    @staticmethod
    def bucket_order_cols(func: str) -> List[Column]:
        """Reference bucket ordering (`seq/qpr.go:216-253` sortBuckets):
        time bin ascending first, then — default: value DESC, name ASC;
        MIN: value ASC, name ASC; QUANTILE: name ASC, value DESC.

        Go's cmp.Compare orders NaN STRICTLY below every number including
        -Infinity; Spark sorts NaN ABOVE all doubles. Sort on two keys — an
        is-NaN/NULL flag first, then the raw value — so NaN buckets land
        past genuine -Infinity values instead of tying with them (ties
        inside the NaN group still break by name)."""
        mid = F.col("mid_ms").asc_nulls_first()
        is_nan = F.col("value").isNull() | F.isnan("value")
        # inside the NaN group every value is equal; collapse so the next
        # key (name) breaks ties deterministically
        eff = F.when(is_nan, F.lit(0.0)).otherwise(F.col("value"))
        flag = is_nan.cast("int")
        name = F.col("name").asc_nulls_first()
        if func == "min":
            # value ASC → NaN below all numbers sorts FIRST
            return [mid, flag.desc(), eff.asc(), name]
        if func == "quantile":
            return [mid, name, flag.asc(), eff.desc()]
        # default: value DESC → NaN sorts LAST
        return [mid, flag.asc(), eff.desc(), name]

    @classmethod
    def order_buckets(cls, buckets: DataFrame, func: str) -> DataFrame:
        return buckets.orderBy(*cls.bucket_order_cols(func))

    def agg_not_exists(
        self,
        aggq: AggQuery,
        q: str = "*",
        from_ms: Optional[int] = None,
        to_ms: Optional[int] = None,
        dialect: Optional[str] = None,
    ) -> DataFrame:
        """Result-level NotExists counter (one row, ``not_exists BIGINT``):
        count/unique — docs whose group token is missing
        (`aggregator.go:199-201,260-262`); field aggs — docs whose field is
        present but group is missing (`aggregator.go:89-93` groupNotExists),
        or whose field is missing when there is no group_by
        (`aggregator.go:285-346` no-group path)."""
        func = aggq.func.lower()
        group_by = aggq.group_by
        fieldname = aggq.field
        if func in ("count", "unique") and group_by is None:
            group_by, fieldname = fieldname, None
        df, _ = self._filtered(q, from_ms, to_ms, dialect=dialect)
        if func in ("count", "unique"):
            if group_by is None:
                return df.limit(0).agg(F.count(F.lit(1)).alias("not_exists"))
            df = self._field_scalar_or_explode(df, group_by, "__group")
            miss = df.filter(F.col("__group").isNull())
        else:
            if fieldname is None:
                raise ValueError(f"agg func {func!r} requires a field")
            df = self._field_scalar_or_explode(df, fieldname, "__fieldtok")
            if group_by is not None:
                df = self._field_scalar_or_explode(df, group_by, "__group")
                miss = df.filter(
                    F.col("__group").isNull() & F.col("__fieldtok").isNotNull()
                )
            else:
                miss = df.filter(F.col("__fieldtok").isNull())
        return miss.agg(F.count(F.lit(1)).alias("not_exists"))

    def agg_guard(
        self,
        group_by: str,
        q: str = "*",
        limit: int = AGG_MAX_GROUP_TOKENS,
        dialect: Optional[str] = None,
    ) -> None:
        """Pre-flight cardinality guard (reference
        `frac/processor/eval_tree.go:78-85` ErrTooManyUniqValues) —
        approx_count_distinct keeps it one cheap pass. :meth:`aggregate`
        additionally enforces the exact guard on its bucket output."""
        df, _ = self._filtered(q, dialect=dialect)
        spec = self.resolver.resolve(group_by)
        col = spec.scalar() if spec.scalar is not None else F.explode(spec.tokens())
        n = df.select(col.alias("g")).agg(F.approx_count_distinct("g").alias("n")).head()[0]
        if n > limit:
            raise TooManyUniqValuesError(
                f"group_by {group_by!r} has ~{n} unique tokens > {limit}"
            )

    # ---------------------------------------------------------- ComplexSearch

    def complex_search(
        self,
        q: str = "*",
        from_ms: Optional[int] = None,
        to_ms: Optional[int] = None,
        size: Optional[int] = 0,
        offset: int = 0,
        order: str = "desc",
        with_total: bool = False,
        hist_interval_ms: Optional[int] = None,
        aggs: Sequence[AggQuery] = (),
        cache: bool = True,
        strict: bool = False,
        dialect: Optional[str] = None,
    ) -> "ComplexSearchResult":
        """One request → docs + total + histogram + N aggregations from a
        SINGLE filtered scan (reference `proxyapi/grpc_complex_search.go:
        14-60`; the store evaluates all of them in one pass over the eval
        tree, `frac/processor/search.go:71-85,196-204`).

        The filtered frame is cached once and every branch reuses it — the
        Spark translation of "iterate LIDs once, feed total, histogram and
        every aggregator". At 100 TB this turns k+3 scans into one scan +
        k+3 cheap cached passes. Call :meth:`ComplexSearchResult.unpersist`
        when done.

        Validation mirrors `grpc_complex_search.go:20-22`: at least one of
        docs (size>0), with_total, histogram or aggs must be requested.
        """
        if not (size or with_total or hist_interval_ms or aggs):
            raise ValueError(
                "complex search requires size > 0, with_total, a histogram "
                "interval or at least one aggregation"
            )
        base, pipes = self._filtered(q, from_ms, to_ms, dialect=dialect)
        if cache:
            base = base.persist()
        # everything between persist() and the ComplexSearchResult handoff
        # runs under one try: a malformed agg (validate_agg raising inside
        # _aggregate_on) must release the cached scan AND any earlier
        # aggs' guard-persisted frames — before this, each bad request
        # pinned one cached frame in executor storage until restart
        agg_bases: List[DataFrame] = []
        try:
            docs = None
            if size:
                docs = self.apply_pipes(
                    self._public(self._paginate(base, size, offset, order)),
                    pipes,
                )
            total = (
                base.agg(F.count(F.lit(1)).alias("total"))
                if with_total
                else None
            )
            hist = None
            if hist_interval_ms:
                ts_ms = F.unix_millis(F.col(self.ts_col))
                bucket = (ts_ms - ts_ms % F.lit(hist_interval_ms)).alias(
                    "bucket_ms"
                )
                hist = base.groupBy(bucket).agg(F.count(F.lit(1)).alias("cnt"))
            agg_results = [
                self._aggregate_on(
                    base, aq, strict=strict, persisted_sink=agg_bases
                )
                for aq in aggs
            ]
        except BaseException:
            if cache:
                base.unpersist()
            for frame in agg_bases:
                frame.unpersist()
            raise
        return ComplexSearchResult(
            docs=docs,
            total=total,
            histogram=hist,
            aggs=agg_results,
            _base=base,
            _agg_bases=agg_bases,
        )


@dataclass
class ComplexSearchResult:
    """Branches of one ComplexSearch request, all from one cached scan."""

    docs: Optional[DataFrame]
    total: Optional[DataFrame]
    histogram: Optional[DataFrame]
    aggs: List[DataFrame]
    _base: DataFrame
    _agg_bases: List[DataFrame] = dc_field(default_factory=list)

    def unpersist(self) -> None:
        """Release the cached scan AND every guard-persisted bucket frame
        (each group-by agg persists its bucket set for the cardinality
        guard; without this a server ComplexSearch with aggs would leak one
        cached frame per request until session restart)."""
        self._base.unpersist()
        for frame in self._agg_bases:
            frame.unpersist()
