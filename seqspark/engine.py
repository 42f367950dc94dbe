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
- top-k compiles to TakeOrderedAndProject (limit pushdown), offset is
  resolved with a row_number window over the already-limited ≤offset+size
  rows — never a full-table single-partition window;
- aggregations are plain groupBy → partial+final HashAggregate, the QPR
  merge tree of `seq/qpr.go:417-462` done by Spark.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .compile import CompileError, FieldSpec, Resolver, compile_node
from .mapping import Mapping
from .seqql.ast import PipeFields, Query
from .seqql.parser import parse
from .tokenize import tokens_for_type

#: reference `conf/conf.go:24` MaxRequestedDocuments
MAX_SEARCH_DOCS = 100_000

#: guardrails, reference `docs/en/02-flags.md`
AGG_MAX_GROUP_TOKENS = 2_000


class TooManyUniqValuesError(RuntimeError):
    """Reference `consts` ErrTooManyUniqValues (`frac/processor/eval_tree.go:78-85`)."""


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
        #: dedup keys applied on every search — set for doc stores whose
        #: mapping has `nested` fields (child rows share the parent ID,
        #: `proxy/bulk/indexer.go:162-167`; duplicates collapse at read like
        #: `seq/qpr.go:465-487`)
        self.default_dedup: Optional[Sequence[str]] = None

    @staticmethod
    def _public(df: DataFrame) -> DataFrame:
        internal = [c for c in df.columns if c.startswith("__tok_")]
        return df.drop(*internal) if internal else df

    # ------------------------------------------------------------------ build

    @classmethod
    def from_typed(
        cls,
        df: DataFrame,
        mapping_types: Dict[str, str],
        ts_col: str = "ts",
        rid_col: Optional[str] = None,
        case_sensitive: bool = False,
        assume_folded: bool = False,
    ) -> "SearchTable":
        """``assume_folded=True`` declares that keyword column values are
        already lower-case on disk (the reference guarantees this by folding
        at index time, `tokenizer/tokenizer.go:15-48`); equality then
        compiles to a bare ``col = 'v'`` that pushes down into the Parquet
        scan — at 100 TB that is the difference between pruning row groups
        and evaluating ``lower()`` on every row.

        Tokenized (text/path) fields are materialized once as hidden
        ``__tok_*`` columns so a multi-token query tokenizes each row once,
        not once per query token."""
        mapping = Mapping({f: t for f, t in mapping_types.items()})
        specs: Dict[str, FieldSpec] = {}
        for fname, itype in mapping_types.items():
            col = F.col(fname).cast("string")
            if itype == "keyword":
                folded = col if (case_sensitive or assume_folded) else F.lower(col)
                specs[fname] = FieldSpec(
                    tokens=(lambda fc=folded: F.array(fc)),
                    scalar=(lambda fc=folded: fc),
                    exists=(lambda c=col: c.isNotNull()),
                )
            else:
                tokcol = f"__tok_{fname}"
                df = df.withColumn(
                    tokcol, tokens_for_type(itype, col, case_sensitive)
                )
                specs[fname] = FieldSpec(
                    tokens=(lambda tc=tokcol: F.col(tc)),
                    exists=(lambda c=col: c.isNotNull()),
                )
        return cls(df, mapping, Resolver(specs), ts_col, rid_col, case_sensitive)

    @classmethod
    def from_docs(
        cls,
        df: DataFrame,
        mapping: Mapping,
        ts_col: str = "ts",
        rid_col: str = "rid",
        case_sensitive: bool = False,
    ) -> "SearchTable":
        """Docs frame from :func:`seqspark.ingest.ingest_docs`:
        ``id``, ``ts``, ``rid``, ``raw``, ``tokens MAP<STRING,ARRAY<STRING>>``."""
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
        return table

    # ----------------------------------------------------------------- basics

    def parse(self, q: str) -> Query:
        return parse(q, self.mapping, self.case_sensitive)

    def predicate(self, q: str) -> Column:
        return compile_node(self.parse(q).root, self.resolver)

    def _time_filter(
        self, from_ms: Optional[int], to_ms: Optional[int]
    ) -> Optional[Column]:
        """Request-level [from, to] window on doc time, millisecond
        granularity inclusive on both ends (reference
        `proxyapi/grpc_v1.go:189-234`, MID is a unix-ms value)."""
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
    ) -> tuple[DataFrame, List[PipeFields]]:
        query = self.parse(q)
        pred = compile_node(query.root, self.resolver)
        df = self.df
        tf = self._time_filter(from_ms, to_ms)
        if tf is not None:
            df = df.filter(tf)
        df = df.filter(pred)
        return df, query.pipes

    def _sort_cols(self, order: str) -> List[Column]:
        cols = [F.col(self.ts_col)]
        if self.rid_col:
            cols.append(F.col(self.rid_col))
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
        df, pipes = self._filtered(q, from_ms, to_ms)
        dedup = dedup_cols if dedup_cols is not None else self.default_dedup
        if dedup:
            # replica/nested-sub-doc dedup semantics (`seq/qpr.go:465-487`)
            df = df.dropDuplicates(list(dedup))
        sort = self._sort_cols(order)
        if size is not None:
            df = df.orderBy(*sort).limit(offset + size)
            if offset > 0:
                w = Window.orderBy(*sort)
                df = (
                    df.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") > offset)
                    .drop("__rn")
                )
        else:
            df = df.orderBy(*sort)
            if offset > 0:
                w = Window.orderBy(*sort)
                df = (
                    df.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") > offset)
                    .drop("__rn")
                )
        df = self.apply_pipes(self._public(df), pipes)
        return df

    def apply_pipes(self, df: DataFrame, pipes: List[PipeFields]) -> DataFrame:
        """`fields a,b` / `fields except a,b` projection
        (reference `storeapi/grpc_fetch.go:170-216`)."""
        for p in pipes:
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
    ) -> DataFrame:
        """`with_total` — match count independent of size
        (reference `frac/processor/search.go:95-116`)."""
        df, _ = self._filtered(q, from_ms, to_ms)
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

    # -------------------------------------------------------------- histogram

    def histogram(
        self,
        q: str = "*",
        interval_ms: int = 60_000,
        from_ms: Optional[int] = None,
        to_ms: Optional[int] = None,
    ) -> DataFrame:
        """Date histogram: doc count per time bucket, bucket = MID - MID %
        interval (reference `frac/processor/search.go:169-179`,
        `seq/qpr.go:113-136`). Output: (bucket_ms BIGINT, cnt BIGINT)."""
        df, _ = self._filtered(q, from_ms, to_ms)
        ts_ms = F.unix_millis(F.col(self.ts_col))
        bucket = (ts_ms - ts_ms % F.lit(interval_ms)).alias("bucket_ms")
        return df.groupBy(bucket).agg(F.count(F.lit(1)).alias("cnt"))

    # ------------------------------------------------------------ aggregation

    def _field_tokens(self, fieldname: str) -> Column:
        return self.resolver.resolve(fieldname).tokens()

    def _field_scalar_or_explode(self, df: DataFrame, fieldname: str, out: str) -> DataFrame:
        """Attach one row per (doc, token-of-field); docs without the field
        keep a single row with NULL (NotExists accounting,
        `frac/processor/aggregator.go:77-117`)."""
        spec = self.resolver.resolve(fieldname)
        if spec.scalar is not None:
            return df.withColumn(out, spec.scalar())
        return df.withColumn(out, F.explode_outer(spec.tokens()))

    def aggregate(
        self,
        aggq: AggQuery,
        q: str = "*",
        from_ms: Optional[int] = None,
        to_ms: Optional[int] = None,
        max_group_tokens: int = AGG_MAX_GROUP_TOKENS,
    ) -> DataFrame:
        """One aggregation over the filtered set (reference
        `frac/processor/aggregator.go:34-346`, finalize `seq/qpr.go:199-314`).

        Output schema (stable): ``name STRING`` (group token; NULL when no
        group_by or for the not-exists bucket), ``mid_ms BIGINT`` (time bin
        start; NULL without interval), ``value DOUBLE``, plus ``q0..qN``
        DOUBLE for quantile requests.
        """
        func = aggq.func.lower()
        group_by = aggq.group_by
        fieldname = aggq.field
        if func in ("count", "unique") and group_by is None:
            group_by, fieldname = fieldname, None  # legacy alias
        df, _ = self._filtered(q, from_ms, to_ms)

        group_cols: List[Column] = []
        if aggq.interval_ms:
            ts_ms = F.unix_millis(F.col(self.ts_col))
            df = df.withColumn("__mid", ts_ms - ts_ms % F.lit(aggq.interval_ms))
            group_cols.append(F.col("__mid"))
        else:
            df = df.withColumn("__mid", F.lit(None).cast("long"))

        if group_by is not None:
            df = self._field_scalar_or_explode(df, group_by, "__group")
        else:
            df = df.withColumn("__group", F.lit(None).cast("string"))

        if func == "count":
            out = (
                df.filter(F.col("__group").isNotNull() | F.lit(group_by is None))
                .groupBy("__mid", "__group")
                .agg(F.count(F.lit(1)).cast("double").alias("value"))
            )
        elif func == "unique":
            out = (
                df.filter(F.col("__group").isNotNull())
                .select("__mid", "__group")
                .distinct()
                .withColumn("value", F.lit(0.0))
            )
        else:
            if fieldname is None:
                raise ValueError(f"agg func {func!r} requires a field")
            df = self._field_scalar_or_explode(df, fieldname, "__fieldtok")
            val = F.col("__fieldtok").try_cast("double")
            df = df.withColumn("__val", val)
            has_field = F.col("__fieldtok").isNotNull()
            base = df.filter(has_field)
            agg_expr = {
                "sum": F.sum("__val"),
                "min": F.min("__val"),
                "max": F.max("__val"),
                "avg": F.avg("__val"),
            }
            if func in agg_expr:
                out = base.groupBy("__mid", "__group").agg(
                    agg_expr[func].alias("value")
                )
            elif func == "quantile":
                qs = list(aggq.quantiles)
                if not qs:
                    raise ValueError("quantile agg requires quantiles")
                pct = F.percentile if aggq.exact_quantiles else F.percentile_approx
                aggs = [
                    pct("__val", float(qv)).alias(f"q{i}")
                    for i, qv in enumerate(qs)
                ]
                out = base.groupBy("__mid", "__group").agg(*aggs)
                out = out.withColumn("value", F.col("q0"))
            else:
                raise ValueError(f"unknown agg func {func!r}")

        out = out.withColumnRenamed("__mid", "mid_ms").withColumnRenamed(
            "__group", "name"
        )
        return out

    def agg_guard(self, group_by: str, q: str = "*", limit: int = AGG_MAX_GROUP_TOKENS) -> None:
        """Pre-flight cardinality guard (reference
        `frac/processor/eval_tree.go:78-85` ErrTooManyUniqValues) —
        approx_count_distinct keeps it one cheap pass."""
        df, _ = self._filtered(q)
        spec = self.resolver.resolve(group_by)
        col = spec.scalar() if spec.scalar is not None else F.explode(spec.tokens())
        n = df.select(col.alias("g")).agg(F.approx_count_distinct("g").alias("n")).head()[0]
        if n > limit:
            raise TooManyUniqValuesError(
                f"group_by {group_by!r} has ~{n} unique tokens > {limit}"
            )
