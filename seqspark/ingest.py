"""Ingest transform: raw JSON documents → searchable document frame.

Spark-first equivalent of the reference bulk pipeline
(`proxy/bulk/processor.go:64-126`, `proxy/bulk/indexer.go:215-350`):

- event time extracted from the first parseable of ``timestamp``/``time``/
  ``ts`` in ES (``yyyy-MM-dd HH:mm:ss.SSS``), RFC3339Nano, RFC3339 formats
  (`consts/consts.go:74-75`), falling back to ingest time;
- timestamps outside the allowed drift window (past > 24h, future > 5m by
  default) are clamped to ingest time (`proxy/bulk/processor.go:88-99`);
- document ID = (mid, rid): mid is the unix-ms timestamp, rid a 64-bit
  discriminator (`seq/seq.go:115-119` uses randomness) — here a
  deterministic ``xxhash64(raw, mid)`` so at-least-once replays re-produce
  the same ID and collapse at read;
- every mapped field is tokenized per its index type into a
  ``tokens MAP<STRING, ARRAY<STRING>>`` column; ``_exists_`` presence is
  derivable from map keys; doc size tracked as ``length(raw)``
  (`proxy/bulk/indexer.go:336-337`).

All of it is built-in column expressions — the transform runs vectorized on
executors and scales linearly with input splits.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .mapping import Mapping
from .tokenize import tokens_for_type

#: reference defaults: --allowed-time-drift=24h, --future-allowed-time-drift=5m
ALLOWED_DRIFT_MS = 24 * 3600 * 1000
FUTURE_DRIFT_MS = 5 * 60 * 1000

#: reference `consts/consts.go:74-75`
TIME_FIELDS = ("timestamp", "time", "ts")
_TIME_FORMATS = (
    "yyyy-MM-dd HH:mm:ss.SSS",  # ES format "2006-01-02 15:04:05.999"
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSSXXX",  # RFC3339Nano
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "yyyy-MM-dd'T'HH:mm:ssXXX",  # RFC3339
)


def parse_event_time(raw: Column) -> Column:
    """First parseable time field/format, else NULL
    (`proxy/bulk/processor.go:101-126` extractDocTime)."""
    candidates: List[Column] = []
    for f in TIME_FIELDS:
        v = F.get_json_object(raw, f"$.{f}")
        for fmt in _TIME_FORMATS:
            candidates.append(F.try_to_timestamp(v, F.lit(fmt)))
    return F.coalesce(*candidates)


def clamp_drift(
    event_ts: Column,
    ingest_ts: Column,
    allowed_drift_ms: int = ALLOWED_DRIFT_MS,
    future_drift_ms: int = FUTURE_DRIFT_MS,
) -> Column:
    """Clamp to ingest time when delayed or from the future
    (`proxy/bulk/processor.go:88-99` documentDelayed)."""
    delay_ms = F.unix_millis(ingest_ts) - F.unix_millis(event_ts)
    delayed = (delay_ms > F.lit(allowed_drift_ms)) | (-delay_ms > F.lit(future_drift_ms))
    return F.when(event_ts.isNull() | delayed, ingest_ts).otherwise(event_ts)


def make_ingest_transform(
    mapping: Mapping,
    raw_col: str = "raw",
    ingest_ts: Optional[Column] = None,
    case_sensitive: bool = False,
    allowed_drift_ms: int = ALLOWED_DRIFT_MS,
    future_drift_ms: int = FUTURE_DRIFT_MS,
):
    """Prebuild the ingest projection once and return a ``df -> df``
    transform that reuses it.

    Every Column here is an UNRESOLVED expression over ``raw_col`` —
    frame-independent, so one build serves every batch. Building the
    tree per call costs ~0.3 s of driver-side py4j for a typical mapping
    (hundreds of Column constructions); on the hot bulk/streaming ingest
    path that tax dominated per-batch latency, so callers with repeated
    batches (``SeqSparkServer.bulk``, ``stream_ingest``) hold one
    transform and apply it per batch.
    """
    raw = F.col(raw_col)
    if ingest_ts is None:
        ingest_ts = F.current_timestamp()
    event_ts = parse_event_time(raw)
    ts = clamp_drift(event_ts, ingest_ts, allowed_drift_ms, future_drift_ms)

    def entry_tokens(name: str, itype: str, value: Column, size: int = 0) -> Column:
        from .tokenize import DEFAULT_MAX_TOKEN_SIZE

        return tokens_for_type(
            itype, value, case_sensitive, size or DEFAULT_MAX_TOKEN_SIZE
        )

    def tokens_map_from(entries: Dict[str, Column]) -> Column:
        keys: List[Column] = [
            F.when(
                toks.isNotNull(),
                F.struct(F.lit(name).alias("key"), toks.alias("value")),
            )
            for name, toks in entries.items()
        ]
        if not keys:
            return F.lit(None).cast("map<string,array<string>>")
        return F.map_from_entries(F.filter(F.array(*keys), lambda e: e.isNotNull()))

    # --- parent document tokens -------------------------------------------
    # object children are plain dotted JSON paths (`proxy/bulk/indexer.go:
    # 87-90`); tags children extract from [{key,value}] arrays (`:136-144`);
    # nested children are NOT indexed on the parent — they become child rows
    # (`:98-103`).
    entries: Dict[str, Column] = {}
    nested_roots: List[str] = []
    for fm in mapping.fields():
        if fm.main_type in ("object", "tags"):
            continue  # containers emit nothing themselves
        if fm.main_type == "nested":
            nested_roots.append(fm.name)
            continue
        container = mapping.container_of(fm.name)
        if container is not None and container[1] == "nested":
            continue  # handled in the child-row pass
        if container is not None and container[1] == "tags":
            cname, _ = container
            tag_key = fm.name[len(cname) + 1 :]
            arr = F.from_json(
                F.get_json_object(raw, f"$.{cname}"),
                "array<struct<key:string,value:string>>",
            )
            matches = F.filter(arr, lambda e: e.getField("key") == F.lit(tag_key))
            value_toks = F.flatten(
                F.transform(
                    matches,
                    lambda e: F.coalesce(
                        entry_tokens(fm.name, fm.main_type, e.getField("value")),
                        F.array().cast("array<string>"),
                    ),
                )
            )
            entries[fm.name] = F.when(F.size(matches) > 0, value_toks)
            continue
        value = F.get_json_object(raw, f"$.{fm.name}")
        entries[fm.name] = entry_tokens(fm.name, fm.main_type, value, fm.size)
        for title, (sub_type, sub_size) in fm.sub_types.items():
            entries[f"{fm.name}.{title}"] = entry_tokens(
                f"{fm.name}.{title}", sub_type, value, sub_size
            )

    # old/future-doc rewrite preservation (`docs/en/07-long-term-store.md`
    # §"Avoid old docs in hot store"): when the drift clamp rewrote the
    # event time, the original timestamp is kept in an indexed
    # `original_timestamp` field (overwriting any mapped field of that
    # name, like the reference), so clamped docs stay findable
    # (`_exists_:original_timestamp`) and their true time is queryable.
    clamped = event_ts.isNotNull() & (F.unix_millis(ts) != F.unix_millis(event_ts))
    clamp_tokens = entry_tokens(
        "original_timestamp",
        "keyword",
        F.date_format(event_ts, "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"),
    )
    # The overwrite applies only to CLAMPED docs; a user-mapped
    # `original_timestamp` field on a non-clamped doc keeps its own tokens
    # (the reference rewrites the field only when it rewrites the time).
    prev_original = entries.get("original_timestamp")
    if prev_original is not None:
        entries["original_timestamp"] = F.when(clamped, clamp_tokens).otherwise(
            prev_original
        )
    else:
        entries["original_timestamp"] = F.when(clamped, clamp_tokens)

    # rid derives ONLY from stable inputs (doc bytes + mid) — never from
    # monotonically_increasing_id, whose value depends on partition layout:
    # an at-least-once foreachBatch retry must re-produce the SAME (mid, rid)
    # so replica dedup (`seq/qpr.go:465-487`) can collapse the replay, and
    # nested child rows (derived below from the same expression) must keep
    # rids equal to their parent's. Two byte-identical docs with the same
    # clamped timestamp intentionally collapse to one ID — content identity,
    # the dedup-at-read semantics the reference applies to replica copies.
    tokens_col = tokens_map_from(entries)
    if getattr(mapping, "is_auto", False):
        # --mapping=auto (`cmd/seq-db/seq-db.go:297`, nil-mapping branch
        # of `proxy/bulk/indexer.go:67-76`): EVERY top-level JSON field is
        # keyword-indexed under its own name. The field set varies per
        # document, so the tokens map is built dynamically from the raw
        # object. from_json to map<string,string> mirrors the reference's
        # encodeInsaneNode (`indexer.go:169-177`): strings and integers
        # keep their literal text (`level:"4130134"`), bools become
        # "true"/"false", objects/arrays their compact JSON text, and an
        # explicit JSON null indexes as the token "null" (Encode of a
        # null node). Sole divergence: non-canonical FLOAT literals are
        # canonicalized by the JSON parser (1e10 → "1.0E10") where the
        # reference keeps the raw bytes.
        dyn = F.from_json(raw, "map<string,string>")
        dyn_tokens = F.map_filter(
            F.map_from_arrays(
                F.map_keys(dyn),
                F.transform(
                    F.map_values(dyn),
                    lambda v: entry_tokens(
                        "", "keyword", F.coalesce(v, F.lit("null"))
                    ),
                ),
            ),
            lambda _k, v: v.isNotNull(),
        )
        # the drift-clamp rewrite overwrites any same-named field only on
        # CLAMPED docs, like the static-mapping path
        tokens_col = F.when(
            clamped,
            F.map_concat(
                F.map_filter(
                    dyn_tokens,
                    lambda k, _v: k != F.lit("original_timestamp"),
                ),
                F.create_map(F.lit("original_timestamp"), clamp_tokens),
            ),
        ).otherwise(dyn_tokens)
    cols = ["mid", "rid", "ts", raw_col, "size", "tokens"]

    # --- nested child rows: prebuilt per-root expressions ------------------
    # one sub-document per array element sharing the parent's ID and
    # inheriting the parent's tokens, so AND across parent fields and
    # sibling element fields matches within ONE element
    # (`proxy/bulk/indexer.go:32-46,98-103,162-167`); search over a docs
    # table dedups by (mid, rid) to collapse the copies.
    child_specs: List[tuple] = []
    for root in nested_roots:
        children = [
            fm
            for fm in mapping.children_of(root)
            if mapping.container_of(fm.name) == (root, "nested")
            and fm.main_type not in ("object", "tags", "nested")
        ]
        if not children:
            continue
        elems = F.from_json(
            F.get_json_object(F.col(raw_col), f"$.{root}"), "array<variant>"
        )
        child_entries: Dict[str, Column] = {}
        for fm in children:
            sub = fm.name[len(root) + 1 :]
            val = F.try_variant_get(F.col("__elem"), f"$.{sub}", "string")
            child_entries[fm.name] = entry_tokens(fm.name, fm.main_type, val)
        child_map = tokens_map_from(child_entries)
        merged = F.map_concat(
            F.coalesce(F.col("tokens"), F.create_map().cast("map<string,array<string>>")),
            F.coalesce(child_map, F.create_map().cast("map<string,array<string>>")),
        )
        child_specs.append((elems, merged))

    def transform(raw_df: DataFrame) -> DataFrame:
        parent = (
            raw_df.withColumn("ts", ts)
            .withColumn("mid", F.unix_millis(F.col("ts")))
            .withColumn("rid", F.xxhash64(raw, F.col("mid")))
            .withColumn("size", F.octet_length(raw))
            .withColumn("tokens", tokens_col)
        )
        extra = [c for c in raw_df.columns if c != raw_col]
        parent = parent.select(*cols, *extra)
        out = parent
        for elems, merged in child_specs:
            child = (
                parent.filter(F.size(elems) > 0)
                .withColumn("__elem", F.explode(elems))
                .withColumn("tokens", merged)
                .withColumn("size", F.lit(0))
                .drop("__elem")
                .select(*cols, *extra)
            )
            out = out.unionByName(child)
        return out

    return transform


def ingest_docs(
    raw_df: DataFrame,
    mapping: Mapping,
    raw_col: str = "raw",
    ingest_ts: Optional[Column] = None,
    case_sensitive: bool = False,
    allowed_drift_ms: int = ALLOWED_DRIFT_MS,
    future_drift_ms: int = FUTURE_DRIFT_MS,
) -> DataFrame:
    """Transform a frame with a raw-JSON string column into the document
    store schema:

    ``mid BIGINT`` (unix ms), ``rid BIGINT``, ``ts TIMESTAMP``,
    ``raw STRING``, ``size INT``, ``tokens MAP<STRING, ARRAY<STRING>>``.

    One-shot convenience over :func:`make_ingest_transform` — repeated
    callers (per-bulk, per-micro-batch) should build the transform once.
    """
    return make_ingest_transform(
        mapping,
        raw_col=raw_col,
        ingest_ts=ingest_ts,
        case_sensitive=case_sensitive,
        allowed_drift_ms=allowed_drift_ms,
        future_drift_ms=future_drift_ms,
    )(raw_df)


def project_fields(raw: Column, fields: List[str], except_: bool = False) -> Column:
    """JSON field projection/removal on the raw document — the `fields` pipe
    applied at fetch (`storeapi/grpc_fetch.go:175-216`).

    Keeps only (or drops) the listed top-level fields of the JSON text.
    Uses from_json-free manipulation: builds a JSON object from the selected
    paths. For `except`, removes paths with `json_tuple`-style rebuild.
    """
    if not except_:
        pairs: List[Column] = []
        for fld in fields:
            v = F.try_variant_get(F.try_parse_json(raw), f"$.{fld}", "variant")
            pairs.append(
                F.when(
                    v.isNotNull(),
                    F.concat(F.lit(f'"{fld}":'), F.to_json(v)),
                )
            )
        inner = F.array_join(F.filter(F.array(*pairs), lambda p: p.isNotNull()), ",")
        return F.concat(F.lit("{"), inner, F.lit("}"))
    # except: rebuild the object without the listed fields; the variant map
    # schema preserves number/bool/object value types through to_json.
    m = F.from_json(raw, "map<string,variant>")
    kept = F.map_filter(m, lambda k, _v: ~k.isin(*fields))
    return F.to_json(kept)
