"""seqproxyapi.v1 message descriptors for :mod:`seqspark.wire.pb`.

A 1:1 transcription of the reference's public proto surface
(`api/seqproxyapi/v1/seq_proxy_api.proto`) into descriptor dicts —
field numbers, names, types and labels match the proto file, so wire
bytes interoperate with any stock seq-db gRPC client or server.

Enums are plain ints on the Python side; the name maps below give the
symbolic values (`AggFunc`, `Order`, `ErrorCode`).
"""

from __future__ import annotations

from .pb import Field

# --------------------------------------------- google.protobuf well-knowns

TIMESTAMP = {
    1: Field("seconds", "int64"),
    2: Field("nanos", "int32"),
}

DURATION = {
    1: Field("seconds", "int64"),
    2: Field("nanos", "int32"),
}


def ts_to_ms(ts: dict | None) -> int | None:
    """google.protobuf.Timestamp -> epoch millis (None if unset)."""
    if not ts:
        return None
    return int(ts.get("seconds", 0)) * 1000 + int(ts.get("nanos", 0)) // 1_000_000


def ms_to_ts(ms: int | None) -> dict | None:
    if ms is None:
        return None
    return {"seconds": ms // 1000, "nanos": (ms % 1000) * 1_000_000}


def duration_to_sec(d: dict | None) -> float | None:
    if not d:
        return None
    return d.get("seconds", 0) + d.get("nanos", 0) / 1e9


# ------------------------------------------------------------------- enums

ERROR_CODE_UNSPECIFIED = 0
ERROR_CODE_NO = 1
ERROR_CODE_PARTIAL_RESPONSE = 2
ERROR_CODE_TOO_MANY_FRACTIONS_HIT = 3

AGG_FUNC = {0: "count", 1: "sum", 2: "min", 3: "max", 4: "avg",
            5: "quantile", 6: "unique"}
ORDER = {0: "desc", 1: "asc"}

# ---------------------------------------------------------------- messages

ERROR = {
    1: Field("code", "enum"),
    2: Field("message", "string"),
}

DOCUMENT = {
    1: Field("id", "string"),
    2: Field("data", "bytes"),
    3: Field("time", "message", TIMESTAMP),
}

AGGREGATION_BUCKET = {
    2: Field("key", "string"),
    3: Field("value", "double"),
    4: Field("not_exists", "int64"),
    5: Field("quantiles", "double", repeated=True),
    6: Field("ts", "message", TIMESTAMP, optional=True),
}

AGGREGATION = {
    1: Field("buckets", "message", AGGREGATION_BUCKET, repeated=True),
    2: Field("not_exists", "int64"),
}

HISTOGRAM_BUCKET = {
    1: Field("doc_count", "uint64"),
    2: Field("ts", "message", TIMESTAMP),
}

HISTOGRAM = {
    1: Field("buckets", "message", HISTOGRAM_BUCKET, repeated=True),
}

SEARCH_QUERY = {
    1: Field("query", "string"),
    2: Field("from", "message", TIMESTAMP),
    3: Field("to", "message", TIMESTAMP),
    4: Field("explain", "bool"),
}

AGG_QUERY = {
    1: Field("field", "string"),
    3: Field("group_by", "string"),
    4: Field("func", "enum"),
    5: Field("quantiles", "double", repeated=True),
    6: Field("interval", "string", optional=True),
}

HIST_QUERY = {
    1: Field("interval", "string"),
}

EXPLAIN_ENTRY: dict = {
    1: Field("message", "string"),
    2: Field("duration", "message", DURATION),
}
EXPLAIN_ENTRY[3] = Field("children", "message", EXPLAIN_ENTRY, repeated=True)

SEARCH_REQUEST = {
    1: Field("query", "message", SEARCH_QUERY),
    2: Field("size", "int64"),
    3: Field("offset", "int64"),
    4: Field("with_total", "bool"),
    5: Field("order", "enum"),
}

COMPLEX_SEARCH_REQUEST = {
    1: Field("query", "message", SEARCH_QUERY),
    2: Field("aggs", "message", AGG_QUERY, repeated=True),
    3: Field("hist", "message", HIST_QUERY, optional=True),
    4: Field("size", "int64"),
    5: Field("offset", "int64"),
    6: Field("with_total", "bool"),
    7: Field("order", "enum"),
}

SEARCH_RESPONSE = {
    1: Field("partial_response", "bool"),
    2: Field("total", "int64"),
    3: Field("docs", "message", DOCUMENT, repeated=True),
    4: Field("error", "message", ERROR),
}

COMPLEX_SEARCH_RESPONSE = {
    1: Field("partial_response", "bool"),
    2: Field("total", "int64"),
    3: Field("docs", "message", DOCUMENT, repeated=True),
    4: Field("aggs", "message", AGGREGATION, repeated=True),
    5: Field("hist", "message", HISTOGRAM, optional=True),
    6: Field("error", "message", ERROR),
    7: Field("explain", "message", EXPLAIN_ENTRY, optional=True),
}

START_ASYNC_SEARCH_REQUEST = {
    1: Field("retention", "message", DURATION),
    2: Field("query", "message", SEARCH_QUERY),
    3: Field("aggs", "message", AGG_QUERY, repeated=True),
    4: Field("hist", "message", HIST_QUERY, optional=True),
    5: Field("order", "enum"),
}

START_ASYNC_SEARCH_RESPONSE = {
    1: Field("search_id", "string"),
}

FETCH_ASYNC_SEARCH_RESULT_REQUEST = {
    1: Field("search_id", "string"),
    2: Field("with_docs", "bool"),
    3: Field("size", "int32"),
    4: Field("offset", "int32"),
}

FETCH_ASYNC_SEARCH_RESULT_RESPONSE = {
    1: Field("done", "bool"),
    2: Field("expiration", "message", TIMESTAMP),
    3: Field("response", "message", COMPLEX_SEARCH_RESPONSE),
}

CANCEL_ASYNC_SEARCH_REQUEST = {
    1: Field("search_id", "string"),
}

CANCEL_ASYNC_SEARCH_RESPONSE: dict = {}

GET_AGGREGATION_REQUEST = {
    1: Field("query", "message", SEARCH_QUERY),
    2: Field("aggs", "message", AGG_QUERY, repeated=True),
}

GET_AGGREGATION_RESPONSE = {
    1: Field("partial_response", "bool"),
    2: Field("total", "int64"),
    3: Field("aggs", "message", AGGREGATION, repeated=True),
    4: Field("error", "message", ERROR),
}

GET_HISTOGRAM_REQUEST = {
    1: Field("query", "message", SEARCH_QUERY),
    2: Field("hist", "message", HIST_QUERY),
}

GET_HISTOGRAM_RESPONSE = {
    1: Field("partial_response", "bool"),
    2: Field("total", "int64"),
    3: Field("hist", "message", HISTOGRAM),
    4: Field("error", "message", ERROR),
}

FIELDS_FILTER = {
    1: Field("fields", "string", repeated=True),
    2: Field("allow_list", "bool"),
}

FETCH_REQUEST = {
    1: Field("ids", "string", repeated=True),
    2: Field("fields_filter", "message", FIELDS_FILTER),
}

MAPPING_REQUEST: dict = {}

MAPPING_RESPONSE = {
    1: Field("data", "bytes"),
}

STATUS_REQUEST: dict = {}

STORE_STATUS_VALUES = {
    1: Field("oldest_time", "message", TIMESTAMP),
}

STORE_STATUS = {
    1: Field("host", "string"),
    2: Field("values", "message", STORE_STATUS_VALUES, optional=True),
    3: Field("error", "string", optional=True),
}

STATUS_RESPONSE = {
    1: Field("number_of_stores", "int32"),
    2: Field("oldest_storage_time", "message", TIMESTAMP, optional=True),
    4: Field("stores", "message", STORE_STATUS, repeated=True),
}

EXPORT_REQUEST = {
    1: Field("query", "message", SEARCH_QUERY),
    2: Field("size", "int64"),
    3: Field("offset", "int64"),
}

EXPORT_RESPONSE = {
    1: Field("doc", "message", DOCUMENT),
}
