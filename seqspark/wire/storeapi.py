"""api.StoreApi message descriptors for :mod:`seqspark.wire.pb`.

A 1:1 transcription of the reference's INTERNAL store wire surface
(`api/storeapi/store_api.proto`) — the proxy→store protocol that
carries bulks, searches and async jobs between tiers. Field numbers,
names, types and labels match the proto file; proto3 ``map<k, v>``
fields are modeled as repeated ``{1: key, 2: value}`` entry messages
(the identical wire encoding).

Payload semantics adaptation (documented, not wire-visible): the
reference packs ``BulkRequest.docs``/``metas`` with its proprietary
binary doc+meta format produced by the proxy's ingestor
(`proxy/bulk/*`); this engine's at-rest unit is the JSON document, so
the same fields carry newline-delimited JSON docs and metas here.
"""

from __future__ import annotations

from .pb import Field
from .seqproxy import DURATION, TIMESTAMP  # same well-knowns

SERVICE = "/api.StoreApi"

#: api.AggFunc — note the STORE numbering differs from seqproxyapi's
#: (count=0 here, no UNSPECIFIED slot)
AGG_FUNC = {0: "count", 1: "sum", 2: "min", 3: "max", 4: "avg",
            5: "quantile", 6: "unique"}
ORDER = {0: "desc", 1: "asc"}

NO_ERROR = 0
INGESTOR_QUERY_WANTS_OLD_DATA = 1
TOO_MANY_UNIQ_VALUES = 2
TOO_MANY_FRACTIONS_HIT = 3

EMPTY: dict = {}

BULK_REQUEST = {
    1: Field("count", "int64"),
    2: Field("docs", "bytes"),
    3: Field("metas", "bytes"),
}

BINARY_DATA = {
    1: Field("data", "bytes"),
}

AGG_QUERY = {
    1: Field("field", "string"),
    3: Field("group_by", "string"),
    4: Field("func", "enum"),
    5: Field("quantiles", "double", repeated=True),
    6: Field("interval", "int64"),
}

SEARCH_REQUEST = {
    1: Field("query", "string"),
    2: Field("from", "int64"),
    3: Field("to", "int64"),
    4: Field("size", "int64"),
    5: Field("offset", "int64"),
    6: Field("interval", "int64"),
    7: Field("aggregation", "string"),  # deprecated in the proto
    8: Field("explain", "bool"),
    10: Field("with_total", "bool"),
    11: Field("aggregation_filter", "string"),  # deprecated
    12: Field("aggs", "message", AGG_QUERY, repeated=True),
    13: Field("order", "enum"),
}

ID = {
    1: Field("mid", "uint64"),
    2: Field("rid", "uint64"),
}

ID_WITH_HINT = {
    1: Field("id", "message", ID),
    3: Field("hint", "string"),
}

HISTOGRAM = {
    1: Field("min", "double"),
    2: Field("max", "double"),
    3: Field("sum", "double"),
    4: Field("total", "int64"),
    5: Field("not_exists", "int64"),
    6: Field("samples", "double", repeated=True),
}

BIN = {
    1: Field("label", "string"),
    2: Field("ts", "message", TIMESTAMP),
    3: Field("hist", "message", HISTOGRAM),
}

#: map<string, Histogram> entry (proto3 map wire encoding)
AGG_HISTOGRAM_ENTRY = {
    1: Field("key", "string"),
    2: Field("value", "message", HISTOGRAM),
}

AGG = {
    2: Field("agg_histogram", "message", AGG_HISTOGRAM_ENTRY, repeated=True),
    3: Field("not_exists", "int64"),
    4: Field("timeseries", "message", BIN, repeated=True),
}

#: map<uint64, uint64> entry (the deprecated per-bucket histogram)
HISTOGRAM_MAP_ENTRY = {
    1: Field("key", "uint64"),
    2: Field("value", "uint64"),
}

EXPLAIN_ENTRY: dict = {
    1: Field("message", "string"),
    2: Field("duration", "message", DURATION),
}
EXPLAIN_ENTRY[3] = Field("children", "message", EXPLAIN_ENTRY, repeated=True)

SEARCH_RESPONSE = {
    2: Field("id_sources", "message", ID_WITH_HINT, repeated=True),
    3: Field("histogram", "message", HISTOGRAM_MAP_ENTRY, repeated=True),
    4: Field("aggs", "message", AGG, repeated=True),
    5: Field("total", "uint64"),
    6: Field("errors", "string", repeated=True),
    7: Field("code", "enum"),
    8: Field("explain", "message", EXPLAIN_ENTRY, optional=True),
}

START_ASYNC_SEARCH_REQUEST = {
    1: Field("search_id", "string"),
    2: Field("query", "string"),
    3: Field("from", "int64"),
    4: Field("to", "int64"),
    5: Field("aggs", "message", AGG_QUERY, repeated=True),
    6: Field("histogram_interval", "int64"),
    7: Field("order", "enum"),
}

START_ASYNC_SEARCH_RESPONSE: dict = {}

FETCH_ASYNC_SEARCH_RESULT_REQUEST = {
    1: Field("search_id", "string"),
    2: Field("with_docs", "bool"),
    3: Field("size", "int32"),
    4: Field("offset", "int32"),
}

FETCH_ASYNC_SEARCH_RESULT_RESPONSE = {
    1: Field("done", "bool"),
    2: Field("response", "message", SEARCH_RESPONSE),
    3: Field("expiration", "message", TIMESTAMP),
    5: Field("aggs", "message", AGG_QUERY, repeated=True),
    6: Field("histogram_interval", "int64"),
    7: Field("order", "enum"),
}

IDS_WITH_HINT = {
    1: Field("id", "string"),
    2: Field("hint", "string"),
}

FIELDS_FILTER = {
    1: Field("fields", "string", repeated=True),
    2: Field("allow_list", "bool"),
}

FETCH_REQUEST = {
    1: Field("ids", "string", repeated=True),
    3: Field("explain", "bool"),
    4: Field("ids_with_hints", "message", IDS_WITH_HINT, repeated=True),
    5: Field("fields_filter", "message", FIELDS_FILTER, optional=True),
}

STATUS_REQUEST: dict = {}

STATUS_RESPONSE = {
    1: Field("oldest_time", "message", TIMESTAMP),
}
