"""Property tests for the grpc-gateway JSON transcoder
(`seqspark/gateway.py`): for randomized proto-dict messages over the real
seqproxyapi.v1 descriptors, rendering to gateway JSON and parsing back is
lossless up to the documented millisecond truncation of Timestamps.

Pure-python (no Spark) — mirrors how grpc-gateway itself guarantees that
the HTTP rendering and the wire message carry the same information
(`api/seqproxyapi/v1/seq_proxy_api.proto` google.api.http annotations).
"""

import json

import pytest
from hypothesis import given, settings, strategies as st

from seqspark import gateway as gw
from seqspark.wire import seqproxy as sp

# descriptors chosen to cover every field type the transcoder handles:
# int64/int32, bool, string, bytes, double, enum (named + bare), nested
# messages, repeated messages, Timestamp, Duration, and the recursive
# ExplainEntry tree
DESCS = [
    sp.SEARCH_REQUEST,
    sp.COMPLEX_SEARCH_REQUEST,
    sp.COMPLEX_SEARCH_RESPONSE,
    sp.START_ASYNC_SEARCH_REQUEST,
    sp.FETCH_ASYNC_SEARCH_RESULT_RESPONSE,
    sp.GET_AGGREGATION_RESPONSE,
    sp.STATUS_RESPONSE,
    sp.FETCH_REQUEST,
]

_TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=24,
)


def _scalar(f):
    t = f.type
    if t in ("int64", "sint64", "sfixed64"):
        return st.integers(-(2**63), 2**63 - 1)
    if t in ("uint64", "fixed64"):
        return st.integers(0, 2**64 - 1)
    if t in ("int32", "sint32"):
        return st.integers(-(2**31), 2**31 - 1)
    if t == "uint32":
        return st.integers(0, 2**32 - 1)
    if t == "bool":
        return st.booleans()
    if t == "string":
        return _TEXT
    if t == "bytes":
        return st.binary(max_size=24)
    if t == "double":
        # NaN renders as the JSON string "NaN" (protobuf JSON spec) and
        # nan != nan breaks dict equality; pinned separately below
        return st.floats(allow_nan=False)
    if t == "enum":
        names = gw._ENUMS.get(f.name)
        # proto-dict shape carries the NUMBER; the transcoder renders
        # the name and must parse it back to the same number
        return st.sampled_from(sorted(names)) if names else st.integers(0, 7)
    raise AssertionError(f.type)


def _message(desc, depth):
    if desc is sp.TIMESTAMP:
        # proto spec: 0001..9999 years, nanos always 0..999999999
        return st.fixed_dictionaries(
            {"seconds": st.integers(0, 2**33),
             "nanos": st.integers(0, 999_999_999)}
        )
    if desc is sp.DURATION:
        # same-sign seconds/nanos per the proto spec
        return st.one_of(
            st.fixed_dictionaries(
                {"seconds": st.integers(0, 2**40),
                 "nanos": st.integers(0, 999_999_999)}),
            st.fixed_dictionaries(
                {"seconds": st.integers(-(2**40), 0),
                 "nanos": st.integers(-999_999_999, 0)}),
        )
    optional = {}
    for f in desc.values():
        if f.type == "message":
            if depth <= 0:
                continue  # cap the ExplainEntry recursion
            v = _message(f.message, depth - 1)
        else:
            v = _scalar(f)
        optional[f.name] = st.lists(v, max_size=3) if f.repeated else v
    return st.fixed_dictionaries({}, optional=optional)


def _norm(desc, msg):
    """What a lossless round trip must return: the original message with
    Timestamps truncated to ms and bytes normalized to `bytes`."""
    out = {}
    for f in desc.values():
        if f.name not in msg or msg[f.name] is None:
            continue
        v = msg[f.name]
        out[f.name] = (
            [_norm_one(f, x) for x in v] if f.repeated else _norm_one(f, v)
        )
    return out


def _norm_one(f, v):
    if f.type == "message":
        if f.message is sp.TIMESTAMP:
            ms = v.get("seconds", 0) * 1000 + v.get("nanos", 0) // 1_000_000
            return {"seconds": ms // 1000, "nanos": (ms % 1000) * 1_000_000}
        if f.message is sp.DURATION:
            return {"seconds": v.get("seconds", 0), "nanos": v.get("nanos", 0)}
        return _norm(f.message, v)
    if f.type == "bytes":
        return bytes(v)
    return v


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_gateway_json_round_trip_is_lossless(data):
    desc = data.draw(st.sampled_from(DESCS))
    msg = data.draw(_message(desc, depth=3))
    rendered = gw.proto_to_json(desc, msg)
    # the rendering must be actual JSON — json.dumps round-trip included
    back = gw.json_to_proto(desc, json.loads(json.dumps(rendered)))
    assert back == _norm(desc, msg)


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_gateway_accepts_snake_case_spelling_too(data):
    # grpc-gateway accepts both lowerCamel and original proto names;
    # re-spell every key snake_case and parse again
    desc = data.draw(st.sampled_from(DESCS))
    msg = data.draw(_message(desc, depth=2))
    rendered = gw.proto_to_json(desc, msg)

    def resnake(d, desc):
        by_camel = {gw._camel(f.name): f for f in desc.values()}
        out = {}
        for k, v in d.items():
            f = by_camel[k]
            if f.type == "message" and f.message not in (
                sp.TIMESTAMP, sp.DURATION
            ):
                v = ([resnake(x, f.message) for x in v] if f.repeated
                     else resnake(v, f.message))
            out[f.name] = v
        return out

    assert gw.json_to_proto(desc, resnake(rendered, desc)) == gw.json_to_proto(
        desc, rendered
    )


def test_timestamp_boundary_millis_exact():
    # the float detour this module deliberately avoids: near-boundary
    # nanos must truncate to the SAME ms on render and parse
    for sec, nanos in [
        (1700000000, 122_999_999), (1700000000, 123_000_000),
        (0, 999_999), (0, 1_000_000), (2**33, 500_000_000),
    ]:
        ts = {"seconds": sec, "nanos": nanos}
        back = gw._ts_from_json(gw._ts_to_json(ts))
        want_ms = sec * 1000 + nanos // 1_000_000
        assert sp.ts_to_ms(back) == want_ms, (ts, back)


def test_duration_render_is_exact_digits():
    assert gw._dur_to_json({"seconds": 0, "nanos": 0}) == "0s"
    assert gw._dur_to_json({"seconds": 3, "nanos": 1}) == "3.000000001s"
    assert gw._dur_to_json({"seconds": -3, "nanos": -500_000_000}) == "-3.5s"
    # mixed-sign dicts (spec-invalid but accepted verbatim from clients
    # via the dict passthrough) render their true value, not a wrong sign
    assert gw._dur_to_json({"seconds": 5, "nanos": -500_000_000}) == "4.5s"
    assert gw._dur_to_json({"seconds": -1, "nanos": 999_999_999}) == (
        "-0.000000001s")
    assert gw._dur_from_json("3.000000001s") == {"seconds": 3, "nanos": 1}
    assert gw._dur_from_json("-3.5s") == {
        "seconds": -3, "nanos": -500_000_000}
    assert gw._dur_from_json("60s") == {"seconds": 60, "nanos": 0}
    assert gw._dur_from_json(".5s") == {"seconds": 0, "nanos": 500_000_000}
    # bare JSON numbers stay accepted, incl. scientific-notation str()s
    assert gw._dur_from_json(60) == {"seconds": 60, "nanos": 0}
    assert gw._dur_from_json(1e16) == {"seconds": 10**16, "nanos": 0}
    assert gw._dur_from_json(2.5) == {"seconds": 2, "nanos": 500_000_000}


def test_duration_degenerate_spellings_rejected():
    # the protobuf JSON codec 400s these; they must not become 0s
    for bad in ("", "s", ".", "-s", "--5s", "+-1s", "5", "1.2.3s",
                "abc", "1a.5s", "1.5as", True):
        with pytest.raises((ValueError, TypeError)):
            gw._dur_from_json(bad)


def test_double_nan_renders_as_json_string():
    # protobuf JSON spec: NaN/Infinity are strings
    desc = sp.GET_AGGREGATION_RESPONSE
    found = json.dumps(gw.proto_to_json(
        sp.AGGREGATION_BUCKET, {"key": "k", "value": float("nan")}))
    assert '"NaN"' in found
