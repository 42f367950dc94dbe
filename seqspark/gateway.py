"""grpc-gateway JSON transcoding for the HTTP surface.

The reference serves its HTTP API through grpc-gateway
(`api/seqproxyapi/v1/seq_proxy_api.proto` google.api.http annotations:
``/search``, ``/complex-search``, ``/aggregate``, ``/histogram``,
``/mappings``, ``/async-search`` …), so every documented curl uses the
gateway's JSON rendering of the proto messages: lowerCamel (or
snake_case) keys, RFC3339 strings for ``google.protobuf.Timestamp``,
base64 for ``bytes``, strings for int64, enum NAMES for enums.

This module converts between that JSON shape and the proto-dict shape
the :mod:`seqspark.grpcapi` handlers already speak, so the HTTP server
serves the gateway routes through the SAME handlers as the real gRPC
transport — one behavior, two renderings.
"""

from __future__ import annotations

import base64
import datetime as _dt
from typing import Optional

from .wire import seqproxy as sp

#: enum value names per FIELD name (proto enum types, `seq_proxy_api.proto`)
_ENUMS = {
    "code": {0: "ERROR_CODE_UNSPECIFIED", 1: "ERROR_CODE_NO",
             2: "ERROR_CODE_PARTIAL_RESPONSE",
             3: "ERROR_CODE_TOO_MANY_FRACTIONS_HIT"},
    "func": {0: "AGG_FUNC_COUNT", 1: "AGG_FUNC_SUM", 2: "AGG_FUNC_MIN",
             3: "AGG_FUNC_MAX", 4: "AGG_FUNC_AVG", 5: "AGG_FUNC_QUANTILE",
             6: "AGG_FUNC_UNIQUE"},
    "order": {0: "ORDER_DESC", 1: "ORDER_ASC"},
}
_ENUM_VALUES = {
    fld: {name: num for num, name in names.items()}
    for fld, names in _ENUMS.items()
}

_INT64 = {"int64", "uint64", "sint64", "fixed64", "sfixed64"}


def _camel(name: str) -> str:
    parts = name.split("_")
    return parts[0] + "".join(p.title() for p in parts[1:])


_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
_MS = _dt.timedelta(milliseconds=1)


def _ts_to_json(ts: Optional[dict]) -> Optional[str]:
    # integer datetime arithmetic, not fromtimestamp(float): a float
    # detour near a .xx9995 boundary mis-truncates the rendered
    # millisecond, and a window edge that moves 1 ms drops real docs
    if ts is None:
        return None
    t = _EPOCH + _dt.timedelta(
        seconds=ts.get("seconds", 0),
        microseconds=ts.get("nanos", 0) // 1000,
    )
    return t.isoformat(timespec="milliseconds").replace("+00:00", "Z")


def _ts_from_json(v) -> Optional[dict]:
    if v is None:
        return None
    if isinstance(v, dict):  # already proto-shaped
        return v
    t = _dt.datetime.fromisoformat(str(v).replace("Z", "+00:00"))
    if t.tzinfo is None:
        # protobuf JSON Timestamps are RFC3339 WITH an offset; guessing
        # the server's local zone would make the window depend on the
        # deployment machine, so reject like the reference gateway does
        raise ValueError(
            f"invalid Timestamp {v!r}: RFC3339 requires a 'Z' or offset"
        )
    ms = (t - _EPOCH) // _MS  # exact; timestamp()*1000 can lose the edge ms
    return sp.ms_to_ts(ms)


def _dur_to_json(d: Optional[dict]) -> Optional[str]:
    if d is None:
        return None
    # normalize through total nanos: the proto spec says seconds and
    # nanos share a sign, but the dict passthrough in _dur_from_json
    # accepts client-supplied dicts verbatim, so a mixed-sign pair must
    # still render its true value (+5s-500ms = "4.5s", not "-5.5s")
    total = int(d.get("seconds", 0)) * 1_000_000_000 + int(d.get("nanos", 0))
    if not total:
        return "0s"
    sign = "-" if total < 0 else ""
    sec, nanos = divmod(abs(total), 1_000_000_000)
    body = f"{sec}.{nanos:09d}".rstrip("0").rstrip(".")
    return sign + body + "s"


def json_to_proto(desc: dict, obj: dict) -> dict:
    """Gateway JSON → the proto-dict shape grpcapi handlers consume.
    Accepts both lowerCamel and snake_case keys (the gateway does)."""
    out: dict = {}
    for f in desc.values():
        v = obj.get(f.name, obj.get(_camel(f.name)))
        if v is None:
            continue
        if f.repeated:
            out[f.name] = [_from_json_one(f, x) for x in v]
        else:
            out[f.name] = _from_json_one(f, v)
    return out


def _dur_from_json(v) -> dict:
    if isinstance(v, dict):
        return v
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        # bare JSON numbers (seconds) were historically accepted,
        # including values whose str() is scientific notation (1e16)
        sec = int(v)
        return {"seconds": sec, "nanos": int(round((v - sec) * 1e9))}
    s = str(v)
    if not s.endswith("s"):
        raise ValueError(f"invalid Duration {v!r}: missing 's' suffix")
    s = s[:-1]
    neg = s.startswith("-")
    body = s[1:] if s[:1] in "+-" else s
    whole, _, frac = body.partition(".")
    # digit-exact parse; degenerate spellings ("", "s", ".", "--5s")
    # must 400 like the protobuf JSON codec, not quietly become 0
    if (not (whole or frac) or not (whole or "0").isdigit()
            or not (frac or "0").isdigit()):
        raise ValueError(f"invalid Duration {v!r}")
    sec = int(whole or 0)
    nanos = int((frac + "000000000")[:9]) if frac else 0
    if neg:
        sec, nanos = -sec, -nanos
    return {"seconds": sec, "nanos": nanos}


def _from_json_one(f, v):
    if f.type == "message":
        if f.message is sp.TIMESTAMP:
            return _ts_from_json(v)
        if f.message is sp.DURATION:
            return _dur_from_json(v)
        return json_to_proto(f.message, v)
    if f.type == "enum":
        if isinstance(v, str) and not v.lstrip("-").isdigit():
            return _ENUM_VALUES.get(f.name, {}).get(v, 0)
        return int(v)
    if f.type == "bytes":
        return base64.b64decode(v) if isinstance(v, str) else v
    if f.type in _INT64 or f.type in ("int32", "uint32", "sint32"):
        return int(v)
    if f.type == "double":
        return float(v)
    if f.type == "bool":
        return bool(v)
    return v


def proto_to_json(desc: dict, msg: dict) -> dict:
    """Proto-dict response → the gateway JSON rendering."""
    out: dict = {}
    for f in desc.values():
        if f.name not in msg:
            continue
        v = msg[f.name]
        if v is None:
            continue
        if f.repeated:
            out[_camel(f.name)] = [_to_json_one(f, x) for x in v]
        else:
            out[_camel(f.name)] = _to_json_one(f, v)
    return out


def _to_json_one(f, v):
    if f.type == "message":
        if f.message is sp.TIMESTAMP:
            return _ts_to_json(v)
        if f.message is sp.DURATION:
            return _dur_to_json(v)
        return proto_to_json(f.message, v)
    if f.type == "enum":
        names = _ENUMS.get(f.name)
        return names.get(int(v), int(v)) if names else int(v)
    if f.type == "bytes":
        b = v if isinstance(v, (bytes, bytearray)) else str(v).encode()
        return base64.b64encode(bytes(b)).decode()
    if f.type in _INT64:
        return str(int(v))
    if f.type == "double":
        fv = float(v)
        return "NaN" if fv != fv else fv
    return v
