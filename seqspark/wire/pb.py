"""Minimal protobuf (proto3) wire-format codec — pure stdlib.

The container ships no ``grpcio``/``protobuf`` wheels, so the gRPC
transport parity layer (reference `api/seqproxyapi/v1/seq_proxy_api.proto`,
served by `proxyapi/grpc_v1.go`) encodes and decodes messages with this
hand-rolled codec. It implements exactly the subset of the protobuf
encoding spec (https://protobuf.dev/programming-guides/encoding/) the
seq-db API surface uses:

- wire type 0 (VARINT): int32/int64/uint32/uint64/bool/enum;
- wire type 1 (I64):    double;
- wire type 2 (LEN):    string/bytes/nested message/packed repeated
  scalars;
- repeated fields, proto3 implicit presence (zero values omitted) and
  explicit ``optional`` presence;
- unknown fields are skipped on decode (forward compatibility), never
  preserved.

Messages are plain Python dicts keyed by field NAME; descriptors are
plain dicts keyed by field NUMBER — no codegen, no metaclasses, so the
schema in :mod:`seqspark.wire.seqproxy` reads like the ``.proto`` file
it mirrors.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional, Tuple

_VARINT_TYPES = frozenset(
    {"int32", "int64", "uint32", "uint64", "bool", "enum"}
)
_SIGNED_TYPES = frozenset({"int32", "int64"})


class Field:
    """One field of a message descriptor.

    ``type`` ∈ varint types | {"double", "string", "bytes", "message"};
    ``message`` is the nested descriptor dict for type="message";
    ``repeated`` marks repeated fields (scalar numerics are packed on
    encode, both packed and unpacked accepted on decode);
    ``optional`` marks explicit proto3 presence: the decoded default is
    ``None`` instead of the zero value, and ``None`` is never encoded.
    """

    __slots__ = ("name", "type", "message", "repeated", "optional")

    def __init__(
        self,
        name: str,
        type: str,
        message: Optional[dict] = None,
        repeated: bool = False,
        optional: bool = False,
    ):
        if type == "message" and message is None:
            raise ValueError(f"field {name!r}: message type needs a descriptor")
        self.name = name
        self.type = type
        self.message = message
        self.repeated = repeated
        self.optional = optional


# --------------------------------------------------------------- primitives


def encode_varint(value: int) -> bytes:
    """Base-128 varint. Negative ints are encoded as their 64-bit two's
    complement (10 bytes), as protobuf does for int32/int64."""
    if value < 0:
        value &= (1 << 64) - 1
    out = bytearray()
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    """-> (value, new_pos). Raises on truncation or >10-byte runs."""
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        if shift >= 70:
            raise ValueError("varint too long")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _to_signed64(value: int) -> int:
    return value - (1 << 64) if value >= (1 << 63) else value


def _tag(field_number: int, wire_type: int) -> bytes:
    return encode_varint((field_number << 3) | wire_type)


def _skip(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == 0:
        _, pos = decode_varint(buf, pos)
        return pos
    elif wire_type == 1:
        pos += 8
    elif wire_type == 2:
        n, pos = decode_varint(buf, pos)
        pos += n
    elif wire_type == 5:
        pos += 4
    else:
        raise ValueError(f"cannot skip wire type {wire_type}")
    if pos > len(buf):
        raise ValueError("truncated field")
    return pos


# ----------------------------------------------------------------- encoding


def _encode_scalar(ftype: str, value) -> Tuple[int, bytes]:
    """-> (wire_type, payload bytes) for one non-message scalar."""
    if ftype in _VARINT_TYPES:
        return 0, encode_varint(int(value))
    if ftype == "double":
        return 1, struct.pack("<d", float(value))
    if ftype == "string":
        data = value.encode("utf-8") if isinstance(value, str) else bytes(value)
        return 2, encode_varint(len(data)) + data
    if ftype == "bytes":
        data = bytes(value)
        return 2, encode_varint(len(data)) + data
    raise ValueError(f"unknown field type {ftype!r}")


def encode(descriptor: dict, msg: Optional[dict]) -> bytes:
    """Encode a dict against a {field_number: Field} descriptor.

    proto3 semantics: scalar zero values ("", b"", 0, 0.0, False) are
    omitted unless the field is marked ``optional`` (in which case only
    ``None`` is omitted); empty/None repeated fields are omitted; None
    messages are omitted.
    """
    if msg is None:
        return b""
    out = bytearray()
    for number in sorted(descriptor):
        f = descriptor[number]
        value = msg.get(f.name)
        if f.repeated:
            if not value:
                continue
            if f.type == "message":
                for item in value:
                    body = encode(f.message, item)
                    out += _tag(number, 2) + encode_varint(len(body)) + body
            elif f.type in ("string", "bytes"):
                for item in value:
                    wt, payload = _encode_scalar(f.type, item)
                    out += _tag(number, wt) + payload
            else:
                # packed scalars (proto3 default for repeated numerics)
                packed = bytearray()
                for item in value:
                    wt, payload = _encode_scalar(f.type, item)
                    packed += payload
                out += _tag(number, 2) + encode_varint(len(packed)) + packed
            continue
        if value is None:
            continue
        if f.type == "message":
            body = encode(f.message, value)
            out += _tag(number, 2) + encode_varint(len(body)) + body
            continue
        if not f.optional and not value and f.type != "double":
            continue  # proto3 implicit presence: zero value omitted
        if not f.optional and f.type == "double" and value == 0.0:
            continue
        wt, payload = _encode_scalar(f.type, value)
        out += _tag(number, wt) + payload
    return bytes(out)


# ----------------------------------------------------------------- decoding


def _default(f: Field):
    if f.repeated:
        return []
    if f.optional or f.type == "message":
        return None
    if f.type in ("string",):
        return ""
    if f.type == "bytes":
        return b""
    if f.type == "bool":
        return False
    if f.type == "double":
        return 0.0
    return 0


def _decode_scalar(f: Field, buf: bytes, pos: int, wire_type: int):
    if wire_type == 0:
        raw, pos = decode_varint(buf, pos)
        if f.type in _SIGNED_TYPES:
            return _to_signed64(raw), pos
        if f.type == "bool":
            return bool(raw), pos
        return raw, pos
    if wire_type == 1:
        if pos + 8 > len(buf):
            raise ValueError("truncated fixed64")
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    raise ValueError(f"field {f.name!r}: unexpected wire type {wire_type}")


def _iter_packed(f: Field, data: bytes) -> Iterator:
    pos = 0
    while pos < len(data):
        if f.type == "double":
            if pos + 8 > len(data):
                raise ValueError("truncated packed double")
            yield struct.unpack_from("<d", data, pos)[0]
            pos += 8
        else:
            raw, pos = decode_varint(data, pos)
            if f.type in _SIGNED_TYPES:
                raw = _to_signed64(raw)
            elif f.type == "bool":
                raw = bool(raw)
            yield raw


def decode(descriptor: dict, buf: bytes) -> dict:
    """Decode bytes against a descriptor into a dict with every declared
    field present (defaults filled per proto3 presence rules)."""
    msg = {f.name: _default(f) for f in descriptor.values()}
    pos = 0
    while pos < len(buf):
        tag, pos = decode_varint(buf, pos)
        number, wire_type = tag >> 3, tag & 0x07
        f = descriptor.get(number)
        if f is None:
            pos = _skip(buf, pos, wire_type)
            continue
        if f.type == "message":
            if wire_type != 2:
                raise ValueError(f"field {f.name!r}: message needs LEN wire")
            n, pos = decode_varint(buf, pos)
            if pos + n > len(buf):
                raise ValueError(f"field {f.name!r}: truncated message")
            sub = decode(f.message, buf[pos : pos + n])
            pos += n
            if f.repeated:
                msg[f.name].append(sub)
            else:
                msg[f.name] = sub
            continue
        if f.type in ("string", "bytes"):
            if wire_type != 2:
                raise ValueError(f"field {f.name!r}: needs LEN wire")
            n, pos = decode_varint(buf, pos)
            raw = buf[pos : pos + n]
            if len(raw) != n:
                raise ValueError(f"field {f.name!r}: truncated")
            pos += n
            value = raw.decode("utf-8") if f.type == "string" else bytes(raw)
            if f.repeated:
                msg[f.name].append(value)
            else:
                msg[f.name] = value
            continue
        # scalar numerics
        if f.repeated and wire_type == 2:  # packed
            n, pos = decode_varint(buf, pos)
            if pos + n > len(buf):
                raise ValueError(f"field {f.name!r}: truncated packed field")
            msg[f.name].extend(_iter_packed(f, buf[pos : pos + n]))
            pos += n
            continue
        value, pos = _decode_scalar(f, buf, pos, wire_type)
        if f.repeated:
            msg[f.name].append(value)
        else:
            msg[f.name] = value
    return msg
