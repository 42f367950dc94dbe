"""Wire-stack unit tests: protobuf codec, HPACK (RFC 7541 vectors),
HTTP/2 framing, gRPC protocol — no Spark involved."""

import struct
import threading

import pytest

from seqspark.wire import grpc as g
from seqspark.wire import h2, hpack, pb
from seqspark.wire.pb import Field

# ------------------------------------------------------------------ protobuf

SIMPLE = {
    1: Field("name", "string"),
    2: Field("n", "int64"),
    3: Field("flag", "bool"),
    4: Field("score", "double"),
    5: Field("raw", "bytes"),
}

NESTED = {
    1: Field("inner", "message", SIMPLE),
    2: Field("items", "message", SIMPLE, repeated=True),
    3: Field("vals", "double", repeated=True),
    4: Field("ids", "int64", repeated=True),
    5: Field("tags", "string", repeated=True),
    6: Field("maybe", "int32", optional=True),
}


def test_pb_golden_bytes():
    # field 1 (string "abc"): tag 0x0a, len 3; field 2 (int64 150):
    # tag 0x10, varint 0x96 0x01 — the canonical protobuf-docs example
    assert pb.encode(SIMPLE, {"name": "abc"}) == b"\x0a\x03abc"
    assert pb.encode(SIMPLE, {"n": 150}) == b"\x10\x96\x01"
    assert pb.encode(SIMPLE, {"flag": True}) == b"\x18\x01"
    # double 1.0 little-endian fixed64 on field 4 (tag 0x21)
    assert pb.encode(SIMPLE, {"score": 1.0}) == b"\x21" + struct.pack("<d", 1.0)


def test_pb_zero_values_omitted():
    assert pb.encode(SIMPLE, {"name": "", "n": 0, "flag": False,
                              "score": 0.0, "raw": b""}) == b""


def test_pb_negative_int_ten_bytes():
    enc = pb.encode(SIMPLE, {"n": -1})
    assert len(enc) == 11  # tag + 10-byte varint
    assert pb.decode(SIMPLE, enc)["n"] == -1


def test_pb_roundtrip_nested():
    msg = {
        "inner": {"name": "x", "n": 7, "flag": True, "score": -2.5,
                  "raw": b"\x00\xff"},
        "items": [{"name": "a", "n": 1, "flag": False, "score": 0.0,
                   "raw": b""},
                  {"name": "b", "n": -5, "flag": True, "score": 1e300,
                   "raw": b"z"}],
        "vals": [0.5, -1.5, float("inf")],
        "ids": [1, 0, 300, -2],
        "tags": ["p", "", "q"],
        "maybe": 0,
    }
    dec = pb.decode(NESTED, pb.encode(NESTED, msg))
    assert dec == msg


def test_pb_optional_presence():
    # optional int32: explicit 0 is encoded, absent is None
    assert pb.decode(NESTED, b"")["maybe"] is None
    enc = pb.encode(NESTED, {"maybe": 0})
    assert enc != b""
    assert pb.decode(NESTED, enc)["maybe"] == 0


def test_pb_packed_and_unpacked_repeated():
    enc = pb.encode(NESTED, {"ids": [1, 2, 3]})
    # packed: single LEN field
    assert enc[0] == (4 << 3) | 2
    assert pb.decode(NESTED, enc)["ids"] == [1, 2, 3]
    # unpacked form (one varint field per element) must also decode
    unpacked = b"".join(b"\x20" + pb.encode_varint(v) for v in (1, 2, 3))
    assert pb.decode(NESTED, unpacked)["ids"] == [1, 2, 3]


def test_pb_unknown_fields_skipped():
    # unknown varint field 15, unknown LEN field 14, then known name
    buf = (b"\x78\x2a"                      # field 15 varint 42
           + b"\x72\x03zzz"                 # field 14 LEN "zzz"
           + b"\x0a\x02hi")
    assert pb.decode(SIMPLE, buf)["name"] == "hi"


def test_pb_truncated_raises():
    with pytest.raises(ValueError):
        pb.decode(SIMPLE, b"\x0a\x05ab")  # LEN says 5, only 2 present
    with pytest.raises(ValueError):
        pb.decode(SIMPLE, b"\x10\x96")  # unterminated varint


# -------------------------------------------------------------------- hpack


def test_hpack_integer_vectors():
    # RFC 7541 C.1: 10 in 5-bit prefix; 1337 in 5-bit; 42 in 8-bit
    assert hpack.encode_int(10, 5) == b"\x0a"
    assert hpack.encode_int(1337, 5) == b"\x1f\x9a\x0a"
    assert hpack.encode_int(42, 8) == b"\x2a"
    assert hpack.decode_int(b"\x0a", 0, 5) == (10, 1)
    assert hpack.decode_int(b"\x1f\x9a\x0a", 0, 5) == (1337, 3)
    assert hpack.decode_int(b"\x2a", 0, 8) == (42, 1)


HUFF_VECTORS = {
    b"www.example.com": "f1e3c2e5f23a6ba0ab90f4ff",
    b"no-cache": "a8eb10649cbf",
    b"custom-key": "25a849e95ba97d7f",
    b"custom-value": "25a849e95bb8e8b4bf",
    b"302": "6402",
    b"private": "aec3771a4b",
    b"Mon, 21 Oct 2013 20:13:21 GMT":
        "d07abe941054d444a8200595040b8166e082a62d1bff",
    b"https://www.example.com": "9d29ad171863c78f0b97c8e9ae82ae43d3",
    b"gzip": "9bd9ab",
    b"foo=ASDJKHQKBZXOQWEOPIUAXQWEOIU; max-age=3600; version=1":
        "94e7821dd7f2e6c7b335dfdfcd5b3960d5af27087f3672c1ab270fb5291f9587"
        "316065c003ed4ee5b1063d5007",
}


def test_huffman_rfc7541_appendix_c_vectors():
    for raw, hexs in HUFF_VECTORS.items():
        assert hpack.huffman_encode(raw).hex() == hexs
        assert hpack.huffman_decode(bytes.fromhex(hexs)) == raw


def test_huffman_roundtrip_all_bytes():
    data = bytes(range(256))
    assert hpack.huffman_decode(hpack.huffman_encode(data)) == data


def test_huffman_bad_padding_rejected():
    # a zero-padded tail is not an EOS prefix
    with pytest.raises(ValueError):
        hpack.huffman_decode(bytes.fromhex("f1e3c2e5f23a6ba0ab90f400"))


def test_hpack_rfc7541_c3_request_sequence():
    """C.3: three requests WITHOUT Huffman, dynamic table evolving."""
    d = hpack.Decoder()
    h1 = d.decode(bytes.fromhex(
        "828684410f7777772e6578616d706c652e636f6d"))
    assert h1 == [(":method", "GET"), (":scheme", "http"), (":path", "/"),
                  (":authority", "www.example.com")]
    h2_ = d.decode(bytes.fromhex("828684be58086e6f2d6361636865"))
    assert h2_ == [(":method", "GET"), (":scheme", "http"), (":path", "/"),
                   (":authority", "www.example.com"),
                   ("cache-control", "no-cache")]
    h3 = d.decode(bytes.fromhex(
        "828785bf400a637573746f6d2d6b65790c637573746f6d2d76616c7565"))
    assert h3 == [(":method", "GET"), (":scheme", "https"),
                  (":path", "/index.html"), (":authority", "www.example.com"),
                  ("custom-key", "custom-value")]


def test_hpack_rfc7541_c4_request_sequence_huffman():
    """C.4: the same three requests WITH Huffman coding."""
    d = hpack.Decoder()
    h1 = d.decode(bytes.fromhex("828684418cf1e3c2e5f23a6ba0ab90f4ff"))
    assert h1[-1] == (":authority", "www.example.com")
    h2_ = d.decode(bytes.fromhex("828684be5886a8eb10649cbf"))
    assert h2_[-1] == ("cache-control", "no-cache")
    h3 = d.decode(bytes.fromhex(
        "828785bf408825a849e95ba97d7f8925a849e95bb8e8b4bf"))
    assert h3[-1] == ("custom-key", "custom-value")


def test_hpack_encoder_decoder_roundtrip():
    headers = [
        (":method", "POST"), (":scheme", "http"),
        (":path", "/seqproxyapi.v1.SeqProxyApi/Search"),
        (":authority", "localhost:1234"),
        ("content-type", "application/grpc"), ("te", "trailers"),
        ("use-seq-ql", "true"), ("grpc-status", "0"),
    ]
    for huffman in (True, False):
        enc = hpack.Encoder(huffman=huffman).encode(headers)
        assert hpack.Decoder().decode(enc) == headers


def test_hpack_table_size_update_and_eviction():
    d = hpack.Decoder(max_table_size=4096)
    # add an entry via incremental indexing, then shrink the table to 0
    block = hpack.encode_int(0, 6, 0x40) + hpack._encode_string("k", False) \
        + hpack._encode_string("v", False)
    assert d.decode(block) == [("k", "v")]
    assert d.decode(hpack.encode_int(62, 7, 0x80)) == [("k", "v")]
    d.decode(hpack.encode_int(0, 5, 0x20))  # size update to 0 → evict
    with pytest.raises(ValueError):
        d.decode(hpack.encode_int(62, 7, 0x80))


# ------------------------------------------------------------------- h2/grpc

REQ = {1: Field("name", "string"), 2: Field("n", "int64"),
       3: Field("vals", "double", repeated=True)}
RESP = {1: Field("echo", "string"), 2: Field("sum", "double")}


@pytest.fixture()
def echo_server():
    def echo(req, md):
        return {"echo": req["name"] + md.get("x-extra", ""),
                "sum": sum(req["vals"]) + req["n"]}

    def stream(req, md):
        for i in range(req["n"]):
            yield {"echo": f"{req['name']}-{i}", "sum": float(i)}

    def boom(req, md):
        raise ValueError("bad input here")

    def big(req, md):
        for i in range(req["n"]):
            yield {"echo": "x" * 1000, "sum": float(i)}

    srv = g.GrpcServer({
        "/t.S/Echo": g.Method(echo, REQ, RESP),
        "/t.S/Stream": g.Method(stream, REQ, RESP, server_streaming=True),
        "/t.S/Boom": g.Method(boom, REQ, RESP),
        "/t.S/Big": g.Method(big, REQ, RESP, server_streaming=True),
    }).start()
    yield srv
    srv.stop()


def test_grpc_unary_roundtrip(echo_server):
    ch = g.GrpcChannel("127.0.0.1", echo_server.port)
    try:
        r = ch.unary("/t.S/Echo", {"name": "hi", "n": 5, "vals": [1.5, 2.5]},
                     REQ, RESP, metadata=[("x-extra", "!")])
        assert r["echo"] == "hi!"
        assert r["sum"] == 9.0
    finally:
        ch.close()


def test_grpc_streaming_and_multiplexed(echo_server):
    ch = g.GrpcChannel("127.0.0.1", echo_server.port)
    try:
        rs = ch.server_streaming("/t.S/Stream", {"name": "s", "n": 3},
                                 REQ, RESP)
        assert [m["echo"] for m in rs] == ["s-0", "s-1", "s-2"]
        # several concurrent streams on ONE connection
        results = {}

        def call(i):
            results[i] = ch.unary("/t.S/Echo", {"name": f"c{i}", "n": i},
                                  REQ, RESP)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(30)
        assert {r["echo"] for r in results.values()} == {f"c{i}" for i in range(8)}
    finally:
        ch.close()


def test_grpc_error_codes(echo_server):
    ch = g.GrpcChannel("127.0.0.1", echo_server.port)
    try:
        with pytest.raises(g.GrpcError) as ei:
            ch.unary("/t.S/Nope", {}, REQ, RESP)
        assert ei.value.code == g.UNIMPLEMENTED
        with pytest.raises(g.GrpcError) as ei:
            ch.unary("/t.S/Boom", {"name": "x"}, REQ, RESP)
        assert ei.value.code == g.INVALID_ARGUMENT
        assert "bad input here" in ei.value.message
    finally:
        ch.close()


def test_grpc_flow_control_large_stream(echo_server):
    """300 × ~1 KB messages ≫ the 64 KiB initial window: requires the
    server to honor WINDOW_UPDATE replenishment or the stream deadlocks."""
    ch = g.GrpcChannel("127.0.0.1", echo_server.port)
    try:
        rs = ch.server_streaming("/t.S/Big", {"n": 300}, REQ, RESP)
        assert len(rs) == 300
        assert rs[-1]["sum"] == 299.0
    finally:
        ch.close()


def test_grpc_compressed_flag_rejected(echo_server):
    ch = g.GrpcChannel("127.0.0.1", echo_server.port)
    try:
        payload = pb.encode(REQ, {"name": "x"})
        body = b"\x01" + struct.pack(">I", len(payload)) + payload
        st = ch._client.request(
            [(":method", "POST"), (":scheme", "http"), (":path", "/t.S/Echo"),
             (":authority", "x"), ("content-type", "application/grpc"),
             ("te", "trailers")],
            body,
        )
        ch._client.wait(st, 30)
        code, msg = ch._status_of(st)
        assert code == g.UNIMPLEMENTED
    finally:
        ch.close()


def test_h2_continuation_frames(echo_server):
    """Header block split across HEADERS + CONTINUATION must reassemble."""
    import socket

    enc = hpack.Encoder()
    sock = socket.create_connection(("127.0.0.1", echo_server.port), timeout=30)
    try:
        sock.sendall(h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b""))
        block = enc.encode([
            (":method", "POST"), (":scheme", "http"), (":path", "/t.S/Echo"),
            (":authority", "x"), ("content-type", "application/grpc"),
            ("te", "trailers"),
        ])
        half = len(block) // 2
        body = g.frame_message(pb.encode(REQ, {"name": "cont", "n": 1}))
        sock.sendall(
            h2.pack_frame(h2.HEADERS, 0, 1, block[:half])
            + h2.pack_frame(h2.CONTINUATION, h2.FLAG_END_HEADERS, 1,
                            block[half:])
            + h2.pack_frame(h2.DATA, h2.FLAG_END_STREAM, 1, body)
        )
        data = bytearray()
        trailers_seen = False
        dec = hpack.Decoder()
        while not trailers_seen:
            ftype, flags, sid, payload = h2.read_frame(sock)
            if ftype == h2.DATA and sid == 1:
                data += payload
            elif ftype == h2.HEADERS and sid == 1:
                headers = dec.decode(payload)
                if ("grpc-status", "0") in headers:
                    trailers_seen = True
        msgs = list(g.iter_messages(bytes(data)))
        assert pb.decode(RESP, msgs[0])["echo"] == "cont"
    finally:
        sock.close()


def test_grpc_multiple_messages_in_body():
    frames = g.frame_message(b"ab") + g.frame_message(b"") + g.frame_message(b"c")
    assert list(g.iter_messages(frames)) == [b"ab", b"", b"c"]
    with pytest.raises(g.GrpcError):
        list(g.iter_messages(b"\x00\x00\x00\x00\x05ab"))


def test_grpc_timeout_parse():
    assert g.parse_grpc_timeout("100m") == 0.1
    assert g.parse_grpc_timeout("30S") == 30.0
    assert g.parse_grpc_timeout("2M") == 120.0
    assert g.parse_grpc_timeout("1H") == 3600.0
    assert g.parse_grpc_timeout("500u") == pytest.approx(0.0005)
    assert g.parse_grpc_timeout("7n") == pytest.approx(7e-9)
    for bad in ("", "S", "12", "123456789S", "1.5S", "5x"):
        assert g.parse_grpc_timeout(bad) is None


def test_grpc_deadline_exceeded():
    """A handler that outlives grpc-timeout must yield DEADLINE_EXCEEDED,
    not a stale OK (gRPC HTTP/2 protocol spec)."""
    import time as _t

    def slow(req, md):
        _t.sleep(0.2)
        return {"echo": "late", "sum": 0.0}

    srv = g.GrpcServer({"/t.S/Slow": g.Method(slow, REQ, RESP)}).start()
    ch = g.GrpcChannel("127.0.0.1", srv.port)
    try:
        with pytest.raises(g.GrpcError) as ei:
            ch.unary("/t.S/Slow", {"name": "x"}, REQ, RESP,
                     metadata=[("grpc-timeout", "50m")])
        assert ei.value.code == g.DEADLINE_EXCEEDED
        # a generous deadline passes
        r = ch.unary("/t.S/Slow", {"name": "x"}, REQ, RESP,
                     metadata=[("grpc-timeout", "30S")])
        assert r["echo"] == "late"
    finally:
        ch.close()
        srv.stop()


# -------------------------------------------------------- property testing

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_header_name = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz0123456789-_"),
    min_size=1, max_size=24,
)
_header_value = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=64,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(_header_name, _header_value), max_size=12),
       st.booleans())
def test_hpack_roundtrip_property(headers, huffman):
    enc = hpack.Encoder(huffman=huffman).encode(headers)
    assert hpack.Decoder().decode(enc) == headers


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=128))
def test_huffman_roundtrip_property(data):
    assert hpack.huffman_decode(hpack.huffman_encode(data)) == data


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**62), st.integers(1, 8))
def test_hpack_int_roundtrip_property(value, prefix):
    enc = hpack.encode_int(value, prefix)
    got, pos = hpack.decode_int(enc, 0, prefix)
    assert (got, pos) == (value, len(enc))


_pb_msg = st.fixed_dictionaries({
    "name": st.text(max_size=32),
    "n": st.integers(min_value=-(2**63), max_value=2**63 - 1),
    "flag": st.booleans(),
    "score": st.floats(allow_nan=False),
    "raw": st.binary(max_size=32),
})


@settings(max_examples=200, deadline=None)
@given(st.fixed_dictionaries({
    "inner": _pb_msg,
    "items": st.lists(_pb_msg, max_size=4),
    "vals": st.lists(st.floats(allow_nan=False), max_size=8),
    "ids": st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                    max_size=8),
    "tags": st.lists(st.text(max_size=16), max_size=6),
    "maybe": st.one_of(st.none(),
                       st.integers(min_value=-(2**31), max_value=2**31 - 1)),
}))
def test_pb_roundtrip_property(msg):
    enc = pb.encode(NESTED, msg)
    assert pb.decode(NESTED, enc) == msg


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**64 - 1))
def test_pb_varint_roundtrip_property(v):
    got, pos = pb.decode_varint(pb.encode_varint(v), 0)
    assert got == (v & (1 << 64) - 1)


# ------------------------------------------------------ malformed-input hardening


def _connect(port):
    import socket

    s = socket.create_connection(("127.0.0.1", port), timeout=10)
    s.settimeout(10)
    return s


def test_h2_rejects_bad_preface(echo_server):
    s = _connect(echo_server.port)
    try:
        s.sendall(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
        # an HTTP/1.1 request WITHOUT an h2c upgrade offer gets a clean
        # 505 and the connection closes — never a hang or crash
        try:
            first = s.recv(1024)
            assert first == b"" or first.startswith(b"HTTP/1.1 505")
            if first:
                assert s.recv(1024) == b""
        except ConnectionResetError:
            pass
    finally:
        s.close()


def test_h2_survives_garbage_frames(echo_server):
    """Random bytes after a valid preface must at worst close the
    connection — and the server must keep serving NEW connections."""
    import os as _os

    s = _connect(echo_server.port)
    try:
        s.sendall(h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b""))
        s.sendall(_os.urandom(512))
        try:
            while s.recv(4096):
                pass
        except OSError:
            pass
    finally:
        s.close()
    # the listener is still healthy
    ch = g.GrpcChannel("127.0.0.1", echo_server.port)
    try:
        r = ch.unary("/t.S/Echo", {"name": "ok", "n": 1}, REQ, RESP)
        assert r["echo"] == "ok"
    finally:
        ch.close()


def test_h2_truncated_frame_closes_cleanly(echo_server):
    s = _connect(echo_server.port)
    try:
        s.sendall(h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b""))
        # header promises 100 payload bytes, sends 3, then half-closes
        s.sendall(b"\x00\x00\x64" + bytes([h2.DATA, 0]) +
                  (1).to_bytes(4, "big") + b"abc")
        s.shutdown(1)
        while True:
            try:
                if s.recv(4096) == b"":
                    break
            except OSError:
                break
    finally:
        s.close()


def test_h2_bad_hpack_block_closes(echo_server):
    s = _connect(echo_server.port)
    try:
        s.sendall(h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b""))
        # indexed header field index 200: out of table -> decode error
        s.sendall(h2.pack_frame(
            h2.HEADERS, h2.FLAG_END_HEADERS | h2.FLAG_END_STREAM, 1,
            hpack.encode_int(200, 7, 0x80)))
        deadline = 50
        while deadline:
            try:
                if s.recv(4096) == b"":
                    break
            except OSError:
                break
            deadline -= 1
    finally:
        s.close()
    # still serving
    ch = g.GrpcChannel("127.0.0.1", echo_server.port)
    try:
        assert ch.unary("/t.S/Echo", {"name": "z", "n": 0}, REQ, RESP)["echo"] == "z"
    finally:
        ch.close()


def test_grpc_handler_crash_is_isolated(echo_server):
    """A handler raising mid-setup must not take down the connection's
    other streams (RST or trailers on that stream only)."""
    ch = g.GrpcChannel("127.0.0.1", echo_server.port)
    try:
        with pytest.raises(g.GrpcError):
            ch.unary("/t.S/Boom", {"name": "x"}, REQ, RESP)
        r = ch.unary("/t.S/Echo", {"name": "after", "n": 1}, REQ, RESP)
        assert r["echo"] == "after"
    finally:
        ch.close()


# ------------------------------------------------- review-finding regressions


def test_stream_error_midway_surfaces_not_hangs(echo_server):
    """A streaming handler raising AFTER its first yield must end the
    stream visibly (RST -> missing grpc-status -> error), not hang the
    client until timeout."""
    def half_then_boom(req, md):
        yield {"echo": "one", "sum": 1.0}
        raise RuntimeError("mid-stream failure")

    srv = g.GrpcServer(
        {"/t.S/Half": g.Method(half_then_boom, REQ, RESP,
                               server_streaming=True)}
    ).start()
    ch = g.GrpcChannel("127.0.0.1", srv.port, timeout=15)
    try:
        with pytest.raises(g.GrpcError):
            ch.server_streaming("/t.S/Half", {"n": 1}, REQ, RESP)
    finally:
        ch.close()
        srv.stop()


def test_end_stream_on_continued_headers(echo_server):
    """END_STREAM on a HEADERS frame whose block spans CONTINUATION must
    still dispatch the (bodyless) request."""
    import socket

    enc = hpack.Encoder()
    s = socket.create_connection(("127.0.0.1", echo_server.port), timeout=15)
    try:
        s.settimeout(15)
        s.sendall(h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b""))
        block = enc.encode([
            (":method", "POST"), (":scheme", "http"), (":path", "/t.S/Echo"),
            (":authority", "x"), ("content-type", "application/grpc"),
            ("te", "trailers"),
        ])
        half = len(block) // 2
        s.sendall(
            h2.pack_frame(h2.HEADERS, h2.FLAG_END_STREAM, 1, block[:half])
            + h2.pack_frame(h2.CONTINUATION, h2.FLAG_END_HEADERS, 1,
                            block[half:])
        )
        saw_response = False
        dec = hpack.Decoder()
        while not saw_response:
            ftype, flags, sid, payload = h2.read_frame(s)
            if ftype == h2.HEADERS and sid == 1:
                headers = dec.decode(payload)
                if any(k == ":status" for k, _ in headers) or any(
                    k == "grpc-status" for k, _ in headers
                ):
                    saw_response = True
    finally:
        s.close()


def test_oversized_frame_rejected(echo_server):
    """A frame above our (default) SETTINGS_MAX_FRAME_SIZE is a
    connection error — close, don't buffer."""
    import socket

    s = socket.create_connection(("127.0.0.1", echo_server.port), timeout=15)
    try:
        s.settimeout(15)
        s.sendall(h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b""))
        try:
            # server may legally close (RST) as soon as it reads the
            # oversized length — mid-send resets are the expected outcome
            s.sendall(b"\x00\x80\x00" + bytes([h2.DATA, 0])
                      + (1).to_bytes(4, "big") + b"x" * (1 << 15))
            s.sendall(b"x" * ((1 << 23) - (1 << 15)))
            while s.recv(65536):
                pass
        except OSError:
            pass
    finally:
        s.close()
    # server still healthy
    ch = g.GrpcChannel("127.0.0.1", echo_server.port)
    try:
        assert ch.unary("/t.S/Echo", {"name": "up", "n": 0}, REQ, RESP)["echo"] == "up"
    finally:
        ch.close()


def test_client_large_body_flow_control(echo_server):
    """A request body over the 64 KiB initial window must flow under
    WINDOW_UPDATE replenishment, not overshoot."""
    big_name = "n" * 200_000

    ch = g.GrpcChannel("127.0.0.1", echo_server.port)
    try:
        r = ch.unary("/t.S/Echo", {"name": big_name, "n": 0}, REQ, RESP)
        assert r["echo"] == big_name
    finally:
        ch.close()


def test_pb_truncated_nested_and_packed_raise():
    enc = pb.encode(NESTED, {"inner": {"name": "hello"}})
    with pytest.raises(ValueError):
        pb.decode(NESTED, enc[:-2])  # truncated nested message
    packed = pb.encode(NESTED, {"vals": [1.0, 2.0]})
    with pytest.raises(ValueError):
        pb.decode(NESTED, packed[:-3])  # truncated packed payload
    # truncated UNKNOWN field must also raise, not silently succeed
    unknown_len = b"\x7a\x10abc"  # field 15 LEN says 16, 3 present
    with pytest.raises(ValueError):
        pb.decode(SIMPLE, unknown_len)


def test_grpc_gzip_request_encoding(echo_server):
    """A gzip-compressed request (compressed flag + grpc-encoding: gzip)
    decodes server-side; a flagged message under identity encoding stays
    UNIMPLEMENTED."""
    import gzip as _gzip

    ch = g.GrpcChannel("127.0.0.1", echo_server.port)
    try:
        payload = pb.encode(REQ, {"name": "zipped", "n": 2})
        comp = _gzip.compress(payload)
        body = b"\x01" + struct.pack(">I", len(comp)) + comp
        st = ch._client.request(
            [(":method", "POST"), (":scheme", "http"), (":path", "/t.S/Echo"),
             (":authority", "x"), ("content-type", "application/grpc"),
             ("te", "trailers"), ("grpc-encoding", "gzip")],
            body,
        )
        ch._client.wait(st, 30)
        code, msg = ch._status_of(st)
        assert code == g.OK, msg
        resp = pb.decode(RESP, next(g.iter_messages(bytes(st.data))))
        assert resp["echo"] == "zipped"
        # flagged message WITHOUT gzip encoding stays rejected
        st2 = ch._client.request(
            [(":method", "POST"), (":scheme", "http"), (":path", "/t.S/Echo"),
             (":authority", "x"), ("content-type", "application/grpc"),
             ("te", "trailers")],
            body,
        )
        ch._client.wait(st2, 30)
        code2, _ = ch._status_of(st2)
        assert code2 == g.UNIMPLEMENTED
    finally:
        ch.close()


def test_gzip_bomb_bounded(echo_server):
    """A tiny gzip body inflating past the message bound must be refused,
    not materialized (bounded inflate like the PNG decoder)."""
    import gzip as _gzip

    bomb = _gzip.compress(b"\x00" * (g.MAX_DECOMPRESSED_MESSAGE + 1024))
    assert len(bomb) < 1 << 20
    ch = g.GrpcChannel("127.0.0.1", echo_server.port)
    try:
        body = b"\x01" + struct.pack(">I", len(bomb)) + bomb
        st = ch._client.request(
            [(":method", "POST"), (":scheme", "http"), (":path", "/t.S/Echo"),
             (":authority", "x"), ("content-type", "application/grpc"),
             ("te", "trailers"), ("grpc-encoding", "gzip")],
            body,
        )
        ch._client.wait(st, 30)
        code, msg = ch._status_of(st)
        assert code == g.RESOURCE_EXHAUSTED
        assert "exceeds" in msg
    finally:
        ch.close()


# --------------------------------------------- third-party interop (Java 17)


def test_java_httpclient_interop(spark):
    """REAL third-party HTTP/2 interop: java.net.http.HttpClient (the
    JDK's independent h2 + HPACK implementation, reached through the
    Spark JVM) performs the RFC 7540 §3.2 h2c Upgrade against our
    server, then issues a second request as a native h2 stream — its
    Huffman-coded HPACK headers decoded by our decoder, our frames
    consumed by its framing layer."""
    def app(headers, body):
        hmap = dict(headers)
        resp = (
            "echo:" + body.decode()
            + "|path:" + hmap.get(":path", "")
            + "|method:" + hmap.get(":method", "")
        ).encode()
        return [(":status", "200"), ("content-type", "text/plain")], [resp], []

    srv = h2.H2Server(app).start()
    try:
        jvm = spark._jvm
        client = (
            jvm.java.net.http.HttpClient.newBuilder()
            .version(jvm.java.net.http.HttpClient.Version.HTTP_2)
            .build()
        )
        BodyPublishers = jvm.java.net.http.HttpRequest.BodyPublishers
        BodyHandlers = jvm.java.net.http.HttpResponse.BodyHandlers

        def post(path, payload):
            req = (
                jvm.java.net.http.HttpRequest.newBuilder(
                    jvm.java.net.URI.create(
                        f"http://127.0.0.1:{srv.port}{path}")
                )
                .POST(BodyPublishers.ofString(payload))
                .build()
            )
            return client.send(req, BodyHandlers.ofString())

        r1 = post("/hello", "from-java")
        assert r1.version().toString() == "HTTP_2"  # upgrade succeeded
        assert r1.statusCode() == 200
        assert r1.body() == "echo:from-java|path:/hello|method:POST"
        # second call rides the SAME connection as a plain h2 stream
        r2 = post("/second", "again")
        assert r2.version().toString() == "HTTP_2"
        assert r2.body() == "echo:again|path:/second|method:POST"
        # a large java-side body exercises our receive path + its flow
        # control against our advertised windows
        big = "x" * 300_000
        r3 = post("/big", big)
        assert r3.statusCode() == 200
        assert r3.body().startswith("echo:" + "x" * 100)
        assert len(r3.body()) == len("echo:|path:/big|method:POST") + len(big)
    finally:
        srv.stop()


# ---------------------------------------------------------------- round 8


def test_grpc_zero_timeout_is_deadline_exceeded(echo_server):
    """grpc-timeout: 0S means 'already expired', not 'no deadline' —
    even an instant handler must report DEADLINE_EXCEEDED (regression:
    0.0 is falsy, so `if timeout` silently disabled the deadline)."""
    ch = g.GrpcChannel("127.0.0.1", echo_server.port)
    try:
        for zero in ("0S", "0m"):
            with pytest.raises(g.GrpcError) as ei:
                ch.unary("/t.S/Echo", {"name": "x", "n": 1}, REQ, RESP,
                         metadata=[("grpc-timeout", zero)])
            assert ei.value.code == g.DEADLINE_EXCEEDED
    finally:
        ch.close()


def test_h2c_upgrade_oversized_body_rejected(echo_server):
    """An h2c Upgrade request declaring Content-Length past
    MAX_BODY_BYTES must be refused with 413 BEFORE the body is read —
    the framed DATA path enforces the cap, and the upgrade path must
    not be the unmetered way around it."""
    s = _connect(echo_server.port)
    try:
        s.sendall(
            b"POST /t.S/Echo HTTP/1.1\r\n"
            b"Host: x\r\n"
            b"Connection: Upgrade, HTTP2-Settings\r\n"
            b"Upgrade: h2c\r\n"
            b"HTTP2-Settings: \r\n"
            + f"Content-Length: {h2.MAX_BODY_BYTES + 1}\r\n\r\n".encode()
        )
        try:
            first = s.recv(1024)
            assert first == b"" or first.startswith(b"HTTP/1.1 413")
            if first:
                assert s.recv(1024) == b""
        except ConnectionResetError:
            pass
    finally:
        s.close()
    # the listener keeps serving fresh connections
    ch = g.GrpcChannel("127.0.0.1", echo_server.port)
    try:
        r = ch.unary("/t.S/Echo", {"name": "ok", "n": 1}, REQ, RESP)
        assert r["echo"] == "ok"
    finally:
        ch.close()


def _adversarial_frame(draw):
    """One hostile frame: wrong-order CONTINUATION, zero-increment
    WINDOW_UPDATE, SETTINGS floods, bogus sids/flags/payloads, giant
    declared lengths — the shapes a conforming client never sends."""
    kind = draw(st.sampled_from(
        ["continuation", "win0", "settings", "settings_junk", "headers_junk",
         "data_nostream", "ping", "rst", "priority", "unknown", "giant",
         # r12 additions: the targeted-test shapes, randomized
         "settings_ack_payload", "settings_badlen", "settings_mutate",
         "padded_headers", "padded_data", "headers_noend",
         "win_update_random", "goaway"]))
    sid = draw(st.sampled_from([0, 1, 2, 3, 5, 7, 2**31 - 1]))
    flags = draw(st.sampled_from([0, 1, 4, 5, 8, 0x20, 0xFF]))
    blob = draw(st.binary(max_size=48))
    if kind == "settings_ack_payload":
        return h2.pack_frame(h2.SETTINGS, h2.FLAG_ACK, 0,
                             blob[: draw(st.integers(1, 12))])
    if kind == "settings_badlen":
        return h2.pack_frame(
            h2.SETTINGS, 0, 0, b"\0" * draw(st.sampled_from([1, 5, 7, 11])))
    if kind == "settings_mutate":
        # legal-but-hostile: INITIAL_WINDOW_SIZE / MAX_FRAME_SIZE swings
        ident = draw(st.sampled_from(
            [h2.SETTINGS_INITIAL_WINDOW_SIZE, h2.SETTINGS_MAX_FRAME_SIZE]))
        value = draw(st.sampled_from([0, 1, 4096, 65535, 1 << 20, 2**31 - 1]))
        return h2.pack_frame(
            h2.SETTINGS, 0, 0, struct.pack(">HI", ident, value))
    if kind == "padded_headers":
        pad = draw(st.integers(0, 255))
        return h2.pack_frame(
            h2.HEADERS, h2.FLAG_END_HEADERS | h2.FLAG_PADDED, sid or 1,
            bytes([pad]) + blob)
    if kind == "padded_data":
        pad = draw(st.integers(0, 255))
        return h2.pack_frame(
            h2.DATA, flags | h2.FLAG_PADDED, sid or 1, bytes([pad]) + blob)
    if kind == "headers_noend":
        # header block left OPEN: every following frame must be judged
        # against the expected-CONTINUATION rule
        return h2.pack_frame(h2.HEADERS, 0, sid or 1, blob)
    if kind == "win_update_random":
        return h2.pack_frame(
            h2.WINDOW_UPDATE, 0, sid,
            draw(st.integers(0, 2**32 - 1)).to_bytes(4, "big"))
    if kind == "goaway":
        return h2.pack_frame(
            h2.GOAWAY, 0, 0, blob[:8].ljust(8, b"\0"))
    if kind == "continuation":
        return h2.pack_frame(h2.CONTINUATION, flags, sid, blob)
    if kind == "win0":
        return h2.pack_frame(h2.WINDOW_UPDATE, 0, sid, b"\x00\x00\x00\x00")
    if kind == "settings":
        return h2.pack_frame(h2.SETTINGS, 0, 0, b"") * draw(
            st.integers(1, 20))  # flood
    if kind == "settings_junk":
        return h2.pack_frame(h2.SETTINGS, 0, 0, blob)
    if kind == "headers_junk":
        return h2.pack_frame(h2.HEADERS, flags, sid, blob)
    if kind == "data_nostream":
        return h2.pack_frame(h2.DATA, flags, sid, blob)
    if kind == "ping":
        return h2.pack_frame(h2.PING, flags, 0, blob[:8].ljust(8, b"\0"))
    if kind == "rst":
        return h2.pack_frame(h2.RST_STREAM, 0, sid, b"\x00\x00\x00\x01")
    if kind == "priority":
        return h2.pack_frame(h2.PRIORITY, 0, sid, blob[:5].ljust(5, b"\0"))
    if kind == "unknown":
        return h2.pack_frame(draw(st.integers(0x0A, 0xFF)), flags, sid, blob)
    # giant: header DECLARES an oversized payload but sends little
    return (len(blob) + 1_000_000).to_bytes(3, "big") + bytes(
        [h2.DATA, 0]) + sid.to_bytes(4, "big") + blob


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.data())
def test_h2_adversarial_frame_streams_never_hang(echo_server, data):
    # one shared server across examples is intentional: each example opens
    # its own connection; the thread-leak assertion is per-connection
    """Property: ANY sequence of hostile frames after a valid preface
    either keeps the connection alive (benign subset) or ends it with a
    best-effort GOAWAY + close — never a hung server thread, and the
    listener always serves the NEXT connection."""
    import struct as _struct
    import threading

    frames = [
        _adversarial_frame(data.draw) for _ in range(data.draw(st.integers(1, 8)))
    ]
    baseline = threading.active_count()
    s = _connect(echo_server.port)
    saw_goaway = False
    try:
        s.sendall(h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b""))
        try:
            for f in frames:
                s.sendall(f)
            # half-close our side: the server must answer and/or close,
            # never block forever waiting on more of our bytes
            s.shutdown(1)
        except OSError:
            # the server already closed on a fatal frame — a legitimate
            # outcome; fall through to the drain + liveness assertions
            pass
        s.settimeout(15)
        buf = bytearray()
        while True:
            try:
                chunk = s.recv(65536)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            if len(buf) > 4 << 20:
                break
        # scan the response stream for a GOAWAY frame
        off = 0
        while off + 9 <= len(buf):
            ln = int.from_bytes(buf[off:off + 3], "big")
            ftype = buf[off + 3]
            if ftype == h2.GOAWAY:
                saw_goaway = True
                code = _struct.unpack_from(">I", buf, off + 9 + 4)[0]
                assert code in (0x0, 0x1)  # NO_ERROR / PROTOCOL_ERROR
            off += 9 + ln
    finally:
        s.close()
    # no leaked handler/connection threads once the socket is gone
    for _ in range(100):
        if threading.active_count() <= baseline:
            break
        import time
        time.sleep(0.05)
    assert threading.active_count() <= baseline + 1
    # the listener still serves a fresh, conforming connection
    ch = g.GrpcChannel("127.0.0.1", echo_server.port)
    try:
        r = ch.unary("/t.S/Echo", {"name": "alive", "n": 1}, REQ, RESP)
        assert r["echo"] == "alive"
    finally:
        ch.close()


def test_h2_zero_increment_window_update_stream0_is_fatal(echo_server):
    """Zero-increment WINDOW_UPDATE on stream 0 is PROTOCOL_ERROR
    (RFC 9113 §6.9): connection answers GOAWAY and closes."""
    import struct as _struct

    s = _connect(echo_server.port)
    try:
        s.sendall(h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b""))
        s.sendall(h2.pack_frame(h2.WINDOW_UPDATE, 0, 0, b"\x00\x00\x00\x00"))
        s.settimeout(10)
        buf = bytearray()
        while True:
            try:
                chunk = s.recv(65536)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
        off, saw = 0, False
        while off + 9 <= len(buf):
            ln = int.from_bytes(buf[off:off + 3], "big")
            if buf[off + 3] == h2.GOAWAY:
                saw = True
                assert _struct.unpack_from(">I", buf, off + 13)[0] == 0x1
            off += 9 + ln
        assert saw, "expected GOAWAY(PROTOCOL_ERROR)"
    finally:
        s.close()


def test_h2_zero_increment_window_update_idle_stream_is_fatal(echo_server):
    """Zero-increment WINDOW_UPDATE on a stream the client never opened:
    RST_STREAM there would itself violate §5.1 (no RST on idle), so the
    server must treat it as connection-fatal — GOAWAY, never RST."""
    s = _connect(echo_server.port)
    try:
        s.sendall(h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b""))
        s.sendall(h2.pack_frame(h2.WINDOW_UPDATE, 0, 7, b"\x00\x00\x00\x00"))
        s.settimeout(10)
        buf = bytearray()
        while True:
            try:
                chunk = s.recv(65536)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
        off, saw_goaway, saw_rst = 0, False, False
        while off + 9 <= len(buf):
            ln = int.from_bytes(buf[off:off + 3], "big")
            if buf[off + 3] == h2.GOAWAY:
                saw_goaway = True
            if buf[off + 3] == h2.RST_STREAM:
                saw_rst = True
            off += 9 + ln
        assert saw_goaway and not saw_rst
    finally:
        s.close()


def test_grpc_streaming_deadline_enforced(echo_server):
    """Server-streaming RPCs honor grpc-timeout like unary ones: a zero
    timeout never invokes the handler, and a deadline hit mid-stream
    ends with DEADLINE_EXCEEDED trailers, not a stale OK."""
    ch = g.GrpcChannel("127.0.0.1", echo_server.port)
    try:
        with pytest.raises(g.GrpcError) as ei:
            ch.server_streaming("/t.S/Stream", {"name": "x", "n": 3},
                                REQ, RESP, metadata=[("grpc-timeout", "0S")])
        assert ei.value.code == g.DEADLINE_EXCEEDED
        # generous deadline: the stream completes OK
        msgs = ch.server_streaming("/t.S/Stream", {"name": "x", "n": 3},
                                   REQ, RESP, metadata=[("grpc-timeout", "30S")])
        assert len(msgs) == 3
    finally:
        ch.close()


def test_h2_zero_increment_on_closed_stream_tolerated(echo_server):
    """Zero-increment WINDOW_UPDATE on a CLOSED stream (a completed RPC's
    sid) is ignored per RFC 9113 5.1 — the connection, and other
    in-flight streams, survive."""
    ch = g.GrpcChannel("127.0.0.1", echo_server.port)
    try:
        r1 = ch.unary("/t.S/Echo", {"name": "one", "n": 1}, REQ, RESP)
        assert r1["echo"] == "one"
        # stream 1 is now closed server-side; poke it with a zero update
        # through the SAME connection the channel holds
        conn = ch._client
        conn._write(h2.pack_frame(h2.WINDOW_UPDATE, 0, 1, b"\x00\x00\x00\x00"))
        # the connection must still serve the next RPC
        r2 = ch.unary("/t.S/Echo", {"name": "two", "n": 2}, REQ, RESP)
        assert r2["echo"] == "two"
    finally:
        ch.close()


def test_h2_idle_connection_reclaimed():
    """A peer that connects and sends nothing (slowloris / dead client)
    must not pin a frame-loop thread forever: the per-recv idle timeout
    closes the connection."""
    import socket as _socket
    import time as _time

    from seqspark.wire import h2

    srv = h2.H2Server(lambda headers, body: ([(":status", "200")], None, []),
                      idle_timeout_s=1.0).start()
    try:
        # count THIS server's connection threads by name — the global
        # active_count races unrelated suite threads (flaky under a
        # full-suite run)
        def conn_threads():
            return sum(1 for t in threading.enumerate()
                       if t.name == f"h2-conn-{srv.port}")

        socks = [_socket.create_connection(("127.0.0.1", srv.port))
                 for _ in range(4)]
        deadline = _time.time() + 5
        while _time.time() < deadline and conn_threads() < 4:
            _time.sleep(0.05)
        assert conn_threads() >= 4
        deadline = _time.time() + 10
        while _time.time() < deadline:
            if conn_threads() == 0:
                break
            _time.sleep(0.1)
        assert conn_threads() == 0  # all reclaimed
        for s in socks:
            # server closed its side: recv yields EOF (or reset)
            s.settimeout(2)
            try:
                assert s.recv(64) == b""
            except OSError:
                pass
            s.close()
    finally:
        srv.stop()


def test_h2_flow_stalled_stream_aborted(echo_server, monkeypatch):
    """A peer that opens a window-0 stream and never grants flow-control
    credit must not park a handler thread forever (a parked handler keeps
    _busy high, which would suppress the idle timeout): the stall bound
    ends the stream with RST(FLOW_CONTROL_ERROR)."""
    monkeypatch.setattr(h2, "SEND_STALL_LIMIT_S", 1.0)
    s = _connect(echo_server.port)
    try:
        # window-0 connection: the server may send HEADERS but no DATA
        s.sendall(h2.PREFACE + h2.pack_frame(
            h2.SETTINGS, 0, 0, struct.pack(">HI", 0x4, 0)
        ))
        enc = hpack.Encoder()
        block = enc.encode([
            (":method", "POST"), (":scheme", "http"),
            (":authority", "t"), (":path", "/t.S/Big"),
            ("content-type", "application/grpc"), ("te", "trailers"),
        ])
        s.sendall(h2.pack_frame(h2.HEADERS, h2.FLAG_END_HEADERS, 1, block))
        msg = pb.encode(REQ, {"name": "x", "n": 20, "vals": []})
        body = b"\x00" + struct.pack(">I", len(msg)) + msg
        s.sendall(h2.pack_frame(h2.DATA, h2.FLAG_END_STREAM, 1, body))
        # then total silence: no WINDOW_UPDATE ever
        s.settimeout(15)
        buf = bytearray()
        saw_rst = False
        while not saw_rst:
            try:
                chunk = s.recv(65536)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            off = 0
            while off + 9 <= len(buf):
                ln = int.from_bytes(buf[off:off + 3], "big")
                if off + 9 + ln > len(buf):
                    break
                if buf[off + 3] == h2.RST_STREAM:
                    saw_rst = True
                    code = struct.unpack_from(">I", buf, off + 9)[0]
                    assert code == 0x3  # FLOW_CONTROL_ERROR
                off += 9 + ln
        assert saw_rst, "expected RST_STREAM(FLOW_CONTROL_ERROR)"
    finally:
        s.close()
    # the connection still serves a conforming client afterwards
    ch = g.GrpcChannel("127.0.0.1", echo_server.port)
    try:
        r = ch.unary("/t.S/Echo", {"name": "ok", "n": 1, "vals": []}, REQ, RESP)
        assert r["echo"] == "ok"
    finally:
        ch.close()

def test_h2_two_stream_dead_peer_unwinds_and_busy_drains(
    echo_server, monkeypatch
):
    """End-to-end regression for the ABBA deadlock class at the SOCKET
    level (the unit test below pins the lock ordering; this drives the
    real frame loop): a peer opens TWO streaming downloads on a window-0
    connection and goes completely silent — never reads, never writes.
    Both parked handler threads must unwind within the stall bound and
    ``_busy`` must drain to 0, so the idle timeout can later reclaim the
    connection instead of being suppressed forever."""
    import time as _time

    monkeypatch.setattr(h2, "SEND_STALL_LIMIT_S", 1.0)
    conns = []
    orig_conn = h2._Conn

    class _Capturing(orig_conn):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            conns.append(self)

    monkeypatch.setattr(h2, "_Conn", _Capturing)

    s = _connect(echo_server.port)
    try:
        # window-0 connection: HEADERS flow out, DATA never can
        s.sendall(h2.PREFACE + h2.pack_frame(
            h2.SETTINGS, 0, 0, struct.pack(">HI", 0x4, 0)
        ))
        enc = hpack.Encoder()
        for sid in (1, 3):
            block = enc.encode([
                (":method", "POST"), (":scheme", "http"),
                (":authority", "t"), (":path", "/t.S/Big"),
                ("content-type", "application/grpc"), ("te", "trailers"),
            ])
            s.sendall(h2.pack_frame(h2.HEADERS, h2.FLAG_END_HEADERS, sid, block))
            msg = pb.encode(REQ, {"name": "x", "n": 50, "vals": []})
            body = b"\x00" + struct.pack(">I", len(msg)) + msg
            s.sendall(h2.pack_frame(h2.DATA, h2.FLAG_END_STREAM, sid, body))
        # dead peer: no reads, no writes, socket stays open

        deadline = _time.time() + 10
        conn = None
        while _time.time() < deadline and conn is None:
            conn = next((c for c in conns), None)
            _time.sleep(0.02)
        assert conn is not None, "server never accepted the connection"
        # both handler threads must have started...
        while _time.time() < deadline and conn._busy < 2:
            _time.sleep(0.02)
        assert conn._busy == 2, f"expected 2 parked handlers, got {conn._busy}"
        # now the peer DIES hard (TCP RST via SO_LINGER 0) while both
        # handlers sit in the stall loop: their RST_STREAM sends hit
        # OSError and take _write's teardown — the exact interleaving
        # that used to deadlock against the other handler holding _flow
        import socket as _socket

        s.setsockopt(
            _socket.SOL_SOCKET, _socket.SO_LINGER,
            struct.pack("ii", 1, 0),
        )
        s.close()
        # both must unwind (old bug: the RST send of one stream
        # deadlocked against the teardown of the other and _busy never
        # drained, suppressing the idle timeout forever)
        deadline = _time.time() + 15
        while _time.time() < deadline and conn._busy > 0:
            _time.sleep(0.05)
        assert conn._busy == 0, f"_busy stuck at {conn._busy}: handlers parked"
        # frame loop tore down too (serve()'s finally flags _closed)
        while _time.time() < deadline and not conn._closed:
            _time.sleep(0.05)
        assert conn._closed, "frame loop never tore the connection down"
    finally:
        try:
            s.close()
        except OSError:
            pass


def test_h2_write_teardown_no_abba_deadlock():
    """Regression: _write's OSError teardown used to acquire _flow while
    still holding _write_lock, while _send_data's stall-abort sent
    RST_STREAM (→ _write_lock) while holding _flow. A dead peer with two
    in-flight streaming responses deadlocked both threads permanently.
    Reproduce the exact interleaving with a socket that parks one sender
    mid-sendall and then dies: both threads must unwind promptly."""
    entered = threading.Event()
    release = threading.Event()

    class DeadSock:
        def __init__(self):
            self.first = True

        def sendall(self, data):
            if self.first:
                self.first = False
                entered.set()
                release.wait(timeout=10)
            raise OSError("broken pipe")

        def close(self):
            pass

    conn = h2._Conn(DeadSock(), lambda headers, body: ([], None, []))
    done = []

    def writer():  # thread B: parked mid-sendall holding _write_lock
        try:
            conn._write(b"frame-1")
        except ConnectionError:
            done.append("writer")

    def flow_holder():  # thread A: holds _flow, then needs _write_lock
        with conn._flow:
            release.set()  # let B's sendall raise while A wants the lock
            try:
                conn.send_frame(h2.RST_STREAM, 0, 1, struct.pack(">I", 0x3))
            except ConnectionError:
                done.append("flow_holder")

    tb = threading.Thread(target=writer, daemon=True)
    tb.start()
    assert entered.wait(timeout=10)
    ta = threading.Thread(target=flow_holder, daemon=True)
    ta.start()
    tb.join(timeout=15)
    ta.join(timeout=15)
    assert not tb.is_alive() and not ta.is_alive(), "ABBA deadlock"
    assert sorted(done) == ["flow_holder", "writer"]
    assert conn._closed


# ---------------------------------------------------------------- round 11
# h2-over-TLS (RFC 7540 §3.3: ALPN "h2") — the stdlib-ssl mode behind
# --tls-cert/--tls-key. The reference deploys without TLS (its compose
# files configure none), so cleartext h2c stays the default; this pins
# that the TLS path carries the identical gRPC framing.


@pytest.fixture(scope="module")
def tls_pair(tmp_path_factory):
    import shutil
    import subprocess

    if shutil.which("openssl") is None:
        pytest.skip("openssl CLI unavailable to mint a test cert")
    d = tmp_path_factory.mktemp("tls")
    cert, key = str(d / "cert.pem"), str(d / "key.pem")
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
            "-keyout", key, "-out", cert, "-days", "2", "-subj",
            "/CN=localhost",
            "-addext", "subjectAltName=DNS:localhost,IP:127.0.0.1",
        ],
        check=True, capture_output=True,
    )
    return cert, key


@pytest.fixture()
def tls_echo_server(tls_pair):
    cert, key = tls_pair

    def echo(req, md):
        return {"echo": req["name"], "sum": float(req["n"])}

    def stream(req, md):
        for i in range(req["n"]):
            yield {"echo": f"{req['name']}-{i}", "sum": float(i)}

    srv = g.GrpcServer(
        {
            "/t.S/Echo": g.Method(echo, REQ, RESP),
            "/t.S/Stream": g.Method(stream, REQ, RESP, server_streaming=True),
        },
        tls_cert=cert, tls_key=key,
    ).start()
    yield srv, cert
    srv.stop()


def test_grpc_over_tls_unary_and_stream(tls_echo_server):
    srv, cert = tls_echo_server
    ch = g.GrpcChannel("127.0.0.1", srv.port, tls_ca=cert)
    try:
        resp = ch.unary("/t.S/Echo", {"name": "secure", "n": 3, "vals": []},
                        REQ, RESP)
        assert resp["echo"] == "secure" and resp["sum"] == 3.0
        got = list(ch.server_streaming(
            "/t.S/Stream", {"name": "s", "n": 4, "vals": []}, REQ, RESP))
        assert [r["echo"] for r in got] == ["s-0", "s-1", "s-2", "s-3"]
    finally:
        ch.close()


def test_tls_server_rejects_cleartext_and_untrusting_clients(tls_echo_server):
    import ssl

    srv, cert = tls_echo_server
    # a cleartext h2c client against the TLS listener must fail the
    # connection, not hang or crash the server
    with pytest.raises((ConnectionError, OSError)):
        ch = g.GrpcChannel("127.0.0.1", srv.port)
        try:
            ch.unary("/t.S/Echo", {"name": "x", "n": 1, "vals": []}, REQ, RESP)
        finally:
            ch.close()
    # a verifying client without the CA must refuse the self-signed cert
    with pytest.raises((ssl.SSLError, ConnectionError, OSError)):
        g.GrpcChannel("127.0.0.1", srv.port, tls_ca=True)
    # and the server is still healthy afterwards
    ch = g.GrpcChannel("127.0.0.1", srv.port, tls_ca=cert)
    try:
        assert ch.unary("/t.S/Echo", {"name": "ok", "n": 1, "vals": []},
                        REQ, RESP)["echo"] == "ok"
    finally:
        ch.close()


def test_java_httpclient_interop_over_tls(spark, tls_pair):
    """REAL third-party h2-over-TLS interop: the JDK HttpClient performs
    the TLS handshake + ALPN h2 negotiation against our stdlib-ssl
    listener and speaks native h2 streams over it — trust for the test
    cert is built JVM-side (KeyStore + TrustManagerFactory), no
    environment flags."""
    cert_path, key = tls_pair

    def app(headers, body):
        hmap = dict(headers)
        resp = ("tls-echo:" + body.decode()
                + "|scheme:" + hmap.get(":scheme", "")).encode()
        return [(":status", "200"), ("content-type", "text/plain")], [resp], []

    srv = h2.H2Server(app, tls_cert=cert_path, tls_key=key).start()
    try:
        jvm = spark._jvm
        KeyStore = jvm.java.security.KeyStore
        ks = KeyStore.getInstance(KeyStore.getDefaultType())
        ks.load(None, None)
        cf = jvm.java.security.cert.CertificateFactory.getInstance("X.509")
        fis = jvm.java.io.FileInputStream(cert_path)
        ks.setCertificateEntry("test-ca", cf.generateCertificate(fis))
        fis.close()
        tmf = jvm.javax.net.ssl.TrustManagerFactory.getInstance(
            jvm.javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm())
        tmf.init(ks)
        ctx = jvm.javax.net.ssl.SSLContext.getInstance("TLS")
        ctx.init(None, tmf.getTrustManagers(), None)
        client = (
            jvm.java.net.http.HttpClient.newBuilder()
            .version(jvm.java.net.http.HttpClient.Version.HTTP_2)
            .sslContext(ctx)
            .build()
        )
        BodyPublishers = jvm.java.net.http.HttpRequest.BodyPublishers
        BodyHandlers = jvm.java.net.http.HttpResponse.BodyHandlers
        req = (
            jvm.java.net.http.HttpRequest.newBuilder(
                jvm.java.net.URI.create(f"https://localhost:{srv.port}/t"))
            .POST(BodyPublishers.ofString("from-java-tls"))
            .build()
        )
        r = client.send(req, BodyHandlers.ofString())
        assert r.version().toString() == "HTTP_2"  # ALPN picked h2
        assert r.statusCode() == 200
        assert r.body() == "tls-echo:from-java-tls|scheme:https"
    finally:
        srv.stop()


def test_tls_concurrent_multiplexed_streams(tls_echo_server):
    # the _SerializedTLSSocket shim under real contention: 8 threads
    # multiplex unary + streaming calls over ONE TLS connection while the
    # channel's reader thread runs — the exact concurrent-read/write shape
    # that corrupted raw SSLSocket state ~50% of the time pre-shim
    srv, cert = tls_echo_server
    ch = g.GrpcChannel("127.0.0.1", srv.port, tls_ca=cert)
    errors = []

    def worker(i):
        try:
            for j in range(5):
                r = ch.unary(
                    "/t.S/Echo", {"name": f"w{i}-{j}", "n": j, "vals": []},
                    REQ, RESP)
                assert r["echo"] == f"w{i}-{j}"
                got = list(ch.server_streaming(
                    "/t.S/Stream", {"name": f"s{i}", "n": 6, "vals": []},
                    REQ, RESP))
                assert [x["echo"] for x in got] == [
                    f"s{i}-{k}" for k in range(6)]
        except Exception as e:  # noqa: BLE001 — collected for the assert
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    ch.close()
    assert not errors, errors


# ---------------------------------------------------------------- round 12
# h2spec-flavored adversarial conformance: hostile peers against wire/h2.py.
# The reference outsources this layer to grpc-go (`network/grpcutil/`); our
# hand-rolled stack owns it, so each hostile shape gets an explicit pin.


def _std_block(enc, path="/t.S/Echo"):
    return enc.encode([
        (":method", "POST"), (":scheme", "http"), (":path", path),
        (":authority", "x"), ("content-type", "application/grpc"),
        ("te", "trailers"),
    ])


def _drain_all(s, timeout=10, cap=4 << 20):
    s.settimeout(timeout)
    buf = bytearray()
    while True:
        try:
            chunk = s.recv(65536)
        except OSError:
            break
        if not chunk:
            break
        buf += chunk
        if len(buf) > cap:
            break
    return bytes(buf)


def _frames_of(buf):
    out, off = [], 0
    while off + 9 <= len(buf):
        ln = int.from_bytes(buf[off:off + 3], "big")
        out.append((buf[off + 3], buf[off + 4],
                    int.from_bytes(buf[off + 5:off + 9], "big") & 0x7FFFFFFF,
                    buf[off + 9:off + 9 + ln]))
        off += 9 + ln
    return out


def _goaway_codes(buf):
    return [
        struct.unpack_from(">I", p, 4)[0]
        for (t, _f, _sid, p) in _frames_of(buf) if t == h2.GOAWAY
    ]


def _assert_server_alive(port):
    ch = g.GrpcChannel("127.0.0.1", port)
    try:
        assert ch.unary("/t.S/Echo", {"name": "alive", "n": 0},
                        REQ, RESP)["echo"] == "alive"
    finally:
        ch.close()


def test_h2_interleaved_frame_during_continuation_is_fatal(echo_server):
    """RFC 9113 §6.2: a header block in progress admits ONLY CONTINUATION
    frames — interleaving any other frame (here a PING) is a connection
    error, answered GOAWAY(PROTOCOL_ERROR)."""
    enc = hpack.Encoder()
    s = _connect(echo_server.port)
    try:
        block = _std_block(enc)
        s.sendall(
            h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b"")
            + h2.pack_frame(h2.HEADERS, 0, 1, block[: len(block) // 2])
            + h2.pack_frame(h2.PING, 0, 0, b"\0" * 8)
        )
        assert 0x1 in _goaway_codes(_drain_all(s))
    finally:
        s.close()
    _assert_server_alive(echo_server.port)


def test_h2_continuation_on_wrong_stream_is_fatal(echo_server):
    enc = hpack.Encoder()
    s = _connect(echo_server.port)
    try:
        block = _std_block(enc)
        s.sendall(
            h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b"")
            + h2.pack_frame(h2.HEADERS, 0, 1, block[: len(block) // 2])
            + h2.pack_frame(h2.CONTINUATION, h2.FLAG_END_HEADERS, 3,
                            block[len(block) // 2:])
        )
        assert 0x1 in _goaway_codes(_drain_all(s))
    finally:
        s.close()
    _assert_server_alive(echo_server.port)


def test_h2_continuation_without_headers_is_fatal(echo_server):
    """A CONTINUATION with no header block in progress is PROTOCOL_ERROR."""
    enc = hpack.Encoder()
    s = _connect(echo_server.port)
    try:
        s.sendall(
            h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b"")
            + h2.pack_frame(h2.CONTINUATION, h2.FLAG_END_HEADERS, 1,
                            _std_block(enc))
        )
        assert 0x1 in _goaway_codes(_drain_all(s))
    finally:
        s.close()
    _assert_server_alive(echo_server.port)


def _lit_str(s: str) -> bytes:
    return hpack.encode_int(len(s), 7, 0x00) + s.encode()


def _grpc_exchange(s, sid, block, body, dec):
    s.sendall(
        h2.pack_frame(h2.HEADERS, h2.FLAG_END_HEADERS, sid, block)
        + h2.pack_frame(h2.DATA, h2.FLAG_END_STREAM, sid, body)
    )
    data = bytearray()
    while True:
        ftype, flags, fsid, payload = h2.read_frame(s)
        if fsid != sid:
            continue
        if ftype == h2.DATA:
            data += payload
        elif ftype == h2.HEADERS:
            headers = dec.decode(payload)
            if any(k == "grpc-status" for k, _v in headers):
                assert ("grpc-status", "0") in headers
                return bytes(data)


def test_h2_hpack_dynamic_table_update_mid_connection(echo_server):
    """The server's HPACK decoder must honor §6.3 size updates and
    literal-with-incremental-indexing state ACROSS requests on one
    connection: request 1 indexes ('x-extra', '!') into the dynamic
    table; request 2 references it by dynamic index 62; request 3 shrinks
    the table to 0 mid-block and a stale index is then a decode error
    answered GOAWAY (COMPRESSION_ERROR is connection-fatal)."""
    enc = hpack.Encoder()
    dec = hpack.Decoder()
    s = _connect(echo_server.port)
    try:
        s.sendall(h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b""))
        body = g.frame_message(pb.encode(REQ, {"name": "dyn", "n": 1}))
        # size update to 512 + incremental literal ('x-extra', '!')
        block1 = (
            hpack.encode_int(512, 5, 0x20)
            + hpack.encode_int(0, 6, 0x40) + _lit_str("x-extra") + _lit_str("!")
            + _std_block(enc)
        )
        out1 = _grpc_exchange(s, 1, block1, body, dec)
        msg1 = pb.decode(RESP, list(g.iter_messages(out1))[0])
        assert msg1["echo"] == "dyn!"  # the handler saw the literal
        # dynamic index 62 == the entry indexed by request 1
        block2 = _std_block(enc) + hpack.encode_int(62, 7, 0x80)
        out2 = _grpc_exchange(s, 3, block2, body, dec)
        msg2 = pb.decode(RESP, list(g.iter_messages(out2))[0])
        assert msg2["echo"] == "dyn!"  # decoded from the DYNAMIC table
        # shrink to 0 (evicts), then reference the evicted entry
        block3 = (
            hpack.encode_int(0, 5, 0x20) + _std_block(enc)
            + hpack.encode_int(62, 7, 0x80)
        )
        s.sendall(
            h2.pack_frame(h2.HEADERS, h2.FLAG_END_HEADERS, 5, block3)
            + h2.pack_frame(h2.DATA, h2.FLAG_END_STREAM, 5, body)
        )
        assert 0x1 in _goaway_codes(_drain_all(s))
    finally:
        s.close()
    _assert_server_alive(echo_server.port)


def test_h2_settings_window_shrink_negative_then_recovers(echo_server):
    """RFC 9113 §6.9.2: a SETTINGS_INITIAL_WINDOW_SIZE decrease applies
    retroactively to OPEN streams and may drive a send window negative;
    the server must stall (never violate the window) and resume exactly
    where it stopped once SETTINGS raise the window again."""
    import time as _time

    enc = hpack.Encoder()
    dec = hpack.Decoder()
    s = _connect(echo_server.port)
    try:
        # tiny initial window: the server may send at most 6 bytes
        s.sendall(h2.PREFACE + h2.pack_frame(
            h2.SETTINGS, 0, 0,
            struct.pack(">HI", h2.SETTINGS_INITIAL_WINDOW_SIZE, 6)))
        body = g.frame_message(pb.encode(REQ, {"name": "s", "n": 3}))
        s.sendall(
            h2.pack_frame(h2.HEADERS, h2.FLAG_END_HEADERS, 1,
                          _std_block(enc, "/t.S/Stream"))
            + h2.pack_frame(h2.DATA, h2.FLAG_END_STREAM, 1, body)
        )
        data = bytearray()
        # drain response HEADERS + the first <=6 window-limited bytes
        got_first = False
        while not got_first:
            ftype, flags, sid, payload = h2.read_frame(s)
            if ftype == h2.DATA and sid == 1 and payload:
                assert len(payload) <= 6
                data += payload
                got_first = True
        # shrink to 0: stream window goes NEGATIVE (6 - consumed - 6 < 0)
        s.sendall(h2.pack_frame(
            h2.SETTINGS, 0, 0,
            struct.pack(">HI", h2.SETTINGS_INITIAL_WINDOW_SIZE, 0)))
        s.settimeout(0.5)
        stalled = True
        try:
            ftype, flags, sid, payload = h2.read_frame(s)
            # SETTINGS ACK / WINDOW_UPDATE may still arrive; DATA must not
            if ftype == h2.DATA and payload:
                stalled = False
        except OSError:
            pass
        assert stalled, "server sent DATA into a non-positive window"
        # recover: window large, drain the whole stream
        s.settimeout(15)
        s.sendall(h2.pack_frame(
            h2.SETTINGS, 0, 0,
            struct.pack(">HI", h2.SETTINGS_INITIAL_WINDOW_SIZE, 1 << 20)))
        done = False
        while not done:
            ftype, flags, sid, payload = h2.read_frame(s)
            if sid != 1:
                continue
            if ftype == h2.DATA:
                data += payload
            elif ftype == h2.HEADERS:
                headers = dec.decode(payload)
                if any(k == "grpc-status" for k, _v in headers):
                    assert ("grpc-status", "0") in headers
                    done = True
        msgs = [pb.decode(RESP, m) for m in g.iter_messages(bytes(data))]
        assert [m["echo"] for m in msgs] == ["s-0", "s-1", "s-2"]
    finally:
        s.close()


def test_h2_padded_headers_and_data_accepted(echo_server):
    """PADDED flag on HEADERS and DATA: padding strips, the request still
    parses, and flow accounting covers the padded length."""
    enc = hpack.Encoder()
    dec = hpack.Decoder()
    s = _connect(echo_server.port)
    try:
        s.sendall(h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b""))
        block = _std_block(enc)
        body = g.frame_message(pb.encode(REQ, {"name": "pad", "n": 1}))
        padded_headers = bytes([4]) + block + b"\0" * 4
        padded_data = bytes([7]) + body + b"\0" * 7
        s.sendall(
            h2.pack_frame(h2.HEADERS,
                          h2.FLAG_END_HEADERS | h2.FLAG_PADDED, 1,
                          padded_headers)
            + h2.pack_frame(h2.DATA, h2.FLAG_END_STREAM | h2.FLAG_PADDED, 1,
                            padded_data)
        )
        data = bytearray()
        while True:
            ftype, flags, sid, payload = h2.read_frame(s)
            if sid != 1:
                continue
            if ftype == h2.DATA:
                data += payload
            elif ftype == h2.HEADERS:
                headers = dec.decode(payload)
                if any(k == "grpc-status" for k, _v in headers):
                    assert ("grpc-status", "0") in headers
                    break
        msg = pb.decode(RESP, list(g.iter_messages(bytes(data)))[0])
        assert msg["echo"] == "pad"
    finally:
        s.close()


def test_h2_padding_exceeding_frame_is_fatal(echo_server):
    enc = hpack.Encoder()
    s = _connect(echo_server.port)
    try:
        block = _std_block(enc)
        # pad length byte >= the whole payload: PROTOCOL_ERROR
        s.sendall(
            h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b"")
            + h2.pack_frame(h2.HEADERS,
                            h2.FLAG_END_HEADERS | h2.FLAG_PADDED, 1,
                            bytes([255]) + block)
        )
        assert 0x1 in _goaway_codes(_drain_all(s))
    finally:
        s.close()
    _assert_server_alive(echo_server.port)


def test_h2_settings_ack_with_payload_is_fatal(echo_server):
    s = _connect(echo_server.port)
    try:
        s.sendall(
            h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b"")
            + h2.pack_frame(h2.SETTINGS, h2.FLAG_ACK, 0, b"\0" * 6)
        )
        assert 0x1 in _goaway_codes(_drain_all(s))
    finally:
        s.close()
    _assert_server_alive(echo_server.port)


def test_h2_settings_bad_length_is_fatal(echo_server):
    """SETTINGS payload not a multiple of 6 (RFC 9113 §6.5): silently
    applying a prefix would desync which settings took effect."""
    s = _connect(echo_server.port)
    try:
        s.sendall(
            h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b"")
            + h2.pack_frame(h2.SETTINGS, 0, 0, b"\0" * 5)
        )
        assert 0x1 in _goaway_codes(_drain_all(s))
    finally:
        s.close()
    _assert_server_alive(echo_server.port)


def test_h2_oversized_settings_frame_is_fatal(echo_server):
    s = _connect(echo_server.port)
    try:
        s.sendall(
            h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b"")
            + h2.pack_frame(h2.SETTINGS, 0, 0, b"\0" * (h2.MAX_RECV_FRAME + 6))
        )
        assert 0x1 in _goaway_codes(_drain_all(s))
    finally:
        s.close()
    _assert_server_alive(echo_server.port)


def test_h2_rst_stream_racing_streaming_response(echo_server):
    """RST_STREAM(CANCEL) against an in-flight streaming response: the
    handler must unwind promptly (no send into a reset stream) and the
    CONNECTION stays fully usable for the next stream."""
    enc = hpack.Encoder()
    dec = hpack.Decoder()
    s = _connect(echo_server.port)
    try:
        s.sendall(h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b""))
        # big stream: 2000 x ~1KB >> the 64 KiB initial window, so the
        # handler is guaranteed to still be mid-send when RST arrives
        body = g.frame_message(pb.encode(REQ, {"name": "b", "n": 2000}))
        s.sendall(
            h2.pack_frame(h2.HEADERS, h2.FLAG_END_HEADERS, 1,
                          _std_block(enc, "/t.S/Big"))
            + h2.pack_frame(h2.DATA, h2.FLAG_END_STREAM, 1, body)
        )
        # read one DATA frame, then cancel mid-response
        while True:
            ftype, flags, sid, payload = h2.read_frame(s)
            if ftype == h2.DATA and sid == 1 and payload:
                break
        s.sendall(h2.pack_frame(h2.RST_STREAM, 0, 1, struct.pack(">I", 0x8)))
        # replenish the CONNECTION window the cancelled stream consumed
        # (a real client keeps accounting for RST'd streams' DATA, §6.9)
        s.sendall(h2.pack_frame(h2.WINDOW_UPDATE, 0, 0,
                                struct.pack(">I", 1 << 30)))
        # the same connection must serve a fresh unary stream; tolerate
        # stale in-flight DATA for stream 1 that raced the RST
        body2 = g.frame_message(pb.encode(REQ, {"name": "after", "n": 1}))
        s.sendall(
            h2.pack_frame(h2.HEADERS, h2.FLAG_END_HEADERS, 3,
                          _std_block(enc))
            + h2.pack_frame(h2.DATA, h2.FLAG_END_STREAM, 3, body2)
        )
        data3 = bytearray()
        while True:
            ftype, flags, sid, payload = h2.read_frame(s)
            if sid != 3:
                continue
            if ftype == h2.DATA:
                data3 += payload
            elif ftype == h2.HEADERS:
                headers = dec.decode(payload)
                if any(k == "grpc-status" for k, _v in headers):
                    assert ("grpc-status", "0") in headers
                    break
        msg = pb.decode(RESP, list(g.iter_messages(bytes(data3)))[0])
        assert msg["echo"] == "after"
    finally:
        s.close()


def test_h2_slow_loris_frame_trickle_bounded():
    """A peer that starts a frame and trickles one byte per just-under-
    the-idle-timeout resets the per-recv timer forever; the whole-frame
    budget must close the connection within ~one extra timeout."""
    import socket as _socket
    import time as _time

    from seqspark.wire import h2 as _h2

    srv = _h2.H2Server(lambda headers, body: ([(":status", "200")], None, []),
                       idle_timeout_s=1.0).start()
    try:
        s = _socket.create_connection(("127.0.0.1", srv.port), timeout=10)
        s.sendall(_h2.PREFACE + _h2.pack_frame(_h2.SETTINGS, 0, 0, b""))
        _time.sleep(0.2)
        # frame header declaring a 64-byte HEADERS payload, then trickle
        head = (64).to_bytes(3, "big") + bytes([_h2.HEADERS, 0]) \
            + (1).to_bytes(4, "big")
        s.sendall(head)
        start = _time.time()
        closed_at = None
        try:
            for _ in range(40):
                s.sendall(b"\0")
                _time.sleep(0.25)
        except OSError:
            closed_at = _time.time() - start
        assert closed_at is not None and closed_at < 6.0, (
            f"trickled frame kept the connection alive {closed_at}"
        )
        s.close()
    finally:
        srv.stop()


def test_h2_slow_loris_connection_start_bounded():
    """Same bound for the connection START sequence (HTTP/1.1 upgrade head
    or preface trickled byte-by-byte)."""
    import socket as _socket
    import time as _time

    from seqspark.wire import h2 as _h2

    srv = _h2.H2Server(lambda headers, body: ([(":status", "200")], None, []),
                       idle_timeout_s=1.0).start()
    try:
        s = _socket.create_connection(("127.0.0.1", srv.port), timeout=10)
        start = _time.time()
        closed_at = None
        try:
            for ch in b"GET / HTTP/1.1\r\nHost: x\r\n" * 4:
                s.sendall(bytes([ch]))
                _time.sleep(0.2)
        except OSError:
            closed_at = _time.time() - start
        assert closed_at is not None and closed_at < 6.0
        s.close()
    finally:
        srv.stop()
