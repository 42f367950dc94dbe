"""HPACK (RFC 7541) header compression — pure stdlib.

Used by :mod:`seqspark.wire.h2` to serve the gRPC transport parity layer
(reference `proxyapi/grpc_v1.go` exposes gRPC; stock gRPC clients speak
HTTP/2, whose headers are always HPACK-coded — grpc-go in particular
Huffman-codes paths like ``/seqproxyapi.v1.SeqProxyApi/Search``).

Implements the full decoder surface a server needs:

- indexed / literal-with-incremental-indexing / literal-without-indexing /
  literal-never-indexed header fields (RFC 7541 §6.2);
- the 61-entry static table (Appendix A) and a size-bounded dynamic table
  with FIFO eviction (§4);
- dynamic table size updates (§6.3);
- Huffman decoding with the Appendix B code.

The Huffman table is reconstructed from the per-symbol CODE LENGTHS via
canonical assignment (codes ordered by (length, symbol), each next code =
(prev+1) << (len-prev_len)) — the construction RFC 7541's published table
follows; completeness is asserted (Kraft sum == 1) and the RFC Appendix C
request vectors pin the result in tests.

The encoder side (used by the in-repo client and tests) emits literal
fields without indexing and optionally Huffman-codes values — enough for
any peer, since HPACK encoders are free to never index (§6.2.2).
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple

# ------------------------------------------------------- Huffman code table

# RFC 7541 Appendix B: bit length of each symbol 0..255 plus EOS (256).
_HUFF_LENGTHS: dict[int, int] = {}


def _set_lengths(length: int, symbols: Iterable[int]) -> None:
    for s in symbols:
        _HUFF_LENGTHS[s] = length


_set_lengths(5, b"012aceiost")
_set_lengths(6, b" %-./3456789=A_bdfghlmnpru")
_set_lengths(7, b":BCDEFGHIJKLMNOPQRSTUVWYjkqvwxyz")
_set_lengths(8, b"&*,;XZ")
_set_lengths(10, b"!\"()?")
_set_lengths(11, b"'+|")
_set_lengths(12, b"#>")
_set_lengths(13, [0x00] + list(b"$@[]~"))
_set_lengths(14, b"^}")
_set_lengths(15, b"<`{")
_set_lengths(19, [0x5C, 195, 208])
_set_lengths(20, [128, 130, 131, 162, 184, 194, 224, 226])
_set_lengths(21, [153, 161, 167, 172, 176, 177, 179, 209, 216, 217, 227, 229, 230])
_set_lengths(
    22,
    [129, 132, 133, 134, 136, 146, 154, 156, 160, 163, 164, 169, 170, 173,
     178, 181, 185, 186, 187, 189, 190, 196, 198, 228, 232, 233],
)
_set_lengths(
    23,
    [1, 135, 137, 138, 139, 140, 141, 143, 147, 149, 150, 151, 152, 155,
     157, 158, 165, 166, 168, 174, 175, 180, 182, 183, 188, 191, 197, 231,
     239],
)
_set_lengths(24, [9, 142, 144, 145, 148, 159, 171, 206, 215, 225, 236, 237])
_set_lengths(25, [199, 207, 234, 235])
_set_lengths(
    26,
    [192, 193, 200, 201, 202, 205, 210, 213, 218, 219, 238, 240, 242, 243,
     255],
)
_set_lengths(
    27,
    [203, 204, 211, 212, 214, 221, 222, 223, 241, 244, 245, 246, 247, 248,
     250, 251, 252, 253, 254],
)
_set_lengths(
    28,
    [2, 3, 4, 5, 6, 7, 8, 11, 12, 14, 15, 16, 17, 18, 19, 20, 21, 23, 24,
     25, 26, 27, 28, 29, 30, 31, 127, 220, 249],
)
_set_lengths(30, [10, 13, 22, 256])


def _build_codes() -> dict[int, Tuple[int, int]]:
    """Canonical assignment -> {symbol: (code, nbits)}."""
    assert len(_HUFF_LENGTHS) == 257, len(_HUFF_LENGTHS)
    # completeness (Kraft equality): the code must tile the bit space
    kraft = sum(1 << (32 - ln) for ln in _HUFF_LENGTHS.values())
    assert kraft == 1 << 32, kraft
    codes: dict[int, Tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for sym in sorted(_HUFF_LENGTHS, key=lambda s: (_HUFF_LENGTHS[s], s)):
        ln = _HUFF_LENGTHS[sym]
        if prev_len:
            code = (code + 1) << (ln - prev_len)
        else:
            code = 0
        codes[sym] = (code, ln)
        prev_len = ln
    return codes


HUFFMAN_CODES = _build_codes()

#: decode tree: nested dict-free binary trie as a flat list of
#: (left, right) int pairs; negative entry = -(symbol+1) leaf
_TRIE: List[List[int]] = [[0, 0]]


def _trie_insert(code: int, nbits: int, symbol: int) -> None:
    node = 0
    for i in range(nbits - 1, -1, -1):
        bit = (code >> i) & 1
        nxt = _TRIE[node][bit]
        if i == 0:
            _TRIE[node][bit] = -(symbol + 1)
            return
        if nxt == 0:
            _TRIE.append([0, 0])
            nxt = len(_TRIE) - 1
            _TRIE[node][bit] = nxt
        node = nxt


for _sym, (_code, _n) in HUFFMAN_CODES.items():
    _trie_insert(_code, _n, _sym)


def huffman_decode(data: bytes) -> bytes:
    """RFC 7541 §5.2: decode, validating EOS/padding rules (padding must
    be the EOS prefix, i.e. all-ones, and strictly shorter than 8 bits)."""
    out = bytearray()
    node = 0
    pad_ones = True
    pad_bits = 0
    for byte in data:
        for i in range(7, -1, -1):
            bit = (byte >> i) & 1
            nxt = _TRIE[node][bit]
            pad_ones = pad_ones and bit == 1
            pad_bits += 1
            if nxt < 0:
                sym = -nxt - 1
                if sym == 256:
                    raise ValueError("huffman: EOS in encoded data")
                out.append(sym)
                node = 0
                pad_ones = True
                pad_bits = 0
            elif nxt == 0 and node == 0 and bit == 0:
                raise ValueError("huffman: invalid code")
            else:
                node = nxt
    if node != 0 and (not pad_ones or pad_bits >= 8):
        raise ValueError("huffman: invalid padding")
    return bytes(out)


def huffman_encode(data: bytes) -> bytes:
    """§5.2 encode: concatenated codes, padded with EOS-prefix ones."""
    acc = 0
    nacc = 0
    out = bytearray()
    for byte in data:
        code, nbits = HUFFMAN_CODES[byte]
        acc = (acc << nbits) | code
        nacc += nbits
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)
    if nacc:
        out.append(((acc << (8 - nacc)) | ((1 << (8 - nacc)) - 1)) & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- static table

#: RFC 7541 Appendix A (1-based index -> (name, value))
STATIC_TABLE: List[Tuple[str, str]] = [
    (":authority", ""),
    (":method", "GET"),
    (":method", "POST"),
    (":path", "/"),
    (":path", "/index.html"),
    (":scheme", "http"),
    (":scheme", "https"),
    (":status", "200"),
    (":status", "204"),
    (":status", "206"),
    (":status", "304"),
    (":status", "400"),
    (":status", "404"),
    (":status", "500"),
    ("accept-charset", ""),
    ("accept-encoding", "gzip, deflate"),
    ("accept-language", ""),
    ("accept-ranges", ""),
    ("accept", ""),
    ("access-control-allow-origin", ""),
    ("age", ""),
    ("allow", ""),
    ("authorization", ""),
    ("cache-control", ""),
    ("content-disposition", ""),
    ("content-encoding", ""),
    ("content-language", ""),
    ("content-length", ""),
    ("content-location", ""),
    ("content-range", ""),
    ("content-type", ""),
    ("cookie", ""),
    ("date", ""),
    ("etag", ""),
    ("expect", ""),
    ("expires", ""),
    ("from", ""),
    ("host", ""),
    ("if-match", ""),
    ("if-modified-since", ""),
    ("if-none-match", ""),
    ("if-range", ""),
    ("if-unmodified-since", ""),
    ("last-modified", ""),
    ("link", ""),
    ("location", ""),
    ("max-forwards", ""),
    ("proxy-authenticate", ""),
    ("proxy-authorization", ""),
    ("range", ""),
    ("referer", ""),
    ("refresh", ""),
    ("retry-after", ""),
    ("server", ""),
    ("set-cookie", ""),
    ("strict-transport-security", ""),
    ("transfer-encoding", ""),
    ("user-agent", ""),
    ("vary", ""),
    ("via", ""),
    ("www-authenticate", ""),
]


# ------------------------------------------------------------ int primitives


def encode_int(value: int, prefix_bits: int, flags: int = 0) -> bytes:
    """§5.1 prefix-coded integer; ``flags`` are the bits above the prefix
    of the FIRST byte (e.g. 0x80 for an indexed field)."""
    limit = (1 << prefix_bits) - 1
    if value < limit:
        return bytes([flags | value])
    out = bytearray([flags | limit])
    value -= limit
    while value >= 0x80:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)
    return bytes(out)


def decode_int(data: bytes, pos: int, prefix_bits: int) -> Tuple[int, int]:
    limit = (1 << prefix_bits) - 1
    if pos >= len(data):
        raise ValueError("hpack: truncated integer")
    value = data[pos] & limit
    pos += 1
    if value < limit:
        return value, pos
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("hpack: truncated integer")
        b = data[pos]
        pos += 1
        value += (b & 0x7F) << shift
        shift += 7
        if not (b & 0x80):
            return value, pos
        if shift > 62:
            raise ValueError("hpack: integer overflow")


def _decode_string(data: bytes, pos: int) -> Tuple[str, int]:
    if pos >= len(data):
        raise ValueError("hpack: truncated string")
    huff = bool(data[pos] & 0x80)
    length, pos = decode_int(data, pos, 7)
    raw = data[pos : pos + length]
    if len(raw) != length:
        raise ValueError("hpack: truncated string body")
    pos += length
    if huff:
        raw = huffman_decode(raw)
    return raw.decode("latin-1"), pos


def _encode_string(s: str, huffman: bool) -> bytes:
    raw = s.encode("latin-1")
    if huffman:
        enc = huffman_encode(raw)
        if len(enc) < len(raw):
            return encode_int(len(enc), 7, 0x80) + enc
    return encode_int(len(raw), 7, 0x00) + raw


# ------------------------------------------------------------------- codecs


class Decoder:
    """Stateful HPACK decoder (one per HTTP/2 connection direction)."""

    def __init__(self, max_table_size: int = 4096):
        self._entries: List[Tuple[str, str]] = []  # newest first
        self._size = 0
        self._max_size = max_table_size
        self._settings_cap = max_table_size

    @staticmethod
    def _entry_size(name: str, value: str) -> int:
        return len(name.encode("latin-1")) + len(value.encode("latin-1")) + 32

    def _evict(self) -> None:
        while self._size > self._max_size and self._entries:
            name, value = self._entries.pop()
            self._size -= self._entry_size(name, value)

    def _add(self, name: str, value: str) -> None:
        self._entries.insert(0, (name, value))
        self._size += self._entry_size(name, value)
        self._evict()

    def _lookup(self, index: int) -> Tuple[str, str]:
        if index <= 0:
            raise ValueError("hpack: index 0")
        if index <= len(STATIC_TABLE):
            return STATIC_TABLE[index - 1]
        dyn = index - len(STATIC_TABLE) - 1
        if dyn >= len(self._entries):
            raise ValueError(f"hpack: index {index} out of table")
        return self._entries[dyn]

    def decode(self, block: bytes) -> List[Tuple[str, str]]:
        headers: List[Tuple[str, str]] = []
        pos = 0
        while pos < len(block):
            b = block[pos]
            if b & 0x80:  # §6.1 indexed
                index, pos = decode_int(block, pos, 7)
                headers.append(self._lookup(index))
            elif b & 0x40:  # §6.2.1 literal, incremental indexing
                index, pos = decode_int(block, pos, 6)
                name = self._lookup(index)[0] if index else None
                if name is None:
                    name, pos = _decode_string(block, pos)
                value, pos = _decode_string(block, pos)
                self._add(name, value)
                headers.append((name, value))
            elif b & 0x20:  # §6.3 dynamic table size update
                size, pos = decode_int(block, pos, 5)
                if size > self._settings_cap:
                    raise ValueError("hpack: table size above SETTINGS cap")
                self._max_size = size
                self._evict()
            else:  # §6.2.2 / §6.2.3 literal, not indexed
                index, pos = decode_int(block, pos, 4)
                name = self._lookup(index)[0] if index else None
                if name is None:
                    name, pos = _decode_string(block, pos)
                value, pos = _decode_string(block, pos)
                headers.append((name, value))
        return headers


class Encoder:
    """Stateless HPACK encoder: static-table indexed fields where an exact
    (name, value) match exists, literal-without-indexing otherwise.
    Never growing the dynamic table keeps both peers' state trivially in
    sync (an encoder is free to never index, §6.2.2)."""

    _static_full = {pair: i + 1 for i, pair in enumerate(STATIC_TABLE)}
    _static_name = {}
    for _i, (_n, _v) in enumerate(STATIC_TABLE):
        _static_name.setdefault(_n, _i + 1)

    def __init__(self, huffman: bool = True):
        self._huffman = huffman

    def encode(self, headers: Iterable[Tuple[str, str]]) -> bytes:
        out = bytearray()
        for name, value in headers:
            full = self._static_full.get((name, value))
            if full:
                out += encode_int(full, 7, 0x80)
                continue
            name_idx = self._static_name.get(name)
            if name_idx:
                out += encode_int(name_idx, 4, 0x00)
            else:
                out += encode_int(0, 4, 0x00)
                out += _encode_string(name, self._huffman)
            out += _encode_string(value, self._huffman)
        return bytes(out)
