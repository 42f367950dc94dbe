"""Pure-Python WebP-lossless (VP8L) codec — the r15 pixel tier under
``multimodal.decode_assets`` for ``VP8L`` bitstreams (the r14 WebP
support was header-only; lossy ``VP8 `` still honestly raises — it
needs a boolean-arithmetic entropy decoder and a full in-loop pipeline).

Decoder: the complete VP8L format per the public WebP Lossless
Bitstream Specification — canonical prefix codes (simple and full
code-length-coded forms, DEFLATE-style canonical assignment), optional
meta-prefix entropy image, color cache, LZ77 backward references with
the 120-entry 2D distance map, and all four transforms (predictor ×14
modes, cross-color, subtract-green, color-indexing incl. sub-byte pixel
packing) applied inversely in reverse read order. Malformed input
returns ``None``, never raises (the corpus-decode contract).

Encoder: a minimal-but-valid literal writer for deterministic fixtures
(no LZ77, optional subtract-green, full canonical prefix codes) — pairs
with the decoder AND is accepted by the reference ``libwebp`` reader,
which the differential tests use as the oracle where the system library
is present (`tests/test_vp8l.py`).

Spec references: https://developers.google.com/speed/webp/docs/
webp_lossless_bitstream_specification (public; the distance map and
code-length-code order are normative constants from it).
"""

from __future__ import annotations

import heapq
import struct
from typing import List, Optional, Sequence, Tuple

#: code-length-code symbol order (spec §"Prefix code lengths")
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

#: LZ77 length/distance prefix-code value decomposition is shared with
#: the green code's 24 length symbols (spec §"LZ77 backward reference")
_MAX_CODE_LEN = 15

#: the 120-entry short-distance map: distance code 1..120 → (dx, dy)
#: neighborhood offset, dy ≥ 0 (spec §"Distance mapping"). Validated
#: against libwebp decode in tests/test_vp8l.py.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)
assert len(_DIST_MAP) == 120


class _Malformed(Exception):
    """Internal: any structural error — callers translate to None."""


#: bit-reversal of a byte — composes an LSB-first bit window into the
#: MSB-first prefix the canonical Huffman table is indexed by
_REV8 = bytes(
    sum(((i >> b) & 1) << (7 - b) for b in range(8)) for i in range(256)
)


class _Br:
    """LSB-first bit reader (VP8L bit order, spec §"RIFF container")."""

    __slots__ = ("d", "pos", "n")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.n = len(data) * 8

    def read(self, bits: int) -> int:
        p = self.pos
        if p + bits > self.n:
            raise _Malformed("bitstream overrun")
        bp = p >> 3
        sh = p & 7
        w = int.from_bytes(self.d[bp:bp + ((sh + bits + 7) >> 3)], "little")
        self.pos = p + bits
        return (w >> sh) & ((1 << bits) - 1)

    def read1(self) -> int:
        p = self.pos
        if p >= self.n:
            raise _Malformed("bitstream overrun")
        self.pos = p + 1
        return (self.d[p >> 3] >> (p & 7)) & 1

    def peek8(self) -> int:
        """Next 8 bits as the MSB-first prefix (first-read bit highest);
        past-the-end bits read as 0 (the table fallback re-checks)."""
        p = self.pos
        bp = p >> 3
        d = self.d
        w = d[bp] if bp < len(d) else 0
        if bp + 1 < len(d):
            w |= d[bp + 1] << 8
        return _REV8[(w >> (p & 7)) & 0xFF]


class _Huff:
    """Canonical prefix decoder (DEFLATE-style canonical assignment:
    shorter codes first, within a length by symbol order; codes are
    transmitted MSB-first into the LSB-first stream — the puff walk)."""

    __slots__ = ("count", "symbols", "single", "table")

    def __init__(self, lengths: Sequence[int]):
        nz = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise _Malformed("empty code")
        if len(nz) == 1:
            # single-symbol code: ZERO bits per symbol (spec)
            self.single = nz[0][1]
            self.count = None
            self.symbols = None
            self.table = None
            return
        self.single = None
        count = [0] * (_MAX_CODE_LEN + 1)
        for ln, _s in nz:
            if ln > _MAX_CODE_LEN:
                raise _Malformed("code length > 15")
            count[ln] += 1
        # completeness check (over- or under-subscribed = malformed)
        left = 1
        for ln in range(1, _MAX_CODE_LEN + 1):
            left = (left << 1) - count[ln]
            if left < 0:
                raise _Malformed("over-subscribed code")
        if left != 0:
            raise _Malformed("incomplete code")
        offs = [0] * (_MAX_CODE_LEN + 2)
        for ln in range(1, _MAX_CODE_LEN + 1):
            offs[ln + 1] = offs[ln] + count[ln]
        symbols = [0] * len(nz)
        for s, ln in enumerate(lengths):
            if ln > 0:
                symbols[offs[ln]] = s
                offs[ln] += 1
        self.count = count
        self.symbols = symbols
        # one-level fast table over the next 8 bits (MSB-first prefix):
        # entry = (symbol << 4) | length for codes <= 8 bits, 0 = walk
        table = [0] * 256
        code = 0
        index = 0
        for ln in range(1, 9):
            for k in range(count[ln]):
                base = (code + k) << (8 - ln)
                packed = (symbols[index + k] << 4) | ln
                for idx in range(base, base + (1 << (8 - ln))):
                    table[idx] = packed
            index += count[ln]
            code = (code + count[ln]) << 1
        self.table = table

    def decode(self, br: _Br) -> int:
        if self.single is not None:
            return self.single
        if br.n - br.pos >= 8:
            packed = self.table[br.peek8()]
            if packed:
                br.pos += packed & 0xF
                return packed >> 4
        code = 0
        first = 0
        index = 0
        for ln in range(1, _MAX_CODE_LEN + 1):
            code |= br.read1()
            cnt = self.count[ln]
            if code - first < cnt:
                return self.symbols[index + (code - first)]
            index += cnt
            first = (first + cnt) << 1
            code <<= 1
        raise _Malformed("invalid prefix code stream")


def _read_code_lengths(br: _Br, alphabet: int, cl_huff: _Huff,
                       max_symbol: int) -> List[int]:
    lengths = [0] * alphabet
    prev = 8
    symbol = 0
    while symbol < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_huff.decode(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl != 0:
                prev = cl
        else:
            if cl == 16:
                repeat, fill = 3 + br.read(2), prev
            elif cl == 17:
                repeat, fill = 3 + br.read(3), 0
            elif cl == 18:
                repeat, fill = 11 + br.read(7), 0
            else:
                raise _Malformed("bad code-length symbol")
            if symbol + repeat > alphabet:
                raise _Malformed("code-length repeat overflow")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return lengths


def _read_huffman(br: _Br, alphabet: int) -> _Huff:
    if br.read1():  # simple code
        num_symbols = br.read1() + 1
        sym0 = br.read(8) if br.read1() else br.read1()
        lengths = [0] * alphabet
        if sym0 >= alphabet:
            raise _Malformed("simple symbol out of range")
        if num_symbols == 1:
            lengths[sym0] = 1  # single → zero-bit (handled in _Huff)
            return _Huff(lengths)
        sym1 = br.read(8)
        if sym1 >= alphabet or sym1 == sym0:
            raise _Malformed("simple symbols invalid")
        lengths[sym0] = 1
        lengths[sym1] = 1
        return _Huff(lengths)
    num_codes = 4 + br.read(4)
    cl_lengths = [0] * len(_CL_ORDER)
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_huff = _Huff(cl_lengths)
    if br.read1():  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet:
            raise _Malformed("max_symbol > alphabet")
    else:
        max_symbol = alphabet
    return _Huff(_read_code_lengths(br, alphabet, cl_huff, max_symbol))


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _lz77_value(code: int, br: _Br) -> int:
    """Length/distance prefix decomposition (spec: 24 prefix codes,
    value = offset + extra bits + 1)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _decode_image(br: _Br, xsize: int, ysize: int,
                  is_level0: bool) -> Tuple[List[int], int]:
    """Entropy-coded image → (argb list, final xsize). At level 0 the
    transform loop runs first and may shrink xsize (color indexing)."""
    transforms = []
    if is_level0:
        seen = set()
        while br.read1():
            ttype = br.read(2)
            if ttype in seen:
                raise _Malformed("duplicate transform")
            seen.add(ttype)
            if ttype == 0 or ttype == 1:  # predictor / cross-color
                size_bits = br.read(3) + 2
                bw = _subsample(xsize, size_bits)
                bh = _subsample(ysize, size_bits)
                sub, _ = _decode_image(br, bw, bh, False)
                transforms.append((ttype, size_bits, sub, xsize))
            elif ttype == 2:  # subtract-green
                transforms.append((2, 0, None, xsize))
            else:  # color indexing
                n_colors = br.read(8) + 1
                pal_deltas, _ = _decode_image(br, n_colors, 1, False)
                palette = []
                prev = 0
                for d in pal_deltas:
                    # componentwise delta accumulation, mod 256
                    prev = (
                        (((prev >> 24) + (d >> 24)) & 0xFF) << 24
                        | (((prev >> 16) + (d >> 16)) & 0xFF) << 16
                        | (((prev >> 8) + (d >> 8)) & 0xFF) << 8
                        | ((prev + d) & 0xFF)
                    )
                    palette.append(prev)
                if n_colors <= 2:
                    pack_bits = 3
                elif n_colors <= 4:
                    pack_bits = 2
                elif n_colors <= 16:
                    pack_bits = 1
                else:
                    pack_bits = 0
                transforms.append((3, pack_bits, palette, xsize))
                xsize = _subsample(xsize, pack_bits)
    cache_bits = 0
    if br.read1():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise _Malformed("bad color-cache bits")
    cache_size = (1 << cache_bits) if cache_bits else 0
    huffman_image = None
    huffman_bits = 0
    num_groups = 1
    if is_level0 and br.read1():  # meta prefix codes
        huffman_bits = br.read(3) + 2
        hw = _subsample(xsize, huffman_bits)
        hh = _subsample(ysize, huffman_bits)
        huffman_image, _ = _decode_image(br, hw, hh, False)
        num_groups = 1 + max(((p >> 8) & 0xFFFF) for p in huffman_image)
    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(num_groups):
        groups.append((
            _read_huffman(br, green_alpha),
            _read_huffman(br, 256),
            _read_huffman(br, 256),
            _read_huffman(br, 256),
            _read_huffman(br, 40),
        ))
    n = xsize * ysize
    out: List[int] = []
    cache = [0] * cache_size
    hw = _subsample(xsize, huffman_bits) if huffman_image else 0

    def group_at(pos: int):
        if huffman_image is None:
            return groups[0]
        x = pos % xsize
        y = pos // xsize
        meta = huffman_image[(y >> huffman_bits) * hw + (x >> huffman_bits)]
        return groups[(meta >> 8) & 0xFFFF]

    while len(out) < n:
        g = group_at(len(out))
        sym = g[0].decode(br)
        if sym < 256:  # literal: G, then R, B, A
            red = g[1].decode(br)
            blue = g[2].decode(br)
            alpha = g[3].decode(br)
            argb = (alpha << 24) | (red << 16) | (sym << 8) | blue
            out.append(argb)
            if cache_size:
                cache[((0x1E35A7BD * argb) & 0xFFFFFFFF)
                      >> (32 - cache_bits)] = argb
        elif sym < 280:  # backward reference
            length = _lz77_value(sym - 256, br)
            dist_code = _lz77_value(g[4].decode(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * xsize + dx
                if dist < 1:
                    dist = 1
            if dist > len(out):
                raise _Malformed("backward reference before start")
            for _ in range(length):
                if len(out) >= n:
                    raise _Malformed("backward reference past end")
                argb = out[-dist]
                out.append(argb)
                if cache_size:
                    cache[((0x1E35A7BD * argb) & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = argb
        else:  # color-cache hit
            idx = sym - 280
            if idx >= cache_size:
                raise _Malformed("cache index out of range")
            out.append(cache[idx])
        # (cache re-insertion of a cache hit is the identity)
    # inverse transforms, reverse read order
    for ttype, bits, data, full_x in reversed(transforms):
        if ttype == 2:  # add green
            for i, p in enumerate(out):
                g = (p >> 8) & 0xFF
                r = (((p >> 16) & 0xFF) + g) & 0xFF
                b = ((p & 0xFF) + g) & 0xFF
                out[i] = (p & 0xFF00FF00) | (r << 16) | b
        elif ttype == 0:  # predictor
            out = _inverse_predictor(out, full_x, ysize, bits, data)
        elif ttype == 1:  # cross-color
            out = _inverse_cross_color(out, full_x, ysize, bits, data)
        else:  # color indexing (+ unpack)
            out = _inverse_palette(out, full_x, ysize, bits, data)
            xsize = full_x
    return out, xsize


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    v = 0
    for sh in (24, 16, 8, 0):
        x = ((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)
        v |= (0 if x < 0 else 255 if x > 255 else x) << sh
    return v


def _clamp_add_sub_half(a: int, b: int) -> int:
    v = 0
    for sh in (24, 16, 8, 0):
        aa = (a >> sh) & 0xFF
        bb = (b >> sh) & 0xFF
        # C semantics: (aa - bb) / 2 truncates toward ZERO (a floor
        # shift here is off by one for odd negative deltas)
        d = aa - bb
        x = aa + (d // 2 if d >= 0 else -((-d) // 2))
        v |= (0 if x < 0 else 255 if x > 255 else x) << sh
    return v


def _select(left: int, top: int, tl: int) -> int:
    p_alpha = ((left >> 24) & 0xFF) + ((top >> 24) & 0xFF) - ((tl >> 24) & 0xFF)
    p_red = ((left >> 16) & 0xFF) + ((top >> 16) & 0xFF) - ((tl >> 16) & 0xFF)
    p_green = ((left >> 8) & 0xFF) + ((top >> 8) & 0xFF) - ((tl >> 8) & 0xFF)
    p_blue = (left & 0xFF) + (top & 0xFF) - (tl & 0xFF)
    pl = (abs(p_alpha - ((left >> 24) & 0xFF))
          + abs(p_red - ((left >> 16) & 0xFF))
          + abs(p_green - ((left >> 8) & 0xFF))
          + abs(p_blue - (left & 0xFF)))
    pt = (abs(p_alpha - ((top >> 24) & 0xFF))
          + abs(p_red - ((top >> 16) & 0xFF))
          + abs(p_green - ((top >> 8) & 0xFF))
          + abs(p_blue - (top & 0xFF)))
    return left if pl < pt else top


def _add_px(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) & 0xFF) << 24)
        | ((((a >> 16) + (b >> 16)) & 0xFF) << 16)
        | ((((a >> 8) + (b >> 8)) & 0xFF) << 8)
        | ((a + b) & 0xFF)
    )


def _inverse_predictor(res: List[int], xsize: int, ysize: int,
                       size_bits: int, modes: List[int]) -> List[int]:
    bw = _subsample(xsize, size_bits)
    out = [0] * (xsize * ysize)
    for y in range(ysize):
        row = y * xsize
        for x in range(xsize):
            i = row + x
            if y == 0 and x == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = out[i - 1]  # top row: L
            elif x == 0:
                pred = out[i - xsize]  # left column: T
            else:
                mode = (modes[(y >> size_bits) * bw + (x >> size_bits)]
                        >> 8) & 0xFF
                left = out[i - 1]
                top = out[i - xsize]
                # top-right of the LAST column wraps to the current
                # row's first pixel (linear-memory semantics, matches
                # the reference decoder)
                tr = out[i - xsize + 1]
                tl = out[i - xsize - 1]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = left
                elif mode == 2:
                    pred = top
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg2(_avg2(left, tr), top)
                elif mode == 6:
                    pred = _avg2(left, tl)
                elif mode == 7:
                    pred = _avg2(left, top)
                elif mode == 8:
                    pred = _avg2(tl, top)
                elif mode == 9:
                    pred = _avg2(top, tr)
                elif mode == 10:
                    pred = _avg2(_avg2(left, tl), _avg2(top, tr))
                elif mode == 11:
                    pred = _select(left, top, tl)
                elif mode == 12:
                    pred = _clamp_add_sub_full(left, top, tl)
                elif mode == 13:
                    pred = _clamp_add_sub_half(_avg2(left, top), tl)
                else:
                    raise _Malformed("bad predictor mode")
            out[i] = _add_px(res[i], pred)
    return out


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    return (_s8(t) * _s8(c)) >> 5


def _inverse_cross_color(px: List[int], xsize: int, ysize: int,
                         size_bits: int, elems: List[int]) -> List[int]:
    bw = _subsample(xsize, size_bits)
    out = [0] * (xsize * ysize)
    for y in range(ysize):
        for x in range(xsize):
            i = y * xsize + x
            e = elems[(y >> size_bits) * bw + (x >> size_bits)]
            g2r = e & 0xFF          # blue channel
            g2b = (e >> 8) & 0xFF   # green channel
            r2b = (e >> 16) & 0xFF  # red channel
            p = px[i]
            g = (p >> 8) & 0xFF
            r = (((p >> 16) & 0xFF) + _ct_delta(g2r, g)) & 0xFF
            b = ((p & 0xFF) + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            out[i] = (p & 0xFF00FF00) | (r << 16) | b
    return out


def _inverse_palette(px: List[int], xsize: int, ysize: int,
                     pack_bits: int, palette: List[int]) -> List[int]:
    out = [0] * (xsize * ysize)
    if pack_bits == 0:
        for i, p in enumerate(px):
            idx = (p >> 8) & 0xFF
            out[i] = palette[idx] if idx < len(palette) else 0
        return out
    packed_x = _subsample(xsize, pack_bits)
    per = 1 << pack_bits          # sub-pixels per packed pixel
    bpp = 8 >> pack_bits          # bits per sub-pixel
    mask = (1 << bpp) - 1
    for y in range(ysize):
        for x in range(xsize):
            p = px[y * packed_x + (x >> pack_bits)]
            g = (p >> 8) & 0xFF
            idx = (g >> (bpp * (x % per))) & mask
            out[y * xsize + x] = palette[idx] if idx < len(palette) else 0
    return out


def decode(data: bytes, max_pixels: int = 64_000_000) -> Optional[tuple]:
    """RIFF/WEBP (or bare VP8L payload) → ``(w, h, 4, bytearray(RGBA))``
    for a lossless bitstream; None when not VP8L or malformed.
    ``max_pixels`` rejects a decompression bomb BEFORE reconstruction
    (callers compositing ANMF frames pass their canvas cap so a lying
    frame payload cannot burn CPU on an image the fw/fh check would
    only reject afterwards)."""
    try:
        payload = _vp8l_payload(data)
        if payload is None:
            return None
        if len(payload) < 5 or payload[0] != 0x2F:
            return None
        br = _Br(payload[1:])
        w = br.read(14) + 1
        h = br.read(14) + 1
        br.read1()  # alpha-used hint
        if br.read(3) != 0:  # version
            return None
        if w * h > max_pixels:  # same bomb cap class as the PNG codec
            return None
        argb, _ = _decode_image(br, w, h, True)
        if len(argb) != w * h:
            return None
        out = bytearray(w * h * 4)
        for i, p in enumerate(argb):
            out[4 * i] = (p >> 16) & 0xFF
            out[4 * i + 1] = (p >> 8) & 0xFF
            out[4 * i + 2] = p & 0xFF
            out[4 * i + 3] = (p >> 24) & 0xFF
        return w, h, 4, out
    except (_Malformed, IndexError, ValueError, MemoryError):
        return None


def _vp8l_payload(data: bytes) -> Optional[bytes]:
    if len(data) >= 5 and data[0] == 0x2F:
        return bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        return None
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        if fourcc == b"VP8L":
            return bytes(body)
        pos += 8 + size + (size & 1)
    return None


# --------------------------------------------------------------- encoder

class _Bw:
    """LSB-first bit writer."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc |= (value & ((1 << bits) - 1)) << self.nbits
        self.nbits += bits
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def done(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _huff_lengths(freqs: List[int]) -> List[int]:
    """Code lengths from frequencies (heap Huffman; alphabets here are
    small so depth stays well under 15)."""
    live = [(f, s) for s, f in enumerate(freqs) if f > 0]
    if not live:
        raise ValueError("no symbols")
    if len(live) == 1:
        ln = [0] * len(freqs)
        ln[live[0][1]] = 1
        return ln
    heap = [(f, i, (s,)) for i, (f, s) in enumerate(live)]
    heapq.heapify(heap)
    nxt = len(heap)
    depth = {s: 0 for _f, _i, (s,) in heap}
    while len(heap) > 1:
        f1, _i1, s1 = heapq.heappop(heap)
        f2, _i2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, nxt, s1 + s2))
        nxt += 1
    ln = [0] * len(freqs)
    for s, d in depth.items():
        if d > _MAX_CODE_LEN:
            raise ValueError("code too deep for the fixture encoder")
        ln[s] = d
    return ln


def _canonical_codes(lengths: Sequence[int]) -> List[int]:
    codes = [0] * len(lengths)
    code = 0
    count = [0] * (_MAX_CODE_LEN + 1)
    for ln in lengths:
        if ln:
            count[ln] += 1
    next_code = [0] * (_MAX_CODE_LEN + 2)
    for ln in range(1, _MAX_CODE_LEN + 1):
        code = (code + count[ln - 1]) << 1
        next_code[ln] = code
    order = sorted((s for s in range(len(lengths)) if lengths[s]),
                   key=lambda s: (lengths[s], s))
    nxt = list(next_code)
    for s in order:
        codes[s] = nxt[lengths[s]]
        nxt[lengths[s]] += 1
    return codes


def _write_huffman(bw: _Bw, lengths: Sequence[int]) -> None:
    """Emit one prefix code: the simple form when ≤2 symbols, else the
    full code-length-coded form (every length spelled out, no RLE)."""
    nz = [s for s, ln in enumerate(lengths) if ln]
    if len(nz) == 1 and nz[0] < 256:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if nz[0] < 2:
            bw.write(0, 1)
            bw.write(nz[0], 1)
        else:
            bw.write(1, 1)
            bw.write(nz[0], 8)
        return
    if len(nz) == 2 and nz[0] < 2 and nz[1] < 256:
        bw.write(1, 1)
        bw.write(1, 1)  # two symbols
        bw.write(0, 1)  # first symbol in 1 bit
        bw.write(nz[0], 1)
        bw.write(nz[1], 8)
        return
    bw.write(0, 1)  # full form
    cl_freq = [0] * 19
    for ln in lengths:
        cl_freq[ln] += 1
    cl_lengths = _huff_lengths(cl_freq)
    cl_codes = _canonical_codes(cl_lengths)
    bw.write(15, 4)  # num_codes = 4 + 15 = 19: all positions present
    for sym in _CL_ORDER:
        bw.write(cl_lengths[sym], 3)
    bw.write(0, 1)  # no explicit max_symbol
    single_cl = sum(1 for x in cl_lengths if x) == 1
    for ln in lengths:
        if not single_cl:
            _put_code(bw, cl_codes[ln], cl_lengths[ln])
        # single-symbol code-length code: zero bits per symbol


def _put_code(bw: _Bw, code: int, length: int) -> None:
    # canonical codes are MSB-first on the wire (puff order)
    for i in range(length - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def encode(w: int, h: int, rgba, subtract_green: bool = False) -> bytes:
    """Deterministic literal-only VP8L writer for fixtures: no LZ77, no
    cache, no meta codes; optional subtract-green. Output is a complete
    RIFF/WEBP file the reference decoder accepts (differential-pinned)."""
    px = bytes(rgba)
    assert len(px) == w * h * 4
    chans: List[List[int]] = [[], [], [], []]  # G, R, B, A
    for i in range(w * h):
        r, g, b, a = px[4 * i], px[4 * i + 1], px[4 * i + 2], px[4 * i + 3]
        if subtract_green:
            r = (r - g) & 0xFF
            b = (b - g) & 0xFF
        chans[0].append(g)
        chans[1].append(r)
        chans[2].append(b)
        chans[3].append(a)
    bw = _Bw()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if any(a != 255 for a in chans[3]) else 0, 1)
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)  # a transform follows
        bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    alphabet_sizes = (256 + 24, 256, 256, 256, 40)
    tables = []
    for c in range(4):
        freq = [0] * alphabet_sizes[c]
        for v in chans[c]:
            freq[v] += 1
        lengths = _huff_lengths(freq)
        tables.append((lengths, _canonical_codes(lengths)))
        _write_huffman(bw, lengths)
    dist_lengths = [0] * 40
    dist_lengths[0] = 1  # unused tree: single-symbol zero-bit code
    _write_huffman(bw, dist_lengths)
    for i in range(w * h):
        for c in range(4):
            lengths, codes = tables[c]
            v = chans[c][i]
            if lengths[v] and sum(1 for x in lengths if x) > 1:
                _put_code(bw, codes[v], lengths[v])
            # single-symbol channel: zero bits
    payload = b"\x2f" + bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
