"""Pure-stdlib(+numpy) baseline JPEG codec.

Round 12 closes the last big still-image gap in the multimodal surface:
JPEG was metadata-only (SOF marker walk in ``multimodal._jpeg_meta``),
so resize / dHash / frame extraction honestly raised on the single most
common web-corpus image format. This module implements a real baseline
sequential decoder and a matching encoder with no third-party codec:

- **decode**: baseline DCT (SOF0), extended sequential (SOF1) AND
  progressive (SOF2: spectral selection + successive approximation,
  DC/AC first + refinement scans, EOB runs), 8-bit, Huffman entropy
  coding, 1- or 3-component scans, any sampling factors in {1,2}x{1,2}
  (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0), restart intervals (DRI + RSTn), fill
  bytes, 16-bit DQT entries. Out-of-subset streams (arithmetic coding,
  lossless/hierarchical, 12-bit, CMYK) return ``None`` — the multimodal
  layer turns that into its honest capability raise.
- **encode** / **encode_progressive**: quality-scaled Annex-K
  quantization tables; baseline uses the spec's standard Huffman tables,
  progressive a uniform AC table so real EOBn runs are expressible.
  They exist so fixtures are deterministic and the decoder is
  round-trip property-tested two ways: grayscale flat 8x8 blocks at
  quality 100 survive the baseline EXACTLY (integer DC, zero AC, unit
  quantizer), and a full-precision progressive stream decodes to pixels
  IDENTICAL to the baseline stream of the same image/quality.

The hot loop is the per-symbol Huffman decode (LUT-driven Python —
fixture-sized assets, Arrow-batched upstream); everything O(pixels)
after entropy decode (dequantize, IDCT, upsample, color transform) is
vectorized numpy: the IDCT is two 8x8 matrix multiplications over all
blocks of a component at once. Bomb-safe like the PNG codec: dimensions
are capped before any allocation.

Reference parity anchor: the reference stores media as opaque bytes and
never decodes (seq-db is a log store); this module serves SURVEY §2's
LLM-pipeline multimodal amendments, same standing as the PNG/GIF/APNG/
Y4M codecs in ``multimodal.py``.
"""

from __future__ import annotations

import struct
from typing import Optional

#: decode refuses rasters above this many pixels (same bomb cap as PNG)
_MAX_PIXELS = 64_000_000

# zigzag scan: position k in the entropy stream -> raster index in the
# 8x8 block (row*8+col)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1/K.2 example quantization tables (raster order)
_QT_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QT_CHROM = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 standard Huffman specs: (BITS[1..16], HUFFVAL)
_HT_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HT_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

_SOF_BASELINE = frozenset((0xC0, 0xC1))  # SOF0 baseline, SOF1 ext. sequential
_SOF_ALL = frozenset(
    (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
)


def _idct_matrix():
    """Orthonormal 8x8 DCT-II basis A (A @ f @ A.T == coefficients); the
    inverse transform is A.T @ F @ A."""
    import numpy as np

    a = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        c = (1.0 / 2.0) * (1.0 / np.sqrt(2.0) if u == 0 else 1.0)
        for x in range(8):
            a[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


class _HuffDecoder:
    """LUT-driven canonical Huffman decoder: a 16-bit-prefix table maps
    the next 16 stream bits directly to ``(length << 8) | value`` (0 =
    invalid prefix), so each symbol costs one dict-free list index
    instead of up-to-16 bit reads. JPEG codes never exceed 16 bits, so
    the table is complete — no slow path. Built once per DHT segment,
    slice-filled (≤256 ranges), ~65k-entry Python list per table."""

    __slots__ = ("lut",)

    def __init__(self, bits, vals):
        lut = [0] * 65536
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                packed = (ln << 8) | vals[k]
                lo = code << (16 - ln)
                hi = (code + 1) << (16 - ln)
                lut[lo:hi] = [packed] * (hi - lo)
                code += 1
                k += 1
            code <<= 1
        self.lut = lut


class _Bits:
    """MSB-first bit reader for the progressive path (the baseline hot
    loop inlines this; progressive scans are band-sized, so method-call
    overhead is acceptable there)."""

    __slots__ = ("data", "dlen", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.dlen = len(data)
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def huff(self, lut) -> int:
        while self.nbits < 16 and self.pos < self.dlen:
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        idx = (
            (self.acc >> (self.nbits - 16)) if self.nbits >= 16
            else (self.acc << (16 - self.nbits))
        ) & 0xFFFF
        packed = lut[idx]
        ln = packed >> 8
        if ln == 0 or ln > self.nbits:
            raise ValueError("bad Huffman code")
        self.nbits -= ln
        self.acc &= (1 << self.nbits) - 1
        return packed & 0xFF

    def bits(self, nb: int) -> int:
        if nb == 0:
            return 0
        while self.nbits < nb:
            if self.pos >= self.dlen:
                raise EOFError("entropy data exhausted")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= nb
        v = (self.acc >> self.nbits) & ((1 << nb) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def recv_extend(self, t: int) -> int:
        if t == 0:
            return 0
        v = self.bits(t)
        return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _progressive_scan(
    w, h, comps, scan, ss, se, ah, al, huff, restart, segs, coef, mcux, mcuy
):
    """Apply one progressive scan (spectral selection Ss..Se, successive
    approximation Ah->Al) to the coefficient state. DC scans (Ss=0) may
    be interleaved; AC scans are single-component per the spec, block
    traversal over the component's OWN block grid. Raises on malformed
    entropy data (caller turns that into decode() -> None)."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    by_id = {cid: i for i, (cid, _h, _v, _tq) in enumerate(comps)}
    zz = ZIGZAG
    sel = []
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError("scan references unknown component")
        sel.append((by_id[cs], td, ta))
    bits = _Bits(segs[0] if segs else b"")
    seg_idx = 0

    def comp_blocks(k):
        _cid, chs, cvs, _tq = comps[k]
        bw = (-(-w * chs // hmax) + 7) // 8
        bh = (-(-h * cvs // vmax) + 7) // 8
        return bw, bh

    if ss == 0:
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        preds = [0] * len(sel)
        interleaved = len(sel) > 1
        if interleaved:
            nunits = mcux * mcuy
        else:
            bw, bh = comp_blocks(sel[0][0])
            nunits = bw * bh
        dluts = []
        for _k, td, _ta in sel:
            if ah == 0 and (0, td) not in huff:
                raise ValueError("missing DC table")
            dluts.append(huff[(0, td)].lut if ah == 0 else None)
        for m in range(nunits):
            if restart and m and m % restart == 0:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise EOFError("missing restart segment")
                bits = _Bits(segs[seg_idx])
                preds = [0] * len(sel)
            if interleaved:
                my, mx = divmod(m, mcux)
                for si, (k, _td, _ta) in enumerate(sel):
                    _cid, chs, cvs, _tq = comps[k]
                    for by in range(cvs):
                        for bx in range(chs):
                            row, col = my * cvs + by, mx * chs + bx
                            if ah == 0:
                                t = bits.huff(dluts[si])
                                preds[si] += bits.recv_extend(t)
                                coef[k][row, col, 0] = preds[si] << al
                            elif bits.bits(1):
                                coef[k][row, col, 0] |= 1 << al
            else:
                k = sel[0][0]
                row, col = divmod(m, bw)
                if ah == 0:
                    t = bits.huff(dluts[0])
                    preds[0] += bits.recv_extend(t)
                    coef[k][row, col, 0] = preds[0] << al
                elif bits.bits(1):
                    coef[k][row, col, 0] |= 1 << al
        return

    # ---- AC scan: single component, own-grid traversal
    if len(sel) != 1:
        raise ValueError("interleaved AC scan")
    k, _td, ta = sel[0]
    if (1, ta) not in huff:
        raise ValueError("missing AC table")
    lut = huff[(1, ta)].lut
    bw, bh = comp_blocks(k)
    grid = coef[k]
    eobrun = 0
    p1 = 1 << al
    m1 = -p1
    for m in range(bw * bh):
        if restart and m and m % restart == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise EOFError("missing restart segment")
            bits = _Bits(segs[seg_idx])
            eobrun = 0
        row, col = divmod(m, bw)
        blk = grid[row, col]
        if ah == 0:
            # first scan for this band
            if eobrun:
                eobrun -= 1
                continue
            kk = ss
            while kk <= se:
                rs = bits.huff(lut)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        kk += 16  # ZRL
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += bits.bits(r)
                    break
                kk += r
                if kk > se:
                    raise ValueError("AC run past band end")
                blk[zz[kk]] = bits.recv_extend(s) << al
                kk += 1
            continue
        # refinement scan (Ah > 0): correction bits for known-nonzero
        # coefficients, new +/-1<<Al coefficients, EOB runs that still
        # carry corrections for the remaining band
        kk = ss
        if eobrun == 0:
            while kk <= se:
                rs = bits.huff(lut)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += bits.bits(r)
                        break
                    # r == 15: ZRL — skip 16 zero-history positions
                else:
                    val = p1 if bits.bits(1) else m1
                while kk <= se:
                    c = int(blk[zz[kk]])
                    if c != 0:
                        if bits.bits(1) and (c & p1) == 0:
                            blk[zz[kk]] = c + (p1 if c >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    kk += 1
                if val and kk <= se:
                    blk[zz[kk]] = val
                kk += 1
        if eobrun > 0:
            while kk <= se:
                c = int(blk[zz[kk]])
                if c != 0 and bits.bits(1) and (c & p1) == 0:
                    blk[zz[kk]] = c + (p1 if c >= 0 else m1)
                kk += 1
            eobrun -= 1


def _split_entropy(b: bytes, pos: int) -> tuple[list[bytes], int]:
    """Un-stuff entropy-coded data starting at ``pos``, splitting at RST
    markers. Returns (segments, position of the terminating marker's FF).
    Span-copies between 0xFF sightings (``bytes.find`` skips the >99%
    non-FF bulk in C) instead of walking byte-at-a-time."""
    segs: list[bytes] = []
    parts: list[bytes] = []
    n = len(b)
    start = pos
    while True:
        j = b.find(b"\xff", start)
        if j < 0:
            parts.append(b[start:n])
            segs.append(b"".join(parts))
            return segs, n
        k = j + 1
        while k < n and b[k] == 0xFF:  # fill bytes
            k += 1
        if k >= n:
            parts.append(b[start:j])
            segs.append(b"".join(parts))
            return segs, n
        m = b[k]
        if m == 0x00:  # stuffed FF: keep one literal FF, drop the 00
            parts.append(b[start : j + 1])
            start = k + 1
        elif 0xD0 <= m <= 0xD7:  # RSTn: segment boundary
            parts.append(b[start:j])
            segs.append(b"".join(parts))
            parts = []
            start = k + 1
        else:
            parts.append(b[start:j])
            segs.append(b"".join(parts))
            return segs, j


def decode(b: bytes) -> Optional[tuple[int, int, int, bytearray]]:
    """Decode a baseline JPEG to (width, height, 3, RGB bytearray).

    Grayscale sources are replicated to RGB so the output plugs straight
    into the PNG-encoder / resize / dHash pipeline. Handles baseline,
    extended-sequential and progressive streams; returns ``None`` for
    anything outside the supported subset or malformed — never throws."""
    try:
        return _decode(b or b"")
    except Exception:
        return None


def _decode(b: bytes) -> Optional[tuple[int, int, int, bytearray]]:
    import numpy as np

    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        return None
    qt: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    restart = 0
    frame = None  # (w, h, comps) with comps = [(cid, h, v, tq)]
    progressive = False
    coef = None  # progressive: per-component coefficient grids
    pos = 2
    n = len(b)
    while pos + 2 <= n:
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        if pos + 4 > n:
            return None
        (seg_len,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        if seg_len < 2 or pos + 2 + seg_len > n:
            return None
        seg = b[pos + 4 : pos + 2 + seg_len]
        if marker in _SOF_ALL:
            if marker not in _SOF_BASELINE and marker != 0xC2:
                return None  # arithmetic / lossless / hierarchical
            progressive = marker == 0xC2
            prec = seg[0]
            h_, w_ = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if prec != 8 or nc not in (1, 3) or not (w_ and h_):
                return None
            if w_ * h_ > _MAX_PIXELS:
                return None
            comps = []
            for ci in range(nc):
                cid = seg[6 + 3 * ci]
                hv = seg[7 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0xF, seg[8 + 3 * ci]))
            if any(cc[1] not in (1, 2) or cc[2] not in (1, 2) for cc in comps):
                return None
            frame = (int(w_), int(h_), comps)
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(
                        np.int32
                    )
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(
                        np.int32
                    )
                    p += 128
                if len(tbl) != 64:
                    return None
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                cnt = sum(bits)
                vals = list(seg[p + 17 : p + 17 + cnt])
                if len(vals) != cnt:
                    return None
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                p += 17 + cnt
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs = seg[1 + 2 * si]
                tt = seg[2 + 2 * si]
                scan.append((cs, tt >> 4, tt & 0xF))
            if not progressive:
                segs, _end = _split_entropy(b, pos + 2 + seg_len)
                return _decode_scan(frame, scan, qt, huff, restart, segs)
            # progressive: accumulate this scan into the coefficient
            # state and continue the marker walk from the scan's end
            ss_ = seg[1 + 2 * ns]
            se_ = seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            w_, h_, comps = frame
            if coef is None:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = (w_ + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h_ + 8 * vmax - 1) // (8 * vmax)
                coef = [
                    np.zeros((mcuy * cv, mcux * chs, 64), dtype=np.int32)
                    for _cid, chs, cv, _tq in comps
                ]
            segs, scan_end = _split_entropy(b, pos + 2 + seg_len)
            _progressive_scan(
                w_, h_, comps, scan,
                ss_, se_, ahal >> 4, ahal & 0xF,
                huff, restart, segs, coef, mcux, mcuy,
            )
            pos = scan_end
            continue
        pos += 2 + seg_len
    if progressive and coef is not None and frame is not None:
        w_, h_, comps = frame
        if any(c[3] not in qt for c in comps):
            return None
        geo = [(chs, cv, qt[tq]) for _cid, chs, cv, tq in comps]
        flats = [g.reshape(-1, 64) for g in coef]
        return _assemble(w_, h_, geo, flats, mcux, mcuy)
    return None


def _decode_scan(frame, scan, qt, huff, restart, segs):
    import numpy as np

    w, h, comps = frame
    if len(scan) != len(comps):
        return None  # non-interleaved multi-scan not supported
    by_id = {cid: (ci, ch, cv, tq) for ci, (cid, ch, cv, tq) in enumerate(comps)}
    order = []
    for cs, td, ta in scan:
        if cs not in by_id:
            return None
        ci, ch, cv, tq = by_id[cs]
        if (0, td) not in huff or (1, ta) not in huff or tq not in qt:
            return None
        order.append((ci, ch, cv, qt[tq], huff[(0, td)], huff[(1, ta)]))
    hmax = max(ch for _, ch, _, _, _, _ in order)
    vmax = max(cv for _, _, cv, _, _, _ in order)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    nmcu = mcux * mcuy
    # entropy decode into per-component Python block lists (bulk numpy
    # conversion afterwards — per-coefficient ndarray writes are 10x the
    # cost of list stores in this loop)
    comp_blocks: list[list[list[int]]] = [[] for _ in order]
    preds = [0] * len(order)
    seg_idx = 0
    # inlined MSB-first bit state (locals, not attribute access — this
    # loop is the codec's entire Python cost)
    data = segs[0] if segs else b""
    dlen = len(data)
    pos = 0
    acc = 0
    nbits = 0
    zz = ZIGZAG
    n_ord = len(order)
    for m in range(nmcu):
        if restart and m and m % restart == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                return None
            data = segs[seg_idx]
            dlen = len(data)
            pos = 0
            acc = 0
            nbits = 0
            preds = [0] * n_ord
        for k in range(n_ord):
            _ci, ch, cv, _q, dtab, atab = order[k]
            dlut = dtab.lut
            alut = atab.lut
            for _blk_i in range(cv * ch):
                blk = [0] * 64
                # --- DC: one ≥32-bit fill covers code + magnitude bits
                while nbits < 32 and pos < dlen:
                    acc = (acc << 8) | data[pos]
                    pos += 1
                    nbits += 8
                packed = dlut[
                    ((acc >> (nbits - 16)) if nbits >= 16
                     else (acc << (16 - nbits))) & 0xFFFF
                ]
                ln = packed >> 8
                t = packed & 0xFF
                if ln == 0 or ln + t > nbits:
                    raise ValueError("bad DC code")
                nbits -= ln + t
                if t:
                    v = (acc >> nbits) & ((1 << t) - 1)
                    preds[k] += v if v >= (1 << (t - 1)) else v - (1 << t) + 1
                acc &= (1 << nbits) - 1
                blk[0] = preds[k]
                # --- AC run-length symbols (same single-fill discipline)
                kk = 1
                while kk < 64:
                    while nbits < 32 and pos < dlen:
                        acc = (acc << 8) | data[pos]
                        pos += 1
                        nbits += 8
                    packed = alut[
                        ((acc >> (nbits - 16)) if nbits >= 16
                         else (acc << (16 - nbits))) & 0xFFFF
                    ]
                    ln = packed >> 8
                    rs = packed & 0xFF
                    s = rs & 0xF
                    if ln == 0 or ln + s > nbits:
                        raise ValueError("bad AC code")
                    nbits -= ln + s
                    if s == 0:
                        acc &= (1 << nbits) - 1
                        if rs == 0xF0:
                            kk += 16  # ZRL
                            continue
                        break  # EOB
                    kk += rs >> 4
                    if kk > 63:
                        return None
                    v = (acc >> nbits) & ((1 << s) - 1)
                    acc &= (1 << nbits) - 1
                    blk[zz[kk]] = (
                        v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                    )
                    kk += 1
                comp_blocks[k].append(blk)
    # reorder block lists MCU->grid and hand off to the shared backend
    flats = []
    for k, (ci, ch, cv, _q, _d, _a2) in enumerate(order):
        rows, cols = mcuy * cv, mcux * ch
        # blocks were appended in MCU order: for MCU (my,mx), the cv*ch
        # sub-blocks raster within the MCU — map list order -> grid
        flat = np.array(comp_blocks[k], dtype=np.int32).reshape(
            mcuy, mcux, cv, ch, 64
        )
        flats.append(flat.transpose(0, 2, 1, 3, 4).reshape(rows * cols, 64))
    geo = [(ch, cv, q) for _ci, ch, cv, q, _d, _a2 in order]
    return _assemble(w, h, geo, flats, mcux, mcuy)


def _assemble(w, h, geo, flats, mcux, mcuy):
    """Dequantize + IDCT + upsample + color transform — shared by the
    baseline and progressive paths. ``geo``: [(h_samp, v_samp, qtable)]
    per component; ``flats``: matching (rows*cols, 64) int coefficient
    arrays in RASTER coefficient order (dezigzagged at store time),
    block-grid row-major."""
    import numpy as np

    zz = ZIGZAG
    hmax = max(g[0] for g in geo)
    vmax = max(g[1] for g in geo)
    a = _idct_matrix()
    out_planes = []
    for k, (ch, cv, q) in enumerate(geo):
        rows, cols = mcuy * cv, mcux * ch
        flat = flats[k]
        # dequantize maps through the zigzag ordering of the quant table
        qraster = np.empty(64, dtype=np.int64)
        qraster[np.array(zz)] = q
        deq = flat.astype(np.float64) * qraster[None, :]
        blocks = deq.reshape(rows * cols, 8, 8)
        # IDCT = A.T @ block @ A, batched matmul over all blocks at once
        spat = np.matmul(np.matmul(a.T, blocks), a)
        spat += 128.0
        np.rint(spat, out=spat)
        np.clip(spat, 0, 255, out=spat)
        spat = spat.astype(np.uint8)
        plane = (
            spat.reshape(rows, cols, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(rows * 8, cols * 8)
        )
        # crop to the component's true size, then upsample to full res
        cw = -(-w * ch // hmax)  # ceil
        chh = -(-h * cv // vmax)
        plane = plane[:chh, :cw]
        if ch != hmax or cv != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
            )
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        y = out_planes[0]
        rgb = np.stack([y, y, y], axis=-1)
    else:
        y = out_planes[0].astype(np.float64)
        cb = out_planes[1].astype(np.float64) - 128.0
        cr = out_planes[2].astype(np.float64) - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        bl = y + 1.772 * cb
        rgb = np.empty((h, w, 3), dtype=np.uint8)
        for ch_i, arr in enumerate((r, g, bl)):
            np.rint(arr, out=arr)
            np.clip(arr, 0, 255, out=arr)
            rgb[:, :, ch_i] = arr
    return w, h, 3, bytearray(rgb.tobytes())


def meta(b: bytes) -> Optional[tuple[int, int, int]]:
    """(width, height, 1) if ``b`` is inside the decodable baseline
    subset (so callers can distinguish 'real pixels available' from
    'header-only metadata'). Cheap full parse minus the entropy decode
    is not worth a second code path — fixture-sized inputs."""
    dec = decode(b)
    if dec is None:
        return None
    return dec[0], dec[1], 1


# ---------------------------------------------------------------- encoder


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int) -> None:
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _huff_codes(bits, vals):
    """value -> (code, length) canonical assignment."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _scaled_qt(base, quality: int):
    import numpy as np

    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (np.asarray(base, dtype=np.int64) * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _fdct_blocks(plane, a):
    """Forward DCT over an (H, W) uint8 plane padded to 8-multiples;
    returns (n_blocks_y, n_blocks_x, 64) int32 of UNQUANTIZED coefficients."""
    import numpy as np

    hh, ww = plane.shape
    by, bx = hh // 8, ww // 8
    blocks = (
        plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    coef = np.einsum("ux,nmxy,vy->nmuv", a, blocks, a)
    return coef.reshape(by, bx, 64)


def _pad_edge(plane, mh: int, mw: int):
    """Replicate-pad a plane up to multiples of (mh, mw)."""
    import numpy as np

    hh, ww = plane.shape
    ph = (-hh) % mh
    pw = (-ww) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _prepare_coefficients(w, h, ch, pixels, quality, subsample):
    """Color transform + subsample + forward DCT + quantize: the shared
    front half of the baseline and progressive encoders. Returns
    (gray, samp, qlum_zz, qchrom_zz, coef_grids) with coef_grids[k] of
    shape (blocks_y, blocks_x, 64) ZIGZAG-ordered int32, MCU-padded."""
    import numpy as np

    arr = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(h, w, ch)
    if ch == 4:
        arr = arr[:, :, :3]
        ch = 3
    a = _idct_matrix()
    qlum = _scaled_qt(_QT_LUM, quality)
    qchrom = _scaled_qt(_QT_CHROM, quality)
    zz = np.array(ZIGZAG)
    # zigzag-ordered quant tables (DQT payload order == entropy order)
    qlum_zz = qlum.copy()
    qchrom_zz = qchrom.copy()
    gray = ch == 1
    if gray:
        planes = [arr[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
        qts = [qlum]
    else:
        rf = arr[:, :, 0].astype(np.float64)
        gf = arr[:, :, 1].astype(np.float64)
        bf = arr[:, :, 2].astype(np.float64)
        yy = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0
        cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0
        if subsample == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "422":
            samp = [(2, 1), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [yy, cb, cr]
        qts = [qlum, qchrom, qchrom]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # pad full-res planes to MCU multiples, then downsample chroma
    coef_grids = []
    for pi, (plane, (sh, sv)) in enumerate(zip(planes, samp)):
        p8 = np.clip(np.rint(plane), 0, 255).astype(np.uint8)
        p8 = _pad_edge(p8, 8 * vmax, 8 * hmax)
        if sh != hmax or sv != vmax:
            fy, fx = vmax // sv, hmax // sh
            hh, ww = p8.shape
            p8 = (
                p8.reshape(hh // fy, fy, ww // fx, fx)
                .astype(np.float64)
                .mean(axis=(1, 3))
            )
            p8 = np.clip(np.rint(p8), 0, 255).astype(np.uint8)
        coef = _fdct_blocks(p8, a)
        q = qts[pi].astype(np.float64)
        qraster = np.empty(64, dtype=np.float64)
        qraster[zz] = q  # q is zigzag-ordered; map to raster positions
        quant = np.rint(coef / qraster[None, None, :]).astype(np.int32)
        # store zigzag-ordered for the entropy coder
        coef_grids.append(quant[:, :, zz])
    return gray, samp, qlum_zz, qchrom_zz, coef_grids


def _encode_block(bw, coefzz, pred, dc_codes, ac_codes) -> int:
    """Huffman-encode one zigzagged quantized block; returns the new DC
    predictor."""
    dc = int(coefzz[0])
    diff = dc - pred
    mag = abs(diff)
    t = mag.bit_length()
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coefzz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coefzz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]
            bw.write(zc, zl)
            run -= 16
        mag = abs(v)
        s = mag.bit_length()
        cc, cl = ac_codes[(run << 4) | s]
        bw.write(cc, cl)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ec, el = ac_codes[0x00]
        bw.write(ec, el)
    return dc


def encode(
    w: int,
    h: int,
    ch: int,
    pixels,
    quality: int = 90,
    subsample: str = "444",
    restart: int = 0,
    wide_dqt: bool = False,
) -> bytes:
    """Encode raw pixels to a baseline JFIF JPEG.

    ``ch`` 1 (gray), 3 (RGB) or 4 (RGBA — alpha dropped); ``subsample``
    '444', '422' or '420' (color only); ``restart`` emits DRI + RSTn
    every that many MCUs; ``wide_dqt`` writes 16-bit DQT entries (same
    values — exercises the decoder's Pq=1 path). Deterministic: fixed
    tables, fixed traversal — fixtures hash-pin against it."""
    import numpy as np

    if subsample not in ("444", "422", "420"):
        raise ValueError("subsample must be '444', '422' or '420'")
    gray, samp, qlum_zz, qchrom_zz, coef_grids = _prepare_coefficients(
        w, h, ch, pixels, quality, subsample
    )
    # ---- emit the stream
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0

    def dqt_payload(tid: int, tbl) -> bytes:
        if wide_dqt:
            return bytes([0x10 | tid]) + b"".join(
                struct.pack(">H", int(x)) for x in tbl
            )
        return bytes([tid]) + bytes(int(x) for x in tbl)

    seg(0xDB, dqt_payload(0, qlum_zz))
    if not gray:
        seg(0xDB, dqt_payload(1, qchrom_zz))
    nc = 1 if gray else 3
    sof = bytearray(struct.pack(">BHHB", 8, h, w, nc))
    for ci in range(nc):
        sh, sv = samp[ci]
        sof.extend([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    seg(0xC0, bytes(sof))
    ht_specs = [(0x00, _HT_DC_LUM), (0x10, _HT_AC_LUM)]
    if not gray:
        ht_specs += [(0x01, _HT_DC_CHROM), (0x11, _HT_AC_CHROM)]
    for tc_th, (bits, vals) in ht_specs:
        seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart:
        seg(0xDD, struct.pack(">H", restart))
    sos = bytearray([nc])
    for ci in range(nc):
        sos.extend([ci + 1, 0x00 if ci == 0 else 0x11])
    sos.extend([0, 63, 0])
    seg(0xDA, bytes(sos))
    dc_lum = _huff_codes(*_HT_DC_LUM)
    ac_lum = _huff_codes(*_HT_AC_LUM)
    dc_chrom = _huff_codes(*_HT_DC_CHROM)
    ac_chrom = _huff_codes(*_HT_AC_CHROM)
    tables = [(dc_lum, ac_lum)] + [(dc_chrom, ac_chrom)] * (nc - 1)
    bw = _BitWriter()
    mcux = coef_grids[0].shape[1] // samp[0][0]
    mcuy = coef_grids[0].shape[0] // samp[0][1]
    preds = [0] * nc
    rst = 0
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            bw.flush()
            out.extend(bw.out)
            out.extend(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) % 8
            bw = _BitWriter()
            preds = [0] * nc
        my, mx = divmod(m, mcux)
        for ci in range(nc):
            sh, sv = samp[ci]
            dct, act = tables[ci]
            for by in range(sv):
                for bx in range(sh):
                    blk = coef_grids[ci][my * sv + by, mx * sh + bx]
                    preds[ci] = _encode_block(bw, blk, preds[ci], dct, act)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# ------------------------------------------------------- progressive encoder

#: uniform Huffman table for progressive AC scans: every (run<<4)|size
#: symbol with run 0..15, size 0..13 — covers EOBn (size 0) runs up to
#: 2^14-1 blocks, which the standard baseline AC tables cannot express.
#: 223 codes at 9 bits + 1 at 10 (canonical, no all-ones code).
_HT_AC_PROG = (
    [0] * 8 + [223, 1] + [0] * 6,
    [(r << 4) | s for r in range(16) for s in range(14)],
)


def _emit_bits_value(bw, v: int, s: int) -> None:
    """Magnitude bits of a signed value per F.1.2.2.1 (negative values
    are sent as v + 2^s - 1)."""
    bw.write(v if v >= 0 else v + (1 << s) - 1, s)


class _EobState:
    """EOBRUN + buffered-correction-bit state shared across blocks of a
    progressive AC scan (libjpeg's EOBRUN/BE, as plain Python)."""

    __slots__ = ("run", "bits")

    def __init__(self):
        self.run = 0
        self.bits: list[int] = []

    def flush(self, bw, ac_codes) -> None:
        if self.run > 0:
            r = self.run.bit_length() - 1
            c, ln = ac_codes[r << 4]
            bw.write(c, ln)
            if r:
                bw.write(self.run - (1 << r), r)
            self.run = 0
        for bit in self.bits:
            bw.write(bit, 1)
        self.bits = []


def _emit_ac_first(bw, blocks, ss, se, al, ac_codes) -> None:
    """First AC scan of a band (Ah=0): run-length + EOBRUN coding of the
    point-transformed (toward-zero >>Al) coefficients."""
    eob = _EobState()
    for blkzz in blocks:
        r = 0
        for kk in range(ss, se + 1):
            v = int(blkzz[kk])
            t = (abs(v) >> al)
            if t == 0:
                r += 1
                continue
            if v < 0:
                t = -t
            eob.flush(bw, ac_codes)
            while r > 15:
                c, ln = ac_codes[0xF0]
                bw.write(c, ln)
                r -= 16
            s = abs(t).bit_length()
            c, ln = ac_codes[(r << 4) | s]
            bw.write(c, ln)
            _emit_bits_value(bw, t, s)
            r = 0
        if r > 0:
            eob.run += 1
            if eob.run == 0x7FFF:
                eob.flush(bw, ac_codes)
    eob.flush(bw, ac_codes)


def _emit_ac_refine(bw, blocks, ss, se, al, ac_codes) -> None:
    """AC refinement scan (Ah=Al+1): correction bits for known-nonzero
    coefficients, (run<<4)|1 symbols for newly visible +/-1<<Al values,
    EOBRUN carrying the buffered corrections (libjpeg
    encode_mcu_AC_refine, reimplemented)."""
    eob = _EobState()
    for blkzz in blocks:
        absv = [abs(int(blkzz[kk])) >> al for kk in range(ss, se + 1)]
        eobidx = ss - 1
        for i, t in enumerate(absv):
            if t == 1:
                eobidx = ss + i
        r = 0
        pend: list[int] = []  # correction bits behind the current run
        for kk in range(ss, se + 1):
            t = absv[kk - ss]
            if t == 0:
                r += 1
                continue
            while r > 15 and kk <= eobidx:
                eob.flush(bw, ac_codes)
                c, ln = ac_codes[0xF0]
                bw.write(c, ln)
                r -= 16
                for bit in pend:
                    bw.write(bit, 1)
                pend = []
            if t > 1:
                pend.append(t & 1)
                continue
            # newly visible coefficient
            eob.flush(bw, ac_codes)
            c, ln = ac_codes[(r << 4) | 1]
            bw.write(c, ln)
            bw.write(1 if int(blkzz[kk]) >= 0 else 0, 1)
            for bit in pend:
                bw.write(bit, 1)
            pend = []
            r = 0
        if r > 0 or pend:
            eob.run += 1
            eob.bits.extend(pend)
            if eob.run == 0x7FFF:
                eob.flush(bw, ac_codes)
    eob.flush(bw, ac_codes)


def encode_progressive(
    w: int,
    h: int,
    ch: int,
    pixels,
    quality: int = 90,
    subsample: str = "444",
    spectral_split: int = 6,
) -> bytes:
    """Encode a PROGRESSIVE (SOF2) JFIF JPEG carrying full precision.

    Scan script: interleaved DC first (Al=1) -> AC first scans with a
    spectral split on the luma band (1..split-1, then split..63; chroma
    full-band) at Al=1 -> DC refinement (raw bits) -> AC refinement
    scans to Al=0. Because every bit reaches Al=0, the decoded pixels
    are IDENTICAL to the baseline encode() of the same image/quality —
    the round-trip equality the tests pin."""
    import struct as _s

    if subsample not in ("444", "422", "420"):
        raise ValueError("subsample must be '444', '422' or '420'")
    gray, samp, qlum_zz, qchrom_zz, coef_grids = _prepare_coefficients(
        w, h, ch, pixels, quality, subsample
    )
    nc = 1 if gray else 3
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = coef_grids[0].shape[1] // samp[0][0]
    mcuy = coef_grids[0].shape[0] // samp[0][1]
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes) -> None:
        out.extend(_s.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    seg(0xDB, bytes([0x00]) + bytes(int(x) for x in qlum_zz))
    if not gray:
        seg(0xDB, bytes([0x01]) + bytes(int(x) for x in qchrom_zz))
    sof = bytearray(_s.pack(">BHHB", 8, h, w, nc))
    for ci in range(nc):
        sh, sv = samp[ci]
        sof.extend([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    seg(0xC2, bytes(sof))  # SOF2: progressive DCT
    ht_specs = [(0x00, _HT_DC_LUM), (0x10, _HT_AC_PROG)]
    if not gray:
        ht_specs.append((0x01, _HT_DC_CHROM))
    for tc_th, (bits_, vals_) in ht_specs:
        seg(0xC4, bytes([tc_th]) + bytes(bits_) + bytes(vals_))
    dc_codes = [_huff_codes(*_HT_DC_LUM)] + [
        _huff_codes(*_HT_DC_CHROM)
    ] * (nc - 1)
    ac_codes = _huff_codes(*_HT_AC_PROG)

    def sos(comps_td_ta, ss, se, ah, al) -> None:
        p = bytearray([len(comps_td_ta)])
        for cs, td, ta in comps_td_ta:
            p.extend([cs, (td << 4) | ta])
        p.extend([ss, se, (ah << 4) | al])
        seg(0xDA, bytes(p))

    def own_blocks(ci):
        sh, sv = samp[ci]
        bw_ = (-(-w * sh // hmax) + 7) // 8
        bh_ = (-(-h * sv // vmax) + 7) // 8
        return [
            coef_grids[ci][row, col]
            for row in range(bh_)
            for col in range(bw_)
        ]

    al0 = 1
    # ---- scan 1: DC first, interleaved, Al=1
    sos([(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(nc)], 0, 0, 0, al0)
    bw = _BitWriter()
    preds = [0] * nc
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci in range(nc):
            sh, sv = samp[ci]
            for by in range(sv):
                for bx in range(sh):
                    dc = int(coef_grids[ci][my * sv + by, mx * sh + bx][0])
                    t = dc >> al0  # arithmetic shift (two's-complement SA)
                    diff = t - preds[ci]
                    preds[ci] = t
                    s = abs(diff).bit_length()
                    c, ln = dc_codes[ci][s]
                    bw.write(c, ln)
                    if s:
                        _emit_bits_value(bw, diff, s)
    bw.flush()
    out.extend(bw.out)
    # ---- AC first scans, Al=1 (luma band split; chroma full band)
    split = max(2, min(63, spectral_split))
    ac_scans_first = [(0, 1, split - 1)]
    if nc == 3:
        ac_scans_first += [(1, 1, 63), (2, 1, 63)]
    ac_scans_first.append((0, split, 63))
    for ci, ss_, se_ in ac_scans_first:
        sos([(ci + 1, 0, 0)], ss_, se_, 0, al0)
        bw = _BitWriter()
        _emit_ac_first(bw, own_blocks(ci), ss_, se_, al0, ac_codes)
        bw.flush()
        out.extend(bw.out)
    # ---- DC refinement: one raw bit per block, interleaved
    sos([(ci + 1, 0, 0) for ci in range(nc)], 0, 0, 1, 0)
    bw = _BitWriter()
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci in range(nc):
            sh, sv = samp[ci]
            for by in range(sv):
                for bx in range(sh):
                    dc = int(coef_grids[ci][my * sv + by, mx * sh + bx][0])
                    bw.write(dc & 1, 1)
    bw.flush()
    out.extend(bw.out)
    # ---- AC refinement scans to Al=0
    for ci in range(nc):
        sos([(ci + 1, 0, 0)], 1, 63, 1, 0)
        bw = _BitWriter()
        _emit_ac_refine(bw, own_blocks(ci), 1, 63, 0, ac_codes)
        bw.flush()
        out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


# ------------------------------------------------------- EXIF orientation

#: orientation -> (rot90 k counterclockwise, mirror-horizontally-first)
#: per the TIFF/EXIF 0x0112 semantics
_EXIF_TRANSFORMS = {
    1: (0, False), 2: (0, True), 3: (2, False), 4: (2, True),
    5: (3, True), 6: (3, False), 7: (1, True), 8: (1, False),
}


def exif_orientation(b: bytes) -> int:
    """EXIF orientation (1..8) from the first APP1 segment's IFD0, or 1
    when absent/malformed. Pure marker/TIFF walk — no entropy decode;
    real-world corpora carry camera rotations as METADATA, so perceptual
    pipelines must normalize before hashing or rotated duplicates never
    pair."""
    try:
        if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
            return 1
        pos = 2
        n = len(b)
        while pos + 4 <= n:
            if b[pos] != 0xFF:
                return 1
            marker = b[pos + 1]
            if marker == 0xFF:
                pos += 1
                continue
            if 0xD0 <= marker <= 0xD9 or marker == 0x01:
                pos += 2
                continue
            (seg_len,) = struct.unpack(">H", b[pos + 2 : pos + 4])
            if marker == 0xDA:  # scan: no EXIF past this point
                return 1
            if marker == 0xE1:
                seg = b[pos + 4 : pos + 2 + seg_len]
                if seg[:6] == b"Exif\x00\x00":
                    tiff = seg[6:]
                    if tiff[:2] == b"II":
                        end = "<"
                    elif tiff[:2] == b"MM":
                        end = ">"
                    else:
                        return 1
                    (magic,) = struct.unpack(end + "H", tiff[2:4])
                    if magic != 42:
                        return 1
                    (ifd0,) = struct.unpack(end + "I", tiff[4:8])
                    (cnt,) = struct.unpack(
                        end + "H", tiff[ifd0 : ifd0 + 2])
                    for e in range(cnt):
                        off = ifd0 + 2 + 12 * e
                        tag, typ = struct.unpack(
                            end + "HH", tiff[off : off + 4])
                        if tag == 0x0112 and typ == 3:
                            (val,) = struct.unpack(
                                end + "H", tiff[off + 8 : off + 10])
                            return val if 1 <= val <= 8 else 1
                return 1  # first APP1 wins, EXIF or not
            pos += 2 + seg_len
        return 1
    except Exception:
        return 1


def apply_orientation(w: int, h: int, ch: int, pixels, orientation: int):
    """Transform raw pixels to the upright view for an EXIF orientation.
    Returns (w, h, ch, bytearray) — identity for orientation 1."""
    import numpy as np

    k, mirror = _EXIF_TRANSFORMS.get(orientation, (0, False))
    if k == 0 and not mirror:
        return w, h, ch, pixels if isinstance(pixels, bytearray) else bytearray(pixels)
    arr = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(h, w, ch)
    if mirror:
        arr = arr[:, ::-1, :]
    if k:
        arr = np.rot90(arr, k)
    oh, ow = arr.shape[0], arr.shape[1]
    return ow, oh, ch, bytearray(np.ascontiguousarray(arr).tobytes())
