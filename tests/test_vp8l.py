"""VP8L (WebP-lossless) codec tests (r15).

Three tiers, mirroring the repo's codec-test doctrine:

1. ALWAYS-RUN: encoder↔decoder round trips over structured and random
   grids, malformed-input fuzz (None, never a throw), and the
   multimodal dispatch integration.
2. DIFFERENTIAL vs the system ``libwebp`` (ctypes), where present —
   BOTH directions: the reference encoder's real-world output (all four
   transforms, color cache, LZ77 short distances, meta prefix codes)
   must decode byte-identically to the reference decoder's own answer,
   and this repo's fixture encoder must be accepted byte-exactly by the
   reference decoder. The oracle is libwebp's DECODE of its own bytes
   (its lossless encoder defaults to ``exact=false`` and rewrites RGB
   under fully-transparent pixels, so the pre-encode input is NOT the
   right target).
3. A distance-map spot-probe: hand-built single-backref streams pin a
   sample of the 120-entry 2D distance table against libwebp.
"""

import ctypes
import random
import struct

import pytest

from seqspark.pipeline import vp8l


def _libwebp():
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    return lib


_LIB = _libwebp()
needs_libwebp = pytest.mark.skipif(_LIB is None, reason="no system libwebp")


def _ref_decode(data: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = _LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        return None
    out = ctypes.string_at(ptr, w.value * h.value * 4)
    _LIB.WebPFree(ptr)
    return w.value, h.value, out


def _ref_encode(w: int, h: int, rgba: bytes) -> bytes:
    out_ptr = ctypes.POINTER(ctypes.c_ubyte)()
    n = _LIB.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out_ptr))
    assert n > 0
    enc = ctypes.string_at(out_ptr, n)
    _LIB.WebPFree(out_ptr)
    return enc


def _cases(seed: int = 5):
    """Structured differential corpus: predictor-heavy gradients, raw
    noise, palettes at every packing width, LZ77-heavy repeats, varying
    alpha, and a large image that trips meta prefix codes."""
    import numpy as np

    rng = np.random.default_rng(seed)
    out = []
    w, h = 300, 200
    yy, xx = np.mgrid[0:h, 0:w]
    a = np.stack([(xx * 7 + yy) % 256, (yy * 3) % 256, (xx ^ yy) % 256,
                  np.full((h, w), 255)], -1).astype(np.uint8)
    a[50:100, 50:200] = rng.integers(0, 256, (50, 150, 4), dtype=np.uint8)
    a[120:180, 20:280, 3] = rng.integers(0, 256, (60, 260), dtype=np.uint8)
    out.append(("large-mixed", w, h, a.tobytes()))
    for ncol in (2, 3, 9, 16, 200):
        w, h = 37, 23
        pal = rng.integers(0, 256, (ncol, 4), dtype=np.uint8)
        idx = rng.integers(0, ncol, (h, w))
        out.append((f"palette-{ncol}", w, h, pal[idx].tobytes()))
    w, h = 160, 120
    base = np.cumsum(rng.integers(-2, 3, (h, w)), axis=1).astype(np.int32)
    a = np.stack([(base + 128) % 256, (base // 2 + 100) % 256,
                  (base // 3 + 60) % 256,
                  np.full((h, w), 255)], -1).astype(np.uint8)
    out.append(("smooth", w, h, a.tobytes()))
    w, h = 61, 47
    row = rng.integers(0, 256, (1, w, 4), dtype=np.uint8)
    out.append(("repeat", w, h, np.repeat(row, h, 0).tobytes()))
    for t in range(24):
        w = int(rng.integers(1, 50))
        h = int(rng.integers(1, 50))
        a = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        if t % 3 == 0:
            a[..., 3] = 255
        if t % 4 == 0:
            a = (a // 64) * 64
        out.append((f"fuzz-{t}", w, h, a.tobytes()))
    return out


def test_roundtrip_own_encoder():
    rng = random.Random(7)
    for (w, h) in ((1, 1), (3, 2), (16, 9), (40, 23), (65, 1), (1, 40)):
        for sg in (False, True):
            px = bytes(rng.randrange(256) for _ in range(w * h * 4))
            enc = vp8l.encode(w, h, px, subtract_green=sg)
            dec = vp8l.decode(enc)
            assert dec is not None and dec[:3] == (w, h, 4), (w, h, sg)
            assert bytes(dec[3]) == px, (w, h, sg)


def test_max_pixels_rejects_before_reconstruction():
    """r16-ADVICE: the ANMF composite path passes its canvas cap into
    vp8l.decode so a lying frame payload is rejected from the 5-byte
    header alone, before any pixel reconstruction."""
    rng = random.Random(3)
    px = bytes(rng.randrange(256) for _ in range(8 * 6 * 4))
    enc = vp8l.encode(8, 6, px)
    assert vp8l.decode(enc, max_pixels=47) is None  # 48 px > cap
    dec = vp8l.decode(enc, max_pixels=48)
    assert dec is not None and bytes(dec[3]) == px


def test_malformed_never_throws():
    rng = random.Random(11)
    px = bytes(rng.randrange(256) for _ in range(20 * 10 * 4))
    good = vp8l.encode(20, 10, px)
    # truncation at every granularity
    for cut in range(0, len(good), 7):
        vp8l.decode(good[:cut])
    # single-byte corruption across the file
    for pos in range(12, len(good), 5):
        bad = bytearray(good)
        bad[pos] ^= 0xFF
        out = vp8l.decode(bytes(bad))
        assert out is None or (out[0], out[1], out[2]) == (20, 10, 4)
    # junk inputs
    assert vp8l.decode(b"") is None
    assert vp8l.decode(b"RIFF\x00\x00\x00\x00WEBP") is None
    assert vp8l.decode(b"\x2f" + b"\x00" * 3) is None
    assert vp8l.decode(bytes(range(256)) * 4) is None


def test_hypothesis_fuzz_never_throws():
    from hypothesis import given, settings
    from hypothesis import strategies as hst

    @settings(max_examples=120, deadline=None)
    @given(hst.binary(min_size=0, max_size=300))
    def run(payload):
        for prefix in (b"", b"\x2f", b"RIFF\x40\x00\x00\x00WEBPVP8L"):
            out = vp8l.decode(prefix + payload)
            assert out is None or len(out) == 4

    run()


def test_multimodal_dispatch_and_resize():
    from seqspark.pipeline.multimodal import (
        _decode_any_pixels, _stdlib_image_meta, _stdlib_png_resize)

    rng = random.Random(3)
    px = bytes(rng.randrange(256) for _ in range(12 * 7 * 4))
    enc = vp8l.encode(12, 7, px)
    dec = _decode_any_pixels(enc)
    assert dec is not None and dec[:3] == (12, 7, 4)
    assert bytes(dec[3]) == px
    assert _stdlib_image_meta(enc) == (12, 7, 1)
    assert _stdlib_png_resize(enc, 6, 4) is not None


def test_cross_codec_pixel_identity():
    """The same RGBA grid through PNG and through VP8L must decode to
    the same raster — the TIFF==BMP==PNG cross-container pin extended
    to WebP."""
    import numpy as np

    from seqspark.pipeline.multimodal import _decode_any_pixels, _png_encode

    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, (11, 17, 4), dtype=np.uint8)
    px = a.tobytes()
    via_webp = _decode_any_pixels(vp8l.encode(17, 11, px))
    via_png = _decode_any_pixels(_png_encode(17, 11, 4, bytearray(px)))
    assert via_webp is not None and via_png is not None
    assert via_webp[:3] == via_png[:3] == (17, 11, 4)
    assert bytes(via_webp[3]) == bytes(via_png[3]) == px


def test_cross_container_dhash_webp_equals_tiff():
    """The WebP pixel fixture carries the same id-derived pattern as
    the TIFF one — the perceptual dHash must agree container-for-
    container (the TIFF==BMP==PNG pin extended to VP8L)."""
    from seqspark.pipeline.multimodal import (
        _decode_any_pixels, _dhash_of_pixels, real_tiff_pixel_asset_rows,
        real_webp_pixel_asset_rows)

    tiff = real_tiff_pixel_asset_rows(16)
    webp = real_webp_pixel_asset_rows(16)
    for (i, _m, tc, _x), (j, _m2, wc, _x2) in zip(tiff, webp):
        td = _decode_any_pixels(bytes(tc))
        wd = _decode_any_pixels(bytes(wc))
        th = _dhash_of_pixels(td[0], td[1], td[2], td[3], 8)
        wh = _dhash_of_pixels(wd[0], wd[1], wd[2], wd[3], 8)
        assert th == wh, (i, j)


def test_animated_webp_composition():
    """r15: ANMF/VP8L animation — offsets land on the right canvas
    cells, do-not-blend overwrites, dispose-to-background clears the
    rect for the NEXT frame, and alpha blending follows the spec
    formula. Truncation/corruption never throws."""
    from seqspark.pipeline.multimodal import (
        _webp_decode_frames, _webp_encode_anim)

    w, h = 10, 6
    red = bytes((255, 0, 0, 255)) * (w * h)
    # frame 2: 2x2 green at (4, 2), do-not-blend, dispose-to-background
    green = bytes((0, 255, 0, 255)) * 4
    # frame 3: full-canvas half-alpha blue, alpha-BLENDED over canvas
    blue = bytes((0, 0, 255, 128)) * (w * h)
    anim = _webp_encode_anim(w, h, [
        (0, 0, w, h, 0, 1, red),
        (4, 2, 2, 2, 1, 1, green),
        (0, 0, w, h, 0, 0, blue),
    ])
    dec = _webp_decode_frames(anim)
    assert dec is not None and (dec[0], dec[1]) == (w, h)
    f1, f2, f3 = [bytearray(f) for f in dec[2]]
    assert bytes(f1[0:4]) == bytes((255, 0, 0, 255))
    # frame 2: green rect over red background
    at = lambda fr, x, y: bytes(fr[4 * (y * w + x):4 * (y * w + x) + 4])
    assert at(f2, 4, 2) == bytes((0, 255, 0, 255))
    assert at(f2, 3, 2) == bytes((255, 0, 0, 255))
    # frame 3: the disposed rect was TRANSPARENT before the blue frame,
    # so there the blue is composited over nothing (keeps 128 alpha);
    # elsewhere it blends with opaque red per the spec formula
    assert at(f3, 4, 2) == bytes((0, 0, 255, 128))
    da, sa = 255, 128
    oa = sa + da * (255 - sa) // 255
    r_mix = (255 * da * (255 - sa) // 255) // oa
    b_mix = (255 * sa) // oa
    assert at(f3, 0, 0) == bytes((r_mix, 0, b_mix, oa))
    # r16 (ADVICE): a crafted ANMF whose rect starts PAST the canvas
    # (fx >= w or fy >= h) with dispose-to-background used to build a
    # negative byte count in the rect clear and raise ValueError —
    # must compose (clearing nothing) and never throw
    for fx, fy in ((12, 0), (0, 8), (12, 8)):
        off = _webp_decode_frames(_webp_encode_anim(w, h, [
            (0, 0, w, h, 0, 1, red),
            (fx, fy, 2, 2, 1, 1, green),
            (0, 0, w, h, 0, 1, red),
        ]))
        assert off is not None and len(off[2]) == 3, (fx, fy)
        assert bytes(off[2][1]) == bytes(off[2][0]), (fx, fy)
    # partially-overhanging rect with dispose: clamps to the canvas
    part = _webp_decode_frames(_webp_encode_anim(w, h, [
        (0, 0, w, h, 0, 1, red),
        (8, 4, 4, 4, 1, 1, bytes((0, 255, 0, 255)) * 16),
        (0, 0, 1, 1, 0, 1, bytes((255, 0, 0, 255))),
    ]))
    assert part is not None
    pf = part[2]
    assert at(bytearray(pf[1]), 8, 4) == bytes((0, 255, 0, 255))
    assert at(bytearray(pf[2]), 8, 4) == bytes((0, 0, 0, 0))  # disposed
    assert at(bytearray(pf[2]), 7, 4) == bytes((255, 0, 0, 255))
    # never throws on truncation / corruption
    for cut in range(0, len(anim), 11):
        _webp_decode_frames(anim[:cut])
    for pos in range(12, len(anim), 9):
        bad = bytearray(anim)
        bad[pos] ^= 0xFF
        _webp_decode_frames(bytes(bad))
    # first composed frame is the still-decode answer
    from seqspark.pipeline.multimodal import _decode_any_pixels

    still = _decode_any_pixels(anim)
    assert still is not None and bytes(still[3]) == bytes(dec[2][0])


@needs_libwebp
class TestLibwebpDifferential:
    def test_reference_encoder_to_our_decoder(self):
        """libwebp's real-world lossless output (transforms, cache,
        LZ77 short distances, meta prefix codes on the large case) must
        decode byte-identically to libwebp's own decoder."""
        for name, w, h, px in _cases():
            enc = _ref_encode(w, h, px)
            want = _ref_decode(enc)
            assert want is not None and want[:2] == (w, h), name
            dec = vp8l.decode(enc)
            assert dec is not None, name
            assert dec[:3] == (w, h, 4), name
            assert bytes(dec[3]) == want[2], name

    def test_our_encoder_to_reference_decoder(self):
        rng = random.Random(13)
        for (w, h) in ((1, 1), (5, 4), (31, 17), (64, 3)):
            for sg in (False, True):
                px = bytes(rng.randrange(256) for _ in range(w * h * 4))
                enc = vp8l.encode(w, h, px, subtract_green=sg)
                got = _ref_decode(enc)
                assert got is not None and got[:2] == (w, h), (w, h, sg)
                assert got[2] == px, (w, h, sg)

    def test_hypothesis_differential(self):
        """Property form of the differential: ANY small RGBA grid
        through libwebp's lossless encoder must decode byte-identically
        to libwebp's own decoder (covers whatever transform/cache/LZ77
        mix the reference encoder picks for each shape)."""
        import numpy as np
        from hypothesis import given, settings
        from hypothesis import strategies as hst

        @settings(max_examples=40, deadline=None)
        @given(hst.integers(1, 40), hst.integers(1, 40),
               hst.integers(0, 2**32 - 1), hst.sampled_from(
                   ["noise", "quantized", "palette", "gradient"]))
        def run(w, h, seed, kind):
            rng = np.random.default_rng(seed)
            if kind == "noise":
                a = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
            elif kind == "quantized":
                a = (rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
                     // 64) * 64
            elif kind == "palette":
                pal = rng.integers(0, 256, (5, 4), dtype=np.uint8)
                a = pal[rng.integers(0, 5, (h, w))]
            else:
                yy, xx = np.mgrid[0:h, 0:w]
                a = np.stack([(xx * 9) % 256, (yy * 7) % 256,
                              (xx + yy) % 256,
                              np.full((h, w), 255)], -1).astype(np.uint8)
            enc = _ref_encode(w, h, a.tobytes())
            want = _ref_decode(enc)
            dec = vp8l.decode(enc)
            assert dec is not None and dec[:3] == (w, h, 4)
            assert bytes(dec[3]) == want[2]

        run()

    def test_real_system_webp_is_lossy_and_honestly_none(self):
        """The system python.webp is VP8X+ALPH+VP8 (lossy) — exactly
        the subset that must stay out of the VP8L path: vp8l.decode
        returns None. (Since r16 the lossy path decodes it for real —
        seqspark.pipeline.vp8 + the ALPH plane, pinned against libwebp
        in tests/test_vp8_lossy.py — but never through THIS codec.)"""
        import glob
        import os

        hits = glob.glob(
            "/root/.pyenv/versions/*/lib/python*/test/test_email/data/"
            "python.webp")
        if not hits:
            pytest.skip("no system webp fixture")
        b = open(hits[0], "rb").read()
        assert b[:4] == b"RIFF" and b[8:12] == b"WEBP"
        assert vp8l.decode(b) is None
        # but libwebp confirms it IS a real webp (sanity on the fixture)
        assert _ref_decode(b) is not None

    def test_distance_map_spot_probe(self):
        """Hand-built single-backref streams: for a sample of the 120
        short-distance codes, our decoder and libwebp must copy the
        SAME source pixel (pins the 2D distance map)."""
        from seqspark.pipeline.vp8l import (
            _Bw, _canonical_codes, _huff_lengths, _put_code, _write_huffman)

        def lz77_parts(value):
            v = value - 1
            if v < 4:
                return v, 0, 0
            for code in range(4, 40):
                extra = (code - 2) >> 1
                offset = (2 + (code & 1)) << extra
                if offset <= v < offset + (1 << extra):
                    return code, extra, v - offset
            raise ValueError(value)

        W, H, P = 64, 10, 600

        def probe(dist_code):
            bw = _Bw()
            bw.write(W - 1, 14)
            bw.write(H - 1, 14)
            bw.write(0, 1)
            bw.write(0, 3)
            bw.write(0, 1)  # no transforms
            bw.write(0, 1)  # no cache
            bw.write(0, 1)  # no meta
            gl = [0] * 280
            gl[7] = 1
            gl[256] = 1
            glen = _huff_lengths(gl)
            gcode = _canonical_codes(glen)
            _write_huffman(bw, glen)
            rl = [1] * 256
            rlen = _huff_lengths(rl)
            rcode = _canonical_codes(rlen)
            _write_huffman(bw, rlen)
            bl = [0] * 256
            for v in range(4):
                bl[v] = 1
            blen = _huff_lengths(bl)
            bcode = _canonical_codes(blen)
            _write_huffman(bw, blen)
            al = [0] * 256
            al[255] = 1
            _write_huffman(bw, al)
            dc, dbits, dval = lz77_parts(dist_code)
            dl = [0] * 40
            dl[dc] = 1
            _write_huffman(bw, dl)
            for i in range(W * H):
                if i == P:
                    _put_code(bw, gcode[256], glen[256])
                    if dbits:
                        bw.write(dval, dbits)
                    continue
                _put_code(bw, gcode[7], glen[7])
                _put_code(bw, rcode[i & 0xFF], rlen[i & 0xFF])
                _put_code(bw, bcode[i >> 8], blen[i >> 8])
            payload = b"\x2f" + bw.done()
            chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
            if len(payload) & 1:
                chunk += b"\x00"
            return (b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP"
                    + chunk)

        for k in (1, 2, 4, 9, 17, 35, 64, 99, 104, 110, 118, 120):
            data = probe(k)
            want = _ref_decode(data)
            assert want is not None, k
            dec = vp8l.decode(data)
            assert dec is not None, k
            i = 4 * P
            assert bytes(dec[3][i:i + 4]) == want[2][i:i + 4], k
