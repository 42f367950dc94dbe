"""VP8 (lossy WebP) key-frame decoder verification (r16, verdict #8):

1. FROZEN fixture: a committed 124-byte lossy WebP decodes to frozen
   Y/U/V digests (filtered + unfiltered) with no external dependency —
   the decoder is pinned even where libwebp is absent.
2. DIFFERENTIAL vs the system libwebp (ctypes), where present — the
   same two-sided discipline as the VP8L codec: libwebp ENCODES our
   deterministic images across qualities, filter types (normal/simple/
   off), sharpness, segments, token-partition counts and methods; our
   Y/U/V planes must equal libwebp's advanced-API YUV output
   BYTE-EXACT, both with and without the loop filter
   (bypass_filtering isolates reconstruction from the filter).
3. The real-world VP8X+ALPH+VP8 fixture shipped with CPython: the
   ALPH plane must match libwebp's alpha byte-exact and the RGB
   conversion must land within a small dHash distance (we use integer
   BT.601 + nearest chroma upsampling, not libwebp's fancy bilinear
   upsampler — the dedup-relevant signal is what's pinned).
4. Malformed-input fuzz: truncation at every offset, dense byte flips
   and junk must never raise (None or a well-shaped tuple).
"""

import ctypes
import hashlib
import random
import struct

import pytest

from seqspark.pipeline import vp8

# -------------------------------------------------- frozen no-dependency pin

FIXTURE = bytes.fromhex(
    "52494646740000005745425056503820680000003004009d012a180010003ed1"
    "58a64c282523a2300801001a096c009d3284701d20006051ffdc58cd773800fe"
    "f4537cd861b4409d752bd2cf991649699334daf2d5c84f0e2c7d295166a2f56a"
    "1ae838528d475ee0935bf1d55be0bcfe646f185ef700885a3f180000"
)
DIGEST = "dd35915b11ff0637c643895f780af0ea9087622c10ca76a5ed48ade09014fe42"
DIGEST_NF = "2479334707ee57f598623e2d3f1bb2c493bb5973e071cd847f6d89e5410ba9e9"


def _payload(webp: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(webp):
        fcc = webp[pos:pos + 4]
        (sz,) = struct.unpack_from("<I", webp, pos + 4)
        if fcc == b"VP8 ":
            return webp[pos + 8:pos + 8 + sz]
        pos += 8 + sz + (sz & 1)
    raise AssertionError("no VP8 chunk")


def test_frozen_fixture_digests():
    for filtered, want in ((True, DIGEST), (False, DIGEST_NF)):
        out = vp8.decode_yuv(_payload(FIXTURE), filtered=filtered)
        assert out is not None and out[:2] == (24, 16)
        dig = hashlib.sha256(out[2] + out[3] + out[4]).hexdigest()
        assert dig == want, filtered
    rgba = vp8.decode(_payload(FIXTURE))
    assert rgba is not None and rgba[:3] == (24, 16, 4)
    assert len(rgba[3]) == 24 * 16 * 4


def test_fuzz_never_throws():
    pay = _payload(FIXTURE)
    for cut in range(len(pay) + 1):
        r = vp8.decode_yuv(pay[:cut])
        assert r is None or len(r) == 5
    rng = random.Random(11)
    for pos in range(len(pay)):
        bad = bytearray(pay)
        bad[pos] ^= 1 << rng.randrange(8)
        r = vp8.decode_yuv(bytes(bad))
        assert r is None or len(r) == 5
    for junk in (b"", b"\x00" * 64, bytes(range(256)) * 4,
                 b"\x9d\x01\x2a" * 20):
        r = vp8.decode_yuv(junk)
        assert r is None or len(r) == 5
    # interframe tag (low bit set) is an honest None, not a guess
    inter = bytearray(pay)
    inter[0] |= 1
    assert vp8.decode_yuv(bytes(inter)) is None


def test_hypothesis_junk_never_throws():
    from hypothesis import given, settings
    from hypothesis import strategies as hst

    @settings(max_examples=120, deadline=None)
    @given(hst.binary(min_size=0, max_size=200))
    def run(payload):
        for prefix in (b"", _payload(FIXTURE)[:10], b"\x00\x00\x00"):
            r = vp8.decode_yuv(prefix + payload)
            assert r is None or len(r) == 5

    run()


# ------------------------------------------------------- libwebp differential

def _libwebp():
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
    return lib


_LIB = _libwebp()
needs_libwebp = pytest.mark.skipif(_LIB is None, reason="no system libwebp")


class _Features(ctypes.Structure):
    _fields_ = [("width", ctypes.c_int), ("height", ctypes.c_int),
                ("has_alpha", ctypes.c_int), ("has_animation", ctypes.c_int),
                ("format", ctypes.c_int), ("pad", ctypes.c_uint32 * 5)]


class _Options(ctypes.Structure):
    _fields_ = [("bypass_filtering", ctypes.c_int),
                ("no_fancy_upsampling", ctypes.c_int),
                ("use_cropping", ctypes.c_int),
                ("crop_left", ctypes.c_int), ("crop_top", ctypes.c_int),
                ("crop_width", ctypes.c_int), ("crop_height", ctypes.c_int),
                ("use_scaling", ctypes.c_int),
                ("scaled_width", ctypes.c_int),
                ("scaled_height", ctypes.c_int),
                ("use_threads", ctypes.c_int),
                ("dithering_strength", ctypes.c_int),
                ("flip", ctypes.c_int),
                ("alpha_dithering_strength", ctypes.c_int),
                ("pad", ctypes.c_uint32 * 5)]


class _RGBABuf(ctypes.Structure):
    _fields_ = [("rgba", ctypes.POINTER(ctypes.c_ubyte)),
                ("stride", ctypes.c_int), ("size", ctypes.c_size_t)]


class _YUVABuf(ctypes.Structure):
    _fields_ = [("y", ctypes.POINTER(ctypes.c_ubyte)),
                ("u", ctypes.POINTER(ctypes.c_ubyte)),
                ("v", ctypes.POINTER(ctypes.c_ubyte)),
                ("a", ctypes.POINTER(ctypes.c_ubyte)),
                ("y_stride", ctypes.c_int), ("u_stride", ctypes.c_int),
                ("v_stride", ctypes.c_int), ("a_stride", ctypes.c_int),
                ("y_size", ctypes.c_size_t), ("u_size", ctypes.c_size_t),
                ("v_size", ctypes.c_size_t), ("a_size", ctypes.c_size_t)]


class _BufUnion(ctypes.Union):
    _fields_ = [("RGBA", _RGBABuf), ("YUVA", _YUVABuf)]


class _DecBuffer(ctypes.Structure):
    _fields_ = [("colorspace", ctypes.c_int), ("width", ctypes.c_int),
                ("height", ctypes.c_int),
                ("is_external_memory", ctypes.c_int),
                ("u", _BufUnion), ("pad", ctypes.c_uint32 * 4),
                ("private_memory", ctypes.POINTER(ctypes.c_ubyte))]


class _DecConfig(ctypes.Structure):
    _fields_ = [("input", _Features), ("output", _DecBuffer),
                ("options", _Options)]


class _EncConfig(ctypes.Structure):
    _fields_ = [("lossless", ctypes.c_int), ("quality", ctypes.c_float),
                ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
                ("target_size", ctypes.c_int),
                ("target_PSNR", ctypes.c_float),
                ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
                ("filter_strength", ctypes.c_int),
                ("filter_sharpness", ctypes.c_int),
                ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
                ("alpha_compression", ctypes.c_int),
                ("alpha_filtering", ctypes.c_int),
                ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
                ("show_compressed", ctypes.c_int),
                ("preprocessing", ctypes.c_int),
                ("partitions", ctypes.c_int),
                ("partition_limit", ctypes.c_int),
                ("emulate_jpeg_size", ctypes.c_int),
                ("thread_level", ctypes.c_int),
                ("low_memory", ctypes.c_int),
                ("near_lossless", ctypes.c_int), ("exact", ctypes.c_int),
                ("use_delta_palette", ctypes.c_int),
                ("use_sharp_yuv", ctypes.c_int),
                ("qmin", ctypes.c_int), ("qmax", ctypes.c_int),
                ("pad", ctypes.c_uint32 * 5)]


class _MemoryWriter(ctypes.Structure):
    _fields_ = [("mem", ctypes.POINTER(ctypes.c_ubyte)),
                ("size", ctypes.c_size_t), ("max_size", ctypes.c_size_t),
                ("pad", ctypes.c_uint32 * 1)]


class _Picture(ctypes.Structure):
    _fields_ = [("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
                ("width", ctypes.c_int), ("height", ctypes.c_int),
                ("y", ctypes.POINTER(ctypes.c_ubyte)),
                ("u", ctypes.POINTER(ctypes.c_ubyte)),
                ("v", ctypes.POINTER(ctypes.c_ubyte)),
                ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
                ("a", ctypes.POINTER(ctypes.c_ubyte)),
                ("a_stride", ctypes.c_int), ("pad1", ctypes.c_uint32 * 2),
                ("argb", ctypes.POINTER(ctypes.c_uint32)),
                ("argb_stride", ctypes.c_int),
                ("pad2", ctypes.c_uint32 * 3),
                ("writer", ctypes.c_void_p),
                ("custom_ptr", ctypes.c_void_p),
                ("extra_info_type", ctypes.c_int),
                ("extra_info", ctypes.POINTER(ctypes.c_ubyte)),
                ("stats", ctypes.c_void_p), ("error_code", ctypes.c_int),
                ("progress_hook", ctypes.c_void_p),
                ("user_data", ctypes.c_void_p),
                ("pad3", ctypes.c_uint32 * 3),
                ("pad4", ctypes.POINTER(ctypes.c_ubyte)),
                ("pad5", ctypes.POINTER(ctypes.c_ubyte)),
                ("pad6", ctypes.c_uint32 * 8),
                ("memory_", ctypes.c_void_p),
                ("memory_argb_", ctypes.c_void_p),
                ("pad7", ctypes.c_void_p * 2)]


_MODE_YUV = 11


def _dec_abi():
    for v in (0x0209, 0x0208, 0x0207, 0x020A):
        if _LIB.WebPInitDecoderConfigInternal(ctypes.byref(_DecConfig()), v):
            return v
    return None


def _enc_abi():
    for v in (0x020F, 0x020E, 0x0210, 0x020D):
        cfg = _EncConfig()
        ok = _LIB.WebPConfigInitInternal(
            ctypes.byref(cfg), 0, ctypes.c_float(75.0), v)
        if ok and _LIB.WebPPictureInitInternal(ctypes.byref(_Picture()), v):
            return v
    return None


def _enc_simple(w, h, rgba, q):
    ptr = ctypes.POINTER(ctypes.c_ubyte)()
    n = _LIB.WebPEncodeRGBA(rgba, w, h, w * 4, ctypes.c_float(q),
                            ctypes.byref(ptr))
    assert n > 0
    out = ctypes.string_at(ptr, n)
    _LIB.WebPFree(ptr)
    return out


def _enc_advanced(abi, w, h, rgba, q, **kw):
    cfg = _EncConfig()
    assert _LIB.WebPConfigInitInternal(
        ctypes.byref(cfg), 0, ctypes.c_float(q), abi)
    for k, v in kw.items():
        setattr(cfg, k, v)
    assert _LIB.WebPValidateConfig(ctypes.byref(cfg))
    pic = _Picture()
    assert _LIB.WebPPictureInitInternal(ctypes.byref(pic), abi)
    pic.width, pic.height = w, h
    pic.use_argb = 1
    assert _LIB.WebPPictureImportRGBA(ctypes.byref(pic), rgba, w * 4)
    wr = _MemoryWriter()
    _LIB.WebPMemoryWriterInit(ctypes.byref(wr))
    pic.writer = ctypes.cast(_LIB.WebPMemoryWrite, ctypes.c_void_p)
    pic.custom_ptr = ctypes.cast(ctypes.byref(wr), ctypes.c_void_p)
    assert _LIB.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    out = ctypes.string_at(wr.mem, wr.size)
    _LIB.WebPPictureFree(ctypes.byref(pic))
    _LIB.WebPMemoryWriterClear(ctypes.byref(wr))
    return out


def _ref_yuv(abi, data, bypass_filtering):
    cfg = _DecConfig()
    assert _LIB.WebPInitDecoderConfigInternal(ctypes.byref(cfg), abi)
    cfg.options.bypass_filtering = 1 if bypass_filtering else 0
    cfg.output.colorspace = _MODE_YUV
    assert _LIB.WebPDecode(data, len(data), ctypes.byref(cfg)) == 0
    w, h = cfg.output.width, cfg.output.height
    yb = cfg.output.u.YUVA
    cw, ch = (w + 1) // 2, (h + 1) // 2
    y = b"".join(ctypes.string_at(
        ctypes.addressof(yb.y.contents) + r * yb.y_stride, w)
        for r in range(h))
    u = b"".join(ctypes.string_at(
        ctypes.addressof(yb.u.contents) + r * yb.u_stride, cw)
        for r in range(ch))
    v = b"".join(ctypes.string_at(
        ctypes.addressof(yb.v.contents) + r * yb.v_stride, cw)
        for r in range(ch))
    _LIB.WebPFreeDecBuffer(ctypes.byref(cfg.output))
    return w, h, y, u, v


def _images(seed=7):
    rng = random.Random(seed)
    out = []
    w, h = 64, 48
    px = bytearray()
    for yy in range(h):
        for xx in range(w):
            px += bytes((xx * 4 % 256, yy * 5 % 256,
                         (xx + yy) * 3 % 256, 255))
    out.append(("grad", w, h, bytes(px)))
    out.append(("flat", 32, 32, bytes((90, 140, 200, 255)) * 1024))
    w, h = 48, 32
    out.append(("noise", w, h, bytes(
        rng.randrange(256) if (i + 1) % 4 else 255
        for i in range(w * h * 4))))
    w, h = 20, 12
    px = bytearray()
    for yy in range(h):
        for xx in range(w):
            v = 255 if (xx // 4 + yy // 4) % 2 else 0
            px += bytes((v, v // 2, 255 - v, 255))
    out.append(("checker", w, h, bytes(px)))
    w, h = 65, 33
    out.append(("noise65x33", w, h, bytes(
        rng.randrange(256) if (i + 1) % 4 else 255
        for i in range(w * h * 4))))
    return out


@needs_libwebp
class TestLibwebpDifferential:
    def test_simple_api_planes_byte_exact(self):
        abi = _dec_abi()
        assert abi is not None
        for name, w, h, rgba in _images():
            for q in (10.0, 50.0, 75.0, 95.0):
                enc = _enc_simple(w, h, rgba, q)
                pay = _payload(enc)
                for bypass in (True, False):
                    ref = _ref_yuv(abi, enc, bypass)
                    got = vp8.decode_yuv(pay, filtered=not bypass)
                    assert got is not None, (name, q, bypass)
                    assert got == ref, (name, q, bypass)

    def test_encoder_variants_byte_exact(self):
        """Simple/none filter, sharpness, token partitions, segments,
        sns, methods 0/6 — every decode path the encoder can emit."""
        dabi, eabi = _dec_abi(), _enc_abi()
        assert dabi is not None and eabi is not None
        variants = [
            dict(filter_type=0, filter_strength=40),      # simple filter
            dict(filter_sharpness=5, filter_strength=50),
            dict(partitions=2),                           # 4 partitions
            dict(partitions=3, segments=4, sns_strength=90),
            dict(filter_strength=0, autofilter=0),        # filter off
            dict(method=0),
            dict(method=6, pass_=5),
        ]
        for name, w, h, rgba in _images():
            for q in (25.0, 75.0):
                for kw in variants:
                    enc = _enc_advanced(eabi, w, h, rgba, q, **kw)
                    pay = _payload(enc)
                    for bypass in (True, False):
                        ref = _ref_yuv(dabi, enc, bypass)
                        got = vp8.decode_yuv(pay, filtered=not bypass)
                        assert got == ref, (name, q, kw, bypass)

    def test_real_world_alpha_webp(self):
        """CPython's python.webp is VP8X+ALPH+VP8: the decoded alpha
        plane must equal libwebp's byte-for-byte (ALPH is lossless);
        RGB lands within a small dHash distance (our integer BT.601 +
        nearest upsampling vs libwebp's fancy upsampler)."""
        import glob

        from seqspark.pipeline.multimodal import (
            _decode_any_pixels, _dhash_of_pixels)

        hits = glob.glob(
            "/root/.pyenv/versions/*/lib/python*/test/test_email/data/"
            "python.webp")
        if not hits:
            pytest.skip("no system webp fixture")
        b = open(hits[0], "rb").read()
        dec = _decode_any_pixels(b)
        assert dec is not None and dec[2] == 4
        w = ctypes.c_int()
        h = ctypes.c_int()
        ptr = _LIB.WebPDecodeRGBA(b, len(b), ctypes.byref(w),
                                  ctypes.byref(h))
        ref = ctypes.string_at(ptr, w.value * h.value * 4)
        _LIB.WebPFree(ptr)
        assert (dec[0], dec[1]) == (w.value, h.value)
        ours = bytes(dec[3])
        assert ours[3::4] == ref[3::4]  # alpha byte-exact
        d1 = _dhash_of_pixels(dec[0], dec[1], 4, bytearray(ours), 8)
        d2 = _dhash_of_pixels(w.value, h.value, 4, bytearray(ref), 8)
        assert bin(d1 ^ d2).count("1") <= 8

    def test_fuzz_real_encodes_never_throw(self):
        name, w, h, rgba = _images()[2]
        pay = _payload(_enc_simple(w, h, rgba, 50.0))
        rng = random.Random(3)
        for _ in range(200):
            bad = bytearray(pay)
            for _k in range(rng.randrange(1, 4)):
                bad[rng.randrange(len(bad))] ^= 1 << rng.randrange(8)
            r = vp8.decode_yuv(bytes(bad))
            assert r is None or len(r) == 5


class TestMultimodalDispatch:
    def test_lossy_webp_reaches_pixels(self):
        from seqspark.pipeline.multimodal import (
            _decode_any_pixels, _stdlib_png_resize)

        dec = _decode_any_pixels(FIXTURE)
        assert dec is not None and (dec[0], dec[1], dec[2]) == (24, 16, 4)
        # and the resize kernel accepts it now (was a raise before r16)
        assert _stdlib_png_resize(FIXTURE, 12, 8) is not None

    def test_alph_filters_roundtrip(self):
        """ALPH unfilter parity: apply each container filter forward in
        the test, then _alph_decode(method=0) must invert it exactly —
        including the spec's above-pixel seeding of row starts."""
        from seqspark.pipeline.multimodal import _alph_decode

        rng = random.Random(5)
        w, h = 9, 7
        alpha = bytes(rng.randrange(256) for _ in range(w * h))

        def fwd(filt):
            out = bytearray(w * h)
            for y in range(h):
                for x in range(w):
                    i = y * w + x
                    if filt == 1:
                        pred = (alpha[i - 1] if x > 0
                                else (alpha[i - w] if y > 0 else 0))
                    elif filt == 2:
                        pred = (alpha[i - w] if y > 0
                                else (alpha[i - 1] if x > 0 else 0))
                    else:
                        if y == 0:
                            pred = alpha[i - 1] if x > 0 else 0
                        elif x == 0:
                            pred = alpha[i - w]
                        else:
                            g = (alpha[i - 1] + alpha[i - w]
                                 - alpha[i - w - 1])
                            pred = max(0, min(255, g))
                    out[i] = (alpha[i] - pred) & 0xFF
            return bytes(out)

        assert _alph_decode(bytes([0]) + alpha, w, h) == alpha
        for filt in (1, 2, 3):
            body = bytes([filt << 2]) + fwd(filt)
            assert _alph_decode(body, w, h) == alpha, filt
        # malformed: short body / bad method
        assert _alph_decode(b"", w, h) is None
        assert _alph_decode(bytes([2]) + alpha, w, h) is None
        assert _alph_decode(bytes([0]) + alpha[:10], w, h) is None


def test_animated_webp_with_lossy_frames():
    """r16: ANMF frames carrying `VP8 ` (+optional ALPH) payloads now
    compose — the first frame must equal the still decode of the same
    bitstream, the ALPH frame must land alpha-exact on the canvas, and
    truncation/corruption still never throws. (No libwebpdemux in this
    container, so the per-frame payload exactness pin is the still
    differential above.)"""
    from seqspark.pipeline.multimodal import (
        _WEBP_LOSSY_FILES, _webp_decode_frames, _webp_lossy_pixels)

    def chunk(cc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cc + struct.pack("<I", len(body)) + body + pad

    def payload_chunks(webp):
        out = b""
        pos = 12
        while pos + 8 <= len(webp):
            fcc = webp[pos:pos + 4]
            (sz,) = struct.unpack_from("<I", webp, pos + 4)
            if fcc in (b"ALPH", b"VP8 "):
                out += chunk(fcc, webp[pos + 8:pos + 8 + sz])
            pos += 8 + sz + (sz & 1)
        return out

    def anmf(fx, fy, fw, fh, flags, sub):
        hdr = ((fx // 2).to_bytes(3, "little")
               + (fy // 2).to_bytes(3, "little")
               + (fw - 1).to_bytes(3, "little")
               + (fh - 1).to_bytes(3, "little")
               + (40).to_bytes(3, "little") + bytes((flags,)))
        return chunk(b"ANMF", hdr + sub)

    big = bytes.fromhex(_WEBP_LOSSY_FILES[3])    # 48x32
    alpha_sm = bytes.fromhex(_WEBP_LOSSY_FILES[2])  # 16x16 with ALPH
    w, h = 48, 32
    vp8x = bytes((0x12,)) + b"\x00\x00\x00" + (
        (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"))
    body = chunk(b"VP8X", vp8x) + chunk(b"ANIM", struct.pack("<IH", 0, 0))
    body += anmf(0, 0, 48, 32, 0x02, payload_chunks(big))
    body += anmf(16, 8, 16, 16, 0x01, payload_chunks(alpha_sm))
    anim = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body

    dec = _webp_decode_frames(anim)
    assert dec is not None and (dec[0], dec[1], len(dec[2])) == (48, 32, 2)
    still = _webp_lossy_pixels(big)
    assert bytes(dec[2][0]) == bytes(still[3])
    # the ALPH frame's alpha landed on the canvas (blended region)
    sm = _webp_lossy_pixels(alpha_sm)
    f2 = dec[2][1]
    # spot-check a fully-opaque pixel of the small frame overwrote
    sa = bytes(sm[3])
    for yy in range(16):
        for xx in range(16):
            if sa[4 * (yy * 16 + xx) + 3] == 255:
                i = 4 * ((8 + yy) * 48 + (16 + xx))
                j = 4 * (yy * 16 + xx)
                assert f2[i:i + 4] == sa[j:j + 4]
                break
        else:
            continue
        break
    # never throws on truncation / corruption
    for cut in range(0, len(anim), 17):
        _webp_decode_frames(anim[:cut])
    rng = random.Random(2)
    for _ in range(120):
        bad = bytearray(anim)
        bad[rng.randrange(12, len(bad))] ^= 0xFF
        _webp_decode_frames(bytes(bad))


@needs_libwebp
def test_hypothesis_differential_yuv_exact():
    """Property form of the differential: ARBITRARY small images through
    the reference encoder at arbitrary quality must decode plane-exact,
    both filter modes. Catches interactions the structured corpus
    doesn't enumerate (odd dims x quality x content class)."""
    from hypothesis import given, settings
    from hypothesis import strategies as hst

    abi = _dec_abi()
    assert abi is not None

    @settings(max_examples=25, deadline=None)
    @given(
        hst.integers(min_value=1, max_value=40),
        hst.integers(min_value=1, max_value=40),
        hst.integers(min_value=0, max_value=100),
        hst.randoms(use_true_random=False),
    )
    def run(w, h, q, rng):
        mode = rng.randrange(3)
        px = bytearray()
        for y in range(h):
            for x in range(w):
                if mode == 0:
                    rgb = (rng.randrange(256), rng.randrange(256),
                           rng.randrange(256))
                elif mode == 1:
                    rgb = ((x * 9 + y) % 256, (y * 7) % 256, (x ^ y) % 256)
                else:
                    v = 255 if (x // 3 + y // 3) % 2 else 0
                    rgb = (v, v, 255 - v)
                px += bytes(rgb) + b"\xff"
        enc = _enc_simple(w, h, bytes(px), float(q))
        pay = _payload(enc)
        for bypass in (True, False):
            ref = _ref_yuv(abi, enc, bypass)
            got = vp8.decode_yuv(pay, filtered=not bypass)
            assert got == ref, (w, h, q, mode, bypass)

    run()
