"""FLAC codec (r13): encoder→decoder round-trips over the subframe /
stereo / bit-depth matrix, hand-rolled bitstreams for the decoder-only
paths (LPC, Rice2, escaped partitions, partition orders, wasted bits),
CRC rejection, and end-to-end parity: `audio_features` of a FLAC asset
equals `audio_features` of the WAV holding the SAME samples."""

from __future__ import annotations

import io
import math
import random
import struct
import wave

import numpy as np
import pytest

from seqspark.pipeline import flac
from seqspark.pipeline.flac import _BitWriter, _crc8, _crc16
from seqspark.pipeline.multimodal import (
    _audio_pcm,
    fixture_pcm,
    make_real_flac_assets,
    real_flac_asset_rows,
)


def _pcm(i=0, n=2000, nch=1, amp=9000):
    rng = random.Random(i)
    return [
        [
            int(amp * math.sin(k * (0.02 + 0.01 * c) + i))
            + rng.randint(-40, 40)
            for k in range(n)
        ]
        for c in range(nch)
    ]


class TestRoundTrip:
    @pytest.mark.parametrize("bits", [8, 16])
    @pytest.mark.parametrize("nch", [1, 2])
    def test_exact(self, bits, nch):
        amp = 100 if bits == 8 else 9000
        chans = _pcm(3, 1500, nch, amp)
        b = flac.encode(8000, nch, bits, chans, block_size=512)
        rate, got_nch, got_bits, got = flac.decode(b)
        assert (rate, got_nch, got_bits) == (8000, nch, bits)
        assert got == chans

    def test_mid_side_exact(self):
        chans = _pcm(5, 1333, 2)
        b = flac.encode(16000, 2, 16, chans, block_size=256, mid_side=True)
        assert flac.decode(b)[3] == chans

    def test_constant_and_verbatim(self):
        assert flac.decode(flac.encode(8000, 1, 16, [[42] * 999]))[3] == [
            [42] * 999
        ]
        rng = random.Random(11)
        noise = [rng.randint(-30000, 30000) for _ in range(700)]
        b = flac.encode(8000, 1, 16, [noise], block_size=256)
        assert flac.decode(b)[3] == [noise]

    def test_multi_frame_and_partial_tail(self):
        chans = _pcm(9, 4097, 1)  # 17 blocks of 256 + 1-sample tail
        b = flac.encode(8000, 1, 16, chans, block_size=256)
        assert flac.decode(b)[3] == chans

    def test_compresses_tonal_audio(self):
        chans = _pcm(2, 8000, 1)
        b = flac.encode(8000, 1, 16, chans, block_size=1024)
        assert len(b) < 0.75 * 16000  # < 75% of raw int16

    def test_meta(self):
        chans = _pcm(1, 777, 2)
        b = flac.encode(44100, 2, 16, chans)
        assert flac.meta(b) == (2, 16, 777)
        assert flac.meta(b"\x00" * 64) is None
        assert flac.meta(b"fLaC") is None


class TestRejection:
    def test_frame_crc(self):
        b = bytearray(flac.encode(8000, 1, 16, _pcm(4, 2000, 1)))
        b[-3] ^= 0x55  # inside the last frame body
        assert flac.decode(bytes(b)) is None

    def test_header_crc(self):
        b = bytearray(flac.encode(8000, 1, 16, _pcm(4, 600, 1)))
        # STREAMINFO block is 4 + 4 + 34 + 16(md5)... find first frame sync
        pos = bytes(b).index(b"\xff\xf8", 4)
        b[pos + 2] ^= 0x04  # corrupt a header byte -> CRC-8 mismatch
        assert flac.decode(bytes(b)) is None

    def test_truncation(self):
        b = flac.encode(8000, 1, 16, _pcm(4, 2000, 1))
        assert flac.decode(b[: len(b) - 7]) is None
        assert flac.decode(b[:20]) is None

    def test_not_flac(self):
        assert flac.decode(b"") is None
        assert flac.decode(b"RIFF....WAVE") is None
        assert flac.pcm(None) is None


# -------------------------------------------- hand-rolled decoder paths

def _streaminfo(rate, nch, bits, total, block=256):
    si = _BitWriter()
    si.write(block, 16)
    si.write(block, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bits - 1, 5)
    si.write(total, 36)
    return (
        b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:]
        + si.bytes() + b"\x00" * 16
    )


def _frame_header(w, n, nch_code, bits_code):
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(7, 4)   # 16-bit block size at end
    w.write(0, 4)   # rate from streaminfo
    w.write(nch_code, 4)
    w.write(bits_code, 3)
    w.write(0, 1)
    w.write(0, 8)   # frame number 0
    w.write(n - 1, 16)
    w.write(_crc8(bytes(w.out)), 8)


def _finish_frame(w):
    w.align()
    w.write(_crc16(bytes(w.out)), 16)
    return w.bytes()


def _rice_write(w, res, param, pbits=4, po=0, order=0, method=0, n=None):
    w.write(method, 2)
    w.write(po, 4)
    n = n if n is not None else len(res) + order
    psize = n >> po
    i = 0
    for part in range(1 << po):
        cnt = psize - order if part == 0 else psize
        w.write(param, pbits)
        for _ in range(cnt):
            v = res[i]
            i += 1
            u = (v << 1) if v >= 0 else ((-v) << 1) - 1
            w.write_unary(u >> param)
            if param:
                w.write(u & ((1 << param) - 1), param)


def test_lpc_subframe_decodes_exactly():
    n, order, shift = 256, 3, 5
    coef = [29, -18, 7]  # arbitrary valid quantized predictor
    rng = random.Random(21)
    samples = [rng.randint(-400, 400) for _ in range(order)]
    res = []
    for i in range(order, n):
        acc = sum(coef[j] * samples[i - 1 - j] for j in range(order))
        r = rng.randint(-15, 15)
        samples.append((acc >> shift) + r)
        res.append(r)
    w = _BitWriter()
    _frame_header(w, n, 0, 4)  # mono, 16-bit code
    w.write(0, 1)
    w.write(32 + order - 1, 6)  # LPC, order 3
    w.write(0, 1)               # no wasted bits
    for s in samples[:order]:
        w.write(s, 16)
    w.write(12 - 1, 4)          # precision 12
    w.write(shift, 5)
    for c in coef:
        w.write(c, 12)
    _rice_write(w, res, 4, order=order, n=n)
    b = _streaminfo(8000, 1, 16, n) + _finish_frame(w)
    dec = flac.decode(b)
    assert dec is not None and dec[3][0] == samples


def test_rice2_and_partition_orders():
    n = 256
    rng = random.Random(31)
    res = [rng.randint(-200, 200) for _ in range(n)]
    for po in (0, 1, 3):
        w = _BitWriter()
        _frame_header(w, n, 0, 4)
        w.write(0, 1)
        w.write(8, 6)  # FIXED order 0 -> samples == residual
        w.write(0, 1)
        _rice_write(w, res, 7, pbits=5, po=po, method=1, n=n)
        b = _streaminfo(8000, 1, 16, n) + _finish_frame(w)
        dec = flac.decode(b)
        assert dec is not None and dec[3][0] == res, po


def test_escaped_raw_partition():
    n = 128
    rng = random.Random(41)
    res = [rng.randint(-2000, 2000) for _ in range(n)]
    w = _BitWriter()
    _frame_header(w, n, 0, 4)
    w.write(0, 1)
    w.write(8, 6)  # FIXED order 0
    w.write(0, 1)
    w.write(0, 2)   # Rice method (4-bit params)
    w.write(0, 4)   # partition order 0
    w.write(0xF, 4)  # escape
    w.write(13, 5)  # 13-bit raw residuals
    for v in res:
        w.write(v, 13)
    b = _streaminfo(8000, 1, 16, n) + _finish_frame(w)
    dec = flac.decode(b)
    assert dec is not None and dec[3][0] == res


def test_wasted_bits_shift():
    n = 64
    vals = [(k % 17 - 8) * 4 for k in range(n)]  # all divisible by 4
    w = _BitWriter()
    _frame_header(w, n, 0, 4)
    w.write(0, 1)
    w.write(1, 6)   # VERBATIM
    w.write(1, 1)   # wasted-bits flag
    w.write_unary(1)  # k=1 zeros before the 1 -> wasted = 2
    for v in vals:
        w.write(v >> 2, 14)  # eff bps = 16 - 2
    b = _streaminfo(8000, 1, 16, n) + _finish_frame(w)
    dec = flac.decode(b)
    assert dec is not None and dec[3][0] == vals


def test_left_side_and_right_side_layouts():
    n = 96
    rng = random.Random(51)
    left = [rng.randint(-5000, 5000) for _ in range(n)]
    right = [rng.randint(-5000, 5000) for _ in range(n)]
    side = [l - r for l, r in zip(left, right)]
    for code, ch_a, ch_b, bits_a, bits_b in (
        (8, left, side, 16, 17),   # left/side
        (9, side, right, 17, 16),  # right/side
    ):
        w = _BitWriter()
        _frame_header(w, n, code, 4)
        for vals, bits in ((ch_a, bits_a), (ch_b, bits_b)):
            w.write(0, 1)
            w.write(1, 6)  # VERBATIM
            w.write(0, 1)
            for v in vals:
                w.write(v, bits)
        b = _streaminfo(8000, 2, 16, n) + _finish_frame(w)
        dec = flac.decode(b)
        assert dec is not None, code
        assert dec[3] == [left, right], code


# ------------------------------------------------- pipeline integration

def _wav_of(chans, rate=8000):
    buf = io.BytesIO()
    arr = np.array(chans, dtype="<i2").T.reshape(-1)
    with wave.open(buf, "wb") as w:
        w.setnchannels(len(chans))
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def test_audio_pcm_seam_flac_equals_wav():
    rate, nch, chans = fixture_pcm(6)
    fb = flac.encode(rate, nch, 16, chans, block_size=256)
    wr, wn, wx = _audio_pcm(_wav_of(chans, rate))
    fr, fn, fx = _audio_pcm(fb)
    assert (wr, wn) == (fr, fn)
    assert np.array_equal(wx, fx)  # identical ints -> identical floats


def test_audio_features_flac_equals_wav(spark):
    from seqspark.pipeline.multimodal import ASSET_SCHEMA, audio_features

    rows_flac, rows_wav = [], []
    for i in range(8):
        rate, nch, chans = fixture_pcm(i)
        rows_flac.append(
            (i, "audio",
             bytearray(flac.encode(rate, nch, 16, chans, block_size=256,
                                   mid_side=(nch == 2 and i % 3 == 0))),
             "{}")
        )
        rows_wav.append((i, "audio", bytearray(_wav_of(chans, rate)), "{}"))
    feats_f = spark.createDataFrame(rows_flac, ASSET_SCHEMA)
    feats_w = spark.createDataFrame(rows_wav, ASSET_SCHEMA)
    got = {
        r["asset_id"]: r.asDict()
        for r in audio_features(feats_f, fake=False).collect()
    }
    want = {
        r["asset_id"]: r.asDict()
        for r in audio_features(feats_w, fake=False).collect()
    }
    assert set(got) == set(want) == set(range(8))
    for i in range(8):
        g, e = got[i], want[i]
        for k in ("sample_rate", "n_channels", "n_samples", "rms",
                  "zcr", "centroid_hz", "fingerprint"):
            assert g[k] == e[k], (i, k, g[k], e[k])


def test_decode_assets_flac_metadata(spark):
    from seqspark.pipeline.multimodal import decode_assets

    assets = make_real_flac_assets(spark, 6)
    rows = {r["asset_id"]: r for r in
            decode_assets(assets, fake=False).collect()}
    for i in range(6):
        rate, nch, chans = fixture_pcm(i)
        r = rows[i]
        # audio meta convention: (n_channels, bits, n_frames)
        assert (r["width"], r["height"], r["n_frames"]) == (
            nch, 16, len(chans[0])
        )


def test_fixture_rows_deterministic():
    a = real_flac_asset_rows(5)
    b = real_flac_asset_rows(5)
    assert [bytes(r[2]) for r in a] == [bytes(r[2]) for r in b]


# ------------------------------------------------------- round-trip fuzz

from hypothesis import given, settings, strategies as hst


@settings(max_examples=40, deadline=None)
@given(
    hst.integers(0, 2**31),
    hst.sampled_from([8, 16]),
    hst.sampled_from([1, 2]),
    hst.sampled_from([192, 256, 1000]),
    hst.booleans(),
    hst.integers(1, 1200),
)
def test_roundtrip_fuzz(seed, bits, nch, block, mid_side, n):
    """Any PCM the encoder accepts must decode back bit-exact — random
    amplitude mixes (tonal, noisy, constant runs, full-scale clipping
    edges), random block sizes incl. a non-power-of-two, both stereo
    layouts, partial tail blocks."""
    rng = random.Random(seed)
    lim = (1 << (bits - 1)) - 1
    chans = []
    for c in range(nch):
        mode = rng.randrange(4)
        if mode == 0:  # constant run
            v = rng.randint(-lim - 1, lim)
            ch = [v] * n
        elif mode == 1:  # full-scale noise
            ch = [rng.randint(-lim - 1, lim) for _ in range(n)]
        elif mode == 2:  # tonal + dither
            ch = [
                int(0.7 * lim * math.sin(k * 0.07 + c))
                + rng.randint(-3, 3)
                for k in range(n)
            ]
            ch = [max(-lim - 1, min(lim, v)) for v in ch]
        else:  # step edges (stress Rice parameter choice)
            ch = [(-lim - 1 if (k // 37) % 2 else lim) for k in range(n)]
        chans.append(ch)
    b = flac.encode(8000, nch, bits, chans, block_size=block,
                    mid_side=(mid_side and nch == 2))
    dec = flac.decode(b)
    assert dec is not None
    assert dec[3] == chans
    assert flac.meta(b) == (nch, bits, n)
