"""Audio DSP features (multimodal.audio_features, r12b): WAV PCM decode
across bit depths, feature sanity, and the 64-bit spectral fingerprint's
invariances — the properties that make it usable for near-duplicate
audio detection (pair with dedup.hamming_dupes like the image dHash).
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from seqspark.pipeline.multimodal import (
    _audio_fingerprint_of,
    _wav_pcm,
    audio_features,
    make_real_assets,
)


def make_wav(x, rate=8000, sw=2, nch=1):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(sw)
        w.setframerate(rate)
        if sw == 1:
            w.writeframes(((np.clip(x, -1, 1) * 127) + 128).astype(np.uint8).tobytes())
        elif sw == 2:
            w.writeframes((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())
        elif sw == 3:
            v = (np.clip(x, -1, 1) * 8388607).astype(np.int32)
            b = bytearray()
            for q in v:
                b += int(q & 0xFFFFFF).to_bytes(3, "little")
            w.writeframes(bytes(b))
        elif sw == 4:
            w.writeframes((np.clip(x, -1, 1) * 2147483647).astype("<i4").tobytes())
    return buf.getvalue()


def _sweep(n=8000, rate=8000):
    t = np.arange(n) / rate
    return 0.5 * np.sin(2 * np.pi * (300 + 700 * t) * t) + 0.25 * np.sin(
        2 * np.pi * 1800 * t
    ) * (t > 0.5)


class TestWavPcm:
    @pytest.mark.parametrize("sw", [1, 2, 3, 4])
    def test_bit_depths_decode(self, sw):
        x = _sweep()
        rate, nch, y = _wav_pcm(make_wav(x, sw=sw))
        assert (rate, nch, len(y)) == (8000, 1, len(x))
        tol = 0.02 if sw == 1 else 0.001
        assert float(np.abs(y - x).max()) < tol

    def test_stereo_downmix(self):
        x = _sweep(1000)
        st = np.empty(2000)
        st[0::2] = x
        st[1::2] = -x  # L/R cancel: downmix ~ silence
        rate, nch, y = _wav_pcm(make_wav(st, sw=2, nch=2))
        assert nch == 2 and float(np.abs(y).max()) < 0.001

    def test_malformed(self):
        assert _wav_pcm(b"") is None
        assert _wav_pcm(b"RIFF\x00\x00\x00\x00WAVE") is None
        assert _wav_pcm(b"not audio at all") is None


class TestFingerprint:
    def test_bit_depth_invariant(self):
        x = _sweep()
        fps = {}
        for sw in (1, 2, 3, 4):
            rate, _n, y = _wav_pcm(make_wav(x, sw=sw))
            fps[sw] = _audio_fingerprint_of(y, rate)
        assert fps[2] == fps[3] == fps[4]
        assert bin((fps[1] ^ fps[2]) & (2**64 - 1)).count("1") <= 6

    def test_gain_and_stereo_invariant(self):
        x = _sweep()
        _r, _n, y = _wav_pcm(make_wav(x, sw=2))
        base = _audio_fingerprint_of(y, 8000)
        _r, _n, y2 = _wav_pcm(make_wav(x * 0.3, sw=2))
        assert _audio_fingerprint_of(y2, 8000) == base
        _r, _n, y3 = _wav_pcm(make_wav(np.repeat(x, 2), sw=2, nch=2))
        assert _audio_fingerprint_of(y3, 8000) == base

    def test_distinct_signals_far_apart(self):
        t = np.arange(8000) / 8000.0
        _r, _n, a = _wav_pcm(make_wav(_sweep(), sw=2))
        _r, _n, b = _wav_pcm(make_wav(0.4 * np.sin(2 * np.pi * 2600 * t), sw=2))
        d = bin(
            (_audio_fingerprint_of(a, 8000) ^ _audio_fingerprint_of(b, 8000))
            & (2**64 - 1)
        ).count("1")
        assert d >= 8

    def test_too_short_is_none(self):
        assert _audio_fingerprint_of(np.zeros(4), 8000) is None


class TestAudioFeaturesPipeline:
    def test_over_fixture(self, spark):
        out = audio_features(make_real_assets(spark, 32), fake=False).collect()
        # audio rows are every i%4==3 in the mixed fixture
        assert sorted(r["asset_id"] for r in out) == [
            i for i in range(32) if i % 4 == 3
        ]
        for r in out:
            assert r["sample_rate"] == 8000 and r["n_channels"] == 2
            assert r["n_samples"] > 0
            assert 0.0 < r["rms"] < 1.0
            assert 0.0 <= r["zcr"] <= 1.0
            assert 0.0 < r["centroid_hz"] < 4000.0
            assert r["fingerprint"] is not None

    def test_pure_python_parity(self, spark):
        from seqspark.pipeline.multimodal import real_asset_rows

        out = {
            r["asset_id"]: r
            for r in audio_features(make_real_assets(spark, 8), fake=False).collect()
        }
        for i, media, content, _m in real_asset_rows(8):
            if media != "audio":
                continue
            rate, nch, x = _wav_pcm(bytes(content))
            assert out[i]["rms"] == round(float(np.sqrt(np.mean(x * x))), 6)
            assert out[i]["fingerprint"] == _audio_fingerprint_of(x, rate)

    def test_undecodable_audio_keeps_row_with_nulls(self, spark):
        from seqspark.pipeline.multimodal import ASSET_SCHEMA

        assets = spark.createDataFrame(
            [(1, "audio", bytearray(b"garbage"), "{}"),
             (2, "image", bytearray(b"x"), "{}")],
            ASSET_SCHEMA,
        )
        out = audio_features(assets, fake=False).collect()
        assert len(out) == 1  # image row drops
        r = out[0]
        assert r["asset_id"] == 1 and r["rms"] is None and r["fingerprint"] is None

    def test_hamming_dupes_over_fingerprints(self, spark):
        # the fingerprint feeds the SAME banded Hamming join as the
        # image dHash: a re-encoded (8-bit) copy of each clip must pair
        # with its 16-bit original
        from pyspark.sql import functions as F

        from seqspark.pipeline.dedup import hamming_dupes
        from seqspark.pipeline.multimodal import ASSET_SCHEMA

        rows = []
        rng = np.random.default_rng(3)
        for i in range(4):
            t = np.arange(4000) / 8000.0
            f0 = 300 + 400 * i
            x = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.2 * np.sin(
                2 * np.pi * (f0 * 2.7) * t
            ) * (t > 0.25 * (i + 1) / 4)
            rows.append((i, "audio", bytearray(make_wav(x, sw=2)), "{}"))
            rows.append((100 + i, "audio", bytearray(make_wav(x, sw=1)), "{}"))
        assets = spark.createDataFrame(rows, ASSET_SCHEMA)
        feats = audio_features(assets, fake=False).select(
            "asset_id", F.col("fingerprint").alias("fp"))
        pairs = hamming_dupes(feats, "asset_id", "fp", max_distance=6).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        for i in range(4):
            assert (i, 100 + i) in got, (i, sorted(got))


class TestAudioPairFixture:
    def test_separability(self):
        # the property the audio_dupes contract entry rests on: 16-bit
        # vs 8-bit re-encodes within Hamming 3, distinct signals beyond
        from seqspark.pipeline.multimodal import real_audio_pair_rows

        rows = real_audio_pair_rows(8)
        fp = {}
        for i, _m, c, _j in rows:
            rate, _n, x = _wav_pcm(bytes(c))
            fp[i] = _audio_fingerprint_of(x, rate)
        for i in range(8):
            d = bin((fp[i] ^ fp[1000 + i]) & (2**64 - 1)).count("1")
            assert d <= 3, (i, d)
        for i in range(8):
            for j in range(i + 1, 8):
                d = bin((fp[i] ^ fp[j]) & (2**64 - 1)).count("1")
                assert d > 3, (i, j, d)

    def test_pair_join(self, spark):
        from pyspark.sql import functions as F

        from seqspark.pipeline.dedup import hamming_dupes
        from seqspark.pipeline.multimodal import make_real_audio_pair_assets

        feats = audio_features(
            make_real_audio_pair_assets(spark, 8), fake=False
        ).select("asset_id", F.col("fingerprint").alias("fp"))
        pairs = hamming_dupes(feats, "asset_id", "fp", max_distance=3).collect()
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {
            (i, 1000 + i) for i in range(8)
        }


def _f80(rate):
    import struct

    m, e = rate, 16383 + 63
    while m < (1 << 63):
        m <<= 1
        e -= 1
    return struct.pack(">HQ", e, m)


def make_aiff(x, rate=8000, sw=2, nch=1):
    import struct

    if sw == 2:
        pcm = (np.clip(x, -1, 1) * 32767).astype(">i2").tobytes()
    elif sw == 3:
        v = (np.clip(x, -1, 1) * 8388607).astype(np.int32)
        b = bytearray()
        for q in v:
            b += int(q & 0xFFFFFF).to_bytes(3, "big")
        pcm = bytes(b)
    else:
        pcm = (np.clip(x, -1, 1) * 2147483647).astype(">i4").tobytes()
    nf = len(x) // nch
    comm = struct.pack(">HIH", nch, nf, sw * 8) + _f80(rate)
    ssnd = struct.pack(">II", 0, 0) + pcm

    def chunk(cc, p):
        return cc + struct.pack(">I", len(p)) + p + (b"\0" if len(p) & 1 else b"")

    body = b"AIFF" + chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    return b"FORM" + struct.pack(">I", len(body)) + body


def mulaw_encode(x):
    out = bytearray()
    for v in (np.clip(x, -1, 1) * 32635).astype(int):
        s = 0x80 if v < 0 else 0
        if v < 0:
            v = -v
        v += 0x84
        e = 0
        for ee in range(7, -1, -1):
            if v & (0x4000 >> (7 - ee)):
                e = ee
                break
        m = (v >> (e + 3)) & 0x0F
        out.append(~(s | (e << 4) | m) & 0xFF)
    return bytes(out)


def make_au(x, rate=8000, enc=1, nch=1):
    import struct

    if enc == 1:
        payload = mulaw_encode(x)
    elif enc == 3:
        payload = (np.clip(x, -1, 1) * 32767).astype(">i2").tobytes()
    elif enc == 5:
        payload = (np.clip(x, -1, 1) * 2147483647).astype(">i4").tobytes()
    return b".snd" + struct.pack(">IIIII", 24, len(payload), enc, rate, nch) + payload


class TestAiffAu:
    """r12b: AIFF (big-endian PCM) and Sun .snd (mu-law + linear)
    containers — the same signal through every container must land on
    the SAME fingerprint (cross-container dedup, the operator's point)."""

    def test_cross_container_fingerprint_equality(self):
        from seqspark.pipeline.multimodal import _audio_pcm

        x = _sweep(4000)
        _r, _n, ref = _wav_pcm(make_wav(x, sw=2))
        fp_ref = _audio_fingerprint_of(ref, 8000)
        variants = {
            "aiff16": make_aiff(x, sw=2),
            "aiff24": make_aiff(x, sw=3),
            "aiff32": make_aiff(x, sw=4),
            "au_mulaw": make_au(x, enc=1),
            "au_pcm16": make_au(x, enc=3),
            "au_pcm32": make_au(x, enc=5),
        }
        for name, b in variants.items():
            dec = _audio_pcm(b)
            assert dec is not None, name
            rate, _nch, y = dec
            d = bin(
                (_audio_fingerprint_of(y, rate) ^ fp_ref) & (2**64 - 1)
            ).count("1")
            assert d <= 3, (name, d)

    def test_mulaw_amplitude_error_bounded(self):
        from seqspark.pipeline.multimodal import _au_pcm

        x = _sweep(2000)
        _r, _n, y = _au_pcm(make_au(x, enc=1))
        assert float(np.abs(y - x).max()) < 0.04  # G.711 quantization

    def test_metadata_paths(self):
        from seqspark.pipeline.multimodal import _aiff_meta, _au_meta, _real_decode

        x = _sweep(1000)
        assert _aiff_meta(make_aiff(x, sw=2)) == (1, 16, 1000)
        assert _au_meta(make_au(x, enc=1)) == (1, 8, 1000)
        assert _real_decode("audio", make_aiff(x)) == (1, 16, 1000)
        assert _real_decode("audio", make_au(x, enc=3)) == (1, 16, 1000)

    def test_malformed(self):
        from seqspark.pipeline.multimodal import _aiff_pcm, _au_pcm, _audio_pcm

        assert _aiff_pcm(b"FORM\x00\x00\x00\x04AIFF") is None
        assert _au_pcm(b".snd" + b"\x00" * 8) is None
        assert _audio_pcm(b"") is None
        assert _audio_pcm(b"\x00" * 64) is None
        good = make_aiff(_sweep(500))
        for cut in (10, len(good) // 2):
            _audio_pcm(good[:cut])  # must not throw

    def test_audio_features_over_mixed_containers(self, spark):
        from seqspark.pipeline.multimodal import ASSET_SCHEMA, audio_features

        x = _sweep(2000)
        assets = spark.createDataFrame(
            [
                (1, "audio", bytearray(make_wav(x, sw=2)), "{}"),
                (2, "audio", bytearray(make_aiff(x, sw=3)), "{}"),
                (3, "audio", bytearray(make_au(x, enc=1)), "{}"),
            ],
            ASSET_SCHEMA,
        )
        out = {r["asset_id"]: r for r in audio_features(assets, fake=False).collect()}
        assert len(out) == 3
        fps = {i: out[i]["fingerprint"] for i in (1, 2, 3)}
        assert fps[1] == fps[2]  # lossless containers agree exactly
        assert bin((fps[1] ^ fps[3]) & (2**64 - 1)).count("1") <= 3


class TestImaAdpcm:
    """IMA-ADPCM WAV (r13, fmt 0x0011): the compressed WAV variant the
    stdlib wave module refuses — 4-byte per-channel block headers, low-
    nibble-first payload in interleaved 4-byte groups (public IMA/DVI
    spec)."""

    def _sig(self, n=3000, nch=1):
        import numpy as np

        from seqspark.pipeline.multimodal import _wav_ima_encode

        t = np.arange(n)
        chans = [
            (9000 * np.sin(t * (0.05 + 0.01 * c))).astype(int).tolist()
            for c in range(nch)
        ]
        return chans, _wav_ima_encode(8000, chans)

    @pytest.mark.parametrize("nch", [1, 2])
    def test_decode_tracks_signal(self, nch):
        from seqspark.pipeline.multimodal import _wav_ima_pcm

        chans, b = self._sig(nch=nch)
        rate, got_nch, x = _wav_ima_pcm(b)
        assert (rate, got_nch, len(x)) == (8000, nch, 3000)
        ref = np.mean([np.array(c) for c in chans], axis=0) / 32768.0
        # ADPCM is lossy vs the ORIGINAL: bounded tracking error on a
        # smooth signal (4-bit quantizer; the max lands on step-ramp
        # attack transients — measured 0.052 on this fixture)
        assert float(np.abs(x - ref).max()) < 0.08
        assert float(np.abs(x - ref).mean()) < 0.01

    def test_decoder_matches_encoder_reconstruction_exactly(self):
        # the encoder predicts with the DECODER's update, so the decoded
        # stream equals the encoder's internal reconstruction bit-exact
        import numpy as np

        from seqspark.pipeline.multimodal import (
            _ima_decode_nibble, _IMA_STEPS, _wav_ima_pcm, _wav_ima_encode)

        rng = np.random.default_rng(3)
        sig = (rng.normal(0, 6000, 1200)).astype(int).tolist()
        b = _wav_ima_encode(8000, [sig], block_samples=257)
        rate, nch, x = _wav_ima_pcm(b)
        # replay the encoder driver-side
        pred, idx = sig[0], 0
        recon = [pred]
        k = 1
        while len(recon) < len(x):
            if (len(recon)) % 257 == 0:
                pred = sig[k] if k < len(sig) else pred
                recon.append(pred)
                k += 1
                continue
            s = sig[k] if k < len(sig) else pred
            step = _IMA_STEPS[idx]
            diff = s - pred
            nib = 8 if diff < 0 else 0
            diff = abs(diff)
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            pred, idx = _ima_decode_nibble(nib, pred, idx)
            recon.append(pred)
            k += 1
        got = np.round(np.asarray(x) * 32768.0).astype(int)
        assert got.tolist() == recon[: len(got)]

    def test_meta_and_seam(self, spark):
        from seqspark.pipeline.multimodal import (
            ASSET_SCHEMA, _wav_ima_meta, audio_features, decode_assets)

        chans, b = self._sig(nch=2)
        assert _wav_ima_meta(b) == (2, 16, 3000)
        assets = spark.createDataFrame(
            [(1, "audio", bytearray(b), "{}")], ASSET_SCHEMA)
        meta = decode_assets(assets, fake=False).collect()[0]
        assert (meta["width"], meta["height"], meta["n_frames"]) == (
            2, 16, 3000)
        feats = audio_features(assets, fake=False).collect()[0]
        assert feats["sample_rate"] == 8000
        assert feats["fingerprint"] is not None
        assert 0.1 < feats["rms"] < 0.3

    def test_fingerprint_survives_adpcm_reencode(self):
        # the spectral fingerprint's whole point: a lossy re-encode of
        # the same audio must stay within the dedup Hamming threshold
        import io
        import wave as _w

        from seqspark.pipeline.multimodal import (
            _audio_fingerprint_of, _wav_ima_pcm, _wav_ima_encode, _wav_pcm)

        chans, b = self._sig(nch=1)
        buf = io.BytesIO()
        with _w.open(buf, "wb") as wv:
            wv.setnchannels(1)
            wv.setsampwidth(2)
            wv.setframerate(8000)
            wv.writeframes(np.array(chans[0], dtype="<i2").tobytes())
        r1, _n1, x1 = _wav_pcm(buf.getvalue())
        r2, _n2, x2 = _wav_ima_pcm(b)
        f1 = _audio_fingerprint_of(x1, r1)
        f2 = _audio_fingerprint_of(x2, r2)
        assert bin((f1 ^ f2) & (1 << 64) - 1).count("1") <= 3

    def test_malformed(self):
        from seqspark.pipeline.multimodal import _wav_ima_pcm, _wav_ima_meta

        assert _wav_ima_pcm(b"RIFF....WAVE") is None
        assert _wav_ima_meta(b"") is None
        # PCM WAV (tag 1) must NOT route through the ADPCM decoder
        import io
        import wave as _w

        buf = io.BytesIO()
        with _w.open(buf, "wb") as wv:
            wv.setnchannels(1)
            wv.setsampwidth(2)
            wv.setframerate(8000)
            wv.writeframes(b"\x00\x01" * 50)
        assert _wav_ima_pcm(buf.getvalue()) is None


class TestMp3Meta:
    """r14: MPEG-audio (MP3) frame-header metadata — the dominant lossy
    web-audio container joins the metadata-without-decode tier (rate,
    channels, exact VBR duration from frame accounting); the PCM/feature
    path keeps its honest raise."""

    def test_versions_layers_and_accounting(self):
        from seqspark.pipeline.multimodal import _mp3_encode_meta, _mp3_meta

        # (ver_bits, layer, expected_rate, expected_spf)
        cases = [
            (3, 3, 0, 44100, 1152),   # MPEG1 Layer III
            (3, 2, 1, 48000, 1152),   # MPEG1 Layer II
            (3, 1, 2, 32000, 384),    # MPEG1 Layer I
            (2, 3, 0, 22050, 576),    # MPEG2 Layer III
            (0, 3, 2, 8000, 576),     # MPEG2.5 Layer III
        ]
        for ver, layer, sr_idx, rate, spf in cases:
            b = _mp3_encode_meta([(ver, layer, 5, sr_idx, 0, 3)] * 4)
            assert _mp3_meta(b) == (rate, 1, 4, 4 * spf), (ver, layer)
        # stereo modes: anything but mode 3 is 2 channels
        for mode, nch in ((0, 2), (1, 2), (2, 2), (3, 1)):
            b = _mp3_encode_meta([(3, 3, 9, 0, 0, mode)] * 2)
            assert _mp3_meta(b)[1] == nch

    def test_vbr_id3_padding_truncation(self):
        from seqspark.pipeline.multimodal import _mp3_encode_meta, _mp3_meta

        specs = [(3, 3, 1 + i % 14, 1, i % 2, 0) for i in range(9)]
        b = _mp3_encode_meta(specs, id3v2=200, id3v1=True)
        assert _mp3_meta(b) == (48000, 2, 9, 9 * 1152)
        # truncated final frame is not counted
        assert _mp3_meta(b[: len(b) - 200])[2] < 9
        # free-format (bitrate index 0) is indeterminable -> encoder
        # refuses to build it and the parser rejects it
        hdr = bytes((0xFF, 0xFB, 0x02, 0xC0))  # br_idx=0
        assert _mp3_meta(hdr + b"\x00" * 400) is None

    def test_sync_confirmation_rejects_garbage(self):
        from seqspark.pipeline.multimodal import _mp3_meta

        assert _mp3_meta(b"") is None
        assert _mp3_meta(bytes(range(256)) * 8) is None
        # a lone plausible header followed by garbage: unconfirmed
        assert _mp3_meta(bytes((0xFF, 0xFB, 0x92, 0x00)) + b"\x55" * 4000) is None

    def test_mp3_meta_fuzz_never_throws(self):
        from hypothesis import given, settings, strategies as hst

        from seqspark.pipeline.multimodal import _mp3_meta

        @settings(max_examples=150, deadline=None)
        @given(hst.binary(min_size=0, max_size=600))
        def run(payload):
            for prefix in (b"", b"\xff\xfb", b"ID3\x04\x00\x00\x00\x00\x00\x05"):
                m = _mp3_meta(prefix + payload)
                assert m is None or (m[0] > 0 and m[2] > 0)

        run()

    def test_audio_meta_operator_all_containers(self, spark):
        from seqspark.pipeline.multimodal import (
            audio_meta, make_real_adpcm_assets, make_real_flac_assets,
            make_real_mp3_assets)

        from seqspark.pipeline.multimodal import make_real_ogg_assets

        for maker, container in (
            (make_real_flac_assets, "flac"),
            (make_real_adpcm_assets, "wav-ima"),
            (make_real_mp3_assets, "mp3"),
            (make_real_ogg_assets, ("ogg-vorbis", "ogg-opus")),
        ):
            rows = audio_meta(maker(spark, 4)).collect()
            assert len(rows) == 4
            for r in rows:
                want = (container,) if isinstance(container, str) else container
                assert r["container"] in want, (container, r)
                assert r["sample_rate"] > 0 and r["n_samples"] > 0
                assert r["duration_s"] == round(
                    r["n_samples"] / r["sample_rate"], 6)

    def test_mp3_decode_assets_and_honest_feature_raise(self, spark):
        from seqspark.pipeline.multimodal import (
            audio_features, decode_assets, make_real_mp3_assets)

        assets = make_real_mp3_assets(spark, 6)
        rows = decode_assets(assets, fake=False).collect()
        assert len(rows) == 6  # metadata path works (bits reported 0)
        for r in rows:
            assert r["height"] == 0 and r["n_frames"] > 0  # bits n/a
        # the feature path has no MP3 decode: rows survive with NULL
        # features (the documented undecodable-audio contract), no fake
        # synthesis
        feats = audio_features(assets, fake=False).collect()
        assert len(feats) == 6
        assert all(r["rms"] is None and r["fingerprint"] is None
                   for r in feats)


class TestOggMeta:
    """r14: Ogg container metadata (RFC 3533 page walk + Vorbis/Opus id
    headers) — CRC-verified pages, granule-position duration, Opus
    48 kHz granule clock with pre-skip (RFC 7845), multiplexed skip."""

    def test_vorbis_and_opus_accounting(self):
        from seqspark.pipeline.multimodal import _ogg_encode_meta, _ogg_meta

        b = _ogg_encode_meta("vorbis", 44100, 2, [4096, 10000, 132300])
        assert _ogg_meta(b) == ("ogg-vorbis", 44100, 2, 132300, 0)
        # opus: rate is ALWAYS the 48k granule clock, input rate ignored;
        # pre-skip priming samples subtracted
        b = _ogg_encode_meta("opus", 16000, 1, [960, 48000], pre_skip=312)
        assert _ogg_meta(b) == ("ogg-opus", 48000, 1, 48000 - 312, 312)

    def test_multiplexed_and_lacing_spans(self):
        from seqspark.pipeline import multimodal as mm

        b = mm._ogg_encode_meta(
            "vorbis", 8000, 1, [8000], prepend_stream=b"\x7ftheora-ish")
        assert mm._ogg_meta(b) == ("ogg-vorbis", 8000, 1, 8000, 0)
        # payloads > 255 bytes span max-lacing segments and reassemble
        page = mm._ogg_page(0, 7, 3, 0, b"\xab" * 700)
        assert list(mm._ogg_pages(page)) == [(0, 7, 3, b"\xab" * 700)]

    def test_crc_and_garbage_rejection(self):
        from seqspark.pipeline.multimodal import _ogg_encode_meta, _ogg_meta

        good = _ogg_encode_meta("vorbis", 44100, 2, [100, 44100])
        assert _ogg_meta(good)[3] == 44100
        # flip one payload byte in the LAST page: its CRC fails, the walk
        # stops, and the duration honestly falls back to the prior page
        bad = bytearray(good)
        bad[-1] ^= 0xFF
        m = _ogg_meta(bytes(bad))
        assert m is not None and m[3] == 100
        assert _ogg_meta(b"") is None
        assert _ogg_meta(b"OggS but not really a page") is None
        assert _ogg_meta(b"\x00" * 200) is None

    def test_ogg_meta_fuzz_never_throws(self):
        from hypothesis import given, settings, strategies as hst

        from seqspark.pipeline.multimodal import _ogg_meta

        @settings(max_examples=150, deadline=None)
        @given(hst.binary(min_size=0, max_size=400))
        def run(payload):
            for prefix in (b"", b"OggS", b"OggS\x00\x02"):
                m = _ogg_meta(prefix + payload)
                assert m is None or (m[1] > 0 and m[2] > 0 and m[3] >= 0)

        run()

    def test_oggflac_meta(self):
        """r15: FLAC-in-Ogg — the 0x7F 'FLAC' BOS mapping (native
        STREAMINFO head, native-rate granule clock, no pre-skip).
        Truncation and CRC-flip degrade like Vorbis/Opus; a corrupt
        STREAMINFO inside the mapping is None, never a throw."""
        from seqspark.pipeline.multimodal import (
            _audio_meta_of, _ogg_encode_meta, _ogg_meta)

        good = _ogg_encode_meta("flac", 44100, 2, [100, 44100],
                                serial=0x42)
        assert _ogg_meta(good) == ("ogg-flac", 44100, 2, 44100, 0)
        assert _audio_meta_of(good) == ("ogg-flac", 44100, 2, 44100)
        # multiplexed foreign BOS first: the audio serial still wins
        muxed = _ogg_encode_meta("flac", 8000, 1, [4000],
                                 prepend_stream=b"\x7ftheora-ish")
        assert _ogg_meta(muxed)[0] == "ogg-flac"
        # last-page CRC flip: duration falls back to the prior granule
        bad = bytearray(good)
        bad[-1] ^= 0xFF
        assert _ogg_meta(bytes(bad))[3] == 100
        # corrupt STREAMINFO magic inside the mapping: None, no throw
        corrupt = bytearray(good)
        idx = bytes(corrupt).find(b"fLaC")
        corrupt[idx] ^= 0xFF
        assert _ogg_meta(bytes(corrupt)) is None
        # truncation anywhere never throws
        for cut in range(0, len(good), 37):
            _ogg_meta(good[:cut])

    def test_ogg_decode_assets_and_null_features(self, spark):
        from seqspark.pipeline.multimodal import (
            audio_features, decode_assets, make_real_ogg_assets)

        assets = make_real_ogg_assets(spark, 6)
        rows = decode_assets(assets, fake=False).collect()
        assert len(rows) == 6  # metadata path works (bits reported 0)
        feats = audio_features(assets, fake=False).collect()
        assert all(r["rms"] is None and r["fingerprint"] is None
                   for r in feats)


class TestWavFloatExtensible:
    """r14: IEEE-float (fmt 3) and WAVE_FORMAT_EXTENSIBLE (fmt 0xFFFE)
    WAV — the variants stdlib wave (3.11) refuses. Float samples are
    exact (int16/32768 is a power-of-two scale), so features over the
    float containers equal the FLAC literals bit-for-bit."""

    def test_round_trips_and_meta(self):
        import numpy as np

        from seqspark.pipeline.multimodal import (
            _audio_meta_of, _wav_ext_encode, _wav_ext_pcm, _wav_pcm)

        t = np.arange(2000) / 16000.0
        sig = 0.5 * np.sin(2 * np.pi * 440 * t)
        for bits in (32, 64):
            for nch in (1, 2, 6):
                for ext in (False, True):
                    b = _wav_ext_encode(16000, nch, sig, fmt_tag=3,
                                        bits=bits, extensible=ext)
                    rate, gnch, x = _wav_ext_pcm(b)
                    assert (rate, gnch) == (16000, nch)
                    tol = 1e-12 if bits == 64 else 1e-7
                    assert np.abs(x - sig).max() < tol, (bits, nch, ext)
                    cont = "wav-ext" if ext else "wav-float"
                    assert _audio_meta_of(b) == (cont, 16000, nch, 2000)
                    # stdlib wave indeed refuses these containers
                    assert _wav_pcm(b) is None
        # EXTENSIBLE wrapping plain int16: ours decodes, stdlib refuses
        b = _wav_ext_encode(8000, 2, sig, fmt_tag=1, bits=16,
                            extensible=True)
        assert _wav_pcm(b) is None
        # _audio_meta_of decides this BEFORE the stdlib wave parse, so
        # the label stays "wav-ext" even on Python >= 3.12 where the
        # stdlib wave module accepts WAVE_FORMAT_EXTENSIBLE
        assert _audio_meta_of(b) == ("wav-ext", 8000, 2, 2000)
        rate, nch, x = _wav_ext_pcm(b)
        assert rate == 8000 and nch == 2
        assert np.abs(x - sig).max() < 1.0 / 32768

    def test_features_equal_flac_literals_exactly(self):
        """The frozen wavext literals ARE the FLAC literals (same
        fixture signals, exact float containers): rms/zcr/centroid/
        fingerprint identical on all 16 rows — any divergence means a
        decoder bug on one side."""
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "entry", os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "__spark_entry__.py"))
        entry = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(entry)
        fl = entry.AUDIO_FEATURES_FLAC_EXPECTED
        wx = entry.AUDIO_FEATURES_WAVEXT_EXPECTED
        assert len(fl) == len(wx) == 16
        for a, b in zip(fl, wx):
            assert a[1:4] == b[1:4]   # rate / channels / samples
            assert a[4:] == b[4:]     # rms / zcr / centroid / fingerprint

    def test_rejection_never_throws(self):
        from hypothesis import given, settings, strategies as hst

        from seqspark.pipeline.multimodal import _wav_ext_meta, _wav_ext_pcm

        assert _wav_ext_pcm(b"") is None
        assert _wav_ext_meta(b"RIFF\x00\x00\x00\x00WAVE") is None

        @settings(max_examples=100, deadline=None)
        @given(hst.binary(min_size=0, max_size=200))
        def run(payload):
            for prefix in (b"", b"RIFF\x60\x00\x00\x00WAVEfmt "):
                _wav_ext_pcm(prefix + payload)
                _wav_ext_meta(prefix + payload)

        run()


def make_aifc(x, rate=8000, comp=b"sowt", nch=1):
    import struct

    if comp == b"sowt":
        pcm = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
        bits = 16
    elif comp in (b"fl32", b"FL32"):
        pcm = np.asarray(x, dtype=">f4").tobytes()
        bits = 32
    else:
        pcm = np.asarray(x, dtype=">f8").tobytes()
        bits = 64
    nf = len(x) // nch
    comm = (struct.pack(">HIH", nch, nf, bits) + _f80(rate)
            + comp + b"\x00")  # pstring name (empty)
    ssnd = struct.pack(">II", 0, 0) + pcm

    def chunk(cc, p):
        return cc + struct.pack(">I", len(p)) + p + (
            b"\0" if len(p) & 1 else b"")

    body = b"AIFC" + chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    return b"FORM" + struct.pack(">I", len(body)) + body


class TestAifcAndAuFloat:
    """r14: AIFF-C (sowt little-endian PCM, fl32/fl64 float — the
    Mac-origin containers) and AU float encodings 6/7."""

    def test_aifc_sowt_and_float(self):
        from seqspark.pipeline.multimodal import (
            _aiff_pcm, _audio_meta_of, _real_decode)

        t = np.arange(1000) / 8000.0
        x = 0.5 * np.sin(2 * np.pi * 440 * t)
        sw = _aiff_pcm(make_aifc(x, comp=b"sowt"))
        assert sw is not None and np.abs(sw[2] - x).max() < 1e-3
        f32 = _aiff_pcm(make_aifc(x, comp=b"fl32"))
        assert np.abs(f32[2] - x).max() < 1e-7
        f64 = _aiff_pcm(make_aifc(x, comp=b"fl64"))
        assert np.abs(f64[2] - x).max() < 1e-12
        assert _audio_meta_of(make_aifc(x, comp=b"fl32")) == (
            "aifc", 8000, 1, 1000)
        assert _real_decode("audio", make_aifc(x, comp=b"fl64")) == (
            1, 64, 1000)
        # unknown compression (e.g. 'ima4') is an honest None, not junk
        bad = make_aifc(x, comp=b"fl32").replace(b"fl32", b"ima4")
        from seqspark.pipeline.multimodal import _aiff_parse

        assert _aiff_parse(bad) is None

    def test_au_float_encodings(self):
        import struct

        from seqspark.pipeline.multimodal import (
            _au_meta, _au_pcm, _audio_meta_of)

        t = np.arange(500) / 8000.0
        x = 0.25 * np.sin(2 * np.pi * 300 * t)
        for enc, dt, tol in ((6, ">f4", 1e-7), (7, ">f8", 1e-12)):
            payload = np.asarray(x, dtype=dt).tobytes()
            au = (b".snd" + struct.pack(">IIIII", 24, len(payload), enc,
                                        8000, 1) + payload)
            rate, nch, got = _au_pcm(au)
            assert (rate, nch) == (8000, 1)
            assert np.abs(got - x).max() < tol
            sw = 4 if enc == 6 else 8
            assert _au_meta(au) == (1, sw * 8, 500)
            assert _audio_meta_of(au) == ("au", 8000, 1, 500)


def test_ogg_meta_cost_is_header_tier():
    """r14: duration comes from a BACKWARD scan to the last CRC-valid
    page (the opusfile seek-to-end idiom) — the Python-loop page CRC
    never runs over the asset body, so a multi-MB file costs head+tail
    pages only, and fake OggS captures inside payloads are rejected by
    CRC during the tail scan."""
    import time

    from seqspark.pipeline import multimodal as mm

    head = mm._ogg_encode_meta("opus", 48000, 2, [960])
    body = b"".join(
        mm._ogg_page(0, 777, 0x7EEF, i + 50, bytes(60000))
        for i in range(85))  # ~5 MB of a foreign serial
    tail = mm._ogg_page(0x04, 480000, 0x5E01, 999, b"\x00" * 40)
    blob = head + body + tail + b"OggS" + b"\x00" * 30  # trailing junk
    t0 = time.perf_counter()
    m = mm._ogg_meta(blob)
    dt = time.perf_counter() - t0
    assert m == ("ogg-opus", 48000, 2, 480000, 0), m
    assert dt < 0.25, dt  # full-body CRC would cost ~1 s at ~6 MB/s
