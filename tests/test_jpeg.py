"""Baseline JPEG codec (seqspark/pipeline/jpeg.py) + MJPEG-AVI container
(avi.py) — codec unit tests and the Spark pipeline integration (r12b).

The encoder exists for deterministic fixtures; every decoder path it can
reach (gray/444/422/420, restart intervals, 16-bit DQT, odd dimensions)
is exercised through a round-trip. The one EXACT property: grayscale
images whose 8x8 blocks are uniform survive quality-100 unchanged
(integer DC, zero AC, unit quantizer), so the full Huffman/IDCT chain is
pinned without a lossy tolerance.
"""

from __future__ import annotations

import numpy as np
import pytest

from seqspark.pipeline import avi, jpeg


def _rng(seed=0):
    return np.random.default_rng(seed)


def _roundtrip(img, ch, **kw):
    h, w = img.shape[:2]
    b = jpeg.encode(w, h, ch, img.tobytes(), **kw)
    dec = jpeg.decode(b)
    assert dec is not None, kw
    dw, dh, dch, px = dec
    assert (dw, dh, dch) == (w, h, 3)
    return np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w, 3)


class TestJpegCodec:
    def test_gray_flat_blocks_exact_q100(self):
        rng = _rng(7)
        vals = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
        img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
        out = _roundtrip(img, 1, quality=100)
        for c in range(3):  # gray replicates across RGB
            assert np.array_equal(out[:, :, c], img)

    def test_gray_flat_blocks_exact_with_restart(self):
        rng = _rng(9)
        vals = rng.integers(0, 256, size=(3, 5), dtype=np.uint8)
        img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
        out = _roundtrip(img, 1, quality=100, restart=2)
        assert np.array_equal(out[:, :, 0], img)

    def test_color_flat_blocks_near_exact_q100(self):
        rng = _rng(3)
        vals = rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
        img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
        out = _roundtrip(img, 3, quality=100, subsample="444")
        # YCbCr rounding only: within 1 count per channel
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1

    @pytest.mark.parametrize("subsample", ["444", "422", "420"])
    def test_smooth_gradient_tolerance(self, subsample):
        h, w = 24, 40
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=-1
        ).astype(np.uint8)
        out = _roundtrip(img, 3, quality=90, subsample=subsample)
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 40
        assert float(np.abs(out.astype(float) - img).mean()) <= 4.0

    def test_restart_and_wide_dqt_decode_identically(self):
        rng = _rng(11)
        img = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
        base = _roundtrip(img, 3, quality=92)
        for kw in (
            dict(restart=1),
            dict(restart=2),
            dict(wide_dqt=True),
            dict(restart=3, wide_dqt=True),
        ):
            assert np.array_equal(_roundtrip(img, 3, quality=92, **kw), base)

    @pytest.mark.parametrize("subsample", ["444", "422", "420"])
    @pytest.mark.parametrize("dims", [(37, 21), (8, 8), (17, 9), (16, 16)])
    def test_odd_dimensions(self, subsample, dims):
        w, h = dims
        rng = _rng(w * 100 + h)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        b = jpeg.encode(w, h, 3, img.tobytes(), quality=85, subsample=subsample)
        dec = jpeg.decode(b)
        assert dec is not None and (dec[0], dec[1]) == (w, h)

    def test_rgba_alpha_dropped(self):
        rng = _rng(5)
        img = rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8)
        b = jpeg.encode(16, 16, 4, img.tobytes(), quality=95)
        dec = jpeg.decode(b)
        assert dec is not None and dec[2] == 3

    def test_relabeled_sof2_is_malformed_not_crash(self):
        # a BASELINE stream relabeled SOF2 is an invalid progressive scan
        # (Ss=0 with Se=63) — must return None, not decode garbage
        b = bytearray(jpeg.encode(16, 16, 1, bytes(256), quality=80))
        i = b.find(b"\xff\xc0")
        b[i + 1] = 0xC2
        assert jpeg.decode(bytes(b)) is None

    def test_arithmetic_and_lossless_rejected(self):
        for sof in (0xC3, 0xC9, 0xCB):  # lossless / arithmetic variants
            b = bytearray(jpeg.encode(16, 16, 1, bytes(256), quality=80))
            i = b.find(b"\xff\xc0")
            b[i + 1] = sof
            assert jpeg.decode(bytes(b)) is None, hex(sof)

    def test_malformed_never_throws(self):
        good = jpeg.encode(16, 16, 1, bytes(range(0, 256)), quality=80)
        assert jpeg.decode(b"") is None
        assert jpeg.decode(b"\xff\xd8") is None
        assert jpeg.decode(b"\xff\xd8\xff\xd9") is None
        assert jpeg.decode(b"notajpeg") is None
        for cut in (10, len(good) // 2, len(good) - 2):
            jpeg.decode(good[:cut])  # must not raise; None or partial ok
        # bit-flip fuzz over the entropy segment must never throw
        rng = _rng(1)
        for _ in range(50):
            bb = bytearray(good)
            k = int(rng.integers(2, len(bb)))
            bb[k] ^= 1 << int(rng.integers(0, 8))
            jpeg.decode(bytes(bb))

    def test_meta_matches_decode(self):
        b = jpeg.encode(20, 12, 1, bytes(240), quality=80)
        assert jpeg.meta(b) == (20, 12, 1)
        assert jpeg.meta(b"junk") is None

    def test_deterministic_bytes(self):
        rng = _rng(2)
        img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
        a = jpeg.encode(24, 16, 3, img.tobytes(), quality=88, subsample="420")
        b = jpeg.encode(24, 16, 3, img.tobytes(), quality=88, subsample="420")
        assert a == b


class TestProgressive:
    """SOF2: spectral selection + successive approximation. The master
    property: a full-precision progressive stream decodes to pixels
    IDENTICAL to the baseline stream of the same image/quality — both
    paths share quantized coefficients, so any divergence is an entropy
    or refinement bug, not rounding."""

    @pytest.mark.parametrize("subsample", ["444", "422", "420"])
    @pytest.mark.parametrize("dims", [(48, 32), (37, 21), (16, 16)])
    def test_equals_baseline(self, subsample, dims):
        w, h = dims
        rng = _rng(w + h)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        base = jpeg.decode(
            jpeg.encode(w, h, 3, img.tobytes(), quality=90, subsample=subsample)
        )
        prog = jpeg.decode(
            jpeg.encode_progressive(
                w, h, 3, img.tobytes(), quality=90, subsample=subsample
            )
        )
        assert prog is not None
        assert bytes(base[3]) == bytes(prog[3])

    @pytest.mark.parametrize("split", [2, 6, 33, 63])
    def test_spectral_splits(self, split):
        rng = _rng(split)
        img = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
        base = jpeg.decode(jpeg.encode(40, 24, 3, img.tobytes(), quality=92))
        prog = jpeg.decode(
            jpeg.encode_progressive(
                40, 24, 3, img.tobytes(), quality=92, spectral_split=split
            )
        )
        assert bytes(base[3]) == bytes(prog[3])

    def test_gray_equals_baseline(self):
        rng = _rng(4)
        img = rng.integers(0, 256, size=(32, 48), dtype=np.uint8)
        base = jpeg.decode(jpeg.encode(48, 32, 1, img.tobytes(), quality=88))
        prog = jpeg.decode(
            jpeg.encode_progressive(48, 32, 1, img.tobytes(), quality=88)
        )
        assert bytes(base[3]) == bytes(prog[3])

    def test_long_eob_runs(self):
        # a flat image quantizes to zero AC everywhere -> every AC scan
        # is one long EOBn run across all blocks (the multi-block skip
        # and refinement-during-EOB paths)
        img = np.full((64, 64, 3), 77, dtype=np.uint8)
        base = jpeg.decode(jpeg.encode(64, 64, 3, img.tobytes(), quality=75))
        prog = jpeg.decode(
            jpeg.encode_progressive(64, 64, 3, img.tobytes(), quality=75)
        )
        assert bytes(base[3]) == bytes(prog[3])
        # and a half-flat image: EOB runs interrupted by busy blocks
        img2 = img.copy()
        rng = _rng(9)
        img2[:16, :16] = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        base = jpeg.decode(jpeg.encode(64, 64, 3, img2.tobytes(), quality=75))
        prog = jpeg.decode(
            jpeg.encode_progressive(64, 64, 3, img2.tobytes(), quality=75)
        )
        assert bytes(base[3]) == bytes(prog[3])

    def test_dc_only_prefix_decodes(self):
        # progressive's point: a truncated stream still renders. Cut at
        # the second SOS and append EOI -> blocky DC-only preview with
        # correct dimensions
        rng = _rng(2)
        img = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
        full = jpeg.encode_progressive(40, 24, 3, img.tobytes(), quality=90)
        first_sos = full.find(b"\xff\xda")
        second_sos = full.find(b"\xff\xda", first_sos + 2)
        assert second_sos > 0
        dec = jpeg.decode(full[:second_sos] + b"\xff\xd9")
        assert dec is not None and (dec[0], dec[1]) == (40, 24)
        # DC-only preview approximates the per-block means coarsely
        out = np.frombuffer(bytes(dec[3]), dtype=np.uint8).reshape(24, 40, 3)
        assert float(np.abs(out.astype(float) - img.astype(float)).mean()) < 80

    def test_progressive_bitflip_never_throws(self):
        rng = _rng(13)
        img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
        good = jpeg.encode_progressive(24, 16, 3, img.tobytes(), quality=85)
        for _ in range(60):
            bb = bytearray(good)
            k = int(rng.integers(2, len(bb)))
            bb[k] ^= 1 << int(rng.integers(0, 8))
            jpeg.decode(bytes(bb))  # None or a decode; never an exception
        for cut in (20, len(good) // 3, len(good) - 3):
            jpeg.decode(good[:cut])

    def test_fixture_contains_progressive(self):
        from seqspark.pipeline.multimodal import real_jpeg_asset_rows

        rows = real_jpeg_asset_rows(16)
        prog = [i for i, _m, c, _j in rows if bytes(c).find(b"\xff\xc2") >= 0]
        assert prog == [2, 6, 10, 14]


class TestAviContainer:
    def _clip(self, n_frames=4, w=24, h=16, seed=0):
        rng = _rng(seed)
        frames = []
        jf = []
        for k in range(n_frames):
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [(xx * 4 + k * 30) % 256, (yy * 6 + k * 20) % 256,
                 ((xx + yy) * 3 + k * 50) % 256],
                axis=-1,
            ).astype(np.uint8)
            frames.append(img)
            jf.append(jpeg.encode(w, h, 3, img.tobytes(), quality=95))
        return frames, avi.encode(w, h, jf, fps=5)

    def test_meta_and_frames(self):
        frames, b = self._clip(5)
        assert avi.meta(b) == (24, 16, 5)
        dec = avi.decode_frames(b)
        assert dec is not None
        w, h, out = dec
        assert (w, h, len(out)) == (24, 16, 5)
        for k, f in enumerate(out):
            got = np.frombuffer(f, dtype=np.uint8).reshape(16, 24, 3)
            # mod-256 wraps in the synthetic gradient are hard edges —
            # DCT ringing reaches ~13 at q95 there; 16 still catches a
            # broken dequant/IDCT (which is off by >>100)
            assert int(np.abs(got.astype(int) - frames[k].astype(int)).max()) <= 16

    def test_malformed(self):
        _frames, b = self._clip(2)
        assert avi.meta(b"") is None
        assert avi.meta(b"RIFF\x04\x00\x00\x00WAVE") is None
        assert avi.meta(b[:40]) is None
        assert avi.decode_frames(b[: len(b) // 2]) is None
        # frame count bomb: advertise too many frames
        bb = bytearray(b)
        i = bb.find(b"avih")
        import struct as _s

        bb[i + 8 + 16 : i + 8 + 20] = _s.pack("<I", 1 << 20)
        assert avi.meta(bytes(bb)) is None

    def test_mismatched_frame_dims_rejected(self):
        j1 = jpeg.encode(16, 16, 1, bytes(256), quality=80)
        j2 = jpeg.encode(8, 8, 1, bytes(64), quality=80)
        b = avi.encode(16, 16, [j1, j2])
        assert avi.decode_frames(b) is None


class TestJpegPipeline:
    def test_decode_assets_metadata(self, spark):
        from seqspark.pipeline.multimodal import (
            decode_assets, make_real_jpeg_assets)

        dec = decode_assets(make_real_jpeg_assets(spark, 8), fake=False)
        got = {r["asset_id"]: (r["width"], r["height"], r["n_frames"])
               for r in dec.collect()}
        assert got == {
            i: (17 + 2 * (i % 5), 11 + 2 * (i % 4), 1) for i in range(8)
        }

    def test_mjpeg_decode_and_sample_frames(self, spark):
        from seqspark.pipeline.multimodal import (
            _png_decode_pixels, decode_assets, make_real_mjpeg_assets,
            real_mjpeg_asset_rows, sample_frames)

        dec = decode_assets(make_real_mjpeg_assets(spark, 6), fake=False)
        got = {r["asset_id"]: (r["width"], r["height"], r["n_frames"])
               for r in dec.collect()}
        assert got == {
            i: (16 + 4 * (i % 3), 12 + 4 * (i % 2), 2 + i % 4)
            for i in range(6)
        }
        out = sample_frames(
            make_real_mjpeg_assets(spark, 4), every_n=2, fake=False
        ).collect()
        assert out
        src = {i: bytes(c) for i, _m, c, _j in real_mjpeg_asset_rows(4)}
        for r in out:
            w, h, frames = avi.decode_frames(src[r["asset_id"]])
            pw, ph, ch, px = _png_decode_pixels(bytes(r["frame"]))
            assert (pw, ph, ch) == (w, h, 3)
            assert bytes(px) == frames[r["frame_index"]]

    def test_resize_and_dhash_over_jpeg(self, spark):
        from pyspark.sql import functions as F  # noqa: F401

        from seqspark.pipeline.multimodal import (
            _decode_any_pixels, _dhash_of_pixels, dhash_images,
            make_real_jpeg_assets, real_jpeg_asset_rows, resize_images)

        assets = make_real_jpeg_assets(spark, 6)
        out = resize_images(assets, 16, 8, fake=False, codec="stdlib").collect()
        assert len(out) == 6
        for r in out:
            dec = _decode_any_pixels(bytes(r["content"]))
            assert dec is not None and (dec[0], dec[1]) == (16, 8)
        got = {r["asset_id"]: r["dhash"]
               for r in dhash_images(assets, fake=False).collect()}
        assert all(v is not None for v in got.values())
        # pure-Python parity on one asset
        b = bytes(real_jpeg_asset_rows(1)[0][2])
        w, h, ch, px = _decode_any_pixels(b)
        u = _dhash_of_pixels(w, h, ch, px, 8)
        assert got[0] == (u - (1 << 64) if u >= (1 << 63) else u)

    def test_dhash_cross_codec_robustness(self):
        # the perceptual POINT of dHash: the same picture as PNG and as a
        # lossy JPEG re-encode lands within a small Hamming distance
        from seqspark.pipeline.multimodal import (
            _decode_any_pixels, _dhash_of_pixels, _png_encode)

        h, w = 32, 48
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(xx * 5) % 256, (yy * 4) % 256, ((xx * yy) // 4) % 256], axis=-1
        ).astype(np.uint8)
        png = _png_encode(w, h, 3, bytearray(img.tobytes()))
        jpg = jpeg.encode(w, h, 3, img.tobytes(), quality=85, subsample="420")
        hp = _dhash_of_pixels(*_decode_any_pixels(png))
        hj = _dhash_of_pixels(*_decode_any_pixels(jpg))
        assert bin(hp ^ hj).count("1") <= 6

    def test_interframe_video_still_raises(self, spark):
        import pytest as _pytest
        from pyspark.sql.utils import PythonException

        from seqspark.pipeline.multimodal import ASSET_SCHEMA, decode_assets

        fake_mp4 = b"\x00\x00\x00\x18ftypmp42" + b"\0" * 64
        assets = spark.createDataFrame(
            [(1, "video", bytearray(fake_mp4), "{}")], ASSET_SCHEMA
        )
        with _pytest.raises(PythonException, match="MJPEG|ffmpeg"):
            decode_assets(assets, fake=False).collect()


class TestJpegHypothesis:
    """Generative coverage over the codec's parameter product space —
    random dimensions x content x quality x subsampling x restart x
    progressive, the combinations the fixed tests can't enumerate."""

    from hypothesis import given, settings, strategies as st

    @staticmethod
    def _image(rng, w, h, mode):
        if mode == 0:  # random noise
            return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        if mode == 1:  # flat
            return np.full((h, w, 3), int(rng.integers(0, 256)), dtype=np.uint8)
        yy, xx = np.mgrid[0:h, 0:w]  # smooth gradient
        return np.stack(
            [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=-1
        ).astype(np.uint8)

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 50),
        h=st.integers(1, 40),
        seed=st.integers(0, 10_000),
        mode=st.integers(0, 2),
        quality=st.sampled_from([60, 80, 92, 100]),
        subsample=st.sampled_from(["444", "422", "420"]),
        restart=st.sampled_from([0, 1, 3]),
        progressive=st.booleans(),
    )
    def test_roundtrip_never_throws_and_dims_survive(
        self, w, h, seed, mode, quality, subsample, restart, progressive
    ):
        rng = np.random.default_rng(seed)
        img = self._image(rng, w, h, mode)
        if progressive:
            b = jpeg.encode_progressive(
                w, h, 3, img.tobytes(), quality=quality, subsample=subsample
            )
        else:
            b = jpeg.encode(
                w, h, 3, img.tobytes(), quality=quality,
                subsample=subsample, restart=restart,
            )
        dec = jpeg.decode(b)
        assert dec is not None and (dec[0], dec[1], dec[2]) == (w, h, 3)
        out = np.frombuffer(bytes(dec[3]), dtype=np.uint8).reshape(h, w, 3)
        if mode == 1:  # flat images survive within rounding everywhere
            assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 33),
        seed=st.integers(0, 10_000),
        quality=st.sampled_from([70, 90, 100]),
        subsample=st.sampled_from(["444", "422", "420"]),
        split=st.integers(2, 63),
    )
    def test_progressive_equals_baseline_generative(
        self, w, h, seed, quality, subsample, split
    ):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        base = jpeg.decode(
            jpeg.encode(w, h, 3, img.tobytes(), quality=quality,
                        subsample=subsample)
        )
        prog = jpeg.decode(
            jpeg.encode_progressive(
                w, h, 3, img.tobytes(), quality=quality,
                subsample=subsample, spectral_split=split,
            )
        )
        assert prog is not None
        assert bytes(base[3]) == bytes(prog[3])


def test_dhash_project_parity(spark):
    # project= must return identical hashes while carrying only the
    # named columns (the content bytes skip the return Arrow trip)
    from seqspark.pipeline.multimodal import dhash_images, make_real_jpeg_assets

    assets = make_real_jpeg_assets(spark, 8)
    full = {r["asset_id"]: r["dhash"]
            for r in dhash_images(assets, fake=False).collect()}
    proj_df = dhash_images(assets, fake=False, project=("asset_id",))
    assert proj_df.columns == ["asset_id", "dhash"]
    proj = {r["asset_id"]: r["dhash"] for r in proj_df.collect()}
    assert full == proj


class TestExifOrientation:
    """r12b: EXIF 0x0112 camera rotations are METADATA — the perceptual
    pipeline must normalize to the upright view or rotated-by-metadata
    duplicates never pair."""

    @staticmethod
    def _exif_app1(orientation, little=False):
        import struct

        if little:
            tiff = (b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
                    + struct.pack("<H", 1)
                    + struct.pack("<HHIHH", 0x0112, 3, 1, orientation, 0)
                    + struct.pack("<I", 0))
        else:
            tiff = (b"MM" + struct.pack(">H", 42) + struct.pack(">I", 8)
                    + struct.pack(">H", 1)
                    + struct.pack(">HHIHH", 0x0112, 3, 1, orientation, 0)
                    + struct.pack(">I", 0))
        payload = b"Exif\x00\x00" + tiff
        return (b"\xff\xe1"
                + struct.pack(">H", len(payload) + 2) + payload)

    @classmethod
    def _tagged(cls, b, orientation, little=False):
        return b[:2] + cls._exif_app1(orientation, little) + b[2:]

    def _upright(self):
        h, w = 24, 16
        yy, xx = np.mgrid[0:h, 0:w]
        return np.stack(
            [xx * 16, yy * 10, 255 - xx * 12], axis=-1).astype(np.uint8)

    def _stored(self, up, o):
        k, mirror = jpeg._EXIF_TRANSFORMS[o]
        a = np.rot90(up, -k)
        if mirror:
            a = a[:, ::-1, :]
        return np.ascontiguousarray(a)

    @pytest.mark.parametrize("o", list(range(1, 9)))
    @pytest.mark.parametrize("little", [False, True])
    def test_all_orientations_decode_upright(self, o, little):
        from seqspark.pipeline.multimodal import _decode_any_pixels

        up = self._upright()
        stored = self._stored(up, o)
        sh, sw = stored.shape[0], stored.shape[1]
        b = self._tagged(
            jpeg.encode(sw, sh, 3, stored.tobytes(), quality=100), o, little)
        assert jpeg.exif_orientation(b) == o
        dw, dh, ch, px = _decode_any_pixels(b)
        assert (dw, dh) == (16, 24)
        got = np.frombuffer(bytes(px), dtype=np.uint8).reshape(dh, dw, 3)
        assert int(np.abs(got.astype(int) - up.astype(int)).max()) <= 2

    def test_metadata_reports_upright_dims(self):
        from seqspark.pipeline.multimodal import _jpeg_meta

        up = self._upright()
        stored = self._stored(up, 6)  # 90-degree camera rotation
        sh, sw = stored.shape[0], stored.shape[1]
        b = self._tagged(jpeg.encode(sw, sh, 3, stored.tobytes()), 6)
        assert _jpeg_meta(b) == (16, 24, 1)  # upright, not stored
        assert _jpeg_meta(
            jpeg.encode(sw, sh, 3, stored.tobytes())) == (24, 16, 1)

    def test_rotated_duplicate_pairs_by_dhash(self):
        from seqspark.pipeline.multimodal import (
            _decode_any_pixels, _dhash_of_pixels)

        up = self._upright()
        plain = jpeg.encode(16, 24, 3, up.tobytes(), quality=92)
        stored = self._stored(up, 8)
        rotated = self._tagged(
            jpeg.encode(24, 16, 3, stored.tobytes(), quality=92), 8)
        ha = _dhash_of_pixels(*_decode_any_pixels(plain))
        hb = _dhash_of_pixels(*_decode_any_pixels(rotated))
        assert bin(ha ^ hb).count("1") <= 4

    def test_no_exif_and_malformed_default_to_1(self):
        import struct

        plain = jpeg.encode(16, 16, 1, bytes(256), quality=80)
        assert jpeg.exif_orientation(plain) == 1
        assert jpeg.exif_orientation(b"") == 1
        xmp = b"\xff\xe1" + struct.pack(">H", 12) + b"http://ns.a"
        assert jpeg.exif_orientation(plain[:2] + xmp + plain[2:]) == 1
        # truncated EXIF must not throw
        good = self._tagged(plain, 6)
        for cut in range(4, 40, 7):
            jpeg.exif_orientation(good[:cut])


class TestKeyframes:
    def test_frame_dhashes_and_selection(self, spark):
        from pyspark.sql import functions as F

        from seqspark.pipeline.multimodal import (
            frame_dhashes, keyframes, make_real_mjpeg_assets)

        mj = make_real_mjpeg_assets(spark, 6)
        fdh = frame_dhashes(mj, fake=False)
        rows = fdh.collect()
        # one row per frame of every asset
        per = {}
        for r in rows:
            per.setdefault(r["asset_id"], set()).add(r["frame_index"])
        for i in range(6):
            assert per[i] == set(range(2 + i % 4)), i
        kf = keyframes(fdh, k=2).collect()
        by_asset = {}
        for r in kf:
            by_asset.setdefault(r["asset_id"], []).append(r)
        for i, sel in by_asset.items():
            assert len(sel) <= 2
            # frame 0 always selected (novelty 64 beats any Hamming)
            zero = [r for r in sel if r["frame_index"] == 0]
            assert zero and zero[0]["novelty"] == 64

    def test_keyframes_pick_the_scene_change(self, spark):
        # craft a clip: frames 0,1,2 identical, frame 3 very different —
        # the second key frame must be frame 3
        from seqspark.pipeline import avi as _avi
        from seqspark.pipeline.multimodal import (
            ASSET_SCHEMA, frame_dhashes, keyframes)

        w, h = 32, 24
        yy, xx = np.mgrid[0:h, 0:w]
        flat = np.stack([xx * 8, yy * 8, xx * 4], axis=-1).astype(np.uint8)
        other = np.ascontiguousarray(flat[::-1, ::-1])  # reversed gradient
        jf = [jpeg.encode(w, h, 3, flat.tobytes(), quality=95)] * 3 + [
            jpeg.encode(w, h, 3, other.tobytes(), quality=95)]
        assets = spark.createDataFrame(
            [(1, "video", bytearray(_avi.encode(w, h, jf)), "{}")],
            ASSET_SCHEMA)
        kf = keyframes(frame_dhashes(assets, fake=False), k=2).collect()
        assert sorted(r["frame_index"] for r in kf) == [0, 3]

    def test_stills_and_undecodable(self, spark):
        from seqspark.pipeline.multimodal import (
            ASSET_SCHEMA, frame_dhashes, make_real_jpeg_assets)

        jp = make_real_jpeg_assets(spark, 4)
        rows = frame_dhashes(jp, fake=False).collect()
        assert sorted(r["asset_id"] for r in rows) == [0, 1, 2, 3]
        assert all(r["n_frames"] == 1 and r["frame_index"] == 0
                   for r in rows)
        bad = spark.createDataFrame(
            [(9, "video", bytearray(b"not media"), "{}")], ASSET_SCHEMA)
        assert frame_dhashes(bad, fake=False).count() == 0  # no rows

    def test_selection_plan_is_jvm_side(self, spark):
        from seqspark.pipeline.multimodal import (
            frame_dhashes, keyframes, make_real_mjpeg_assets)

        kf = keyframes(
            frame_dhashes(make_real_mjpeg_assets(spark, 4), fake=False), k=2)
        plan = kf._jdf.queryExecution().executedPlan().toString()
        # the SELECTION stage adds no second Python crossing
        assert plan.count("MapInPandas") == 1


class TestBilinearResize:
    def test_bilinear_smooths_and_matches_dims(self):
        from seqspark.pipeline.multimodal import (
            _decode_any_pixels, _png_encode, _stdlib_png_resize)

        # checkerboard: nearest keeps hard 0/255 pixels; bilinear blends
        h, w = 32, 32
        board = np.indices((h, w)).sum(axis=0) % 2 * 255
        img = np.stack([board] * 3, axis=-1).astype(np.uint8)
        b = _png_encode(w, h, 3, bytearray(img.tobytes()))
        near = _decode_any_pixels(_stdlib_png_resize(b, 16, 16, "nearest"))
        bil = _decode_any_pixels(_stdlib_png_resize(b, 16, 16, "bilinear"))
        assert (near[0], near[1]) == (16, 16) and (bil[0], bil[1]) == (16, 16)
        nv = np.frombuffer(bytes(near[3]), dtype=np.uint8)
        bv = np.frombuffer(bytes(bil[3]), dtype=np.uint8)
        # nearest samples the lattice (pure 0/255, here phase-locked to
        # all-0); bilinear lands exactly between the board's extremes
        assert set(np.unique(nv).tolist()) <= {0, 255}
        assert set(np.unique(bv).tolist()) == {128}

    def test_bilinear_identity_at_same_size(self):
        from seqspark.pipeline.multimodal import (
            _decode_any_pixels, _png_encode, _stdlib_png_resize)

        rng = _rng(3)
        img = rng.integers(0, 256, size=(12, 17, 3), dtype=np.uint8)
        b = _png_encode(17, 12, 3, bytearray(img.tobytes()))
        out = _decode_any_pixels(_stdlib_png_resize(b, 17, 12, "bilinear"))
        got = np.frombuffer(bytes(out[3]), dtype=np.uint8).reshape(12, 17, 3)
        assert np.array_equal(got, img)  # 1:1 bilinear is exact

    def test_operator_param_and_jpeg_input(self, spark):
        from seqspark.pipeline.multimodal import (
            _decode_any_pixels, make_real_jpeg_assets, resize_images)

        out = resize_images(
            make_real_jpeg_assets(spark, 4), 20, 10,
            fake=False, codec="stdlib", method="bilinear",
        ).collect()
        assert len(out) == 4
        for r in out:
            dec = _decode_any_pixels(bytes(r["content"]))
            assert (dec[0], dec[1]) == (20, 10)
