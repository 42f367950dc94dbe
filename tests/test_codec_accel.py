"""The Pillow codec seam (r13): dispatch + differential parity.

The container this repo is verified in has NO Pillow, so the seam is
proven three ways:

1. ALWAYS-RUN dispatch tests drive ``codec_accel`` with a FAITHFUL fake
   PIL module backed by this repo's own stdlib kernels (open = PNG
   decode, resize = stdlib resampler, save = PNG encode) — these pin
   that ``codec="auto"`` routes through the accelerated module, honors
   ``method``, applies the shared orientation kernel, and falls back to
   stdlib per-payload.
2. ALWAYS-RUN (when Pillow is absent) end-to-end tests pin that
   ``codec="auto"`` on the real executors produces byte-identical
   output to ``codec="stdlib"`` — the fallback IS the stdlib kernel.
3. ``skipif``-gated REAL-Pillow differential tests activate wherever
   Pillow exists: exact parity for lossless PNG decode and header
   metadata (incl. EXIF-upright JPEG dims), bounded-delta for JPEG
   decode (independent IDCTs, tolerance max<=8 / mean<=2.0) and for
   bilinear resampling on a smooth gradient (different-but-valid
   filter supports, tolerance max<=32 / mean<=4.0).
"""

import io
import struct

import numpy as np
import pytest

from seqspark.pipeline import codec_accel, jpeg as _jpeg
from seqspark.pipeline.multimodal import (
    _decode_any_pixels,
    _png_decode_pixels,
    _png_encode,
    _resize_kernel,
    _stdlib_image_meta,
    _stdlib_png_resize,
)

HAS_PIL = codec_accel.pil_image_module() is not None


# ------------------------------------------------------------ fake PIL

class _FakeResampling:
    NEAREST = 0
    BILINEAR = 2


class FakeImage:
    """Faithful mini PIL.Image backed by the repo's stdlib kernels."""

    def __init__(self, w, h, ch, px, exif=None, n_frames=1):
        self.width, self.height = w, h
        self.mode = "RGBA" if ch == 4 else "RGB"
        self._ch, self._px = ch, bytearray(px)
        self.info = {}
        self._exif = dict(exif or {})
        if n_frames > 1:
            self.n_frames = n_frames

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def getbands(self):
        return tuple(self.mode)

    def getexif(self):
        return dict(self._exif)

    def convert(self, mode):
        if mode == self.mode:
            return self
        a = np.frombuffer(bytes(self._px), dtype=np.uint8).reshape(
            self.height, self.width, self._ch
        )
        if mode == "RGBA":  # RGB -> RGBA
            out = np.concatenate(
                [a, np.full((self.height, self.width, 1), 255, np.uint8)],
                axis=-1,
            )
        else:  # RGBA -> RGB
            out = a[:, :, :3]
        return FakeImage(self.width, self.height, len(mode), out.tobytes())

    def tobytes(self):
        return bytes(self._px)

    def resize(self, size, resample=_FakeResampling.NEAREST):
        w, h = size
        method = (
            "nearest" if resample == _FakeResampling.NEAREST else "bilinear"
        )
        src_png = _png_encode(self.width, self.height, self._ch, self._px)
        out_png = _stdlib_png_resize(src_png, w, h, method=method)
        dec = _png_decode_pixels(out_png)
        return FakeImage(w, h, dec[2], dec[3])

    def save(self, fp, format=None):
        assert format == "PNG"
        fp.write(_png_encode(self.width, self.height, self._ch, self._px))


class FakePIL:
    Resampling = _FakeResampling

    @staticmethod
    def open(fp):
        data = fp.read()
        dec = _png_decode_pixels(data)
        if dec is None:
            raise OSError("cannot identify image file")
        return FakeImage(dec[0], dec[1], dec[2], dec[3])

    @staticmethod
    def frombytes(mode, size, data):
        return FakeImage(size[0], size[1], len(mode), data)


def _gradient_png(w=21, h=13, ch=3):
    yy, xx = np.mgrid[0:h, 0:w]
    planes = [
        (xx * 255 // max(1, w - 1)).astype(np.uint8),
        (yy * 255 // max(1, h - 1)).astype(np.uint8),
        ((xx + yy) * 7 % 256).astype(np.uint8),
    ]
    if ch == 4:
        planes.append(((xx * yy) % 256).astype(np.uint8))
    px = np.stack(planes, axis=-1).tobytes()
    return _png_encode(w, h, ch, bytearray(px)), px


# ------------------------------------------------ dispatch (fake PIL)

@pytest.mark.parametrize("ch", [3, 4])
def test_fake_pil_decode_matches_stdlib_exact(ch):
    png, _ = _gradient_png(ch=ch)
    got = codec_accel.decode_pixels_accel(png, pil=FakePIL)
    want = _decode_any_pixels(png)
    assert got is not None
    assert (got[0], got[1], got[2]) == (want[0], want[1], want[2])
    assert bytes(got[3]) == bytes(want[3])


def test_decode_accel_none_without_pil_and_on_garbage():
    png, _ = _gradient_png()
    if not HAS_PIL:
        assert codec_accel.decode_pixels_accel(png) is None
    assert codec_accel.decode_pixels_accel(b"not an image", pil=FakePIL) is None
    assert codec_accel.meta_accel(b"junk", pil=FakePIL) is None
    assert codec_accel.resize_png_accel(b"junk", 4, 4, pil=FakePIL) is None


def test_meta_accel_fake_matches_stdlib_and_swaps_oriented_dims():
    png, _ = _gradient_png()
    assert codec_accel.meta_accel(png, pil=FakePIL) == _stdlib_image_meta(png)

    class OrientedPIL(FakePIL):
        @staticmethod
        def open(fp):
            img = FakePIL.open(fp)
            img._exif = {0x0112: 6}  # 90° CW: upright dims are swapped
            return img

    w, h, n = codec_accel.meta_accel(png, pil=OrientedPIL)
    sw, sh, _ = _stdlib_image_meta(png)
    assert (w, h, n) == (sh, sw, 1)


def test_decode_accel_applies_repo_orientation_kernel():
    png, px = _gradient_png(w=6, h=4, ch=3)

    class OrientedPIL(FakePIL):
        @staticmethod
        def open(fp):
            img = FakePIL.open(fp)
            img._exif = {0x0112: 6}
            return img

    got = codec_accel.decode_pixels_accel(png, pil=OrientedPIL)
    want = _jpeg.apply_orientation(6, 4, 3, bytearray(px), 6)
    assert (got[0], got[1], got[2]) == (want[0], want[1], want[2])
    assert bytes(got[3]) == bytes(want[3])


@pytest.mark.parametrize("method", ["nearest", "bilinear"])
def test_resize_accel_fake_honors_method_exactly(method):
    png, _ = _gradient_png()
    got = codec_accel.resize_png_accel(png, 9, 7, method=method, pil=FakePIL)
    want = _stdlib_png_resize(png, 9, 7, method=method)
    # the fake resamples with the stdlib kernels, so honoring `method`
    # means byte-equal decoded pixels (PNG bytes themselves are equal
    # here because both sides use the same encoder)
    assert bytes(_png_decode_pixels(got)[3]) == bytes(
        _png_decode_pixels(want)[3]
    )


def test_resize_accel_fake_method_changes_pixels():
    png, _ = _gradient_png()
    near = codec_accel.resize_png_accel(png, 9, 7, method="nearest",
                                        pil=FakePIL)
    bil = codec_accel.resize_png_accel(png, 9, 7, method="bilinear",
                                       pil=FakePIL)
    assert bytes(_png_decode_pixels(near)[3]) != bytes(
        _png_decode_pixels(bil)[3]
    )


def test_resize_kernel_auto_routes_through_accel(monkeypatch):
    png, _ = _gradient_png()
    monkeypatch.setattr(codec_accel, "pil_image_module", lambda: FakePIL)
    auto = _resize_kernel(png, 8, 8, "bilinear", "auto")
    stdlib = _resize_kernel(png, 8, 8, "bilinear", "stdlib")
    assert bytes(_png_decode_pixels(auto)[3]) == bytes(
        _png_decode_pixels(stdlib)[3]
    )
    # and codec="stdlib" must NOT touch the accel module at all
    def boom():  # pragma: no cover - called only on regression
        raise AssertionError("stdlib mode consulted the accel seam")

    monkeypatch.setattr(codec_accel, "pil_image_module", boom)
    assert _resize_kernel(png, 8, 8, "bilinear", "stdlib") == stdlib


def test_resize_kernel_auto_falls_back_per_payload(monkeypatch):
    # GIF payload: the (PNG-only) fake can't open it -> accel returns
    # None -> the stdlib kernel must still resize it
    from seqspark.pipeline.multimodal import _gif_encode

    monkeypatch.setattr(codec_accel, "pil_image_module", lambda: FakePIL)
    palette = bytes(
        b for i in range(256) for b in (i, (i * 3) % 256, (i * 7) % 256)
    )
    gif = _gif_encode(
        8, 6, [{"x": 0, "y": 0, "fw": 8, "fh": 6,
                "pixels": bytes(range(48))}], palette
    )
    auto = _resize_kernel(gif, 4, 4, "nearest", "auto")
    assert auto == _resize_kernel(gif, 4, 4, "nearest", "stdlib")


def test_resize_kernel_auto_without_pil_is_stdlib():
    if HAS_PIL:
        pytest.skip("environment has Pillow; fallback identity not expected")
    png, _ = _gradient_png()
    assert _resize_kernel(png, 8, 8, "nearest", "auto") == _resize_kernel(
        png, 8, 8, "nearest", "stdlib"
    )


# ------------------------------------------- executor path (no PIL env)

@pytest.mark.skipif(HAS_PIL, reason="fallback-identity holds only without PIL")
def test_resize_images_auto_equals_stdlib_on_executors(spark):
    from seqspark.pipeline.multimodal import make_real_assets, resize_images

    assets = make_real_assets(spark, 12)
    got = {
        r["asset_id"]: bytes(r["content"])
        for r in resize_images(assets, 10, 10, codec="auto").collect()
    }
    want = {
        r["asset_id"]: bytes(r["content"])
        for r in resize_images(assets, 10, 10, codec="stdlib").collect()
    }
    assert got == want and len(got) > 0


@pytest.mark.skipif(HAS_PIL, reason="fallback-identity holds only without PIL")
def test_dhash_auto_equals_stdlib_on_executors(spark):
    from seqspark.pipeline.multimodal import dhash_images, make_real_jpeg_assets

    assets = make_real_jpeg_assets(spark, 12)
    got = {
        r["asset_id"]: r["dhash"]
        for r in dhash_images(assets, project=("asset_id",),
                              codec="auto").collect()
    }
    want = {
        r["asset_id"]: r["dhash"]
        for r in dhash_images(assets, project=("asset_id",),
                              codec="stdlib").collect()
    }
    assert got == want


def test_decode_assets_metadata_upright_via_seam(spark):
    # the decode_assets metadata path now goes accel-first with a
    # stdlib fallback; either way EXIF-oriented JPEGs must report
    # UPRIGHT dims (the r13 parity fix)
    from seqspark.pipeline.multimodal import ASSET_SCHEMA, decode_assets

    w, h = 10, 6
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.stack([xx * 20, yy * 30, xx + yy], axis=-1).astype(np.uint8)
    plain = _jpeg.encode(w, h, 3, px.tobytes(), quality=90)
    app1 = (
        b"Exif\x00\x00" + b"MM\x00\x2a\x00\x00\x00\x08"
        + struct.pack(">H", 1)
        + struct.pack(">HHIHH", 0x0112, 3, 1, 6, 0)
        + b"\x00\x00\x00\x00"
    )
    tagged = (
        plain[:2]
        + b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
        + plain[2:]
    )
    df = spark.createDataFrame(
        [(1, "image", bytearray(tagged), "{}")], ASSET_SCHEMA
    )
    row = decode_assets(df, fake=False).collect()[0]
    assert (row["width"], row["height"]) == (h, w)  # swapped = upright


# --------------------------------------------- real Pillow differential

@pytest.mark.skipif(
    not HAS_PIL,
    reason="Pillow not installed — PERMANENT waiver in the PIL-less "
    "verification container (COVERAGE.md §r15 permanent waiver); "
    "activates automatically wherever Pillow exists",
)
class TestRealPillowParity:
    def test_png_decode_exact(self):
        for ch in (3, 4):
            png, _ = _gradient_png(ch=ch)
            got = codec_accel.decode_pixels_accel(png)
            want = _decode_any_pixels(png)
            assert (got[0], got[1], got[2]) == (want[0], want[1], want[2])
            assert bytes(got[3]) == bytes(want[3])

    def test_meta_parity_png_and_exif_jpeg(self):
        png, _ = _gradient_png()
        assert codec_accel.meta_accel(png) == _stdlib_image_meta(png)
        w, h = 16, 10
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack([xx * 10, yy * 20, xx * yy], axis=-1).astype(np.uint8)
        plain = _jpeg.encode(w, h, 3, px.tobytes(), quality=90)
        app1 = (
            b"Exif\x00\x00" + b"MM\x00\x2a\x00\x00\x00\x08"
            + struct.pack(">H", 1)
            + struct.pack(">HHIHH", 0x0112, 3, 1, 6, 0)
            + b"\x00\x00\x00\x00"
        )
        tagged = (
            plain[:2]
            + b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
            + plain[2:]
        )
        assert codec_accel.meta_accel(tagged) == _stdlib_image_meta(tagged)

    def test_jpeg_decode_bounded_delta(self):
        w, h = 48, 32
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack(
            [xx * 5 % 256, yy * 7 % 256, (xx + yy) * 3 % 256], axis=-1
        ).astype(np.uint8)
        b = _jpeg.encode(w, h, 3, px.tobytes(), quality=90)
        got = codec_accel.decode_pixels_accel(b)
        want = _decode_any_pixels(b)
        a = np.frombuffer(bytes(got[3]), np.uint8).astype(np.int16)
        c = np.frombuffer(bytes(want[3]), np.uint8).astype(np.int16)
        d = np.abs(a - c)
        assert d.max() <= 8 and d.mean() <= 2.0

    def test_bilinear_resize_bounded_delta_on_gradient(self):
        png, _ = _gradient_png(w=40, h=30)
        accel = codec_accel.resize_png_accel(png, 16, 12, method="bilinear")
        stdlib = _stdlib_png_resize(png, 16, 12, method="bilinear")
        a = np.frombuffer(
            bytes(_png_decode_pixels(accel)[3]), np.uint8
        ).astype(np.int16)
        c = np.frombuffer(
            bytes(_png_decode_pixels(stdlib)[3]), np.uint8
        ).astype(np.int16)
        d = np.abs(a - c)
        assert d.max() <= 32 and d.mean() <= 4.0
