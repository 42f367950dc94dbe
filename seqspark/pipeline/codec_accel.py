"""Accelerated (Pillow) codec seam for the multimodal kernels.

Every multimodal docstring names ``mapInPandas`` as the production swap
point where Pillow / libjpeg-turbo replaces the pure-stdlib kernels at
100 TB scale; this module IS that swap point, made concrete and
testable. The contracts mirror the stdlib kernels exactly:

- :func:`pil_image_module` — capability probe; returns ``PIL.Image`` or
  ``None`` (runs in the executor, so the import resolves against the
  worker environment, exactly like ``multimodal._require_pil``).
- :func:`decode_pixels_accel` — ``(w, h, ch, bytearray)`` in the stdlib
  kernel layout (8-bit RGB/RGBA rows, top-down, EXIF-upright), or
  ``None`` when the accelerated path can't handle the input.
- :func:`meta_accel` — header ``(width, height, n_frames)`` with the
  same EXIF-upright convention as ``multimodal._jpeg_meta``.
- :func:`resize_png_accel` — resized RGB(A) PNG bytes, or ``None``.

All entry points take an injectable ``pil=`` module so the dispatch
logic is unit-testable in an environment WITHOUT Pillow (the container
this repo is verified in has none): tests drive them with a faithful
fake backed by the stdlib kernels themselves, plus ``skipif``-gated
real-Pillow differential tests (exact for PNG decode, bounded-delta for
JPEG decode and resampling) that activate wherever Pillow exists.

Orientation parity: rather than trusting two EXIF implementations to
agree, the accelerated decode reads the raw (stored) pixels from Pillow
and then applies THIS repo's ``jpeg.apply_orientation`` kernel — the
identical transform the stdlib path uses, so upright geometry can never
drift between the two paths.

Reference anchor: the reference ships no image codecs at all (its scope
is logs — ``docs/en/03-indexing.md``); this seam belongs to the
training-data-pipeline amendments in SURVEY.md §2.11.
"""

from __future__ import annotations

import io
from typing import Optional

from seqspark.pipeline import jpeg as _jpeg


#: one-shot capability probe. Python does NOT cache FAILED imports, and
#: the metadata kernels call this per row — an uncached miss costs ~55µs
#: (measured), which at header-parse speeds would DOMINATE the row. The
#: probe runs once per process (each executor worker probes its own
#: environment, which is the seam's point).
_PROBED = False
_PIL = None


def pil_image_module():
    """Return ``PIL.Image`` when Pillow is importable, else ``None``
    (probed once per process)."""
    global _PROBED, _PIL
    if not _PROBED:
        try:
            from PIL import Image
            _PIL = Image
        except ImportError:  # pragma: no cover - env-dependent
            _PIL = None
        _PROBED = True
    return _PIL


def _exif_orientation_of(img) -> int:
    """EXIF 0x0112 orientation of an open PIL image (1 when absent or
    unreadable — the identity, same default as ``jpeg.exif_orientation``)."""
    try:
        o = int(img.getexif().get(0x0112, 1) or 1)
    except Exception:
        return 1
    return o if 1 <= o <= 8 else 1


def decode_pixels_accel(b: bytes, pil=None):
    """Decode raster bytes through Pillow into the stdlib kernels'
    ``(w, h, ch, bytearray)`` layout: 8-bit, RGB (ch=3) when the source
    has no alpha, RGBA (ch=4) when it does, rows top-down, EXIF-upright.

    Returns ``None`` when Pillow is unavailable or cannot open the
    payload — the caller falls back to the stdlib kernels, so a format
    only one side understands still decodes.
    """
    Image = pil if pil is not None else pil_image_module()
    if Image is None:
        return None
    try:
        with Image.open(io.BytesIO(b or b"")) as img:
            orientation = _exif_orientation_of(img)
            bands = img.getbands()
            has_alpha = "A" in bands or (
                img.mode == "P" and "transparency" in getattr(img, "info", {})
            )
            mode = "RGBA" if has_alpha else "RGB"
            flat = img.convert(mode)
            w, h = flat.width, flat.height
            px = bytearray(flat.tobytes())
    except Exception:
        return None
    ch = len(mode)
    if orientation != 1:
        # reuse the repo's own orientation kernel so the upright
        # transform is bit-identical to the stdlib decode path
        return _jpeg.apply_orientation(w, h, ch, px, orientation)
    return w, h, ch, px


def meta_accel(b: bytes, pil=None) -> Optional[tuple[int, int, int]]:
    """Header-only ``(width, height, n_frames)`` via Pillow, reporting
    the EXIF-UPRIGHT dimensions (orientations 5-8 transpose the image)
    so the metadata agrees with the pixels every decode path produces —
    the same convention as ``multimodal._jpeg_meta``. ``None`` when
    Pillow is absent or can't open the payload."""
    Image = pil if pil is not None else pil_image_module()
    if Image is None:
        return None
    try:
        with Image.open(io.BytesIO(b or b"")) as img:
            w, h = img.width, img.height
            n_frames = int(getattr(img, "n_frames", 1))
            if _exif_orientation_of(img) in (5, 6, 7, 8):
                w, h = h, w
    except Exception:
        return None
    return int(w), int(h), n_frames


def resize_png_accel(
    b: bytes, width: int, height: int, method: str = "nearest", pil=None
) -> Optional[bytes]:
    """Resize raster bytes to an RGB(A) PNG through Pillow. ``method``
    maps to the matching Pillow resample filter (ADVICE r12: the old
    auto branch ignored ``method`` and used Pillow's default, so the
    same call produced different pixels depending on the environment).

    The source is decoded via :func:`decode_pixels_accel` first so EXIF
    orientation normalization is shared with the stdlib path, then
    resampled and re-encoded by Pillow. Returns ``None`` when Pillow is
    unavailable or the payload doesn't decode — callers fall back to
    ``multimodal._stdlib_png_resize``.
    """
    Image = pil if pil is not None else pil_image_module()
    if Image is None:
        return None
    dec = decode_pixels_accel(b, pil=Image)
    if dec is None:
        return None
    sw, sh, ch, px = dec
    mode = "RGBA" if ch == 4 else "RGB"
    filters = getattr(Image, "Resampling", Image)
    resample = filters.NEAREST if method == "nearest" else filters.BILINEAR
    try:
        img = Image.frombytes(mode, (sw, sh), bytes(px))
        out = io.BytesIO()
        img.resize((width, height), resample=resample).save(out, format="PNG")
    except Exception:
        return None
    return out.getvalue()
