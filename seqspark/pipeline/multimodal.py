"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The DEFAULT (``fake=False``) runs REAL kernels — a production caller gets
honest decoding or an honest ``NotImplementedError`` when a codec is
absent, never silently fake bytes. ``fake=True`` (opt-in, used by tests
and the synthetic contract entries) runs a deterministic fake decoder so
the Spark-side plumbing — schema, batch iteration, partitioning — is
fully testable without media libraries.

Real kernels sit behind per-modality capability detection, imported
inside the executor batch function:

- image: Pillow (``PIL.Image``) when installed; without it, a stdlib
  header parser covers PNG (incl. APNG frame counts), BMP, GIF and JPEG
  (SOF marker walk — baseline/progressive/arithmetic variants)
  metadata; a pure-stdlib PNG codec (zlib + scanline unfilter) covers
  8-bit RGB/RGBA PNG pixels, and the r12 JPEG decoder (``jpeg.py``:
  LUT Huffman + vectorized IDCT, 4:4:4/4:2:2/4:2:0, restart intervals,
  baseline AND progressive SOF2) covers real JPEG pixels — other
  formats raise ``NotImplementedError``;
- audio: stdlib ``wave`` (WAV), plus r12b parsers for AIFF
  (big-endian PCM) and Sun/NeXT ``.snd`` (G.711 mu-law + linear PCM);
  decoded metadata maps (width, height, n_frames) → (channels,
  bits-per-sample, audio frames);
- video: the Y4M (YUV4MPEG2) raw container decodes fully stdlib-side
  (r12: header walk for metadata, BT.601 YUV→RGB for frame extraction,
  C420/C422/C444/Cmono), and MJPEG-in-AVI (``avi.py`` over the JPEG
  codec) covers one COMPRESSED container; inter-frame codecs
  (mp4/webm/...) raise ``NotImplementedError`` — no ffmpeg binding in
  this container.

Frame extraction (``sample_frames``, real mode) covers stills, animated
GIF (r12 stdlib LZW + compositing), APNG (r12 acTL/fcTL/fdAT over the
PNG codec), Y4M raw video and MJPEG-AVI; each selected frame is emitted
as a PNG.
"""

from __future__ import annotations

import hashlib
import io
import struct
import zlib
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import avi as _avi
from . import codec_accel as _accel
from . import flac as _flac
from . import vp8l as _vp8l
from . import jpeg as _jpeg
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: schema of a multimodal asset table
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("content", BinaryType()),
        StructField("meta_json", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def _fake_decode(content: bytes) -> tuple[int, int, int]:
    """Deterministic fake decoder: derives (width, height, n_frames) from a
    digest so tests have stable expectations."""
    h = hashlib.sha256(content or b"").digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    n_frames = 1 + h[2] % 8
    return width, height, n_frames


def _require_pil():
    """Capability probe for the Pillow-backed kernels (runs in the
    executor, so the import resolves against the worker's environment)."""
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "this kernel requires Pillow (pip install pillow)"
        ) from e
    return Image


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(data: bytes) -> Iterator[tuple[bytes, bytes]]:
    """Yield (type, payload) for each well-formed PNG chunk."""
    pos = len(_PNG_SIG)
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) < length:
            return
        yield ctype, payload
        pos += 12 + length  # len + type + payload + crc


def _stdlib_image_meta(content: bytes) -> Optional[tuple[int, int, int]]:
    """Header-only (width, height, n_frames) for PNG/BMP/GIF/JPEG/TIFF/WebP via struct —
    no raster decode, so it works for any bit depth / color type. Returns
    None for unrecognized formats (caller raises)."""
    b = content or b""
    if b.startswith(_PNG_SIG):
        width = height = None
        n_frames = 1
        for ctype, payload in _png_chunks(b):
            if ctype == b"IHDR" and len(payload) >= 8:
                width, height = struct.unpack(">II", payload[:8])
            elif ctype == b"acTL" and len(payload) >= 4:
                # APNG animation control: num_frames
                (n_frames,) = struct.unpack(">I", payload[:4])
            elif ctype == b"IDAT":
                break  # metadata chunks precede image data
        if width is not None:
            return int(width), int(height), int(n_frames)
        return None
    if b.startswith(b"BM") and len(b) >= 26:
        (dib_size,) = struct.unpack("<I", b[14:18])
        if dib_size >= 40 and len(b) >= 26:
            width, height = struct.unpack("<ii", b[18:26])
            # negative height = top-down row order, same pixel dimensions
            return int(width), abs(int(height)), 1
        return None
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        width, height = struct.unpack("<HH", b[6:10])
        # real frame count via a block WALK (descriptor + sub-block
        # skipping, no LZW decode — bounded by the input length): the
        # r12 GIF frame extractor needs n_frames to drive sampling, and
        # reporting 1 for an animation silently dropped every frame but
        # the first. A malformed block stream degrades to the frames
        # counted so far (min 1), never a throw.
        n_frames = _gif_count_frames(b)
        return int(width), int(height), max(1, n_frames)
    if b.startswith(b"\xff\xd8"):
        return _jpeg_meta(b)
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        return _tiff_meta(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        return _webp_meta(b)
    if b[4:8] == b"ftyp":
        return _avif_meta(b)
    return None


def _webp_meta(b: bytes) -> Optional[tuple[int, int, int]]:
    """Header-only (width, height, n_frames) for WebP (r14): RIFF chunk
    walk covering all three bitstream flavors — ``VP8 `` (lossy: key
    frame start code + 14-bit dims), ``VP8L`` (lossless: 0x2f signature
    + two 14-bit dims-minus-one), ``VP8X`` (extended: 24-bit canvas
    dims-minus-one; animated files report the ANMF frame count). r15:
    VP8L payloads additionally PIXEL-decode through the pure-Python
    codec (`vp8l.py`); lossy ``VP8 `` pixel decode stays an honest
    raise — it needs a boolean-arithmetic entropy decoder."""
    pos = 12
    n = len(b)
    w = h = None
    n_frames = 0
    animated = False
    while pos + 8 <= n:
        fourcc = b[pos:pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4:pos + 8])
        body = b[pos + 8:pos + 8 + size]
        if len(body) < size:
            break
        if fourcc == b"VP8X" and len(body) >= 10:
            flags = body[0]
            animated = bool(flags & 0x02)
            w = 1 + int.from_bytes(body[4:7], "little")
            h = 1 + int.from_bytes(body[7:10], "little")
        elif fourcc == b"VP8 " and len(body) >= 10 and w is None:
            # key frame: 3-byte frame tag, start code 9d 01 2a, dims
            if body[3:6] == b"\x9d\x01\x2a":
                w = struct.unpack("<H", body[6:8])[0] & 0x3FFF
                h = struct.unpack("<H", body[8:10])[0] & 0x3FFF
        elif fourcc == b"VP8L" and len(body) >= 5 and w is None:
            if body[0] == 0x2F:
                bits = int.from_bytes(body[1:5], "little")
                w = (bits & 0x3FFF) + 1
                h = ((bits >> 14) & 0x3FFF) + 1
        elif fourcc == b"ANMF":
            n_frames += 1
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if w is None or w <= 0 or h <= 0:
        return None
    return int(w), int(h), max(1, n_frames if animated else 1)


def _webp_encode_meta(
    w: int,
    h: int,
    flavor: str = "vp8",
    n_frames: int = 0,
) -> bytes:
    """Minimal RIFF/WEBP writer for the deterministic METADATA fixture:
    a ``VP8 ``/``VP8L`` chunk with a valid signature + dimensions and
    zeroed payload (no bitstream is synthesized — exactly the surface
    :func:`_webp_meta` parses), or a ``VP8X`` canvas with ``n_frames``
    ANMF chunks when animated."""
    chunks = []

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return (fourcc + struct.pack("<I", len(body)) + body
                + (b"\x00" if len(body) & 1 else b""))

    if flavor == "vp8":
        body = (b"\x00\x00\x00" + b"\x9d\x01\x2a"
                + struct.pack("<HH", w & 0x3FFF, h & 0x3FFF) + b"\x00" * 6)
        chunks.append(chunk(b"VP8 ", body))
    elif flavor == "vp8l":
        bits = (w - 1) | ((h - 1) << 14)
        chunks.append(chunk(
            b"VP8L", b"\x2f" + bits.to_bytes(4, "little") + b"\x00" * 5))
    elif flavor == "vp8x":
        flags = 0x02 if n_frames else 0x00
        body = (bytes((flags,)) + b"\x00\x00\x00"
                + (w - 1).to_bytes(3, "little")
                + (h - 1).to_bytes(3, "little"))
        chunks.append(chunk(b"VP8X", body))
        for k in range(n_frames):
            chunks.append(chunk(b"ANMF", b"\x00" * (16 + k)))
    else:
        raise ValueError(flavor)
    payload = b"WEBP" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def _webp_decode_frames(b: bytes, max_pixels: Optional[int] = None):
    """Decode every frame of an ANIMATED WebP whose frames are VP8L
    bitstreams to full-canvas RGBA bytes (r15): VP8X canvas, ANMF frame
    rectangles (x/y stored halved per the spec), disposal 0 (none) / 1
    (dispose to background = clear the rect to transparent), blending 0
    (alpha-blend over the canvas, spec formula) / 1 (overwrite).
    Returns (w, h, [bytes]) or None when not an animated
    VP8L-framed WebP (lossy VP8 frames keep the honest raise path)."""
    if max_pixels is None:
        max_pixels = _PNG_MAX_PIXELS  # defined below; resolved at call
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    w = h = None
    frames = []
    pos = 12
    n = len(b)
    animated = False
    while pos + 8 <= n:
        fourcc = b[pos:pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8:pos + 8 + size]
        if fourcc == b"VP8X" and len(body) >= 10:
            animated = bool(body[0] & 0x02)
            w = 1 + int.from_bytes(body[4:7], "little")
            h = 1 + int.from_bytes(body[7:10], "little")
        elif fourcc == b"ANMF" and len(body) >= 16:
            fx = 2 * int.from_bytes(body[0:3], "little")
            fy = 2 * int.from_bytes(body[3:6], "little")
            fw = 1 + int.from_bytes(body[6:9], "little")
            fh = 1 + int.from_bytes(body[9:12], "little")
            flags = body[15]
            # frame sub-chunks: a VP8L bitstream, or (r16) a lossy
            # VP8 key frame with an optional preceding ALPH plane
            sub = body[16:]
            spos = 0
            kind = payload = alph = None
            while spos + 8 <= len(sub):
                scc = sub[spos:spos + 4]
                (ssz,) = struct.unpack_from("<I", sub, spos + 4)
                if scc == b"VP8L":
                    kind = "vp8l"
                    payload = sub[spos + 8:spos + 8 + ssz]
                    break
                if scc == b"VP8 ":
                    kind = "vp8"
                    payload = sub[spos + 8:spos + 8 + ssz]
                    break
                if scc == b"ALPH":
                    alph = sub[spos + 8:spos + 8 + ssz]
                spos += 8 + ssz + (ssz & 1)
            if payload is None:
                return None
            frames.append((fx, fy, fw, fh, flags & 0x01, (flags >> 1) & 1,
                           kind, payload, alph))
        pos += 8 + size + (size & 1)
    if not animated or w is None or not frames:
        return None
    if w <= 0 or h <= 0 or w * h > max_pixels:
        return None
    canvas = bytearray(w * h * 4)  # transparent background
    out = []
    for fx, fy, fw, fh, dispose, no_blend, kind, payload, alph in frames:
        if kind == "vp8l":
            # same pre-decode cap as the VP8 branch below: reject an
            # oversized frame before reconstruction, not after
            dec = _vp8l.decode(bytes(payload), max_pixels=max_pixels)
        else:
            from . import vp8 as _vp8

            # cap BEFORE decoding: a lying ANMF frame header must not
            # make the codec reconstruct a bomb the fw/fh check would
            # only reject afterwards
            dec = _vp8.decode(bytes(payload), max_pixels=max_pixels)
            if dec is not None and alph is not None:
                alpha = _alph_decode(bytes(alph), dec[0], dec[1])
                if alpha is None:
                    return None
                buf = bytearray(dec[3])
                buf[3::4] = alpha
                dec = (dec[0], dec[1], 4, buf)
        if dec is None or dec[0] != fw or dec[1] != fh:
            return None
        px = dec[3]
        for y in range(fh):
            cy = fy + y
            if cy >= h:
                break
            for x in range(fw):
                cx = fx + x
                if cx >= w:
                    break
                s = 4 * (y * fw + x)
                d = 4 * (cy * w + cx)
                sa = px[s + 3]
                if no_blend or sa == 255 or canvas[d + 3] == 0:
                    canvas[d:d + 4] = px[s:s + 4]
                elif sa == 0:
                    pass  # fully transparent source: canvas unchanged
                else:
                    # spec alpha compositing (over), integer arithmetic
                    da = canvas[d + 3]
                    oa = sa + da * (255 - sa) // 255
                    for c in range(3):
                        sv = px[s + c]
                        dv = canvas[d + c]
                        canvas[d + c] = (
                            (sv * sa + dv * da * (255 - sa) // 255) // oa
                            if oa else 0)
                    canvas[d + 3] = oa
        out.append(bytes(canvas))
        if dispose:  # dispose to background: clear the frame rect
            # clamp like the BMP RLE delta fix: a frame rect whose x
            # offset starts past the canvas (fx >= w) must clear nothing,
            # not build a negative byte count
            m = max(0, min(fw, w - fx))
            if m:
                for y in range(fh):
                    cy = fy + y
                    if cy >= h:
                        break
                    st = 4 * (cy * w + fx)
                    canvas[st:st + 4 * m] = bytes(4 * m)
    return w, h, out


def _webp_encode_anim(w: int, h: int, frames) -> bytes:
    """Animated-WebP writer for the deterministic fixtures: VP8X canvas
    + ANIM + one ANMF per ``(fx, fy, fw, fh, dispose, no_blend, rgba)``
    frame, each carrying a VP8L bitstream from :func:`vp8l.encode` —
    exactly the surface :func:`_webp_decode_frames` parses."""
    def chunk(cc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cc + struct.pack("<I", len(body)) + body + pad

    vp8x = bytes((0x12,)) + b"\x00\x00\x00" + (
        (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"))
    anim = struct.pack("<IH", 0, 0)  # transparent bg, loop forever
    out = chunk(b"VP8X", vp8x) + chunk(b"ANIM", anim)
    for fx, fy, fw, fh, dispose, no_blend, rgba in frames:
        sub = _vp8l_chunk_of(fw, fh, rgba)
        hdr = ((fx // 2).to_bytes(3, "little")
               + (fy // 2).to_bytes(3, "little")
               + (fw - 1).to_bytes(3, "little")
               + (fh - 1).to_bytes(3, "little")
               + (40).to_bytes(3, "little")
               + bytes(((dispose & 1) | ((no_blend & 1) << 1),)))
        out += chunk(b"ANMF", hdr + sub)
    payload = b"WEBP" + out
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def _vp8l_chunk_of(w: int, h: int, rgba) -> bytes:
    """A bare VP8L sub-chunk (fourcc+size+payload) from RGBA bytes."""
    full = _vp8l.encode(w, h, rgba)
    payload = _vp8l._vp8l_payload(full)
    pad = b"\x00" if len(payload) & 1 else b""
    return b"VP8L" + struct.pack("<I", len(payload)) + payload + pad


def real_webp_anim_asset_rows(n: int = 8) -> list:
    """Driver-side rows of the ANIMATED WebP fixture (r15): VP8L-framed
    animations cycling frame counts, sub-canvas rectangles with x/y
    offsets, both disposal modes and both blending modes (a
    half-transparent overlay frame exercises the spec alpha
    compositing). Pure function of ``n``."""
    rows = []
    for i in range(n):
        w, h = 20 + 2 * (i % 3), 14 + 2 * (i % 2)
        nf = 2 + i % 3
        frames = []
        for f in range(nf):
            if f == 0:
                fw, fh, fx, fy = w, h, 0, 0
            else:
                fw, fh = 8 + f, 6 + f
                fx, fy = 2 * ((i + f) % 4), 2 * ((i * f) % 3)
            px = bytearray()
            for y in range(fh):
                for x in range(fw):
                    px += bytes((
                        (x * 31 + i * 7 + f * 11) % 256,
                        (y * 53 + f * 29) % 256,
                        (x * y + i) % 256,
                        255 if f % 2 == 0 else 128,
                    ))
            frames.append((fx, fy, fw, fh, (i + f) % 2, f % 2, bytes(px)))
        rows.append((i, "video",
                     bytearray(_webp_encode_anim(w, h, frames)),
                     '{"src":"fixture-webp-anim"}'))
    return rows


def make_real_webp_anim_assets(spark, n: int = 8) -> DataFrame:
    """Deterministic animated-WebP fixture (:func:`real_webp_anim_asset_rows`)."""
    return spark.createDataFrame(real_webp_anim_asset_rows(n), ASSET_SCHEMA)


def real_webp_asset_rows(n: int = 16) -> list:
    """Driver-side rows of the WebP metadata fixture (r14): lossy
    (VP8 key-frame header), lossless (VP8L) and extended (VP8X, still
    and animated with varying ANMF counts) flavors with id-derived
    dimensions. Pure function of ``n``."""
    rows = []
    for i in range(n):
        w, h = 16 + 7 * i, 9 + 5 * (i % 6)
        flavor = ("vp8", "vp8l", "vp8x")[i % 3]
        frames = (i % 4) if flavor == "vp8x" else 0
        rows.append((
            i, "image",
            bytearray(_webp_encode_meta(w, h, flavor, n_frames=frames)),
            '{"src":"fixture-webp"}',
        ))
    return rows


def make_real_webp_assets(spark, n: int = 16) -> DataFrame:
    """Deterministic WebP metadata fixture (:func:`real_webp_asset_rows`)."""
    return spark.createDataFrame(real_webp_asset_rows(n), ASSET_SCHEMA)


#: JPEG SOF (start-of-frame) markers carrying the image dimensions:
#: 0xC0-0xCF minus DHT (C4), JPG-extension (C8) and DAC (CC) — covers
#: baseline (C0), progressive (C2) and the arithmetic/lossless variants
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _tiff_meta(b: bytes) -> Optional[tuple[int, int, int]]:
    """Header-only (width, height, n_pages) for TIFF (r13) by walking
    the IFD chain — the same classic TIFF structure the JPEG EXIF
    parser reads inside APP1, here at file offset 0. Both byte orders;
    SHORT(3)/LONG(4) tag values; n_frames = linked IFD count (multi-page
    TIFF), bounded so a cyclic next-IFD pointer can't spin. Raster
    decode lives in :func:`_tiff_decode_pixels` (r14) for the
    uncompressed/PackBits strip subset; other compressions stay
    metadata-only — which is all the sampling planner needs."""
    if len(b) < 8:
        return None
    if b[:4] == b"II*\x00":
        endian = "<"
    elif b[:4] == b"MM\x00*":
        endian = ">"
    else:
        return None

    def u16(off):
        return struct.unpack_from(endian + "H", b, off)[0]

    def u32(off):
        return struct.unpack_from(endian + "I", b, off)[0]

    try:
        ifd_off = u32(4)
        width = height = None
        pages = 0
        seen = set()
        while ifd_off and ifd_off not in seen and pages < 10_000:
            if ifd_off + 2 > len(b):
                return None
            seen.add(ifd_off)
            n = u16(ifd_off)
            if ifd_off + 2 + n * 12 + 4 > len(b):
                return None
            if pages == 0:
                for i in range(n):
                    e = ifd_off + 2 + i * 12
                    tag, typ = u16(e), u16(e + 2)
                    if tag in (256, 257) and typ in (3, 4):
                        val = u16(e + 8) if typ == 3 else u32(e + 8)
                        if tag == 256:
                            width = val
                        else:
                            height = val
            pages += 1
            ifd_off = u32(ifd_off + 2 + n * 12)
    except struct.error:
        return None
    if width is None or height is None or width <= 0 or height <= 0:
        return None
    return int(width), int(height), max(1, pages)


def _jpeg_meta(b: bytes) -> Optional[tuple[int, int, int]]:
    """Header-only (width, height, 1) for JPEG by walking the marker
    segments to the first SOF — the dominant web-corpus image format (the
    round-8 gap). No entropy-coded data is touched, so it is bit-depth
    and codec-variant independent; a truncated or malformed stream
    returns None (caller raises), never throws."""
    pos = 2  # past SOI
    n = len(b)
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            return None  # desynced: not a marker where one must be
        marker = b[pos + 1]
        if marker == 0xFF:  # fill byte padding before a marker
            pos += 1
            continue
        if 0xD0 <= marker <= 0xD9 or marker == 0x01:
            pos += 2  # standalone markers (RST/SOI/EOI/TEM): no length
            continue
        (seg_len,) = struct.unpack(">H", b[pos + 2:pos + 4])
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF:
            if pos + 9 > n:
                return None
            # SOF payload: precision u8, height u16, width u16
            height, width = struct.unpack(">HH", b[pos + 5:pos + 9])
            # report the UPRIGHT dims (r12b): EXIF orientations 5-8
            # transpose the image, and the metadata must agree with the
            # oriented pixels the decode pipeline produces
            if _jpeg.exif_orientation(b) in (5, 6, 7, 8):
                width, height = height, width
            return int(width), int(height), 1
        pos += 2 + seg_len
    return None


def _real_decode(media_type: str, content: bytes) -> tuple[int, int, int]:
    """Real per-modality decode, capability-detected at call time."""
    if media_type == "image":
        # accelerated seam first (None when Pillow is absent or can't
        # open the payload) — meta_accel reports EXIF-upright dims, the
        # same convention as the stdlib parser, so the two environments
        # can never disagree on geometry (r13 parity fix: the old PIL
        # branch reported the STORED dims for orientations 5-8)
        meta = _accel.meta_accel(content)
        if meta is not None:
            return meta
        meta = _stdlib_image_meta(content)
        if meta is None:
            raise NotImplementedError(
                "image format not recognized by the stdlib header parser "
                "(PNG/BMP/GIF/JPEG/TIFF/WebP) or by Pillow (when installed)"
            )
        return meta
    if media_type == "audio":
        import wave

        try:
            with wave.open(io.BytesIO(content or b""), "rb") as w:
                return w.getnchannels(), w.getsampwidth() * 8, w.getnframes()
        except Exception:
            # r12b: AIFF (FORM/COMM) and AU (.snd) metadata
            # r13: IMA-ADPCM WAV (fmt 0x0011 — stdlib wave refuses it)
            meta = _wav_ima_meta(content or b"")
            if meta is None:
                # r14: IEEE-float / WAVE_FORMAT_EXTENSIBLE WAV
                m = _wav_ext_meta(content or b"")
                if m is not None:
                    _cont, _rate, nch, bits, nf = m
                    meta = (nch, bits, nf)
            if meta is None:
                meta = _aiff_meta(content or b"")
            if meta is None:
                meta = _au_meta(content or b"")
            if meta is None:
                # r13: FLAC via the stdlib codec (STREAMINFO only here)
                meta = _flac.meta(content or b"")
            if meta is None:
                # r14: MPEG audio (MP3) frame-header walk — metadata
                # only (bits-per-sample reported 0: MP3 has no integer
                # bit depth; n_frames = accounted PCM samples)
                m = _mp3_meta(content or b"")
                if m is not None:
                    _rate, nch, _frames, samples = m
                    meta = (nch, 0, samples)
            if meta is None:
                # r14: Ogg Vorbis/Opus — metadata only, like MP3
                m = _ogg_meta(content or b"")
                if m is not None:
                    _cont, _rate, nch, samples, _pre = m
                    meta = (nch, 0, samples)
            if meta is None:
                # r14: M4A/mp4-contained audio — metadata only
                m = _m4a_meta(content or b"")
                if m is not None:
                    _cont, _rate, nch, samples = m
                    meta = (nch, 0, samples)
            if meta is None:
                raise NotImplementedError(
                    "audio decode supports WAV (PCM + IMA-ADPCM), AIFF, "
                    "AU (.snd incl. mu-law), FLAC, MPEG-audio (MP3), "
                    "Ogg Vorbis/Opus/FLAC and M4A (metadata-only) "
                    "containers; other compressed audio needs a codec "
                    "absent here"
                ) from None
            return meta
    if media_type == "video":
        # Y4M (YUV4MPEG2): raw planar YUV — header + FRAME count only
        # here (no raster work); MJPEG-in-AVI (r12): RIFF header walk,
        # frame count from the movi chunk list. Inter-frame codecs raise.
        meta = _y4m_meta(content or b"")
        if meta is not None:
            return meta
        meta = _avi.meta(content or b"")
        if meta is not None:
            return meta
        # r14: MP4/MOV — metadata only (tkhd dims + stsz frame count);
        # the H.26x/AV1 sample bitstreams keep the honest raise
        meta = _mp4_meta(content or b"")
        if meta is not None:
            return meta
        raise NotImplementedError(
            "video decode supports Y4M (raw), MJPEG-AVI and MP4/MOV "
            "(metadata-only) containers; inter-frame codecs need "
            "ffmpeg, absent here"
        )
    raise NotImplementedError(f"no decoder for media_type={media_type!r}")


def decode_assets(assets: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract binary assets via ``mapInPandas`` — Arrow
    batches keep the Python crossing amortized; output partitioning follows
    the input, so a downstream join back on asset_id is co-partitioned."""

    # only the three consumed columns cross into Python (meta_json and
    # any caller-added columns stay JVM-side — r12b Arrow-traffic pass)
    assets = assets.select("asset_id", "media_type", "content")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            out = {
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                "sha256": pdf["content"].map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()
                ),
            }
            if fake:
                decoded = pdf["content"].map(_fake_decode)
            else:
                # zip over the two columns directly — DataFrame.apply(axis=1)
                # builds a Series object per row, the slowest pandas loop
                decoded = pd.Series(
                    [
                        _real_decode(m, c)
                        for m, c in zip(pdf["media_type"], pdf["content"])
                    ],
                    index=pdf.index,
                )
            out["width"] = decoded.map(lambda t: t[0])
            out["height"] = decoded.map(lambda t: t[1])
            out["n_frames"] = decoded.map(lambda t: t[2])
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, DECODED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_index", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def _fake_frame(content: bytes, idx: int) -> bytes:
    """Deterministic fake frame bytes: md5(content || ':' || idx)."""
    return hashlib.md5((content or b"") + b":" + str(idx).encode()).digest()


def sample_frames(
    assets: DataFrame,
    n_samples: Optional[int] = None,
    every_n: Optional[int] = None,
    fake: bool = False,
) -> DataFrame:
    """Frame sampling for video/animation assets: one output row per
    SELECTED frame — ``n_samples`` uniformly-spaced indices
    (``floor(i·n_frames/k)``, deduplicated, always including frame 0) or
    every ``every_n``-th frame.

    The Spark-side plumbing is real and the split is deliberate:

    - frame-index SELECTION is pure Catalyst over the decoded
      ``n_frames`` (a ``sequence``/``transform`` explode — no Python),
      so the oracle can hash-check it;
    - frame EXTRACTION crosses to Python once, Arrow-batched, only for
      the selected (asset, index) rows — at 100 TB that is
      samples-per-asset rows, never frames-per-asset. Fake mode emits
      deterministic digest bytes; real mode returns the still image
      itself for single-frame assets, extracts real frames from animated
      GIF/APNG, Y4M raw video and MJPEG-AVI (r12), and raises
      ``NotImplementedError`` for inter-frame-coded video (no ffmpeg in
      this container — same honesty contract as the video decoder).

    Cost: one ``decode_assets`` pass + one asset_id-keyed join + the
    explode. Output: FRAME_SCHEMA (asset_id, media_type, n_frames,
    frame_index, frame)."""
    if (n_samples is None) == (every_n is None):
        raise ValueError("pass exactly one of n_samples / every_n")
    dec = decode_assets(assets, fake=fake).select("asset_id", "n_frames")
    # n_frames=0 happens on real decodes (a header-only WAV reports zero
    # audio frames): such an asset has nothing to sample — without the
    # guard the every_n path builds sequence(0,-1,step>0) (runtime error,
    # kills the JOB) and the n_samples path divides by k=0 (a NULL
    # frame_index row flows into extraction)
    base = assets.join(dec, "asset_id").filter(F.col("n_frames") > 0)
    if every_n is not None:
        if every_n <= 0:
            raise ValueError("every_n must be positive")
        idx = F.sequence(
            F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    else:
        if n_samples <= 0:
            raise ValueError("n_samples must be positive")
        k = F.least(F.lit(n_samples), F.col("n_frames"))
        idx = F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), k - 1),
                lambda i: F.floor(
                    i * F.col("n_frames") / k).cast("int"),
            )
        )
    rows = base.select(
        "asset_id",
        "media_type",
        "content",
        "n_frames",
        F.explode(idx).alias("frame_index"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            if fake:
                frames = [
                    _fake_frame(c, i)
                    for c, i in zip(pdf["content"], pdf["frame_index"])
                ]
            else:
                frames = []
                # an asset's frames are decoded ONCE per batch however
                # many of its indices were selected (the GIF compositing
                # chain is sequential, so per-row decoding would redo
                # frames 0..k for every sampled k)
                gif_cache: dict = {}
                for a, m, c, nf, i in zip(
                    pdf["asset_id"], pdf["media_type"], pdf["content"],
                    pdf["n_frames"], pdf["frame_index"],
                ):
                    cb = bytes(c or b"")
                    if m == "image" and nf == 1 and i == 0:
                        frames.append(cb)
                    elif m == "image" and (
                        cb[:6] in (b"GIF87a", b"GIF89a")
                        or cb.startswith(_PNG_SIG)
                    ):
                        # animated GIF (stdlib LZW + compositing) or APNG
                        # (acTL/fcTL/fdAT over the stdlib PNG codec) —
                        # each selected frame emitted as an RGBA PNG of
                        # the full logical screen, decoded once per asset
                        # per batch
                        if a not in gif_cache:
                            gif_cache[a] = (
                                _apng_decode_frames(cb)
                                if cb.startswith(_PNG_SIG)
                                else _gif_decode_frames(cb)
                            )
                        dec = gif_cache[a]
                        if dec is None or i >= len(dec[2]):
                            raise NotImplementedError(
                                "animation outside the stdlib decoders' "
                                f"subset (asset_id={a}, frame {i} of {nf})"
                            )
                        gw, gh, all_frames = dec
                        frames.append(
                            _png_encode(gw, gh, 4, bytearray(all_frames[i]))
                        )
                    elif m == "video" and (
                        cb.startswith(_Y4M_MAGIC)
                        or (cb[:4] == b"RIFF" and cb[8:12] == b"AVI ")
                    ):
                        # raw Y4M video (YUV planes -> RGB) or MJPEG-AVI
                        # (per-frame baseline JPEG -> RGB, r12); one PNG
                        # per selected frame, decoded once per asset per
                        # batch
                        if a not in gif_cache:
                            gif_cache[a] = (
                                _y4m_decode_frames(cb)
                                if cb.startswith(_Y4M_MAGIC)
                                else _avi.decode_frames(cb)
                            )
                        dec = gif_cache[a]
                        if dec is None or i >= len(dec[2]):
                            raise NotImplementedError(
                                "video outside the stdlib decoders' subset "
                                f"(asset_id={a}, frame {i} of {nf})"
                            )
                        gw, gh, all_frames = dec
                        frames.append(
                            _png_encode(gw, gh, 3, bytearray(all_frames[i]))
                        )
                    else:
                        raise NotImplementedError(
                            "frame extraction from inter-frame-coded video "
                            "needs a codec (ffmpeg) not present here"
                        )
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "n_frames": pdf["n_frames"],
                "frame_index": pdf["frame_index"],
                "frame": frames,
            })

    return rows.mapInPandas(batches, FRAME_SCHEMA)


#: decompression-bomb guard for the stdlib PNG codec (the Pillow path this
#: substitutes for has its own bomb protection): max decoded pixels
_PNG_MAX_PIXELS = 64_000_000


def _png_unfilter(raw: bytes, pos: int, h: int, stride: int, bpp: int):
    """Unfilter ``h`` scanlines of ``stride`` bytes starting at ``pos``
    (PNG spec filters 0-4; ``bpp`` is the filter's byte distance,
    max(1, bits_per_pixel // 8)). None/Sub/Up rows vectorize (copy /
    per-channel cumsum mod 256 / row add); Average and Paeth carry a
    left-neighbor dependency through a floor-div / argmin nonlinearity,
    so those rows stay on the sequential byte loop (r12b — mixed-filter
    640x480 went 1.4 -> ~4 MPix/s with typical encoder filter mixes).
    Returns (bytes, new_pos) or (None, pos) on a bad filter byte."""
    import numpy as np

    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        ft = raw[pos]
        pos += 1
        if ft in (0, 1, 2):
            if ft == 0:
                line = bytearray(raw[pos : pos + stride])
            elif ft == 1:  # Sub: per-channel prefix sum mod 256
                line_np = np.frombuffer(
                    raw[pos : pos + stride], dtype=np.uint8
                ).astype(np.int64)
                line_np = (
                    np.cumsum(line_np.reshape(-1, bpp), axis=0) & 0xFF
                ).reshape(-1)
                line = bytearray(line_np.astype(np.uint8).tobytes())
            else:  # Up
                line_np = (
                    np.frombuffer(raw[pos : pos + stride], dtype=np.uint8)
                    .astype(np.int16)
                    + np.frombuffer(bytes(prev), dtype=np.uint8)
                ) & 0xFF
                line = bytearray(line_np.astype(np.uint8).tobytes())
            pos += stride
            out[y * stride : (y + 1) * stride] = line
            prev = line
            continue
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if ft == 3:  # Average
            pv = prev
            for i in range(bpp):
                line[i] = (line[i] + (pv[i] >> 1)) & 0xFF
            for i in range(bpp, stride):
                line[i] = (line[i] + ((line[i - bpp] + pv[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            # pa = |up-c| is left-independent: precompute it (and up/c)
            # per row; the loop carries only the a-dependent terms
            pv = prev
            for i in range(bpp):  # c = a = 0: predictor is up
                line[i] = (line[i] + pv[i]) & 0xFF
            for i in range(bpp, stride):
                a = line[i - bpp]
                up = pv[i]
                c = pv[i - bpp]
                d1 = up - c
                d2 = a - c
                pa = d1 if d1 >= 0 else -d1
                pb = d2 if d2 >= 0 else -d2
                s = d1 + d2
                pc = s if s >= 0 else -s
                line[i] = (
                    line[i]
                    + (a if pa <= pb and pa <= pc else (up if pb <= pc else c))
                ) & 0xFF
        else:
            return None, pos
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return bytes(out), pos


def _png_rows_to_samples(sub: bytes, pw: int, ph: int, depth: int,
                         nsamp: int, palette_indices: bool):
    """Unfiltered scanline bytes -> (ph, pw, nsamp) uint8 sample grid.
    depth 16 presents the high byte (the spec's 16->8 presentation);
    sub-byte depths (1/2/4, gray or palette) unpack MSB-first and gray
    values scale to full range; palette indices stay raw."""
    import numpy as np

    stride = (pw * depth * nsamp + 7) // 8
    a = np.frombuffer(sub, dtype=np.uint8).reshape(ph, stride)
    if depth == 8:
        return a[:, : pw * nsamp].reshape(ph, pw, nsamp)
    if depth == 16:
        return a[:, : pw * nsamp * 2 : 2].reshape(ph, pw, nsamp)
    bits = np.unpackbits(a, axis=1)[:, : pw * depth].reshape(ph, pw, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    vals = (bits.astype(np.uint16) * weights).sum(axis=2)
    if not palette_indices:
        vals = vals * (255 // ((1 << depth) - 1))
    return vals.astype(np.uint8)[:, :, None]


#: Adam7 pass grid: (x0, y0, dx, dy) per pass
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_decode_pixels(
    b: bytes,
) -> Optional[tuple[int, int, int, bytearray]]:
    """Decode a PNG to raw pixels with the stdlib only (zlib inflate +
    scanline unfilter per the PNG spec's five filter types). r14: ALL
    spec color types and depths — gray (0), RGB (2), palette (3, PLTE
    + tRNS alpha), gray+alpha (4), RGBA (6); bit depths 1/2/4/8/16 (16
    presents the high byte); Adam7 interlace. Gray expands to RGB and
    gray+alpha to RGBA so perceptual kernels always see 3/4 channels.
    Returns (w, h, channels, pixels) or None when malformed. Bomb-safe:
    dimensions are capped BEFORE any allocation and the inflate is
    bounded to the expected raster size, so a tiny adversarial IDAT
    cannot exhaust executor memory."""
    import numpy as np

    if not b.startswith(_PNG_SIG):
        return None
    ihdr = plte = trns = None
    idat = bytearray()
    for ctype, payload in _png_chunks(b):
        if ctype == b"IHDR":
            ihdr = payload
        elif ctype == b"PLTE":
            plte = payload
        elif ctype == b"tRNS":
            trns = payload
        elif ctype == b"IDAT":
            idat.extend(payload)
        elif ctype == b"IEND":
            break
    if ihdr is None or len(ihdr) < 13:
        return None
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13])
    valid_depths = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                    4: (8, 16), 6: (8, 16)}
    if (
        color not in valid_depths or depth not in valid_depths[color]
        or comp != 0 or filt != 0 or interlace not in (0, 1)
        or not (w and h)
    ):
        return None
    if w * h > _PNG_MAX_PIXELS:
        return None
    if color == 3 and (plte is None or len(plte) < 3):
        return None
    nsamp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    bits_pp = depth * nsamp
    bpp = max(1, bits_pp // 8)
    passes = ((0, 0, 1, 1),) if interlace == 0 else _ADAM7
    dims = []
    expected = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        dims.append((pw, ph))
        if pw > 0 and ph > 0:
            expected += ph * ((pw * bits_pp + 7) // 8 + 1)
    try:
        # bounded inflate: never produce more than the raster needs
        raw = zlib.decompressobj().decompress(bytes(idat), expected)
    except zlib.error:
        return None
    if len(raw) < expected:
        return None
    samples = np.zeros((h, w, nsamp), dtype=np.uint8)
    pos = 0
    for (x0, y0, dx, dy), (pw, ph) in zip(passes, dims):
        if pw <= 0 or ph <= 0:
            continue
        stride = (pw * bits_pp + 7) // 8
        sub, pos = _png_unfilter(raw, pos, ph, stride, bpp)
        if sub is None:
            return None
        samples[y0::dy, x0::dx, :] = _png_rows_to_samples(
            sub, pw, ph, depth, nsamp, color == 3)
    if color == 2:
        return int(w), int(h), 3, bytearray(samples.tobytes())
    if color == 6:
        return int(w), int(h), 4, bytearray(samples.tobytes())
    if color == 0:
        return int(w), int(h), 3, bytearray(
            np.repeat(samples, 3, axis=2).tobytes())
    if color == 4:
        out = np.empty((h, w, 4), dtype=np.uint8)
        out[:, :, 0:3] = samples[:, :, 0:1]
        out[:, :, 3] = samples[:, :, 1]
        return int(w), int(h), 4, bytearray(out.tobytes())
    # color 3: palette lookup; tRNS adds per-index alpha (RGBA)
    n_entries = len(plte) // 3
    idx = samples[:, :, 0]
    if int(idx.max()) >= n_entries:
        return None
    pal = np.frombuffer(plte[: n_entries * 3], dtype=np.uint8).reshape(
        n_entries, 3)
    rgb = pal[idx]
    if trns is None:
        return int(w), int(h), 3, bytearray(rgb.tobytes())
    alpha_tab = np.full(n_entries, 255, dtype=np.uint8)
    t = np.frombuffer(trns[:n_entries], dtype=np.uint8)
    alpha_tab[: len(t)] = t
    out = np.concatenate([rgb, alpha_tab[idx][:, :, None]], axis=2)
    return int(w), int(h), 4, bytearray(out.tobytes())


def _png_encode(w: int, h: int, ch: int, pixels: bytearray) -> bytes:
    """Minimal PNG writer: filter-0 scanlines, one IDAT, CRC32 chunks."""
    color = 2 if ch == 3 else 6
    stride = w * ch
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw.extend(pixels[y * stride : (y + 1) * stride])

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------- GIF
# Stdlib GIF87a/89a codec (r12): LZW + compositing, enough to extract real
# frames from animated GIFs in sample_frames — the last honest-raise in the
# multimodal surface that was implementable without external codecs. The
# encoder exists for the deterministic fixture (real_gif_asset_rows) and is
# round-trip property-tested against the decoder.


def _gif_skip_subblocks(b: bytes, pos: int) -> int:
    """Skip a sub-block chain; returns the position after the terminator,
    or len(b) on truncation (callers treat end-of-input as end-of-walk)."""
    n = len(b)
    while pos < n:
        size = b[pos]
        pos += 1
        if size == 0:
            return pos
        pos += size
    return n


def _gif_read_subblocks(b: bytes, pos: int):
    """Concatenate a sub-block chain. Returns (data, new_pos) or
    (None, pos) on truncation."""
    out = bytearray()
    n = len(b)
    while True:
        if pos >= n:
            return None, pos
        size = b[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        if pos + size > n:
            return None, pos
        out += b[pos:pos + size]
        pos += size


def _gif_walk_start(b: bytes):
    """Parse header + logical screen descriptor + GCT. Returns
    (w, h, gct_or_None, pos) or None."""
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        return None
    w, h = struct.unpack("<HH", b[6:10])
    packed = b[10]
    pos = 13
    gct = None
    if packed & 0x80:
        ncol = 2 << (packed & 0x07)
        if pos + 3 * ncol > len(b):
            return None
        gct = b[pos:pos + 3 * ncol]
        pos += 3 * ncol
    return int(w), int(h), gct, pos


def _gif_count_frames(b: bytes) -> int:
    start = _gif_walk_start(b)
    if start is None:
        return 1
    _w, _h, _gct, pos = start
    count = 0
    n = len(b)
    while pos < n:
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos = _gif_skip_subblocks(b, pos + 1)
        elif block == 0x2C:  # image descriptor
            if pos + 9 > n:
                break
            ip = b[pos + 8]
            pos += 9
            if ip & 0x80:
                pos += 3 * (2 << (ip & 0x07))
            if pos >= n:
                break
            pos = _gif_skip_subblocks(b, pos + 1)  # +1: LZW min code size
            count += 1
        else:
            break  # desynced
    return count


def _lzw_decode(min_code_size: int, data: bytes, max_out: int):
    """GIF-flavor LZW (little-endian bit packing, CLEAR/END codes, 12-bit
    cap). Returns the index stream or None on a malformed stream."""
    if not 2 <= min_code_size <= 11:
        return None
    clear = 1 << min_code_size
    end_code = clear + 1

    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    code_size = min_code_size + 1
    out = bytearray()
    prev = None
    acc = bits = pos = 0
    n = len(data)
    while True:
        while bits < code_size:
            if pos >= n:
                # missing explicit END: tolerated (common in the wild)
                return out
            acc |= data[pos] << bits
            pos += 1
            bits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        bits -= code_size
        if code == clear:
            table = fresh()
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end_code:
            return out
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            return None
        out += entry
        if len(out) > max_out:
            return None
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


def _gif_interlace_rows(fh: int):
    """Display-row order of an interlaced frame's sequential source rows."""
    out = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        out.extend(range(start, fh, step))
    return out


def _gif_decode_frames(b: bytes, max_pixels: int = _PNG_MAX_PIXELS):
    """Decode EVERY frame of a GIF to full-canvas RGBA bytes, honoring
    local/global palettes, interlacing, transparency and disposal methods
    0/1 (keep), 2 (restore region to transparent), 3 (restore previous).
    Returns (w, h, [bytes]) or None when not a decodable GIF."""
    start = _gif_walk_start(b)
    if start is None:
        return None
    w, h, gct, pos = start
    if w <= 0 or h <= 0 or w * h > max_pixels:
        return None
    canvas = bytearray(w * h * 4)  # starts fully transparent
    frames: list = []
    transparent = None
    disposal = 0
    n = len(b)
    while pos < n:
        block = b[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            if pos >= n:
                return None
            label = b[pos]
            subs, pos = _gif_read_subblocks(b, pos + 1)
            if subs is None:
                return None
            if label == 0xF9 and len(subs) >= 4:
                packed = subs[0]
                disposal = (packed >> 2) & 0x07
                transparent = subs[3] if packed & 0x01 else None
            continue
        if block != 0x2C or pos + 9 > n:
            return None
        fx, fy, fw, fh = struct.unpack("<HHHH", b[pos:pos + 8])
        ip = b[pos + 8]
        pos += 9
        palette = gct
        if ip & 0x80:
            ncol = 2 << (ip & 0x07)
            if pos + 3 * ncol > n:
                return None
            palette = b[pos:pos + 3 * ncol]
            pos += 3 * ncol
        if palette is None or fw <= 0 or fh <= 0 or fw * fh > max_pixels:
            return None
        if pos >= n:
            return None
        mcs = b[pos]
        data, pos = _gif_read_subblocks(b, pos + 1)
        if data is None:
            return None
        idx = _lzw_decode(mcs, data, fw * fh)
        if idx is None or len(idx) < fw * fh:
            return None
        row_order = (
            _gif_interlace_rows(fh) if ip & 0x40 else range(fh)
        )
        saved = bytes(canvas) if disposal == 3 else None
        npal = len(palette) // 3
        # clamp like the ANMF dispose fix above: a descriptor whose x
        # offset starts past the canvas (fx >= w) paints/clears nothing
        # rather than producing a negative width
        vis_w = max(0, min(fw, w - fx))
        for src_y, dy in enumerate(row_order):
            y = fy + dy
            if y >= h:
                continue
            base = src_y * fw
            crow = (y * w + fx) * 4
            for x in range(vis_w):
                ci = idx[base + x]
                if ci == transparent or ci >= npal:
                    continue
                o = crow + x * 4
                p = ci * 3
                canvas[o] = palette[p]
                canvas[o + 1] = palette[p + 1]
                canvas[o + 2] = palette[p + 2]
                canvas[o + 3] = 255
        frames.append(bytes(canvas))
        if disposal == 2 and vis_w:
            span = vis_w * 4
            for dy in range(max(0, min(fh, h - fy))):
                o = ((fy + dy) * w + fx) * 4
                canvas[o:o + span] = bytes(span)
        elif disposal == 3 and saved is not None:
            canvas = bytearray(saved)
        disposal = 0
        transparent = None  # a GCE governs exactly one image
    if not frames:
        return None
    return w, h, frames


def _lzw_encode(min_code_size: int, pixels) -> bytes:
    """GIF-flavor LZW encoder (fixture/encoder side; round-trip
    property-tested against :func:`_lzw_decode`). Code width growth
    mirrors the DECODER's table — the decoder adds one entry per emitted
    code except the first after CLEAR, so the encoder simulates that
    count to widen codes exactly when the decoder will."""
    clear = 1 << min_code_size
    end_code = clear + 1
    out = bytearray()
    acc = bits = 0

    state = {
        "dict": {bytes([i]): i for i in range(clear)},
        "next": end_code + 1,
        "size": min_code_size + 1,
        "dec_len": clear + 2,
        "emitted": 0,
    }

    def emit(code: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += state["size"]
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
        # decoder grows ITS table after every emitted code except the
        # first after a clear; mirror that to keep widths in lockstep
        if state["emitted"] >= 1 and state["dec_len"] < 4096:
            state["dec_len"] += 1
            if state["dec_len"] == (1 << state["size"]) and state["size"] < 12:
                state["size"] += 1
        state["emitted"] += 1

    def reset() -> None:
        emit(clear)
        state["dict"] = {bytes([i]): i for i in range(clear)}
        state["next"] = end_code + 1
        state["size"] = min_code_size + 1
        state["dec_len"] = clear + 2
        state["emitted"] = 0

    reset()
    w = b""
    for p in pixels:
        c = bytes([p])
        wc = w + c
        if wc in state["dict"]:
            w = wc
            continue
        emit(state["dict"][w])
        if state["next"] < 4096:
            state["dict"][wc] = state["next"]
            state["next"] += 1
            w = c
        else:
            w = c
            reset()
    if w:
        emit(state["dict"][w])
    emit(end_code)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_encode(w: int, h: int, frame_specs, palette: bytes) -> bytes:
    """Minimal GIF89a writer for the deterministic fixture: global palette
    (len must be a power of two >= 4, flat RGB bytes), one GCE + image
    descriptor per frame. ``frame_specs`` entries are dicts with keys
    x, y, fw, fh, pixels (palette indices, fw*fh of them), and optional
    disposal (default 0), transparent (index or None), interlaced."""
    ncol = len(palette) // 3
    if ncol < 4 or ncol & (ncol - 1):
        raise ValueError("palette size must be a power of two >= 4")
    depth = ncol.bit_length() - 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1), 0, 0])
    out += palette
    min_code_size = max(2, depth)
    for spec in frame_specs:
        transparent = spec.get("transparent")
        disposal = spec.get("disposal", 0)
        packed = (disposal & 7) << 2 | (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, packed, 0, 0,
                      transparent if transparent is not None else 0, 0])
        ip = 0x40 if spec.get("interlaced") else 0
        out += bytes([0x2C]) + struct.pack(
            "<HHHH", spec["x"], spec["y"], spec["fw"], spec["fh"]
        ) + bytes([ip])
        pixels = spec["pixels"]
        if len(pixels) != spec["fw"] * spec["fh"]:
            raise ValueError("pixels must be fw*fh palette indices")
        if spec.get("interlaced"):
            # encoder stores rows in interlace pass order
            order = _gif_interlace_rows(spec["fh"])
            seq = bytearray()
            for dy in order:
                seq += bytes(pixels[dy * spec["fw"]:(dy + 1) * spec["fw"]])
            pixels = bytes(seq)
        data = _lzw_encode(min_code_size, bytes(pixels))
        out.append(min_code_size)
        for off in range(0, len(data), 255):
            chunk = data[off:off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


# -------------------------------------------------------------------- APNG
# Stdlib APNG frame extraction (r12): acTL/fcTL/fdAT per the APNG spec,
# frame rasters decoded by synthesizing a minimal single-frame PNG and
# reusing the existing stdlib PNG decoder — so the supported subset is
# exactly the PNG codec's (8-bit RGB/RGBA, non-interlaced). With GIF and
# APNG both real, sample_frames' honest raise narrows to video.


def _apng_decode_frames(b: bytes, max_pixels: int = _PNG_MAX_PIXELS):
    """Decode every animation frame of an APNG to full-canvas RGBA bytes,
    honoring fcTL x/y offsets, dispose_op 0/1/2 and blend_op 0 (source) /
    1 (over). Returns (w, h, [bytes]) or None when not a decodable APNG
    (no acTL, unsupported IHDR subset, malformed chunk stream)."""
    if not (b or b"").startswith(_PNG_SIG):
        return None
    w = h = None
    depth = color = interlace = None
    has_actl = False
    # frames under construction: list of [fctl_fields, bytearray(zlib)]
    frames_raw: list = []
    idat = bytearray()
    idat_is_frame0 = False
    try:
        for ctype, payload in _png_chunks(b):
            if ctype == b"IHDR" and len(payload) >= 13:
                w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", payload[:13]
                )
            elif ctype == b"acTL":
                has_actl = True
            elif ctype == b"fcTL" and len(payload) >= 26:
                (_seq, fw, fh, fx, fy, _dn, _dd, dispose, blend) = (
                    struct.unpack(">IIIIIHHBB", payload[:26])
                )
                frames_raw.append(
                    [(fw, fh, fx, fy, dispose, blend), bytearray()]
                )
                if not idat and not idat_is_frame0:
                    idat_is_frame0 = True  # fcTL precedes IDAT: frame 0
            elif ctype == b"IDAT":
                idat += payload
            elif ctype == b"fdAT" and len(payload) > 4:
                if not frames_raw:
                    return None
                frames_raw[-1][1] += payload[4:]  # strip sequence_number
            elif ctype == b"IEND":
                break
    except (ValueError, struct.error):
        return None
    if not has_actl or not frames_raw or w is None:
        return None
    if depth != 8 or color not in (2, 6) or interlace != 0:
        return None
    if w <= 0 or h <= 0 or w * h > max_pixels:
        return None
    if idat_is_frame0:
        frames_raw[0][1] = bytearray(idat)
    elif not frames_raw[0][1]:
        return None  # default image not in the animation, first fdAT absent
    ch = 3 if color == 2 else 4
    canvas = bytearray(w * h * 4)
    out: list = []
    for (fw, fh, fx, fy, dispose, blend), data in frames_raw:
        if fw <= 0 or fh <= 0 or fw * fh > max_pixels or not data:
            return None
        # synthesize a one-frame PNG over the region's raster and reuse
        # the bomb-guarded stdlib decoder
        ihdr = struct.pack(">IIBBBBB", fw, fh, 8, color, 0, 0, 0)

        def _chunk(ctype: bytes, payload: bytes) -> bytes:
            return (
                struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(
                    ">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
            )

        mini = (
            _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", bytes(data))
            + _chunk(b"IEND", b"")
        )
        dec = _png_decode_pixels(mini)
        if dec is None:
            return None
        _, _, dch, px = dec
        saved = bytes(canvas) if dispose == 2 else None
        for dy in range(min(fh, max(0, h - fy))):
            srow = dy * fw * dch
            crow = ((fy + dy) * w + fx) * 4
            for x in range(min(fw, max(0, w - fx))):
                sp = srow + x * dch
                o = crow + x * 4
                sr, sg, sb = px[sp], px[sp + 1], px[sp + 2]
                sa = px[sp + 3] if dch == 4 else 255
                if blend == 1 and sa < 255:
                    # Porter-Duff OVER with straight alpha (APNG spec
                    # formula), integer math rounded to nearest
                    da = canvas[o + 3]
                    oa = sa * 255 + da * (255 - sa)  # scaled by 255
                    if oa == 0:
                        canvas[o:o + 4] = b"\0\0\0\0"
                        continue
                    for k, sc in ((0, sr), (1, sg), (2, sb)):
                        dc = canvas[o + k]
                        num = sc * sa * 255 + dc * da * (255 - sa)
                        canvas[o + k] = (num + oa // 2) // oa
                    canvas[o + 3] = (oa + 127) // 255
                else:
                    canvas[o] = sr
                    canvas[o + 1] = sg
                    canvas[o + 2] = sb
                    canvas[o + 3] = sa
        out.append(bytes(canvas))
        if dispose == 1:
            for dy in range(min(fh, max(0, h - fy))):
                o = ((fy + dy) * w + fx) * 4
                span = min(fw, max(0, w - fx)) * 4
                canvas[o:o + span] = bytes(span)
        elif dispose == 2 and saved is not None:
            canvas = bytearray(saved)
    return int(w), int(h), out


def _apng_encode(w: int, h: int, frame_specs, ch: int = 4) -> bytes:
    """Minimal APNG writer for the deterministic fixture: 8-bit RGB
    (ch=3) or RGBA (ch=4), first frame full-canvas (the default image
    participates in the animation: fcTL precedes IDAT). ``frame_specs``
    entries: dicts with x, y, fw, fh, pixels (raw rows, fw*fh*ch bytes),
    and optional dispose (0/1/2), blend (0/1)."""
    if ch not in (3, 4):
        raise ValueError("ch must be 3 (RGB) or 4 (RGBA)")
    color = 2 if ch == 3 else 6
    first = frame_specs[0]
    if (first["x"], first["y"], first["fw"], first["fh"]) != (0, 0, w, h):
        raise ValueError("first frame must cover the canvas")

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    def raster(fw: int, fh: int, pixels: bytes) -> bytes:
        raw = bytearray()
        stride = fw * ch
        for y in range(fh):
            raw.append(0)
            raw.extend(pixels[y * stride:(y + 1) * stride])
        return zlib.compress(bytes(raw))

    out = bytearray(_PNG_SIG)
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
    out += chunk(b"acTL", struct.pack(">II", len(frame_specs), 0))
    seq = 0
    for i, spec in enumerate(frame_specs):
        fctl = struct.pack(
            ">IIIIIHHBB", seq, spec["fw"], spec["fh"], spec["x"], spec["y"],
            1, 10, spec.get("dispose", 0), spec.get("blend", 0),
        )
        out += chunk(b"fcTL", fctl)
        seq += 1
        data = raster(spec["fw"], spec["fh"], bytes(spec["pixels"]))
        if i == 0:
            out += chunk(b"IDAT", data)
        else:
            out += chunk(b"fdAT", struct.pack(">I", seq) + data)
            seq += 1
    out += chunk(b"IEND", b"")
    return bytes(out)


# --------------------------------------------------------------------- Y4M
# Stdlib Y4M (YUV4MPEG2) video support (r12): raw planar YUV frames behind
# a one-line text header — the one VIDEO container decodable without
# ffmpeg, so sample_frames gains a real video path (compressed containers
# keep the honest raise). BT.601 limited-range YUV→RGB in integer math.

_Y4M_MAGIC = b"YUV4MPEG2"
#: chroma tag → (x subsample shift, y subsample shift); mono has no chroma
_Y4M_CHROMA = {
    b"420": (1, 1), b"420jpeg": (1, 1), b"420mpeg2": (1, 1),
    b"420paldv": (1, 1), b"422": (1, 0), b"444": (0, 0),
}


def _y4m_header(b: bytes):
    """(w, h, cshift or None-for-mono, header_end) or None."""
    if not b.startswith(_Y4M_MAGIC):
        return None
    nl = b.find(b"\n", 0, 2048)
    if nl == -1:
        return None
    w = h = None
    cshift: object = (1, 1)  # C420 variants are the Y4M default
    for param in b[len(_Y4M_MAGIC):nl].split(b" "):
        if not param:
            continue
        tag, val = param[:1], param[1:]
        try:
            if tag == b"W":
                w = int(val)
            elif tag == b"H":
                h = int(val)
            elif tag == b"C":
                if val == b"mono":
                    cshift = None
                elif val in _Y4M_CHROMA:
                    cshift = _Y4M_CHROMA[val]
                else:
                    return None  # e.g. C420p10: outside the 8-bit subset
        except ValueError:
            return None
    if not w or not h or w <= 0 or h <= 0:
        return None
    return w, h, cshift, nl + 1


def _y4m_frame_size(w: int, h: int, cshift) -> int:
    if cshift is None:
        return w * h
    sx, sy = cshift
    cw, chh = (w + (1 << sx) - 1) >> sx, (h + (1 << sy) - 1) >> sy
    return w * h + 2 * cw * chh


def _y4m_meta(b: bytes) -> Optional[tuple[int, int, int]]:
    """(width, height, n_frames) by walking FRAME markers — plane sizes
    are arithmetic, so the walk reads no raster bytes."""
    head = _y4m_header(b)
    if head is None:
        return None
    w, h, cshift, pos = head
    fsize = _y4m_frame_size(w, h, cshift)
    n = 0
    total = len(b)
    while pos < total:
        if not b.startswith(b"FRAME", pos):
            break
        nl = b.find(b"\n", pos, pos + 1024)
        if nl == -1 or nl + 1 + fsize > total:
            break
        pos = nl + 1 + fsize
        n += 1
    return (w, h, n) if n else None


def _y4m_decode_frames(b: bytes, max_pixels: int = _PNG_MAX_PIXELS):
    """Decode every Y4M frame to packed RGB bytes (BT.601 limited-range
    integer conversion, nearest-neighbor chroma upsampling). Returns
    (w, h, [bytes]) or None."""
    head = _y4m_header(b)
    if head is None:
        return None
    w, h, cshift, pos = head
    if w * h > max_pixels:
        return None
    fsize = _y4m_frame_size(w, h, cshift)
    frames: list = []
    total = len(b)
    while pos < total:
        if not b.startswith(b"FRAME", pos):
            break
        nl = b.find(b"\n", pos, pos + 1024)
        if nl == -1 or nl + 1 + fsize > total:
            break
        pos = nl + 1
        yplane = b[pos:pos + w * h]
        if cshift is None:
            uplane = vplane = None
            cw = 0
        else:
            sx, sy = cshift
            cw, chh = (w + (1 << sx) - 1) >> sx, (h + (1 << sy) - 1) >> sy
            off = pos + w * h
            uplane = b[off:off + cw * chh]
            vplane = b[off + cw * chh:off + 2 * cw * chh]
        pos += fsize
        rgb = bytearray(w * h * 3)
        for yy in range(h):
            yrow = yy * w
            orow = yrow * 3
            if cshift is not None:
                crow = (yy >> cshift[1]) * cw
            for xx in range(w):
                c = yplane[yrow + xx] - 16
                if cshift is None:
                    d = e = 0
                else:
                    ci = crow + (xx >> cshift[0])
                    d = uplane[ci] - 128
                    e = vplane[ci] - 128
                o = orow + xx * 3
                r = (298 * c + 409 * e + 128) >> 8
                g = (298 * c - 100 * d - 208 * e + 128) >> 8
                bl = (298 * c + 516 * d + 128) >> 8
                rgb[o] = 0 if r < 0 else (255 if r > 255 else r)
                rgb[o + 1] = 0 if g < 0 else (255 if g > 255 else g)
                rgb[o + 2] = 0 if bl < 0 else (255 if bl > 255 else bl)
        frames.append(bytes(rgb))
    if not frames:
        return None
    return w, h, frames


def _y4m_encode(w: int, h: int, yuv_frames, chroma: bytes = b"420") -> bytes:
    """Minimal Y4M writer for the deterministic fixture. ``yuv_frames``
    entries are (y_plane, u_plane, v_plane) byte triples (u/v None for
    Cmono); plane sizes must match the chroma subsampling."""
    out = bytearray(
        _Y4M_MAGIC + b" W%d H%d F25:1 Ip A1:1 C%s\n" % (w, h, chroma)
    )
    for y, u, v in yuv_frames:
        out += b"FRAME\n"
        out += y
        if chroma != b"mono":
            out += u
            out += v
    return bytes(out)


def _bmp_decode_pixels(b: bytes):
    """(w, h, ch, pixels top-down RGB/RGBA) for uncompressed BMP —
    BITMAPINFOHEADER(+) with 24/32-bit BI_RGB or 8-bit paletted data
    (the formats real uncompressed BMPs use). BMP rows are bottom-up
    unless height is negative, padded to 4 bytes, and BGR(A)-ordered —
    all normalized here so the perceptual kernels see the same layout
    every decoder produces. None outside the subset (r13: BMP had
    header-only metadata, so dhash/resize raised on decodable files)."""
    import numpy as np

    if len(b) < 54 or b[:2] != b"BM":
        return None
    (data_off,) = struct.unpack("<I", b[10:14])
    (dib,) = struct.unpack("<I", b[14:18])
    if dib < 40:  # BITMAPCOREHEADER etc. — rare, out of subset
        return None
    w, h_raw = struct.unpack("<ii", b[18:26])
    planes, bpp = struct.unpack("<HH", b[26:30])
    (compression,) = struct.unpack("<I", b[30:34])
    if w <= 0 or h_raw == 0 or planes != 1:
        return None
    top_down = h_raw < 0
    h = abs(h_raw)
    if w * h > _PNG_MAX_PIXELS:
        return None
    # BI_RGB (0) + BI_RLE8/BI_RLE4 (r14); BI_BITFIELDS(3) with the
    # canonical masks would decode identically for 32-bit but needs
    # mask validation — punt
    if compression in (1, 2):
        if (compression, bpp) not in ((1, 8), (2, 4)) or top_down:
            return None  # RLE is defined bottom-up only
        idx = _bmp_rle_decode(
            b[data_off:], w, h, four_bit=(compression == 2))
        if idx is None:
            return None
        (used,) = struct.unpack("<I", b[46:50])
        n_col = used or (256 if bpp == 8 else 16)
        pal_off = 14 + dib
        if pal_off + n_col * 4 > len(b):
            return None
        pal = np.frombuffer(b, dtype=np.uint8, count=n_col * 4,
                            offset=pal_off).reshape(n_col, 4)
        if int(idx.max(initial=0)) >= n_col:
            return None
        px = pal[idx[::-1]][:, :, [2, 1, 0]]  # bottom-up -> top-down, RGB
        return w, h, 3, bytearray(px.tobytes())
    if compression != 0 or bpp not in (8, 24, 32):
        return None
    stride = (w * bpp // 8 + 3) & ~3
    if data_off + stride * h > len(b):
        return None
    raw = np.frombuffer(b, dtype=np.uint8,
                        count=stride * h, offset=data_off)
    rows = raw.reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        # palette: dib-sized header then BGRA quads (used count or 256)
        (used,) = struct.unpack("<I", b[46:50])
        n_col = used or 256
        pal_off = 14 + dib
        pal = np.frombuffer(b, dtype=np.uint8, count=n_col * 4,
                            offset=pal_off).reshape(n_col, 4)
        idx = rows[:, :w]
        if int(idx.max(initial=0)) >= n_col:
            return None
        px = pal[idx][:, :, [2, 1, 0]]  # BGRA quads -> RGB
        return w, h, 3, bytearray(px.tobytes())
    ch = bpp // 8
    px = rows[:, : w * ch].reshape(h, w, ch)
    if ch == 3:
        px = px[:, :, [2, 1, 0]]  # BGR -> RGB
        return w, h, 3, bytearray(px.tobytes())
    px = px[:, :, [2, 1, 0, 3]]  # BGRA -> RGBA
    return w, h, 4, bytearray(px.tobytes())


def _bmp_rle_decode(data: bytes, w: int, h: int, four_bit: bool):
    """BI_RLE8 / BI_RLE4 (r14, the classic BMP compressions): encoded
    runs (count, index-or-nibble-pair), absolute runs (word-aligned),
    EOL (00 00), EOB (00 01) and delta (00 02 dx dy) cursor jumps.
    Returns an (h, w) uint8 index grid in FILE row order (row 0 =
    bottom) with unwritten pixels 0, or None when malformed."""
    import numpy as np

    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0  # y counts from the BOTTOM row, per the format
    i, n = 0, len(data)
    while i + 1 < n:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run
            if y >= h:
                return None
            # a prior run or delta may already have pushed x past w:
            # clamp to a non-negative write width so malformed streams
            # degrade to None/partial rows, never a numpy shape error
            m = max(0, min(cnt, w - x))
            if m > 0:
                if four_bit:
                    pair = np.empty(m, dtype=np.uint8)
                    pair[0::2] = val >> 4
                    pair[1::2] = val & 0x0F
                    out[y, x:x + m] = pair
                else:
                    out[y, x:x + m] = val
            x += cnt
            continue
        if val == 0:  # EOL
            x, y = 0, y + 1
            continue
        if val == 1:  # EOB
            return out
        if val == 2:  # delta
            if i + 2 > n:
                return None
            x += data[i]
            y += data[i + 1]
            i += 2
            continue
        # absolute mode: val literal indices, padded to a 16-bit boundary
        cnt = val
        nbytes = ((cnt + 1) // 2) if four_bit else cnt
        nbytes += nbytes & 1
        if i + nbytes > n or y >= h:
            return None
        m = max(0, min(cnt, w - x))  # same past-w clamp as encoded runs
        if m > 0:
            if four_bit:
                nib = np.empty(cnt, dtype=np.uint8)
                src = np.frombuffer(data, np.uint8, count=(cnt + 1) // 2,
                                    offset=i)
                nib[0::2] = src[: (cnt + 1) // 2] >> 4
                nib[1::2] = src[: cnt // 2] & 0x0F
                out[y, x:x + m] = nib[:m]
            else:
                out[y, x:x + m] = np.frombuffer(data, np.uint8, count=cnt,
                                                offset=i)[:m]
        x += cnt
        i += nbytes
    return out  # missing explicit EOB: tolerated


def _bmp_rle_encode(idx, four_bit: bool = False,
                    absolute_every: int = 0) -> bytes:
    """RLE8/RLE4 encoder for the deterministic fixtures — pairs with
    :func:`_bmp_rle_decode`. Encodes each row as maximal runs, an
    optional absolute-mode literal block every ``absolute_every``-th
    row (word-padded), EOL per row, EOB at the end."""
    import numpy as np

    idx = np.asarray(idx, dtype=np.uint8)
    h, w = idx.shape
    out = bytearray()
    for y in range(h):  # file order: caller passes bottom-up rows
        row = idx[y]
        if absolute_every and y % absolute_every == 1 and 3 <= w <= 255:
            # absolute block covering the whole row
            out += bytes((0, w))
            if four_bit:
                pairs = bytearray()
                for j in range(0, w, 2):
                    hi = int(row[j]) << 4
                    lo = int(row[j + 1]) if j + 1 < w else 0
                    pairs.append(hi | lo)
                if len(pairs) & 1:
                    pairs.append(0)
                out += pairs
            else:
                out += row.tobytes()
                if w & 1:
                    out.append(0)
        else:
            j = 0
            while j < w:
                k = j
                if four_bit:
                    # run of a repeating nibble PAIR
                    a = int(row[j])
                    bnib = int(row[j + 1]) if j + 1 < w else 0
                    while (k < w and int(row[k]) == (a if (k - j) % 2 == 0
                                                     else bnib)
                           and k - j < 255):
                        k += 1
                    out += bytes((k - j, (a << 4) | bnib))
                else:
                    while k < w and row[k] == row[j] and k - j < 255:
                        k += 1
                    out += bytes((k - j, int(row[j])))
                j = k
        out += bytes((0, 0))  # EOL
    out += bytes((0, 1))  # EOB
    return bytes(out)


def _bmp_encode_rle(w, h, palette, idx_topdown, four_bit=False,
                    absolute_every=0) -> bytes:
    """Minimal RLE-compressed BMP writer (palette + BI_RLE4/8 data) for
    fixtures; ``idx_topdown`` is an (h, w) index grid in display order
    (the writer flips to the format's bottom-up row order)."""
    import numpy as np

    idx = np.asarray(idx_topdown, dtype=np.uint8)[::-1]  # bottom-up
    data = _bmp_rle_encode(idx, four_bit=four_bit,
                           absolute_every=absolute_every)
    n_col = len(palette) // 3
    quads = bytearray()
    for i in range(n_col):
        r, g, bb = palette[3 * i:3 * i + 3]
        quads += bytes((bb, g, r, 0))  # BGRA quads
    off = 14 + 40 + len(quads)
    hdr = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1,
                         4 if four_bit else 8, 2 if four_bit else 1,
                         len(data), 0, 0, n_col, 0))
    return hdr + bytes(quads) + data


def _packbits_decode(raw: bytes, expected: int) -> Optional[bytes]:
    """Apple PackBits (TIFF compression 32773, TIFF 6.0 §9): n in
    0..127 copies n+1 literal bytes, n in 129..255 repeats the next
    byte 257-n times, n == 128 is a no-op. Strips decompress
    independently; a strip that doesn't yield exactly ``expected``
    bytes is corrupt and returns None (caller raises, never throws)."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n and len(out) < expected:
        nb = raw[i]
        i += 1
        if nb == 128:
            continue
        if nb < 128:
            cnt = nb + 1
            if i + cnt > n:
                return None
            out += raw[i:i + cnt]
            i += cnt
        else:
            cnt = 257 - nb
            if i >= n:
                return None
            out += raw[i:i + 1] * cnt
            i += 1
    return bytes(out) if len(out) == expected else None


def _packbits_encode(raw: bytes) -> bytes:
    """PackBits encoder for the deterministic fixtures — pairs with
    :func:`_packbits_decode`. Runs of >=2 identical bytes become
    repeat packets (max 128), everything else literal packets."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        j = i
        while j + 1 < n and raw[j + 1] == raw[i] and j - i < 127:
            j += 1
        if j > i:  # run of j-i+1 identical bytes
            out += bytes((257 - (j - i + 1), raw[i]))
            i = j + 1
            continue
        # literal: until the next >=2 run or 128 bytes
        j = i
        while (
            j + 1 < n and j - i < 127
            and not (j + 2 < n and raw[j + 1] == raw[j + 2])
        ):
            j += 1
        out += bytes((j - i,)) + raw[i:j + 1]
        i = j + 1
    return bytes(out)


def _tiff_lzw_decode(raw: bytes, expected: int) -> Optional[bytes]:
    """TIFF-flavor LZW (TIFF 6.0 §13, compression 5): MSB-first bit
    packing (GIF packs LSB-first), fixed 8-bit roots with ClearCode 256
    / EOI 257, and the spec's EARLY CHANGE — the code width bumps when
    the table reaches 2^width - 1 entries, one entry before GIF would.
    Returns exactly ``expected`` bytes or None on a malformed stream."""
    CLEAR, EOI = 256, 257

    def fresh():
        return [bytes([i]) for i in range(256)] + [b"", b""]

    table = fresh()
    width = 9
    out = bytearray()
    prev = None
    acc = bits = pos = 0
    n = len(raw)
    while len(out) < expected:
        while bits < width:
            if pos >= n:
                return None
            acc = (acc << 8) | raw[pos]
            pos += 1
            bits += 8
        code = (acc >> (bits - width)) & ((1 << width) - 1)
        bits -= width
        if code == CLEAR:
            table = fresh()
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            return None
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1  # early change
    return bytes(out) if len(out) == expected else None


def _tiff_lzw_encode(raw: bytes) -> bytes:
    """TIFF-flavor LZW encoder (fixture side — pairs with
    :func:`_tiff_lzw_decode`): MSB-first packing, leading ClearCode,
    trailing EOI, early width change mirroring the decoder."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, bits
        acc = (acc << width) | code
        bits += width
        while bits >= 8:
            out.append((acc >> (bits - 8)) & 0xFF)
            bits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    prev = b""
    for byte in raw:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        # the DECODER adds its mirror entry one step behind, so the
        # width bump (at 2^w - 1) is checked against next_code - 1
        if next_code - 1 == (1 << width) - 1 and width < 12:
            width += 1
        if next_code > 4094:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prev = bytes([byte])
    if prev:
        emit(table[prev], width)
    emit(EOI, width)
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def _tiff_decode_pixels(b: bytes):
    """(w, h, ch, pixels top-down) for the stdlib-decodable TIFF subset
    (r14): classic TIFF, first IFD, strip-organized chunky data, 8 bits
    per sample, compression 1 (none), 5 (LZW), 8/32946 (Deflate — both
    the TIFF 6.0 TechNote code and the legacy one) or 32773 (PackBits),
    the tag-317 horizontal predictor for LZW/Deflate, photometric 0/1
    (grayscale, WhiteIsZero inverted) or 2 (RGB, 3 or 4 samples).
    Both byte orders; strip-organized or TILED (tags 322-325, edge
    tiles clipped — r14). Grayscale expands to RGB so the perceptual
    kernels see the same layout every decoder produces. None outside
    the subset (JPEG-in-TIFF stays an honest raise — TIFF 6.0
    §§2,9,13-15)."""
    import numpy as np

    if len(b) < 8:
        return None
    if b[:4] == b"II*\x00":
        endian = "<"
    elif b[:4] == b"MM\x00*":
        endian = ">"
    else:
        return None

    def u16(off):
        return struct.unpack_from(endian + "H", b, off)[0]

    def u32(off):
        return struct.unpack_from(endian + "I", b, off)[0]

    try:
        ifd = u32(4)
        if ifd + 2 > len(b):
            return None
        n = u16(ifd)
        if ifd + 2 + n * 12 + 4 > len(b):
            return None
        tags: dict = {}
        for i in range(n):
            e = ifd + 2 + i * 12
            tag, typ = u16(e), u16(e + 2)
            count = u32(e + 4)
            size = {1: 1, 3: 2, 4: 4}.get(typ)
            if size is None or count == 0 or count > 1_000_000:
                continue  # RATIONAL etc. — not needed for the subset
            total = size * count
            off = e + 8 if total <= 4 else u32(e + 8)
            if off + total > len(b):
                return None
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            tags[tag] = list(struct.unpack_from(endian + fmt * count, b, off))
    except struct.error:
        return None
    w = tags.get(256, [0])[0]
    h = tags.get(257, [0])[0]
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [None])[0]
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [1] * spp)
    planar = tags.get(284, [1])[0]
    predictor = tags.get(317, [1])[0]
    tiled = 322 in tags or 323 in tags
    offsets = tags.get(324) if tiled else tags.get(273)
    counts = tags.get(325) if tiled else tags.get(279)
    if (
        w <= 0 or h <= 0 or w * h > _PNG_MAX_PIXELS
        or comp not in (1, 5, 8, 32946, 32773) or planar != 1
        or photo not in (0, 1, 2) or not offsets or not counts
        or len(offsets) != len(counts)
        or len(bps) != spp or any(x != 8 for x in bps)
        or (photo == 2 and spp not in (3, 4))
        or (photo in (0, 1) and spp != 1)
        or predictor not in (1, 2)
        or (predictor == 2 and comp not in (5, 8, 32946))
    ):
        return None

    def chunk_pixels(off, cnt, rows, row_bytes):
        # one strip/tile -> (rows, row_bytes) uint8, or None
        if off + cnt > len(b):
            return None
        expected = rows * row_bytes
        raw = bytes(b[off:off + cnt])
        if comp == 32773:
            raw = _packbits_decode(raw, expected)
            if raw is None:
                return None
        elif comp == 5:
            raw = _tiff_lzw_decode(raw, expected)
            if raw is None:
                return None
        elif comp in (8, 32946):
            # bomb-safe like the PNG path: bound the inflate to
            # expected+1 so a crafted ~1000:1 strip can never
            # materialize more than one byte past the strip size
            try:
                raw = zlib.decompressobj().decompress(raw, expected + 1)
            except zlib.error:
                return None
            if len(raw) != expected:
                return None
        elif len(raw) < expected:
            return None
        arr = np.frombuffer(raw[:expected], dtype=np.uint8).reshape(
            rows, row_bytes)
        if predictor == 2:
            # horizontal differencing (TIFF 6.0 §14), per strip/tile
            # row: each sample stores the delta to its left neighbor —
            # undo with a running sum along the row, mod 256. Rows are
            # tile-local, so this happens BEFORE placement.
            a3 = arr.reshape(rows, row_bytes // spp, spp)
            arr = (np.cumsum(a3, axis=1, dtype=np.int64) & 0xFF).astype(
                np.uint8).reshape(rows, row_bytes)
        return arr

    if tiled:
        # TIFF 6.0 §15: row-major grid of tw x th tiles, edge tiles
        # padded to full size; clip on placement
        tw = tags.get(322, [0])[0]
        th = tags.get(323, [0])[0]
        if tw <= 0 or th <= 0 or tw * th > _PNG_MAX_PIXELS:
            return None
        tiles_x = (w + tw - 1) // tw
        tiles_y = (h + th - 1) // th
        if len(offsets) != tiles_x * tiles_y:
            return None
        px = np.zeros((h, w, spp), dtype=np.uint8)
        for t, (off, cnt) in enumerate(zip(offsets, counts)):
            arr = chunk_pixels(off, cnt, th, tw * spp)
            if arr is None:
                return None
            ty, tx = divmod(t, tiles_x)
            y0, x0 = ty * th, tx * tw
            ch_h, ch_w = min(th, h - y0), min(tw, w - x0)
            px[y0:y0 + ch_h, x0:x0 + ch_w, :] = arr.reshape(
                th, tw, spp)[:ch_h, :ch_w, :]
    else:
        rows_per_strip = tags.get(278, [h])[0] or h
        parts = []
        remaining = h
        for off, cnt in zip(offsets, counts):
            if remaining <= 0:
                return None
            rows_here = min(rows_per_strip, remaining)
            arr = chunk_pixels(off, cnt, rows_here, w * spp)
            if arr is None:
                return None
            parts.append(arr)
            remaining -= rows_here
        if remaining != 0:
            return None
        px = np.concatenate(parts, axis=0).reshape(h, w, spp)
    if photo == 0:
        px = 255 - px  # WhiteIsZero -> BlackIsZero
    if spp == 1:
        px = np.repeat(px, 3, axis=2)
        return w, h, 3, bytearray(px.tobytes())
    return w, h, spp, bytearray(px.tobytes())


def _tiff_encode_pixels(
    w: int,
    h: int,
    ch: int,
    pixels,
    endian: str = "II",
    compression: int = 1,
    rows_per_strip: Optional[int] = None,
    photometric: Optional[int] = None,
    predictor: int = 1,
    tile: Optional[tuple] = None,
) -> bytes:
    """Minimal classic-TIFF writer for the deterministic pixel fixtures
    — pairs with :func:`_tiff_decode_pixels`. ``ch`` 1 (grayscale) or
    3/4 (RGB/RGBA); ``compression`` 1, 5 (LZW), 8 (Deflate — 5 and 8
    pair with ``predictor=2`` for horizontal differencing) or 32773
    (PackBits); multiple strips when ``rows_per_strip < h``; a TILED
    layout (tags 322-325, edge tiles zero-padded) when ``tile=(tw,
    th)`` — the strip-vs-tile axis the decoder reassembles (r14)."""
    import numpy as np

    e = "<" if endian == "II" else ">"
    raw = bytes(pixels)
    assert len(raw) == w * h * ch
    assert predictor == 1 or compression in (5, 8, 32946)

    def pack(chunk: bytes) -> bytes:
        if compression == 32773:
            return _packbits_encode(chunk)
        if compression == 5:
            return _tiff_lzw_encode(chunk)
        if compression in (8, 32946):
            return zlib.compress(chunk, 6)
        return chunk

    px0 = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, ch)

    def diff2(a):
        if predictor != 2:
            return a
        d = a.astype(np.int16)
        d[:, 1:, :] -= a[:, :-1, :].astype(np.int16)
        return (d & 0xFF).astype(np.uint8)

    photo = photometric if photometric is not None else (1 if ch == 1 else 2)
    strips = []
    if tile is not None:
        tw, th = tile
        for y0 in range(0, h, th):
            for x0 in range(0, w, tw):
                t = np.zeros((th, tw, ch), dtype=np.uint8)
                sub = px0[y0:y0 + th, x0:x0 + tw, :]
                t[: sub.shape[0], : sub.shape[1], :] = sub
                strips.append(pack(diff2(t).tobytes()))
    else:
        raw = diff2(px0).tobytes()
        rps = rows_per_strip or h
        for y0 in range(0, h, rps):
            rows_here = min(rps, h - y0)
            strips.append(pack(raw[y0 * w * ch:(y0 + rows_here) * w * ch]))
    # layout: header(8) | strip data | extra value area | IFD
    pos = 8
    strip_offs = []
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)
    extra = bytearray()

    def val(typ, vals):
        # returns the 4-byte inline value field, appending to the extra
        # area (placed at `extra_base`) when the payload exceeds 4 bytes
        size = {3: 2, 4: 4}[typ]
        fmt = {3: "H", 4: "I"}[typ]
        payload = struct.pack(e + fmt * len(vals), *vals)
        if len(payload) <= 4:
            return payload + b"\x00" * (4 - len(payload)), len(vals), typ
        off = len(extra)
        extra.extend(payload)
        return ("EXTRA", off), len(vals), typ

    entries = [
        (256, *val(4, [w])),
        (257, *val(4, [h])),
        (258, *val(3, [8] * ch)),
        (259, *val(3, [compression])),
        (262, *val(3, [photo])),
        (277, *val(3, [ch])),
    ]
    if tile is not None:
        entries += [
            (322, *val(4, [tile[0]])),
            (323, *val(4, [tile[1]])),
            (324, *val(4, strip_offs)),
            (325, *val(4, [len(s) for s in strips])),
        ]
    else:
        entries += [
            (273, *val(4, strip_offs)),
            (278, *val(4, [rows_per_strip or h])),
            (279, *val(4, [len(s) for s in strips])),
        ]
    entries.sort()
    if predictor != 1:
        entries.append((317, *val(3, [predictor])))
        entries.sort()
    extra_base = pos
    ifd_off = extra_base + len(extra)
    out = bytearray()
    out += (b"II*\x00" if endian == "II" else b"MM\x00*")
    out += struct.pack(e + "I", ifd_off)
    for s in strips:
        out += s
    out += extra
    out += struct.pack(e + "H", len(entries))
    for tag, v, count, typ in entries:
        out += struct.pack(e + "HHI", tag, typ, count)
        if isinstance(v, tuple):
            out += struct.pack(e + "I", extra_base + v[1])
        else:
            out += v
    out += struct.pack(e + "I", 0)  # no next IFD
    return bytes(out)


def _bmp_encode(w: int, h: int, ch: int, pixels) -> bytes:
    """Minimal bottom-up BI_RGB BMP writer (24-bit from RGB input) for
    deterministic fixtures — pairs with :func:`_bmp_decode_pixels`."""
    import numpy as np

    px = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(h, w, ch)
    rgb = px[:, :, :3][:, :, [2, 1, 0]]  # -> BGR
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    pad = b"\x00" * (stride - w * 3)
    for y in range(h - 1, -1, -1):
        body += rgb[y].tobytes() + pad
    off = 14 + 40
    header = (
        b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    )
    return bytes(header) + bytes(body)


def _decode_any_pixels(b: bytes):
    """(w, h, channels, pixels) for any stdlib-decodable raster: PNG via
    the raster codec; baseline JPEG via the r12 Huffman+IDCT decoder;
    uncompressed BMP (r13); uncompressed/PackBits strip TIFF (r14);
    animated GIF/APNG, Y4M video and MJPEG-AVI
    via their FIRST frame (r12 — the representative frame perceptual
    pipelines use). Returns None outside the supported subset."""
    b = b or b""
    dec = _png_decode_pixels(b)
    if dec is not None:
        return dec
    if b[:2] == b"BM":
        dec = _bmp_decode_pixels(b)
        if dec is not None:
            return dec
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        dec = _tiff_decode_pixels(b)
        if dec is not None:
            return dec
    if b[:2] == b"\xff\xd8":
        j = _jpeg.decode(b)
        if j is not None:
            w, h, ch, px = j
            # normalize EXIF camera rotation (r12b): perceptual hashes
            # and resizes must see the upright image, or rotated-by-
            # metadata duplicates never pair
            o = _jpeg.exif_orientation(b)
            if o != 1:
                return _jpeg.apply_orientation(w, h, ch, px, o)
            return w, h, ch, bytearray(px)
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        v = _avi.decode_frames(b)
        if v is not None:
            w, h, frames = v
            return w, h, 3, bytearray(frames[0])
    if b[:6] in (b"GIF87a", b"GIF89a"):
        g = _gif_decode_frames(b)
        if g is not None:
            w, h, frames = g
            return w, h, 4, bytearray(frames[0])
    if b.startswith(_PNG_SIG):
        a = _apng_decode_frames(b)
        if a is not None:
            w, h, frames = a
            return w, h, 4, bytearray(frames[0])
    if b.startswith(_Y4M_MAGIC):
        y = _y4m_decode_frames(b)
        if y is not None:
            w, h, frames = y
            return w, h, 3, bytearray(frames[0])
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        # r15: lossless WebP pixels through the pure-Python VP8L codec
        # (differential-pinned against libwebp in tests/test_vp8l.py);
        # animated VP8L-framed files yield their FIRST composed frame;
        # r16: lossy `VP8 ` key frames through the pure-Python VP8
        # decoder (vp8.py — YUV planes pinned byte-exact against
        # libwebp in tests/test_vp8_lossy.py), closing the last raise
        # on the web's majority WebP flavor
        dec = _vp8l.decode(b)
        if dec is not None:
            return dec
        anim = _webp_decode_frames(b)
        if anim is not None:
            w, h, frames = anim
            return w, h, 4, bytearray(frames[0])
        lossy = _webp_lossy_pixels(b)
        if lossy is not None:
            return lossy
    return None


def _webp_lossy_pixels(b: bytes):
    """RGBA of a still lossy WebP: decode the `VP8 ` key frame
    (seqspark.pipeline.vp8) and, when a VP8X/ALPH alpha plane rides
    along, decode and unfilter it into channel 3 (container spec:
    method 0 = raw, 1 = headerless VP8L stream with alpha in green;
    filters none/horizontal/vertical/gradient — libwebp
    dec/alpha_dec.c is the behavioral reference, pinned against the
    system library in tests/test_vp8_lossy.py). None when absent or
    malformed."""
    pos = 12
    n = len(b)
    vp8_body = alph_body = None
    while pos + 8 <= n:
        fourcc = b[pos:pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        if fourcc == b"VP8 ":
            vp8_body = b[pos + 8:pos + 8 + size]
            break  # ALPH precedes the bitstream chunk in the container
        if fourcc == b"ALPH":
            alph_body = b[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    if vp8_body is None:
        return None
    from . import vp8 as _vp8

    # same decompression-bomb cap as every other raster codec here
    dec = _vp8.decode(vp8_body, max_pixels=_PNG_MAX_PIXELS)
    if dec is None:
        return None
    w, h, ch, px = dec
    out = bytearray(px)
    if alph_body is not None:
        alpha = _alph_decode(alph_body, w, h)
        if alpha is None:
            return None
        out[3::4] = alpha
    return w, h, ch, out


def _alph_decode(body: bytes, w: int, h: int) -> Optional[bytes]:
    """WebP ALPH chunk → w*h alpha bytes, or None when malformed."""
    if len(body) < 1 or w <= 0 or h <= 0:
        return None
    method = body[0] & 0x03
    filt = (body[0] >> 2) & 0x03
    # pre-processing (level reduction) only matters under alpha
    # dithering, which is a display option this pipeline never enables
    data = body[1:]
    if method == 0:
        if len(data) < w * h:
            return None
        raw = bytearray(data[:w * h])
    elif method == 1:
        # headerless VP8L stream, dimensions from the canvas, alpha in
        # the GREEN channel
        try:
            argb, _ = _vp8l._decode_image(_vp8l._Br(bytes(data)), w, h, True)
        except (_vp8l._Malformed, IndexError, ValueError, MemoryError):
            return None
        if len(argb) != w * h:
            return None
        raw = bytearray((p >> 8) & 0xFF for p in argb)
    else:
        return None
    if filt == 0:
        return bytes(raw)
    out = bytearray(w * h)
    for y in range(h):
        row = y * w
        prev = row - w
        if y == 0 or filt == 1:  # horizontal (row 0 of all filters)
            pred = out[prev] if y > 0 else 0
            for x in range(w):
                pred = (pred + raw[row + x]) & 0xFF
                out[row + x] = pred
        elif filt == 2:  # vertical
            for x in range(w):
                out[row + x] = (out[prev + x] + raw[row + x]) & 0xFF
        else:  # gradient
            left = tl = out[prev]
            for x in range(w):
                top = out[prev + x]
                g = left + top - tl
                g = 0 if g < 0 else (255 if g > 255 else g)
                left = (raw[row + x] + g) & 0xFF
                out[row + x] = left
                tl = top
    return bytes(out)


def _resize_kernel(
    b: bytes, width: int, height: int, method: str, codec: str
) -> bytes:
    """Per-row resize dispatch (module-level so the codec seam is
    unit-testable without executors): ``codec="auto"`` tries the
    accelerated Pillow path (``codec_accel.resize_png_accel`` — honors
    ``method`` via the matching Pillow resample filter, ADVICE r12) and
    falls back to the stdlib kernel whenever Pillow is absent or the
    payload doesn't decode there; ``codec="stdlib"`` forces the stdlib
    kernel (the mode the hash-pinned contract digests use)."""
    if codec == "auto":
        accel = _accel.resize_png_accel(b, width, height, method=method)
        if accel is not None:
            return accel
    resized = _stdlib_png_resize(b, width, height, method=method)
    if resized is None:
        raise NotImplementedError(
            "stdlib resize supports PNG (all color types/depths/"
            "interlace), JPEG, uncompressed BMP, "
            "none/LZW/Deflate/PackBits TIFF, WebP (lossless VP8L and "
            "lossy VP8 key frames), or the "
            "first frame of GIF/APNG/Y4M/MJPEG, only"
        )
    return resized


def _stdlib_png_resize(
    b: bytes, width: int, height: int, method: str = "nearest"
) -> Optional[bytes]:
    """Resize a supported raster (PNG, JPEG, uncompressed BMP,
    uncompressed/PackBits TIFF, or the
    first frame of GIF/APNG/Y4M/MJPEG) to an RGB(A) PNG. ``method="nearest"`` is the
    historical kernel the frozen contract digests pin; ``"bilinear"``
    (r12b) is the perceptual-pipeline default quality — vectorized
    numpy, pixel-center convention, round-half-up."""
    dec = _decode_any_pixels(b or b"")
    if dec is None:
        return None
    sw, sh, ch, px = dec
    if method == "bilinear":
        import numpy as np

        src = np.frombuffer(bytes(px), dtype=np.uint8).reshape(
            sh, sw, ch
        ).astype(np.float64)
        xs = np.clip((np.arange(width) + 0.5) * sw / width - 0.5, 0, sw - 1)
        ys = np.clip((np.arange(height) + 0.5) * sh / height - 0.5, 0, sh - 1)
        x0 = np.floor(xs).astype(np.int64)
        y0 = np.floor(ys).astype(np.int64)
        x1 = np.minimum(x0 + 1, sw - 1)
        y1 = np.minimum(y0 + 1, sh - 1)
        fx = (xs - x0)[None, :, None]
        fy = (ys - y0)[:, None, None]
        top = src[y0][:, x0] * (1 - fx) + src[y0][:, x1] * fx
        bot = src[y1][:, x0] * (1 - fx) + src[y1][:, x1] * fx
        out_np = np.clip(
            np.floor(top * (1 - fy) + bot * fy + 0.5), 0, 255
        ).astype(np.uint8)
        return _png_encode(width, height, ch, bytearray(out_np.tobytes()))
    if method != "nearest":
        return None
    import numpy as np

    # vectorized gather (r13) with the SAME floor index map the old
    # per-pixel loop used — byte-identical output, so the frozen
    # multimodal_resize contract digests are untouched (verified by the
    # hash-pinned entry staying green); ~30x on 640x480 fixtures
    src = np.frombuffer(bytes(px), dtype=np.uint8).reshape(sh, sw, ch)
    ys = (np.arange(height) * sh) // height
    xs = (np.arange(width) * sw) // width
    out_np = src[ys][:, xs]
    return _png_encode(width, height, ch, bytearray(out_np.tobytes()))


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(
    assets: DataFrame,
    width: int,
    height: int,
    fake: bool = False,
    on_other: str = "drop",
    codec: str = "auto",
    method: str = "nearest",
) -> DataFrame:
    """Resize image assets to (width, height) via ``mapInPandas``.

    ``fake=True`` (opt-in, tests/CI) emits a deterministic payload derived from
    the source bytes + target size, so schema/partitioning/batch shape are
    testable without Pillow; the default (``fake=False``) decodes and re-encodes PNG
    through Pillow when installed, else through the stdlib PNG codec
    (r14: all spec color types/depths/interlace; other formats raise).

    Non-image rows follow ``on_other``: ``"drop"`` removes them (the
    historical behavior), ``"keep"`` passes them through with the original
    bytes and NULL width/height (``media_type`` in the output says which),
    ``"error"`` raises — so a caller feeding mixed assets gets an explicit
    contract instead of a silently smaller frame.

    ``codec="auto"`` (default) prefers Pillow when importable and falls
    back to the stdlib PNG kernel; ``codec="stdlib"`` FORCES the stdlib
    kernel — the mode the hash-pinned ``multimodal_resize`` contract
    entry uses, because its frozen expected digests are stdlib-codec
    bytes and must not drift if the environment gains Pillow (whose
    resampler and encoder produce different, equally-valid bytes)."""
    if on_other not in ("drop", "keep", "error"):
        raise ValueError(f"on_other must be drop|keep|error, got {on_other!r}")
    if codec not in ("auto", "stdlib"):
        raise ValueError(f"codec must be auto|stdlib, got {codec!r}")
    if method not in ("nearest", "bilinear"):
        raise ValueError(f"method must be nearest|bilinear, got {method!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if on_other == "error":
                other = pdf[pdf["media_type"] != "image"]
                if len(other):
                    raise ValueError(
                        "resize_images(on_other='error'): non-image rows "
                        f"present, e.g. asset_id={other['asset_id'].iloc[0]} "
                        f"media_type={other['media_type'].iloc[0]!r}"
                    )
            passthrough = (
                pdf[pdf["media_type"] != "image"] if on_other == "keep" else None
            )
            pdf = pdf[pdf["media_type"] == "image"]

            if fake:
                def kernel(b: bytes) -> bytes:
                    seed = hashlib.sha256(
                        (b or b"") + f"{width}x{height}".encode()
                    ).digest()
                    return seed * (max(1, (width * height) // len(seed)))
            else:
                def kernel(b: bytes) -> bytes:
                    return _resize_kernel(b, width, height, method, codec)

            if len(pdf):
                yield pd.DataFrame(
                    {
                        "asset_id": pdf["asset_id"],
                        "media_type": pdf["media_type"],
                        "content": pdf["content"].map(kernel),
                        "width": width,
                        "height": height,
                    }
                )
            if passthrough is not None and len(passthrough):
                yield pd.DataFrame(
                    {
                        "asset_id": passthrough["asset_id"],
                        "media_type": passthrough["media_type"],
                        "content": passthrough["content"],
                        "width": pd.array([None] * len(passthrough), dtype="Int32"),
                        "height": pd.array([None] * len(passthrough), dtype="Int32"),
                    }
                )

    return assets.mapInPandas(batches, RESIZED_SCHEMA)


def make_fake_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic asset fixture (binary payloads derived from the id)."""
    rows = []
    for i in range(n):
        content = hashlib.sha256(str(i).encode()).digest() * (1 + i % 4)
        media = ("image", "audio", "video")[i % 3]
        rows.append((i, media, bytearray(content), '{"src":"fixture"}'))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def real_asset_rows(n: int = 64) -> list:
    """Driver-side rows of the REAL-codec asset fixture: deterministic
    8-bit RGB PNGs (stdlib encoder, id-derived size and pixel pattern)
    with every 4th asset a PCM WAV (stdlib ``wave`` writer). A pure
    function of ``n`` — ``tools/gen_multimodal_expected.py`` computes the
    frozen contract-oracle digests from these same rows without a
    SparkSession. No video rows: real mode has no video decoder (honest
    ``NotImplementedError``), so the real fixture carries exactly the
    modalities the stdlib codecs can decode."""
    import wave

    rows = []
    for i in range(n):
        if i % 4 == 3:
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                nch = 1 + i % 2
                w.setnchannels(nch)
                w.setsampwidth(2)
                w.setframerate(8000)
                nf = 40 + (i % 5) * 8
                w.writeframes(
                    bytes((i * 131 + k * 17) % 256 for k in range(nf * nch * 2))
                )
            content = buf.getvalue()
            media = "audio"
        else:
            iw, ih = 8 + i % 5, 6 + i % 4
            px = bytearray()
            for y in range(ih):
                for x in range(iw):
                    px += bytes(
                        (
                            (x * 37 + i * 11) % 256,
                            (y * 59 + i * 7) % 256,
                            (x * y * 13 + i) % 256,
                        )
                    )
            content = _png_encode(iw, ih, 3, px)
            media = "image"
        rows.append((i, media, bytearray(content), '{"src":"fixture-real"}'))
    return rows


def real_gif_asset_rows(n: int = 16) -> list:
    """Driver-side rows of the ANIMATED-GIF fixture (r12): deterministic
    multi-frame GIF89a payloads exercising the full stdlib decoder —
    partial-rect frames with offsets, all four disposal methods,
    transparency, and an interlaced frame. A pure function of ``n`` so
    ``tools/gen_multimodal_expected.py`` can freeze the contract-oracle
    digests from the same rows without a SparkSession."""
    rows = []
    for i in range(n):
        w, h = 8 + i % 4, 6 + i % 3
        palette = bytes(
            ((c * 53 + i * 29 + ch * 17) % 256)
            for c in range(8) for ch in range(3)
        )
        n_frames = 2 + i % 4
        specs = []
        for k in range(n_frames):
            if k == 0:
                fx, fy, fw, fh = 0, 0, w, h  # base frame covers the canvas
            else:
                fw = 2 + (i + k) % (w - 1)
                fh = 2 + (i + 2 * k) % (h - 1)
                fx = (i * 3 + k) % (w - fw + 1)
                fy = (i + k * 5) % (h - fh + 1)
            pixels = bytes(
                ((x * 7 + y * 3 + i + k * 11) % 8)
                for y in range(fh) for x in range(fw)
            )
            specs.append({
                "x": fx, "y": fy, "fw": fw, "fh": fh, "pixels": pixels,
                "disposal": k % 4,
                "transparent": (k + i) % 8 if k % 2 else None,
                "interlaced": (k == 1 and i % 3 == 0),
            })
        content = _gif_encode(w, h, specs, palette)
        rows.append((i, "image", bytearray(content), '{"src":"fixture-gif"}'))
    return rows


def make_real_gif_assets(spark, n: int = 16) -> DataFrame:
    """Animated-GIF fixture frame (:func:`real_gif_asset_rows`)."""
    return spark.createDataFrame(real_gif_asset_rows(n), ASSET_SCHEMA)


def real_apng_asset_rows(n: int = 16) -> list:
    """Driver-side rows of the APNG fixture (r12): deterministic animated
    PNGs exercising the stdlib APNG extractor — RGB and RGBA canvases,
    partial-rect frames with offsets, dispose_op 0/1/2 and blend_op
    source/over. A pure function of ``n`` for the digest-freezing tool."""
    rows = []
    for i in range(n):
        w, h = 7 + i % 4, 5 + i % 3
        ch = 3 if i % 2 else 4
        n_frames = 2 + i % 3
        specs = []
        for k in range(n_frames):
            if k == 0:
                fx, fy, fw, fh = 0, 0, w, h
            else:
                fw = 2 + (i + k) % (w - 1)
                fh = 2 + (i + 2 * k) % (h - 1)
                fx = (i * 3 + k) % (w - fw + 1)
                fy = (i + k * 5) % (h - fh + 1)
            px = bytearray()
            for y in range(fh):
                for x in range(fw):
                    px += bytes(
                        ((x * 41 + i * 13 + k * 7) % 256,
                         (y * 23 + i * 5) % 256,
                         (x * y * 3 + k) % 256)
                    )
                    if ch == 4:
                        px.append((x * 31 + y * 17 + i + k * 19) % 256)
            specs.append({
                "x": fx, "y": fy, "fw": fw, "fh": fh, "pixels": bytes(px),
                "dispose": k % 3,
                "blend": (k + i) % 2,
            })
        content = _apng_encode(w, h, specs, ch)
        rows.append((i, "image", bytearray(content), '{"src":"fixture-apng"}'))
    return rows


def make_real_apng_assets(spark, n: int = 16) -> DataFrame:
    """APNG fixture frame (:func:`real_apng_asset_rows`)."""
    return spark.createDataFrame(real_apng_asset_rows(n), ASSET_SCHEMA)


def real_y4m_asset_rows(n: int = 16) -> list:
    """Driver-side rows of the Y4M video fixture (r12): deterministic raw
    YUV4MPEG2 clips cycling the supported chroma modes (C420/C422/C444/
    Cmono), 2-5 frames each. A pure function of ``n`` for the
    digest-freezing tool."""
    rows = []
    chromas = [b"420", b"422", b"444", b"mono"]
    for i in range(n):
        w, h = 6 + 2 * (i % 3), 4 + 2 * (i % 2)  # even dims for 420/422
        chroma = chromas[i % 4]
        n_frames = 2 + i % 4
        if chroma == b"mono":
            cw = chh = 0
        else:
            sx, sy = _Y4M_CHROMA[chroma]
            cw, chh = w >> sx, h >> sy
        frames = []
        for k in range(n_frames):
            y = bytes(
                (16 + (x * 9 + yy * 5 + i * 3 + k * 29) % 220)
                for yy in range(h) for x in range(w)
            )
            if chroma == b"mono":
                frames.append((y, None, None))
            else:
                u = bytes(
                    (40 + (x * 7 + yy * 11 + i + k * 13) % 176)
                    for yy in range(chh) for x in range(cw)
                )
                v = bytes(
                    (40 + (x * 5 + yy * 3 + i * 7 + k * 17) % 176)
                    for yy in range(chh) for x in range(cw)
                )
                frames.append((y, u, v))
        content = _y4m_encode(w, h, frames, chroma)
        rows.append((i, "video", bytearray(content), '{"src":"fixture-y4m"}'))
    return rows


def make_real_y4m_assets(spark, n: int = 16) -> DataFrame:
    """Y4M video fixture frame (:func:`real_y4m_asset_rows`)."""
    return spark.createDataFrame(real_y4m_asset_rows(n), ASSET_SCHEMA)


def real_jpeg_asset_rows(n: int = 16) -> list:
    """Driver-side rows of the JPEG fixture (r12): deterministic JPEGs
    from the stdlib encoder cycling the decoder's full subset —
    grayscale and color, 4:4:4 / 4:2:2 / 4:2:0 sampling, restart
    intervals, 16-bit DQT, qualities 80-100, odd (non-MCU-multiple)
    dimensions, and PROGRESSIVE (SOF2) streams on every (i%4==2) asset
    (spectral selection + successive approximation + EOB runs). A pure
    function of ``n`` for the digest-freezing tool."""
    rows = []
    subs = ["444", "422", "420"]
    for i in range(n):
        w = 17 + 2 * (i % 5)  # odd widths force edge-block cropping
        h = 11 + 2 * (i % 4)
        quality = 80 + 5 * (i % 5)
        if i % 4 == 0:
            # grayscale
            px = bytes(((x * 31 + y * 17 + i * 7) % 256)
                       for y in range(h) for x in range(w))
            content = _jpeg.encode(
                w, h, 1, px, quality=quality, restart=(2 if i % 2 else 0)
            )
        else:
            px = bytearray()
            for y in range(h):
                for x in range(w):
                    px += bytes((
                        (x * 13 + i * 19) % 256,
                        (y * 23 + i * 5) % 256,
                        ((x + y) * 9 + i * 3) % 256,
                    ))
            if i % 4 == 2:
                content = _jpeg.encode_progressive(
                    w, h, 3, px,
                    quality=quality,
                    subsample=subs[i % 3],
                    spectral_split=5 + i % 4,
                )
            else:
                content = _jpeg.encode(
                    w, h, 3, px,
                    quality=quality,
                    subsample=subs[i % 3],
                    restart=(3 if i % 3 == 1 else 0),
                    wide_dqt=(i % 5 == 2),
                )
        rows.append((i, "image", bytearray(content), '{"src":"fixture-jpeg"}'))
    return rows


def make_real_jpeg_assets(spark, n: int = 16) -> DataFrame:
    """Baseline-JPEG fixture frame (:func:`real_jpeg_asset_rows`)."""
    return spark.createDataFrame(real_jpeg_asset_rows(n), ASSET_SCHEMA)


def real_mjpeg_asset_rows(n: int = 12) -> list:
    """Driver-side rows of the MJPEG-AVI video fixture (r12): each asset
    is a minimal single-stream AVI whose frames are baseline JPEGs from
    the stdlib encoder (smooth per-frame gradients so the lossy
    round-trip stays perceptually stable). A pure function of ``n`` for
    the digest-freezing tool."""
    rows = []
    for i in range(n):
        w = 16 + 4 * (i % 3)
        h = 12 + 4 * (i % 2)
        n_frames = 2 + i % 4
        jf = []
        for k in range(n_frames):
            px = bytearray()
            for y in range(h):
                for x in range(w):
                    px += bytes((
                        (x * 6 + k * 40 + i * 9) % 256,
                        (y * 8 + k * 25 + i * 13) % 256,
                        ((x + y) * 4 + k * 55 + i * 3) % 256,
                    ))
            jf.append(_jpeg.encode(w, h, 3, px, quality=95))
        content = _avi.encode(w, h, jf, fps=4 + i % 3)
        rows.append((i, "video", bytearray(content), '{"src":"fixture-mjpeg"}'))
    return rows


def make_real_mjpeg_assets(spark, n: int = 12) -> DataFrame:
    """MJPEG-AVI video fixture frame (:func:`real_mjpeg_asset_rows`)."""
    return spark.createDataFrame(real_mjpeg_asset_rows(n), ASSET_SCHEMA)


def real_audio_pair_rows(n: int = 8) -> list:
    """Driver-side rows of the audio near-dup fixture (r12b): ``n``
    distinct synthetic signals (two-tone with a mid-clip onset — real
    temporal structure, so fingerprints differ across signals), each
    emitted TWICE: 16-bit PCM under id ``i`` and an 8-bit re-encode
    under id ``1000+i``. Byte-level dedup can never pair them; the
    spectral fingerprint must. A pure function of ``n`` for the
    digest-freezing tool."""
    import wave

    import numpy as np

    rows = []
    rate = 8000
    t = np.arange(4000) / rate
    # fingerprint band centers (geomspace(50, 4000, 10) midpoints): park
    # each signal's tones mid-band so 8-bit quantization noise cannot
    # move energy across a band edge
    centers = [78.0, 190.0, 470.0, 1160.0, 2860.0]
    slice_idx = np.minimum((t * rate / 500).astype(int), 7)
    for i in range(n):
        # three tones parked in distinct bands, two of them gated by the
        # bits of per-signal patterns across the 8 time slices — each
        # signal gets a distinct slice-by-band grid (measured: 16-vs-8-bit
        # pair Hamming <= 2, cross-signal >= 5 at the production clamp)
        f0 = centers[i % 5]
        f1 = centers[(i + 2) % 5]
        f2 = centers[(i + 4) % 5]
        p1 = (i * 73 + 29) & 0xFF
        p2 = (i * 151 + 97) & 0xFF
        g1 = np.array([(p1 >> s) & 1 for s in range(8)])[slice_idx]
        g2 = np.array([(p2 >> s) & 1 for s in range(8)])[slice_idx]
        x = (
            0.35 * np.sin(2 * np.pi * f0 * t)
            + 0.3 * np.sin(2 * np.pi * f1 * t) * g1
            + 0.3 * np.sin(2 * np.pi * f2 * t) * g2
        )
        for sw, base in ((2, 0), (1, 1000)):
            buf = io.BytesIO()
            with wave.open(buf, "wb") as wv:
                wv.setnchannels(1)
                wv.setsampwidth(sw)
                wv.setframerate(rate)
                if sw == 2:
                    wv.writeframes(
                        (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
                    )
                else:
                    wv.writeframes(
                        ((np.clip(x, -1, 1) * 127) + 128)
                        .astype(np.uint8).tobytes()
                    )
            rows.append((
                base + i, "audio", bytearray(buf.getvalue()),
                '{"src":"fixture-audio-pair"}',
            ))
    return rows


def make_real_audio_pair_assets(spark, n: int = 8) -> DataFrame:
    """Audio near-dup pair fixture (:func:`real_audio_pair_rows`)."""
    return spark.createDataFrame(real_audio_pair_rows(n), ASSET_SCHEMA)


def fixture_pcm(i: int) -> tuple[int, int, list]:
    """Deterministic int16 PCM for the FLAC/WAV parity fixtures: sine
    carrier + id-derived dither, mono/stereo alternating. A pure
    function of ``i`` so frozen digests are reproducible without Spark."""
    import math

    nch = 1 + i % 2
    nf = 400 + (i % 5) * 80
    chans = []
    for c in range(nch):
        step = 0.02 + 0.003 * (i % 7)
        chans.append(
            [
                int(9000 * math.sin(k * step + c))
                + ((i * 131 + k * 17) % 97 - 48)
                for k in range(nf)
            ]
        )
    return 8000, nch, chans


def real_flac_asset_rows(n: int = 16) -> list:
    """Driver-side rows of the FLAC fixture (r13): deterministic PCM
    (:func:`fixture_pcm`) through the stdlib FLAC encoder — every third
    stereo asset mid/side-decorrelated so the decoder's stereo
    reconstruction is exercised at rest, not just in unit tests."""
    rows = []
    for i in range(n):
        rate, nch, chans = fixture_pcm(i)
        content = _flac.encode(
            rate, nch, 16, chans, block_size=256,
            mid_side=(nch == 2 and i % 3 == 0),
        )
        rows.append((i, "audio", bytearray(content), '{"src":"fixture-flac"}'))
    return rows


def make_real_flac_assets(spark, n: int = 16) -> DataFrame:
    """Deterministic FLAC asset fixture (:func:`real_flac_asset_rows`)."""
    return spark.createDataFrame(real_flac_asset_rows(n), ASSET_SCHEMA)


def real_wavext_asset_rows(n: int = 16) -> list:
    """Driver-side rows of the float/extensible WAV fixture (r14): the
    SAME deterministic PCM as the FLAC fixture (:func:`fixture_pcm`)
    through float32/float64 and WAVE_FORMAT_EXTENSIBLE (incl. wrapped
    int16) containers — so float-vs-FLAC feature drift is itself frozen
    and inspectable. Pure function of ``n``."""
    import numpy as np

    rows = []
    for i in range(n):
        rate, nch, chans = fixture_pcm(i)
        x = np.asarray(chans, dtype=np.float64) / 32768.0
        ext = i % 4 >= 2
        if i % 4 == 3:
            content = _wav_ext_encode(
                rate, nch, x, fmt_tag=1, bits=16, extensible=True)
        else:
            content = _wav_ext_encode(
                rate, nch, x, fmt_tag=3, bits=32 if i % 2 == 0 else 64,
                extensible=ext)
        rows.append((i, "audio", bytearray(content),
                     '{"src":"fixture-wavext"}'))
    return rows


def make_real_wavext_assets(spark, n: int = 16) -> DataFrame:
    """Deterministic float/extensible WAV fixture
    (:func:`real_wavext_asset_rows`)."""
    return spark.createDataFrame(real_wavext_asset_rows(n), ASSET_SCHEMA)


def _tiff_encode_meta(w: int, h: int, pages: int, endian: str = "II") -> bytes:
    """Minimal classic-TIFF writer for the METADATA fixture: a chain of
    ``pages`` IFDs each carrying ImageWidth/ImageLength (SHORT/LONG mix,
    both byte orders) and no strip data — exactly the surface
    :func:`_tiff_meta` parses (the pixel path is honestly absent)."""
    e = "<" if endian == "II" else ">"
    magic = b"II*\x00" if endian == "II" else b"MM\x00*"
    out = bytearray(magic + struct.pack(e + "I", 8))
    off = 8
    for p in range(pages):
        n = 2
        entries = (
            struct.pack(e + "HHI", 256, 3, 1) + struct.pack(e + "HH", w, 0)
            + struct.pack(e + "HHI", 257, 4, 1) + struct.pack(e + "I", h)
        )
        nxt = off + 2 + n * 12 + 4 if p + 1 < pages else 0
        out += struct.pack(e + "H", n) + entries + struct.pack(e + "I", nxt)
        off = len(out)
    return bytes(out)


def real_tiff_asset_rows(n: int = 16) -> list:
    """Driver-side rows of the TIFF metadata fixture (r13): id-derived
    dimensions and page counts, byte order alternating II/MM. Pure
    function of ``n``."""
    rows = []
    for i in range(n):
        content = _tiff_encode_meta(
            240 + i * 7, 180 + i * 5, 1 + i % 4,
            "II" if i % 2 == 0 else "MM",
        )
        rows.append((i, "image", bytearray(content),
                     '{"src":"fixture-tiff"}'))
    return rows


def make_real_tiff_assets(spark, n: int = 16) -> DataFrame:
    """Deterministic TIFF metadata fixture (:func:`real_tiff_asset_rows`)."""
    return spark.createDataFrame(real_tiff_asset_rows(n), ASSET_SCHEMA)


def real_bmp_rle_asset_rows(n: int = 12) -> list:
    """Driver-side rows of the BMP RLE fixture (r14): BI_RLE8 and
    BI_RLE4 palettes with id-derived index grids that mix long runs,
    noisy spans (forcing short runs), absolute-mode rows and both
    nibble phases. Pure function of ``n``."""
    import numpy as np

    rows = []
    for i in range(n):
        four_bit = i % 2 == 1
        ncol = 16 if four_bit else 32 + i
        w, h = 9 + i % 7, 5 + i % 5
        idx = np.empty((h, w), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                # runs along x broken by an id-derived stripe
                idx[y, x] = ((y * 3 + i) if x < w // 2
                             else (x * 7 + y + i)) % ncol
        pal = bytes(((j * 41 + i * 13) % 256) for j in range(ncol * 3))
        content = _bmp_encode_rle(
            w, h, pal, idx, four_bit=four_bit,
            absolute_every=3 if i % 3 == 0 else 0)
        rows.append((i, "image", bytearray(content),
                     '{"src":"fixture-bmp-rle"}'))
    return rows


def make_real_bmp_rle_assets(spark, n: int = 12) -> DataFrame:
    """Deterministic BMP RLE fixture (:func:`real_bmp_rle_asset_rows`)."""
    return spark.createDataFrame(real_bmp_rle_asset_rows(n), ASSET_SCHEMA)


def real_tiff_pixel_asset_rows(n: int = 16) -> list:
    """Driver-side rows of the TIFF PIXEL fixture (r14): deterministic
    TIFFs cycling through the decodable subset's axes — byte order
    (II/MM), compression (none / LZW / Deflate / PackBits /
    LZW+Deflate with the horizontal predictor), photometric (grayscale
    WhiteIsZero+BlackIsZero / RGB / RGBA), multi-strip layouts
    (rows_per_strip < h) and TILED layouts with edge clipping (r14) —
    with the SAME id-derived pixel pattern as
    :func:`real_bmp_asset_rows` so cross-container hash equality is
    checkable. Pure function of ``n``."""
    rows = []
    for i in range(n):
        iw, ih = 7 + i % 6, 5 + i % 4
        ch = (1, 3, 4)[i % 3]
        px = bytearray()
        for y in range(ih):
            for x in range(iw):
                rgb = (
                    (x * 41 + i * 13) % 256,
                    (y * 67 + i * 5) % 256,
                    (x * y * 17 + i * 3) % 256,
                )
                if ch == 1:
                    px += bytes((rgb[0],))
                else:
                    px += bytes(rgb[:3])
                    if ch == 4:
                        px += bytes(((x + y + i) % 256,))
        photo = 0 if (ch == 1 and i % 2 == 0) else None  # WhiteIsZero leg
        if photo == 0:
            px = bytearray(255 - v for v in px)  # store inverted
        content = _tiff_encode_pixels(
            iw, ih, ch, px,
            endian="II" if i % 2 == 0 else "MM",
            compression=(1, 5, 32773, 5, 1, 8, 32773, 8)[i % 8],
            rows_per_strip=2 if i % 5 == 0 else None,
            photometric=photo,
            predictor=2 if i % 8 in (3, 7) else 1,
            tile=(8, 4) if i % 5 == 3 else None,
        )
        rows.append((i, "image", bytearray(content),
                     '{"src":"fixture-tiff-px"}'))
    return rows


def make_real_tiff_pixel_assets(spark, n: int = 16) -> DataFrame:
    """Deterministic TIFF pixel fixture (:func:`real_tiff_pixel_asset_rows`)."""
    return spark.createDataFrame(real_tiff_pixel_asset_rows(n), ASSET_SCHEMA)


def real_webp_pixel_asset_rows(n: int = 16) -> list:
    """Driver-side rows of the WebP-lossless PIXEL fixture (r15):
    deterministic VP8L files through the pure-Python encoder
    (`vp8l.encode` — literal prefix codes, subtract-green on
    alternating legs), carrying the SAME id-derived pixel pattern as
    :func:`real_tiff_pixel_asset_rows` / `real_bmp_asset_rows`, so
    cross-container dHash equality is checkable. Grayscale legs
    replicate into RGB; the ch==4 legs carry a varying alpha (ignored
    by dHash, exercised by the decoder). Pure function of ``n``."""
    from . import vp8l as _v

    rows = []
    for i in range(n):
        iw, ih = 7 + i % 6, 5 + i % 4
        ch = (1, 3, 4)[i % 3]
        px = bytearray()
        for y in range(ih):
            for x in range(iw):
                rgb = (
                    (x * 41 + i * 13) % 256,
                    (y * 67 + i * 5) % 256,
                    (x * y * 17 + i * 3) % 256,
                )
                if ch == 1:
                    px += bytes((rgb[0], rgb[0], rgb[0], 255))
                elif ch == 3:
                    px += bytes(rgb) + b"\xff"
                else:
                    px += bytes(rgb) + bytes(((x + y + i) % 256,))
        content = _v.encode(iw, ih, px, subtract_green=(i % 2 == 1))
        rows.append((i, "image", bytearray(content),
                     '{"src":"fixture-webp-px"}'))
    return rows


def make_real_webp_pixel_assets(spark, n: int = 16) -> DataFrame:
    """Deterministic VP8L pixel fixture (:func:`real_webp_pixel_asset_rows`)."""
    return spark.createDataFrame(real_webp_pixel_asset_rows(n), ASSET_SCHEMA)


#: Frozen lossy-WebP fixture corpus (r16): 8 committed files ENCODED
#: ONCE by the reference libwebp (there is deliberately no lossy
#: encoder in this repo) over id-derived deterministic rasters —
#: gradients, blocky tiles, and two varying-alpha legs that carry an
#: ALPH chunk; two advanced-encoder legs (simple loop filter; 4 token
#: partitions + 4 segments; filter sharpness) so the contract entry
#: exercises every decode path. The DECODE side is this repo's pure
#: Python `vp8.py`, pinned byte-exact against libwebp's YUV output in
#: tests/test_vp8_lossy.py; these bytes freeze that behavior into the
#: oracle-checked contract.
_WEBP_LOSSY_FILES = (
    # asset 0
    "52494646d00000005745425056503820c40000009005009d012a180010003ed154a34b"
    "a824a321b00801001a096c009d32844805d047aaea007a0079487eb77c1b018c172b73"
    "3154c000fec1d876d29f0545806bda8377698fd1213f898c3d2ecc3bf70924a40a79b0"
    "23896365a2c82084d6675e14139823e63b71ff3146c44d6a19da898a0c5a898e33e10a"
    "c3df34869bb929477906b1fa45ed842cb60bf0231d1aefc4545c137c8d1a30e354931f"
    "9babb2d623daae2eb6960235fe18d6cfc52f877487433e2aad7ef4566deae09d575966"
    "de03785bc000",
    # asset 1
    "524946460c010000574542505650382000010000f009009d012a210015003f2584b051"
    "ae29a422b01aaaa9c024896c013a03fa06c807f40a434c6f1dc74474bfc03ae48817f8"
    "d896fe01fc03f2abf80767fe7fff4807ffff333de00ffcffe1ff8ef6fffa000170c128"
    "b7d80000fee8dc03ada1c465188b6093009e313ce077e05ee52660b94eaba270907377"
    "38a835cea196e8a94b13ae8742256b8ab66f961c0652035953e45d1742166f6e724117"
    "83b28e98bcd885f2344a0d4844b9ff4e358b9eff0ddf7f7b9f7190befef73ee2a4a6d3"
    "ffdcff28f0110a3ffb9fe51e021c9c002e8af6be691dee3ee02330bdbd4be0d1c738f9"
    "ca33c245b48847e72e20f11c4e9783fc973d6ef17cfc8388fc04bbd8d00000",
    # asset 2
    "52494646b800000057454250565038580a000000100000000f00000f0000414c504817"
    "00000001990a44f43f40346d035595fdffe1c9d988094866e92e00565038207a000000"
    "9003009d012a1000100002003425b002746f806400fd00e9ffe8ffd240fd55eb0006be"
    "1df000fef1a9599f5113f6c89ee627e689e796cdd047731c578d56ffe9a0eda34f8879"
    "bcc93e867a9cc7fff913e6b2796b4ef0761bc07d0063fd28bf73d92b35c7e4bbb4b628"
    "fffd48b46f3773da92579b94f022000000",
    # asset 3
    "52494646700400005745425056503820640400007017009d012a300020003e31148842"
    "a22121180d5554200304b60e00a5038dd72913811c1a175ccff257f19be412acfd5758"
    "4481756dfb1e901b64fcc07ea27f8cf544fe8dec03f403fc07b807e9bfaa37f40f649f"
    "d66f600fe15fcc3d23ffdd7fc0f824fd6dfdbef80cfd90ffef8209b02f87fe287983df"
    "0fcf2a0175aff91c72be20ac43aa03cd33502b9d3d15fe35fe3bc41be67fd2ffda7a3c"
    "ff65ec83fd97d337b38fa97d82fa3bfa187eceb22dceaec3bade448a8fef544c496287"
    "04853bd203b000fef9678a75c4a126047e47cfc51adc32e5730ff868ce82c9ec666f72"
    "8c8079c7f12f89f45ff9ede913fbc45bd01171320a3638bf4cd6b2d27b34b3feacfd8a"
    "9963fcfa93f8d27b61fd95b456247adadc057a70ed8cfd6d4beb8e7d697e4cb793fa8d"
    "61b4c8e3f7bdd2ac2e7fcedd07307c62b1e0c08b731867fec118a6782299e17917ff31"
    "637e369bef30eb6ba6f405c347ad94f7dbdbbe7239eddef068b008feea329ab72ffa15"
    "84be84d325c50721585e9269d5ea682d83b90f4257a78b9347846d820ba7fb69f7608a"
    "feb38346d12d665b7cff897bebe7c283763ff0c8d397d27d5001040f1a19beae8d6c86"
    "877c9f73ee12cca9211e6107d2dacfd9ee466f872e694c2109f37737c38c76d7757b71"
    "ad6b0eea161b4683e98ba4047ff5554ad16084221652562d051160fabbb5576fc5ff5f"
    "a9afe7e4b34d30f125c7cf20cbc65d23ab5e2d138e6f5bf9c232de2191a544aa502d01"
    "2826516f594437d586889de980fbd459c5dbac9f3c3cffc9af1e5529b523f0d9f319f0"
    "2618edf446708c028529effaadd5d92de646973e4c15226a444328f1b3f4806dbdfc36"
    "9b1b44f7e304c465c3da7e5769460caf327d70ebd14e324ae3f7f1d66b1fd52cc4f6b2"
    "0e0530e3822874fd0ddc253679f192ba3208ed2a311fda17906bce436e9995fae57b99"
    "42c4626ad9fc72e81ffac968b0ff0dc91339c3b0af294bf86d35d0a35e964994717c4e"
    "72980dd7f7d9987616618ff508b5791289c77a71cb8c45adf027ebd425fa35411f6bd9"
    "3430525c67ae5ffcff8beadaf0a32e6a3fb88d0365cd5c17429275d9ab997ed9bd379d"
    "37727c654418f37734716f72862dc31e689d168530c3a982819fe1fb1b83cb5d9d7d0d"
    "87ac015ad6212a741daff73971c318308d463746a813b7eb52863f8876ce9919c97922"
    "14992598b11e1e324adab03dfdd1efd09ffdca98c60f05d6c1dd80127dca5ca99a08dc"
    "bfb287b9d47640d6898937d58a8552e52eea3c265aa7e66df09e9da08b019b92a643fe"
    "f907d79e6e3d9ff3b7bbe6a846939ba80bdbfdf735f3e0d5b9cf7d3852a9be08e9f18f"
    "90a880dd743ee7bc9dc309ada4d8912dcdebc8005ee3f24e96e4e804217320b75c1cf9"
    "afad654518ebb04c800e43a14b5ad8f5c38d7a472442b9448730ee4bf163d5a8f25ff3"
    "528fa2e4b7bb3762790cc77de030ee3d745b7f2774ba70e36a60b3097b7d81e0f5f17d"
    "a5dcde149e6cba2b37d5a627fdfdcb3737ca0f1d38a325e7d26063cfcfe35c3244c044"
    "110bc4a4948140cd444dc2699e814621fa0b489df0000000",
    # asset 4
    "524946467a00000057454250565038206e000000b004009d012a14000c003f71a2c758"
    "b4ac28a3b00802902e096c009d3284701ee03f805c7ff47fe9407e8002063800fee0c7"
    "db8312b1d4cdb62559f7d5ef9454f12829ba93154c19e1121f321f6faecf94a27b57c4"
    "07fac8096ba9f076507bf1f0b99dd30968fde13e68d0000000",
    # asset 5
    "52494646da0100005745425056503820ce010000520b009d012a280018003eb54a9c4a"
    "24a2a1a12aadfc9016896c009d32847c3c8129dfd83ef36e681988516da2e765fe97fa"
    "d7bee5ec01e827faabe96fec9bfea2bcfbeabe09d6add02b675ec8ce0f6db87e5a6bca"
    "d1b3c098b085d366b942fc32d5c000fc0266093c4f120b4621a6f25dadd26786877bb8"
    "cdbff97be4c9876a7ead663ec19f03cb5b9f9bc899ab40a6cc10f01d44d4cc4f54a1f1"
    "4939c794f016f66d6380ceb2ca6715ef4aa20d5aed355872e6019d9eebe8708498fe9a"
    "192c36a9d4822436c247601012223c221ea41dc3873990219a0289518358e112d7a981"
    "e119af94e520aa3525e1e7cbe72a5fcb01680fa0a7f82bdc6842e2faca5f3a8e6758f5"
    "bf7659351d233da88a93b49562d10b9a41234f560ce20bc0ec011d646ce0fddd0c1957"
    "51d1105c37facf8e714d06df3107d982a364c2c00fe29fdba93abd0352cf9d8fc6bca9"
    "8bb34f3c74d716abf7297c6c76a53d01e1bcf64db67be595682df555e01501138a463a"
    "f2fca5da043f48040e95af8b10fe71d3c212179ed9c1203a7345f253a5d4251b507954"
    "7b99b491682266136b6461bf129e920aa84bd80347f34d492afb6d5cc3e30b70248a84"
    "283ab03ff9ff99477aa4b39c456495c03f07214058b62ede200000",
    # asset 6
    "52494646c40000005745425056503820b8000000b007009d012a200020003edd6aad51"
    "28a62422a80801101b896c0141ff5403f80521a227aae52d57fbeff4001ffff4803fd5"
    "7f20fe4bffffbc03ffffa007effffff0bca06e0000feee0cde73852b491ea8bbb2b541"
    "262d0dae765aa3ff5c1849d1f9fc4a078fd980961579acd48c9236b8c086340e131e25"
    "84ebd7ef1ad9a832841d6bd60933edd75168184ebd76361dcf23205118dcb18c7168c1"
    "4408fcccfc03e714e0368681f38a70200a15616d607c050ab0b6afc200",
    # asset 7
    "524946467a01000057454250565038580a000000100000001b0000130000414c504817"
    "00000001998ce87f8048db066e70fe1d9f1e454cc004304b5d0200565038203c010000"
    "5008009d012a1c0014003e913c994825232221300c00a812096c009d328474ffcfbbab"
    "b42240b925d203940399cbd1dbf527dc06f007a007952feb37c27818c171a836415734"
    "c8844102c000fc02083d2d7f445f1553e29bf0bcf1bd561e8d0d5781ffdcef6e53abf5"
    "6c3c7fe0dc6ff26e77bd1de9df88be624c7029db00f92b725023e92e27fdc26e78df88"
    "dc980b573debec4b4730553f4ecfcf9d5a502539c6038fc46c1f6a08a4c8bac726d733"
    "f632eabfbdb48466795e5d4337f99ff955a4e76611ce2c7c5518f8d72861749670becf"
    "0acb77ff1a278cae8e49cb5041cf3be4c59c3625a03b5559afe4ee5b8d74fbc9e8d0ea"
    "3fa735e42df7bbd7956a3af3b7fc9e42a939bc9e9c9696e2b12f68133eef3c3f250ff2"
    "030fa50627ff84e372f71dd6209647f82decf54887a29727995c022fd14b93ccadde00"
    "00",
)


def real_webp_lossy_asset_rows(n: int = 8) -> list:
    """Driver-side rows of the lossy-WebP PIXEL fixture (r16): the
    committed `_WEBP_LOSSY_FILES` corpus (cycled when n > 8). Pure
    function of ``n``."""
    rows = []
    for i in range(n):
        content = bytes.fromhex(_WEBP_LOSSY_FILES[i % len(_WEBP_LOSSY_FILES)])
        rows.append((i, "image", bytearray(content),
                     '{"src":"fixture-webp-lossy"}'))
    return rows


def make_real_webp_lossy_assets(spark, n: int = 8) -> DataFrame:
    """Deterministic lossy-WebP fixture (:func:`real_webp_lossy_asset_rows`)."""
    return spark.createDataFrame(real_webp_lossy_asset_rows(n), ASSET_SCHEMA)


def real_bmp_asset_rows(n: int = 16) -> list:
    """Driver-side rows of the BMP fixture (r13): deterministic 24-bit
    uncompressed BMPs (id-derived size and pixel pattern, odd widths so
    row padding is always live). Pure function of ``n``."""
    rows = []
    for i in range(n):
        iw, ih = 7 + i % 6, 5 + i % 4
        px = bytearray()
        for y in range(ih):
            for x in range(iw):
                px += bytes((
                    (x * 41 + i * 13) % 256,
                    (y * 67 + i * 5) % 256,
                    (x * y * 17 + i * 3) % 256,
                ))
        rows.append((i, "image", bytearray(_bmp_encode(iw, ih, 3, px)),
                     '{"src":"fixture-bmp"}'))
    return rows


def make_real_bmp_assets(spark, n: int = 16) -> DataFrame:
    """Deterministic BMP asset fixture (:func:`real_bmp_asset_rows`)."""
    return spark.createDataFrame(real_bmp_asset_rows(n), ASSET_SCHEMA)


def real_adpcm_asset_rows(n: int = 16) -> list:
    """Driver-side rows of the IMA-ADPCM WAV fixture (r13): the same
    deterministic PCM as the FLAC fixture (:func:`fixture_pcm`) through
    the IMA encoder — so the lossy ADPCM features are pinned against
    the SAME underlying signals the lossless containers carry."""
    rows = []
    for i in range(n):
        rate, nch, chans = fixture_pcm(i)
        content = _wav_ima_encode(rate, chans, block_samples=129)
        rows.append((i, "audio", bytearray(content),
                     '{"src":"fixture-adpcm"}'))
    return rows


def make_real_adpcm_assets(spark, n: int = 16) -> DataFrame:
    """Deterministic IMA-ADPCM fixture (:func:`real_adpcm_asset_rows`)."""
    return spark.createDataFrame(real_adpcm_asset_rows(n), ASSET_SCHEMA)


def make_real_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic REAL-codec asset fixture (:func:`real_asset_rows`):
    every payload decodes through the stdlib kernels with ``fake=False``,
    so the decode/resize/dhash contract entries can be hash-pinned
    against frozen expected digests instead of rows-only checked."""
    return spark.createDataFrame(real_asset_rows(n), ASSET_SCHEMA)


def _dhash_of_pixels(
    w: int, h: int, ch: int, pixels: bytearray, hash_size: int = 8
) -> int:
    """Difference hash of a decoded raster: grayscale, area-downsample to
    a (hash_size+1) x hash_size grid, bit = cell brighter than its right
    neighbor — the standard perceptual dHash (robust to re-encoding,
    resizing and small edits, the transforms that defeat byte-exact
    image dedup)."""
    gw, gh = hash_size + 1, hash_size
    grid = [[0.0] * gw for _ in range(gh)]
    counts = [[0] * gw for _ in range(gh)]
    for y in range(h):
        gy = min(y * gh // h, gh - 1)
        row = y * w * ch
        for x in range(w):
            gx = min(x * gw // w, gw - 1)
            p = row + x * ch
            # integer luma (Rec.601 weights scaled by 1000)
            lum = (
                299 * pixels[p] + 587 * pixels[p + 1] + 114 * pixels[p + 2]
            )
            grid[gy][gx] += lum
            counts[gy][gx] += 1
    out = 0
    bit = 0
    for gy in range(gh):
        for gx in range(hash_size):
            left = grid[gy][gx] / max(counts[gy][gx], 1)
            right = grid[gy][gx + 1] / max(counts[gy][gx + 1], 1)
            if left > right:
                out |= 1 << bit
            bit += 1
    return out


def dhash_images(
    assets: DataFrame,
    content_col: str = "content",
    out_col: str = "dhash",
    hash_size: int = 8,
    fake: bool = False,
    project: Optional[tuple] = None,
    codec: str = "stdlib",
) -> DataFrame:
    """Append a 64-bit perceptual dHash column for image payloads.

    ``codec`` (r13): ``"stdlib"`` (default) decodes with this repo's
    deterministic kernels so the SAME bytes hash to the SAME 64 bits in
    every environment — the property at-rest dedup joins depend on;
    ``"auto"`` prefers the Pillow seam (``codec_accel``) for decode
    throughput, falling back to stdlib per payload. The tradeoff is
    explicit: lossless formats (PNG/GIF) decode bit-identically either
    way, but JPEG pixels may differ by ±1-2 levels between IDCT
    implementations, which can flip near-tie gradient bits — so "auto"
    hashes stay within a small Hamming distance of stdlib hashes
    (fine for thresholded near-dup joins) but are NOT byte-stable
    across environments. Never mix codecs within one at-rest corpus.

    Real mode decodes with the stdlib raster decoders (Pillow-free):
    PNG, baseline/progressive JPEG (r12b), or the FIRST frame of
    animated GIF / APNG / Y4M video / MJPEG-AVI (r12); non-decodable
    payloads hash to NULL. Fake mode (CI without image
    fixtures) derives a deterministic pseudo-hash from the content bytes
    so the plumbing — Arrow batching, schema, downstream joins — runs
    identically. Pair with :func:`seqspark.pipeline.dedup.hamming_dupes`
    for near-duplicate detection at rest (hash once at ingest, join on
    bands forever — sketch-at-rest like tokens/sketches elsewhere).

    ``project`` (r12b) names the columns to carry through INSTEAD of the
    whole row: ``project=("asset_id",)`` sends only (asset_id, content)
    into Python and returns (asset_id, dhash) — the content bytes never
    make the Python→JVM return trip. Default (None) keeps the
    append-a-column contract. At asset-corpus scale the default is 2×
    the necessary Arrow traffic when the caller only wants the hashes —
    measured: 2.4 s → 1.3 s over 96 realistic 640x480 assets.

    Arrow-batched ``mapInArrow``; per-image work is O(pixels), no
    shuffle.
    """
    import pyarrow as pa

    if codec not in ("auto", "stdlib"):
        raise ValueError(f"codec must be auto|stdlib, got {codec!r}")
    size = hash_size
    if project is not None:
        carry = [c for c in project if c != content_col]
        src = assets.select(*carry, content_col)
    else:
        carry = None
        src = assets

    def batches(it):
        for batch in it:
            hashes = []
            for content in batch.column(content_col).to_pylist():
                if content is None:
                    hashes.append(None)
                    continue
                b = bytes(content)
                if fake:
                    hashes.append(
                        int.from_bytes(
                            hashlib.sha256(b).digest()[:8], "big", signed=True
                        )
                    )
                    continue
                dec = (
                    _accel.decode_pixels_accel(b) if codec == "auto" else None
                )
                if dec is None:
                    dec = _decode_any_pixels(b)
                if dec is None:
                    hashes.append(None)
                    continue
                w, h, ch, pixels = dec
                u = _dhash_of_pixels(w, h, ch, pixels, size)
                hashes.append(u - (1 << 64) if u >= (1 << 63) else u)
            # explicit int64 array: an all-NULL batch must not infer a
            # null-typed column that breaks the declared output schema
            hcol = pa.array(hashes, type=pa.int64())
            if carry is not None:
                cols = [batch.column(c) for c in carry]
                yield pa.RecordBatch.from_arrays(
                    cols + [hcol], names=list(carry) + [out_col]
                )
            else:
                yield pa.RecordBatch.from_arrays(
                    list(batch.columns) + [hcol],
                    names=list(batch.schema.names) + [out_col],
                )

    if carry is not None:
        fields = {f.name: f for f in src.schema.fields}
        out_schema = ", ".join(
            f"`{c}` {fields[c].dataType.simpleString()}" for c in carry
        ) + f", {out_col} long"
    else:
        out_schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in src.schema.fields
        ) + f", {out_col} long"
    return src.mapInArrow(batches, out_schema)


# ------------------------------------------------------------------ audio

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("rms", DoubleType()),
        StructField("zcr", DoubleType()),
        StructField("centroid_hz", DoubleType()),
        StructField("fingerprint", LongType()),
    ]
)


#: IMA ADPCM step table (public spec — the 89-entry exponential ladder)
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_decode_nibble(nib: int, predictor: int, index: int):
    step = _IMA_STEPS[index]
    vpdiff = step >> 3
    if nib & 1:
        vpdiff += step >> 2
    if nib & 2:
        vpdiff += step >> 1
    if nib & 4:
        vpdiff += step
    predictor = predictor - vpdiff if nib & 8 else predictor + vpdiff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + _IMA_INDEX[nib & 7]))
    return predictor, index


def _riff_chunks(b: bytes):
    """Yield (fourcc, start, size) for RIFF/WAVE chunks (word-aligned)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return
    pos = 12
    while pos + 8 <= len(b):
        fourcc = b[pos:pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4:pos + 8])
        start = pos + 8
        if start + size > len(b):
            return
        yield fourcc, start, size
        pos = start + size + (size & 1)


def _wav_ima_parse(b: bytes):
    """(rate, nch, block_align, samples_per_block, n_samples, data) for
    an IMA-ADPCM WAV (format tag 0x0011 — the compressed WAV variant the
    stdlib ``wave`` module refuses), else None. ``n_samples`` prefers the
    ``fact`` chunk (authoritative for compressed WAV), falling back to
    whole-blocks arithmetic."""
    fmt = data = None
    fact_n = None
    for fourcc, start, size in _riff_chunks(b or b""):
        if fourcc == b"fmt " and size >= 16:
            fmt = b[start:start + size]
        elif fourcc == b"fact" and size >= 4:
            (fact_n,) = struct.unpack("<I", b[start:start + 4])
        elif fourcc == b"data":
            data = b[start:start + size]
    if fmt is None or data is None:
        return None
    tag, nch, rate, _br, block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16])
    if tag != 0x0011 or bits != 4 or nch < 1 or block_align < 4 * nch:
        return None
    spb = (block_align - 4 * nch) * 2 // nch + 1
    n_blocks = len(data) // block_align
    n = fact_n if fact_n is not None else n_blocks * spb
    return rate, nch, block_align, spb, n, data


def _wav_ima_meta(b: bytes):
    """(n_channels, bits, n_frames) for IMA-ADPCM WAV — the audio
    metadata convention (bits reported as the DECODED 16, matching what
    the PCM seam emits)."""
    parsed = _wav_ima_parse(b)
    if parsed is None:
        return None
    _rate, nch, _ba, _spb, n, _data = parsed
    return nch, 16, n


def _wav_ima_pcm(b: bytes):
    """(rate, nch, mono float64) for IMA-ADPCM WAV (r13): per-block
    4-byte channel headers (int16 predictor + step index), then nibble
    data interleaved per channel in 4-byte groups (8 samples), low
    nibble first — the published IMA/DVI layout."""
    import numpy as np

    parsed = _wav_ima_parse(b)
    if parsed is None:
        return None
    rate, nch, block_align, spb, n_total, data = parsed
    chans = [[] for _ in range(nch)]
    for boff in range(0, len(data) - block_align + 1, block_align):
        block = data[boff:boff + block_align]
        preds, idxs = [], []
        for c in range(nch):
            p, i = struct.unpack_from("<hB", block, c * 4)
            if i > 88:
                return None
            preds.append(p)
            idxs.append(i)
            chans[c].append(p)  # the header predictor IS sample 0
        pos = 4 * nch
        # nibble payload: 4-byte per-channel groups, round-robin
        need = spb - 1
        got = [0] * nch
        while pos + 4 * nch <= block_align and any(
            g < need for g in got
        ):
            for c in range(nch):
                for byte in block[pos:pos + 4]:
                    for nib in (byte & 0xF, byte >> 4):
                        if got[c] < need:
                            preds[c], idxs[c] = _ima_decode_nibble(
                                nib, preds[c], idxs[c])
                            chans[c].append(preds[c])
                            got[c] += 1
                pos += 4
    if not chans[0]:
        return None
    a = np.asarray(chans, dtype=np.float64)[:, :n_total]
    return rate, nch, (a / 32768.0).mean(axis=0)


def _wav_ima_encode(rate: int, chans, block_samples: int = 505) -> bytes:
    """Minimal IMA-ADPCM WAV writer (fixtures): int16 per-channel input,
    standard quantizer — the decoder recovers the encoder's internal
    reconstruction bit-exactly (ADPCM is lossy vs the ORIGINAL only)."""
    nch = len(chans)
    n = len(chans[0])
    block_align = 4 * nch + (block_samples - 1) * nch // 2
    idxs = [0] * nch
    out = bytearray()
    pos = 0
    while pos < n:
        take = min(block_samples, n - pos)
        headers = bytearray()
        payload = [bytearray() for _ in range(nch)]
        preds = []
        for c in range(nch):
            p = int(chans[c][pos])
            preds.append(p)
            headers += struct.pack("<hBB", p, idxs[c], 0)
        nibs = [[] for _ in range(nch)]
        for k in range(1, block_samples):
            for c in range(nch):
                s = int(chans[c][pos + k]) if pos + k < n else preds[c]
                step = _IMA_STEPS[idxs[c]]
                diff = s - preds[c]
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
                preds[c], idxs[c] = _ima_decode_nibble(
                    nib, preds[c], idxs[c])
                nibs[c].append(nib)
        for c in range(nch):
            for j in range(0, len(nibs[c]), 2):
                lo = nibs[c][j]
                hi = nibs[c][j + 1] if j + 1 < len(nibs[c]) else 0
                payload[c].append(lo | (hi << 4))
        # interleave per-channel 4-byte groups
        body = bytearray()
        groups = (len(payload[0]) + 3) // 4
        for g in range(groups):
            for c in range(nch):
                chunk = bytes(payload[c][g * 4:(g + 1) * 4])
                body += chunk + b"\x00" * (4 - len(chunk))
        out += headers + body
        pos += take
    byte_rate = rate * block_align // block_samples
    fmt = struct.pack("<HHIIHH", 0x0011, nch, rate, byte_rate,
                      block_align, 4) + struct.pack("<HH", 2, block_samples)
    data = bytes(out)
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _wav_ext_pcm(b: bytes):
    """(rate, nch, mono float64) for the WAV variants the stdlib
    ``wave`` module (3.11) refuses (r14): IEEE-float PCM (fmt tag 3,
    32/64-bit) and WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE) wrapping integer
    or float PCM — the SubFormat GUID's leading u16 is the effective
    tag. Common in ML audio corpora (float feature dumps, >2ch
    recorders). None outside that subset."""
    import numpy as np

    fmt = data = None
    for fourcc, start, size in _riff_chunks(b or b""):
        if fourcc == b"fmt " and size >= 16:
            fmt = bytes(b[start:start + size])
        elif fourcc == b"data":
            data = b[start:start + size]
    if fmt is None or data is None:
        return None
    tag, nch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag == 0xFFFE:
        # EXTENSIBLE: cbSize(2) + valid_bits(2) + channel_mask(4) +
        # SubFormat GUID whose first 16 bits are the wrapped tag
        if len(fmt) < 40:
            return None
        tag = struct.unpack("<H", fmt[24:26])[0]
    if nch < 1 or rate <= 0:
        return None
    if tag == 3:
        if bits == 32:
            x = np.frombuffer(
                data[: len(data) // 4 * 4], dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(data[: len(data) // 8 * 8], dtype="<f8").copy()
        else:
            return None
    elif tag == 1:
        if bits == 8:
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64)
                 - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(
                data[: len(data) // 2 * 2], dtype="<i2"
            ).astype(np.float64) / 32768.0
        elif bits == 24:
            a = np.frombuffer(data[: len(data) // 3 * 3], dtype=np.uint8)
            a = a.reshape(-1, 3)
            v = (a[:, 0].astype(np.int32)
                 | (a[:, 1].astype(np.int32) << 8)
                 | (a[:, 2].astype(np.int32) << 16))
            v = (v ^ 0x800000) - 0x800000
            x = v.astype(np.float64) / 8388608.0
        elif bits == 32:
            x = np.frombuffer(
                data[: len(data) // 4 * 4], dtype="<i4"
            ).astype(np.float64) / 2147483648.0
        else:
            return None
    else:
        return None
    n = (len(x) // nch) * nch
    x = x[:n].reshape(-1, nch).mean(axis=1)
    return rate, nch, x


def _wav_ext_encode(
    rate: int,
    nch: int,
    signal,
    fmt_tag: int = 3,
    bits: int = 32,
    extensible: bool = False,
) -> bytes:
    """Minimal float/extensible WAV writer for the deterministic
    fixtures — pairs with :func:`_wav_ext_pcm`. ``signal`` is either a
    mono array (replicated across channels, so the mixdown recovers it
    exactly) or a list of per-channel arrays."""
    import numpy as np

    x = np.asarray(signal, dtype=np.float64)
    if x.ndim == 1:
        frames = np.repeat(x[:, None], nch, axis=1).ravel()
    else:
        assert x.shape[0] == nch
        frames = x.T.ravel()
    if fmt_tag == 3:
        raw = frames.astype("<f4" if bits == 32 else "<f8").tobytes()
    else:
        assert fmt_tag == 1 and bits == 16
        # x/32768-scaled inputs round-trip to their exact int16 values
        raw = np.clip(
            np.round(frames * 32768.0), -32768, 32767
        ).astype("<i2").tobytes()
    ba = nch * bits // 8
    if extensible:
        guid = (struct.pack("<H", fmt_tag)
                + b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x008\x9bq")
        fmt = struct.pack("<HHIIHH", 0xFFFE, nch, rate, rate * ba, ba,
                          bits) + struct.pack("<HHI", 22, bits, 0) + guid
    else:
        fmt = struct.pack("<HHIIHH", fmt_tag, nch, rate, rate * ba, ba, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _wav_ext_meta(b: bytes):
    """(container, rate, nch, bits, n_frames) for the float/extensible
    WAV subset — header-only (fmt + data length arithmetic)."""
    fmt = None
    data_len = None
    for fourcc, start, size in _riff_chunks(b or b""):
        if fourcc == b"fmt " and size >= 16:
            fmt = bytes(b[start:start + size])
        elif fourcc == b"data":
            data_len = size
    if fmt is None or data_len is None:
        return None
    tag, nch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
    container = "wav-float"
    if tag == 0xFFFE:
        if len(fmt) < 40:
            return None
        tag = struct.unpack("<H", fmt[24:26])[0]
        container = "wav-ext"
    if (tag == 3 and bits in (32, 64)) or (
        tag == 1 and bits in (8, 16, 24, 32)
    ):
        if tag != 3 and container == "wav-float":
            return None  # plain integer PCM belongs to the stdlib path
        if nch < 1 or rate <= 0 or bits == 0:
            return None
        return container, rate, nch, bits, data_len // (nch * bits // 8)
    return None


def _wav_pcm(b: bytes):
    """Decode a WAV payload to (sample_rate, n_channels, mono float64
    samples in [-1, 1]). 8/16/24/32-bit PCM; returns None outside that
    subset or for malformed containers."""
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(b or b""), "rb") as wv:
            nch = wv.getnchannels()
            sw = wv.getsampwidth()
            rate = wv.getframerate()
            nf = wv.getnframes()
            raw = wv.readframes(nf)
    except Exception:
        return None
    if nch <= 0 or rate <= 0:
        return None
    if sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 3:
        a = np.frombuffer(raw, dtype=np.uint8)
        a = a[: (len(a) // 3) * 3].reshape(-1, 3)
        v = (
            a[:, 0].astype(np.int32)
            | (a[:, 1].astype(np.int32) << 8)
            | (a[:, 2].astype(np.int32) << 16)
        )
        v = (v ^ 0x800000) - 0x800000  # sign-extend 24 -> 32
        x = v.astype(np.float64) / 8388608.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        return None
    n = (len(x) // nch) * nch
    x = x[:n].reshape(-1, nch).mean(axis=1)
    return rate, nch, x


def _iff_chunks(b: bytes, pos: int, end: int):
    """Big-endian IFF chunk walk (AIFF), word-aligned like RIFF."""
    while pos + 8 <= end:
        fourcc = b[pos : pos + 4]
        (size,) = struct.unpack(">I", b[pos + 4 : pos + 8])
        start = pos + 8
        if start + size > end:
            return
        yield fourcc, start, size
        pos = start + size + (size & 1)


def _f80_to_float(b: bytes) -> float:
    """80-bit IEEE extended float (AIFF sample rates)."""
    exp = struct.unpack(">H", b[:2])[0]
    mant = struct.unpack(">Q", b[2:10])[0]
    sign = -1.0 if exp & 0x8000 else 1.0
    exp &= 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    return sign * mant * 2.0 ** (exp - 16383 - 63)


#: AIFF-C compression types the stdlib path decodes (r14): NONE = plain
#: big-endian PCM, sowt = byte-swapped (little-endian) 16-bit PCM (the
#: Mac-origin default), fl32/fl64 = big-endian IEEE float
_AIFC_COMPS = (b"NONE", b"sowt", b"fl32", b"FL32", b"fl64", b"FL64")


def _aiff_parse(b: bytes):
    """(rate, nch, sample_width_bytes, n_frames, ssnd_payload, comp) or
    None. ``comp`` is the AIFF-C compression fourcc (b"NONE" for plain
    AIFF)."""
    if len(b) < 12 or b[:4] != b"FORM" or b[8:12] not in (b"AIFF", b"AIFC"):
        return None
    aifc = b[8:12] == b"AIFC"
    comm = ssnd = None
    comp = b"NONE"
    for fourcc, start, size in _iff_chunks(b, 12, len(b)):
        if fourcc == b"COMM" and size >= 18:
            comm = b[start : start + 18]
            if aifc and size >= 22:
                comp = b[start + 18 : start + 22]
        elif fourcc == b"SSND" and size >= 8:
            (off, _blk) = struct.unpack(">II", b[start : start + 8])
            ssnd = b[start + 8 + off : start + size]
    if comm is None or ssnd is None or comp not in _AIFC_COMPS:
        return None
    nch, nframes, bits = struct.unpack(">HIH", comm[:8])
    rate = _f80_to_float(comm[8:18])
    if nch <= 0 or rate <= 0 or bits not in (8, 16, 24, 32, 64):
        return None
    if comp == b"NONE" and bits == 64:
        return None
    if comp == b"sowt" and bits != 16:
        return None
    if comp in (b"fl32", b"FL32") and bits != 32:
        return None
    if comp in (b"fl64", b"FL64") and bits != 64:
        return None
    return int(round(rate)), nch, bits // 8, nframes, ssnd, comp


def _aiff_meta(b: bytes) -> Optional[tuple[int, int, int]]:
    p = _aiff_parse(b)
    if p is None:
        return None
    _rate, nch, sw, nframes, _d, _comp = p
    return nch, sw * 8, nframes


def _aiff_pcm(b: bytes):
    """AIFF: big-endian signed PCM (8/16/24/32-bit); AIFF-C (r14):
    sowt (little-endian 16-bit) and fl32/fl64 (big-endian float)."""
    import numpy as np

    p = _aiff_parse(b)
    if p is None:
        return None
    rate, nch, sw, _nf, raw, comp = p
    raw = raw[: (len(raw) // sw) * sw]
    if comp == b"sowt":
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        n = (len(x) // nch) * nch
        return rate, nch, x[:n].reshape(-1, nch).mean(axis=1)
    if comp in (b"fl32", b"FL32"):
        x = np.frombuffer(raw, dtype=">f4").astype(np.float64)
        n = (len(x) // nch) * nch
        return rate, nch, x[:n].reshape(-1, nch).mean(axis=1)
    if comp in (b"fl64", b"FL64"):
        x = np.frombuffer(raw, dtype=">f8").copy()
        n = (len(x) // nch) * nch
        return rate, nch, x[:n].reshape(-1, nch).mean(axis=1)
    if sw == 1:
        x = np.frombuffer(raw, dtype=np.int8).astype(np.float64) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, dtype=">i2").astype(np.float64) / 32768.0
    elif sw == 3:
        a = np.frombuffer(raw, dtype=np.uint8)
        a = a[: (len(a) // 3) * 3].reshape(-1, 3)
        v = (
            (a[:, 0].astype(np.int32) << 16)
            | (a[:, 1].astype(np.int32) << 8)
            | a[:, 2].astype(np.int32)
        )
        v = (v ^ 0x800000) - 0x800000
        x = v.astype(np.float64) / 8388608.0
    else:
        x = np.frombuffer(raw, dtype=">i4").astype(np.float64) / 2147483648.0
    n = (len(x) // nch) * nch
    return rate, nch, x[:n].reshape(-1, nch).mean(axis=1)


def _au_parse(b: bytes):
    """(rate, nch, encoding, payload) for Sun/NeXT .snd, or None."""
    if len(b) < 24 or b[:4] != b".snd":
        return None
    off, size, enc, rate, nch = struct.unpack(">IIIII", b[4:24])
    if off < 24 or nch <= 0 or rate <= 0:
        return None
    end = len(b) if size in (0, 0xFFFFFFFF) else min(len(b), off + size)
    return int(rate), int(nch), int(enc), b[off:end]


_MULAW_BIAS = 0x84


def _mulaw_decode_table():
    """256-entry mu-law -> linear16 table (G.711)."""
    tbl = []
    for u in range(256):
        u = ~u & 0xFF
        sign = u & 0x80
        exp = (u >> 4) & 0x07
        mant = u & 0x0F
        mag = ((mant << 3) + _MULAW_BIAS) << exp
        mag -= _MULAW_BIAS
        tbl.append(-mag if sign else mag)
    return tbl


def _au_meta(b: bytes) -> Optional[tuple[int, int, int]]:
    p = _au_parse(b)
    if p is None:
        return None
    _rate, nch, enc, raw = p
    widths = {1: 1, 2: 1, 3: 2, 4: 3, 5: 4, 6: 4, 7: 8}
    if enc not in widths:
        return None
    sw = widths[enc]
    return nch, (8 if enc == 1 else sw * 8), len(raw) // (sw * nch)


def _au_pcm(b: bytes):
    """AU/.snd: mu-law (enc 1), big-endian linear PCM (enc 2-5) and
    big-endian IEEE float (enc 6-7, r14)."""
    import numpy as np

    p = _au_parse(b)
    if p is None:
        return None
    rate, nch, enc, raw = p
    if enc == 1:  # G.711 mu-law
        tbl = np.array(_mulaw_decode_table(), dtype=np.float64)
        x = tbl[np.frombuffer(raw, dtype=np.uint8)] / 32768.0
    elif enc == 2:
        x = np.frombuffer(raw, dtype=np.int8).astype(np.float64) / 128.0
    elif enc == 3:
        x = np.frombuffer(raw[: (len(raw) // 2) * 2], dtype=">i2").astype(
            np.float64) / 32768.0
    elif enc == 4:
        a = np.frombuffer(raw, dtype=np.uint8)
        a = a[: (len(a) // 3) * 3].reshape(-1, 3)
        v = (
            (a[:, 0].astype(np.int32) << 16)
            | (a[:, 1].astype(np.int32) << 8)
            | a[:, 2].astype(np.int32)
        )
        v = (v ^ 0x800000) - 0x800000
        x = v.astype(np.float64) / 8388608.0
    elif enc == 5:
        x = np.frombuffer(raw[: (len(raw) // 4) * 4], dtype=">i4").astype(
            np.float64) / 2147483648.0
    elif enc == 6:  # r14: IEEE float32, big-endian
        x = np.frombuffer(
            raw[: (len(raw) // 4) * 4], dtype=">f4").astype(np.float64)
    elif enc == 7:  # r14: IEEE float64, big-endian
        x = np.frombuffer(raw[: (len(raw) // 8) * 8], dtype=">f8").copy()
    else:
        return None
    n = (len(x) // nch) * nch
    return rate, nch, x[:n].reshape(-1, nch).mean(axis=1)


#: MPEG audio bitrate tables, kbps, index 1..14 (ISO/IEC 11172-3 /
#: 13818-3): key = (version_group, layer) where version_group is 1 for
#: MPEG1 and 2 for MPEG2/2.5 (which share tables), layer in 1..3
_MP3_BITRATES = {
    (1, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448),
    (1, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
             384),
    (1, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320),
    (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224,
             256),
    (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}

#: sample-rate tables by header version bits (3=MPEG1, 2=MPEG2,
#: 0=MPEG2.5), indexed by the 2-bit sample-rate field
_MP3_RATES = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}


def _mp3_frame_header(b: bytes, pos: int):
    """Parse one MPEG audio frame header at ``pos``. Returns
    ``(version_bits, layer, rate, n_channels, samples_per_frame,
    frame_bytes)`` or None. Free-format (bitrate index 0) returns None —
    the frame length is undefined without decoding, so accounting would
    be a guess."""
    if pos + 4 > len(b):
        return None
    b1, b2, b3 = b[pos + 1], b[pos + 2], b[pos + 3]
    if b[pos] != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    ver = (b1 >> 3) & 3          # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer_bits = (b1 >> 1) & 3   # 3=Layer I, 2=Layer II, 1=Layer III
    if ver == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits       # -> 1/2/3
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 3
    pad = (b2 >> 1) & 1
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    vgroup = 1 if ver == 3 else 2
    kbps = _MP3_BITRATES[(vgroup, layer)][br_idx - 1]
    rate = _MP3_RATES[ver][sr_idx]
    mode = (b3 >> 6) & 3
    nch = 1 if mode == 3 else 2
    if layer == 1:
        spf = 384
        flen = (12 * kbps * 1000 // rate + pad) * 4
    else:
        spf = 1152 if (layer == 2 or ver == 3) else 576
        flen = spf // 8 * kbps * 1000 // rate + pad
    if flen < 4:
        return None
    return ver, layer, rate, nch, spf, flen


def _mp3_meta(b: bytes):
    """Header-only ``(sample_rate, n_channels, n_mpeg_frames,
    n_samples)`` for MPEG audio (MP3 and Layer I/II siblings, r14) by
    walking the frame-header chain — the dominant lossy web-audio
    container joins the metadata-without-decode tier: duration comes
    from frame accounting (each frame carries its own bitrate index, so
    VBR streams account exactly), no audio is synthesized. Skips a
    leading ID3v2 tag (syncsafe size) and stops at an ID3v1 ``TAG``
    trailer. A candidate first sync must be CONFIRMED by the next frame
    landing on another same-parameter header (or end-of-stream) before
    it is trusted — arbitrary bytes contain 0xFFEx runs. None when no
    confirmed frame chain exists."""
    b = b or b""
    pos = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        size = ((b[6] & 0x7F) << 21 | (b[7] & 0x7F) << 14
                | (b[8] & 0x7F) << 7 | (b[9] & 0x7F))
        pos = 10 + size
    n = len(b)
    lock = None
    frames = samples = 0
    rate = nch = None
    scan_limit = pos + 4096  # first sync must appear near the start
    while pos + 4 <= n:
        hdr = _mp3_frame_header(b, pos)
        if hdr is None or (lock is not None and
                           (hdr[0], hdr[1], hdr[2]) != lock):
            if lock is None:
                pos += 1
                if pos > scan_limit:
                    return None
                continue
            break  # desync after a valid chain: stop accounting
        ver, layer, r, ch, spf, flen = hdr
        if lock is None:
            nxt = pos + flen
            at_end = nxt >= n or b[nxt:nxt + 3] == b"TAG"
            nh = _mp3_frame_header(b, nxt)
            if not at_end and (
                nh is None or (nh[0], nh[1], nh[2]) != (ver, layer, r)
            ):
                pos += 1  # unconfirmed sync: keep scanning
                if pos > scan_limit:
                    return None
                continue
            lock = (ver, layer, r)
            rate, nch = r, ch
        if pos + flen > n:
            break  # truncated final frame: don't count it
        frames += 1
        samples += spf
        pos += flen
        if b[pos:pos + 3] == b"TAG":
            break
    if frames == 0:
        return None
    return rate, nch, frames, samples


def _mp3_encode_meta(
    frame_specs,
    endian_pad: int = 0,
    id3v2: int = 0,
    id3v1: bool = False,
) -> bytes:
    """Minimal MPEG-audio writer for the deterministic METADATA fixture:
    a chain of valid frame headers with zero'd payloads (no audio is
    synthesized — exactly the surface :func:`_mp3_meta` parses).
    ``frame_specs`` is a list of ``(ver, layer, br_idx, sr_idx, pad,
    mode)`` tuples so VBR chains (per-frame bitrate) are expressible.
    ``id3v2`` prepends a tag of that payload size; ``id3v1`` appends
    the 128-byte TAG trailer."""
    out = bytearray()
    if id3v2:
        out += b"ID3\x04\x00\x00" + bytes((
            (id3v2 >> 21) & 0x7F, (id3v2 >> 14) & 0x7F,
            (id3v2 >> 7) & 0x7F, id3v2 & 0x7F)) + b"\x00" * id3v2
    for ver, layer, br_idx, sr_idx, pad, mode in frame_specs:
        layer_bits = 4 - layer
        h = bytes((
            0xFF,
            0xE0 | (ver << 3) | (layer_bits << 1) | 1,
            (br_idx << 4) | (sr_idx << 2) | (pad << 1),
            mode << 6,
        ))
        parsed = _mp3_frame_header(h + b"\x00" * 4, 0)
        assert parsed is not None, (ver, layer, br_idx, sr_idx)
        flen = parsed[5]
        out += h + b"\x00" * (flen - 4)
    if id3v1:
        out += b"TAG" + b"\x00" * 125
    return bytes(out)


def real_mp3_asset_rows(n: int = 16) -> list:
    """Driver-side rows of the MP3 metadata fixture (r14): deterministic
    frame chains cycling the walker's axes — MPEG1/2/2.5, Layer I/II/III,
    all three rates per version, mono/stereo, CBR and per-frame-varying
    VBR, padding bits, ID3v2 prefixes and ID3v1 trailers. Pure function
    of ``n``."""
    rows = []
    for i in range(n):
        ver = (3, 2, 0)[i % 3]
        layer = (3, 3, 2, 3, 1)[i % 5]
        sr_idx = i % 3
        mode = 3 if i % 2 == 0 else 0
        n_frames = 3 + i % 5
        specs = []
        for f in range(n_frames):
            br_idx = 1 + ((i * 3 + f * (i % 4)) % 14)  # VBR when i%4 != 0
            specs.append((ver, layer, br_idx, sr_idx, (i + f) % 2, mode))
        content = _mp3_encode_meta(
            specs, id3v2=(0 if i % 3 else 37 + i), id3v1=(i % 4 == 1))
        rows.append((i, "audio", bytearray(content),
                     '{"src":"fixture-mp3"}'))
    return rows


def make_real_mp3_assets(spark, n: int = 16) -> DataFrame:
    """Deterministic MP3 metadata fixture (:func:`real_mp3_asset_rows`)."""
    return spark.createDataFrame(real_mp3_asset_rows(n), ASSET_SCHEMA)


# --------------------------------------------------------------------- Ogg
# Ogg container metadata (r14, RFC 3533): page walk with CRC verify,
# Vorbis/Opus identification headers, duration from the audio stream's
# last granule position. Header/metadata tier only — no sample synthesis
# (audio_features keeps its honest raise for Ogg payloads).

_OGG_CRC_TABLE = None


def _ogg_crc(data: bytes) -> int:
    """Ogg page CRC-32 (RFC 3533 §6: poly 0x04c11db7, non-reflected,
    init 0, no final xor — NOT zlib's crc32)."""
    global _OGG_CRC_TABLE
    if _OGG_CRC_TABLE is None:
        tbl = []
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
            tbl.append(r & 0xFFFFFFFF)
        _OGG_CRC_TABLE = tbl
    crc = 0
    tbl = _OGG_CRC_TABLE
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ tbl[((crc >> 24) & 0xFF) ^ byte]
    return crc


def _ogg_pages(b: bytes):
    """Yield ``(header_type, granule, serial, payload)`` per CRC-valid
    page; stops at the first malformed or CRC-failing page (truncated
    trailing bytes are ignored, matching tolerant demuxers)."""
    pos = 0
    n = len(b)
    while pos + 27 <= n:
        if b[pos:pos + 4] != b"OggS" or b[pos + 4] != 0:
            return
        htype = b[pos + 5]
        granule = struct.unpack_from("<q", b, pos + 6)[0]
        serial = struct.unpack_from("<I", b, pos + 14)[0]
        crc = struct.unpack_from("<I", b, pos + 22)[0]
        nseg = b[pos + 26]
        seg_end = pos + 27 + nseg
        if seg_end > n:
            return
        body_len = sum(b[pos + 27:seg_end])
        end = seg_end + body_len
        if end > n:
            return
        page = bytearray(b[pos:end])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            return
        yield htype, granule, serial, bytes(b[seg_end:end])
        pos = end


def _ogg_page_at(b: bytes, pos: int):
    """Parse + CRC-verify the single page at ``pos``; returns
    (header_type, granule, serial) or None."""
    n = len(b)
    if pos + 27 > n or b[pos:pos + 4] != b"OggS" or b[pos + 4] != 0:
        return None
    nseg = b[pos + 26]
    seg_end = pos + 27 + nseg
    if seg_end > n:
        return None
    end = seg_end + sum(b[pos + 27:seg_end])
    if end > n:
        return None
    crc = struct.unpack_from("<I", b, pos + 22)[0]
    page = bytearray(b[pos:end])
    page[22:26] = b"\x00\x00\x00\x00"
    if _ogg_crc(bytes(page)) != crc:
        return None
    return (b[pos + 5], struct.unpack_from("<q", b, pos + 6)[0],
            struct.unpack_from("<I", b, pos + 14)[0])


def _ogg_meta(b: bytes):
    """``(container, rate, nch, n_samples, pre_skip)`` for an Ogg stream
    carrying Vorbis or Opus — or None. The FIRST audio BOS stream wins
    (multiplexed files: other serials are skipped). Vorbis: rate and
    channels from the ``\\x01vorbis`` id header, samples = the stream's
    last non-(-1) granule. Opus: channels and pre-skip from ``OpusHead``;
    the granule clock is ALWAYS 48 kHz regardless of the input rate, and
    pre-skip samples are decoder priming, subtracted from the playable
    count (RFC 7845 §4-5).

    Cost is header-tier by construction, like the MP3 walk: the forward
    page walk stops once the BOS section ends (BOS pages come first,
    RFC 3533 §6), and the duration granule comes from a BACKWARD scan —
    the last CRC-valid page of the audio serial — exactly how
    opusfile/liboggz seek-to-end for duration. The page CRC (a Python
    byte loop, ~6 MB/s) therefore runs over the head and tail pages
    only, never the asset body."""
    b = b or b""
    if b[:4] != b"OggS":
        return None
    audio_serial = None
    container = rate = nch = None
    pre_skip = 0
    last_granule = None
    for htype, granule, serial, payload in _ogg_pages(b):
        if htype & 0x02:  # BOS
            if audio_serial is not None:
                continue
            if payload[:7] == b"\x01vorbis" and len(payload) >= 30:
                nch = payload[11]
                rate = struct.unpack_from("<I", payload, 12)[0]
                if nch == 0 or rate == 0:
                    return None
                container, audio_serial = "ogg-vorbis", serial
            elif payload[:8] == b"OpusHead" and len(payload) >= 19:
                nch = payload[9]
                pre_skip = struct.unpack_from("<H", payload, 10)[0]
                if nch == 0:
                    return None
                # granule positions count 48 kHz samples whatever the
                # original input rate was
                container, audio_serial, rate = "ogg-opus", serial, 48000
            elif payload[:5] == b"\x7fFLAC" and len(payload) >= 51:
                # FLAC-in-Ogg mapping (r15; xiph ogg_mapping: the BOS
                # packet is 0x7F "FLAC" + major/minor + header-packet
                # count (BE16) + the native "fLaC" stream head) — the
                # STREAMINFO parse is the same one native FLAC uses;
                # the granule clock is the native sample rate
                info = _flac._parse_streaminfo(bytes(payload[9:]))
                if info is None:
                    return None
                rate, nch = info[0], info[1]
                if nch == 0 or rate == 0:
                    return None
                container, audio_serial = "ogg-flac", serial
            continue
        # first non-BOS page: the BOS section is over — record its
        # granule as the floor and leave the rest to the tail scan
        if serial == audio_serial and granule != -1:
            last_granule = granule
        break
    if audio_serial is None:
        return None
    pos = len(b)
    while True:
        pos = b.rfind(b"OggS", 0, pos)
        if pos < 0:
            break
        page = _ogg_page_at(b, pos)
        if page is not None:
            _ht, granule, serial = page
            if serial == audio_serial and granule != -1:
                last_granule = granule
                break
        if pos == 0:
            break
    samples = max(0, (last_granule or 0) - pre_skip)
    return container, rate, nch, samples, pre_skip


def _ogg_page(htype: int, granule: int, serial: int, seq: int,
              payload: bytes) -> bytes:
    """One CRC-stamped Ogg page; payloads >255·255 span max-lacing
    segments (255-valued lacing bytes with a terminating short one)."""
    segs = []
    i = 0
    while True:
        seg = payload[i:i + 255]
        segs.append(len(seg))
        i += 255
        if len(seg) < 255:
            break
    if len(segs) > 255:
        raise ValueError("payload exceeds one page (255 lacing segments)")
    head = (b"OggS\x00" + bytes((htype,))
            + struct.pack("<qII", granule, serial, seq)
            + b"\x00\x00\x00\x00" + bytes((len(segs),)) + bytes(segs))
    page = bytearray(head + payload)
    struct.pack_into("<I", page, 22, _ogg_crc(bytes(page)))
    return bytes(page)


def _ogg_encode_meta(
    codec: str,
    rate: int,
    nch: int,
    granules,
    serial: int = 0x5E01,
    pre_skip: int = 0,
    prepend_stream: Optional[bytes] = None,
) -> bytes:
    """Minimal Ogg writer for the deterministic METADATA fixture: a BOS
    page carrying the Vorbis/Opus id header, one comment/junk page, then
    one audio page per entry of ``granules`` (ascending granule
    positions; last page gets EOS). ``prepend_stream`` interleaves a
    foreign BOS page first, exercising the multiplexed-skip path. No
    audio is synthesized — exactly the surface :func:`_ogg_meta`
    parses."""
    if codec == "vorbis":
        ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes((nch,))
                 + struct.pack("<Iiii", rate, 0, 0, 0) + b"\xb8\x01")
    elif codec == "opus":
        ident = (b"OpusHead\x01" + bytes((nch,))
                 + struct.pack("<H", pre_skip)
                 + struct.pack("<I", rate) + b"\x00\x00\x00")
    elif codec == "flac":
        # FLAC-in-Ogg BOS packet (r15): 0x7F "FLAC" + mapping version
        # 1.0 + header-packet count + the native fLaC STREAMINFO head.
        # STREAMINFO bit layout (flac._parse_streaminfo reads it back):
        # minblk(16) maxblk(16) minfrm(24) maxfrm(24) rate(20) nch-1(3)
        # bits-1(5) total(36) md5(128)
        total = granules[-1] if granules else 0
        packed = ((rate << 44) | ((nch - 1) << 41) | ((16 - 1) << 36)
                  | (total & ((1 << 36) - 1)))
        body = (struct.pack(">HH", 4096, 4096) + b"\x00" * 6
                + struct.pack(">Q", packed) + b"\x00" * 16)
        ident = (b"\x7fFLAC\x01\x00" + struct.pack(">H", 0)
                 + b"fLaC" + bytes((0x80,)) + b"\x00\x00\x22" + body)
    else:
        raise ValueError(codec)
    out = bytearray()
    if prepend_stream is not None:
        out += _ogg_page(0x02, 0, 0x7EEF, 0, prepend_stream)
    out += _ogg_page(0x02, 0, serial, 0, ident)
    out += _ogg_page(0x00, -1, serial, 1,
                     b"\x03junkcomment" + b"\x00" * 300)
    for k, g in enumerate(granules):
        htype = 0x04 if k == len(granules) - 1 else 0x00
        out += _ogg_page(htype, g, serial, 2 + k, b"\x00" * (40 + 7 * k))
    return bytes(out)


# ----------------------------------------------------------------- ISO-BMFF
# ISO base-media (r14, ISO/IEC 14496-12): one tolerant box walk feeding
# three planner tiers — MP4 video (tkhd dims + stsz frame count), M4A
# audio (mdhd timescale/duration + mp4a channel count) and AVIF stills
# (meta/iprp/ipco/ispe). Metadata only — the sample bitstreams (H.26x,
# AAC, AV1) need real codecs and keep their honest raises.


def _bmff_boxes(b: bytes, pos: int, end: int):
    """Yield ``(fourcc, body_start, body_end)`` for the child boxes of
    ``b[pos:end]``; stops at the first malformed size (truncated or
    non-monotonic), never throws."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", b, pos)
        fourcc = b[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", b, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            return
        yield fourcc, body, pos + size
        pos += size


def _bmff_find(b: bytes, pos: int, end: int, fourcc: bytes):
    for fc, s, e in _bmff_boxes(b, pos, end):
        if fc == fourcc:
            return s, e
    return None


def _bmff_is(b: bytes, brands: tuple) -> bool:
    """True when the payload starts with an ftyp whose major or any
    compatible brand is in ``brands``."""
    for fc, s, e in _bmff_boxes(b, 0, len(b)):
        if fc != b"ftyp":
            return False
        listed = [b[i:i + 4] for i in range(s, e - 3, 4)]
        # major brand, then (skipping minor_version) the compatibles
        cands = listed[:1] + listed[2:]
        return any(c in brands for c in cands)
    return False


_MP4_VIDEO_BRANDS = (b"isom", b"iso2", b"mp41", b"mp42", b"avc1",
                     b"qt  ", b"M4V ", b"dash")
_M4A_BRANDS = (b"M4A ", b"mp42", b"isom", b"iso2", b"mp41")
_AVIF_BRANDS = (b"avif", b"avis", b"heic", b"heix", b"mif1")


def _mp4_tracks(b: bytes):
    """Yield ``(handler, tkhd_w, tkhd_h, timescale, duration, n_samples,
    stsd_body)`` per trak of the first moov."""
    moov = _bmff_find(b, 0, len(b), b"moov")
    if moov is None:
        return
    for fc, s, e in _bmff_boxes(b, *moov):
        if fc != b"trak":
            continue
        handler = w = h = timescale = duration = n_samples = None
        stsd = None
        tk = _bmff_find(b, s, e, b"tkhd")
        if tk is not None:
            ts_, te = tk
            # fixed 16.16 width/height are the LAST 8 body bytes
            if te - ts_ >= 8:
                w = struct.unpack_from(">I", b, te - 8)[0] >> 16
                h = struct.unpack_from(">I", b, te - 4)[0] >> 16
        mdia = _bmff_find(b, s, e, b"mdia")
        if mdia is None:
            continue
        md = _bmff_find(b, *mdia, b"mdhd")
        if md is not None:
            ms, me = md
            # an EMPTY FullBox at the buffer end has ms == len(b):
            # reading the version byte unguarded was an IndexError on
            # crafted input (r16 BMFF fuzz)
            ver = b[ms] if me > ms else -1
            if ver == 1 and me - ms >= 32:
                timescale = struct.unpack_from(">I", b, ms + 20)[0]
                duration = struct.unpack_from(">Q", b, ms + 24)[0]
            elif ver == 0 and me - ms >= 24:
                timescale = struct.unpack_from(">I", b, ms + 12)[0]
                duration = struct.unpack_from(">I", b, ms + 16)[0]
        hd = _bmff_find(b, *mdia, b"hdlr")
        if hd is not None:
            hs, he = hd
            if he - hs >= 12:
                handler = b[hs + 8:hs + 12]
        minf = _bmff_find(b, *mdia, b"minf")
        if minf is not None:
            stbl = _bmff_find(b, *minf, b"stbl")
            if stbl is not None:
                sz = _bmff_find(b, *stbl, b"stsz")
                if sz is not None:
                    zs, ze = sz
                    if ze - zs >= 12:
                        n_samples = struct.unpack_from(">I", b, zs + 8)[0]
                sd = _bmff_find(b, *stbl, b"stsd")
                if sd is not None:
                    stsd = sd
        yield handler, w, h, timescale, duration, n_samples, stsd


def _mp4_meta(b: bytes) -> Optional[tuple[int, int, int]]:
    """Header-only (width, height, n_frames) for MP4/MOV video: tkhd
    display dims + stsz sample count of the first ``vide`` track."""
    b = b or b""
    if not _bmff_is(b, _MP4_VIDEO_BRANDS + _M4A_BRANDS):
        return None
    for handler, w, h, _ts, _dur, n_samples, _sd in _mp4_tracks(b):
        if handler == b"vide" and w and h:
            return int(w), int(h), max(1, int(n_samples or 1))
    return None


def _m4a_meta(b: bytes):
    """``(container, rate, nch, n_samples)`` for the first ``soun``
    track of an ISO-BMFF audio file (M4A/AAC or any mp4-contained
    audio): mdhd timescale is the sample clock, mdhd duration the
    per-channel sample count, channels from the mp4a/AudioSampleEntry
    in stsd. Metadata only — no AAC decode."""
    b = b or b""
    if not _bmff_is(b, _M4A_BRANDS + _MP4_VIDEO_BRANDS):
        return None
    for handler, _w, _h, ts, dur, _n, stsd in _mp4_tracks(b):
        if handler != b"soun" or not ts:
            continue
        nch = None
        if stsd is not None:
            ss, se = stsd
            for fc, es, ee in _bmff_boxes(b, ss + 8, se):
                # AudioSampleEntry: 8 (SampleEntry) + 8 reserved, then
                # channelcount(2) at +16 (ISO 14496-12 §12.2.3)
                if ee - es >= 18:
                    nch = struct.unpack_from(">H", b, es + 16)[0]
                    break
        return "m4a", int(ts), int(nch or 0), int(dur or 0)
    return None


def _avif_meta(b: bytes) -> Optional[tuple[int, int, int]]:
    """Header-only (width, height, n_frames) for AVIF/HEIC stills: the
    ispe property inside meta/iprp/ipco. Sequences (``avis``) report
    the moov video track's sample count like MP4."""
    b = b or b""
    if not _bmff_is(b, _AVIF_BRANDS):
        return None
    meta = _bmff_find(b, 0, len(b), b"meta")
    if meta is None:
        return None
    # meta is a FullBox: 4 bytes version/flags before its children
    iprp = _bmff_find(b, meta[0] + 4, meta[1], b"iprp")
    if iprp is None:
        return None
    ipco = _bmff_find(b, *iprp, b"ipco")
    if ipco is None:
        return None
    isp = _bmff_find(b, *ipco, b"ispe")
    if isp is None:
        return None
    s, e = isp
    if e - s < 12:
        return None
    w, h = struct.unpack_from(">II", b, s + 4)
    if w == 0 or h == 0:
        return None
    n_frames = 1
    for handler, _w, _h, _ts, _dur, n_samples, _sd in _mp4_tracks(b):
        if handler == b"pict" and n_samples:
            n_frames = int(n_samples)
    return int(w), int(h), max(1, n_frames)


def _bmff_box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _mp4_encode_meta(
    tracks,
    brand: bytes = b"isom",
    largesize_moov: bool = False,
) -> bytes:
    """Minimal ISO-BMFF writer for the deterministic METADATA fixture.
    ``tracks`` is a list of dicts with ``handler`` (b"vide"/b"soun"/
    b"pict"), optional ``w``/``h``, ``timescale``, ``duration``,
    ``n_samples``, ``nch``, ``mdhd_v1``. No sample bitstream is written
    — exactly the surface the _mp4/_m4a walkers parse."""
    ftyp = _bmff_box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"isom")
    traks = b""
    for t in tracks:
        w, h = t.get("w", 0), t.get("h", 0)
        tkhd = _bmff_box(
            b"tkhd", b"\x00\x00\x00\x07" + b"\x00" * 72
            + struct.pack(">II", w << 16, h << 16))
        if t.get("mdhd_v1"):
            mdhd = _bmff_box(
                b"mdhd", b"\x01\x00\x00\x00" + b"\x00" * 16
                + struct.pack(">IQ", t.get("timescale", 0),
                              t.get("duration", 0)) + b"\x00" * 4)
        else:
            mdhd = _bmff_box(
                b"mdhd", b"\x00\x00\x00\x00" + b"\x00" * 8
                + struct.pack(">II", t.get("timescale", 0),
                              t.get("duration", 0)) + b"\x00" * 4)
        hdlr = _bmff_box(
            b"hdlr", b"\x00\x00\x00\x00" + b"\x00" * 4 + t["handler"]
            + b"\x00" * 12 + b"fixture\x00")
        entry_fc = b"mp4a" if t["handler"] == b"soun" else b"avc1"
        sample_entry = _bmff_box(
            entry_fc, b"\x00" * 16
            + struct.pack(">HH", t.get("nch", 0), 16) + b"\x00" * 8)
        stsd = _bmff_box(
            b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + sample_entry)
        stsz = _bmff_box(
            b"stsz", b"\x00" * 4
            + struct.pack(">II", 0, t.get("n_samples", 0)))
        stbl = _bmff_box(b"stbl", stsd + stsz)
        minf = _bmff_box(b"minf", stbl)
        mdia = _bmff_box(b"mdia", mdhd + hdlr + minf)
        traks += _bmff_box(b"trak", tkhd + mdia)
    mvhd = _bmff_box(b"mvhd", b"\x00" * 100)
    moov_body = mvhd + traks
    if largesize_moov:
        moov = (struct.pack(">I", 1) + b"moov"
                + struct.pack(">Q", 16 + len(moov_body)) + moov_body)
    else:
        moov = _bmff_box(b"moov", moov_body)
    mdat = _bmff_box(b"mdat", b"\x00" * 32)
    return ftyp + moov + mdat


def _avif_encode_meta(
    w: int,
    h: int,
    brand: bytes = b"avif",
    n_frames: int = 0,
) -> bytes:
    """Minimal AVIF/HEIC metadata writer: ftyp + meta(iprp(ipco(ispe)));
    ``n_frames`` > 0 adds an ``avis``-style moov pict track."""
    ftyp = _bmff_box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mif1")
    ispe = _bmff_box(b"ispe", b"\x00" * 4 + struct.pack(">II", w, h))
    meta = _bmff_box(
        b"meta", b"\x00" * 4
        + _bmff_box(b"iprp", _bmff_box(b"ipco", ispe)))
    out = ftyp + meta
    if n_frames:
        out += _mp4_encode_meta(
            [{"handler": b"pict", "timescale": 30, "duration": n_frames,
              "n_samples": n_frames}],
            brand=brand)[len(ftyp):]  # moov+mdat only, keep ONE ftyp
    return out


def real_isobmff_asset_rows(n: int = 16) -> list:
    """Driver-side rows of the ISO-BMFF metadata fixture (r14), cycling
    all three planner tiers the shared box walk feeds: MP4 video (tkhd
    dims + stsz frame count, some with a second audio track, some with
    a 64-bit largesize moov), M4A audio (mdhd v0/v1, mono/stereo,
    several sample clocks) and AVIF/HEIC stills (ispe; animated avis
    legs with pict-track frame counts). Pure function of ``n``."""
    rows = []
    for i in range(n):
        kind = i % 3
        if kind == 0:
            w, h = 320 + 16 * i, 180 + 9 * i
            tracks = [{"handler": b"vide", "w": w, "h": h,
                       "timescale": 24 + i, "duration": 240 + 24 * i,
                       "n_samples": 48 + 7 * i}]
            if i % 6 == 3:
                tracks.append({"handler": b"soun", "timescale": 44100,
                               "duration": 44100 * (1 + i), "nch": 2,
                               "mdhd_v1": True})
            content = _mp4_encode_meta(
                tracks, brand=(b"isom", b"mp42", b"qt  ")[i % 9 // 3],
                largesize_moov=(i % 6 == 0))
            media = "video"
        elif kind == 1:
            content = _mp4_encode_meta(
                [{"handler": b"soun",
                  "timescale": (8000, 22050, 44100, 48000)[i % 4],
                  "duration": 1000 * (37 + 11 * i),
                  "n_samples": 40 + i, "nch": 1 + i % 2,
                  "mdhd_v1": i % 2 == 0}],
                brand=b"M4A ")
            media = "audio"
        else:
            content = _avif_encode_meta(
                40 + 13 * i, 30 + 7 * i,
                brand=(b"avif", b"heic", b"avis")[i % 9 // 3],
                n_frames=(6 + i) if i % 9 // 3 == 2 else 0)
            media = "image"
        rows.append((i, media, bytearray(content),
                     '{"src":"fixture-isobmff"}'))
    return rows


def make_real_isobmff_assets(spark, n: int = 16) -> DataFrame:
    """Deterministic ISO-BMFF fixture (:func:`real_isobmff_asset_rows`)."""
    return spark.createDataFrame(real_isobmff_asset_rows(n), ASSET_SCHEMA)


def real_ogg_asset_rows(n: int = 16) -> list:
    """Driver-side rows of the Ogg metadata fixture (r14): deterministic
    CRC-valid page chains cycling the walker's axes — Vorbis and Opus id
    headers, mono/stereo, several rates, multi-page granule ladders,
    Opus pre-skip, and multiplexed streams (a foreign BOS serial before
    the audio one). Pure function of ``n``."""
    rows = []
    for i in range(n):
        codec = "vorbis" if i % 2 == 0 else "opus"
        rate = (8000, 16000, 22050, 44100, 48000)[i % 5]
        nch = 1 + (i // 2) % 2
        n_pages = 1 + i % 4
        step = rate // 2 + i * 37
        granules = [step * (k + 1) for k in range(n_pages)]
        rows.append((
            i, "audio",
            bytearray(_ogg_encode_meta(
                codec, rate, nch, granules,
                serial=0x1000 + i,
                pre_skip=(312 + 13 * i) if codec == "opus" else 0,
                prepend_stream=(b"\x7ftheora-ish" + bytes((i % 256,))
                                if i % 3 == 0 else None),
            )),
            '{"src":"fixture-ogg"}',
        ))
    return rows


def make_real_ogg_assets(spark, n: int = 16) -> DataFrame:
    """Deterministic Ogg metadata fixture (:func:`real_ogg_asset_rows`)."""
    return spark.createDataFrame(real_ogg_asset_rows(n), ASSET_SCHEMA)


def real_oggflac_asset_rows(n: int = 16) -> list:
    """Driver-side rows of the FLAC-in-Ogg metadata fixture (r15):
    CRC-valid page chains whose BOS packet carries the 0x7F "FLAC"
    mapping header + native STREAMINFO — the one Ogg BOS kind the r14
    walker fell through to a raise on. Cycles rates, channel counts,
    multi-page granule ladders and the multiplexed-skip path, like the
    Vorbis/Opus fixture. Pure function of ``n``; kept separate from
    :func:`real_ogg_asset_rows` so its frozen literals never move."""
    rows = []
    for i in range(n):
        rate = (8000, 16000, 22050, 44100, 48000)[i % 5]
        nch = 1 + i % 2
        n_pages = 1 + i % 4
        step = rate // 2 + i * 53
        granules = [step * (k + 1) for k in range(n_pages)]
        rows.append((
            i, "audio",
            bytearray(_ogg_encode_meta(
                "flac", rate, nch, granules,
                serial=0x2000 + i,
                prepend_stream=(b"\x7ftheora-ish" + bytes((i % 256,))
                                if i % 3 == 0 else None),
            )),
            '{"src":"fixture-oggflac"}',
        ))
    return rows


def make_real_oggflac_assets(spark, n: int = 16) -> DataFrame:
    """Deterministic FLAC-in-Ogg fixture (:func:`real_oggflac_asset_rows`)."""
    return spark.createDataFrame(real_oggflac_asset_rows(n), ASSET_SCHEMA)


def _audio_meta_of(b: bytes):
    """``(container, sample_rate, n_channels, n_samples)`` for any
    header-parseable audio payload — the planner tier: everything a
    sampling/cost planner needs (duration = n_samples / rate) WITHOUT
    decoding samples. Covers the full decodable set (WAV PCM, IMA-ADPCM
    WAV, AIFF, AU, FLAC) plus MP3 and Ogg Vorbis/Opus/FLAC, which are
    metadata-only (no stdlib synthesis path — :func:`audio_features`
    keeps its honest raise). None when the container is unrecognized."""
    b = b or b""
    import io
    import wave

    # decide float/extensible WAV HERE, before the stdlib wave parse:
    # Python >= 3.12's wave module accepts WAVE_FORMAT_EXTENSIBLE, so
    # the stdlib-first order would label extensible int16 WAVs "wav" or
    # "wav-ext" depending on interpreter version. _wav_ext_meta returns
    # None for plain integer PCM, which falls through to stdlib below.
    p = _wav_ext_meta(b)
    if p is not None:
        container, rate, nch, _bits, nf = p
        return container, rate, nch, nf
    try:
        with wave.open(io.BytesIO(b), "rb") as w:
            return ("wav", w.getframerate(), w.getnchannels(),
                    w.getnframes())
    except Exception:
        pass
    p = _wav_ima_parse(b)
    if p is not None:
        rate, nch, _ba, _spb, nf, _data = p
        return "wav-ima", rate, nch, nf
    p = _aiff_parse(b)
    if p is not None:
        rate, nch, _sw, nf, _d, comp = p
        return ("aiff" if comp == b"NONE" else "aifc"), int(rate), nch, nf
    p = _au_parse(b)
    if p is not None:
        rate, nch, enc, raw = p
        widths = {1: 1, 2: 1, 3: 2, 4: 3, 5: 4, 6: 4, 7: 8}
        if enc in widths:
            sw = widths[enc]
            return "au", rate, nch, len(raw) // (sw * nch)
    info = _flac._parse_streaminfo(b)
    if info is not None:
        rate, nch, _bits, total, _off = info
        return "flac", rate, nch, total
    m = _mp3_meta(b)
    if m is not None:
        rate, nch, _frames, samples = m
        return "mp3", rate, nch, samples
    m = _ogg_meta(b)
    if m is not None:
        container, rate, nch, samples, _pre = m
        return container, rate, nch, samples
    m = _m4a_meta(b)
    if m is not None:
        return m
    return None


def audio_meta(assets: DataFrame, fake: bool = False) -> DataFrame:
    """Header-only audio metadata over ``mapInPandas`` (r14): the
    sampling-planner tier of the audio pipeline — container, sample
    rate, channel count, per-channel sample count and duration for every
    audio asset, WITHOUT decoding samples (one header parse per asset,
    so planning a 100 TB audio corpus costs header bytes, not decode
    CPU). MP3 joins here even though it has no stdlib decode path.
    Unrecognized audio payloads raise, like :func:`decode_assets`."""
    assets = assets.filter(F.col("media_type") == "audio").select(
        "asset_id", "content")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            metas = []
            for c in pdf["content"]:
                b = bytes(c) if c is not None else b""
                if fake:
                    m = ("fake", 16000, 1, 16000)
                else:
                    m = _audio_meta_of(b)
                if m is None:
                    raise NotImplementedError(
                        "audio metadata supports WAV (PCM + IMA-ADPCM), "
                        "AIFF, AU, FLAC, MPEG audio (MP3), Ogg "
                        "(Vorbis/Opus/FLAC) and M4A containers"
                    )
                metas.append(m)
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "n_bytes": pdf["content"].map(
                    lambda x: len(x) if x is not None else 0),
                "sha256": pdf["content"].map(
                    lambda x: hashlib.sha256(x or b"").hexdigest()),
                "container": [m[0] for m in metas],
                "sample_rate": [m[1] for m in metas],
                "n_channels": [m[2] for m in metas],
                "n_samples": [m[3] for m in metas],
                "duration_s": [
                    round(m[3] / m[1], 6) if m[1] else 0.0 for m in metas],
            })

    return assets.mapInPandas(
        batches,
        schema=(
            "asset_id long, n_bytes long, sha256 string, container string,"
            " sample_rate int, n_channels int, n_samples long,"
            " duration_s double"
        ),
    )


def _audio_pcm(b: bytes):
    """(rate, nch, mono float64) for any stdlib-decodable audio container:
    WAV, AIFF (BE PCM), AU (.snd — mu-law + linear) or FLAC (r13, full
    decode via the stdlib Rice/LPC codec). None otherwise."""
    dec = _wav_pcm(b)
    if dec is None:
        dec = _wav_ima_pcm(b or b"")
    if dec is None:
        dec = _wav_ext_pcm(b or b"")
    if dec is None:
        dec = _aiff_pcm(b or b"")
    if dec is None:
        dec = _au_pcm(b or b"")
    if dec is None:
        dec = _flac.pcm(b or b"")
    return dec


def _audio_fingerprint_of(x, rate: int) -> Optional[int]:
    """64-bit spectral fingerprint — dHash's idea applied to audio: an
    8-time-slice x 9-log-band energy grid, bit = band louder than its
    higher neighbor. Robust to bit depth, channel count, gain and
    re-encoding (the transforms that defeat byte-exact audio dedup);
    pair with ``dedup.hamming_dupes`` like the image dHash."""
    import numpy as np

    if len(x) < 16:
        return None
    t_slices, n_bands = 8, 9
    edges = np.geomspace(50.0, max(100.0, rate / 2.0), n_bands + 1)
    bits = 0
    seg = len(x) / t_slices
    for t in range(t_slices):
        sl = x[int(t * seg) : max(int((t + 1) * seg), int(t * seg) + 2)]
        mag = np.abs(np.fft.rfft(sl))
        freqs = np.fft.rfftfreq(len(sl), d=1.0 / rate)
        idx = np.searchsorted(edges, freqs)
        energies = np.zeros(n_bands, dtype=np.float64)
        for bnd in range(n_bands):
            m = idx == bnd + 1
            if m.any():
                energies[bnd] = float(np.sqrt(np.mean(mag[m] ** 2)))
        # normalize per slice and clamp the quantization-noise floor:
        # comparisons between two near-silent bands flip with bit depth
        # (the noise differs), so bands under 5% of the slice peak are
        # treated as equal — bits come from tonal structure only (5%
        # measured to absorb 8-bit WAV's offset+rounding noise: pair
        # Hamming <=2 on the re-encode fixture, was 5 at a 2% floor)
        peak = float(energies.max())
        if peak > 0:
            energies = np.maximum(energies / peak, 0.05)
        for bnd in range(n_bands - 1):
            bits = (bits << 1) | (1 if energies[bnd] > energies[bnd + 1] else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def audio_features(assets: DataFrame, fake: bool = False) -> DataFrame:
    """Per-asset audio DSP features over WAV / AIFF / AU payloads
    (r12b adds the AIFF big-endian-PCM and Sun .snd mu-law+linear
    containers): RMS level,
    zero-crossing rate, spectral centroid (Hz) and the 64-bit spectral
    fingerprint — the audio analogue of decode/dhash for images. Floats
    are rounded to 6dp in the kernel so the frozen-digest oracle is
    bit-stable. Non-audio rows drop (an image operator would drop video
    the same way); empty/undecodable audio keeps the row with NULL
    features. Arrow-batched ``mapInPandas``, O(samples) numpy per asset,
    no shuffle."""
    import numpy as np

    audio = assets.filter(F.col("media_type") == "audio").select(
        "asset_id", "content"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            rows = []
            for a, c in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(c or b"")
                if fake:
                    hsh = hashlib.sha256(b).digest()
                    rows.append((
                        a, 8000, 1 + hsh[0] % 2, 64 + hsh[1],
                        round(hsh[2] / 255.0, 6), round(hsh[3] / 255.0, 6),
                        round(20.0 + hsh[4] * 15.0, 6),
                        int.from_bytes(hsh[8:16], "big", signed=True),
                    ))
                    continue
                dec = _audio_pcm(b)
                if dec is None:
                    rows.append((a, None, None, None, None, None, None, None))
                    continue
                rate, nch, x = dec
                ns = int(len(x))
                if ns == 0:
                    rows.append((a, rate, nch, 0, None, None, None, None))
                    continue
                rms = float(np.sqrt(np.mean(x * x)))
                zc = (
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    if ns > 1 else 0.0
                )
                mag = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(ns, d=1.0 / rate)
                tot = float(mag.sum())
                cent = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
                rows.append((
                    a, rate, nch, ns,
                    round(rms, 6), round(zc, 6), round(cent, 6),
                    _audio_fingerprint_of(x, rate),
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "sample_rate", "n_channels", "n_samples",
                    "rms", "zcr", "centroid_hz", "fingerprint",
                ],
            )

    return audio.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


FRAME_DHASH_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_index", IntegerType()),
        StructField("dhash", LongType()),
    ]
)


def frame_dhashes(assets: DataFrame, fake: bool = False) -> DataFrame:
    """Per-FRAME perceptual dHash for video/animation assets: one row per
    frame of every decodable asset (animated GIF/APNG, Y4M, MJPEG-AVI;
    stills emit their single frame). Each asset decodes ONCE per Arrow
    batch — the per-frame work is O(pixels), and the output is a narrow
    (asset_id, n_frames, frame_index, dhash) frame, so everything
    downstream (key-frame selection, near-dup frame joins) is pure
    Catalyst over longs. Undecodable payloads emit no rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            out_rows = []
            for a, c in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(c or b"")
                if fake:
                    h0 = int.from_bytes(
                        hashlib.sha256(b).digest()[:8], "big", signed=True)
                    nf = 1 + hashlib.sha256(b).digest()[8] % 4
                    for i in range(nf):
                        out_rows.append((a, nf, i, h0 + i))
                    continue
                dec = None
                ch = 4
                if b[:6] in (b"GIF87a", b"GIF89a"):
                    dec = _gif_decode_frames(b)
                elif b.startswith(_PNG_SIG):
                    dec = _apng_decode_frames(b)
                    if dec is None:
                        p = _png_decode_pixels(b)
                        if p is not None:
                            dec = (p[0], p[1], [bytes(p[3])])
                            ch = p[2]
                elif b.startswith(_Y4M_MAGIC):
                    dec = _y4m_decode_frames(b)
                    ch = 3
                elif b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    dec = _avi.decode_frames(b)
                    ch = 3
                elif b[:4] == b"RIFF" and b[8:12] == b"WEBP":
                    # r15: animated WebP with VP8L frames; still WebPs
                    # fall through to the single-pixel decode below
                    # (r16: including lossy VP8 key frames)
                    dec = _webp_decode_frames(b)
                    if dec is None:
                        p = _vp8l.decode(b)
                        if p is None:
                            p = _webp_lossy_pixels(b)
                        if p is not None:
                            dec = (p[0], p[1], [bytes(p[3])])
                elif b[:2] == b"\xff\xd8":
                    p = _decode_any_pixels(b)
                    if p is not None:
                        dec = (p[0], p[1], [bytes(p[3])])
                        ch = p[2]
                if dec is None:
                    continue
                w, h, frames = dec
                nf = len(frames)
                for i, fr in enumerate(frames):
                    u = _dhash_of_pixels(w, h, ch, bytearray(fr), 8)
                    out_rows.append(
                        (a, nf, i, u - (1 << 64) if u >= (1 << 63) else u))
            yield pd.DataFrame(
                out_rows,
                columns=["asset_id", "n_frames", "frame_index", "dhash"],
            )

    src = assets.select("asset_id", "content")
    return src.mapInPandas(batches, FRAME_DHASH_SCHEMA)


def keyframes(fdh: DataFrame, k: int = 3) -> DataFrame:
    """Scene-change key-frame selection over a :func:`frame_dhashes`
    frame, entirely in Catalyst: each frame's novelty is the Hamming
    distance of its dHash to the PREVIOUS frame (lag window); frame 0
    scores the maximum 64 (a scene start by definition — which also
    makes the selection a single top-k, no special case). The k frames
    with the largest novelty win, ties to the earliest frame. One
    window shuffle on asset_id — the pixels never re-enter the picture.
    Output: (asset_id, n_frames, frame_index, novelty)."""
    from pyspark.sql import Window

    w_ord = Window.partitionBy("asset_id").orderBy("frame_index")
    with_d = fdh.withColumn(
        "novelty",
        F.when(F.col("frame_index") == 0, F.lit(64)).otherwise(
            F.bit_count(
                F.col("dhash").bitwiseXOR(F.lag("dhash").over(w_ord))
            )
        ).cast("int"),
    )
    w_rank = Window.partitionBy("asset_id").orderBy(
        F.col("novelty").desc(), F.col("frame_index").asc()
    )
    return (
        with_d.withColumn("__rk", F.row_number().over(w_rank))
        .filter(F.col("__rk") <= k)
        .select("asset_id", "n_frames", "frame_index", "novelty")
    )
