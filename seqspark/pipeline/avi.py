"""Minimal MJPEG-in-AVI container codec (stdlib only).

With the baseline JPEG codec (``jpeg.py``) in place, one *compressed*
video container becomes honestly decodable without ffmpeg: Motion-JPEG
in AVI, where every frame is an independent baseline JPEG. This narrows
``sample_frames``' honest raise to inter-frame codecs (H.264/VP9/...),
which genuinely need a native decoder.

Scope: RIFF 'AVI ' with an 'avih' main header and one 'vids' stream of
'00dc'/'00db' chunks under the 'movi' LIST ('rec ' sub-lists are
walked); the optional 'idx1' index is ignored (frames are read in movi
order, which is the stream order for a single-stream file). The writer
emits the same minimal shape for deterministic fixtures.

Bomb-safe: frame count and per-frame pixel counts are capped before any
decode work, and a malformed container returns ``None`` — never throws.
"""

from __future__ import annotations

import struct
from typing import Optional

from . import jpeg

#: refuse containers advertising more frames than this (fixture-scale cap)
_MAX_FRAMES = 4096


def _chunks(b: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking RIFF chunks in
    b[pos:end]; chunks are word-aligned (odd sizes padded by one byte)."""
    while pos + 8 <= end:
        fourcc = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        start = pos + 8
        if start + size > end:
            return
        yield fourcc, start, size
        pos = start + size + (size & 1)


def _parse(b: bytes) -> Optional[tuple[int, int, list[tuple[int, int]]]]:
    """(width, height, [(frame_start, frame_size), ...]) or None."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    (riff_size,) = struct.unpack("<I", b[4:8])
    end = min(len(b), 8 + riff_size)
    width = height = None
    frames: list[tuple[int, int]] = []

    def walk(pos: int, stop: int) -> Optional[bool]:
        nonlocal width, height
        for fourcc, start, size in _chunks(b, pos, stop):
            if fourcc == b"LIST":
                if size < 4:
                    return None
                if walk(start + 4, start + size) is None:
                    return None
            elif fourcc == b"avih":
                if size < 40:
                    return None
                total, _init, _streams, _buf, w_, h_ = struct.unpack(
                    "<IIIIII", b[start + 16 : start + 40]
                )
                if total > _MAX_FRAMES:
                    return None
                width, height = int(w_), int(h_)
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                if len(frames) >= _MAX_FRAMES:
                    return None
                frames.append((start, size))
        return True

    if walk(12, end) is None:
        return None
    if width is None or not frames:
        return None
    return width, height, frames


def meta(b: bytes) -> Optional[tuple[int, int, int]]:
    """(width, height, n_frames) from the headers — no frame decode."""
    p = _parse(b or b"")
    if p is None:
        return None
    w, h, frames = p
    return w, h, len(frames)


def decode_frames(
    b: bytes, max_pixels: int = 64_000_000
) -> Optional[tuple[int, int, list[bytes]]]:
    """Decode every MJPEG frame to RGB. Returns (w, h, [rgb_bytes, ...])
    or None when the container or any frame is outside the baseline-JPEG
    subset. Frame dimensions are taken from the frames themselves (the
    avih values are advisory in the wild); all frames must agree."""
    p = _parse(b or b"")
    if p is None:
        return None
    _w, _h, spans = p
    out: list[bytes] = []
    fw = fh = None
    for start, size in spans:
        dec = jpeg.decode(b[start : start + size])
        if dec is None:
            return None
        w, h, _ch, px = dec
        if w * h > max_pixels:
            return None
        if fw is None:
            fw, fh = w, h
        elif (w, h) != (fw, fh):
            return None
        out.append(bytes(px))
    return fw, fh, out


def encode(
    w: int, h: int, jpeg_frames: list[bytes], fps: int = 10
) -> bytes:
    """Build a minimal single-stream MJPEG AVI around pre-encoded JPEG
    frames (the fixture writer — pair with ``jpeg.encode``)."""

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    n = len(jpeg_frames)
    max_bytes = max((len(f) for f in jpeg_frames), default=0)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(1, fps),  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX off, AVIF_WASCAPTUREFILE off; 0x10=HASINDEX... keep simple
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # reserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIII",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            max(1, fps),  # dwRate
            0,  # dwStart
            n,  # dwLength
            max_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality
            0,  # dwSampleSize
            0,  # rcFrame (packed as one u32 here: 2x u16 pairs) — minimal
        )
        + struct.pack("<I", 0)
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        struct.unpack("<I", b"MJPG")[0],  # biCompression
        w * h * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
