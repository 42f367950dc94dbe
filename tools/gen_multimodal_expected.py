"""Generate the FROZEN expected-digest literals for the three multimodal
contract entries (multimodal_decode / multimodal_resize /
image_dhash_dupes) from the deterministic real-codec fixture
(`multimodal.real_asset_rows`), WITHOUT a SparkSession.

The printed block is pasted into `__spark_entry__.py` ONCE and committed
— the oracle compares the live Spark pipeline (mapInPandas /
mapInArrow, real stdlib codecs) against these frozen values, so a
kernel regression fails the contract instead of silently updating the
oracle (the `ann_lsh_topk` literal-hyperplane trick, applied to binary
kernels). Regenerate ONLY after an intended kernel/fixture change:

    python tools/gen_multimodal_expected.py

NOTE: the resize digests are the stdlib-PNG-codec outputs, and the
contract entry FORCES that kernel (`resize_images(codec="stdlib")`), so
an environment gaining Pillow cannot shift the frozen digests — Pillow
resize stays the `codec="auto"` default for library callers.

NOTE: PNG bytes embed `zlib.compress` output, so the source-asset and
resized-output sha256 digests are additionally pinned to the zlib
build's compressed byte stream (stable in practice across CPython
releases, but a zlib algorithm change would shift them). The dHash and
decode width/height/n_frames literals are pixel-level and immune. If a
digest-only mismatch ever appears after an environment change,
regenerate and diff: pixel-literal changes mean a REAL kernel
regression; sha-only changes mean the compressor moved.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seqspark.pipeline.multimodal import (  # noqa: E402
    _apng_decode_frames,
    _y4m_decode_frames,
    _dhash_of_pixels,
    _gif_decode_frames,
    _png_decode_pixels,
    _png_encode,
    _real_decode,
    _stdlib_png_resize,
    _decode_any_pixels,
    real_apng_asset_rows,
    real_asset_rows,
    real_gif_asset_rows,
    real_jpeg_asset_rows,
    real_mjpeg_asset_rows,
    real_y4m_asset_rows,
)
from seqspark.pipeline import avi as _avi  # noqa: E402

N_DECODE = 64
N_DHASH = 48
N_GIF = 16
GIF_SAMPLES = 3
RESIZE_W, RESIZE_H = 32, 16


def main() -> None:
    rows = real_asset_rows(N_DECODE)

    decode = []
    for i, media, content, _meta in rows:
        b = bytes(content)
        w, h, nf = _real_decode(media, b)
        decode.append(
            (i, media, len(b), hashlib.sha256(b).hexdigest(), w, h, nf)
        )

    resize = []
    for i, media, content, _meta in rows:
        if media != "image":
            continue  # resize_images(on_other='drop') default
        out = _stdlib_png_resize(bytes(content), RESIZE_W, RESIZE_H)
        assert out is not None, f"asset {i} not stdlib-resizable"
        resize.append(
            (i, hashlib.sha256(out).hexdigest(), len(out), RESIZE_W, RESIZE_H)
        )

    dhash = []
    for i, media, content, _meta in real_asset_rows(N_DHASH):
        if media != "image":
            dhash.append((i, None))
            continue
        dec = _png_decode_pixels(bytes(content))
        assert dec is not None, f"asset {i} not stdlib-decodable"
        w, h, ch, px = dec
        u = _dhash_of_pixels(w, h, ch, px, 8)
        dhash.append((i, u - (1 << 64) if u >= (1 << 63) else u))

    print("#: frozen expected outputs of the real-codec multimodal kernels")
    print("#: over make_real_assets — generated ONCE by")
    print("#: tools/gen_multimodal_expected.py and committed; the oracle")
    print("#: compares the live Spark pipeline against these, so a kernel")
    print("#: regression fails the contract instead of moving the oracle.")
    print("MULTIMODAL_DECODE_EXPECTED = [")
    for r in decode:
        print(f"    {r!r},")
    print("]")
    print()
    print("MULTIMODAL_RESIZE_EXPECTED = [")
    for r in resize:
        print(f"    {r!r},")
    print("]")
    print()
    print("#: (asset_id, dhash) — audio rows carry None (dhash_images")
    print("#: hashes non-decodable payloads to NULL, and NULLs never pair)")
    print("IMAGE_DHASH_EXPECTED = [")
    for r in dhash:
        print(f"    {r!r},")
    print("]")

    # r12: animated-GIF frame extraction — per selected frame, the sha256
    # of the RGBA PNG re-encode of the composited canvas. The SELECTION
    # mirrors sample_frames' Catalyst expression exactly: distinct
    # floor(i*n_frames/k) for i in 0..k-1, k = min(GIF_SAMPLES, n_frames).
    gif = []
    for i, media, content, _meta in real_gif_asset_rows(N_GIF):
        w, h, frames = _gif_decode_frames(bytes(content))
        nf = len(frames)
        k = min(GIF_SAMPLES, nf)
        idxs = sorted({(j * nf) // k for j in range(k)})
        for fi in idxs:
            png = _png_encode(w, h, 4, bytearray(frames[fi]))
            gif.append((i, nf, fi, hashlib.sha256(png).hexdigest()))
    print()
    print("#: (asset_id, n_frames, frame_index, sha256 of the RGBA PNG")
    print("#: re-encode of the composited canvas) over real_gif_asset_rows")
    print("FRAME_SAMPLE_GIF_EXPECTED = [")
    for r in gif:
        print(f"    {r!r},")
    print("]")

    apng = []
    for i, media, content, _meta in real_apng_asset_rows(N_GIF):
        w, h, frames = _apng_decode_frames(bytes(content))
        nf = len(frames)
        k = min(GIF_SAMPLES, nf)
        idxs = sorted({(j * nf) // k for j in range(k)})
        for fi in idxs:
            png = _png_encode(w, h, 4, bytearray(frames[fi]))
            apng.append((i, nf, fi, hashlib.sha256(png).hexdigest()))
    print()
    print("#: same shape over real_apng_asset_rows (stdlib APNG extractor)")
    print("FRAME_SAMPLE_APNG_EXPECTED = [")
    for r in apng:
        print(f"    {r!r},")
    print("]")

    y4m = []
    for i, media, content, _meta in real_y4m_asset_rows(N_GIF):
        w, h, frames = _y4m_decode_frames(bytes(content))
        nf = len(frames)
        k = min(GIF_SAMPLES, nf)
        idxs = sorted({(j * nf) // k for j in range(k)})
        for fi in idxs:
            png = _png_encode(w, h, 3, bytearray(frames[fi]))
            y4m.append((i, nf, fi, hashlib.sha256(png).hexdigest()))
    print()
    print("#: same shape over real_y4m_asset_rows (stdlib Y4M video")
    print("#: decoder; frames are RGB PNG re-encodes)")
    print("FRAME_SAMPLE_Y4M_EXPECTED = [")
    for r in y4m:
        print(f"    {r!r},")
    print("]")

    # r12b: baseline-JPEG pixels (Huffman + vectorized IDCT) — resize
    # digests and perceptual dHashes over the JPEG fixture, frozen like
    # the PNG set; a JPEG kernel regression fails the contract.
    jres = []
    jdh = []
    for i, media, content, _meta in real_jpeg_asset_rows(16):
        b = bytes(content)
        out = _stdlib_png_resize(b, RESIZE_W, RESIZE_H)
        assert out is not None, f"jpeg asset {i} not stdlib-resizable"
        jres.append(
            (i, hashlib.sha256(out).hexdigest(), len(out), RESIZE_W, RESIZE_H)
        )
        dec = _decode_any_pixels(b)
        assert dec is not None, f"jpeg asset {i} not stdlib-decodable"
        w, h, ch, px = dec
        u = _dhash_of_pixels(w, h, ch, px, 8)
        jdh.append((i, u - (1 << 64) if u >= (1 << 63) else u))
    print()
    print("#: (asset_id, sha256, n_bytes, w, h) of the stdlib resize of")
    print("#: each baseline-JPEG fixture asset (r12b JPEG decoder)")
    print("JPEG_RESIZE_EXPECTED = [")
    for r in jres:
        print(f"    {r!r},")
    print("]")
    print()
    print("#: (asset_id, dhash) over real_jpeg_asset_rows")
    print("IMAGE_DHASH_JPEG_EXPECTED = [")
    for r in jdh:
        print(f"    {r!r},")
    print("]")

    # r12b: MJPEG-AVI frame extraction — one compressed video container
    # decodes for real now (per-frame baseline JPEGs inside RIFF).
    mj = []
    for i, media, content, _meta in real_mjpeg_asset_rows(12):
        w, h, frames = _avi.decode_frames(bytes(content))
        nf = len(frames)
        k = min(GIF_SAMPLES, nf)
        idxs = sorted({(j * nf) // k for j in range(k)})
        for fi in idxs:
            png = _png_encode(w, h, 3, bytearray(frames[fi]))
            mj.append((i, nf, fi, hashlib.sha256(png).hexdigest()))
    print()
    print("#: same shape over real_mjpeg_asset_rows (MJPEG-in-AVI: the")
    print("#: r12b compressed-video path; frames are RGB PNG re-encodes)")
    print("FRAME_SAMPLE_MJPEG_EXPECTED = [")
    for r in mj:
        print(f"    {r!r},")
    print("]")

    # r12b: audio DSP features over the WAV rows of the mixed fixture —
    # RMS / zero-crossing rate / spectral centroid (rounded to 6dp in
    # the kernel) + the 64-bit spectral fingerprint.
    from seqspark.pipeline.multimodal import (  # noqa: E402
        _audio_fingerprint_of, _wav_pcm)
    import numpy as _np  # noqa: E402

    au = []
    for i, media, content, _meta in real_asset_rows(N_DECODE):
        if media != "audio":
            continue
        rate, nch, x = _wav_pcm(bytes(content))
        ns = int(len(x))
        rms = round(float(_np.sqrt(_np.mean(x * x))), 6)
        zc = round(
            float(_np.mean(_np.signbit(x[1:]) != _np.signbit(x[:-1]))), 6
        )
        mag = _np.abs(_np.fft.rfft(x))
        freqs = _np.fft.rfftfreq(ns, d=1.0 / rate)
        tot = float(mag.sum())
        cent = round(float((freqs * mag).sum() / tot) if tot > 0 else 0.0, 6)
        au.append((i, rate, nch, ns, rms, zc, cent,
                   _audio_fingerprint_of(x, rate)))
    print()
    print("#: (asset_id, sample_rate, n_channels, n_samples, rms, zcr,")
    print("#: centroid_hz, fingerprint) over real_asset_rows' WAV rows")
    print("AUDIO_FEATURES_EXPECTED = [")
    for r in au:
        print(f"    {r!r},")
    print("]")

    # r13: FLAC fixture — the SAME feature kernel over the stdlib FLAC
    # decoder's PCM (fixture encoder: FIXED+Rice, mid/side every third
    # stereo asset), so a decoder regression anywhere in the Rice / LPC /
    # stereo-reconstruction path flips a frozen literal.
    from seqspark.pipeline import flac as _flac  # noqa: E402
    from seqspark.pipeline.multimodal import real_flac_asset_rows  # noqa: E402

    fl = []
    for i, media, content, _meta in real_flac_asset_rows(16):
        rate, nch, x = _flac.pcm(bytes(content))
        ns = int(len(x))
        rms = round(float(_np.sqrt(_np.mean(x * x))), 6)
        zc = round(
            float(_np.mean(_np.signbit(x[1:]) != _np.signbit(x[:-1]))), 6
        )
        mag = _np.abs(_np.fft.rfft(x))
        freqs = _np.fft.rfftfreq(ns, d=1.0 / rate)
        tot = float(mag.sum())
        cent = round(float((freqs * mag).sum() / tot) if tot > 0 else 0.0, 6)
        fl.append((i, rate, nch, ns, rms, zc, cent,
                   _audio_fingerprint_of(x, rate)))
    print()
    print("#: (asset_id, sample_rate, n_channels, n_samples, rms, zcr,")
    print("#: centroid_hz, fingerprint) over real_flac_asset_rows (r13)")
    print("AUDIO_FEATURES_FLAC_EXPECTED = [")
    for r in fl:
        print(f"    {r!r},")
    print("]")

    # r14: float/extensible WAV fixture — SAME signals as the FLAC
    # fixture through the float32/float64/EXTENSIBLE decoder, so the
    # float-vs-lossless feature drift is frozen and inspectable
    from seqspark.pipeline.multimodal import (  # noqa: E402
        _wav_ext_pcm, real_wavext_asset_rows)

    wx = []
    for i, media, content, _meta in real_wavext_asset_rows(16):
        rate, nch, x = _wav_ext_pcm(bytes(content))
        ns = int(len(x))
        rms = round(float(_np.sqrt(_np.mean(x * x))), 6)
        zc = round(
            float(_np.mean(_np.signbit(x[1:]) != _np.signbit(x[:-1]))), 6
        )
        mag = _np.abs(_np.fft.rfft(x))
        freqs = _np.fft.rfftfreq(ns, d=1.0 / rate)
        tot = float(mag.sum())
        cent = round(float((freqs * mag).sum() / tot) if tot > 0 else 0.0, 6)
        wx.append((i, rate, nch, ns, rms, zc, cent,
                   _audio_fingerprint_of(x, rate)))
    print()
    print("#: (asset_id, sample_rate, n_channels, n_samples, rms, zcr,")
    print("#: centroid_hz, fingerprint) over real_wavext_asset_rows (r14)")
    print("AUDIO_FEATURES_WAVEXT_EXPECTED = [")
    for r in wx:
        print(f"    {r!r},")
    print("]")

    # r13: BMP fixture — decode meta + perceptual dHash via the stdlib
    # BMP decoder (row padding, bottom-up normalization, BGR->RGB all on
    # the pinned path)
    from seqspark.pipeline.multimodal import real_bmp_asset_rows  # noqa: E402

    bm = []
    for i, media, content, _meta in real_bmp_asset_rows(16):
        b = bytes(content)
        w, h, nf = _real_decode("image", b)
        dec = _decode_any_pixels(b)
        u = _dhash_of_pixels(dec[0], dec[1], dec[2], dec[3], 8)
        bm.append((i, len(b), hashlib.sha256(b).hexdigest(), w, h, nf,
                   u - (1 << 64) if u >= (1 << 63) else u))
    print()
    print("#: (asset_id, n_bytes, sha256, width, height, n_frames, dhash)")
    print("#: over real_bmp_asset_rows (r13)")
    print("MULTIMODAL_BMP_EXPECTED = [")
    for r in bm:
        print(f"    {r!r},")
    print("]")

    # r13: TIFF metadata fixture — header-only IFD walk (both byte
    # orders, multi-page chains)
    from seqspark.pipeline.multimodal import real_tiff_asset_rows  # noqa: E402

    tf = []
    for i, media, content, _meta in real_tiff_asset_rows(16):
        b = bytes(content)
        w, h, nf = _real_decode("image", b)
        tf.append((i, len(b), hashlib.sha256(b).hexdigest(), w, h, nf))
    print()
    print("#: (asset_id, n_bytes, sha256, width, height, n_frames)")
    print("#: over real_tiff_asset_rows (r13, header-only)")
    print("MULTIMODAL_TIFF_EXPECTED = [")
    for r in tf:
        print(f"    {r!r},")
    print("]")

    # r14: ISO-BMFF metadata fixture — MP4 video (tkhd/stsz), M4A audio
    # (mdhd clock + mp4a channels) and AVIF/HEIC stills (ispe), all
    # through the shared box walk
    from seqspark.pipeline.multimodal import real_isobmff_asset_rows  # noqa: E402

    bm = []
    for i, media, content, _meta in real_isobmff_asset_rows(16):
        b = bytes(content)
        w, h, nf = _real_decode(media, b)
        bm.append((i, len(b), hashlib.sha256(b).hexdigest(), media, w, h, nf))
    print()
    print("#: (asset_id, n_bytes, sha256, media_type, width, height,")
    print("#: n_frames) over real_isobmff_asset_rows (r14, header-only)")
    print("MULTIMODAL_ISOBMFF_EXPECTED = [")
    for r in bm:
        print(f"    {r!r},")
    print("]")

    # r14: BMP RLE fixture — decode meta + perceptual dHash through the
    # BI_RLE8/BI_RLE4 decoder (runs, absolute mode, EOL/EOB)
    from seqspark.pipeline.multimodal import real_bmp_rle_asset_rows  # noqa: E402

    br = []
    for i, media, content, _meta in real_bmp_rle_asset_rows(12):
        b = bytes(content)
        w, h, nf = _real_decode("image", b)
        dec = _decode_any_pixels(b)
        u = _dhash_of_pixels(dec[0], dec[1], dec[2], dec[3], 8)
        br.append((i, len(b), hashlib.sha256(b).hexdigest(), w, h, nf,
                   u - (1 << 64) if u >= (1 << 63) else u))
    print()
    print("#: (asset_id, n_bytes, sha256, width, height, n_frames, dhash)")
    print("#: over real_bmp_rle_asset_rows (r14, BI_RLE8/4 decode)")
    print("MULTIMODAL_BMP_RLE_EXPECTED = [")
    for r in br:
        print(f"    {r!r},")
    print("]")

    # r14: WebP metadata fixture — header-only RIFF walk (VP8 lossy,
    # VP8L lossless, VP8X extended/animated with ANMF counts)
    from seqspark.pipeline.multimodal import real_webp_asset_rows  # noqa: E402

    wp = []
    for i, media, content, _meta in real_webp_asset_rows(16):
        b = bytes(content)
        w, h, nf = _real_decode("image", b)
        wp.append((i, len(b), hashlib.sha256(b).hexdigest(), w, h, nf))
    print()
    print("#: (asset_id, n_bytes, sha256, width, height, n_frames)")
    print("#: over real_webp_asset_rows (r14, header-only)")
    print("MULTIMODAL_WEBP_EXPECTED = [")
    for r in wp:
        print(f"    {r!r},")
    print("]")

    # r14: TIFF PIXEL fixture — decode meta + perceptual dHash through
    # the stdlib strip decoder (none/PackBits, both byte orders, gray
    # (both photometrics)/RGB/RGBA, multi-strip reassembly all pinned)
    from seqspark.pipeline.multimodal import (  # noqa: E402
        real_tiff_pixel_asset_rows)

    tp = []
    for i, media, content, _meta in real_tiff_pixel_asset_rows(16):
        b = bytes(content)
        w, h, nf = _real_decode("image", b)
        dec = _decode_any_pixels(b)
        u = _dhash_of_pixels(dec[0], dec[1], dec[2], dec[3], 8)
        tp.append((i, len(b), hashlib.sha256(b).hexdigest(), w, h, nf,
                   u - (1 << 64) if u >= (1 << 63) else u))
    print()
    print("#: (asset_id, n_bytes, sha256, width, height, n_frames, dhash)")
    print("#: over real_tiff_pixel_asset_rows (r14, strip raster decode)")
    print("MULTIMODAL_TIFF_PX_EXPECTED = [")
    for r in tp:
        print(f"    {r!r},")
    print("]")

    # r15: WebP-lossless PIXEL fixture — decode meta + perceptual dHash
    # through the pure-Python VP8L codec (literal prefix codes,
    # subtract-green legs, RGBA alpha legs)
    from seqspark.pipeline.multimodal import (  # noqa: E402
        real_webp_pixel_asset_rows)

    wp = []
    for i, media, content, _meta in real_webp_pixel_asset_rows(16):
        b = bytes(content)
        w, h, nf = _real_decode("image", b)
        dec = _decode_any_pixels(b)
        u = _dhash_of_pixels(dec[0], dec[1], dec[2], dec[3], 8)
        wp.append((i, len(b), hashlib.sha256(b).hexdigest(), w, h, nf,
                   u - (1 << 64) if u >= (1 << 63) else u))
    print()
    print("#: (asset_id, n_bytes, sha256, width, height, n_frames, dhash)")
    print("#: over real_webp_pixel_asset_rows (r15, VP8L raster decode)")
    print("MULTIMODAL_WEBP_PX_EXPECTED = [")
    for r in wp:
        print(f"    {r!r},")
    print("]")

    # r16: lossy-WebP PIXEL fixture — decode meta + perceptual dHash
    # through the pure-Python VP8 key-frame decoder (ALPH alpha legs,
    # simple/none/sharp loop-filter legs, multi-partition leg)
    from seqspark.pipeline.multimodal import (  # noqa: E402
        real_webp_lossy_asset_rows)

    wl = []
    for i, media, content, _meta in real_webp_lossy_asset_rows(8):
        b = bytes(content)
        w, h, nf = _real_decode("image", b)
        dec = _decode_any_pixels(b)
        u = _dhash_of_pixels(dec[0], dec[1], dec[2], dec[3], 8)
        wl.append((i, len(b), hashlib.sha256(b).hexdigest(), w, h, nf,
                   u - (1 << 64) if u >= (1 << 63) else u))
    print()
    print("#: (asset_id, n_bytes, sha256, width, height, n_frames, dhash)")
    print("#: over real_webp_lossy_asset_rows (r16, VP8 key-frame decode)")
    print("MULTIMODAL_WEBP_LOSSY_EXPECTED = [")
    for r in wl:
        print(f"    {r!r},")
    print("]")

    # r15: animated-WebP fixture — full-canvas frame dHashes through
    # the ANMF composer (offsets, both disposal and blending modes)
    from seqspark.pipeline.multimodal import (  # noqa: E402
        _webp_decode_frames, real_webp_anim_asset_rows)

    wa = []
    for i, media, content, _meta in real_webp_anim_asset_rows(8):
        b = bytes(content)
        w, h, frames = _webp_decode_frames(b)
        for f, fr in enumerate(frames):
            u = _dhash_of_pixels(w, h, 4, bytearray(fr), 8)
            wa.append((i, len(frames), f,
                       u - (1 << 64) if u >= (1 << 63) else u))
    print()
    print("#: (asset_id, n_frames, frame_index, dhash) over")
    print("#: real_webp_anim_asset_rows (r15, ANMF/VP8L animation)")
    print("FRAME_SAMPLE_WEBP_EXPECTED = [")
    for r in wa:
        print(f"    {r!r},")
    print("]")

    # r14: MP3 metadata fixture — the audio_meta planner tier over the
    # frame-header walker (versions, layers, VBR accounting, ID3 tags)
    from seqspark.pipeline.multimodal import (  # noqa: E402
        _audio_meta_of, real_mp3_asset_rows)

    mp = []
    for i, media, content, _meta in real_mp3_asset_rows(16):
        b = bytes(content)
        cont, rate, nch, ns = _audio_meta_of(b)
        mp.append((i, len(b), hashlib.sha256(b).hexdigest(), cont, rate,
                   nch, ns, round(ns / rate, 6)))
    print()
    print("#: (asset_id, n_bytes, sha256, container, sample_rate,")
    print("#: n_channels, n_samples, duration_s) over real_mp3_asset_rows")
    print("#: (r14, header-only frame accounting)")
    print("MULTIMODAL_MP3_EXPECTED = [")
    for r in mp:
        print(f"    {r!r},")
    print("]")

    # r14: Ogg metadata fixture — the audio_meta planner tier over the
    # RFC 3533 page walker (CRC verify, Vorbis/Opus id headers, granule
    # duration, Opus pre-skip, multiplexed-skip)
    from seqspark.pipeline.multimodal import real_ogg_asset_rows  # noqa: E402

    og = []
    for i, media, content, _meta in real_ogg_asset_rows(16):
        b = bytes(content)
        cont, rate, nch, ns = _audio_meta_of(b)
        og.append((i, len(b), hashlib.sha256(b).hexdigest(), cont, rate,
                   nch, ns, round(ns / rate, 6)))
    print()
    print("#: (asset_id, n_bytes, sha256, container, sample_rate,")
    print("#: n_channels, n_samples, duration_s) over real_ogg_asset_rows")
    print("#: (r14, page-walk metadata)")
    print("MULTIMODAL_OGG_EXPECTED = [")
    for r in og:
        print(f"    {r!r},")
    print("]")

    # r15: FLAC-in-Ogg fixture — the same page walker with the 0x7F
    # "FLAC" BOS mapping (native STREAMINFO head, native-rate granules)
    from seqspark.pipeline.multimodal import real_oggflac_asset_rows  # noqa: E402

    ogf = []
    for i, media, content, _meta in real_oggflac_asset_rows(16):
        b = bytes(content)
        cont, rate, nch, ns = _audio_meta_of(b)
        ogf.append((i, len(b), hashlib.sha256(b).hexdigest(), cont, rate,
                    nch, ns, round(ns / rate, 6)))
    print()
    print("#: (asset_id, n_bytes, sha256, container, sample_rate,")
    print("#: n_channels, n_samples, duration_s) over")
    print("#: real_oggflac_asset_rows (r15, FLAC-in-Ogg mapping)")
    print("MULTIMODAL_OGGFLAC_EXPECTED = [")
    for r in ogf:
        print(f"    {r!r},")
    print("]")

    # r13: IMA-ADPCM fixture — the audio feature kernel over the ADPCM
    # decoder's PCM (same underlying signals as the FLAC fixture, so the
    # lossy-vs-lossless feature drift is itself frozen and inspectable)
    from seqspark.pipeline.multimodal import (  # noqa: E402
        _wav_ima_pcm, real_adpcm_asset_rows)

    ad = []
    for i, media, content, _meta in real_adpcm_asset_rows(16):
        rate, nch, x = _wav_ima_pcm(bytes(content))
        ns = int(len(x))
        rms = round(float(_np.sqrt(_np.mean(x * x))), 6)
        zc = round(
            float(_np.mean(_np.signbit(x[1:]) != _np.signbit(x[:-1]))), 6
        )
        mag = _np.abs(_np.fft.rfft(x))
        freqs = _np.fft.rfftfreq(ns, d=1.0 / rate)
        tot = float(mag.sum())
        cent = round(float((freqs * mag).sum() / tot) if tot > 0 else 0.0, 6)
        ad.append((i, rate, nch, ns, rms, zc, cent,
                   _audio_fingerprint_of(x, rate)))
    print()
    print("#: (asset_id, sample_rate, n_channels, n_samples, rms, zcr,")
    print("#: centroid_hz, fingerprint) over real_adpcm_asset_rows (r13)")
    print("AUDIO_FEATURES_ADPCM_EXPECTED = [")
    for r in ad:
        print(f"    {r!r},")
    print("]")

    # r12b: audio near-dup pair fixture — per-asset fingerprints frozen;
    # the oracle REPLAYS the banded-Hamming pair join brute-force in
    # DuckDB (pigeonhole banding is exact, so the sets must be equal).
    from seqspark.pipeline.multimodal import real_audio_pair_rows  # noqa: E402

    ap = []
    for i, media, content, _meta in real_audio_pair_rows(8):
        rate, _nch, x = _wav_pcm(bytes(content))
        ap.append((i, _audio_fingerprint_of(x, rate)))
    print()
    print("#: (asset_id, fingerprint) over real_audio_pair_rows: each")
    print("#: signal twice (16-bit PCM at id i, 8-bit re-encode at 1000+i)")
    print("AUDIO_PAIR_FP_EXPECTED = [")
    for r in ap:
        print(f"    {r!r},")
    print("]")


if __name__ == "__main__":
    main()
