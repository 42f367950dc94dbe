"""Corpus-wide never-raise decode property (r17).

One harness for the whole decode surface instead of per-codec fuzzers:
this bug class (a malformed container field turning into a negative
count / out-of-range index deep in a decoder) escaped three times —
BMP RLE delta (r15), WebP ANMF dispose rect (r16 ADVICE), GIF
disposal-2 off-canvas clear (r16 judge, multimodal.py:1333) — and each
time the per-codec fuzzer existed but its SIBLING codec's twin was
missed. So: EVERY bytes-driven decoder entry point and metadata walker
across multimodal.py / vp8.py / vp8l.py / jpeg.py / flac.py / avi.py,
seeded with EVERY committed fixture corpus (`real_*_asset_rows`), under
a shared mutation battery — exhaustive/strided single-byte XOR flips,
truncations, cross-format splices, hypothesis-chosen edits, and pure
random bytes.

The contract under test is the decode contract the pipeline documents:
return a value or None, never raise. The only allowed exception is
``_real_decode``'s documented honest ``NotImplementedError`` for
genuinely undecodable media (inter-frame video) — wrapped to None here
so everything shares one drive loop.

Regression-proof: run against the pre-fix tree (commit 9cc8ffe), the
exhaustive-flip leg reproduces the r16-judge GIF crash — flipping a
disposal-2 frame descriptor's x-offset byte to 0xFF yields
``ValueError('negative count')`` out of ``_gif_decode_frames`` —
verified by checking out that tree and running this file against it.
"""
from __future__ import annotations

import functools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from seqspark.pipeline import avi, flac, jpeg
from seqspark.pipeline import multimodal as mm
from seqspark.pipeline import vp8, vp8l

# small caps keep a fuzz-mutated "giant" dimension from burning CPU on
# a legitimately-capped reconstruction; the cap path itself is contract
# (a capped decode returns None, never raises)
_CAP = 1 << 20


def _real(media_type: str):
    def f(b: bytes):
        try:
            return mm._real_decode(media_type, bytes(b))
        except NotImplementedError:
            return None  # the documented honest raise
    return f


ENTRIES = [
    # composite dispatchers
    ("decode_any_pixels", mm._decode_any_pixels),
    ("real_decode_image", _real("image")),
    ("real_decode_audio", _real("audio")),
    ("real_decode_video", _real("video")),
    # raster / animation decoders
    ("png_pixels", mm._png_decode_pixels),
    ("bmp_pixels", mm._bmp_decode_pixels),
    ("tiff_pixels", mm._tiff_decode_pixels),
    ("gif_frames", mm._gif_decode_frames),
    ("gif_count_frames", mm._gif_count_frames),
    ("apng_frames", mm._apng_decode_frames),
    ("webp_anim_frames", mm._webp_decode_frames),
    ("webp_lossy_pixels", mm._webp_lossy_pixels),
    ("y4m_frames", mm._y4m_decode_frames),
    ("vp8", lambda b: vp8.decode(b, max_pixels=_CAP)),
    ("vp8_yuv", lambda b: vp8.decode_yuv(b, max_pixels=_CAP)),
    ("vp8l", lambda b: vp8l.decode(b, max_pixels=_CAP)),
    ("jpeg_decode", jpeg.decode),
    ("avi_frames", lambda b: avi.decode_frames(b, max_pixels=_CAP)),
    ("flac_decode", flac.decode),
    # inner compression kernels (reachable with attacker-shaped input)
    ("alph_plane", lambda b: mm._alph_decode(b, 8, 8)),
    ("gif_lzw", lambda b: mm._lzw_decode(3, b, 1024)),
    ("packbits", lambda b: mm._packbits_decode(b, 256)),
    ("tiff_lzw", lambda b: mm._tiff_lzw_decode(b, 256)),
    # metadata walkers
    ("stdlib_image_meta", mm._stdlib_image_meta),
    ("webp_meta", mm._webp_meta),
    ("tiff_meta", mm._tiff_meta),
    ("jpeg_meta_fast", mm._jpeg_meta),
    ("jpeg_meta_full", jpeg.meta),
    ("jpeg_exif", jpeg.exif_orientation),
    ("y4m_meta", mm._y4m_meta),
    ("avi_meta", avi.meta),
    ("flac_meta", flac.meta),
    ("wav_ima_meta", mm._wav_ima_meta),
    ("wav_ext_meta", mm._wav_ext_meta),
    ("aiff_meta", mm._aiff_meta),
    ("au_meta", mm._au_meta),
    ("mp3_meta", mm._mp3_meta),
    ("ogg_meta", mm._ogg_meta),
    ("mp4_meta", mm._mp4_meta),
    ("m4a_meta", mm._m4a_meta),
    ("avif_meta", mm._avif_meta),
    ("audio_meta_of", mm._audio_meta_of),
]


def _drive(b: bytes) -> None:
    """Feed one byte string through every entry point; any exception is
    a contract violation."""
    for name, fn in ENTRIES:
        try:
            fn(b)
        except Exception as e:  # noqa: BLE001 - the assertion itself
            raise AssertionError(
                f"{name} raised {type(e).__name__}: {e!r} on a "
                f"{len(b)}-byte input ({b[:24].hex()}...)"
            ) from e


@functools.lru_cache(maxsize=1)
def _corpus() -> tuple:
    """(builder, bytes) seeds from every committed fixture corpus —
    4 assets per builder covers each builder's parameter cycling (GIF
    disposal k%4 needs >=3 frames, ADPCM/WAV flavor cycling, etc.)."""
    out = []
    for fn_name in sorted(
        n for n in dir(mm)
        if n.startswith("real_") and n.endswith("_rows")
    ):
        for row in getattr(mm, fn_name)(4)[:4]:
            out.append((fn_name, bytes(row[2])))
    return tuple(out)


def test_fixture_corpus_is_broad_and_decodes_clean():
    corpus = _corpus()
    assert len({b for _, b in corpus}) > 60  # every builder contributed
    for _, b in corpus:
        _drive(b)


def test_exhaustive_byte_flips_never_raise():
    """Every single-byte 0xFF flip of every small seed (exhaustive —
    this is the leg that reproduces the r16 GIF descriptor crash on the
    pre-fix tree), strided positions with two XOR patterns for larger
    seeds."""
    for _, seed in _corpus():
        n = len(seed)
        if n <= 400:
            positions = range(n)
            patterns = (0xFF,)
        else:
            positions = range(0, n, max(1, n // 48))
            patterns = (0xFF, 0x08)
        for pos in positions:
            for x in patterns:
                mut = bytearray(seed)
                mut[pos] ^= x
                _drive(bytes(mut))


def test_truncations_never_raise():
    for _, seed in _corpus():
        n = len(seed)
        for cut in range(0, n, max(1, n // 16)):
            _drive(seed[:cut])
        _drive(seed[1:])  # magic off-by-one


def test_cross_format_splices_never_raise():
    """Head of one format + tail of another: keeps valid magics and
    container headers while the inner payload is another codec's —
    the shape a corrupted object-store read produces."""
    corpus = _corpus()
    k = len(corpus)
    for i, (_, a) in enumerate(corpus):
        _, b = corpus[(i + 7) % k]
        for frac in (4, 2):
            _drive(a[: len(a) // frac] + b[len(b) // frac:])
            _drive(b[: len(b) // frac] + a[len(a) // frac:])


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large,
                                 HealthCheck.filter_too_much])
@given(st.data())
def test_hypothesis_fixture_mutations_never_raise(data):
    corpus = _corpus()
    seed = bytearray(corpus[data.draw(
        st.integers(0, len(corpus) - 1), label="seed")][1])
    for _ in range(data.draw(st.integers(1, 8), label="edits")):
        pos = data.draw(st.integers(0, len(seed) - 1), label="pos")
        seed[pos] ^= data.draw(st.integers(1, 255), label="xor")
    if data.draw(st.booleans(), label="truncate"):
        seed = seed[: data.draw(st.integers(0, len(seed)), label="cut")]
    _drive(bytes(seed))


@settings(max_examples=80, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(st.binary(max_size=2048))
def test_random_bytes_never_raise(b):
    _drive(b)


def test_gif_descriptor_offset_regression():
    """The exact r16-judge crafted input through the full entry set:
    fx past the canvas with disposal=2 (multimodal.py:1333 pre-fix)."""
    pal = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
    g = mm._gif_encode(4, 4, [
        {"x": 6, "y": 0, "fw": 2, "fh": 2, "pixels": bytes([1] * 4),
         "disposal": 2},
        {"x": 0, "y": 0, "fw": 2, "fh": 2, "pixels": bytes([2] * 4)},
    ], pal)
    _drive(g)
    assert mm._gif_decode_frames(g) is not None


@pytest.mark.usefixtures("spark")
def test_dataframe_ops_survive_mutated_corpus(spark):
    """The DataFrame-level None-contract operators (frame_dhashes and
    dhash_images — 'undecodable emits no rows / NULL') over one frame
    of mutated corpus bytes: the job must complete, one malformed asset
    in a crawl must never fail the whole Spark job. (decode_assets and
    audio_meta are deliberately NOT here: their contract is the honest
    NotImplementedError raise for unrecognized media.)"""
    corpus = _corpus()
    payloads = []
    for i, (_, seed) in enumerate(corpus):
        mut = bytearray(seed)
        mut[(i * 13) % len(mut)] ^= 0xFF
        payloads.append((i, bytearray(bytes(mut))))
        cut = bytearray(seed[: max(1, len(seed) // 2)])
        payloads.append((1000 + i, cut))
    assets = spark.createDataFrame(
        payloads, "asset_id long, content binary")
    # completes without raising; row counts are whatever survives decode
    mm.frame_dhashes(assets).count()
    mm.dhash_images(assets).count()
