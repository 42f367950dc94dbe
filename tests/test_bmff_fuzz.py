"""r16 (verdict #5): adversarial hardening of the ISO-BMFF box walk —
the same treatment BMP/TIFF got in r15. The walkers (`_bmff_boxes` →
`_mp4_meta` / `_m4a_meta` / `_avif_meta`) run inside Arrow-batched
planner UDFs over untrusted crawl bytes, so the contract is strict:
malformed input returns None (or a well-typed meta tuple), NEVER an
uncaught exception or an unbounded allocation/loop.

Shapes covered: 32/64-bit (largesize) box sizes, size=0 (to-end),
truncated largesize, overlapping and non-monotonic boxes, empty
FullBoxes at the buffer end (a real IndexError found by this harness —
`ver = b[ms]` read past an empty mdhd/tkhd), deep nesting, byte-flips
and truncations of valid fixtures, and fully random box trees.
"""

import struct

from seqspark.pipeline.multimodal import (
    _avif_encode_meta,
    _avif_meta,
    _bmff_box,
    _bmff_boxes,
    _m4a_meta,
    _mp4_encode_meta,
    _mp4_meta,
)

WALKERS = (_mp4_meta, _m4a_meta, _avif_meta)


def _ok(result):
    return result is None or isinstance(result, tuple)


def _fixtures():
    return [
        _mp4_encode_meta([
            {"handler": b"vide", "w": 640, "h": 360, "timescale": 30,
             "duration": 300, "n_samples": 90},
            {"handler": b"soun", "timescale": 44100, "duration": 441000,
             "nch": 2},
        ]),
        _mp4_encode_meta(
            [{"handler": b"vide", "w": 320, "h": 240, "n_samples": 50,
              "mdhd_v1": True}],
            largesize_moov=True,
        ),
        _mp4_encode_meta(
            [{"handler": b"soun", "timescale": 48000, "duration": 96000,
              "nch": 1}],
            brand=b"M4A ",
        ),
        _avif_encode_meta(800, 600),
        _avif_encode_meta(64, 64, brand=b"avis", n_frames=12),
    ]


def test_byte_flip_and_truncation_never_throw():
    for fix in _fixtures():
        for cut in range(0, len(fix), 3):
            for fn in WALKERS:
                assert _ok(fn(fix[:cut]))
        for pos in range(0, len(fix)):
            bad = bytearray(fix)
            bad[pos] ^= 0xFF
            bb = bytes(bad)
            for fn in WALKERS:
                assert _ok(fn(bb)), (fn.__name__, pos)


def test_adversarial_box_shapes():
    ftyp_mp4 = _bmff_box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    ftyp_avif = _bmff_box(b"ftyp", b"avif" + struct.pack(">I", 0) + b"avif")

    def check(b):
        for fn in WALKERS:
            assert _ok(fn(b))

    # empty FullBoxes at the very end of the buffer (the r16 crash)
    for leaf in (b"tkhd", b"mdhd", b"hdlr", b"stsz", b"stsd"):
        inner = _bmff_box(leaf, b"")
        if leaf in (b"mdhd", b"hdlr", b"stsz", b"stsd"):
            inner = _bmff_box(b"mdia", inner)
        check(ftyp_mp4 + _bmff_box(b"moov", _bmff_box(b"trak", inner)))
    # size = 0 (box extends to end) at every level
    zero = struct.pack(">I", 0) + b"moov" + _bmff_box(b"trak", b"")
    check(ftyp_mp4 + zero)
    # 64-bit largesize: truncated, undersized (< 16), and lying-huge
    check(ftyp_mp4 + struct.pack(">I", 1) + b"moov")           # no largesize
    check(ftyp_mp4 + struct.pack(">I", 1) + b"moov"
          + struct.pack(">Q", 8))                               # < header
    check(ftyp_mp4 + struct.pack(">I", 1) + b"moov"
          + struct.pack(">Q", 2**63) + b"\x00" * 32)            # beyond end
    # 32-bit size lying beyond the buffer / inside the header
    check(ftyp_mp4 + struct.pack(">I", 0xFFFFFFF0) + b"moov" + b"\x00" * 8)
    check(ftyp_mp4 + struct.pack(">I", 4) + b"moov")            # size < 8
    # overlapping siblings: second box claims bytes of the first
    a = _bmff_box(b"trak", b"\x00" * 24)
    overlap = struct.pack(">I", len(a) + 12) + b"trak" + a
    check(ftyp_mp4 + _bmff_box(b"moov", overlap + a))
    # deep nesting (iterative walk — must not recurse or hang)
    deep = _bmff_box(b"ispe", b"\x00" * 12)
    for _ in range(2000):
        deep = _bmff_box(b"ipco", deep)
    check(ftyp_avif + _bmff_box(b"meta", b"\x00" * 4
                                + _bmff_box(b"iprp", deep)))
    # ispe with zero dims / short body
    for body in (b"", b"\x00" * 4, b"\x00" * 12,
                 b"\x00" * 4 + struct.pack(">II", 0, 10)):
        check(ftyp_avif + _bmff_box(
            b"meta", b"\x00" * 4 + _bmff_box(
                b"iprp", _bmff_box(b"ipco", _bmff_box(b"ispe", body)))))

    # the walk itself makes progress on pathological size patterns
    evil = b""
    for size in (0, 1, 4, 7, 8, 2**31, 2**32 - 1):
        evil += struct.pack(">I", size) + b"free" + b"\x00" * 4
    boxes = list(_bmff_boxes(evil, 0, len(evil)))
    assert len(boxes) <= len(evil) // 8 + 1


def test_hypothesis_box_trees_never_throw():
    from hypothesis import given, settings
    from hypothesis import strategies as hst

    fourccs = [b"ftyp", b"moov", b"trak", b"tkhd", b"mdia", b"mdhd",
               b"hdlr", b"minf", b"stbl", b"stsz", b"stsd", b"meta",
               b"iprp", b"ipco", b"ispe", b"mdat", b"free", b"mp4a"]

    node = hst.deferred(lambda: hst.one_of(
        hst.binary(min_size=0, max_size=40),
        hst.tuples(
            hst.sampled_from(fourccs),
            hst.lists(node, max_size=3),
            hst.sampled_from(["ok", "zero", "large", "lie+", "lie-"]),
        ),
    ))

    def render(n) -> bytes:
        if isinstance(n, bytes):
            return n
        fc, kids, mode = n
        body = b"".join(render(k) for k in kids)
        if mode == "zero":
            return struct.pack(">I", 0) + fc + body
        if mode == "large":
            return (struct.pack(">I", 1) + fc
                    + struct.pack(">Q", 16 + len(body)) + body)
        if mode == "lie+":
            return struct.pack(">I", 8 + len(body) + 13) + fc + body
        if mode == "lie-":
            return struct.pack(">I", max(0, len(body) - 3)) + fc + body
        return _bmff_box(fc, body)

    brands = [b"isom" + struct.pack(">I", 0) + b"isom",
              b"avif" + struct.pack(">I", 0) + b"avif",
              b"M4A " + struct.pack(">I", 0) + b"M4A "]

    @settings(max_examples=150, deadline=None)
    @given(hst.lists(node, min_size=0, max_size=4),
           hst.sampled_from(brands))
    def run(tree, brand):
        payload = _bmff_box(b"ftyp", brand) + b"".join(
            render(n) for n in tree)
        for fn in WALKERS:
            assert _ok(fn(payload))

    run()


def test_valid_fixtures_still_parse():
    # the hardening must not regress the happy path
    b = _fixtures()[0]
    assert _mp4_meta(b) == (640, 360, 90)
    assert _m4a_meta(b) == ("m4a", 44100, 2, 441000)
    assert _avif_meta(_fixtures()[3]) == (800, 600, 1)
