"""Pure-Python VP8 (lossy WebP) KEY-FRAME decoder — the intra-only
still-image subset that every single-image lossy WebP is (RFC 6386; a
`VP8 ` chunk holds exactly one key frame). Closes the last honest raise
in the multimodal tier (r15 verdict #8): lossy is the web's majority
WebP flavor, so dedup/dhash over a real crawl needs real pixels here.

Scope and verification:

- Key frames only — interframes need reference buffers this planner
  tier never has (a still WebP cannot contain one).
- Output is the decoder's native YUV420: ``decode_yuv`` returns the
  reconstructed, loop-filtered Y/U/V planes. These are pinned
  BYTE-EXACT against the system libwebp's ``WebPDecode`` in YUV mode in
  tests/test_vp8_lossy.py (both bypass_filtering settings — the same
  two-sided differential discipline as the VP8L codec in
  ``vp8l.py``). ``decode`` converts to RGBA with the integer BT.601
  round used by this repo's other codecs (NOT libwebp's fancy
  upsampler), which is dHash-equivalent — the dedup-relevant signal —
  and pinned against libwebp's RGBA output at the dHash level.
- The five large constant tables below are normative spec data
  (RFC 6386 §§11.5, 13.4-13.5, 14.1); like vp8l.py's distance map they
  were extracted from the system libwebp's read-only data (offsets in
  the provenance comments) and are verified by the differentials — a
  wrong byte anywhere produces plane mismatches on the fixture corpus.
- Malformed input returns ``None`` (header checks) or decodes with the
  spec's implicit trailing zeros (truncation) — NEVER an uncaught
  exception; pinned by byte-flip/truncation fuzz.

Reference parity note: seq-db has no media pipeline; this codec exists
for the beyond-reference multimodal tier (SURVEY §2.11's image dedup
operators) where `documents` carry crawl images as opaque binaries.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

# ----------------------------------------------------------------- tables
# Quantizer lookups (RFC 6386 §14.1), extracted from libwebp.so.7.1.5
# .rodata @368896 (AC, uint16) / @369152 (DC, uint8).

_DC_Q = (
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118,
    122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157,
)

_AC_Q = (
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108,
    110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152,
    155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197, 201, 205, 209,
    213, 217, 221, 225, 229, 234, 239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
)

# Token-probability UPDATE flags (RFC 6386 §13.4 coeff_update_probs,
# [4 plane types][8 bands][3 ctx][11 probas]) — libwebp .rodata @369312.
_COEFF_UPDATE_PROBS = (
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 176, 246, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    223, 241, 252, 255, 255, 255, 255, 255, 255, 255, 255, 249, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 244, 252, 255, 255, 255, 255, 255, 255, 255, 255, 234, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 246, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    239, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255, 251, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    251, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 253, 255, 254, 255, 255, 255, 255, 255, 255, 250, 255, 254, 255, 254, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    217, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 225, 252, 241, 253, 255, 255, 254, 255, 255, 255, 255,
    234, 250, 241, 250, 253, 255, 253, 254, 255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    223, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 238, 253, 254, 254, 255, 255, 255, 255, 255, 255, 255,
    255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255, 249, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 253, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    247, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255, 252, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255, 250, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    186, 251, 250, 255, 255, 255, 255, 255, 255, 255, 255, 234, 251, 244, 254, 255, 255, 255, 255, 255, 255, 255,
    251, 251, 243, 253, 254, 255, 254, 255, 255, 255, 255, 255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    236, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255, 251, 253, 253, 254, 254, 255, 255, 255, 255, 255, 255,
    255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 254, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    248, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 250, 254, 252, 254, 255, 255, 255, 255, 255, 255, 255,
    248, 254, 249, 253, 255, 255, 255, 255, 255, 255, 255, 255, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    246, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255, 252, 254, 251, 254, 254, 255, 255, 255, 255, 255, 255,
    255, 254, 252, 255, 255, 255, 255, 255, 255, 255, 255, 248, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 251, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    245, 251, 254, 255, 255, 255, 255, 255, 255, 255, 255, 253, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 251, 253, 255, 255, 255, 255, 255, 255, 255, 255, 252, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 252, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    249, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 253, 255, 255, 255, 255, 255, 255, 255, 255, 250, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
)

# DEFAULT token probabilities (RFC 6386 §13.5, same shape) —
# libwebp .rodata @371296.
_DEFAULT_COEFF_PROBS = (
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128,
    189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128, 106, 126, 227, 252, 214, 209, 255, 255, 128, 128, 128,
    1, 98, 248, 255, 236, 226, 255, 255, 128, 128, 128, 181, 133, 238, 254, 221, 234, 255, 154, 128, 128, 128,
    78, 134, 202, 247, 198, 180, 255, 219, 128, 128, 128, 1, 185, 249, 255, 243, 255, 128, 128, 128, 128, 128,
    184, 150, 247, 255, 236, 224, 128, 128, 128, 128, 128, 77, 110, 216, 255, 236, 230, 128, 128, 128, 128, 128,
    1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128, 170, 139, 241, 252, 236, 209, 255, 255, 128, 128, 128,
    37, 116, 196, 243, 228, 255, 255, 255, 128, 128, 128, 1, 204, 254, 255, 245, 255, 128, 128, 128, 128, 128,
    207, 160, 250, 255, 238, 128, 128, 128, 128, 128, 128, 102, 103, 231, 255, 211, 171, 128, 128, 128, 128, 128,
    1, 152, 252, 255, 240, 255, 128, 128, 128, 128, 128, 177, 135, 243, 255, 234, 225, 128, 128, 128, 128, 128,
    80, 129, 211, 255, 194, 224, 128, 128, 128, 128, 128, 1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    246, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128, 255, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62, 131, 45, 198, 221, 172, 176, 220, 157, 252, 221, 1,
    68, 47, 146, 208, 149, 167, 221, 162, 255, 223, 128, 1, 149, 241, 255, 221, 224, 255, 255, 128, 128, 128,
    184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128, 81, 99, 181, 242, 176, 190, 249, 202, 255, 255, 128,
    1, 129, 232, 253, 214, 197, 242, 196, 255, 255, 128, 99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128,
    23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128, 1, 200, 246, 255, 234, 255, 128, 128, 128, 128, 128,
    109, 178, 241, 255, 231, 245, 255, 255, 128, 128, 128, 44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128,
    1, 132, 239, 251, 219, 209, 255, 165, 128, 128, 128, 94, 136, 225, 251, 218, 190, 255, 255, 128, 128, 128,
    22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128, 1, 182, 249, 255, 232, 235, 128, 128, 128, 128, 128,
    124, 143, 241, 255, 227, 234, 128, 128, 128, 128, 128, 35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128,
    1, 157, 247, 255, 236, 231, 255, 255, 128, 128, 128, 121, 141, 235, 255, 225, 227, 255, 255, 128, 128, 128,
    45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128, 1, 1, 251, 255, 213, 255, 128, 128, 128, 128, 128,
    203, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128, 137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128,
    253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128, 175, 13, 224, 243, 193, 185, 249, 198, 255, 255, 128,
    73, 17, 171, 221, 161, 179, 236, 167, 255, 234, 128, 1, 95, 247, 253, 212, 183, 255, 255, 128, 128, 128,
    239, 90, 244, 250, 211, 209, 255, 255, 128, 128, 128, 155, 77, 195, 248, 188, 195, 255, 255, 128, 128, 128,
    1, 24, 239, 251, 218, 219, 255, 205, 128, 128, 128, 201, 51, 219, 255, 196, 186, 128, 128, 128, 128, 128,
    69, 46, 190, 239, 201, 218, 255, 228, 128, 128, 128, 1, 191, 251, 255, 255, 128, 128, 128, 128, 128, 128,
    223, 165, 249, 255, 213, 255, 128, 128, 128, 128, 128, 141, 124, 248, 255, 255, 128, 128, 128, 128, 128, 128,
    1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128, 190, 36, 230, 255, 236, 255, 128, 128, 128, 128, 128,
    149, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128, 1, 226, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    247, 192, 255, 128, 128, 128, 128, 128, 128, 128, 128, 240, 128, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    1, 134, 252, 255, 255, 128, 128, 128, 128, 128, 128, 213, 62, 250, 255, 255, 128, 128, 128, 128, 128, 128,
    55, 93, 255, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    202, 24, 213, 235, 186, 191, 220, 160, 240, 175, 255, 126, 38, 182, 232, 169, 184, 228, 174, 255, 187, 128,
    61, 46, 138, 219, 151, 178, 240, 170, 255, 216, 128, 1, 112, 230, 250, 199, 191, 247, 159, 255, 255, 128,
    166, 109, 228, 252, 211, 215, 255, 174, 128, 128, 128, 39, 77, 162, 232, 172, 180, 245, 178, 255, 255, 128,
    1, 52, 220, 246, 198, 199, 249, 220, 255, 255, 128, 124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128,
    24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128, 1, 182, 225, 249, 219, 240, 255, 224, 128, 128, 128,
    149, 150, 226, 252, 216, 205, 255, 171, 128, 128, 128, 28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128,
    1, 81, 230, 252, 204, 203, 255, 192, 128, 128, 128, 123, 102, 209, 247, 188, 196, 255, 233, 128, 128, 128,
    20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128, 1, 222, 248, 255, 216, 213, 128, 128, 128, 128, 128,
    168, 175, 246, 252, 235, 205, 255, 255, 128, 128, 128, 47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128,
    1, 121, 236, 253, 212, 214, 255, 255, 128, 128, 128, 141, 84, 213, 252, 201, 202, 255, 219, 128, 128, 128,
    42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128, 1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    244, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128, 238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
)

# Key-frame 4x4 intra mode probabilities, [above mode][left mode]
# [9 probas] (RFC 6386 §11.5) — libwebp .rodata @370368, REORDERED from
# libwebp's b-mode enum (…RD=4, VR=5, LD=6…) into the RFC's
# (…LD=4, RD=5, VR=6…) used throughout this decoder; the noise-image
# differentials fail loudly on the unpermuted table.
_KF_B_MODE_PROBS = (
    231, 120, 48, 89, 115, 113, 120, 152, 112, 152, 179, 64, 126, 170, 118, 46, 70, 95,
    175, 69, 143, 80, 85, 82, 72, 155, 103, 56, 58, 10, 171, 218, 189, 17, 13, 152,
    144, 71, 10, 38, 171, 213, 144, 34, 26, 114, 26, 17, 163, 44, 195, 21, 10, 173,
    121, 24, 80, 195, 26, 62, 44, 64, 85, 170, 46, 55, 19, 136, 160, 33, 206, 71,
    63, 20, 8, 114, 114, 208, 12, 9, 226, 81, 40, 11, 96, 182, 84, 29, 16, 36,
    134, 183, 89, 137, 98, 101, 106, 165, 148, 72, 187, 100, 130, 157, 111, 32, 75, 80,
    66, 102, 167, 99, 74, 62, 40, 234, 128, 41, 53, 9, 178, 241, 141, 26, 8, 107,
    104, 79, 12, 27, 217, 255, 87, 17, 7, 74, 43, 26, 146, 73, 166, 49, 23, 157,
    65, 38, 105, 160, 51, 52, 31, 115, 128, 87, 68, 71, 44, 114, 51, 15, 186, 23,
    47, 41, 14, 110, 182, 183, 21, 17, 194, 66, 45, 25, 102, 197, 189, 23, 18, 22,
    88, 88, 147, 150, 42, 46, 45, 196, 205, 43, 97, 183, 117, 85, 38, 35, 179, 61,
    39, 53, 200, 87, 26, 21, 43, 232, 171, 56, 34, 51, 104, 114, 102, 29, 93, 77,
    107, 54, 32, 26, 51, 1, 81, 43, 31, 39, 28, 85, 171, 58, 165, 90, 98, 64,
    34, 22, 116, 206, 23, 34, 43, 166, 73, 68, 25, 106, 22, 64, 171, 36, 225, 114,
    34, 19, 21, 102, 132, 188, 16, 76, 124, 62, 18, 78, 95, 85, 57, 50, 48, 51,
    193, 101, 35, 159, 215, 111, 89, 46, 111, 60, 148, 31, 172, 219, 228, 21, 18, 111,
    112, 113, 77, 85, 179, 255, 38, 120, 114, 40, 42, 1, 196, 245, 209, 10, 25, 109,
    100, 80, 8, 43, 154, 1, 51, 26, 71, 88, 43, 29, 140, 166, 213, 37, 43, 154,
    61, 63, 30, 155, 67, 45, 68, 1, 209, 142, 78, 78, 16, 255, 128, 34, 197, 171,
    41, 40, 5, 102, 211, 183, 4, 1, 221, 51, 50, 17, 168, 209, 192, 23, 25, 82,
    125, 98, 42, 88, 104, 85, 117, 175, 82, 95, 84, 53, 89, 128, 100, 113, 101, 45,
    75, 79, 123, 47, 51, 128, 81, 171, 1, 57, 17, 5, 71, 102, 57, 53, 41, 49,
    115, 21, 2, 10, 102, 255, 166, 23, 6, 38, 33, 13, 121, 57, 73, 26, 1, 85,
    41, 10, 67, 138, 77, 110, 90, 47, 114, 101, 29, 16, 10, 85, 128, 101, 196, 26,
    57, 18, 10, 102, 102, 213, 34, 20, 43, 117, 20, 15, 36, 163, 128, 68, 1, 26,
    138, 31, 36, 171, 27, 166, 38, 44, 229, 67, 87, 58, 169, 82, 115, 26, 59, 179,
    63, 59, 90, 180, 59, 166, 93, 73, 154, 40, 40, 21, 116, 143, 209, 34, 39, 175,
    57, 46, 22, 24, 128, 1, 54, 17, 37, 47, 15, 16, 183, 34, 223, 49, 45, 183,
    46, 17, 33, 183, 6, 98, 15, 32, 183, 65, 32, 73, 115, 28, 128, 23, 128, 205,
    40, 3, 9, 115, 51, 192, 18, 6, 223, 87, 37, 9, 115, 59, 77, 64, 21, 47,
    104, 55, 44, 218, 9, 54, 53, 130, 226, 64, 90, 70, 205, 40, 41, 23, 26, 57,
    54, 57, 112, 184, 5, 41, 38, 166, 213, 30, 34, 26, 133, 152, 116, 10, 32, 134,
    75, 32, 12, 51, 192, 255, 160, 43, 51, 39, 19, 53, 221, 26, 114, 32, 73, 255,
    31, 9, 65, 234, 2, 15, 1, 118, 73, 88, 31, 35, 67, 102, 85, 55, 186, 85,
    56, 21, 23, 111, 59, 205, 45, 37, 192, 55, 38, 70, 124, 73, 102, 1, 34, 98,
    102, 61, 71, 37, 34, 53, 31, 243, 192, 69, 60, 71, 38, 73, 119, 28, 222, 37,
    68, 45, 128, 34, 1, 47, 11, 245, 171, 62, 17, 19, 70, 146, 85, 55, 62, 70,
    75, 15, 9, 9, 64, 255, 184, 119, 16, 37, 43, 37, 154, 100, 163, 85, 160, 1,
    63, 9, 92, 136, 28, 64, 32, 201, 85, 86, 6, 28, 5, 64, 255, 25, 248, 1,
    56, 8, 17, 132, 137, 255, 55, 116, 128, 58, 15, 20, 82, 135, 57, 26, 121, 40,
    164, 50, 31, 137, 154, 133, 25, 35, 218, 51, 103, 44, 131, 131, 123, 31, 6, 158,
    86, 40, 64, 135, 148, 224, 45, 183, 128, 22, 26, 17, 131, 240, 154, 14, 1, 209,
    83, 12, 13, 54, 192, 255, 68, 47, 28, 45, 16, 21, 91, 64, 222, 7, 1, 197,
    56, 21, 39, 155, 60, 138, 23, 102, 213, 85, 26, 85, 85, 128, 128, 32, 146, 171,
    18, 11, 7, 63, 144, 171, 4, 4, 246, 35, 27, 10, 146, 174, 171, 12, 26, 128,
    190, 80, 35, 99, 180, 80, 126, 54, 45, 85, 126, 47, 87, 176, 51, 41, 20, 32,
    101, 75, 128, 139, 118, 146, 116, 128, 85, 56, 41, 15, 176, 236, 85, 37, 9, 62,
    146, 36, 19, 30, 171, 255, 97, 27, 20, 71, 30, 17, 119, 118, 255, 17, 18, 138,
    101, 38, 60, 138, 55, 70, 43, 26, 142, 138, 45, 61, 62, 219, 1, 81, 188, 64,
    32, 41, 20, 117, 151, 142, 20, 21, 163, 112, 19, 12, 61, 195, 128, 48, 4, 24,
)

# Fixed mode/scan tables (RFC 6386 §§8.2, 11.2-11.5, 13.3 — small enough
# to state inline; the differential pins them too).
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
_KF_YMODE_PROBS = (145, 156, 163, 128)
_KF_UV_PROBS = (142, 114, 183)
# token extra-bit probabilities + base values (categories 1..6)
_CAT_PROBS = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)
_CAT_BASE = (5, 7, 11, 19, 35, 67)

# y-mode enum: 0=DC 1=V 2=H 3=TM 4=B_PRED; 4x4 b-mode enum (RFC order):
# 0=B_DC 1=B_TM 2=B_VE 3=B_HE 4=B_LD 5=B_RD 6=B_VR 7=B_VL 8=B_HD 9=B_HU
_DC, _V, _H, _TM, _BPRED = 0, 1, 2, 3, 4
#: implied subblock mode (for 4x4 context) of a whole-MB mode
_IMPLIED_B = {_DC: 0, _V: 2, _H: 3, _TM: 1}


class _Bool:
    """RFC 6386 §7 boolean entropy decoder. Reads past the end of the
    partition yield zero bytes (the spec's implicit zero tail), so
    truncated input degrades to garbage pixels, never an exception."""

    __slots__ = ("d", "pos", "end", "value", "range", "bits")

    def __init__(self, d: bytes, start: int, size: int):
        self.d = d
        self.end = min(len(d), start + size)
        b0 = d[start] if start < self.end else 0
        b1 = d[start + 1] if start + 1 < self.end else 0
        self.value = (b0 << 8) | b1
        self.pos = start + 2
        self.range = 255
        self.bits = 0

    def bit(self, prob: int = 128) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        # renormalize
        rng = self.range
        if rng < 128:
            value = self.value
            bits = self.bits
            pos = self.pos
            d = self.d
            end = self.end
            while rng < 128:
                value <<= 1
                rng <<= 1
                bits += 1
                if bits == 8:
                    bits = 0
                    if pos < end:
                        value |= d[pos]
                        pos += 1
                    else:
                        pos += 1  # implicit zero tail
            self.value = value
            self.range = rng
            self.bits = bits
            self.pos = pos
        return ret

    def lit(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit(128)
        return v

    def sign_lit(self, n: int) -> int:
        v = self.lit(n)
        return -v if self.bit(128) else v

    def flag_sign_lit(self, n: int) -> int:
        return self.sign_lit(n) if self.bit(128) else 0


def _clamp_q(i: int) -> int:
    return 0 if i < 0 else (127 if i > 127 else i)


def _iwalsh(blk: List[int]) -> List[int]:
    """Inverse WHT for the Y2 (DC) block (RFC 6386 §14.3)."""
    t = [0] * 16
    for i in range(4):
        a1 = blk[i] + blk[12 + i]
        b1 = blk[4 + i] + blk[8 + i]
        c1 = blk[4 + i] - blk[8 + i]
        d1 = blk[i] - blk[12 + i]
        t[i] = a1 + b1
        t[4 + i] = c1 + d1
        t[8 + i] = a1 - b1
        t[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = t[r] + t[r + 3]
        b1 = t[r + 1] + t[r + 2]
        c1 = t[r + 1] - t[r + 2]
        d1 = t[r] - t[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


_C1 = 20091  # sqrt(2)*cos(pi/8) in Q16, minus one
_C2 = 35468  # sqrt(2)*sin(pi/8) in Q16


def _idct(blk: List[int]) -> List[int]:
    """4x4 inverse DCT (RFC 6386 §14.4), exact integer arithmetic."""
    t = [0] * 16
    for i in range(4):
        a1 = blk[i] + blk[8 + i]
        b1 = blk[i] - blk[8 + i]
        x4, x12 = blk[4 + i], blk[12 + i]
        c1 = ((x4 * _C2) >> 16) - (x12 + ((x12 * _C1) >> 16))
        d1 = (x4 + ((x4 * _C1) >> 16)) + ((x12 * _C2) >> 16)
        t[i] = a1 + d1
        t[12 + i] = a1 - d1
        t[4 + i] = b1 + c1
        t[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = t[r] + t[r + 2]
        b1 = t[r] - t[r + 2]
        x1, x3 = t[r + 1], t[r + 3]
        c1 = ((x1 * _C2) >> 16) - (x3 + ((x3 * _C1) >> 16))
        d1 = (x1 + ((x1 * _C1) >> 16)) + ((x3 * _C2) >> 16)
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


def _coeffs(bd: _Bool, probs, plane: int, ctx: int, first: int,
            dq_dc: int, dq_ac: int) -> Tuple[Optional[List[int]], int]:
    """Decode one 4x4 block's tokens (RFC 6386 §13.3). Returns
    (coeff list in raster order or None if all-zero, end position)."""
    out = None
    n = first
    base = plane * 264  # 8 bands * 3 ctx * 11
    p_off = base + _BANDS[n] * 33 + ctx * 11
    while n < 16:
        if not bd.bit(probs[p_off]):
            break  # EOB
        # zero-run loop: a ZERO token can never be followed by EOB, so
        # the next read skips the EOB branch (starts at the tree's
        # second position)
        while not bd.bit(probs[p_off + 1]):
            n += 1
            if n == 16:
                return out, 16
            p_off = base + _BANDS[n] * 33  # ctx 0 after a zero
        # nonzero: decode the value
        if not bd.bit(probs[p_off + 2]):
            v = 1
            nctx = 1
        else:
            nctx = 2
            if not bd.bit(probs[p_off + 3]):
                if not bd.bit(probs[p_off + 4]):
                    v = 2
                else:
                    v = 4 if bd.bit(probs[p_off + 5]) else 3
            else:
                if not bd.bit(probs[p_off + 6]):
                    if not bd.bit(probs[p_off + 7]):
                        cat = 0
                    else:
                        cat = 1
                else:
                    if not bd.bit(probs[p_off + 8]):
                        cat = 3 if bd.bit(probs[p_off + 9]) else 2
                    else:
                        cat = 5 if bd.bit(probs[p_off + 10]) else 4
                v = _CAT_BASE[cat]
                extra = 0
                for cp in _CAT_PROBS[cat]:
                    extra = (extra << 1) | bd.bit(cp)
                v += extra
        if bd.bit(128):
            v = -v
        if out is None:
            out = [0] * 16
        out[_ZIGZAG[n]] = v * (dq_dc if n == 0 else dq_ac)
        n += 1
        if n == 16:
            return out, 16
        p_off = base + _BANDS[n] * 33 + nctx * 11
    return out, n


def _clip255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _pred4(mode: int, A, TR, L, P) -> List[List[int]]:
    """One 4x4 subblock predictor (RFC 6386 §12.3). ``A``=above[0..3],
    ``TR``=above-right[0..3], ``L``=left[0..3], ``P``=above-left."""
    p = [[0] * 4 for _ in range(4)]
    if mode == 0:  # B_DC
        dc = (sum(A) + sum(L) + 4) >> 3
        for r in range(4):
            p[r][0] = p[r][1] = p[r][2] = p[r][3] = dc
    elif mode == 1:  # B_TM
        for r in range(4):
            for c in range(4):
                p[r][c] = _clip255(L[r] + A[c] - P)
    elif mode == 2:  # B_VE
        e = (P, A[0], A[1], A[2], A[3], TR[0])
        row = [(e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2 for i in range(4)]
        for r in range(4):
            p[r] = list(row)
    elif mode == 3:  # B_HE
        e = (P, L[0], L[1], L[2], L[3], L[3])
        for r in range(4):
            v = (e[r] + 2 * e[r + 1] + e[r + 2] + 2) >> 2
            p[r] = [v, v, v, v]
    elif mode == 4:  # B_LD (down-left)
        a = (A[0], A[1], A[2], A[3], TR[0], TR[1], TR[2], TR[3])
        for r in range(4):
            for c in range(4):
                k = r + c
                if k == 6:
                    p[r][c] = (a[6] + 3 * a[7] + 2) >> 2
                else:
                    p[r][c] = (a[k] + 2 * a[k + 1] + a[k + 2] + 2) >> 2
    elif mode == 5:  # B_RD (down-right)
        e = (L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3])
        for r in range(4):
            for c in range(4):
                k = c - r + 4  # diagonal center into the 9-pixel edge
                p[r][c] = (e[k - 1] + 2 * e[k] + e[k + 1] + 2) >> 2
    elif mode == 6:  # B_VR (vertical-right)
        e = (L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3])
        p[3][0] = (e[1] + 2 * e[2] + e[3] + 2) >> 2
        p[2][0] = (e[2] + 2 * e[3] + e[4] + 2) >> 2
        p[3][1] = p[1][0] = (e[3] + 2 * e[4] + e[5] + 2) >> 2
        p[2][1] = p[0][0] = (e[4] + e[5] + 1) >> 1
        p[3][2] = p[1][1] = (e[4] + 2 * e[5] + e[6] + 2) >> 2
        p[2][2] = p[0][1] = (e[5] + e[6] + 1) >> 1
        p[3][3] = p[1][2] = (e[5] + 2 * e[6] + e[7] + 2) >> 2
        p[2][3] = p[0][2] = (e[6] + e[7] + 1) >> 1
        p[1][3] = (e[6] + 2 * e[7] + e[8] + 2) >> 2
        p[0][3] = (e[7] + e[8] + 1) >> 1
    elif mode == 7:  # B_VL (vertical-left)
        a = (A[0], A[1], A[2], A[3], TR[0], TR[1], TR[2], TR[3])
        p[0][0] = (a[0] + a[1] + 1) >> 1
        p[1][0] = (a[0] + 2 * a[1] + a[2] + 2) >> 2
        p[2][0] = p[0][1] = (a[1] + a[2] + 1) >> 1
        p[1][1] = p[3][0] = (a[1] + 2 * a[2] + a[3] + 2) >> 2
        p[2][1] = p[0][2] = (a[2] + a[3] + 1) >> 1
        p[3][1] = p[1][2] = (a[2] + 2 * a[3] + a[4] + 2) >> 2
        p[0][3] = p[2][2] = (a[3] + a[4] + 1) >> 1
        p[1][3] = p[3][2] = (a[3] + 2 * a[4] + a[5] + 2) >> 2
        p[2][3] = (a[4] + 2 * a[5] + a[6] + 2) >> 2
        p[3][3] = (a[5] + 2 * a[6] + a[7] + 2) >> 2
    elif mode == 8:  # B_HD (horizontal-down)
        e = (L[3], L[2], L[1], L[0], P, A[0], A[1], A[2])
        p[3][0] = (e[0] + e[1] + 1) >> 1
        p[3][1] = (e[0] + 2 * e[1] + e[2] + 2) >> 2
        p[2][0] = p[3][2] = (e[1] + e[2] + 1) >> 1
        p[2][1] = p[3][3] = (e[1] + 2 * e[2] + e[3] + 2) >> 2
        p[2][2] = p[1][0] = (e[2] + e[3] + 1) >> 1
        p[2][3] = p[1][1] = (e[2] + 2 * e[3] + e[4] + 2) >> 2
        p[1][2] = p[0][0] = (e[3] + e[4] + 1) >> 1
        p[1][3] = p[0][1] = (e[3] + 2 * e[4] + e[5] + 2) >> 2
        p[0][2] = (e[4] + 2 * e[5] + e[6] + 2) >> 2
        p[0][3] = (e[5] + 2 * e[6] + e[7] + 2) >> 2
    else:  # B_HU (horizontal-up)
        l0, l1, l2, l3 = L
        p[0][0] = (l0 + l1 + 1) >> 1
        p[0][1] = (l0 + 2 * l1 + l2 + 2) >> 2
        p[0][2] = p[1][0] = (l1 + l2 + 1) >> 1
        p[0][3] = p[1][1] = (l1 + 2 * l2 + l3 + 2) >> 2
        p[1][2] = p[2][0] = (l2 + l3 + 1) >> 1
        p[1][3] = p[2][1] = (l2 + 2 * l3 + l3 + 2) >> 2
        p[2][2] = p[2][3] = l3
        p[3][0] = p[3][1] = p[3][2] = p[3][3] = l3
    return p


def _pred_block(buf, by: int, bx: int, size: int, mode: int,
                has_above: bool, has_left: bool) -> None:
    """Whole-block (16x16 luma / 8x8 chroma) intra prediction into
    ``buf[by:by+size, bx:bx+size]`` — buf carries the virtual borders
    (row 0 = 127, col 0 = 129, corner 127), but DC uses only REAL
    pixels (RFC 6386 §12.2)."""
    if mode == _DC:
        total = 0
        n = 0
        if has_above:
            total += int(buf[by - 1, bx:bx + size].sum())
            n += size
        if has_left:
            total += int(buf[by:by + size, bx - 1].sum())
            n += size
        dc = 128 if n == 0 else (total + (n >> 1)) >> (n.bit_length() - 1)
        buf[by:by + size, bx:bx + size] = dc
    elif mode == _V:
        buf[by:by + size, bx:bx + size] = buf[by - 1, bx:bx + size]
    elif mode == _H:
        buf[by:by + size, bx:bx + size] = buf[
            by:by + size, bx - 1][:, None]
    else:  # TM
        a = buf[by - 1, bx:bx + size].astype(np.int32)
        l = buf[by:by + size, bx - 1].astype(np.int32)
        p = int(buf[by - 1, bx - 1])
        buf[by:by + size, bx:bx + size] = np.clip(
            l[:, None] + a[None, :] - p, 0, 255).astype(np.uint8)


def _parse_frame(data: bytes, max_pixels: int):
    """Parse + reconstruct one key frame. Returns (w, h, y, u, v planes
    as uint8 numpy arrays at padded MB resolution with virtual borders
    REMOVED, plus the per-MB loop-filter info) or None."""
    if len(data) < 10:
        return None
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        return None  # interframe: undecodable without references
    part1_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        return None
    w_raw = data[6] | (data[7] << 8)
    h_raw = data[8] | (data[9] << 8)
    w, h = w_raw & 0x3FFF, h_raw & 0x3FFF
    if w == 0 or h == 0 or w * h > max_pixels:
        return None
    if 10 + part1_size > len(data):
        return None
    bd = _Bool(data, 10, part1_size)
    bd.bit()  # color_space
    bd.bit()  # clamping_type

    seg_enabled = bd.bit()
    seg_update_map = 0
    seg_abs = 0
    seg_q = [0, 0, 0, 0]
    seg_lf = [0, 0, 0, 0]
    seg_tree = [255, 255, 255]
    if seg_enabled:
        seg_update_map = bd.bit()
        update_data = bd.bit()
        if update_data:
            seg_abs = bd.bit()
            for i in range(4):
                seg_q[i] = bd.flag_sign_lit(7)
            for i in range(4):
                seg_lf[i] = bd.flag_sign_lit(6)
        if seg_update_map:
            for i in range(3):
                if bd.bit():
                    seg_tree[i] = bd.lit(8)

    filter_type = bd.bit()
    filter_level = bd.lit(6)
    sharpness = bd.lit(3)
    lf_delta_enabled = bd.bit()
    ref_delta = [0, 0, 0, 0]
    mode_delta = [0, 0, 0, 0]
    if lf_delta_enabled:
        if bd.bit():  # mode_ref_lf_delta_update
            for i in range(4):
                if bd.bit():
                    ref_delta[i] = bd.sign_lit(6)
            for i in range(4):
                if bd.bit():
                    mode_delta[i] = bd.sign_lit(6)

    n_parts = 1 << bd.lit(2)
    # token partition sizes trail the first partition
    part_base = 10 + part1_size
    sizes_len = 3 * (n_parts - 1)
    if part_base + sizes_len > len(data):
        return None
    parts = []
    off = part_base + sizes_len
    for i in range(n_parts):
        if i < n_parts - 1:
            psz = (data[part_base + 3 * i]
                   | (data[part_base + 3 * i + 1] << 8)
                   | (data[part_base + 3 * i + 2] << 16))
        else:
            psz = max(0, len(data) - off)
        parts.append(_Bool(data, off, psz))
        off += psz

    y_ac_qi = bd.lit(7)
    y_dc_d = bd.flag_sign_lit(4)
    y2_dc_d = bd.flag_sign_lit(4)
    y2_ac_d = bd.flag_sign_lit(4)
    uv_dc_d = bd.flag_sign_lit(4)
    uv_ac_d = bd.flag_sign_lit(4)
    bd.bit()  # refresh_entropy_probs (meaningless for a single frame)

    probs = list(_DEFAULT_COEFF_PROBS)
    for i in range(1056):
        if bd.bit(_COEFF_UPDATE_PROBS[i]):
            probs[i] = bd.lit(8)

    mb_no_skip = bd.bit()
    skip_prob = bd.lit(8) if mb_no_skip else 0

    mb_w = (w + 15) >> 4
    mb_h = (h + 15) >> 4

    # per-segment dequant factors
    quants = []
    for s in range(4):
        qi = seg_q[s] if seg_abs else y_ac_qi + seg_q[s]
        qi = _clamp_q(qi) if seg_enabled else _clamp_q(y_ac_qi)
        y1dc = _DC_Q[_clamp_q(qi + y_dc_d)]
        y1ac = _AC_Q[qi]
        y2dc = _DC_Q[_clamp_q(qi + y2_dc_d)] * 2
        y2ac = max(8, (_AC_Q[_clamp_q(qi + y2_ac_d)] * 155) // 100)
        # chroma DC index is capped at 117 (value 132, RFC 6386 §14.1)
        uvdc = _DC_Q[min(117, _clamp_q(qi + uv_dc_d))]
        uvac = _AC_Q[_clamp_q(qi + uv_ac_d)]
        quants.append((y1dc, y1ac, y2dc, y2ac, uvdc, uvac))

    # ---- per-MB mode parse (rest of the first partition) ----
    seg_ids = [0] * (mb_w * mb_h)
    skips = [0] * (mb_w * mb_h)
    ymodes = [0] * (mb_w * mb_h)
    uvmodes = [0] * (mb_w * mb_h)
    bmodes: List[Optional[List[int]]] = [None] * (mb_w * mb_h)
    above_b = [[0, 0, 0, 0] for _ in range(mb_w)]  # 4x4 ctx above
    p0, p1, p2, p3 = _KF_YMODE_PROBS
    u0, u1, u2 = _KF_UV_PROBS
    for my in range(mb_h):
        left_b = [0, 0, 0, 0]
        for mx in range(mb_w):
            i = my * mb_w + mx
            if seg_enabled and seg_update_map:
                if bd.bit(seg_tree[0]):
                    seg_ids[i] = 2 + bd.bit(seg_tree[2])
                else:
                    seg_ids[i] = bd.bit(seg_tree[1])
            if mb_no_skip:
                skips[i] = bd.bit(skip_prob)
            if not bd.bit(p0):
                ym = _BPRED
            elif not bd.bit(p1):
                ym = _V if bd.bit(p2) else _DC
            else:
                ym = _TM if bd.bit(p3) else _H
            ymodes[i] = ym
            ab = above_b[mx]
            if ym == _BPRED:
                bm = [0] * 16
                for r in range(4):
                    for c in range(4):
                        a_ctx = ab[c] if r == 0 else bm[(r - 1) * 4 + c]
                        l_ctx = left_b[r] if c == 0 else bm[r * 4 + c - 1]
                        pr = _KF_B_MODE_PROBS[(a_ctx * 10 + l_ctx) * 9:]
                        if not bd.bit(pr[0]):
                            m = 0
                        elif not bd.bit(pr[1]):
                            m = 1
                        elif not bd.bit(pr[2]):
                            m = 2
                        elif not bd.bit(pr[3]):
                            if not bd.bit(pr[4]):
                                m = 3
                            else:
                                m = 5 if not bd.bit(pr[5]) else 6
                        else:
                            if not bd.bit(pr[6]):
                                m = 4
                            elif not bd.bit(pr[7]):
                                m = 7
                            else:
                                m = 8 if not bd.bit(pr[8]) else 9
                        bm[r * 4 + c] = m
                bmodes[i] = bm
                above_b[mx] = bm[12:16]
                left_b = [bm[3], bm[7], bm[11], bm[15]]
            else:
                ib = _IMPLIED_B[ym]
                above_b[mx] = [ib, ib, ib, ib]
                left_b = [ib, ib, ib, ib]
            if not bd.bit(u0):
                uvmodes[i] = _DC
            elif not bd.bit(u1):
                uvmodes[i] = _V
            elif not bd.bit(u2):
                uvmodes[i] = _H
            else:
                uvmodes[i] = _TM
    return (w, h, mb_w, mb_h, parts, probs, quants, seg_ids, skips,
            ymodes, uvmodes, bmodes, mb_no_skip,
            (filter_type, filter_level, sharpness, lf_delta_enabled,
             ref_delta, mode_delta, seg_enabled, seg_abs, seg_lf))


def _reconstruct(hdr, max_pixels: int):
    (w, h, mb_w, mb_h, parts, probs, quants, seg_ids, skips, ymodes,
     uvmodes, bmodes, mb_no_skip, lf) = hdr
    n_parts = len(parts)
    W, H = mb_w * 16, mb_h * 16
    # planes with virtual borders: row 0 = 127 (above, incl corner),
    # col 0 = 129 (left); +4 cols of Y slack for above-right reads
    Y = np.empty((H + 1, W + 5), np.uint8)
    U = np.empty((H // 2 + 1, W // 2 + 1), np.uint8)
    V = np.empty((H // 2 + 1, W // 2 + 1), np.uint8)
    for P in (Y, U, V):
        P[0, :] = 127
        P[1:, 0] = 129
    Y[1:, W + 1:] = 127

    above_nz = [[0] * 9 for _ in range(mb_w)]  # 4 Y, 2 U, 2 V, 1 Y2
    mb_nz = [False] * (mb_w * mb_h)
    mb_lvl = [0] * (mb_w * mb_h)
    (f_type, f_level, sharp, lf_on, ref_d, mode_d,
     seg_on, seg_abs, seg_lf) = lf

    for my in range(mb_h):
        tok = parts[my % n_parts]
        left_nz = [0] * 9
        for mx in range(mb_w):
            i = my * mb_w + mx
            sid = seg_ids[i] if seg_on else 0
            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = quants[sid]
            ym = ymodes[i]
            has_y2 = ym != _BPRED

            # ---- residuals ----
            blocks: List[Optional[List[int]]] = [None] * 25
            dcs: Optional[List[int]] = None
            nz_any = False
            if skips[i]:
                for k in range(8):
                    above_nz[mx][k] = 0
                    left_nz[k] = 0
                if has_y2:  # skip resets Y2 ctx only when Y2 exists
                    above_nz[mx][8] = 0
                    left_nz[8] = 0
            else:
                anz = above_nz[mx]
                if has_y2:
                    ctx = anz[8] + left_nz[8]
                    co, n = _coeffs(tok, probs, 1, ctx, 0, y2dc, y2ac)
                    anz[8] = left_nz[8] = 1 if n > 0 else 0
                    nz_any |= co is not None
                    dcs = _iwalsh(co) if co is not None else None
                    plane, first = 0, 1
                else:
                    plane, first = 3, 0
                for b in range(16):
                    r, c = b >> 2, b & 3
                    ctx = anz[c] + left_nz[r]
                    co, n = _coeffs(tok, probs, plane, ctx, first,
                                    y1dc, y1ac)
                    anz[c] = left_nz[r] = 1 if n > first else 0
                    nz_any |= co is not None
                    blocks[b] = co
                for pl in range(2):  # U then V
                    for b in range(4):
                        r, c = b >> 1, b & 1
                        k = 4 + 2 * pl
                        ctx = anz[k + c] + left_nz[k + r]
                        co, n = _coeffs(tok, probs, 2, ctx, 0, uvdc, uvac)
                        anz[k + c] = left_nz[k + r] = 1 if n > 0 else 0
                        nz_any |= co is not None
                        blocks[16 + 4 * pl + b] = co
            if dcs is not None and any(dcs):
                nz_any = True
            mb_nz[i] = nz_any

            # ---- per-MB loop-filter level ----
            if seg_on:
                lvl = seg_lf[sid] if seg_abs else f_level + seg_lf[sid]
            else:
                lvl = f_level
            lvl = max(0, min(63, lvl))
            if lf_on:
                lvl += ref_d[0]  # intra frame
                if ym == _BPRED:
                    lvl += mode_d[0]
                lvl = max(0, min(63, lvl))
            mb_lvl[i] = lvl

            # ---- reconstruct luma ----
            by, bx = 1 + 16 * my, 1 + 16 * mx
            if ym != _BPRED:
                _pred_block(Y, by, bx, 16, ym, my > 0, mx > 0)
                for b in range(16):
                    co = blocks[b]
                    dc = dcs[b] if dcs is not None else 0
                    if co is None:
                        if dc == 0:
                            continue
                        co = [0] * 16
                    if dcs is not None:
                        co[0] = dc
                    res = _idct(co)
                    oy, ox = by + 4 * (b >> 2), bx + 4 * (b & 3)
                    blk = Y[oy:oy + 4, ox:ox + 4].astype(np.int32)
                    blk += np.asarray(res, np.int32).reshape(4, 4)
                    Y[oy:oy + 4, ox:ox + 4] = np.clip(
                        blk, 0, 255).astype(np.uint8)
            else:
                bm = bmodes[i]
                # above-right of the MB: shared by every col-3 subblock
                if mx == mb_w - 1:
                    tr = [int(Y[by - 1, bx + 15])] * 4
                else:
                    tr = [int(v) for v in Y[by - 1, bx + 16:bx + 20]]
                for b in range(16):
                    r, c = b >> 2, b & 3
                    oy, ox = by + 4 * r, bx + 4 * c
                    A = [int(v) for v in Y[oy - 1, ox:ox + 4]]
                    if c == 3:
                        TR = tr
                    else:
                        TR = [int(v) for v in Y[oy - 1, ox + 4:ox + 8]]
                    L = [int(v) for v in Y[oy:oy + 4, ox - 1]]
                    P = int(Y[oy - 1, ox - 1])
                    pred = _pred4(bm[b], A, TR, L, P)
                    co = blocks[b]
                    if co is None:
                        for rr in range(4):
                            Y[oy + rr, ox:ox + 4] = pred[rr]
                    else:
                        res = _idct(co)
                        for rr in range(4):
                            prow = pred[rr]
                            Y[oy + rr, ox:ox + 4] = [
                                _clip255(prow[cc] + res[4 * rr + cc])
                                for cc in range(4)]

            # ---- reconstruct chroma ----
            cy, cx = 1 + 8 * my, 1 + 8 * mx
            uvm = uvmodes[i]
            for pl, CP in ((0, U), (1, V)):
                _pred_block(CP, cy, cx, 8, uvm, my > 0, mx > 0)
                for b in range(4):
                    co = blocks[16 + 4 * pl + b]
                    if co is None:
                        continue
                    res = _idct(co)
                    oy, ox = cy + 4 * (b >> 1), cx + 4 * (b & 1)
                    blk = CP[oy:oy + 4, ox:ox + 4].astype(np.int32)
                    blk += np.asarray(res, np.int32).reshape(4, 4)
                    CP[oy:oy + 4, ox:ox + 4] = np.clip(
                        blk, 0, 255).astype(np.uint8)

    # strip virtual borders
    y = Y[1:, 1:W + 1]
    u = U[1:, 1:]
    v = V[1:, 1:]
    return w, h, mb_w, mb_h, y, u, v, mb_lvl, mb_nz, ymodes, lf


def _s8(x):
    # np.minimum/np.maximum are raw ufuncs; np.clip's Python dispatch
    # wrapper measured ~3x slower in the per-edge filter hot path
    return np.minimum(np.maximum(x, -128), 127)


def _lf_normal(p, vertical: bool, y0: int, x0: int, n: int,
               elimit: int, ilimit: int, hev_t: int, mb_edge: bool):
    """Normal loop filter on one edge segment of ``n`` pixels (RFC 6386
    §15.2-15.3), vectorized. The edge runs between column/row x0-1 and
    x0; reads/writes 4 pixels each side."""
    if vertical:
        win = p[y0:y0 + n, x0 - 4:x0 + 4].astype(np.int32)
    else:
        win = p[x0 - 4:x0 + 4, y0:y0 + n].astype(np.int32).T
    p3, p2, p1, p0 = win[:, 0], win[:, 1], win[:, 2], win[:, 3]
    q0, q1, q2, q3 = win[:, 4], win[:, 5], win[:, 6], win[:, 7]
    mask = (
        (np.abs(p3 - p2) <= ilimit) & (np.abs(p2 - p1) <= ilimit)
        & (np.abs(p1 - p0) <= ilimit) & (np.abs(q1 - q0) <= ilimit)
        & (np.abs(q2 - q1) <= ilimit) & (np.abs(q3 - q2) <= ilimit)
        & (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= elimit)
    )
    if not mask.any():
        return
    hev = (np.abs(p1 - p0) > hev_t) | (np.abs(q1 - q0) > hev_t)
    ps1, ps0 = p1 - 128, p0 - 128
    qs0, qs1 = q0 - 128, q1 - 128
    if mb_edge:
        ps2, qs2 = p2 - 128, q2 - 128
        wf = _s8(_s8(ps1 - qs1) + 3 * (qs0 - ps0)) * mask
        f2h = wf * hev
        f1 = _s8(f2h + 4) >> 3
        f2 = _s8(f2h + 3) >> 3
        qs0 = _s8(qs0 - f1)
        ps0 = _s8(ps0 + f2)
        wl = wf * ~hev
        u = _s8((27 * wl + 63) >> 7)
        qs0 = _s8(qs0 - u)
        ps0 = _s8(ps0 + u)
        u = _s8((18 * wl + 63) >> 7)
        qs1 = _s8(qs1 - u)
        ps1 = _s8(ps1 + u)
        u = _s8((9 * wl + 63) >> 7)
        qs2 = _s8(qs2 - u)
        ps2 = _s8(ps2 + u)
        win[:, 1] = ps2 + 128
        win[:, 6] = qs2 + 128
    else:
        a = _s8(_s8(ps1 - qs1) * hev + 3 * (qs0 - ps0)) * mask
        f1 = _s8(a + 4) >> 3
        f2 = _s8(a + 3) >> 3
        qs0 = _s8(qs0 - f1)
        ps0 = _s8(ps0 + f2)
        a2 = ((f1 + 1) >> 1) * ~hev
        qs1 = _s8(qs1 - a2)
        ps1 = _s8(ps1 + a2)
    win[:, 2] = ps1 + 128
    win[:, 3] = ps0 + 128
    win[:, 4] = qs0 + 128
    win[:, 5] = qs1 + 128
    out = win.astype(np.uint8)
    if vertical:
        p[y0:y0 + n, x0 - 4:x0 + 4] = out
    else:
        p[x0 - 4:x0 + 4, y0:y0 + n] = out.T


def _lf_simple(p, vertical: bool, y0: int, x0: int, n: int, elimit: int):
    """Simple loop filter (RFC 6386 §15.1): luma only, p0/q0 only."""
    if vertical:
        win = p[y0:y0 + n, x0 - 2:x0 + 2].astype(np.int32)
    else:
        win = p[x0 - 2:x0 + 2, y0:y0 + n].astype(np.int32).T
    p1, p0, q0, q1 = win[:, 0], win[:, 1], win[:, 2], win[:, 3]
    mask = np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= elimit
    if not mask.any():
        return
    ps1, ps0 = p1 - 128, p0 - 128
    qs0, qs1 = q0 - 128, q1 - 128
    a = _s8(_s8(ps1 - qs1) + 3 * (qs0 - ps0)) * mask
    f1 = _s8(a + 4) >> 3
    f2 = _s8(a + 3) >> 3
    win[:, 1] = _s8(ps0 + f2) + 128
    win[:, 2] = _s8(qs0 - f1) + 128
    out = win.astype(np.uint8)
    if vertical:
        p[y0:y0 + n, x0 - 2:x0 + 2] = out
    else:
        p[x0 - 2:x0 + 2, y0:y0 + n] = out.T


def _loop_filter(y, u, v, mb_w, mb_h, mb_lvl, mb_nz, ymodes, lf) -> None:
    (f_type, _lvl, sharp, _on, _rd, _md, _s, _a, _slf) = lf
    for my in range(mb_h):
        for mx in range(mb_w):
            i = my * mb_w + mx
            lvl = mb_lvl[i]
            if lvl == 0:
                continue
            il = lvl
            if sharp > 0:
                il >>= 2 if sharp > 4 else 1
                il = min(il, 9 - sharp)
            il = max(il, 1)
            hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
            mb_lim = ((lvl + 2) * 2) + il
            sb_lim = (lvl * 2) + il
            inner = mb_nz[i] or ymodes[i] == _BPRED
            yy, yx = 16 * my, 16 * mx
            cy, cx = 8 * my, 8 * mx
            if f_type == 0:  # normal
                if mx > 0:
                    _lf_normal(y, True, yy, yx, 16, mb_lim, il, hev_t, True)
                    _lf_normal(u, True, cy, cx, 8, mb_lim, il, hev_t, True)
                    _lf_normal(v, True, cy, cx, 8, mb_lim, il, hev_t, True)
                if inner:
                    for dx in (4, 8, 12):
                        _lf_normal(y, True, yy, yx + dx, 16,
                                   sb_lim, il, hev_t, False)
                    _lf_normal(u, True, cy, cx + 4, 8,
                               sb_lim, il, hev_t, False)
                    _lf_normal(v, True, cy, cx + 4, 8,
                               sb_lim, il, hev_t, False)
                if my > 0:
                    _lf_normal(y, False, yx, yy, 16, mb_lim, il, hev_t, True)
                    _lf_normal(u, False, cx, cy, 8, mb_lim, il, hev_t, True)
                    _lf_normal(v, False, cx, cy, 8, mb_lim, il, hev_t, True)
                if inner:
                    for dy in (4, 8, 12):
                        _lf_normal(y, False, yx, yy + dy, 16,
                                   sb_lim, il, hev_t, False)
                    _lf_normal(u, False, cx, cy + 4, 8,
                               sb_lim, il, hev_t, False)
                    _lf_normal(v, False, cx, cy + 4, 8,
                               sb_lim, il, hev_t, False)
            else:  # simple: luma only
                if mx > 0:
                    _lf_simple(y, True, yy, yx, 16, mb_lim)
                if inner:
                    for dx in (4, 8, 12):
                        _lf_simple(y, True, yy, yx + dx, 16, sb_lim)
                if my > 0:
                    _lf_simple(y, False, yx, yy, 16, mb_lim)
                if inner:
                    for dy in (4, 8, 12):
                        _lf_simple(y, False, yx, yy + dy, 16, sb_lim)


_MAX_PIXELS_DEFAULT = 16_000_000


def decode_yuv(data: bytes, max_pixels: int = _MAX_PIXELS_DEFAULT,
               filtered: bool = True):
    """Decode a VP8 key-frame bitstream (the `VP8 ` chunk payload) to
    ``(w, h, y, u, v)`` — Y is ``h*w`` bytes row-major, U/V are
    ``ceil(h/2)*ceil(w/2)`` (YUV420). ``filtered=False`` skips the loop
    filter (the bring-up differential against libwebp's
    ``bypass_filtering`` mode). Returns None on malformed headers;
    never raises on hostile input."""
    try:
        hdr = _parse_frame(bytes(data or b""), max_pixels)
        if hdr is None:
            return None
        (w, h, mb_w, mb_h, y, u, v,
         mb_lvl, mb_nz, ymodes, lf) = _reconstruct(hdr, max_pixels)
        if filtered:
            _loop_filter(y, u, v, mb_w, mb_h, mb_lvl, mb_nz, ymodes, lf)
        cw, ch = (w + 1) >> 1, (h + 1) >> 1
        return (w, h, y[:h, :w].tobytes(),
                u[:ch, :cw].tobytes(), v[:ch, :cw].tobytes())
    except (IndexError, ValueError, struct.error, MemoryError):
        return None


def decode(data: bytes, max_pixels: int = _MAX_PIXELS_DEFAULT):
    """Decode to ``(w, h, 4, rgba_bytes)`` like :func:`vp8l.decode`:
    integer BT.601 full-range conversion with nearest-neighbor chroma
    upsampling — dHash-equivalent to libwebp's RGBA output (which uses
    a bilinear 'fancy' upsampler), pinned at the dHash level in tests."""
    out = decode_yuv(data, max_pixels)
    if out is None:
        return None
    w, h, yb, ub, vb = out
    cw, ch = (w + 1) >> 1, (h + 1) >> 1
    y = np.frombuffer(yb, np.uint8).reshape(h, w).astype(np.int32)
    u = np.frombuffer(ub, np.uint8).reshape(ch, cw)
    v = np.frombuffer(vb, np.uint8).reshape(ch, cw)
    u = u.repeat(2, 0)[:h].repeat(2, 1)[:, :w].astype(np.int32) - 128
    v = v.repeat(2, 0)[:h].repeat(2, 1)[:, :w].astype(np.int32) - 128
    c = y - 16
    r = (298 * c + 409 * v + 128) >> 8
    g = (298 * c - 100 * u - 208 * v + 128) >> 8
    b = (298 * c + 516 * u + 128) >> 8
    rgba = np.empty((h, w, 4), np.uint8)
    rgba[..., 0] = np.clip(r, 0, 255)
    rgba[..., 1] = np.clip(g, 0, 255)
    rgba[..., 2] = np.clip(b, 0, 255)
    rgba[..., 3] = 255
    return w, h, 4, rgba.tobytes()
