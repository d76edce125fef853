"""webpcore (VP8L / WebP-lossless) codec tests.

The encoder exists to synthesize fixtures, so per the repo's codec rule
(CLAUDE.md) the encoder↔decoder round-trip alone proves nothing: every
decoder stage is ALSO pinned by a hand-built known-answer stream whose
bits are derived from the public spec in this file, using a test-local
bit writer — nothing routes through webpcore's own writer or tables.
"""

from __future__ import annotations

import itertools
import random

import pytest

from pdf_parser_spark.webpcore import (
    WebpError,
    _DIST_MAP,
    decode_vp8l,
    decode_webp,
    encode_webp_lossless,
)


# ------------------------------------------------- test-local writer
class W:
    """Independent LSB-first bit writer (reimplemented here on purpose)."""

    def __init__(self):
        self.bits = []

    def b(self, value, n):
        for i in range(n):
            self.bits.append((value >> i) & 1)
        return self

    def code(self, value, n):
        """Prefix-code bits are written MSB-first."""
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)
        return self

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                byte |= bit << j
            out.append(byte)
        return b"\x2f" + bytes(out)


def header(w, h, alpha=0):
    return W().b(w - 1, 14).b(h - 1, 14).b(alpha, 1).b(0, 3)


def simple_tree(wr, *syms):
    """Emit a simple prefix code (spec: 1 bit simple=1, 1 bit
    num_symbols-1, 1 bit is_first_8bits, symbols)."""
    wr.b(1, 1).b(len(syms) - 1, 1)
    if syms[0] < 2:
        wr.b(0, 1).b(syms[0], 1)
    else:
        wr.b(1, 1).b(syms[0], 8)
    if len(syms) == 2:
        wr.b(syms[1], 8)
    return wr


def two_sym_full_green(wr, a, b, alphabet=280):
    """Full (code-length-coded) green tree over ``alphabet`` symbols
    with exactly symbols a < b at length 1 — needed when a symbol is
    > 255, where the simple form's 8-bit field cannot reach.

    Bits per spec: simple=0; num_code_lengths-4 (4 bits); 3-bit lengths
    for the code-length alphabet in the order 17,18,0,1,...; here we
    declare cl symbols {0:len1, 1:len1} so num_code_lengths=4 covers
    order slots 17,18,0,1; no max_symbol; then one cl code per symbol
    (0→bit 0 = length 0, 1→bit 1 = length 1)."""
    wr.b(0, 1).b(0, 4)
    for l in (0, 0, 1, 1):  # lengths of cl symbols 17, 18, 0, 1
        wr.b(l, 3)
    wr.b(0, 1)  # no max_symbol shortcut
    for s in range(alphabet):
        wr.code(1 if s in (a, b) else 0, 1)
    return wr


def no_transforms_no_cache_no_meta(wr):
    return wr.b(0, 1).b(0, 1).b(0, 1)


# -------------------------------------------------- known-answer set
def test_kat_single_pixel_simple_codes():
    # 1x1, every tree single-symbol (0-bit reads): pixel r=1 g=2 b=3 a=255
    wr = header(1, 1)
    no_transforms_no_cache_no_meta(wr)
    simple_tree(wr, 2)  # green
    simple_tree(wr, 1)  # red
    simple_tree(wr, 3)  # blue
    simple_tree(wr, 255)  # alpha
    simple_tree(wr, 0)  # distance (never read)
    img = decode_vp8l(wr.bytes())
    assert (img["width"], img["height"]) == (1, 1)
    assert img["pixels"] == bytes([1, 2, 3, 255])


def test_kat_two_symbol_simple_code_order():
    # 2x1: green symbols {5, 9}: canonical simple code maps first-read
    # symbol to bit 0, second to bit 1.  Pixels green=9 then green=5.
    wr = header(2, 1)
    no_transforms_no_cache_no_meta(wr)
    simple_tree(wr, 5, 9)  # green: 5→0, 9→1
    simple_tree(wr, 7)  # red
    simple_tree(wr, 8)  # blue
    simple_tree(wr, 255)  # alpha
    simple_tree(wr, 0)  # distance
    wr.code(1, 1)  # pixel 0: green=9
    wr.code(0, 1)  # pixel 1: green=5
    img = decode_vp8l(wr.bytes())
    assert img["pixels"] == bytes([7, 9, 8, 255, 7, 5, 8, 255])


def test_kat_lz77_short_distance_codes():
    # 3x1: literal pixel, then a backward reference of length 2 with
    # distance code 2 → spec map entry #2 = (dx=1, dy=0) → dist 1:
    # the reference replays the first pixel twice.
    # green tree must span {66, 256}: symbol 256 = length-prefix 0 →
    # LZ77 length 1?  No: prefix code 0 means LENGTH VALUE 1; we want
    # length 2 → prefix code 1 → green symbol 257.
    wr = header(3, 1)
    no_transforms_no_cache_no_meta(wr)
    two_sym_full_green(wr, 66, 257)  # 66→code 0, 257→code 1 (len 1 each)
    simple_tree(wr, 10)  # red
    simple_tree(wr, 20)  # blue
    simple_tree(wr, 255)  # alpha
    simple_tree(wr, 1)  # distance tree: single symbol prefix-code 1 → value 2
    wr.code(0, 1)  # literal green=66
    wr.code(1, 1)  # green symbol 257 → length prefix 1 → length 2
    # distance tree is single-symbol → 0 bits; dist code value 2 → (1,0) → 1
    img = decode_vp8l(wr.bytes())
    assert img["pixels"] == bytes([10, 66, 20, 255] * 3)


def test_kat_color_cache():
    # 2x1 with a 1-bit color cache: literal pixel P, then cache hit.
    # P = argb(a=255, r=0, g=200, b=0) → hash = (0x1e35a7bd*P)>>31.
    P = (255 << 24) | (200 << 8)
    idx = ((0x1E35A7BD * P) & 0xFFFFFFFF) >> 31
    wr = header(2, 1)
    wr.b(0, 1)  # no transforms
    wr.b(1, 1).b(1, 4)  # color cache, 1 bit
    wr.b(0, 1)  # no meta
    two_sym_full_green(wr, 200, 280 + idx, alphabet=282)  # 256+24+2
    simple_tree(wr, 0)  # red
    simple_tree(wr, 0)  # blue
    simple_tree(wr, 255)  # alpha
    simple_tree(wr, 0)  # distance
    wr.code(0, 1)  # literal green=200 (inserts P into cache slot idx)
    wr.code(1, 1)  # green symbol 280+idx → cache hit → P again
    img = decode_vp8l(wr.bytes())
    assert img["pixels"] == bytes([0, 200, 0, 255] * 2)


def test_kat_subtract_green_transform():
    # 1x1 stored as (r-g, g, b-g) mod 256 = (250, 10, 2): decodes to
    # r=4, g=10, b=12.
    wr = header(1, 1)
    wr.b(1, 1).b(2, 2)  # one transform: subtract-green
    wr.b(0, 1)  # end of transforms
    wr.b(0, 1).b(0, 1)  # no cache, no meta
    simple_tree(wr, 10)  # green
    simple_tree(wr, 250)  # red residual
    simple_tree(wr, 2)  # blue residual
    simple_tree(wr, 255)  # alpha
    simple_tree(wr, 0)  # distance
    img = decode_vp8l(wr.bytes())
    assert img["pixels"] == bytes([4, 10, 12, 255])


def test_kat_predictor_transform_mode_L():
    # 2x2 with a predictor transform, one 4x4 tile → one mode pixel
    # with green=1 (mode L).  Spec borders: (0,0) predicts 0xff000000,
    # row 0 predicts L, column 0 predicts T; only (1,1) uses mode 1.
    # Residuals all (a=0, r=1, g=1, b=1) →
    #   (0,0) = residual + ff000000 = (1,1,1,255)
    #   (1,0) = res + (0,0)        = (2,2,2,255... a=res_a+255=255? a res 0 → 255)
    #   (0,1) = res + (0,0)        = (2,2,2,255)
    #   (1,1) = res + L=(0,1)px    = (3,3,3,255)
    wr = header(2, 2)
    wr.b(1, 1).b(0, 2)  # predictor transform
    wr.b(0, 3)  # size_bits = 2 → 4x4 tiles → 1x1 mode image
    # mode sub-image (1x1): its own cache bit + 5 trees
    wr.b(0, 1)  # no cache (sub-images read this too)
    simple_tree(wr, 1)  # green = mode 1 (L)
    simple_tree(wr, 0)
    simple_tree(wr, 0)
    simple_tree(wr, 0)
    simple_tree(wr, 0)
    wr.b(0, 1)  # end of transforms
    wr.b(0, 1).b(0, 1)  # main image: no cache, no meta
    simple_tree(wr, 1)  # green residual
    simple_tree(wr, 1)  # red residual
    simple_tree(wr, 1)  # blue residual
    simple_tree(wr, 0)  # alpha residual
    simple_tree(wr, 0)  # distance
    img = decode_vp8l(wr.bytes())
    assert img["pixels"] == bytes(
        [1, 1, 1, 255, 2, 2, 2, 255, 2, 2, 2, 255, 3, 3, 3, 255]
    )


def test_kat_color_indexing_bundled():
    # 4x1 palette image, 2 colors → 8 pixels/byte bundling: coded
    # width 1, one green byte 0b0110 → indices 0,1,1,0.
    # Palette is DELTA-coded: entries argb (opaque red, opaque blue)
    #   e0 = (255,255,0,0); delta e1 = e1 - e0 componentwise mod 256.
    # e0 = opaque red argb(255,255,0,0); e1 = opaque blue (255,0,0,255).
    # Palette entries are DELTA-coded per channel mod 256:
    #   e0 deltas (vs 0): da=255, dr=255, dg=0, db=0
    #   e1 deltas (vs e0): da=0, dr=(0-255)%256=1, dg=0, db=255
    wr = header(4, 1)
    wr.b(1, 1).b(3, 2)  # color-indexing transform
    wr.b(1, 8)  # n_colors - 1 = 1 → 2 colors
    wr.b(0, 1)  # palette sub-image: no cache
    simple_tree(wr, 0)  # green: both deltas 0 (single-symbol, 0 bits)
    simple_tree(wr, 255, 1)  # red: first-read symbol→code0, so 255→0, 1→1
    simple_tree(wr, 0, 255)  # blue: 0→code0, 255→code1
    simple_tree(wr, 255, 0)  # alpha: 255→code0, 0→code1
    simple_tree(wr, 0)  # distance
    wr.code(0, 1).code(0, 1).code(0, 1)  # e0: dr=255, db=0, da=255
    wr.code(1, 1).code(1, 1).code(1, 1)  # e1: dr=1, db=255, da=0
    wr.b(0, 1)  # end of transforms
    wr.b(0, 1).b(0, 1)  # main (coded 1x1): no cache, no meta
    simple_tree(wr, 0b0110)  # the one bundled green byte
    simple_tree(wr, 0)
    simple_tree(wr, 0)
    simple_tree(wr, 0)
    simple_tree(wr, 0)
    img = decode_vp8l(wr.bytes())
    red = bytes([255, 0, 0, 255])
    blue = bytes([0, 0, 255, 255])
    assert img["pixels"] == red + blue + blue + red


# ------------------------------------------------------- round trips
def test_roundtrip_option_matrix():
    rng = random.Random(7)
    for (w, h), ch, sg, cb, lz in itertools.product(
        [(1, 1), (3, 2), (8, 5), (16, 16), (33, 7)],
        [3, 4], [False, True], [0, 3], [False, True],
    ):
        px = bytearray()
        vals = None
        for i in range(w * h):
            if i % 4 == 0 or vals is None:
                vals = [rng.randrange(256) for _ in range(ch)]
            px.extend(vals)
        blob = encode_webp_lossless(
            w, h, bytes(px), ch,
            subtract_green=sg, cache_bits=cb, use_lz77=lz,
        )
        img = decode_webp(blob)
        exp = bytearray()
        for i in range(w * h):
            o = i * ch
            exp.extend(px[o : o + 3])
            exp.append(px[o + 3] if ch == 4 else 255)
        assert img["pixels"] == bytes(exp), (w, h, ch, sg, cb, lz)


def test_roundtrip_constant_image_long_run():
    # one color → single-symbol trees + a >4096-capable run split
    blob = encode_webp_lossless(80, 60, bytes([7, 8, 9]) * (80 * 60), 3, use_lz77=True)
    img = decode_webp(blob)
    assert img["pixels"] == bytes([7, 8, 9, 255]) * (80 * 60)


# --------------------------------------------------------- gates/fuzz
def test_lossy_vp8_is_typed_gate():
    import struct as _s

    body = b"\x00" * 20
    blob = (
        b"RIFF" + _s.pack("<I", 4 + 8 + len(body)) + b"WEBP"
        + b"VP8 " + _s.pack("<I", len(body)) + body
    )
    with pytest.raises(WebpError) as ei:
        decode_webp(blob)
    assert ei.value.code == "lossy_gate"


def test_distance_map_invariants():
    assert len(_DIST_MAP) == 120 and len(set(_DIST_MAP)) == 120
    assert all(-7 <= dx <= 8 and 0 <= dy <= 7 for dx, dy in _DIST_MAP)
    # verified-prefix spot checks against the libwebp decode formula
    assert _DIST_MAP[0] == (0, 1) and _DIST_MAP[1] == (1, 0)
    assert _DIST_MAP[2] == (1, 1) and _DIST_MAP[3] == (-1, 1)


def test_fuzz_typed_errors_only():
    rng = random.Random(11)
    base = encode_webp_lossless(5, 4, bytes(range(60)), 3, cache_bits=2, use_lz77=True)
    for trial in range(300):
        blob = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        try:
            decode_webp(bytes(blob[: rng.randrange(10, len(blob) + 1)]))
        except WebpError:
            pass  # typed: fine
        # bare IndexError/KeyError/struct.error etc. would fail the test
