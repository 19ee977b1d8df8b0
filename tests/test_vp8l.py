"""VP8L (WebP lossless) codec tests: encoder/decoder roundtrips plus
DIRECTED hand-built bitstreams for the decoder surface the minimal
fixture encoder never emits — color cache, LZ77 backward references
(plain and 2D-mapped distances), color indexing with packed indices,
the predictor and color transforms, meta prefix groups, and 1/2-symbol
simple codes.  Each directed stream is written field-by-field from the
spec and checked against hand-computed pixels."""

from __future__ import annotations

import hashlib

import pytest

from reindexer_spark.codecs import MediaFormatError, encode_webp_fixture
from reindexer_spark.vp8l import (
    _DIST_MAP,
    _LsbWriter,
    _write_full_8bit_code,
    _write_single_symbol,
    decode_vp8l,
    decode_webp_lossless,
    encode_webp_lossless,
)


def _rgb(seed: bytes, n: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.sha256(seed + bytes([i])).digest()
        i += 1
    return bytes(out[:n])


def test_roundtrip_plain_and_subtract_green():
    for w, h in ((1, 1), (3, 2), (16, 12), (33, 7)):
        rgb = _rgb(bytes([w, h]), w * h * 3)
        for sg in (False, True):
            data = encode_webp_lossless(w, h, rgb, subtract_green=sg)
            dw, dh, out = decode_webp_lossless(data)
            assert (dw, dh, out) == (w, h, rgb)


# libwebp's plane_to_code_lut (public domain table, lossless decoder):
# 8 rows x 16 columns; entry v at (row, col) means distance code v+1
# maps to the 2D offset (x = 8 - col, y = row); 255 = unused slot.
_PLANE_TO_CODE_LUT = [
    96,  73,  55,  39,  23,  13,   5,   1, 255, 255, 255, 255, 255, 255, 255, 255,  # noqa: E501
    101, 78,  58,  42,  26,  16,   8,   2,   0,   3,   9,  17,  27,  43,  59,  79,  # noqa: E501
    102, 86,  62,  46,  32,  20,  10,   6,   4,   7,  11,  21,  33,  47,  63,  87,  # noqa: E501
    105, 90,  70,  52,  37,  28,  18,  14,  12,  15,  19,  29,  38,  53,  71,  91,  # noqa: E501
    110, 99,  82,  66,  48,  35,  30,  24,  22,  25,  31,  36,  49,  67,  83, 100,  # noqa: E501
    115, 108, 94,  76,  64,  50,  44,  40,  34,  41,  45,  51,  65,  77,  95, 109,  # noqa: E501
    118, 113, 103, 92,  80,  68,  60,  56,  54,  57,  61,  69,  81,  93, 104, 114,  # noqa: E501
    119, 116, 111, 106, 97,  88,  84,  74,  72,  75,  85,  89,  98, 107, 112, 117,  # noqa: E501
]


def test_dist_map_matches_libwebp_lut_all_120_entries():
    """Pin EVERY entry against the published plane_to_code_lut — a
    prefix pin missed the round-11 bug where codes 97-120 were wrong
    (domain was y<=8 / |x|<=8 instead of y<=7 / x in [-7,8])."""
    real = {}
    for i, v in enumerate(_PLANE_TO_CODE_LUT):
        if v == 255:
            continue
        y, col = divmod(i, 16)
        real[v] = (8 - col, y)
    assert len(real) == 120
    assert _DIST_MAP == [real[i] for i in range(120)]
    assert len(set(_DIST_MAP)) == 120
    assert all(y >= 0 and (y > 0 or x > 0) for x, y in _DIST_MAP)
    # d² never decreases along the table
    d2 = [x * x + y * y for x, y in _DIST_MAP]
    assert d2 == sorted(d2)


def test_lossy_and_extended_layouts_still_quarantine():
    for layout in ("vp8", "vp8x-anim"):
        with pytest.raises(MediaFormatError):
            decode_webp_lossless(
                encode_webp_fixture(8, 8, layout, 3, b"q")
            )
    # probe-fixture VP8L (filler body, not a real bitstream) must
    # quarantine too, never emit pixels
    with pytest.raises(MediaFormatError):
        decode_webp_lossless(encode_webp_fixture(10, 10, "vp8l"))


# ---------------------------------------------------------------------------
# directed-bitstream helpers
# ---------------------------------------------------------------------------


def _emit_full_code(w: _LsbWriter, lengths: list[int]) -> None:
    """Transmit an arbitrary code-length array through the code-length
    code, sending every symbol length literally (clc = equal-length
    canonical codes over the distinct values)."""
    w.bits(0, 1)  # not simple
    w.bits(15, 4)  # transmit all 19 clc entries
    used = sorted(set(lengths))
    nbits = max(1, (len(used) - 1).bit_length())
    clc_len = {v: nbits for v in used}
    order = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
             15, 16)
    for c in order:
        w.bits(clc_len.get(c, 0), 3)
    w.bits(0, 1)  # no max_symbol
    codes = {v: i for i, v in enumerate(used)}  # canonical, equal len
    for ln in lengths:
        w.code(codes[ln], nbits)


def _header(w: _LsbWriter, width: int, height: int) -> None:
    w.bits(width - 1, 14)
    w.bits(height - 1, 14)
    w.bits(0, 1)
    w.bits(0, 3)


def _const_group(w: _LsbWriter, g: int, r: int, b: int, a: int) -> None:
    """A prefix group whose every code is a single symbol — decodes a
    constant pixel with zero data bits."""
    _write_single_symbol(w, g)
    _write_single_symbol(w, r)
    _write_single_symbol(w, b)
    _write_single_symbol(w, a)
    _write_single_symbol(w, 0)  # distance (unused)


def _finish(w: _LsbWriter) -> bytes:
    return b"\x2f" + w.finish()


def _canon(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) canonical assignment, mirroring the
    decoder's (length, symbol) ordering."""
    pairs = sorted((ln, s) for s, ln in enumerate(lengths) if ln)
    out = {}
    code = 0
    prev = pairs[0][0]
    for ln, s in pairs:
        code <<= ln - prev
        prev = ln
        out[s] = (code, ln)
        code += 1
    return out


def test_directed_predictor_transform_and_two_symbol_simple_codes():
    """4×2, one predictor block (mode 1 = Left): residuals are zero
    everywhere except the seed pixel, so the whole image reconstructs
    to one color.  Green/red/blue use 2-symbol simple codes."""
    w = _LsbWriter()
    _header(w, 4, 2)
    w.bits(1, 1)  # transform present
    w.bits(0, 2)  # predictor
    w.bits(2, 3)  # size_bits-2 = 2 → 16-px blocks → 1×1 mode image
    w.bits(0, 1)  # mode image: no cache
    _const_group(w, 1, 0, 0, 0)  # mode 1 in the green channel
    w.bits(0, 1)  # no more transforms
    w.bits(0, 1)  # no cache
    w.bits(0, 1)  # no meta

    def two_sym(a, b):  # 2-symbol simple code; canonical: min gets 0
        w.bits(1, 1)
        w.bits(1, 1)  # two symbols
        w.bits(1, 1)  # first in 8 bits
        w.bits(a, 8)
        w.bits(b, 8)

    two_sym(110, 0)  # green: seed residual 110, rest 0
    two_sym(100, 0)  # red
    two_sym(120, 0)  # blue
    _write_single_symbol(w, 0)  # alpha residual: always 0
    _write_single_symbol(w, 0)  # distance
    # pixel stream: seed pixel (g=110, r=100, b=120), then 7× zeros.
    # canonical 1-bit codes: smaller symbol → 0, larger → 1
    for i in range(8):
        if i == 0:
            w.code(1, 1)  # green 110
            w.code(1, 1)  # red 100
            w.code(1, 1)  # blue 120
        else:
            w.code(0, 1)
            w.code(0, 1)
            w.code(0, 1)
    dw, dh, rgb = decode_vp8l(_finish(w))
    assert (dw, dh) == (4, 2)
    assert rgb == bytes([100, 110, 120]) * 8


def test_directed_color_indexing_packed():
    """6×1 with a 3-color palette → 4-bit packed indices (packed width
    3): palette deltas accumulate componentwise."""
    w = _LsbWriter()
    _header(w, 6, 1)
    w.bits(1, 1)
    w.bits(3, 2)  # color indexing
    w.bits(2, 8)  # n_colors - 1
    # palette image (3×1): deltas c0=(255,10,20,30), d1=(0,5,5,5),
    # d2=(0,240,0,0) → colors accumulate mod 256
    w.bits(0, 1)  # no cache
    lengths_g = [0] * 280
    deltas = [
        (255, 10, 20, 30),
        (0, 5, 5, 5),
        (0, 240, 0, 0),
    ]
    for _, _, g, _ in deltas:
        lengths_g[g] = 0  # placeholder (set below)
    gs = sorted({g for _, _, g, _ in deltas})
    rs = sorted({r for _, r, _, _ in deltas})
    bs = sorted({b for _, _, _, b in deltas})
    as_ = sorted({a for a, _, _, _ in deltas})

    def emit_set(vals, alphabet):
        if len(vals) == 1:
            _write_single_symbol(w, vals[0])
            return {vals[0]: (0, 0)}
        lengths = [0] * alphabet
        nb = max(1, (len(vals) - 1).bit_length())
        for v in vals:
            lengths[v] = nb
        _emit_full_code(w, lengths)
        return _canon(lengths)

    gc = emit_set(gs, 280)
    rc = emit_set(rs, 256)
    bc = emit_set(bs, 256)
    ac = emit_set(as_, 256)
    _write_single_symbol(w, 0)
    for a, r, g, b in deltas:
        for val, cm in ((g, gc), (r, rc), (b, bc), (a, ac)):
            code, ln = cm[val]
            if ln:
                w.code(code, ln)
    # main image: 3 colors → wb=2 → FOUR 2-bit indices per byte,
    # packed width ceil(6/4)=2; indices [0,1,2,0,1,0] →
    # bytes [0|1<<2|2<<4|0<<6, 1|0<<2]
    w.bits(0, 1)  # no more transforms
    w.bits(0, 1)  # no cache
    w.bits(0, 1)  # no meta
    packed = [0 | (1 << 2) | (2 << 4), 1]
    lengths_g = [0] * 280
    for v in set(packed):
        lengths_g[v] = 2
    _emit_full_code(w, lengths_g)
    _write_single_symbol(w, 0)  # red
    _write_single_symbol(w, 0)  # blue
    _write_single_symbol(w, 255)  # alpha
    _write_single_symbol(w, 0)  # distance
    cm = _canon(lengths_g)
    for v in packed:
        code, ln = cm[v]
        w.code(code, ln)
    dw, dh, rgb = decode_vp8l(_finish(w))
    # palette colors (a,r,g,b): c0=(255,10,20,30), c1=(255,15,25,35),
    # c2=(255,255,25,35)
    exp = [
        (10, 20, 30), (15, 25, 35), (255, 25, 35),
        (10, 20, 30), (15, 25, 35), (10, 20, 30),
    ]
    assert (dw, dh) == (6, 1)
    assert rgb == bytes(v for px in exp for v in px)


def test_directed_color_transform():
    """4×1, one color-transform block with green_to_red=1: decoded
    red = stored + (g >> 5)."""
    w = _LsbWriter()
    _header(w, 4, 1)
    w.bits(1, 1)
    w.bits(1, 2)  # color transform
    w.bits(0, 3)  # size_bits-2 = 0 → 4-px blocks → 1×1 element image
    w.bits(0, 1)  # element image: no cache
    # element pixel: g2r lives in the BLUE channel
    _const_group(w, 0, 0, 1, 0)
    w.bits(0, 1)  # no more transforms
    w.bits(0, 1)
    w.bits(0, 1)
    _const_group(w, 64, 48, 77, 255)  # constant transformed pixel
    dw, dh, rgb = decode_vp8l(_finish(w))
    # delta = (int8(1) * int8(64)) >> 5 = 2 → red 48+2, blue unchanged
    # (g2b = 0, r2b = 0)
    assert (dw, dh) == (4, 1)
    assert rgb == bytes([50, 64, 77]) * 4


def test_directed_cache_and_lz77_plain_distance():
    """4×1: literal, cache hit, then an LZ77 run (length 2, plain
    distance 1) — exercising the cache-insert-during-copy path."""
    argb = (255 << 24) | (10 << 16) | (20 << 8) | 30
    cache_bits = 2
    idx = (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)
    w = _LsbWriter()
    _header(w, 4, 1)
    w.bits(0, 1)  # no transform
    w.bits(1, 1)  # cache used
    w.bits(cache_bits, 4)
    w.bits(0, 1)  # no meta
    # green alphabet 256+24+4; used: 20 (literal), 257 (length code 1
    # → value 2), 280+idx (cache)
    lengths_g = [0] * (256 + 24 + 4)
    for s in (20, 257, 280 + idx):
        lengths_g[s] = 2
    _emit_full_code(w, lengths_g)
    _write_single_symbol(w, 10)   # red
    _write_single_symbol(w, 30)   # blue
    _write_single_symbol(w, 255)  # alpha
    # distance value 121 (plain distance 1): code 13 → extra=5,
    # offset=(2+1)<<5=96, value=96+rb+1 → rb=24 ✓ (fits in 5 bits)
    _write_single_symbol(w, 13)
    cm = _canon(lengths_g)
    code, ln = cm[20]
    w.code(code, ln)  # literal pixel
    code, ln = cm[280 + idx]
    w.code(code, ln)  # cache hit
    code, ln = cm[257]
    w.code(code, ln)  # length 2
    w.bits(24, 5)  # distance extra bits → dist_val 121 → plain dist 1
    dw, dh, rgb = decode_vp8l(_finish(w))
    assert (dw, dh) == (4, 1)
    assert rgb == bytes([10, 20, 30]) * 4


def test_directed_lz77_2d_distance():
    """2×2 image: row 0 = two literals, row 1 = LZ77 copy with 2D
    distance code 1 → (0, 1) → exactly one row up."""
    w = _LsbWriter()
    _header(w, 2, 2)
    w.bits(0, 1)  # no transform
    w.bits(0, 1)  # no cache
    w.bits(0, 1)  # no meta
    lengths_g = [0] * 280
    for s in (40, 50, 257):  # two literal greens + length-2 code
        lengths_g[s] = 2
    _emit_full_code(w, lengths_g)
    _write_single_symbol(w, 7)    # red
    _write_single_symbol(w, 9)    # blue
    _write_single_symbol(w, 255)  # alpha
    _write_single_symbol(w, 0)    # distance: code 0 → value 1 → 2D (0,1)
    cm = _canon(lengths_g)
    for s in (40, 50, 257):
        code, ln = cm[s]
        w.code(code, ln)
    dw, dh, rgb = decode_vp8l(_finish(w))
    assert (dw, dh) == (2, 2)
    row0 = bytes([7, 40, 9, 7, 50, 9])
    assert rgb == row0 + row0  # row 1 copied from one row above


def test_directed_lz77_2d_distance_code_97():
    """9×1: eight literals then a length-1 copy with 2D distance value
    97 → (8, 0) → dist 8, copying pixel 0.  Code 97 sits in the
    97-120 block the round-11 map generated WRONG ((0, 8), which here
    would be dist 72 → out-of-range error) — a directed decode through
    the fixed region, not just a table pin."""
    w = _LsbWriter()
    _header(w, 9, 1)
    w.bits(0, 1)  # no transform
    w.bits(0, 1)  # no cache
    w.bits(0, 1)  # no meta
    lengths_g = [0] * 280
    for g in range(1, 9):  # eight literal greens 1..8
        lengths_g[g] = 4
    lengths_g[256] = 4     # length code 0 → value 1
    _emit_full_code(w, lengths_g)
    _write_single_symbol(w, 5)    # red
    _write_single_symbol(w, 6)    # blue
    _write_single_symbol(w, 255)  # alpha
    # distance code 13: extra=5, offset=(2+1)<<5=96 → value 96+rb+1;
    # rb=0 → dist_val 97 → _DIST_MAP[96] = (8, 0) → dist 8
    _write_single_symbol(w, 13)
    cm = _canon(lengths_g)
    for g in range(1, 9):
        code, ln = cm[g]
        w.code(code, ln)
    code, ln = cm[256]
    w.code(code, ln)  # length 1
    w.bits(0, 5)      # distance extra bits → dist_val 97
    dw, dh, rgb = decode_vp8l(_finish(w))
    assert (dw, dh) == (9, 1)
    expect = b"".join(bytes([5, g, 6]) for g in range(1, 9))
    assert rgb == expect + bytes([5, 1, 6])  # last px copies px 0


def test_directed_meta_prefix_groups():
    """8×1 with meta blocks of 4 px: two prefix groups decode two
    different constant colors."""
    w = _LsbWriter()
    _header(w, 8, 1)
    w.bits(0, 1)  # no transform
    w.bits(0, 1)  # no cache
    w.bits(1, 1)  # meta prefix
    w.bits(0, 3)  # meta_bits-2 = 0 → blocks of 4 → meta image 2×1
    # meta image: pixels' (red<<8|green) = group ids 0 and 1
    w.bits(0, 1)  # meta image: no cache
    lengths_g = [0] * 280
    lengths_g[0] = 1
    lengths_g[1] = 1
    _emit_full_code(w, lengths_g)
    _write_single_symbol(w, 0)    # red
    _write_single_symbol(w, 0)    # blue
    _write_single_symbol(w, 0)    # alpha
    _write_single_symbol(w, 0)    # distance
    w.code(0, 1)  # group 0
    w.code(1, 1)  # group 1
    # two groups, constant colors
    _const_group(w, 1, 2, 3, 255)
    _const_group(w, 4, 5, 6, 255)
    dw, dh, rgb = decode_vp8l(_finish(w))
    assert (dw, dh) == (8, 1)
    assert rgb == bytes([2, 1, 3]) * 4 + bytes([5, 4, 6]) * 4


def test_corruption_quarantines_never_crashes():
    rgb = _rgb(b"z", 9 * 7 * 3)
    data = bytearray(encode_webp_lossless(9, 7, rgb))
    for pos in range(20, min(len(data), 140), 7):
        bad = bytearray(data)
        bad[pos] ^= 0x5A
        try:
            decode_webp_lossless(bytes(bad))
        except MediaFormatError:
            pass  # quarantine is the contract; wrong-pixel silence is
            # possible for payload-only corruption (entropy streams
            # carry no checksum), crashes are not
