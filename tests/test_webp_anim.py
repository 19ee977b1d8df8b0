"""Animated WebP (round 16 — VERDICT r15 ask #4): VP8X + ANIM + ANMF
over REAL VP8L frames — the last table-free WebP quarantine.  Pins:

- lossless roundtrip: full-canvas overwrite frames decode to their
  exact source pixels;
- compositing: subrect overwrite, integer src-over alpha blending
  ((c*a + d*(255-a) + 127) // 255 — hand-computed expected pixels),
  dispose-to-background, all against independent numpy references;
- the sampler's prefix-sum timestamp walk over NON-uniform delays;
- quarantines: lossy (VP8/ALPH) subframes, out-of-canvas rects, odd
  offsets, truncations/corruption (repo-wide fuzz contract);
- the still path: decode_webp_lossless walks STILL VP8X layouts
  through to their VP8L chunk (canvas dims cross-checked) but names
  animated files to decode_webp_anim; the production image seam
  treats an animated WebP like an animated GIF (first composited
  frame).

Reference: the public WebP container spec (RIFF/VP8X/ANIM/ANMF) and
the in-repo GIF89a compositor precedent (codecs.decode_gif)."""

import hashlib

import numpy as np
import pytest

from reindexer_spark.codecs import MediaFormatError, encode_webp_fixture
from reindexer_spark.vp8l import (
    WebpAnimSampler,
    decode_webp_anim,
    decode_webp_lossless,
    encode_webp_anim,
)


def _px(n, tag):
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.sha256(tag + str(i).encode()).digest()
        i += 1
    return bytes(out[:n])


def _anim(w, h, frames, **kw):
    return encode_webp_anim(w, h, frames, **kw)


def test_full_frame_overwrite_roundtrips_lossless():
    w, h = 22, 12
    srcs = [_px(w * h * 3, bytes([i])) for i in range(3)]
    p = _anim(
        w, h,
        [
            {"x": 0, "y": 0, "w": w, "h": h, "rgb": s,
             "duration_ms": 50 + 10 * i, "blend": False}
            for i, s in enumerate(srcs)
        ],
    )
    cw, ch, durs, frames = decode_webp_anim(p)
    assert (cw, ch) == (w, h)
    assert durs == [50, 60, 70]
    assert frames == srcs


def test_subrect_composite_and_dispose_background():
    w, h = 20, 14
    base = _px(w * h * 3, b"b")
    band = _px(w * 4 * 3, b"c")
    p = _anim(
        w, h,
        [
            {"x": 0, "y": 0, "w": w, "h": h, "rgb": base,
             "duration_ms": 40, "blend": False},
            {"x": 0, "y": 6, "w": w, "h": 4, "rgb": band,
             "duration_ms": 40, "blend": False, "dispose": True},
            {"x": 0, "y": 0, "w": w, "h": 2,
             "rgb": _px(w * 2 * 3, b"d"), "duration_ms": 40,
             "blend": False},
        ],
        bg_rgb=(1, 2, 3),
    )
    _, _, _, frames = decode_webp_anim(p)
    f1 = np.frombuffer(base, dtype=np.uint8).reshape(h, w, 3).copy()
    f1[6:10] = np.frombuffer(band, dtype=np.uint8).reshape(4, w, 3)
    assert frames[1] == f1.tobytes()
    # frame 2: the disposed band shows the background color
    f2 = np.frombuffer(frames[2], dtype=np.uint8).reshape(h, w, 3)
    assert (f2[7] == [1, 2, 3]).all()
    assert f2[12].tobytes() == f1[12].tobytes()  # untouched rows persist


def test_alpha_blend_integer_src_over():
    w, h = 16, 8
    base = _px(w * h * 3, b"e")
    over = _px(w * h * 3, b"f")
    alpha = _px(w * h, b"g")  # varying per-pixel alpha
    p = _anim(
        w, h,
        [
            {"x": 0, "y": 0, "w": w, "h": h, "rgb": base,
             "duration_ms": 30, "blend": False},
            {"x": 0, "y": 0, "w": w, "h": h, "rgb": over,
             "alpha": alpha, "duration_ms": 30, "blend": True},
        ],
    )
    _, _, _, frames = decode_webp_anim(p)
    a = np.frombuffer(alpha, dtype=np.uint8).reshape(h, w, 1).astype(
        np.uint16
    )
    src = np.frombuffer(over, dtype=np.uint8).reshape(h, w, 3).astype(
        np.uint16
    )
    dst = np.frombuffer(base, dtype=np.uint8).reshape(h, w, 3).astype(
        np.uint16
    )
    exp = ((src * a + dst * (255 - a) + 127) // 255).astype(np.uint8)
    assert frames[1] == exp.tobytes()


def test_sampler_prefix_sum_over_nonuniform_delays():
    w, h = 10, 10
    p = _anim(
        w, h,
        [
            {"x": 0, "y": 0, "w": w, "h": h,
             "rgb": _px(w * h * 3, bytes([i])),
             "duration_ms": d, "blend": False}
            for i, d in enumerate([30, 110, 20, 90])
        ],
    )
    s = WebpAnimSampler()
    assert s.duration_ms(p) == 250
    marks = [(0, 0), (29, 0), (30, 1), (139, 1), (140, 2),
             (159, 2), (160, 3), (249, 3), (9999, 3)]
    for ts, want in marks:
        assert s.frame_index_at(p, ts) == want, (ts, want)
    # frame_at emits a BMP of the canvas dims
    from reindexer_spark.codecs import decode_bmp

    bw, bh, _rgb = decode_bmp(s.frame_at(p, 140))
    assert (bw, bh) == (w, h)


def test_quarantines():
    w, h = 12, 10
    rgb = _px(w * h * 3, b"q")
    # lossy subframes (the probe fixture writes VP8 filler)
    with pytest.raises(MediaFormatError, match="probe-only"):
        decode_webp_anim(encode_webp_fixture(w, h, "vp8x-anim", 2, b"s"))
    # still lossless files are not animations
    from reindexer_spark.vp8l import encode_webp_lossless

    with pytest.raises(MediaFormatError):
        decode_webp_anim(encode_webp_lossless(w, h, rgb))
    # the still decode path names animated layouts to the compositor
    p = _anim(w, h, [{"x": 0, "y": 0, "w": w, "h": h, "rgb": rgb,
                      "blend": False}])
    with pytest.raises(MediaFormatError, match="decode_webp_anim"):
        decode_webp_lossless(p)
    # encoder refuses odd offsets and out-of-canvas rects
    with pytest.raises(MediaFormatError, match="even"):
        _anim(w, h, [{"x": 1, "y": 0, "w": 4, "h": 4,
                      "rgb": _px(48, b"o"), "blend": False}])
    with pytest.raises(MediaFormatError, match="canvas"):
        _anim(w, h, [{"x": 8, "y": 8, "w": 8, "h": 8,
                      "rgb": _px(192, b"o"), "blend": False}])


def test_fuzz_quarantine_contract():
    rng = np.random.default_rng(17)
    w, h = 14, 8
    base = _anim(
        w, h,
        [
            {"x": 0, "y": 0, "w": w, "h": h,
             "rgb": _px(w * h * 3, b"z"), "duration_ms": 50,
             "blend": False},
            {"x": 0, "y": 2, "w": w, "h": 4,
             "rgb": _px(w * 4 * 3, b"y"),
             "alpha": _px(w * 4, b"x"), "duration_ms": 60,
             "blend": True},
        ],
    )
    for _ in range(120):
        buf = bytearray(base)
        mode = rng.integers(0, 3)
        if mode == 0:
            buf = buf[: int(rng.integers(4, len(buf)))]
        elif mode == 1:
            for _k in range(6):
                buf[int(rng.integers(0, len(buf)))] = int(
                    rng.integers(0, 256)
                )
        else:
            buf += bytes(rng.integers(0, 256, 11, dtype=np.uint8))
        try:
            decode_webp_anim(bytes(buf))
        except MediaFormatError:
            pass


def test_vp8x_still_walks_through_to_vp8l():
    """Round 16: a STILL extended layout (VP8X without the ANIM flag,
    e.g. alpha/metadata riding along) decodes through to its VP8L
    chunk; canvas-dim disagreement quarantines."""
    import struct

    from reindexer_spark.vp8l import encode_vp8l

    w, h = 18, 11
    rgb = _px(w * h * 3, b"st")
    body = encode_vp8l(w, h, rgb)

    def riff(cid, b):
        return cid + struct.pack("<I", len(b)) + b + (
            b"\x00" if len(b) & 1 else b""
        )

    def build(cw, ch, flags=0x10):
        vp8x = bytes([flags, 0, 0, 0]) + (cw - 1).to_bytes(
            3, "little"
        ) + (ch - 1).to_bytes(3, "little")
        chunks = riff(b"VP8X", vp8x) + riff(b"VP8L", body)
        return (
            b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP"
            + chunks
        )

    assert decode_webp_lossless(build(w, h)) == (w, h, rgb)
    with pytest.raises(MediaFormatError, match="disagree"):
        decode_webp_lossless(build(w + 2, h))
    # the production image seam routes it too
    from reindexer_spark.codecs import _decode_image

    assert _decode_image("webp", build(w, h)) == (w, h, rgb)


def test_image_seam_decodes_animated_first_frame():
    """The production still-image path treats an animated WebP like
    an animated GIF: the first COMPOSITED frame."""
    from reindexer_spark.codecs import _decode_image

    w, h = 14, 10
    f0 = _px(w * h * 3, b"sf")
    p = _anim(
        w, h,
        [
            {"x": 0, "y": 0, "w": w, "h": h, "rgb": f0,
             "duration_ms": 50, "blend": False},
            {"x": 0, "y": 2, "w": w, "h": 4,
             "rgb": _px(w * 4 * 3, b"sg"), "duration_ms": 50,
             "blend": False},
        ],
    )
    assert _decode_image("webp", p) == (w, h, f0)
    # VP8-filler animations still refuse through the seam
    with pytest.raises(MediaFormatError):
        _decode_image(
            "webp", encode_webp_fixture(w, h, "vp8x-anim", 2, b"sq")
        )
