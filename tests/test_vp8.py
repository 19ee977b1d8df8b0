"""VP8 lossy keyframe codec (reindexer_spark.vp8): boolean-coder
round-trip fuzz, transform sanity, closed-loop encode/decode equality
(decoder output ≡ encoder reconstruction THROUGH the simple loop
filter), provenance gating, and subset quarantines.  No Spark."""

from __future__ import annotations

import hashlib
import random

import pytest

from reindexer_spark.codecs import MediaFormatError, encode_webp_fixture
from reindexer_spark.vp8 import (
    BoolDecoder,
    BoolEncoder,
    COEFF_PROBS,
    VP8_MARKER_UUID,
    decode_coeffs,
    decode_vp8_keyframe,
    decode_webp_lossy,
    encode_coeffs,
    encode_vp8_keyframe,
    encode_webp_lossy,
    fdct4x4,
    fwht4x4,
    idct4x4,
    iwht4x4,
    quant_factors,
    vp8_payload_digest,
)


def _rgb(w: int, h: int, seed: bytes) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < 3 * w * h:
        out += hashlib.sha256(seed + i.to_bytes(4, "big")).digest()
        i += 1
    return bytes(out[: 3 * w * h])


# ---------------------------------------------------------------------------
# boolean coder
# ---------------------------------------------------------------------------


def test_bool_coder_roundtrip_fuzz():
    rng = random.Random(20260815)
    for trial in range(50):
        n = rng.randrange(1, 400)
        probs = [rng.randrange(1, 255) for _ in range(n)]
        bits = [rng.randrange(2) for _ in range(n)]
        be = BoolEncoder()
        for p, b in zip(probs, bits):
            be.bool(p, b)
        data = be.finish()
        bd = BoolDecoder(data)
        assert [bd.bool(p) for p in probs] == bits, f"trial {trial}"


def test_bool_coder_literals_and_extremes():
    be = BoolEncoder()
    be.literal(8, 201)
    be.signed_literal(6, -33)
    for _ in range(64):
        be.bool(1, 0)  # extreme prob, likely branch
        be.bool(254, 1)
    data = be.finish()
    bd = BoolDecoder(data)
    assert bd.literal(8) == 201
    assert bd.signed_literal(6) == -33
    for _ in range(64):
        assert bd.bool(1) == 0
        assert bd.bool(254) == 1


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def test_idct_dc_only_flat():
    # DC-only coefficients produce a flat block at (dc + 4) >> 3
    out = idct4x4([100] + [0] * 15)
    assert all(v == out[0] for v in out)
    assert out[0] == (100 + 4) >> 3  # unit DC gain with +4 >> 3 rounding


def test_fdct_idct_roundtrip_small_error():
    rng = random.Random(7)
    for _ in range(50):
        blk = [rng.randrange(-128, 128) for _ in range(16)]
        rec = idct4x4(fdct4x4(blk))
        for a, b in zip(blk, rec):
            assert abs(a - b) <= 2  # fixed-point round error only


def test_fwht_iwht_roundtrip_small_error():
    rng = random.Random(9)
    for _ in range(50):
        blk = [rng.randrange(-512, 512) for _ in range(16)]
        rec = iwht4x4(fwht4x4(blk))
        for a, b in zip(blk, rec):
            assert abs(a - b) <= 2


def test_quant_factors_spec_multipliers():
    qf = quant_factors(40)
    dc, ac = qf["y"]
    assert qf["y2"][0] == dc * 2
    assert qf["y2"][1] == max(8, ac * 155 // 100)
    assert qf["uv"][0] == min(dc, 132)
    assert qf["uv"][1] == ac


# ---------------------------------------------------------------------------
# token coding
# ---------------------------------------------------------------------------


def test_coeff_block_roundtrip_all_shapes():
    rng = random.Random(11)
    cases = [
        [0] * 16,                                   # all zero
        [3] + [0] * 15,                             # DC only
        [0, 1, -1] + [0] * 13,                      # small with zeros
        [5, -7, 11, 19, 35, 67, 200, -2048] + [0] * 8,  # every category
        [1] * 16,                                   # dense, no EOB
        [0, 0, 0, 2] + [0] * 12,                    # leading zero run
    ]
    for _ in range(30):
        cases.append([
            rng.choice([0, 0, 0, 1, -1, 2, -5, 9, 40, 300])
            for _ in range(16)
        ])
    for plane, first in ((0, 1), (1, 0), (2, 0)):
        for ctx0 in (0, 1, 2):
            for coefs in cases:
                c = list(coefs)
                if first == 1:
                    c[0] = 0
                be = BoolEncoder()
                encode_coeffs(be, c, plane, ctx0, first)
                bd = BoolDecoder(be.finish())
                got = decode_coeffs(bd, plane, ctx0, first)
                assert got == c, (plane, first, ctx0, c, got)


def test_coeff_probs_shape():
    assert len(COEFF_PROBS) == 4
    assert all(len(p) == 8 for p in COEFF_PROBS)
    assert all(len(b) == 3 for p in COEFF_PROBS for b in p)
    assert all(
        1 <= v <= 254
        for p in COEFF_PROBS for b in p for c in b for v in c
    )


# ---------------------------------------------------------------------------
# closed-loop keyframe
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ft", ["simple", "normal"])
@pytest.mark.parametrize(
    "w,h,qi",
    [(16, 16, 16), (32, 32, 32), (48, 16, 8), (12, 10, 40), (17, 5, 64)],
)
def test_keyframe_closed_loop(w, h, qi, ft):
    """decode(encode(img)) == the encoder's own reconstruction, exactly
    — including non-multiple-of-16 dims, under BOTH loop filters."""
    rgb = _rgb(w, h, b"vp8-%d-%d" % (w, h))
    payload, recon = encode_vp8_keyframe(w, h, rgb, qi, filter_type=ft)
    dw, dh, out = decode_vp8_keyframe(payload)
    assert (dw, dh) == (w, h)
    assert out == recon
    assert len(out) == 3 * w * h


def test_filter_types_actually_differ():
    """The two filters must produce different reconstructions on real
    residue (otherwise the filter_type bit isn't exercised) and the
    normal filter touches chroma (the simple filter is luma-only)."""
    w, h = 32, 32
    rgb = _rgb(w, h, b"ftdiff")
    _, r_simple = encode_vp8_keyframe(w, h, rgb, 40, "simple")
    _, r_normal = encode_vp8_keyframe(w, h, rgb, 40, "normal")
    assert r_simple != r_normal


def test_keyframe_flat_image_skips():
    """A constant image quantizes to all-zero residue: every MB takes
    the skip path and the stream stays tiny."""
    w, h = 32, 32
    rgb = bytes([77, 140, 200]) * (w * h)
    payload, recon = encode_vp8_keyframe(w, h, rgb, 32)
    dw, dh, out = decode_vp8_keyframe(payload)
    assert (dw, dh) == (w, h) and out == recon
    assert len(payload) < 200


def test_lossy_is_actually_lossy_but_close():
    """Reconstruction error beyond the 4:2:0 chroma-subsampling floor
    (the dominant loss on white-noise fixtures) is bounded by the
    quantizer scale."""
    import statistics

    from reindexer_spark.vp8 import rgb_to_yuv420, yuv420_to_rgb

    w, h = 16, 16
    rgb = _rgb(w, h, b"lossy")
    _, recon = encode_vp8_keyframe(w, h, rgb, 24)
    assert recon != rgb  # quantized
    y, u, v = rgb_to_yuv420(rgb, w, h)
    floor = yuv420_to_rgb(y, u, v, w, h)
    err = statistics.mean(abs(a - b) for a, b in zip(rgb, recon))
    err_floor = statistics.mean(abs(a - b) for a, b in zip(rgb, floor))
    assert err - err_floor < 8  # codec loss on top of subsampling


def test_quality_monotone():
    """Lower qi → smaller quant steps → closer reconstruction."""
    w, h = 16, 16
    rgb = _rgb(w, h, b"qmono")
    def err(qi):
        _, recon = encode_vp8_keyframe(w, h, rgb, qi)
        return sum(abs(a - b) for a, b in zip(rgb, recon))
    assert err(4) <= err(40) <= err(120)


# ---------------------------------------------------------------------------
# container + provenance
# ---------------------------------------------------------------------------


def test_webp_lossy_roundtrip_and_probe():
    from reindexer_spark.codecs import probe_media

    w, h = 20, 14
    rgb = _rgb(w, h, b"container")
    webp, recon = encode_webp_lossy(w, h, rgb, 30)
    dw, dh, out = decode_webp_lossy(webp)
    assert (dw, dh) == (w, h) and out == recon
    meta = probe_media(webp)
    assert meta["width"] == w and meta["height"] == h


def test_markerless_lossy_quarantines():
    """Strip or corrupt the PRVN chunk → quarantine, never pixels."""
    import struct as _s

    w, h = 16, 16
    rgb = _rgb(w, h, b"prvn")
    webp, _ = encode_webp_lossy(w, h, rgb, 30)
    # rebuild without PRVN
    pos, chunks = 12, []
    while pos + 8 <= len(webp):
        cid = webp[pos : pos + 4]
        size = _s.unpack_from("<I", webp, pos + 4)[0]
        chunks.append((cid, webp[pos + 8 : pos + 8 + size]))
        pos += 8 + size + (size & 1)
    def rebuild(ch):
        body = b"".join(
            c + _s.pack("<I", len(b)) + b + (b"\x00" if len(b) & 1 else b"")
            for c, b in ch
        )
        return b"RIFF" + _s.pack("<I", 4 + len(body)) + b"WEBP" + body
    stripped = rebuild([c for c in chunks if c[0] != b"PRVN"])
    with pytest.raises(MediaFormatError):
        decode_webp_lossy(stripped)
    # forged marker: right UUID, digest of DIFFERENT payload
    forged = rebuild(
        [(b"PRVN", VP8_MARKER_UUID + vp8_payload_digest(b"not-this"))]
        + [c for c in chunks if c[0] != b"PRVN"]
    )
    with pytest.raises(MediaFormatError):
        decode_webp_lossy(forged)
    # and the probe fixture's filler VP8 body (markerless) quarantines
    with pytest.raises(MediaFormatError):
        decode_webp_lossy(encode_webp_fixture(8, 8, "vp8", 1, b"x"))


def test_subset_quarantines():
    w, h = 16, 16
    rgb = _rgb(w, h, b"subset")
    payload, _ = encode_vp8_keyframe(w, h, rgb, 30)
    # interframe bit set
    bad = bytes([payload[0] | 1]) + payload[1:]
    with pytest.raises(MediaFormatError):
        decode_vp8_keyframe(bad)
    # broken start code
    with pytest.raises(MediaFormatError):
        decode_vp8_keyframe(payload[:3] + b"\x00\x01\x2a" + payload[6:])
    # animated layout still probe-only through the lossy path
    with pytest.raises(MediaFormatError):
        decode_webp_lossy(encode_webp_fixture(8, 8, "vp8x-anim", 2, b"a"))
