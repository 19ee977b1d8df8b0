"""Explicit weighted prediction for P slices — round 13 (§7.3.3.2
pred_weight_table syntax + §8.4.2.3.2 weighted sample prediction).

The real-stream case is the FADE: a global luminance ramp that plain
motion compensation cannot follow (every pixel changes) but a
per-reference (weight, offset) pair models exactly.  The closed-loop
invariant carries over; the rate win on a fade fixture is the
engagement proof."""

from __future__ import annotations

import numpy as np
import pytest

from reindexer_spark import h264 as H
from reindexer_spark.codecs import (
    MediaFormatError,
    decode_mkv,
    decode_mp4,
    encode_mkv_coded,
    encode_mp4_coded,
)


def _fade_frames(w: int, h: int, n: int, seed: int = 21):
    """Translating noise under a global fade: gain 1 - 0.13i plus a
    rising offset — both a multiplicative and an additive component,
    so the weight AND the offset matter."""
    rng = np.random.default_rng(seed)
    base = rng.integers(40, 216, (h + 2 * n, w + 2 * n, 3),
                        dtype=np.uint8)
    out = []
    for i in range(n):
        f = (
            base[i : i + h, i : i + w].astype(np.float64)
            * (1.0 - 0.13 * i)
            + 6 * i
        )
        out.append(np.clip(f, 0, 255).astype(np.uint8).tobytes())
    return out


@pytest.mark.parametrize("w,h", [(48, 32), (34, 22)])
def test_weighted_closed_loop_equals_decode(w, h):
    frames = _fade_frames(w, h, 6)
    sps, pps, nals, rec = H.encode_h264_ippp(
        w, h, frames, qp=26, return_recon=True, weighted=True
    )
    dw, dh, dec = H.decode_h264_stream(sps, pps, nals)
    assert (dw, dh) == (w, h)
    assert dec == rec


def test_weighted_beats_plain_on_fade():
    w, h = 48, 32
    frames = _fade_frames(w, h, 6)
    _, _, wp_nals = H.encode_h264_ippp(w, h, frames, qp=26,
                                       weighted=True)
    _, _, plain = H.encode_h264_ippp(w, h, frames, qp=26)
    assert (
        sum(len(n) for n in wp_nals) < sum(len(n) for n in plain)
    ), (sum(len(n) for n in wp_nals), sum(len(n) for n in plain))


def test_wp_sample_math_pinned():
    """§8.4.2.3.2 arithmetic on hand-computed cases, including the
    arithmetic (sign-extending) shift for negative products and the
    d == 0 branch."""
    a = np.array([100], dtype=np.int64)
    assert H._wp_apply(a, 40, 3, 5)[0] == ((100 * 40 + 16) >> 5) + 3
    assert H._wp_apply(np.array([4]), -1, 30, 2)[0] == (
        ((4 * -1 + 2) >> 2) + 30
    )
    # d == 0: no rounding term
    assert H._wp_apply(np.array([7]), 3, -2, 0)[0] == 19
    # clipping both ends
    assert H._wp_apply(np.array([255]), 127, 127, 0)[0] == 255
    assert H._wp_apply(np.array([255]), -128, -128, 0)[0] == 0


def test_pred_weight_table_roundtrip():
    """The slice header carries the table; the parser returns the same
    weights, with absent flags meaning identity."""
    sps, pps, nals = H.encode_h264_ippp(
        48, 32, _fade_frames(48, 32, 3), qp=26, weighted=True
    )
    sd = H._parse_sps_slice_fields(sps)
    pd = H.parse_pps(pps)
    assert pd["weighted_pred"] is True
    r = H._BitReader(H._unescape_rbsp(nals[1][1:]))
    stype, _qp, _d, _a, _b, info = H._parse_slice_header(
        r, sd, pd, idr=False, nal_ref_idc=2
    )
    assert stype == "P" and "wp" in info
    wp = info["wp"]
    assert wp["ld"] == 5 and len(wp["w"]) == 1
    # the fade's first P: gain < 1 → weight < 32
    assert wp["w"][0]["lw"] < 32


def test_identity_weights_decode_like_plain():
    """An explicit identity table (w = 1<<d, o = 0) reconstructs the
    same pixels as the unweighted stream — weighting is a no-op."""
    w, h = 48, 32
    frames = _fade_frames(w, h, 4)
    _sps, _pps, _n, plain_rec = H.encode_h264_ippp(
        w, h, frames, qp=26, return_recon=True
    )
    # hand-drive the per-frame encoder with identity weights
    sps = H.write_h264_sps(w, h, 66, 30)
    pps = H.write_pps(H.DEFAULT_QP, weighted_pred=True)
    out = H.encode_frame_nal(
        frames[0], w, h, 26, idr_pic_id=0, return_planes=True
    )
    nals, planes = [out[0]], out[1]
    ident = {"ld": 5, "cd": 5,
             "w": [{"lw": 32, "lo": 0, "cw": [32, 32], "co": [0, 0]}]}
    recs = [planes]
    for i, f in enumerate(frames[1:], start=1):
        nal, planes = H.encode_p_frame_nal(
            f, w, h, 26, planes, i, wp=ident
        )
        nals.append(nal)
        recs.append(planes)
    dw, dh, dec = H.decode_h264_stream(sps, pps, nals)
    assert dec == plain_rec  # identity weights change nothing


def test_weighted_skip_path_closed_loop():
    """A static scene under weighted prediction: P_Skip reconstruction
    must apply the (identity-estimated) weights identically on both
    sides."""
    w, h = 48, 32
    rng = np.random.default_rng(5)
    f0 = rng.integers(0, 256, (h, w, 3), dtype=np.uint8).tobytes()
    frames = [f0] * 4
    sps, pps, nals, rec = H.encode_h264_ippp(
        w, h, frames, qp=28, return_recon=True, weighted=True
    )
    _dw, _dh, dec = H.decode_h264_stream(sps, pps, nals)
    assert dec == rec


def test_weighted_through_containers():
    w, h = 48, 32
    frames = _fade_frames(w, h, 5)
    _, _, _, rec = H.encode_h264_ippp(
        w, h, frames, qp=26, return_recon=True, weighted=True
    )
    mp4 = encode_mp4_coded(w, h, intra_frames=frames, qp=26,
                           gop="ippp-wp")
    mkv = encode_mkv_coded(w, h, intra_frames=frames, qp=26,
                           gop="ippp-wp")
    for payload, dec_fn in ((mp4, decode_mp4), (mkv, decode_mkv)):
        dw, dh, _durs, out, sync = dec_fn(payload)
        assert (dw, dh) == (w, h)
        assert out == rec
        assert sync[0] and not any(sync[1:])


def test_weighted_bipred_idc_range():
    """idc 1 (explicit, round 15) and idc 2 (implicit, round 16) both
    PARSE now; only the undefined idc 3 quarantines."""
    from reindexer_spark.codecs import _RbspWriter

    def pps_with_idc(idc):
        w2 = _RbspWriter()
        w2.ue(0)
        w2.ue(0)
        w2.u(0, 1)
        w2.u(0, 1)
        w2.ue(0)
        w2.ue(0)
        w2.ue(0)
        w2.u(0, 1)  # weighted_pred
        w2.u(idc, 2)  # weighted_bipred_idc
        w2.se(0)
        w2.se(0)
        w2.se(0)
        w2.u(1, 1)
        w2.u(0, 1)
        w2.u(0, 1)
        return b"\x68" + w2.finish()

    assert H.parse_pps(pps_with_idc(1))["weighted_bipred"] == 1
    assert H.parse_pps(pps_with_idc(2))["weighted_bipred"] == 2
    with pytest.raises(MediaFormatError):
        H.parse_pps(pps_with_idc(3))


def test_weight_denominator_bounds():
    """A denominator past 7 quarantines (spec range 0..7)."""
    sps, pps, nals = H.encode_h264_ippp(
        32, 32, _fade_frames(32, 32, 3), qp=26, weighted=True
    )
    sd = H._parse_sps_slice_fields(sps)
    pd = H.parse_pps(pps)
    w2 = H._BitWriter()
    w2.ue(0)   # first_mb_in_slice
    w2.ue(5)   # slice_type P
    w2.ue(0)   # pps_id
    w2.u(1, 4)  # frame_num
    w2.u(2, 4)  # poc_lsb
    w2.u(0, 1)  # no ref override
    w2.u(0, 1)  # no list modification
    w2.ue(8)   # luma_log2_weight_denom = 8: out of range
    r = H._BitReader(w2.finish())
    with pytest.raises(MediaFormatError, match="denominator"):
        H._parse_slice_header(r, sd, pd, idr=False, nal_ref_idc=2)


def test_weighted_composes_with_multiref():
    """Round-13 review finding: multi-reference + weighted prediction
    crashed when a macroblock picked refIdx > 0 (the encoder-built
    table holds identity-None entries past index 0).  The flip-flop
    fade fixture forces both features into one chain."""
    from tests.test_h264_temporal import _flip_flop

    w, h = 48, 32
    base = _flip_flop(w, h, 5)
    frames = []
    for i, f in enumerate(base):
        a = np.frombuffer(f, np.uint8).reshape(h, w, 3).astype(np.float64)
        frames.append(
            np.clip(a * (1.0 - 0.1 * i) + 4 * i, 0, 255)
            .astype(np.uint8).tobytes()
        )
    sps, pps, nals, rec = H.encode_h264_ippp(
        w, h, frames, qp=26, return_recon=True, n_refs=2, weighted=True
    )
    dw, dh, dec = H.decode_h264_stream(sps, pps, nals)
    assert dec == rec
