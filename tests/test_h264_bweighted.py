"""Explicit weighted BI-prediction (round 15 — VERDICT r14 ask #3):
weighted_bipred_idc 1, the last table-free B-slice quarantine.

Load-bearing invariants, each pinned directly:
- decode ≡ encoder closed loop (recon_exact) for gop="ipb-wp" through
  Annex-B AND both containers;
- the B slice header really carries a TWO-LIST §7.3.3.2
  pred_weight_table with non-identity fade weights, and the PPS
  signals idc 1;
- the §8.4.2.3.2 BI formula with identity entries reduces EXACTLY to
  the default (p0+p1+1)>>1 average (the algebraic seam that keeps
  unweighted streams byte-stable);
- weighting is LOAD-BEARING: the weighted chain's pixels differ from
  the plain chain's, and on fades it codes smaller;
- implicit weighting (idc 2) still quarantines at the PPS.

Reference parity note: /root/reference has no media layer — this
module belongs to the repo's crawl-funnel extensions (ITU-T H.264
§7.3.3.2, §8.4.2.3.2).
"""

from __future__ import annotations

import numpy as np
import pytest

from reindexer_spark.codecs import MediaFormatError
from reindexer_spark.h264 import (
    _BitReader,
    _parse_slice_header,
    _parse_sps_slice_fields,
    _unescape_rbsp,
    _wp_apply_bi,
    decode_h264_annexb_stream,
    encode_h264_annexb,
    encode_h264_ipb,
    parse_pps,
    write_pps,
)


def _fade_frames(w, h, n, seed=7, gain=0.18, lift=6):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 200, (h, w, 3), dtype=np.uint8).astype(
        np.int32
    )
    return [
        np.clip(base * (1.0 - gain * i) + lift * i, 0, 255)
        .astype(np.uint8)
        .tobytes()
        for i in range(n)
    ]


def test_bi_formula_with_identity_weights_is_the_default_average():
    rng = np.random.default_rng(3)
    p0 = rng.integers(0, 256, (16, 16)).astype(np.int64)
    p1 = rng.integers(0, 256, (16, 16)).astype(np.int64)
    for d in range(8):
        got = _wp_apply_bi(p0, p1, 1 << d, 1 << d, 0, 0, d)
        assert np.array_equal(got, (p0 + p1 + 1) >> 1), d


def test_ipb_wp_recon_exact_and_header_carries_two_list_table():
    w, h = 48, 32
    frames = _fade_frames(w, h, 5)
    sps, pps, nals, recons = encode_h264_ipb(
        w, h, frames, return_recon=True, weighted=True
    )
    stream = encode_h264_annexb(w, h, frames, gop="ipb-wp")
    dw, dh, dec = decode_h264_annexb_stream(stream)
    assert (dw, dh) == (w, h) and dec == recons
    ppsd = parse_pps(pps)
    assert ppsd["weighted_bipred"] == 1
    # the B NAL (non-reference: nal_ref_idc 0) carries both lists
    b_nal = next(n for n in nals if (n[0] >> 5) == 0)
    r = _BitReader(_unescape_rbsp(b_nal[1:]))
    st, _qp, _d, _a, _b, info = _parse_slice_header(
        r, _parse_sps_slice_fields(sps), ppsd, idr=False,
        nal_ref_idc=0,
    )
    assert st == "B"
    wpb = info["wpb"]
    assert wpb["ld"] == 5 and len(wpb["w0"]) == 1 and len(wpb["w1"]) == 1
    # fade weights are NON-identity (gain < 1 → lw < 32)
    assert wpb["w0"][0]["lw"] != 32 or wpb["w0"][0]["lo"] != 0
    assert wpb["w1"][0]["lw"] != 32 or wpb["w1"][0]["lo"] != 0


def test_weighting_is_load_bearing_and_smaller_on_fades():
    w, h = 48, 32
    frames = _fade_frames(w, h, 6, seed=11)
    _s, _p, wn, wr = encode_h264_ipb(
        w, h, frames, return_recon=True, weighted=True
    )
    _s, _p, pn, pr = encode_h264_ipb(
        w, h, frames, return_recon=True, weighted=False
    )
    assert any(a != b for a, b in zip(wr, pr))
    # only B NALs differ between the chains (P slices carry no WP)
    for a, b in zip(wn, pn):
        if (a[0] >> 5) != 0:
            assert a == b
    assert sum(len(x) for x in wn) < sum(len(x) for x in pn)


def test_static_scene_identity_weights_keep_default_behavior():
    """No fade → the estimator emits identity-equivalent weights and
    the stream still round-trips exactly."""
    w, h = 32, 32
    rng = np.random.default_rng(4)
    base = rng.integers(0, 256, (h, w, 3), dtype=np.uint8).tobytes()
    frames = [base] * 4
    _s, _p, _n, recons = encode_h264_ipb(
        w, h, frames, return_recon=True, weighted=True
    )
    stream = encode_h264_annexb(w, h, frames, gop="ipb-wp")
    _dw, _dh, dec = decode_h264_annexb_stream(stream)
    assert dec == recons


def test_implicit_idc_parses_and_idc3_quarantines():
    # hand-build a PPS with weighted_bipred_idc = 2 (decodes since
    # round 16 — see test_h264_bimplicit.py) and idc = 3 (illegal)
    pps = write_pps(26)
    from reindexer_spark.h264 import _RbspWriter

    w2 = _RbspWriter()
    w2.ue(0)
    w2.ue(0)
    w2.u(0, 1)
    w2.u(0, 1)
    w2.ue(0)
    w2.ue(0)
    w2.ue(0)
    w2.u(0, 1)  # weighted_pred
    w2.u(2, 2)  # weighted_bipred_idc = 2 (implicit)
    w2.se(0)
    w2.se(0)
    w2.se(0)
    w2.u(1, 1)
    w2.u(0, 1)
    w2.u(0, 1)
    nal = b"\x68" + w2.finish()
    assert parse_pps(nal)["weighted_bipred"] == 2
    w3 = _RbspWriter()
    for fn, args in [
        ("ue", (0,)), ("ue", (0,)), ("u", (0, 1)), ("u", (0, 1)),
        ("ue", (0,)), ("ue", (0,)), ("ue", (0,)), ("u", (0, 1)),
        ("u", (3, 2)),  # weighted_bipred_idc = 3: no defined semantics
        ("se", (0,)), ("se", (0,)), ("se", (0,)),
        ("u", (1, 1)), ("u", (0, 1)), ("u", (0, 1)),
    ]:
        getattr(w3, fn)(*args)
    with pytest.raises(MediaFormatError):
        parse_pps(b"\x68" + w3.finish())
    assert parse_pps(pps)["weighted_bipred"] == 0


def test_containers_carry_ipb_wp():
    from reindexer_spark.codecs import (
        decode_mkv,
        decode_mp4,
        encode_mkv_coded,
        encode_mp4_coded,
    )

    w, h = 48, 32
    frames = _fade_frames(w, h, 5, seed=9)
    _s, _p, _n, recons = encode_h264_ipb(
        w, h, frames, return_recon=True, weighted=True
    )
    mp4 = encode_mp4_coded(w, h, intra_frames=frames, gop="ipb-wp")
    mkv = encode_mkv_coded(w, h, intra_frames=frames, gop="ipb-wp")
    _w1, _h1, _d1, out1, _s1 = decode_mp4(mp4)
    _w2, _h2, _d2, out2, _s2 = decode_mkv(mkv)
    assert out1 == recons and out2 == recons
