"""Multi-slice pictures — round 13 (§6.4.9 slice-bounded neighbour
availability, §7.3.4 slice tiling by first_mb_in_slice).

Real encoders commonly split pictures into slices (error resilience /
parallel encode).  The load-bearing rule is AVAILABILITY: a neighbour
macroblock in a DIFFERENT slice of the same picture is absent for
intra prediction, CAVLC nC contexts, MV prediction and skip inference
alike — get one of those wrong and the closed loop breaks exactly at
the slice borders."""

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
from tests.test_h264_inter import _moving_frames


def _decode_pics(sps, pps, pics):
    sd = H._parse_sps_slice_fields(sps)
    pd = H.parse_pps(pps)
    ref = None
    poc_ctx: dict = {}
    out = []
    for nals in pics:
        pl = H.decode_picture(nals, sd, pd, ref=ref, poc_ctx=poc_ctx)
        ref = pl
        out.append(pl)
    w, h = sd["width"], sd["height"]
    return [
        H.yuv420_to_rgb(
            y[:h, :w],
            u[: (h + 1) // 2, : (w + 1) // 2],
            v[: (h + 1) // 2, : (w + 1) // 2],
        )
        for y, u, v in out
    ]


@pytest.mark.parametrize("n_slices", [2, 3, 5])
@pytest.mark.parametrize("w,h", [(48, 32), (64, 48)])
def test_multislice_closed_loop(n_slices, w, h):
    frames = _moving_frames(w, h, 4)
    sps, pps, pics, rec = H.encode_h264_multislice(
        w, h, frames, qp=26, n_slices=n_slices, return_recon=True
    )
    assert all(len(nals) == min(n_slices, (w // 16) * (h // 16))
               for nals in pics)
    assert _decode_pics(sps, pps, pics) == rec


def test_multislice_annexb_stream_groups_by_first_mb():
    w, h = 48, 32
    frames = _moving_frames(w, h, 4)
    sps, pps, pics, rec = H.encode_h264_multislice(
        w, h, frames, qp=26, n_slices=3, return_recon=True
    )
    flat = [n for nals in pics for n in nals]
    dw, dh, dec = H.decode_h264_stream(sps, pps, flat)
    assert (dw, dh) == (w, h)
    assert dec == rec


def test_slice_borders_actually_cut_availability():
    """The multi-slice and single-slice encodes of the SAME frames
    reconstruct DIFFERENTLY (borders force DC / zero-predictors), and
    the multi-slice stream pays a real rate cost — if either ever
    becomes equal, availability is leaking across the border."""
    w, h = 48, 48
    frames = _moving_frames(w, h, 3)
    sps1, pps1, pics1, rec1 = H.encode_h264_multislice(
        w, h, frames, qp=26, n_slices=3, return_recon=True
    )
    _, _, nals0, rec0 = H.encode_h264_ippp(
        w, h, frames, qp=26, return_recon=True
    )
    assert rec1 != rec0
    assert sum(len(n) for nals in pics1 for n in nals) > sum(
        len(n) for n in nals0
    )


def test_first_slice_header_carries_first_mb():
    w, h = 48, 32
    frames = _moving_frames(w, h, 2)
    _sps, _pps, pics = H.encode_h264_multislice(
        w, h, frames, qp=26, n_slices=2
    )
    firsts = [H.slice_first_mb(n) for n in pics[0]]
    assert firsts[0] == 0 and firsts[1] == (w // 16) * (h // 16) // 2


def test_gap_and_overlap_quarantine():
    w, h = 48, 32
    frames = _moving_frames(w, h, 2)
    sps, pps, pics = H.encode_h264_multislice(
        w, h, frames, qp=26, n_slices=3
    )
    sd = H._parse_sps_slice_fields(sps)
    pd = H.parse_pps(pps)
    # dropping the middle slice leaves a first_mb gap
    with pytest.raises(MediaFormatError, match="tile|gap|cover"):
        H.decode_picture([pics[0][0], pics[0][2]], sd, pd)
    # dropping the tail leaves the picture incomplete
    with pytest.raises(MediaFormatError, match="cover"):
        H.decode_picture(pics[0][:2], sd, pd)
    # a duplicate slice overlaps
    with pytest.raises(MediaFormatError, match="tile|gap"):
        H.decode_picture(
            [pics[0][0], pics[0][1], pics[0][1], pics[0][2]], sd, pd
        )


def test_single_nal_partial_picture_quarantines():
    """decode_frame_nal (the one-slice API) refuses a slice that does
    not start at macroblock 0."""
    w, h = 48, 32
    frames = _moving_frames(w, h, 2)
    sps, pps, pics = H.encode_h264_multislice(
        w, h, frames, qp=26, n_slices=2
    )
    sd = H._parse_sps_slice_fields(sps)
    pd = H.parse_pps(pps)
    with pytest.raises(MediaFormatError, match="tile|gap"):
        H.decode_frame_nal(pics[0][1], sd, pd)


def test_multislice_through_containers():
    w, h = 48, 32
    frames = _moving_frames(w, h, 5)
    _, _, _, rec = H.encode_h264_multislice(
        w, h, frames, qp=26, n_slices=2, return_recon=True
    )
    mp4 = encode_mp4_coded(w, h, intra_frames=frames, qp=26,
                           gop="ippp-ms2")
    mkv = encode_mkv_coded(w, h, intra_frames=frames, qp=26,
                           gop="ippp-ms2")
    for payload, dec in ((mp4, decode_mp4), (mkv, decode_mkv)):
        dw, dh, _durs, out, sync = dec(payload)
        assert (dw, dh) == (w, h)
        assert out == rec
        assert sync[0] and not any(sync[1:])


def test_intra_borders_reset_to_dc():
    """Direct availability probe: an MB just below a slice border must
    see its TOP neighbour as unavailable — i4_mpm returns DC and the
    16x16 legal set loses VERTICAL."""
    st = H._FrameState(3, 3)
    st.slice_id[:] = -1
    st.slice_id[0] = 0  # first row decoded as slice 0
    st.slice_id[1] = 1  # second row being decoded as slice 1
    st.cur_slice = 1
    # MB (1,1): top neighbour is slice 0 → unavailable
    assert not st.mb_avail(1, 0)
    assert st.mb_avail(0, 1)
    assert st.i4_mpm(4, 4) == 2  # forced DC
    avail_l, avail_t = H._avail_lt(st, 1, 1)
    assert avail_l and not avail_t
    # same-slice left neighbour still contributes its nC
    st.nc_y[4, 3] = 7
    st.nc_y[3, 4] = 5  # other-slice top — must be ignored
    assert st.nc_luma(4, 4) == 7


def test_mixed_qp_slices_quarantine():
    """Per-slice QP is legal H.264 but the frame-level deblock pass
    here is single-QP — differing slice QPs refuse rather than filter
    wrong."""
    w, h = 48, 32
    frames = _moving_frames(w, h, 1)
    sps, pps, pics = H.encode_h264_multislice(
        w, h, frames, qp=26, n_slices=2
    )
    sd = H._parse_sps_slice_fields(sps)
    pd = H.parse_pps(pps)
    # re-encode slice 2 of the IDR picture at a different QP by hand:
    # simplest route — encode the same frames at qp 28 and graft its
    # second slice (same geometry, different slice_qp_delta)
    _s2, _p2, pics28 = H.encode_h264_multislice(
        w, h, frames, qp=28, n_slices=2
    )
    with pytest.raises(MediaFormatError, match="disagree"):
        H.decode_picture([pics[0][0], pics28[0][1]], sd, pd)
