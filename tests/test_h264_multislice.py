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


def test_corner_unavailable_across_slice_border():
    """Round-13 review finding: the top-left CORNER needs its own
    slice check — the MB above can be the first MB of the current
    slice while the corner still belongs to the previous slice.  Such
    a position must lose the corner-dependent modes (I16/chroma PLANE,
    I4 diagonal family)."""
    st = H._FrameState(4, 3)
    st.slice_id[:] = -1
    # slice 0 = MBs 0..5, slice 1 = MBs 6..11 on the 4-wide grid:
    # MB (2,1) has its TOP (2,0)=MB 2 in slice 0, LEFT (1,1)=MB 5 in
    # slice 0 → for cur_slice 1 both are unavailable; but MB (3,1)=MB 7
    # (slice 1) has LEFT MB 6 (slice 1, available) and TOP MB 3
    # (slice 0, unavailable)
    st.slice_id[0] = 0
    st.slice_id[1, :2] = 0
    st.slice_id[1, 2:] = 1
    st.cur_slice = 1
    # construct the corner case directly: left avail, top avail,
    # corner NOT — a grid where the MB above is the slice's first MB
    st2 = H._FrameState(2, 2)
    st2.slice_id[:] = -1
    st2.slice_id[0, 0] = 0   # corner MB: previous slice
    st2.slice_id[0, 1] = 1   # top MB: first MB of slice 1
    st2.slice_id[1, 0] = 1   # left MB: slice 1
    st2.cur_slice = 1
    avail_l, avail_t, avail_c = H._avail_ltc(st2, 1, 1)
    assert avail_l and avail_t and not avail_c
    # corner-dependent modes are illegal / refuse
    assert H.L16_PLANE not in (
        [H.L16_DC]
        + ([H.L16_VERTICAL] if avail_t else [])
        + ([H.L16_HORIZONTAL] if avail_l else [])
        + ([H.L16_PLANE] if avail_l and avail_t and avail_c else [])
    )
    with pytest.raises(MediaFormatError, match="plane"):
        H._pred_luma16(H.L16_PLANE, st2.y, 1, 1, st=st2)
    assert H.I4_DDR not in H._i4_legal_modes(avail_l, avail_t, avail_c)
    with pytest.raises(MediaFormatError, match="diagonal"):
        H._pred_i4(
            H.I4_DDR, np.zeros(4, np.int64), np.zeros(8, np.int64), 0,
            avail_l, avail_t, avail_c,
        )


def test_slices_disagreeing_on_poc_quarantine():
    """Round-13 review finding: slices of one picture must agree on
    pic_order_cnt_lsb — a mismatching second slice refuses instead of
    silently inheriting slice 0's POC."""
    w, h = 48, 32
    frames = _moving_frames(w, h, 1)
    sps, pps, pics = H.encode_h264_multislice(
        w, h, frames, qp=26, n_slices=2
    )
    sd = H._parse_sps_slice_fields(sps)
    pd = H.parse_pps(pps)
    n_mbs_half = (w // 16) * (h // 16) // 2
    # rebuild slice 2's header with a different poc_lsb, keeping the
    # payload: easiest is re-encoding the same frame with a different
    # frame poc via the per-frame encoder — instead, hand-craft a
    # minimal second slice whose header disagrees
    wtr = H._BitWriter()
    H._write_slice_header(
        wtr, 26, H.DEFAULT_QP, 0, log2_max_frame_num=4, poc_type=0,
        log2_max_poc_lsb=4, slice_type="I", frame_num=0,
        first_mb=n_mbs_half, poc_lsb=4,
    )
    bad = b"\x65" + wtr.finish()
    with pytest.raises(MediaFormatError, match="pic_order_cnt_lsb"):
        H.decode_picture([pics[0][0], bad], sd, pd)


def test_fuzz_quarantine_contract_round13_paths():
    """The round-13 decode paths (multi-slice, temporal direct,
    weighted, multi-reference) keep the quarantine contract under
    mutation: a corrupted/truncated/reordered stream either decodes
    or raises MediaFormatError — never an uncontrolled exception.
    Deterministic mutation schedule; larger sweeps run ad hoc."""
    rng = np.random.default_rng(7)
    frames = _moving_frames(48, 32, 4)
    sps_ms, pps_ms, pics = H.encode_h264_multislice(
        48, 32, frames, qp=26, n_slices=3
    )
    cases = [
        ("multislice", sps_ms, pps_ms,
         [n for p in pics for n in p]),
        ("temporal", *H.encode_h264_ipb(48, 32, frames, qp=26,
                                        direct="temporal")),
        ("weighted", *H.encode_h264_ippp(48, 32, frames, qp=26,
                                         weighted=True)),
        ("multiref", *H.encode_h264_ippp(48, 32, frames, qp=26,
                                         n_refs=3)),
    ]
    for _label, sps, pps, nals in cases:
        for _trial in range(60):
            mode = rng.integers(0, 5)
            mut = list(nals)
            i = int(rng.integers(1, len(mut)))
            nal = bytearray(mut[i])
            if mode == 0:
                mut[i] = bytes(nal[: int(rng.integers(2, len(nal)))])
            elif mode == 1:
                mut[i] = bytes(
                    nal[: int(rng.integers(2, len(nal)))]
                ) + bytes(
                    rng.integers(0, 256, int(rng.integers(1, 20)),
                                 dtype=np.uint8)
                )
            elif mode == 2:
                for _ in range(5):
                    p = int(rng.integers(1, len(nal)))
                    nal[p] = int(rng.integers(0, 256))
                mut[i] = bytes(nal)
            elif mode == 3:
                del mut[i]
            else:
                mut.insert(i, mut[i])
            try:
                H.decode_h264_stream(sps, pps, mut)
            except MediaFormatError:
                pass  # the contract: quarantine, never crash
