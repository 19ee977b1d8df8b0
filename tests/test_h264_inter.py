"""P-slice (inter prediction) contract — round 10.

The load-bearing invariant mirrors the intra suite: the encoder's
closed-loop reconstruction is byte-identical to the decoder's output
for every frame of an IPPP chain (single reference, deblocking ON with
the §8.7.2.1 inter strengths — both sides run the identical FILTERED
reference loop).  Plus the published-table pins CAVLC round-trips
cannot catch, and the quarantine edges of the subset."""

from __future__ import annotations

import numpy as np
import pytest

from reindexer_spark import h264 as H
from reindexer_spark.codecs import MediaFormatError, _unescape_rbsp


def _moving_frames(w: int, h: int, n: int, still: bool = False):
    frames = []
    base = np.zeros((h, w, 3), np.int32)
    yy, xx = np.mgrid[0:h, 0:w]
    base[..., 0] = (xx * 3) % 256
    base[..., 1] = (yy * 5) % 256
    base[..., 2] = ((xx + yy) * 2) % 256
    for i in range(n):
        s = 0 if still else i
        f = np.roll(base, shift=(s * 2, s * 3), axis=(0, 1)).copy()
        if not still:
            bx, by = min(5 + i * 2, w - 9), min(4 + i, h - 9)
            f[by : by + 8, bx : bx + 8] = [200, 30, 90]
        frames.append(np.clip(f, 0, 255).astype(np.uint8).tobytes())
    return frames


@pytest.mark.parametrize("w,h", [(48, 32), (34, 22), (16, 16)])
def test_ippp_closed_loop_equals_decode(w, h):
    frames = _moving_frames(w, h, 5)
    sps, pps, nals, recons = H.encode_h264_ippp(
        w, h, frames, qp=26, return_recon=True
    )
    dw, dh, dec = H.decode_h264_stream(sps, pps, nals)
    assert (dw, dh) == (w, h)
    assert len(dec) == len(frames)
    for i, (r, d) in enumerate(zip(recons, dec)):
        assert r == d, f"frame {i} decode != closed-loop recon"
    # P frames are NAL type 1, IDR type 5
    assert nals[0][0] & 0x1F == 5
    assert all(n[0] & 0x1F == 1 for n in nals[1:])


def test_static_scene_collapses_to_skip_runs():
    frames = _moving_frames(64, 48, 5, still=True)
    sps, pps, nals, recons = H.encode_h264_ippp(
        64, 48, frames, qp=28, return_recon=True
    )
    _, _, dec = H.decode_h264_stream(sps, pps, nals)
    assert dec == recons
    # the first P still codes the IDR's quantization residue; once the
    # loop settles, a static picture degenerates toward one
    # mb_skip_run — sizes must fall monotonically to a few bytes
    sizes = [len(n) for n in nals]
    assert all(b <= a for a, b in zip(sizes[1:], sizes[2:])), sizes
    assert sizes[-1] < 16 and sizes[1] < sizes[0] // 3, sizes


def test_motion_beats_all_intra_rate():
    # the POINT of P slices: a translating scene codes far smaller
    frames = _moving_frames(64, 48, 6)
    _, _, intra_nals = H.encode_h264_intra(64, 48, frames, qp=26)
    _, _, ippp_nals = H.encode_h264_ippp(64, 48, frames, qp=26)
    intra_tail = sum(len(n) for n in intra_nals[1:])
    p_tail = sum(len(n) for n in ippp_nals[1:])
    assert p_tail < intra_tail // 2, (p_tail, intra_tail)


def test_p_without_reference_quarantines():
    frames = _moving_frames(16, 16, 2)
    sps, pps, nals = H.encode_h264_ippp(16, 16, frames)
    sd = H._parse_sps_slice_fields(sps)
    pd = H.parse_pps(pps)
    with pytest.raises(MediaFormatError):
        H.decode_frame_nal(nals[1], sd, pd, ref=None)


def _p_header_writer():
    w = H._BitWriter()
    H._write_slice_header(
        w, H.DEFAULT_QP, H.DEFAULT_QP, 0, log2_max_frame_num=4,
        poc_type=0, log2_max_poc_lsb=4, deblock=False, slice_type="P",
        frame_num=1,
    )
    return w


def _decode_p_bits(w):
    sps_nal = H.write_h264_sps(16, 16, 66, 30)
    sd = H._parse_sps_slice_fields(sps_nal)
    pd = H.parse_pps(H.write_pps())
    z = np.zeros((16, 16), np.uint8)
    ref = (z, np.zeros((8, 8), np.uint8), np.zeros((8, 8), np.uint8))
    return H.decode_frame_nal(b"\x41" + w.finish(), sd, pd, ref=ref)


def test_p8x8_all_sub_types_decode():
    """Crafted bitstream: one P_8x8 MB exercising every sub_mb_type —
    8x8, 8x4, 4x8 and 4x4 — with hand-picked mvds and no residual; the
    decoded picture must equal motion compensation computed in the
    test with HARDCODED partition geometry (so a Table 7-17 mix-up in
    the decoder's tables cannot self-confirm)."""
    rng = np.random.default_rng(11)
    ry = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    ru = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    rv = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    w = _p_header_writer()
    w.ue(0)  # mb_skip_run
    w.ue(3)  # P_8x8
    for t_ in (0, 1, 2, 3):
        w.ue(t_)
    # hardcoded decode-order geometry: (bx, by, bw, bh) in 4x4 blocks
    geoms = [
        (0, 0, 2, 2),                       # quad0: 8x8
        (2, 0, 2, 1), (2, 1, 2, 1),         # quad1: two 8x4
        (0, 2, 1, 2), (1, 2, 1, 2),         # quad2: two 4x8
        (2, 2, 1, 1), (3, 2, 1, 1), (2, 3, 1, 1), (3, 3, 1, 1),
    ]
    mvds = [(8, 4), (0, 0), (-4, 0), (4, -8), (0, 4),
            (0, 0), (12, 0), (0, 0), (-8, -4)]
    # replay the predictor to know each partition's absolute MV
    st_ref = H._FrameState(1, 1)
    mvs = []
    for (bx, by, bw, bh), mvd in zip(geoms, mvds):
        pmv = H._pred_mv(st_ref, bx, by, bw, "sub")
        mv = (pmv[0] + mvd[0], pmv[1] + mvd[1])
        mvs.append(mv)
        st_ref.mv[by : by + bh, bx : bx + bw] = mv
        st_ref.inter[by : by + bh, bx : bx + bw] = True
        w.se(mvd[0])
        w.se(mvd[1])
    w.ue(0)  # coded_block_pattern: nothing coded
    dy, du, dv = _decode_p_bits_ref(w, (ry, ru, rv))
    exp_y = np.zeros((16, 16), dtype=np.int64)
    exp_u = np.zeros((8, 8), dtype=np.int64)
    exp_v = np.zeros((8, 8), dtype=np.int64)
    for (bx, by, bw, bh), mv in zip(geoms, mvs):
        exp_y[by * 4 : by * 4 + bh * 4, bx * 4 : bx * 4 + bw * 4] = (
            H._mc_luma(ry, bx * 4, by * 4, bw * 4, bh * 4, mv[0], mv[1])
        )
        exp_u[by * 2 : by * 2 + bh * 2, bx * 2 : bx * 2 + bw * 2] = (
            H._mc_chroma(ru, bx * 2, by * 2, bw * 2, bh * 2, mv[0], mv[1])
        )
        exp_v[by * 2 : by * 2 + bh * 2, bx * 2 : bx * 2 + bw * 2] = (
            H._mc_chroma(rv, bx * 2, by * 2, bw * 2, bh * 2, mv[0], mv[1])
        )
    assert np.array_equal(dy, exp_y) and np.array_equal(du, exp_u)
    assert np.array_equal(dv, exp_v)


def test_p8x8_encoder_chooses_it_on_quadrant_motion():
    """Four quadrants of one MB translating in four different
    directions: the encoder must pick P_8x8 (the rectangle modes leave
    high residual), and the closed loop must stay byte-exact."""
    rng = np.random.default_rng(23)
    base = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    f0 = base[4:20, 4:20].copy()
    f1 = np.empty_like(f0)
    shifts = {(0, 0): (2, 0), (8, 0): (0, 2), (0, 8): (-2, 0),
              (8, 8): (0, -2)}
    for (qx, qy), (dx, dy) in shifts.items():
        f1[qy : qy + 8, qx : qx + 8] = base[
            4 + qy - dy : 12 + qy - dy, 4 + qx - dx : 12 + qx - dx
        ]
    frames = [f0.tobytes(), f1.tobytes()]
    sps, pps, nals, recons = H.encode_h264_ippp(
        16, 16, frames, qp=24, return_recon=True
    )
    _, _, dec = H.decode_h264_stream(sps, pps, nals)
    assert dec == recons
    # parse the P slice's first mb_type: must be P_8x8 (3)
    sd = H._parse_sps_slice_fields(sps)
    pd = H.parse_pps(pps)
    r = H._BitReader(_unescape_rbsp(nals[1][1:]))
    H._parse_slice_header(r, sd, pd, idr=False)
    assert r.ue() == 0  # mb_skip_run
    assert r.ue() == 3  # P_8x8


def _decode_p_bits_ref(w, ref):
    sps_nal = H.write_h264_sps(16, 16, 66, 30)
    sd = H._parse_sps_slice_fields(sps_nal)
    pd = H.parse_pps(H.write_pps())
    return H.decode_frame_nal(b"\x41" + w.finish(), sd, pd, ref=ref)


def test_skip_run_overrun_quarantines():
    w = _p_header_writer()
    w.ue(2)  # 2 skips into a 1-MB picture
    with pytest.raises(MediaFormatError, match="mb_skip_run"):
        _decode_p_bits(w)


def test_deblock_filter_on_is_the_default_and_round_trips():
    # the GOP encoder signals the filter ON (spec-realistic); the
    # closed loop over FILTERED references must still be byte-exact
    frames = _moving_frames(48, 32, 4)
    sps, pps, nals = H.encode_h264_ippp(48, 32, frames, qp=24)
    sd = H._parse_sps_slice_fields(sps)
    pd = H.parse_pps(pps)
    r = H._BitReader(_unescape_rbsp(nals[1][1:]))
    stype, _qp, on, _a, _b, _i = H._parse_slice_header(r, sd, pd, idr=False)
    assert stype == "P" and on  # filter signalled ON in the P header
    _, _, _, recons = H.encode_h264_ippp(48, 32, frames, qp=24,
                                         return_recon=True)
    _, _, dec = H.decode_h264_stream(sps, pps, nals)
    assert dec == recons


def test_inter_bs_grid_rules():
    # §8.7.2.1: skip/skip same-MV edge → 0; coefficients → 2; MV delta
    # ≥ 4 quarter units → 1; intra neighbour → 4 on the MB edge
    st = H._FrameState(2, 1)  # two MBs side by side
    st.inter[:] = True
    st.uses0[:] = True  # P-state invariant (_store_part_mv sets both)
    bs_v, _ = H._inter_bs_grids(st)
    assert bs_v[0, 4] == 0  # same zero MV, no coeffs, MB edge
    st.mv[0:4, 4:8, 0] = 4  # right MB moves 1 full pel
    bs_v, _ = H._inter_bs_grids(st)
    assert bs_v[0, 4] == 1
    st.nc_y[0, 4] = 3  # right MB's first block carries coefficients
    bs_v, _ = H._inter_bs_grids(st)
    assert bs_v[0, 4] == 2
    st.inter[0:4, 0:4] = False  # left MB intra
    bs_v, _ = H._inter_bs_grids(st)
    assert bs_v[0, 4] == 4  # intra on an MB edge
    assert bs_v[0, 5] == 2  # internal edge: coeff rule again
    st.nc_y[0, 4] = 0
    st.inter[0:4, 0:4] = True
    st.mv[:] = 0
    st.inter[0:4, 4:8] = False  # right MB intra, internal edges → 3
    bs_v, _ = H._inter_bs_grids(st)
    assert bs_v[0, 4] == 4 and bs_v[0, 5] == 3


def test_b_bs_grid_list_rules():
    """Round-12 B extension of §8.7.2.1: differing list usage → 1;
    same bi usage with both lists' MVs equal → 0; an L1 MV delta ≥ 4
    → 1 even when L0 matches."""
    st = H._FrameState(2, 1)
    st.inter[:] = True
    st.uses0[:] = True
    st.uses1[0:4, 4:8] = True  # right MB bi, left L0-only
    bs_v, _ = H._inter_bs_grids(st)
    assert bs_v[0, 4] == 1  # prediction shape differs
    st.uses1[:] = True  # both bi, all MVs zero
    bs_v, _ = H._inter_bs_grids(st)
    assert bs_v[0, 4] == 0
    st.mv1[0:4, 4:8, 1] = 4  # L1 vertical delta of one full pel
    bs_v, _ = H._inter_bs_grids(st)
    assert bs_v[0, 4] == 1


def test_cbp_inter_table_pins():
    # permutation of 0..47, and the published Table 9-4 Inter anchors
    assert sorted(H._CBP_INTER) == list(range(48))
    assert H._CBP_INTER[0] == 0  # nothing coded: the most common MB
    assert H._CBP_INTER[1] == 16  # chroma DC only
    assert H._CBP_INTER[2] == 1
    assert H._CBP_INTER[6] == 32
    assert H._CBP_INTER[12] == 47  # everything coded
    assert H._CBP_INTER[47] == 41


def test_mc_integer_is_a_shift():
    ref = np.arange(32 * 32, dtype=np.uint8).reshape(32, 32)
    out = H._mc_luma(ref, 8, 8, 8, 8, 4 * 3, 4 * 2)  # mv (+3, +2) full-pel
    assert np.array_equal(out, ref[10:18, 11:19].astype(np.int64))


def test_mc_half_pel_matches_six_tap_by_hand():
    rng = np.random.default_rng(7)
    ref = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    out = H._mc_luma(ref, 8, 8, 4, 4, 2, 0)  # horizontal half-pel
    r0 = ref.astype(np.int64)
    for r in range(4):
        for c in range(4):
            y, x = 8 + r, 8 + c
            raw = (
                r0[y, x - 2] - 5 * r0[y, x - 1] + 20 * r0[y, x]
                + 20 * r0[y, x + 1] - 5 * r0[y, x + 2] + r0[y, x + 3]
            )
            assert out[r, c] == min(255, max(0, (raw + 16) >> 5))


def test_mc_edge_extension_clamps():
    ref = np.full((16, 16), 99, dtype=np.uint8)
    ref[0, 0] = 7
    # far out-of-picture MV: every sample clamps to the edge
    out = H._mc_luma(ref, 0, 0, 4, 4, -4 * 100, -4 * 100)
    assert out[0, 0] == 7 and out[3, 3] == 7


def test_skip_mv_zero_on_picture_edge():
    st = H._FrameState(4, 4)
    st.inter[:] = True
    st.mv[:] = 12
    assert H._skip_mv(st, 0, 1) == (0, 0)  # no A
    assert H._skip_mv(st, 1, 0) == (0, 0)  # no B
    assert H._skip_mv(st, 1, 1) == (12, 12)
    # a zero-MV refIdx-0 neighbour forces zero
    st.mv[4, 3] = 0  # A of MB (1,1)
    assert H._skip_mv(st, 1, 1) == (0, 0)


def test_pred_mv_median_and_directional():
    st = H._FrameState(4, 4)
    st.inter[:] = True
    # A=(2,2) B=(10,10) C=(6,0) → median (6,2) for a 16x16 at MB (1,1)
    st.mv[4:8, 3] = (2, 2)     # A column (left of MB 1,1)
    st.mv[3, 4:8] = (10, 10)   # B row (above)
    st.mv[3, 8] = (6, 0)       # C (top-right)
    assert H._pred_mv(st, 4, 4, 4, "16x16") == (6, 2)
    # 16x8 top takes B outright; bottom takes A
    assert H._pred_mv(st, 4, 4, 4, "16x8t") == (10, 10)
    assert H._pred_mv(st, 4, 6, 4, "16x8b") == (2, 2)
    # 8x16 left takes A; right takes C
    assert H._pred_mv(st, 4, 4, 2, "8x16l") == (2, 2)
    assert H._pred_mv(st, 6, 4, 2, "8x16r") == (6, 0)


def test_intra_mbs_inside_p_slices():
    # frame 2 is unrelated noise: inter prediction fails, the encoder
    # must fall back to intra MBs inside the P slice — and still
    # round-trip byte-exactly
    rng = np.random.default_rng(3)
    frames = _moving_frames(32, 32, 2) + [
        rng.integers(0, 256, 32 * 32 * 3, dtype=np.uint8).tobytes()
    ]
    sps, pps, nals, recons = H.encode_h264_ippp(
        32, 32, frames, qp=26, return_recon=True
    )
    _, _, dec = H.decode_h264_stream(sps, pps, nals)
    assert dec == recons
    # the noise P frame must be near all-intra-sized (no free lunch)
    assert len(nals[2]) > len(nals[1])


def test_annexb_ippp_round_trip_and_probe():
    frames = _moving_frames(48, 32, 4)
    es = H.encode_h264_annexb(48, 32, frames, gop="ippp")
    w, h, dec = H.decode_h264_annexb_stream(es)
    assert (w, h) == (48, 32) and len(dec) == 4
    _, _, _, recons = H.encode_h264_ippp(
        48, 32, frames, return_recon=True
    )
    assert dec == recons
    meta = H.probe_annexb(es)
    assert meta["n_frames"] == 4


def test_non_idr_i_slice_parses_and_decodes():
    """Open-GOP recovery point: a NON-IDR NAL carrying an I slice has
    no idr_pic_id and its dec_ref_pic_marking is the single adaptive
    flag (nal_ref_idc != 0) — previously misparsed as the two IDR
    flags, desyncing the bitstream.  A hand-written 1-MB I_PCM picture
    decodes byte-exactly through the non-IDR path."""
    w = H._BitWriter()
    w.ue(0)   # first_mb_in_slice
    w.ue(7)   # slice_type: I (all slices)
    w.ue(0)   # pps_id
    w.u(3, 4) # frame_num
    # poc_type 0 in our SPS:
    w.u(6, 4) # pic_order_cnt_lsb
    w.u(0, 1) # adaptive_ref_pic_marking_mode_flag (non-IDR, ref_idc!=0)
    w.se(0)   # slice_qp_delta
    w.ue(1)   # disable_deblocking_filter_idc = 1 (filter off)
    w.ue(25)  # mb_type: I_PCM
    w.align_byte()
    rng = np.random.default_rng(5)
    luma = rng.integers(0, 256, 256, dtype=np.uint8)
    cb = rng.integers(0, 256, 64, dtype=np.uint8)
    cr = rng.integers(0, 256, 64, dtype=np.uint8)
    for plane in (luma, cb, cr):
        w.raw_bytes(plane.tobytes())
    sps_nal = H.write_h264_sps(16, 16, 66, 30)
    sd = H._parse_sps_slice_fields(sps_nal)
    pd = H.parse_pps(H.write_pps())
    # nal_ref_idc = 2, type 1 (non-IDR slice)
    y, u, v = H.decode_frame_nal(b"\x41" + w.finish(), sd, pd)
    assert np.array_equal(y, luma.reshape(16, 16))
    assert np.array_equal(u, cb.reshape(8, 8))
    assert np.array_equal(v, cr.reshape(8, 8))
