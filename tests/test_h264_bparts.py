"""Partitioned B macroblocks — round 13.

Table 7-14 two-partition types (B_X_Y_16x8 / B_X_Y_8x16, mb_type
4..21) and B_8x8 (22) with every Table 7-18 sub_mb_type: per-partition
per-list ref_idx te(v) + mvd syntax in the §7.3.5.1/.2 order (all
ref_idx_l0, all ref_idx_l1, all mvd_l0, all mvd_l1), per-list
partition-granular MV prediction, B_Direct_8x8 via the MB-level direct
derivation.

The closed-loop invariant carries over; the crafted-bitstream tests
below additionally pin the TYPE TABLES and the syntax walk directly —
a transposed table entry would round-trip fine through the shared
encoder but decode real streams wrong."""

from __future__ import annotations

import numpy as np
import pytest

from reindexer_spark import h264 as H
from reindexer_spark.codecs import MediaFormatError
from tests.test_h264_inter import _moving_frames


def _split_pan(w: int, h: int, n: int, seed: int = 7):
    """Top half pans right, bottom half pans left — the 16x8 shape."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 2 * n, w + 4 * n, 3), dtype=np.uint8)
    out = []
    for i in range(n):
        f = np.empty((h, w, 3), np.uint8)
        f[: h // 2] = base[i : i + h // 2,
                           2 * n + 2 * i : 2 * n + 2 * i + w]
        f[h // 2 :] = base[n + i : n + i + h - h // 2,
                           2 * n - 2 * i : 2 * n - 2 * i + w]
        out.append(f.tobytes())
    return out


def _quad_pan(w: int, h: int, n: int, seed: int = 13):
    """Four quadrants with four different motions — the B_8x8 shape."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 4 * n, w + 4 * n, 3), dtype=np.uint8)
    out = []
    h2, w2 = h // 2, w // 2
    for i in range(n):
        f = np.empty((h, w, 3), np.uint8)
        f[:h2, :w2] = base[2 * i : 2 * i + h2, 2 * i : 2 * i + w2]
        f[:h2, w2:] = base[2 * n - 2 * i : 2 * n - 2 * i + h2,
                           2 * n + 3 * i : 2 * n + 3 * i + w - w2]
        f[h2:, :w2] = base[2 * n + 3 * i : 2 * n + 3 * i + h - h2,
                           2 * n - 2 * i : 2 * n - 2 * i + w2]
        f[h2:, w2:] = base[4 * n - i : 4 * n - i + h - h2,
                           4 * n - 3 * i : 4 * n - 3 * i + w - w2]
        out.append(f.tobytes())
    return out


@pytest.mark.parametrize("direct", ["spatial", "temporal"])
def test_split_pan_closed_loop(direct):
    w, h = 64, 48
    frames = _split_pan(w, h, 7)
    sps, pps, nals, rec = H.encode_h264_ipb(
        w, h, frames, qp=26, return_recon=True, direct=direct
    )
    dw, dh, dec = H.decode_h264_stream(sps, pps, nals)
    assert (dw, dh) == (w, h)
    assert dec == rec


@pytest.mark.parametrize("direct", ["spatial", "temporal"])
def test_quad_pan_closed_loop(direct):
    w, h = 48, 32
    frames = _quad_pan(w, h, 7)
    sps, pps, nals, rec = H.encode_h264_ipb(
        w, h, frames, qp=26, return_recon=True, direct=direct
    )
    dw, dh, dec = H.decode_h264_stream(sps, pps, nals)
    assert dec == rec


def _decode_histogram(sps, pps, nals):
    sd = H._parse_sps_slice_fields(sps)
    pd = H.parse_pps(pps)
    refs: list = []
    motions: list = []
    hist: dict = {}
    for nal in nals:
        if nal[0] >> 5 == 0:
            hh = H.b_mode_histogram(
                nal, sd, pd, refs[0], refs[1], col=motions[1]
            )
            for k, v in hh.items():
                hist[k] = hist.get(k, 0) + v
        else:
            sink: dict = {}
            pl = H.decode_frame_nal(
                nal, sd, pd,
                ref=refs[0] if refs else None,
                ref2=refs[1] if len(refs) > 1 else None,
                motion_sink=sink,
            )
            refs = [pl] + refs[:1]
            motions = [sink] + motions[:1]
    return hist


def test_two_partition_types_engage():
    sps, pps, nals = H.encode_h264_ipb(64, 48, _split_pan(64, 48, 7),
                                       qp=26)
    hist = _decode_histogram(sps, pps, nals)
    assert hist.get("parts", 0) > 0, hist


def test_b8x8_and_sub_splits_engage():
    sps, pps, nals = H.encode_h264_ipb(32, 32, _quad_pan(32, 32, 7),
                                       qp=26)
    hist = _decode_histogram(sps, pps, nals)
    assert hist.get("b8x8", 0) > 0, hist
    assert hist.get("bsub", 0) > 0, hist


# ---------------------------------------------------------------------------
# crafted-bitstream table pins
# ---------------------------------------------------------------------------


def _one_mb_refs(seed: int = 3):
    """Two distinguishable 16x16 reference pictures."""
    rng = np.random.default_rng(seed)

    def pic():
        return (
            rng.integers(0, 256, (16, 16), dtype=np.uint8),
            rng.integers(0, 256, (8, 8), dtype=np.uint8),
            rng.integers(0, 256, (8, 8), dtype=np.uint8),
        )

    return pic(), pic()


@pytest.mark.parametrize("mb_type", range(4, 22))
def test_two_partition_table_pin(mb_type):
    """Decode a crafted one-MB B slice for EVERY two-partition type:
    the per-partition list-usage flags must match Table 7-14's pair
    and the geometry must match the 16x8/8x16 shape."""
    pair = H._B_PART_PAIRS[(mb_type - 4) // 2]
    shape = 1 if mb_type % 2 == 0 else 2
    r1, r0 = _one_mb_refs()
    ctx = H._b_ctx([r1, r0])
    st = H._FrameState(1, 1)
    w_ = H._BitWriter()
    w_.ue(0)        # mb_skip_run
    w_.ue(mb_type)
    n_mvds = sum(2 if m == "bi" else 1 for m in pair)
    for _ in range(n_mvds):
        w_.se(0)    # mvd x
        w_.se(0)    # mvd y
    w_.ue(H._CBP_INTER_ENC[0])  # cbp 0
    H._decode_b_slice_mbs(H._BitReader(w_.finish()), st, 26, 0, ctx)
    # list usage per partition region
    regions = (
        (np.s_[0:2, 0:4], np.s_[2:4, 0:4])  # 16x8: top, bottom
        if shape == 1
        else (np.s_[0:4, 0:2], np.s_[0:4, 2:4])  # 8x16: left, right
    )
    for region, mode in zip(regions, pair):
        assert st.uses0[region].all() == (mode in ("l0", "bi"))
        assert st.uses1[region].all() == (mode in ("l1", "bi"))
        assert st.inter[region].all()
    assert st.b_mode_counts["parts"] == 1


# INDEPENDENT transcription of Table 7-18 for the pin below: sub_type
# → (mode, [(block dx, dy, w, h)] relative to the 8x8 quadrant).  A
# transposed entry in h264.py's _B_SUB_TYPES would round-trip fine
# through the shared encoder — this literal is what catches it.
_TABLE_7_18 = {
    0: (None, [(0, 0, 2, 2)]),
    1: ("l0", [(0, 0, 2, 2)]),
    2: ("l1", [(0, 0, 2, 2)]),
    3: ("bi", [(0, 0, 2, 2)]),
    4: ("l0", [(0, 0, 2, 1), (0, 1, 2, 1)]),
    5: ("l0", [(0, 0, 1, 2), (1, 0, 1, 2)]),
    6: ("l1", [(0, 0, 2, 1), (0, 1, 2, 1)]),
    7: ("l1", [(0, 0, 1, 2), (1, 0, 1, 2)]),
    8: ("bi", [(0, 0, 2, 1), (0, 1, 2, 1)]),
    9: ("bi", [(0, 0, 1, 2), (1, 0, 1, 2)]),
    10: ("l0", [(0, 0, 1, 1), (1, 0, 1, 1), (0, 1, 1, 1),
                (1, 1, 1, 1)]),
    11: ("l1", [(0, 0, 1, 1), (1, 0, 1, 1), (0, 1, 1, 1),
                (1, 1, 1, 1)]),
    12: ("bi", [(0, 0, 1, 1), (1, 0, 1, 1), (0, 1, 1, 1),
                (1, 1, 1, 1)]),
}


@pytest.mark.parametrize("sub_type", range(13))
def test_b8x8_sub_type_table_pin(sub_type):
    """Decode a crafted one-MB B_8x8 slice with all four quadrants
    coded as ``sub_type`` and REPLAY the expected motion state from an
    independent Table 7-18 transcription: mode, geometry and the mvd
    walk order must all agree block for block."""
    mode, geoms = _TABLE_7_18[sub_type]
    r1, r0 = _one_mb_refs()
    ctx = H._b_ctx([r1, r0])
    st = H._FrameState(1, 1)
    w_ = H._BitWriter()
    w_.ue(0)   # mb_skip_run
    w_.ue(22)  # B_8x8
    for _ in range(4):
        w_.ue(sub_type)
    mvds = []
    if mode is not None:
        n_lists = 2 if mode == "bi" else 1
        for lst in range(n_lists):
            for q in range(4):
                for p in range(len(geoms)):
                    d = 4 * (16 * lst + q * len(geoms) + p + 1)
                    mvds.append(d)
                    w_.se(d)
                    w_.se(-d)
    w_.ue(H._CBP_INTER_ENC[0])
    H._decode_b_slice_mbs(H._BitReader(w_.finish()), st, 26, 0, ctx)
    if mode is None:
        # B_Direct_8x8 everywhere — first MB of a picture: the
        # zero-prediction direct (both lists, zero MVs)
        assert st.uses0.all() and st.uses1.all()
        assert (st.mv == 0).all() and (st.mv1 == 0).all()
        return
    assert st.uses0.all() == (mode in ("l0", "bi"))
    assert st.uses1.all() == (mode in ("l1", "bi"))
    # replay on a shadow state using the INDEPENDENT geometry
    shadow = H._FrameState(1, 1)
    k = 0
    for lst in ((0, 1) if mode == "bi" else
                ((0,) if mode == "l0" else (1,))):
        for q8, (qx, qy) in enumerate(((0, 0), (2, 0), (0, 2), (2, 2))):
            for dx, dy, pw, ph in geoms:
                part = ("sub", qx + dx, qy + dy, pw, ph)
                pmv = H._pred_mv_b(
                    shadow, 0, 0, lst, ref_idx=0,
                    abx=qx + dx, aby=qy + dy, pw=pw, kind="sub",
                )
                d = mvds[k]
                k += 1
                mv = (pmv[0] + d, pmv[1] - d)
                H._store_b_part_lst(shadow, 0, 0, part, lst, mv, 0)
    if mode in ("l0", "bi"):
        assert (st.mv == shadow.mv).all()
    if mode in ("l1", "bi"):
        assert (st.mv1 == shadow.mv1).all()
    assert st.b_mode_counts["b8x8"] == 1
    if sub_type >= 4:
        assert st.b_mode_counts.get("bsub", 0) == 1


def test_partitioned_ref_idx_selects_the_picture():
    """A crafted two-partition B MB with ref_idx_l0 = 1 under a
    3-deep list 0 must predict from l0[1] — pinned by comparing the
    reconstruction against direct MC from that picture."""
    rng = np.random.default_rng(5)

    def pic():
        return (
            rng.integers(0, 256, (16, 16), dtype=np.uint8),
            rng.integers(0, 256, (8, 8), dtype=np.uint8),
            rng.integers(0, 256, (8, 8), dtype=np.uint8),
        )

    l0 = [pic(), pic(), pic()]
    ctx = H._b_ctx(l0, l0_pocs=[6, 4, 2], poc=8, n_ref_l0=3)
    st = H._FrameState(1, 1)
    w_ = H._BitWriter()
    w_.ue(0)  # mb_skip_run
    w_.ue(4)  # B_L0_L0_16x8
    w_.te(1, 2)  # ref_idx_l0 partition 0 → l0[1]
    w_.te(2, 2)  # ref_idx_l0 partition 1 → l0[2]
    for _ in range(2):
        w_.se(0)
        w_.se(0)
    w_.ue(H._CBP_INTER_ENC[0])
    H._decode_b_slice_mbs(H._BitReader(w_.finish()), st, 26, 0, ctx)
    assert (st.ref0[0:2] == 1).all() and (st.ref0[2:4] == 2).all()
    # zero-MV MC from l0[1] is that picture's pixels
    assert (st.y[0:8] == l0[1][0][0:8]).all()
    assert (st.y[8:16] == l0[2][0][8:16]).all()


def test_b8x8_invalid_sub_type_quarantines():
    r1, r0 = _one_mb_refs()
    ctx = H._b_ctx([r1, r0])
    st = H._FrameState(1, 1)
    w_ = H._BitWriter()
    w_.ue(0)
    w_.ue(22)
    for _ in range(4):
        w_.ue(13)  # out of Table 7-18
    with pytest.raises(MediaFormatError, match="sub_mb_type"):
        H._decode_b_slice_mbs(H._BitReader(w_.finish()), st, 26, 0, ctx)


def test_partitioned_b_through_containers():
    from reindexer_spark.codecs import (
        decode_mkv,
        decode_mp4,
        encode_mkv_coded,
        encode_mp4_coded,
    )

    w, h = 64, 48
    frames = _split_pan(w, h, 5)
    _, _, _, recons = H.encode_h264_ipb(
        w, h, frames, qp=26, return_recon=True
    )
    mp4 = encode_mp4_coded(w, h, intra_frames=frames, qp=26, gop="ipb")
    mkv = encode_mkv_coded(w, h, intra_frames=frames, qp=26, gop="ipb")
    for payload, dec in ((mp4, decode_mp4), (mkv, decode_mkv)):
        dw, dh, _durs, out, _sync = dec(payload)
        assert (dw, dh) == (w, h)
        assert out == recons


def test_mixed_modes_closed_loop_with_static_tail():
    """Partitioned modes + direct/skip + intra in ONE chain: motion
    boundaries then a static tail."""
    w, h = 64, 48
    base = _split_pan(w, h, 4)
    frames = base + [base[-1], base[-1]]
    sps, pps, nals, rec = H.encode_h264_ipb(
        w, h, frames, qp=26, return_recon=True
    )
    dw, dh, dec = H.decode_h264_stream(sps, pps, nals)
    assert dec == rec
