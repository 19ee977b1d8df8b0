"""Long-term references UNDER B SLICES — round 14, the last marking
quarantine closure (pure list/derivation logic, no empirical tables):

- §8.2.4.2.3 initial B lists with a long-term in the DPB (short-terms
  POC-descending, then long-terms by ascending LongTermFrameIdx; the
  identical-lists first-two swap applies to the COMBINED list);
- §8.2.4.3 RPLM idc 2 (long_term_pic_num) on EITHER B list;
- §8.4.1.2.2 spatial direct: colZeroFlag is 0 when RefPicList1[0] is
  a LONG-TERM picture (its colocated motion never zeroes direct MVs);
- §8.4.1.2.3 temporal direct: a long-term RefPicList0[refIdxL0]
  copies mvCol UNSCALED (no POC distance is defined for a pinned
  picture).

The ``ipb-longterm`` chain (h264._encode_ipb_longterm) pins picture 1
long-term via MMCO 4+6 and cycles four B shapes over it.  The
load-bearing fixture: a 32x32 "mover" (static through the pinned
picture, translating after — makes wrong colZero zeroing visible) and
a 32-wide "flip" patch that exists ONLY in the pinned picture and P
pictures (drifting 3 px per appearance, shown in each B at the
previous P's position) — the long-term is the only reference that
predicts it in P pictures, which routes colocated motion through the
long-term for the temporal B.  Sensitivity is asserted directly: a
decoder that treats the long-term as short-term in either direct rule
reconstructs DIFFERENT pixels."""

from __future__ import annotations

import numpy as np
import pytest

from reindexer_spark import h264 as H
from reindexer_spark.codecs import (
    MediaFormatError,
    _unescape_rbsp,
    decode_mkv,
    decode_mp4,
    encode_mkv_coded,
    encode_mp4_coded,
)

W, HGT = 80, 48


def _lt_frames(n: int = 10, seed: int = 777) -> list[bytes]:
    rng = np.random.default_rng(seed)
    bg = rng.integers(0, 256, (HGT, W, 3), dtype=np.uint8)
    mover = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    flip = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    frames = []
    for i in range(n):
        f = bg.copy()
        mx = 4 + (0 if i <= 1 else 2 * (i - 1))
        my = 8 + (0 if i <= 1 else (i - 1))
        f[my : my + 32, mx : mx + 32] = mover
        if i >= 1:
            fx = 48 - 3 * ((i - 1) // 2)
            f[24:48, fx : fx + 32] = flip
        frames.append(f.tobytes())
    return frames


@pytest.fixture(scope="module")
def chain():
    frames = _lt_frames()
    sps, pps, nals, recon = H.encode_h264_ipb(
        W, HGT, frames, qp=26, return_recon=True, longterm=True
    )
    mp4 = encode_mp4_coded(W, HGT, intra_frames=frames, qp=26,
                           gop="ipb-longterm")
    mkv = encode_mkv_coded(W, HGT, intra_frames=frames, qp=26,
                           gop="ipb-longterm")
    return frames, sps, pps, nals, recon, mp4, mkv


def test_longterm_b_closed_loop_both_containers(chain):
    frames, _sps, _pps, _nals, recon, mp4, mkv = chain
    dw, dh, _d, out, sync = decode_mp4(mp4)
    assert (dw, dh) == (W, HGT)
    assert out == recon
    assert sync[0] and not any(sync[1:])
    assert decode_mkv(mkv)[3] == out


def test_header_syntax_covers_all_four_shapes(chain):
    """The coded stream REALLY carries: MMCO 4+6 on picture 1, one
    temporal B with an rplm_l1 picNum op, one spatial B with rplm_l0
    idc 2, one spatial B with rplm_l1 idc 2, and a default-list
    spatial B (no RPLM at all)."""
    _frames, sps, pps, nals, _recon, _mp4, _mkv = chain
    sd = H._parse_sps_slice_fields(sps)
    pd_ = H.parse_pps(pps)
    shapes = {"mmco46": 0, "b_plain": 0, "b_temporal_l1st": 0,
              "b_l0_lt": 0, "b_l1_lt": 0}
    for nal in nals[1:]:
        r = H._BitReader(_unescape_rbsp(nal[1:]))
        stype, _q, _d, _a, _b, info = H._parse_slice_header(
            r, sd, pd_, idr=False, nal_ref_idc=nal[0] >> 5
        )
        if stype == "P":
            mm = info.get("mmco") or []
            if any(op[0] == 4 for op in mm) and any(
                op[0] == 6 for op in mm
            ):
                shapes["mmco46"] += 1
            continue
        assert stype == "B"
        r0, r1 = info["rplm_l0"], info["rplm_l1"]
        if not r0 and not r1:
            shapes["b_plain"] += 1
        elif not info["direct_spatial"]:
            assert r1 and r1[0][0] in (0, 1)
            shapes["b_temporal_l1st"] += 1
        elif r0 and r0[0][0] == 2:
            shapes["b_l0_lt"] += 1
        elif r1 and r1[0][0] == 2:
            shapes["b_l1_lt"] += 1
    assert shapes["mmco46"] == 1
    for k in ("b_plain", "b_temporal_l1st", "b_l0_lt", "b_l1_lt"):
        assert shapes[k] >= 1, shapes


def test_colzero_suppression_is_load_bearing(chain):
    """A decoder that treats the long-term RefPicList1[0] as
    short-term (lets its motion feed colZeroFlag) reconstructs
    different pixels — the §8.4.1.2.2 branch really gates output."""
    _frames, _s, _p, _n, recon, mp4, _mkv = chain
    orig = H._b_direct_spatial

    def wrong(st, mbx, mby, ctx):
        c2 = dict(ctx)
        c2["l1_lts"] = None
        return orig(st, mbx, mby, c2)

    H._b_direct_spatial = wrong
    try:
        assert decode_mp4(mp4)[3] != recon
    finally:
        H._b_direct_spatial = orig


def test_temporal_longterm_unscaled_is_load_bearing(chain):
    """A decoder that POC-scales temporal-direct motion through a
    long-term RefPicList0 entry (instead of copying mvCol unscaled)
    reconstructs different pixels."""
    _frames, _s, _p, _n, recon, mp4, _mkv = chain
    orig = H._b_direct_temporal

    def wrong(st, mbx, mby, ctx):
        c2 = dict(ctx)
        c2["l0_lts"] = None
        return orig(st, mbx, mby, c2)

    H._b_direct_temporal = wrong
    try:
        assert decode_mp4(mp4)[3] != recon
    finally:
        H._b_direct_temporal = orig


def test_temporal_direct_longterm_branch_math():
    """Directed §8.4.1.2.3 check: identical colocated motion, one run
    with the mapped RefPicList0 entry short-term (scaled: tb/td = 6/4
    → dsf 384 → mv 1.5x) and one long-term (unscaled copy, mvL1 0)."""
    st = H._FrameState(1, 1)
    col = {
        "inter": np.ones((4, 4), dtype=bool),
        "uses0": np.ones((4, 4), dtype=bool),
        "mv": np.full((4, 4, 2), 12, dtype=np.int32),
        "ref0": np.zeros((4, 4), dtype=np.int32),
        "l0_pocs": (2,),
    }
    base = {
        "col": col, "poc": 8, "l0_pocs": (6, 0, 2), "l1_pocs": (6,),
        "n_ref_l0": 3, "n_ref_l1": 1, "direct_spatial": False,
        "l1_lts": (None,),
    }
    short = dict(base, l0_lts=(None, None, None))
    use0, use1, parts = H._b_direct_temporal(st, 0, 0, short)
    assert use0 and use1
    assert parts[0] == ((18, 18), (6, 6), 2, 0)  # dsf 1.5x, mvL1 = mv0-mvCol
    lt = dict(base, l0_lts=(None, None, 0))
    use0, use1, parts = H._b_direct_temporal(st, 0, 0, lt)
    assert parts[0] == ((12, 12), (0, 0), 2, 0)  # unscaled copy


def test_spatial_colzero_requires_short_term_l1():
    """Directed §8.4.1.2.2 check: a colocated zero-motion snapshot
    zeroes the direct MV only while RefPicList1[0] is short-term."""
    st = H._FrameState(2, 1)
    # left neighbour carries nonzero L0 motion so the median is nonzero
    st.inter[:, 0:4] = True
    st.uses0[:, 0:4] = True
    st.mv[:, 0:4] = (8, 4)
    st.ref0[:, 0:4] = 0
    st.slice_id[:, :] = 0
    col = {
        "inter": np.ones((4, 8), dtype=bool),
        "uses0": np.ones((4, 8), dtype=bool),
        "mv": np.zeros((4, 8, 2), dtype=np.int32),
        "ref0": np.zeros((4, 8), dtype=np.int32),
        "l0_pocs": (0,),
    }
    base = {
        "col": col, "poc": 4, "l0_pocs": (2, 0), "l1_pocs": (0, 2),
        "n_ref_l0": 1, "n_ref_l1": 1, "direct_spatial": True,
    }
    stc = dict(base, l0_lts=(None, None), l1_lts=(None, None))
    _u0, _u1, parts = H._b_direct_spatial(st, 1, 0, stc)
    assert all(p[0] == (0, 0) for p in parts)  # colZero fires
    ltc = dict(base, l0_lts=(None, 0), l1_lts=(0, None))
    _u0, _u1, parts = H._b_direct_spatial(st, 1, 0, ltc)
    assert all(p[0] == (8, 4) for p in parts)  # suppressed → median MV


def test_ref_list_order_idc2_on_swapped_default():
    """External pin of the §8.2.4.3.1 idc-2 step over the B-L1 default
    order (encoder and decoder share _ref_list_order, so a directed
    case with hand-derived expectations is the external check)."""
    # DPB: fnums [5, 4, 1], entry 2 long-term (LongTermFrameIdx 0)
    lts = [None, None, 0]
    fnums = [5, 4, 1]
    # L1 default = swap of first two; idc 2 pulls the long-term first
    out = H._ref_list_order(
        3, [(2, 0)], 6, fnums, 16, 2, default=[1, 0, 2], ref_lts=lts
    )
    assert out == [2, 1]
    # no mods: the swapped default truncates
    assert H._ref_list_order(
        3, None, 6, fnums, 16, 2, default=[1, 0, 2], ref_lts=lts
    ) == [1, 0]
    # idc 2 naming an absent LongTermFrameIdx quarantines
    with pytest.raises(MediaFormatError):
        H._ref_list_order(
            3, [(2, 1)], 6, fnums, 16, 2, default=[1, 0, 2], ref_lts=lts
        )


def test_annexb_longterm_ipb_stream_decodes(chain):
    """The elementary-stream walker (shared _Dpb) decodes the
    ipb-longterm chain byte-identically to the closed loop."""
    frames, _s, _p, _n, recon, _mp4, _mkv = chain
    stream = H.encode_h264_annexb(
        W, HGT, frames, 26, gop="ipb-longterm"
    )
    assert H.decode_h264_annexb_stream(stream)[2] == recon


def test_b_frames_stay_out_of_the_dpb(chain):
    """Dropping every even (B) sample after the first two pictures
    must not change the P chain: B pictures are non-reference."""
    frames, sps, pps, nals, recon, _mp4, _mkv = chain
    keep = [n for i, n in enumerate(nals) if i < 2 or i % 2 == 1]
    want = [r for i, r in enumerate(recon) if i < 2 or i % 2 == 1]
    _w, _h, dec = H.decode_h264_stream(sps, pps, keep)
    assert dec == want
