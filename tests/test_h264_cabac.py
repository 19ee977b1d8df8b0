"""CABAC entropy layer (reindexer_spark.h264_cabac): engine fuzz,
binarization units, closed-loop slice/GOP/container gates, and the
provenance quarantine contract.

The load-bearing invariant mirrors the CAVLC lanes: decoder output ≡
encoder closed-loop reconstruction, byte for byte, through deblocked
references — failures point at the arithmetic engine, a binarization,
or a context-increment asymmetry."""

from __future__ import annotations

import random

import numpy as np
import pytest

from reindexer_spark.codecs import (
    MediaFormatError,
    _unescape_rbsp,
    decode_mkv,
    decode_mp4,
    encode_mkv_coded,
    encode_mp4_coded,
    probe_media,
)
from reindexer_spark.h264 import (
    _BitReader,
    _BitWriter,
    decode_avcc_samples,
    decode_frame_nal,
    decode_h264_annexb_stream,
    encode_avcc_samples,
    encode_h264_annexb,
    parse_pps,
    split_sample_nals,
    write_pps,
    _parse_sps_slice_fields,
)
from reindexer_spark import h264_cabac as hc
from reindexer_spark.h264_cabac import (
    _RANGE_LPS,
    _TRANS_LPS,
    CabacDecoder,
    CabacEncoder,
    CabacIO,
    cabac_marker_sei,
    encode_h264_ippp_cabac,
    is_cabac_marker,
)


def _enc_io():
    w = _BitWriter()
    return w, CabacIO(enc=CabacEncoder(w))


def _dec_io(data: bytes):
    r = _BitReader(_unescape_rbsp(data))
    return CabacIO(dec=CabacDecoder(r))


def test_engine_tables_invariants():
    assert _RANGE_LPS[0] == (128, 176, 208, 240)  # published row 0
    assert _RANGE_LPS[63] == (2, 2, 2, 2)  # published terminal row
    assert len(_RANGE_LPS) == 64 and len(_TRANS_LPS) == 64
    for row in _RANGE_LPS:
        assert all(2 <= v <= 240 for v in row)
        assert row[0] <= row[1] <= row[2] <= row[3]  # wider range → wider LPS
    for s in range(62):  # probability decays monotonically with state
        assert all(
            _RANGE_LPS[s][q] >= _RANGE_LPS[s + 1][q] for q in range(4)
        )
    assert all(0 <= t <= 63 for t in _TRANS_LPS)
    assert _TRANS_LPS[0] == 0  # state 0 stays (MPS flips instead)


def test_engine_fuzz_roundtrip():
    rng = random.Random(20260815)
    for _ in range(40):
        segs = [
            [
                (rng.choice(["ctx", "byp"]), rng.randint(0, hc.N_CTX - 2),
                 rng.randint(0, 1))
                for _ in range(rng.randint(0, 80))
            ]
            for _ in range(rng.randint(1, 12))
        ]
        w, io = _enc_io()
        for si, seg in enumerate(segs):
            for kind, idx, b in seg:
                io.bin(idx, b) if kind == "ctx" else io.byp(b)
            io.term(1 if si == len(segs) - 1 else 0)
        io2 = _dec_io(w.finish())
        for si, seg in enumerate(segs):
            for kind, idx, b in seg:
                got = io2.bin(idx) if kind == "ctx" else io2.byp()
                assert got == b
            assert io2.term() == (1 if si == len(segs) - 1 else 0)


def test_mvd_and_level_binarization_roundtrip():
    """UEG3 mvd (incl. the EG3 suffix past uCoff 9, signs) and UEG0
    levels (incl. the EG0 suffix past 14) through fresh context sets."""
    cst = hc._CabacMbState(4, 4)
    vals = [0, 1, -1, 4, -8, 9, 10, -37, 200, -1023]
    w, io = _enc_io()
    for v in vals:
        hc._syn_mvd(io, cst, 0, 2, 2, v)
        hc._syn_mvd(io, cst, 1, 2, 2, v)
    io.term(1)
    io2 = _dec_io(w.finish())
    cst2 = hc._CabacMbState(4, 4)
    for v in vals:
        assert hc._syn_mvd(io2, cst2, 0, 2, 2) == v
        assert hc._syn_mvd(io2, cst2, 1, 2, 2) == v
    assert io2.term() == 1

    levels = [0, 1, 2, 13, 14, 15, 100, 5000]
    w, io = _enc_io()
    eq1 = gt1 = 0
    for lv in levels:
        hc._syn_level(io, 2, eq1, gt1, lv)
        eq1, gt1 = (eq1 + 1, gt1) if lv == 0 else (eq1, gt1 + 1)
    io.term(1)
    io2 = _dec_io(w.finish())
    eq1 = gt1 = 0
    for lv in levels:
        assert hc._syn_level(io2, 2, eq1, gt1) == lv
        eq1, gt1 = (eq1 + 1, gt1) if lv == 0 else (eq1, gt1 + 1)


def test_residual_block_roundtrip_all_cats():
    rng = random.Random(99)
    for cat in (0, 1, 2, 3, 4):
        n = hc._MAX_COEFF[cat]
        cases = [
            [0] * n,
            [1] + [0] * (n - 1),
            [0] * (n - 1) + [-3],  # significance implied at the end
            [rng.choice([0, 0, 1, -1, 2, -17, 40]) for _ in range(n)],
        ]
        for coeffs in cases:
            w, io = _enc_io()
            cst = hc._CabacMbState(2, 2)
            _full, tot = hc._syn_residual(
                io, cst, cat, 0, 0, 0, 0, 0, True, list(coeffs)
            )
            io.term(1)
            io2 = _dec_io(w.finish())
            cst2 = hc._CabacMbState(2, 2)
            got, tot2 = hc._syn_residual(
                io2, cst2, cat, 0, 0, 0, 0, 0, True
            )
            assert got == list(coeffs)
            assert tot == tot2 == sum(1 for c in coeffs if c)


def _noise_clip(w, h, n, seed=3, dx=2, dy=1):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    return [
        np.roll(base, shift=(i * dy, i * dx), axis=(0, 1)).tobytes()
        for i in range(n)
    ]


def _gradient_clip(w, h, n):
    """Smooth gradients + sharp diagonal edges: the content class that
    makes the I_4x4 estimate win over I_16x16."""
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    frames = []
    for i in range(n):
        g = ((xx * 3 + yy * 5 + i * 7) % 256).astype(np.uint8)
        g[(xx + yy) % 16 < 2] = 255
        frames.append(np.stack([g, g[::-1], g.T[:h, :w] if w == h else g],
                               axis=-1).astype(np.uint8).tobytes())
    return frames


def test_cabac_ippp_closed_loop_noise():
    w, h = 48, 32
    frames = _noise_clip(w, h, 4)
    sps_nal, pps_nal, nals, recons = encode_h264_ippp_cabac(
        w, h, frames, qp=26, return_recon=True
    )
    assert is_cabac_marker(nals[0])
    sps = _parse_sps_slice_fields(sps_nal)
    pps = parse_pps(pps_nal, allow_cabac=True)
    assert pps["entropy_coding_mode"] == 1
    from reindexer_spark.h264 import yuv420_to_rgb

    ref = None
    outs = []
    for nal in nals[1:]:
        # direct decode_frame_nal callers must assert marker provenance
        y, u, v = decode_frame_nal(nal, sps, pps, ref=ref, cabac_ok=True)
        ref = (y, u, v)
        ct, cl = sps["crop_t"], sps["crop_l"]
        outs.append(
            yuv420_to_rgb(
                y[ct : ct + h, cl : cl + w],
                u[ct // 2 : ct // 2 + (h + 1) // 2,
                  cl // 2 : cl // 2 + (w + 1) // 2],
                v[ct // 2 : ct // 2 + (h + 1) // 2,
                  cl // 2 : cl // 2 + (w + 1) // 2],
            )
        )
    assert outs == recons  # decoder ≡ encoder closed loop


def test_cabac_covers_i4_and_sub_partitions(monkeypatch):
    """The coverage probe: gradient content must route through the
    I_4x4 CABAC path, and quadrant-heavy motion through sub_mb_type —
    otherwise those binarizations are dead code the closed-loop gate
    never exercises."""
    calls = {"i4": 0, "sub": 0}
    orig_i4 = hc._encode_mb_i4_cabac
    orig_sub = hc._syn_sub_mb_type

    def spy_i4(*a, **k):
        calls["i4"] += 1
        return orig_i4(*a, **k)

    def spy_sub(io, val=None):
        calls["sub"] += 1
        return orig_sub(io, val)

    monkeypatch.setattr(hc, "_encode_mb_i4_cabac", spy_i4)
    monkeypatch.setattr(hc, "_syn_sub_mb_type", spy_sub)
    hc._CABAC_IPPP_CACHE.clear()
    w, h = 64, 48
    frames = _gradient_clip(w, h, 2)
    sps_nal, pps_nal, nals, recons = encode_h264_ippp_cabac(
        w, h, frames, qp=30, return_recon=True
    )
    assert calls["i4"] > 0, "gradient clip never chose I_4x4"
    # independent-noise P frame: large residual everywhere → P_8x8 search
    rng = np.random.default_rng(8)
    frames2 = [
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8).tobytes()
        for _ in range(2)
    ]
    hc._CABAC_IPPP_CACHE.clear()
    encode_h264_ippp_cabac(w, h, frames2, qp=26)
    assert calls["sub"] > 0, "independent-noise P frame never chose P_8x8"
    sps = _parse_sps_slice_fields(sps_nal)
    pps = parse_pps(pps_nal, allow_cabac=True)
    ref = None
    for nal in nals[1:]:
        ref = decode_frame_nal(nal, sps, pps, ref=ref, cabac_ok=True)
    hc._CABAC_IPPP_CACHE.clear()


def test_cabac_containers_agree_and_recon_exact():
    w, h = 40, 32
    frames = _noise_clip(w, h, 3, seed=5, dx=1, dy=2)
    _s, _p, _n, recons = encode_h264_ippp_cabac(
        w, h, frames, qp=26, return_recon=True
    )
    mp4 = encode_mp4_coded(
        w, h, intra_frames=frames, qp=26, gop="ippp", entropy="cabac"
    )
    mkv = encode_mkv_coded(
        w, h, intra_frames=frames, qp=26, gop="ippp", entropy="cabac"
    )
    dw, dh, _durs, out, sync = decode_mp4(mp4)
    w2, h2, _d2, out2, _s2 = decode_mkv(mkv)
    assert (dw, dh) == (w, h) == (w2, h2)
    assert sync[0] and not any(sync[1:])  # IDR + P chain, truthful stss
    assert out == out2 == recons
    meta = probe_media(mp4)
    assert meta["codec"] == "h264"
    assert meta["profile"] == 77  # Main: the CABAC-signalling profile


def test_cabac_annexb_stream():
    w, h = 32, 32
    frames = _noise_clip(w, h, 3, seed=11)
    data = encode_h264_annexb(w, h, frames, qp=26, gop="ippp",
                              entropy="cabac")
    dw, dh, outs = decode_h264_annexb_stream(data)
    _s, _p, _n, recons = encode_h264_ippp_cabac(
        w, h, frames, qp=26, return_recon=True
    )
    assert (dw, dh) == (w, h)
    assert outs == recons


def test_markerless_cabac_quarantines():
    """The honesty boundary: CABAC without the provenance SEI must
    refuse to decode (init tables are not claimed spec-faithful, so an
    external CABAC stream would decode into garbage, not pixels)."""
    w, h = 32, 32
    frames = _noise_clip(w, h, 2, seed=13)
    avcc, samples = encode_avcc_samples(
        w, h, frames, 26, gop="ippp", entropy="cabac"
    )
    nals = split_sample_nals(samples[0], 4)
    stripped = b"".join(
        len(n).to_bytes(4, "big") + n for n in nals if (n[0] & 0x1F) != 6
    )
    with pytest.raises(MediaFormatError):
        decode_avcc_samples(avcc, [stripped] + samples[1:])
    # and the default parse path still quarantines any CABAC PPS
    with pytest.raises(MediaFormatError):
        parse_pps(write_pps(26, cabac=True))


def test_marker_sei_shape():
    from reindexer_spark.codecs import _unescape_rbsp
    from reindexer_spark.h264_cabac import (
        cabac_provenance_ok,
        cabac_stream_digest,
    )

    slices = [b"\x65fake-idr", b"\x41fake-p"]
    sei = cabac_marker_sei(slices)
    assert (sei[0] & 0x1F) == 6 and is_cabac_marker(sei)
    assert not is_cabac_marker(b"\x06\x05\x10" + bytes(16) + b"\x80")
    # the embedded digest binds the exact slice bytes (parse through
    # the emulation-escape layer, not raw byte offsets)
    assert _unescape_rbsp(sei[1:])[18:34] == cabac_stream_digest(slices)
    assert cabac_provenance_ok([sei], slices)
    assert not cabac_provenance_ok([sei], slices[:1])
    assert not cabac_provenance_ok([sei], list(reversed(slices)))
    assert not cabac_provenance_ok([], slices)


def test_marker_sei_digest_emulation_escaped():
    """Round-12 review: a digest containing a start-code pattern must
    be emulation-escaped or the Annex-B walk splits the module's OWN
    marker SEI.  Mine a slice set whose digest embeds 00 00 0x, then
    assert the NAL contains no start-code pattern and still verifies
    after an Annex-B split round trip."""
    from reindexer_spark.h264 import split_annexb
    from reindexer_spark.h264_cabac import (
        cabac_provenance_ok,
        cabac_stream_digest,
    )

    found = None
    for i in range(200_000):
        s = [b"\x65" + i.to_bytes(4, "big")]
        dg = cabac_stream_digest(s)
        if any(
            dg[k] == 0 and dg[k + 1] == 0 and dg[k + 2] <= 3
            for k in range(len(dg) - 2)
        ):
            found = s
            break
    assert found is not None, "no emulation-triggering digest in range"
    sei = cabac_marker_sei(found)
    # no byte-aligned start-code pattern inside the NAL payload
    assert b"\x00\x00\x00" not in sei and b"\x00\x00\x01" not in sei
    # survives an Annex-B framing round trip intact
    stream = b"\x00\x00\x00\x01" + sei + b"\x00\x00\x00\x01" + found[0]
    nals = split_annexb(stream)
    assert len(nals) == 2
    assert cabac_provenance_ok([nals[0]], [nals[1]])


def test_spoofed_marker_still_quarantines():
    """Round-12 review: the marker UUID is a public constant — a
    foreign CABAC stream that embeds it must STILL quarantine, because
    the SEI's digest can't match slices our encoder didn't produce."""
    from reindexer_spark.h264_cabac import cabac_marker_sei as mk

    w, h = 32, 32
    frames = _noise_clip(w, h, 2, seed=13)
    avcc, samples = encode_avcc_samples(
        w, h, frames, 26, gop="ippp", entropy="cabac"
    )
    nals = split_sample_nals(samples[0], 4)
    slices = [n for n in nals if (n[0] & 0x1F) not in (6,)]
    # forge a marker whose digest covers DIFFERENT slices (an attacker
    # can copy the UUID, but not predict a digest for foreign bytes)
    forged = mk([b"\x65not-this-stream"])
    spoofed0 = b"".join(
        len(n).to_bytes(4, "big") + n for n in [forged] + slices
    )
    with pytest.raises(MediaFormatError):
        decode_avcc_samples(avcc, [spoofed0] + samples[1:])
    # sanity: the genuine sample (marker digest == slice digest) decodes
    dw, dh, outs = decode_avcc_samples(avcc, samples)
    assert (dw, dh) == (w, h) and len(outs) == 2


def test_cavlc_paths_unaffected():
    """CAVLC fixtures keep decoding after the CABAC integration (the
    dispatch is PPS-driven)."""
    w, h = 32, 32
    frames = _noise_clip(w, h, 3, seed=17)
    mp4 = encode_mp4_coded(w, h, intra_frames=frames, qp=26, gop="ippp")
    dw, dh, _durs, out, sync = decode_mp4(mp4)
    assert (dw, dh) == (w, h) and len(out) == 3
    assert sync[0] and not any(sync[1:])
