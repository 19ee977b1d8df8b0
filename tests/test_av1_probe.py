"""AV1 header-only probe — round 13 (AV1 spec §5.5 sequence header
OBU, AV1-ISOBMFF §2.3 av1C record; mp4 ``av01`` / mkv ``V_AV1``).

Probe-only: decode stays quarantined (no AV1 entropy decoder is
claimed) — the funnel recovers codec/profile/level/dims so a 100 TB
media pass can filter before paying for decode."""

from __future__ import annotations

import numpy as np
import pytest

from reindexer_spark.codecs import (
    MediaFormatError,
    _read_leb128,
    build_av1c,
    decode_mkv,
    decode_mp4,
    encode_mkv_coded,
    encode_mp4_coded,
    parse_av1_seq_obu,
    parse_av1c,
    probe_media,
    write_av1_seq_obu,
)


def _payload(obu: bytes) -> bytes:
    size, pos = _read_leb128(obu, 1)
    return obu[pos : pos + size]


@pytest.mark.parametrize("w,h,prof,lev", [
    (1918, 814, 0, 12),   # level > 7 → tier bit present
    (640, 360, 1, 5),     # level ≤ 7 → no tier bit; profile 1 (444)
    (121, 77, 2, 19),     # odd dims — AV1 sizes are exact
    (2, 2, 0, 0),
])
def test_seq_obu_roundtrip(w, h, prof, lev):
    obu = write_av1_seq_obu(w, h, prof, lev)
    meta = parse_av1_seq_obu(_payload(obu))
    # round 14: the probe walks the full §5.5 tail — bit depth,
    # chroma (profile-implied: 0=4:2:0, 1=4:4:4, 2=4:2:2) and tier
    assert meta == {
        "codec": "av1", "profile": prof, "level": lev, "tier": 0,
        "width": w, "height": h, "bit_depth": 8,
        "chroma_format": {0: 1, 1: 3, 2: 2}[prof],
    }


def test_av1c_roundtrip_and_malformed():
    obu = write_av1_seq_obu(800, 600, 0, 9)
    body = build_av1c(obu, 0, 9)
    assert parse_av1c(body)["width"] == 800
    with pytest.raises(MediaFormatError, match="av1C"):
        parse_av1c(b"\x00" + body[1:])  # marker/version wrong
    with pytest.raises(MediaFormatError, match="sequence header"):
        parse_av1c(body[:4])  # configOBUs empty


def test_decoder_model_quarantines():
    """timing_info with decoder_model_info signalled → refuse (the
    probe does not walk the decoder-model syntax)."""
    from reindexer_spark.codecs import _RbspWriter

    wtr = _RbspWriter()
    wtr.u(0, 3)   # profile
    wtr.u(0, 1)   # still
    wtr.u(0, 1)   # reduced
    wtr.u(1, 1)   # timing_info_present
    wtr.u(1, 32)  # num_units_in_display_tick
    wtr.u(25, 32)  # time_scale
    wtr.u(0, 1)   # equal_picture_interval
    wtr.u(1, 1)   # decoder_model_info_present → quarantine
    while len(wtr.bits) & 7:
        wtr.bits.append(0)
    payload = bytes(
        int("".join(str(b) for b in wtr.bits[i : i + 8]), 2)
        for i in range(0, len(wtr.bits), 8)
    )
    with pytest.raises(MediaFormatError, match="decoder-model"):
        parse_av1_seq_obu(payload)


@pytest.mark.parametrize("enc,dec,kind", [
    (encode_mp4_coded, decode_mp4, "mp4"),
    (encode_mkv_coded, decode_mkv, "mkv"),
])
def test_av1_probe_through_containers(enc, dec, kind):
    payload = enc(1280, 714, codec="av1", n_frames=4, profile=0,
                  level=12)
    meta = probe_media(payload)
    assert meta["codec"] == "av1"
    assert (meta["width"], meta["height"]) == (1280, 714)
    assert (meta["profile"], meta["level"]) == (0, 12)
    assert meta["n_frames"] == 4
    # decode stays quarantined — probe-only coverage
    with pytest.raises(MediaFormatError):
        dec(payload)


def test_av1c_fuzz_quarantines():
    """Corrupted av1C bodies quarantine, never crash."""
    rng = np.random.default_rng(17)
    obu = write_av1_seq_obu(1920, 1080, 0, 13)
    body = bytearray(build_av1c(obu, 0, 13))
    for _ in range(300):
        mut = bytearray(body)
        for _k in range(int(rng.integers(1, 4))):
            p = int(rng.integers(0, len(mut)))
            mut[p] = int(rng.integers(0, 256))
        try:
            parse_av1c(bytes(mut))
        except MediaFormatError:
            pass
