"""MP3 / ADTS-AAC header-only probes — round 13 (ISO 11172-3 /
13818-3 Layer III frame headers; ISO 13818-7 §6.2 ADTS).  Probe-only:
no subband/MDCT decoder is claimed."""

from __future__ import annotations

import numpy as np
import pytest

from reindexer_spark.codecs import (
    MediaFormatError,
    probe_media,
    write_adts_aac,
    write_mp3,
)


@pytest.mark.parametrize("ch,rate,n,spf", [
    (2, 44100, 38, 1152),   # MPEG-1
    (1, 48000, 7, 1152),
    (2, 22050, 10, 576),    # MPEG-2 → half samples per frame
    (1, 16000, 5, 576),
])
def test_mp3_probe(ch, rate, n, spf):
    m = probe_media(write_mp3(ch, rate, n))
    assert m["kind"] == "mp3" and m["codec"] == "mp3"
    assert (m["channels"], m["sample_rate"]) == (ch, rate)
    assert (m["n_frames"], m["n_samples"]) == (n, n * spf)


def test_mp3_id3v2_tag_skipped():
    body = write_mp3(2, 44100, 6)
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + bytes(20)
    m = probe_media(tag + body)
    assert m["codec"] == "mp3" and m["n_frames"] == 6


@pytest.mark.parametrize("ch,rate,n", [
    (2, 48000, 21), (1, 44100, 3), (2, 16000, 40),
])
def test_aac_probe(ch, rate, n):
    m = probe_media(write_adts_aac(ch, rate, n))
    assert m["kind"] == "aac" and m["codec"] == "aac"
    assert (m["channels"], m["sample_rate"]) == (ch, rate)
    assert (m["n_frames"], m["n_samples"]) == (n, n * 1024)


def test_mp3_free_format_quarantines():
    p = bytearray(write_mp3(2, 44100, 3))
    p[2] &= 0x0F  # bitrate index 0 = free format
    with pytest.raises(MediaFormatError, match="free-format"):
        probe_media(bytes(p))


def test_mp3_rate_change_quarantines():
    a = write_mp3(2, 44100, 2)
    b = write_mp3(2, 48000, 2)
    with pytest.raises(MediaFormatError, match="changes rate"):
        probe_media(a + b)


def test_aac_pce_channels_quarantine():
    p = bytearray(write_adts_aac(1, 48000, 2))
    p[2] &= 0xFE  # channel config high bit → 0
    p[3] &= 0x3F  # low bits → 0 (PCE-configured)
    with pytest.raises(MediaFormatError, match="PCE"):
        probe_media(bytes(p))


def test_sniff_does_not_confuse_jpeg():
    """JPEG starts 0xFFD8 — the MPEG-audio syncs must not claim it."""
    from reindexer_spark.codecs import _sniff

    assert _sniff(b"\xff\xd8\xff\xe0" + bytes(16)) == "jpeg"


def test_mpeg_audio_fuzz_quarantines():
    rng = np.random.default_rng(31)
    for base in (write_mp3(2, 44100, 12), write_adts_aac(2, 48000, 12)):
        for _ in range(200):
            mut = bytearray(base)
            for _k in range(int(rng.integers(1, 5))):
                pos = int(rng.integers(0, len(mut)))
                mut[pos] = int(rng.integers(0, 256))
            try:
                probe_media(bytes(mut))
            except MediaFormatError:
                pass


# ---------------------------------------------------------------------------
# Frame index (round 15): offsets, duration, bit-reservoir seek points
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ch", [1, 2])
@pytest.mark.parametrize("rate,spf", [(44100, 1152), (22050, 576),
                                      (16000, 576)])
def test_mp3_index_offsets_duration_and_seek_points(ch, rate, spf):
    from reindexer_spark.codecs import mp3_frame_index

    p = write_mp3(ch, rate, 9, mdb_period=3)
    ix = mp3_frame_index(p)
    assert ix["n_frames"] == 9
    assert ix["samples_per_frame"] == spf
    assert ix["duration_ms"] == 9 * spf * 1000 // rate
    # offsets tile the payload exactly
    pos = ix["data_start"]
    for off, ln, _m in ix["frames"]:
        assert off == pos
        pos += ln
    assert pos == len(p)
    # reservoir pattern: main_data_begin 0 every 3rd frame only
    assert ix["seek_points"] == [0, 3, 6]
    for i, (_o, _l, mdb) in enumerate(ix["frames"]):
        assert (mdb == 0) == (i % 3 == 0)


def test_mp3_index_parses_sideinfo_fields():
    from reindexer_spark.codecs import (
        _mp3_sideinfo_bits,
        _parse_mp3_sideinfo,
    )

    # hand-built MPEG-1 stereo side info: mdb=257 needs 9 bits
    si_len, bits = _mp3_sideinfo_bits(3, 2)
    assert (si_len, bits) == (32, 9)
    si = bytearray(32)
    si[0] = 257 >> 1
    si[1] = (257 & 1) << 7
    out = _parse_mp3_sideinfo(bytes(si), 3, 2)
    assert out["main_data_begin"] == 257
    assert len(out["granules"]) == 4  # 2 granules x 2 channels
    # LSF mono: one granule, 8-bit mdb
    si_len, bits = _mp3_sideinfo_bits(2, 1)
    assert (si_len, bits) == (9, 8)
    si = bytearray(9)
    si[0] = 77
    out = _parse_mp3_sideinfo(bytes(si), 2, 1)
    assert out["main_data_begin"] == 77
    assert len(out["granules"]) == 1


def test_mp3_index_skips_id3v2():
    from reindexer_spark.codecs import mp3_frame_index

    body = write_mp3(2, 44100, 4, mdb_period=2)
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 30]) + bytes(30)
    ix = mp3_frame_index(tag + body)
    assert ix["data_start"] == 40
    assert ix["n_frames"] == 4 and ix["seek_points"] == [0, 2]


def test_adts_index_every_frame_is_a_seek_point():
    from reindexer_spark.codecs import adts_frame_index

    p = write_adts_aac(2, 48000, 7, 40)
    ix = adts_frame_index(p)
    assert ix["n_frames"] == 7
    assert ix["seek_points"] == list(range(7))
    assert ix["duration_ms"] == 7 * 1024 * 1000 // 48000
    assert sum(f[1] for f in ix["frames"]) == len(p)


def test_index_truncation_and_fuzz_quarantine():
    from reindexer_spark.codecs import audio_frame_index

    rng = np.random.default_rng(15)
    for base in (write_mp3(2, 44100, 8, mdb_period=2),
                 write_adts_aac(1, 44100, 8)):
        with pytest.raises(MediaFormatError):
            audio_frame_index(base[:-3])
        for _ in range(150):
            mut = bytearray(base)
            for _k in range(int(rng.integers(1, 5))):
                mut[int(rng.integers(0, len(mut)))] = int(
                    rng.integers(0, 256)
                )
            try:
                audio_frame_index(bytes(mut))
            except MediaFormatError:
                pass


def test_mp3_trailing_id3v1_tag_tolerated():
    """Real crawled MP3s end with a 128-byte ID3v1 'TAG' block — the
    probe and the index must stop there, not desync; a mid-stream
    'TAG' of the wrong size still quarantines."""
    from reindexer_spark.codecs import mp3_frame_index

    body = write_mp3(2, 44100, 5, mdb_period=2)
    p = body + b"TAG" + bytes(125)
    assert probe_media(p)["n_frames"] == 5
    ix = mp3_frame_index(p)
    assert ix["n_frames"] == 5 and ix["id3v1"]
    with pytest.raises(MediaFormatError):
        mp3_frame_index(body + b"TAG" + bytes(6))


def test_mp3_xing_header_parse_and_absence():
    from reindexer_spark.codecs import mp3_frame_index

    p = write_mp3(2, 44100, 9, 128, mdb_period=3, xing=True)
    ix = mp3_frame_index(p)
    x = ix["xing"]
    assert x["tag"] == "Xing" and not x["has_toc"]
    assert x["frames"] == ix["n_frames"] - 1
    assert x["bytes"] == len(p)
    assert mp3_frame_index(write_mp3(2, 44100, 4))["xing"] is None
    # truncated Xing quarantines
    i = p.index(b"Xing")
    with pytest.raises(MediaFormatError):
        from reindexer_spark.codecs import _parse_xing

        _parse_xing(p[i : i + 6])
