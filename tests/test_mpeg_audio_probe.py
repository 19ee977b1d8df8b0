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
