"""Ogg Opus/Vorbis header-only probe — round 13 (RFC 3533 pages,
RFC 7845 OpusHead, Vorbis I identification header).  Probe-only:
no audio entropy decoder is claimed."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from reindexer_spark.codecs import (
    MediaFormatError,
    _ogg_crc,
    probe_media,
    write_ogg_opus,
    write_ogg_vorbis,
)


@pytest.mark.parametrize("ch,rate,n", [
    (1, 8000, 4800), (2, 48000, 96000), (2, 16000, 123457),
])
def test_opus_probe_roundtrip(ch, rate, n):
    m = probe_media(write_ogg_opus(ch, rate, n))
    assert m["kind"] == "ogg" and m["codec"] == "opus"
    assert (m["channels"], m["sample_rate"], m["n_samples"]) == (
        ch, rate, n
    )
    # image/video fields stay None for audio
    assert m["width"] is None and m["profile"] is None


@pytest.mark.parametrize("ch,rate,n", [
    (1, 44100, 44100), (2, 22050, 99991),
])
def test_vorbis_probe_roundtrip(ch, rate, n):
    m = probe_media(write_ogg_vorbis(ch, rate, n))
    assert m["codec"] == "vorbis"
    assert (m["channels"], m["sample_rate"], m["n_samples"]) == (
        ch, rate, n
    )


def test_opus_pre_skip_subtracted():
    """The final granule position includes the pre-skip; the probe's
    n_samples must not (RFC 7845 §4.2)."""
    p = write_ogg_opus(2, 48000, 1000, pre_skip=500)
    assert probe_media(p)["n_samples"] == 1000


def test_crc_mismatch_quarantines():
    p = bytearray(write_ogg_opus(1, 48000, 4800))
    p[30] ^= 0xFF  # corrupt the first page's body region
    with pytest.raises(MediaFormatError, match="CRC"):
        probe_media(bytes(p))


def test_ogg_crc_known_vector():
    """RFC 3533 CRC on a trivial vector, pinned against a direct
    bit-by-bit computation."""
    data = b"OggS\x00\x02" + bytes(20)

    def bitwise(buf):
        crc = 0
        for byte in buf:
            for k in range(7, -1, -1):
                bit = (byte >> k) & 1
                top = (crc >> 31) & 1
                crc = ((crc << 1) & 0xFFFFFFFF)
                if top ^ bit:
                    crc ^= 0x04C11DB7
        return crc

    assert _ogg_crc(data) == bitwise(data)


def test_unknown_first_packet_quarantines():
    from reindexer_spark.codecs import _ogg_page

    page = _ogg_page(9, 0, 0, [b"FLACHEAD"], bos=True)
    with pytest.raises(MediaFormatError, match="codec header"):
        probe_media(page)


def test_page_desync_quarantines():
    p = bytearray(write_ogg_opus(1, 48000, 4800))
    # find the second page and break its capture pattern
    second = p.index(b"OggS", 4)
    p[second] = 0x58
    with pytest.raises(MediaFormatError, match="desync"):
        probe_media(bytes(p))


def test_ogg_fuzz_quarantines():
    """Mutated streams probe or quarantine, never crash."""
    rng = np.random.default_rng(23)
    base = write_ogg_opus(2, 48000, 96000)
    for _ in range(300):
        mut = bytearray(base)
        for _k in range(int(rng.integers(1, 5))):
            pos = int(rng.integers(0, len(mut)))
            mut[pos] = int(rng.integers(0, 256))
        try:
            probe_media(bytes(mut))
        except MediaFormatError:
            pass


def test_truncations_quarantine():
    base = write_ogg_opus(2, 48000, 96000)
    for cut in (5, 20, 27, 40, len(base) - 3):
        try:
            m = probe_media(base[:cut])
            # a clean-page prefix may legitimately probe (fewer pages
            # seen); the identification fields must still be right
            assert m["codec"] == "opus"
        except MediaFormatError:
            pass
