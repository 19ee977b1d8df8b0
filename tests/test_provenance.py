"""The shared provenance-marker contract (reindexer_spark/provenance.py)
— one place that proves forgery rejection for every digest-gated codec
(VP8 lossy WebP PRVN chunk, CABAC SEI; round-12 VERDICT next #6)."""

import pytest

from reindexer_spark.provenance import (
    MARKER_LEN,
    payload_digest,
    provenance_marker,
    verify_provenance,
)

UUID_A = bytes(range(16))
UUID_B = bytes(range(16, 32))


def test_marker_roundtrip_and_shape():
    m = provenance_marker(UUID_A, b"dom", b"payload")
    assert len(m) == MARKER_LEN
    assert m[:16] == UUID_A
    assert m[16:] == payload_digest(b"dom", b"payload")
    assert verify_provenance(m, UUID_A, b"dom", b"payload")


def test_forgeries_rejected():
    m = provenance_marker(UUID_A, b"dom", b"payload")
    # missing / truncated
    assert not verify_provenance(None, UUID_A, b"dom", b"payload")
    assert not verify_provenance(m[:31], UUID_A, b"dom", b"payload")
    # foreign scheme uuid
    assert not verify_provenance(m, UUID_B, b"dom", b"payload")
    # marker copied onto a DIFFERENT payload (the spoofing hole the
    # digest closes)
    assert not verify_provenance(m, UUID_A, b"dom", b"payload2")
    # cross-domain replay (same payload, different gated codec family)
    assert not verify_provenance(m, UUID_A, b"dom2", b"payload")
    # single-bit flip anywhere in the digest half
    flipped = m[:16] + bytes([m[16] ^ 1]) + m[17:]
    assert not verify_provenance(flipped, UUID_A, b"dom", b"payload")


def test_bad_uuid_length_raises():
    with pytest.raises(ValueError):
        provenance_marker(b"short", b"d", b"p")


def test_vp8_gate_goes_through_shared_path():
    """encode_webp_lossy's PRVN chunk is a shared-format marker; a
    copied marker on a different VP8 payload quarantines."""
    import hashlib
    import struct

    from reindexer_spark.codecs import MediaFormatError
    from reindexer_spark.vp8 import (
        VP8_MARKER_UUID,
        decode_webp_lossy,
        encode_webp_lossy,
        vp8_payload_digest,
    )

    def px(n, tag):
        out = bytearray()
        i = 0
        while len(out) < n:
            out += hashlib.sha256(tag + str(i).encode()).digest()
            i += 1
        return bytes(out[:n])

    w, h = 32, 32
    webp, recon = encode_webp_lossy(w, h, px(w * h * 3, b"a"), 32)
    dw, dh, rgb = decode_webp_lossy(webp)
    assert (dw, dh, rgb) == (w, h, recon)
    # digest helper == marker body (shared format)
    prvn_pos = webp.index(b"PRVN")
    body = webp[prvn_pos + 8 : prvn_pos + 8 + 32]
    vp8_pos = webp.index(b"VP8 ")
    size = struct.unpack_from("<I", webp, vp8_pos + 4)[0]
    payload = webp[vp8_pos + 8 : vp8_pos + 8 + size]
    assert body == VP8_MARKER_UUID + vp8_payload_digest(payload)
    # splice this marker in front of a DIFFERENT encoded payload
    other, _ = encode_webp_lossy(w, h, px(w * h * 3, b"b"), 32)
    o_vp8 = other.index(b"VP8 ")
    forged = (
        other[:12]
        + webp[prvn_pos : prvn_pos + 8 + 32]
        + other[o_vp8:]
    )
    forged = forged[:4] + struct.pack("<I", len(forged) - 8) + forged[8:]
    with pytest.raises(MediaFormatError):
        decode_webp_lossy(forged)


def test_cabac_gate_goes_through_shared_path():
    """cabac_provenance_ok accepts only a marker whose digest matches
    the EXACT slice NALs; the same marker over other slices fails."""
    from reindexer_spark.h264_cabac import (
        cabac_marker_sei,
        cabac_provenance_ok,
    )

    slices_a = [b"\x65" + bytes(range(40)), b"\x41" + bytes(range(7))]
    slices_b = [b"\x65" + bytes(range(41))]
    sei = cabac_marker_sei(slices_a)
    assert cabac_provenance_ok([sei], slices_a)
    assert not cabac_provenance_ok([sei], slices_b)
    assert not cabac_provenance_ok([], slices_a)
    # shifting bytes across a NAL boundary must break the digest
    shifted = [slices_a[0] + slices_a[1][:1], slices_a[1][1:]]
    assert not cabac_provenance_ok([sei], shifted)
