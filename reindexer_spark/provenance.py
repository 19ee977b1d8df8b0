"""Digest-bound provenance markers for unverifiable-fidelity decoders.

Some decoders in this package use HOUSE constant tables where the
public spec's values cannot be verified from the spec text alone (VP8
token/quantizer tables, CABAC context init).  Their decode paths are
therefore gated: external streams quarantine, and only payloads that
carry a provenance marker PROVING they were produced by this package's
own encoder (whose tables match by construction) are decoded — never a
wrong pixel.

A marker is ``scheme_uuid(16 bytes) + digest(16 bytes)`` where the
digest is ``sha256(domain || payload)[:16]`` over the EXACT coded
payload.  Binding the digest to the payload is what makes the gate
anti-spoofing: copying a marker from one stream onto another fails
verification (a fixed UUID alone was bypassable — round-12 review).
Container remux keeps markers valid because the coded payload bytes
are untouched.

Current carriers (both verify through this module):
- VP8 lossy WebP: a ``PRVN`` RIFF chunk ahead of the ``VP8 `` chunk,
  domain ``b"vp8-prvn"``, payload = the VP8 chunk body
  (reindexer_spark/vp8.py).
- CABAC H.264: a user_data_unregistered SEI NAL, empty domain,
  payload = the length-prefixed concatenation of the coded-slice NALs
  (reindexer_spark/h264_cabac.py).
The next gated codec (HEVC, AV1) inherits the contract by picking a
fresh UUID + domain and calling the same two functions.
"""

from __future__ import annotations

import hashlib

#: scheme uuid (16) + payload digest (16)
MARKER_LEN = 32


def payload_digest(domain: bytes, payload: bytes) -> bytes:
    """16-byte truncated sha256 over ``domain || payload``."""
    return hashlib.sha256(domain + payload).digest()[:16]


def provenance_marker(uuid: bytes, domain: bytes, payload: bytes) -> bytes:
    """The 32-byte marker binding ``payload`` under ``uuid``/``domain``."""
    if len(uuid) != 16:
        raise ValueError("provenance scheme uuid must be 16 bytes")
    return uuid + payload_digest(domain, payload)


def verify_provenance(
    marker: bytes | None, uuid: bytes, domain: bytes, payload: bytes
) -> bool:
    """True iff ``marker`` is a well-formed marker for ``uuid`` whose
    digest matches the EXACT ``payload`` — False for a missing,
    truncated, foreign-scheme, or copied-from-another-payload marker."""
    return (
        marker is not None
        and len(marker) >= MARKER_LEN
        and marker[:16] == uuid
        and marker[16:MARKER_LEN] == payload_digest(domain, payload)
    )
