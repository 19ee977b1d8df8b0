"""Dependency-free media codecs: BMP / PPM images and WAV audio.

The container has no Pillow/pyav/soundfile, but these three formats are
simple enough to parse with the standard library alone — header fields +
raw samples — so the multimodal pipeline's decode/resize/frame-sample
legs can run on REAL bytes in any environment.  ``LibraryCodec`` in
:mod:`reindexer_spark.multimodal` prefers Pillow when installed and
falls back here.

Everything is deterministic integer math (no float image libs), so
decoded features and thumbnails are byte-stable across platforms —
the property the correctness gate needs.

Encoders (``encode_bmp`` / ``encode_ppm`` / ``encode_wav``) exist so
tests and gate queries can synthesize real payloads without fixtures on
disk.
"""

from __future__ import annotations

import struct


class MediaFormatError(ValueError):
    """Payload is not a supported media container (quarantine lane)."""


# --------------------------------------------------------------------------
# BMP (Windows bitmap, uncompressed 24-bit BI_RGB)
# --------------------------------------------------------------------------


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Pack raw RGB triples (row-major, top-down) into a 24-bit BMP.

    BMP stores rows bottom-up and 4-byte padded; this writer handles
    both so ``decode_bmp(encode_bmp(w, h, px)) == px``.
    """
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(rgb)}")
    row_size = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_size - width * 3)
    # bottom-up rows, RGB→BGR per pixel
    body = bytearray()
    for y in range(height - 1, -1, -1):
        row = rgb[y * width * 3 : (y + 1) * width * 3]
        for x in range(width):
            r, g, b = row[x * 3 : x * 3 + 3]
            body += bytes((b, g, r))
        body += pad
    pixel_off = 14 + 40
    file_size = pixel_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + dib + bytes(body)


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """→ (width, height, raw RGB bytes row-major top-down)."""
    if payload[:2] != b"BM":
        raise MediaFormatError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise MediaFormatError(f"unsupported BMP header size {dib_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise MediaFormatError(f"only 24-bit BI_RGB supported (bpp={bpp})")
    bottom_up = height > 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    out = bytearray(width * height * 3)
    for y in range(height):
        src_row = (height - 1 - y) if bottom_up else y
        base = pixel_off + src_row * row_size
        for x in range(width):
            b, g, r = payload[base + x * 3 : base + x * 3 + 3]
            i = (y * width + x) * 3
            out[i : i + 3] = bytes((r, g, b))
    return width, height, bytes(out)


# --------------------------------------------------------------------------
# PPM (P6 binary, maxval 255)
# --------------------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(rgb)}")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    if payload[:2] != b"P6":
        raise MediaFormatError("not a binary PPM payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise MediaFormatError(f"only maxval 255 supported, got {maxval}")
    need = width * height * 3
    body = payload[pos : pos + need]
    if len(body) != need:
        raise MediaFormatError("truncated PPM body")
    return width, height, body


# --------------------------------------------------------------------------
# WAV (RIFF, PCM 16-bit)
# --------------------------------------------------------------------------


def encode_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Mono 16-bit PCM WAV from integer samples (clamped to int16)."""
    import array

    clamped = array.array(
        "h", (max(-32768, min(32767, s)) for s in samples)
    )
    if __import__("sys").byteorder == "big":  # WAV is little-endian
        clamped.byteswap()
    body = clamped.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """→ (sample_rate, samples) for mono 16-bit PCM."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise MediaFormatError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise MediaFormatError(
                    f"only mono 16-bit PCM supported (fmt={audio_fmt}, "
                    f"ch={channels}, bits={bits})"
                )
        elif cid == b"data":
            samples = list(
                struct.unpack(f"<{len(body) // 2}h", body[: len(body) & ~1])
            )
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise MediaFormatError("missing fmt/data chunk")
    return rate, samples


# --------------------------------------------------------------------------
# Codec implementations matching the multimodal pipeline seams
# --------------------------------------------------------------------------


def _sniff(payload: bytes) -> str:
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    raise MediaFormatError("unrecognized media payload")


class PurePythonCodec:
    """`Codec` seam implementation over the stdlib parsers above.

    Images (BMP/PPM) → width/height/channels + an 8-value feature vector
    (per-channel means, luminance min/max/mean, aspect) in [0, 1].
    Audio (WAV) → "width"=n_samples, "height"=sample_rate (the schema is
    image-shaped; audio reuses it the way the media table reuses one
    binary column) + amplitude-statistic features.
    """

    def decode(self, payload: bytes) -> dict:
        kind = _sniff(payload)
        if kind in ("bmp", "ppm"):
            w, h, rgb = (decode_bmp if kind == "bmp" else decode_ppm)(payload)
            n = w * h
            sr = sum(rgb[0::3])
            sg = sum(rgb[1::3])
            sb = sum(rgb[2::3])
            lum = [
                (299 * rgb[i] + 587 * rgb[i + 1] + 114 * rgb[i + 2]) // 1000
                for i in range(0, len(rgb), 3)
            ]
            feats = [
                sr / (255 * n),
                sg / (255 * n),
                sb / (255 * n),
                min(lum) / 255,
                max(lum) / 255,
                (sum(lum) / n) / 255,
                min(w, h) / max(w, h),
                1.0,
            ]
            return {
                "width": w,
                "height": h,
                "n_channels": 3,
                "features": [round(f, 6) for f in feats],
            }
        rate, samples = decode_wav(payload)
        n = max(1, len(samples))
        amp = [abs(s) for s in samples]
        feats = [
            max(amp, default=0) / 32768,
            (sum(amp) / n) / 32768,
            (sum(a * a for a in amp) / n) / (32768 * 32768),
            sum(1 for i in range(1, len(samples))
                if (samples[i - 1] < 0) != (samples[i] < 0)) / n,
            min(samples, default=0) / 32768,
            max(samples, default=0) / 32768,
            rate / 48000,
            0.0,
        ]
        return {
            "width": len(samples),
            "height": rate,
            "n_channels": 1,
            "features": [round(f, 6) for f in feats],
        }


class PurePythonResizer:
    """Nearest-neighbor downscale for BMP/PPM; thumbnails re-encode as
    BMP so the output is itself a decodable payload."""

    def resize(self, payload: bytes, max_dim: int) -> dict:
        kind = _sniff(payload)
        if kind not in ("bmp", "ppm"):
            raise MediaFormatError(f"cannot resize non-image payload ({kind})")
        w, h, rgb = (decode_bmp if kind == "bmp" else decode_ppm)(payload)
        scale = min(1.0, max_dim / max(w, h))
        tw, th = max(1, int(w * scale)), max(1, int(h * scale))
        out = bytearray(tw * th * 3)
        for y in range(th):
            sy = y * h // th
            for x in range(tw):
                sx = x * w // tw
                si = (sy * w + sx) * 3
                di = (y * tw + x) * 3
                out[di : di + 3] = rgb[si : si + 3]
        return {
            "thumb_w": tw,
            "thumb_h": th,
            "thumbnail": encode_bmp(tw, th, bytes(out)),
        }


class WavFrameSampler:
    """`FrameSampler` seam over WAV payloads: a "frame" at ts is the
    100 ms window of samples starting there, re-encoded as WAV — real
    timestamp math on real audio, the same contract video sampling has."""

    window_ms = 100

    def duration_ms(self, payload: bytes) -> int:
        rate, samples = decode_wav(payload)
        return (len(samples) * 1000) // rate

    def frame_at(self, payload: bytes, ts_ms: int) -> bytes:
        rate, samples = decode_wav(payload)
        start = (ts_ms * rate) // 1000
        end = start + (self.window_ms * rate) // 1000
        return encode_wav(samples[start:end], rate)
