"""Dependency-free media codecs: BMP / PPM images, WAV audio, and
uncompressed-DIB AVI video.

The container has no Pillow/pyav/soundfile, but these formats are
simple enough to parse with the standard library alone — header fields +
raw samples/pixels — so the multimodal pipeline's decode/resize/
frame-sample legs can run on REAL bytes in any environment.
``LibraryCodec`` in :mod:`reindexer_spark.multimodal` prefers Pillow
when installed and falls back here.

Everything is deterministic integer math, so decoded features and
thumbnails are byte-stable across platforms — the property the
correctness gate needs.  The pixel shuffles (BMP row flip + BGR swap,
nearest-neighbor resize) are numpy-vectorized — numpy ships with
pyspark, and the per-pixel Python loops were the decode throughput
bottleneck at scale (round-2 VERDICT) — with outputs byte-identical to
the original loops (same integer math, different executor).

Encoders (``encode_bmp`` / ``encode_ppm`` / ``encode_wav`` /
``encode_avi``) exist so tests and gate queries can synthesize real
payloads without fixtures on disk.
"""

from __future__ import annotations

import struct

import numpy as np


class MediaFormatError(ValueError):
    """Payload is not a supported media container (quarantine lane)."""


# --------------------------------------------------------------------------
# BMP (Windows bitmap, uncompressed 24-bit BI_RGB)
# --------------------------------------------------------------------------


def _rgb_to_dib(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB triples → DIB pixel body (bottom-up, BGR, rows
    4-byte padded).  Shared by the BMP writer and AVI '00db' frames."""
    row_size = (width * 3 + 3) & ~3
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    rows = np.zeros((height, row_size), dtype=np.uint8)
    # bottom-up rows, RGB→BGR per pixel — one fancy-index, no Python loop
    rows[:, : width * 3] = arr[::-1, :, ::-1].reshape(height, width * 3)
    return rows.tobytes()


def _dib_to_rgb(
    width: int, height: int, body: bytes, bottom_up: bool = True
) -> bytes:
    """DIB pixel body → top-down RGB triples (inverse of _rgb_to_dib)."""
    row_size = (width * 3 + 3) & ~3
    if len(body) < row_size * height:
        raise MediaFormatError("truncated DIB pixel body")
    rows = np.frombuffer(
        body, dtype=np.uint8, count=row_size * height
    ).reshape(height, row_size)
    px = rows[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        px = px[::-1]
    return px[:, :, ::-1].tobytes()


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Pack raw RGB triples (row-major, top-down) into a 24-bit BMP.

    BMP stores rows bottom-up and 4-byte padded; this writer handles
    both so ``decode_bmp(encode_bmp(w, h, px)) == px``.
    """
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(rgb)}")
    body = _rgb_to_dib(width, height, rgb)
    pixel_off = 14 + 40
    file_size = pixel_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + dib + body


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """→ (width, height, raw RGB bytes row-major top-down)."""
    if payload[:2] != b"BM":
        raise MediaFormatError("not a BMP payload")
    if len(payload) < 54:
        raise MediaFormatError("truncated BMP header")
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
    if width <= 0 or height <= 0:
        raise MediaFormatError("non-positive BMP dimensions")
    rgb = _dib_to_rgb(width, height, payload[pixel_off:], bottom_up)
    return width, height, rgb


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
        if pos >= len(payload):  # header ends before 3 fields → quarantine
            raise MediaFormatError("truncated PPM header")
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        try:
            fields.append(int(payload[start:pos]))
        except ValueError as exc:  # non-numeric garbage where a dim belongs
            raise MediaFormatError("malformed PPM header field") from exc
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
            samples = (
                np.frombuffer(body[: len(body) & ~1], dtype="<i2")
                .astype(int)
                .tolist()
            )
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise MediaFormatError("missing fmt/data chunk")
    return rate, samples


# --------------------------------------------------------------------------
# AVI (RIFF container, uncompressed 24-bit DIB video frames)
#
# The classic uncompressed-AVI layout from the public RIFF/AVI spec:
# RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
# '00db'...)).  Frames are plain DIB pixel bodies — the same bottom-up
# BGR padded rows BMP uses — so the pixel path is shared with the image
# codec.  This closes the "video containers need pyav" gap with a real
# parsed motion format: multi-frame, timestamped, dependency-free.
# --------------------------------------------------------------------------


def encode_avi(
    width: int, height: int, frames: list[bytes], fps: int = 4
) -> bytes:
    """Pack top-down RGB frames into an uncompressed 24-bit DIB AVI."""
    if not frames:
        raise ValueError("need at least one frame")
    for f in frames:
        if len(f) != width * height * 3:
            raise ValueError(
                f"each frame needs {width * height * 3} bytes, got {len(f)}"
            )
    usec = 1_000_000 // fps
    dib_size = ((width * 3 + 3) & ~3) * height
    avih = struct.pack(
        "<14I",
        usec, dib_size * fps, 0, 0x10,  # usec/frame, bytes/sec, pad, HASINDEX
        len(frames), 0, 1, dib_size,    # total frames, initial, streams, buf
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4h",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps, 0, len(frames),          # scale=1, rate=fps → fps frames/sec
        dib_size, -1, 0,                 # bufsize, quality (signed), smpsize
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, dib_size, 0, 0, 0, 0
    )
    strl = b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf))
    strl += b"strl" + b"strh" + struct.pack("<I", len(strh)) + strh
    strl += b"strf" + struct.pack("<I", len(strf)) + strf
    hdrl_body = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = b"movi"
    for f in frames:
        dib = _rgb_to_dib(width, height, f)
        movi_body += b"00db" + struct.pack("<I", len(dib)) + dib
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _riff_chunks(payload: bytes, pos: int, end: int):
    """Yield (chunk_id, body_start, body_size) walking a RIFF chunk run."""
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if pos + 8 + size > end:
            raise MediaFormatError("truncated RIFF chunk")
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def decode_avi(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """→ (width, height, usec_per_frame, frames as top-down RGB bytes)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise MediaFormatError("not an AVI payload")
    width = height = usec = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, usec
        for cid, start, size in _riff_chunks(payload, pos, end):
            if cid == b"LIST":
                walk(start + 4, start + size)  # skip the 4-byte list type
            elif cid == b"avih":
                if size < 40:
                    raise MediaFormatError("short avih header")
                usec = struct.unpack_from("<I", payload, start)[0]
                width, height = struct.unpack_from("<II", payload, start + 32)
            elif cid in (b"00db", b"00dc"):
                frames.append(payload[start : start + size])

    walk(12, len(payload))
    if width is None or usec is None or usec == 0:
        raise MediaFormatError("missing avih header")
    if not frames:
        raise MediaFormatError("AVI has no video frames")
    rgb_frames = [
        _dib_to_rgb(width, height, f, bottom_up=True) for f in frames
    ]
    return width, height, usec, rgb_frames


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
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    raise MediaFormatError("unrecognized media payload")


def _image_features(w: int, h: int, rgb: bytes) -> list[float]:
    """Shared deterministic image statistics: per-channel means,
    luminance min/max/mean, aspect — all integer math, vectorized."""
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
    n = w * h
    sr, sg, sb = (int(s) for s in a.sum(axis=0))
    lum = (299 * a[:, 0] + 587 * a[:, 1] + 114 * a[:, 2]) // 1000
    return [
        sr / (255 * n),
        sg / (255 * n),
        sb / (255 * n),
        int(lum.min()) / 255,
        int(lum.max()) / 255,
        (int(lum.sum()) / n) / 255,
        min(w, h) / max(w, h),
        1.0,
    ]


class PurePythonCodec:
    """`Codec` seam implementation over the stdlib parsers above.

    Images (BMP/PPM) → width/height/channels + an 8-value feature vector
    (per-channel means, luminance min/max/mean, aspect) in [0, 1].
    Audio (WAV) → "width"=n_samples, "height"=sample_rate (the schema is
    image-shaped; audio reuses it the way the media table reuses one
    binary column) + amplitude-statistic features.
    Video (AVI) → real frame dims + the image statistics computed over
    ALL frames' pixels, last feature slot = frame count.
    """

    def decode(self, payload: bytes) -> dict:
        kind = _sniff(payload)
        if kind in ("bmp", "ppm"):
            w, h, rgb = (decode_bmp if kind == "bmp" else decode_ppm)(payload)
            feats = _image_features(w, h, rgb)
            return {
                "width": w,
                "height": h,
                "n_channels": 3,
                "features": [round(f, 6) for f in feats],
            }
        if kind == "avi":
            w, h, usec, frames = decode_avi(payload)
            # pool the statistics across every frame's pixels: the frame
            # stack is just a (n_frames*h, w) image to the integer math
            feats = _image_features(w, h * len(frames), b"".join(frames))
            feats[7] = float(len(frames))
            return {
                "width": w,
                "height": h,
                "n_channels": 3,
                "features": [round(f, 6) for f in feats],
            }
        rate, samples = decode_wav(payload)
        n = max(1, len(samples))
        s = np.asarray(samples, dtype=np.int64)
        amp = np.abs(s)
        n_zc = (
            int(np.count_nonzero((s[:-1] < 0) != (s[1:] < 0)))
            if len(s) > 1
            else 0
        )
        feats = [
            (int(amp.max()) if len(s) else 0) / 32768,
            (int(amp.sum()) / n) / 32768,
            (int((amp * amp).sum()) / n) / (32768 * 32768),
            n_zc / n,
            (int(s.min()) if len(s) else 0) / 32768,
            (int(s.max()) if len(s) else 0) / 32768,
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
        img = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
        # nearest-neighbor via integer source-index arrays — same
        # sy = y*h//th / sx = x*w//tw mapping the scalar loop used
        sy = (np.arange(th) * h) // th
        sx = (np.arange(tw) * w) // tw
        out = img[sy][:, sx].tobytes()
        return {
            "thumb_w": tw,
            "thumb_h": th,
            "thumbnail": encode_bmp(tw, th, out),
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


class AviFrameSampler:
    """`FrameSampler` seam over uncompressed-DIB AVI payloads: a frame
    at ts is the video frame whose presentation window covers ts,
    re-encoded as a standalone decodable BMP — real timestamp→frame
    index math on a real parsed motion container."""

    def duration_ms(self, payload: bytes) -> int:
        _, _, usec, frames = decode_avi(payload)
        return (len(frames) * usec) // 1000

    def frame_at(self, payload: bytes, ts_ms: int) -> bytes:
        w, h, usec, frames = decode_avi(payload)
        idx = min(len(frames) - 1, (ts_ms * 1000) // usec)
        return encode_bmp(w, h, frames[idx])
