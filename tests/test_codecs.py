"""Dependency-free codec layer: BMP/PPM/WAV round-trips, real decode
features, resize geometry, and WAV frame sampling — all without Pillow
or pyav installed."""

from __future__ import annotations

import pytest

from reindexer_spark.codecs import (
    MediaFormatError,
    PurePythonCodec,
    PurePythonResizer,
    WavFrameSampler,
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
)


def checkerboard(w: int, h: int) -> bytes:
    px = bytearray()
    for y in range(h):
        for x in range(w):
            on = (x + y) % 2 == 0
            px += bytes((255, 0, 128) if on else (0, 255, 32))
    return bytes(px)


def test_bmp_roundtrip_including_row_padding():
    # width 3 → row stride 9 → padded to 12: exercises the padding path
    for w, h in [(3, 2), (4, 4), (7, 5), (1, 1)]:
        rgb = checkerboard(w, h)
        assert decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb)


def test_ppm_roundtrip_and_comment_header():
    rgb = checkerboard(5, 3)
    assert decode_ppm(encode_ppm(5, 3, rgb)) == (5, 3, rgb)
    with_comment = b"P6\n# a comment\n5 3\n255\n" + rgb
    assert decode_ppm(with_comment) == (5, 3, rgb)


def test_wav_roundtrip_and_clamping():
    samples = [0, 100, -100, 32767, -32768, 12345]
    rate, out = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000
    assert out == samples
    # out-of-range input samples clamp instead of overflowing
    _, clamped = decode_wav(encode_wav([99999, -99999], 8000))
    assert clamped == [32767, -32768]


def test_codec_rejects_garbage():
    with pytest.raises(MediaFormatError):
        PurePythonCodec().decode(b"not a media payload at all")


def test_decode_features_are_real_pixel_math():
    # solid red 4x4: mean_r = 1, mean_g = mean_b = 0, luminance = 76/255
    rgb = bytes((255, 0, 0)) * 16
    d = PurePythonCodec().decode(encode_bmp(4, 4, rgb))
    assert (d["width"], d["height"], d["n_channels"]) == (4, 4, 3)
    mr, mg, mb, lmin, lmax, lmean, aspect, _ = d["features"]
    assert mr == 1.0 and mg == 0.0 and mb == 0.0
    assert lmin == lmax == lmean == pytest.approx(76 / 255, abs=1e-6)
    assert aspect == 1.0


def test_decode_wav_features():
    silence = PurePythonCodec().decode(encode_wav([0] * 1000, 8000))
    assert silence["width"] == 1000 and silence["height"] == 8000
    assert silence["features"][0] == 0.0  # peak amplitude
    loud = PurePythonCodec().decode(encode_wav([32767, -32768] * 500, 8000))
    assert loud["features"][0] == pytest.approx(1.0, abs=1e-4)
    assert loud["features"][3] > 0.9  # zero-crossing rate of a square wave


def test_resizer_geometry_and_decodable_output():
    rgb = checkerboard(16, 8)
    r = PurePythonResizer().resize(encode_bmp(16, 8, rgb), max_dim=4)
    assert (r["thumb_w"], r["thumb_h"]) == (4, 2)  # aspect preserved
    tw, th, tpx = decode_bmp(r["thumbnail"])  # thumbnail is a real BMP
    assert (tw, th) == (4, 2) and len(tpx) == 4 * 2 * 3
    # no upscale beyond source
    r2 = PurePythonResizer().resize(encode_bmp(2, 2, checkerboard(2, 2)), 64)
    assert (r2["thumb_w"], r2["thumb_h"]) == (2, 2)


def test_wav_frame_sampler_window_math():
    samples = list(range(-4000, 4000))  # 1 s at 8 kHz
    payload = encode_wav(samples, 8000)
    s = WavFrameSampler()
    assert s.duration_ms(payload) == 1000
    rate, window = decode_wav(s.frame_at(payload, 500))
    assert rate == 8000
    assert window == samples[4000 : 4000 + 800]  # 100 ms window at t=500ms


def test_library_seams_fall_back_without_pil(spark):
    from reindexer_spark.multimodal import LibraryCodec, LibraryFrameSampler

    d = LibraryCodec().decode(encode_bmp(4, 4, checkerboard(4, 4)))
    assert d["width"] == 4 and len(d["features"]) == 8
    with pytest.raises(MediaFormatError):
        LibraryFrameSampler().duration_ms(b"\x00\x00\x01\xba fake mpeg")
