"""Property-based round-trips for the lossless codecs: Hypothesis
generates arbitrary (bounded) inputs, and encode→decode must be the
identity.  The example-based suites pin known layouts; these sweep the
input space for the state machines with the most edge cases — FLAC's
Rice/fixed-predictor coding, GIF's LZW, PNG's filters, and the mp4
sample tables."""

from __future__ import annotations

import pytest

# Pure-Python codec suite: deselected by the default pytest run
# (pytest.ini addopts -m "not codec"); run with `-m codec`.
pytestmark = pytest.mark.codec

from hypothesis import given, settings
from hypothesis import strategies as st

from reindexer_spark.codecs import (
    decode_flac,
    decode_gif,
    decode_mp4,
    decode_png,
    encode_flac,
    encode_gif,
    encode_mp4,
    encode_png,
)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=2000,
    ),
    st.sampled_from([64, 256, 4096]),
)
def test_flac_roundtrip_any_pcm(samples, block):
    """Any 16-bit PCM stream survives FLAC bit-exactly at any block
    size — including pathological inputs (constants, alternating
    extremes, single samples) that stress every fixed-predictor order
    and Rice parameter."""
    rate, out = decode_flac(encode_flac(samples, 8000, block_size=block))
    assert (rate, out) == (8000, samples)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=0, max_value=15),
    st.booleans(),
    st.randoms(use_true_random=False),
)
def test_gif_roundtrip_any_paletted_frames(w, h, n_frames, n_extra, interlace, rnd):
    """Any frame stack over a small palette round-trips losslessly,
    interlaced or not, single- or multi-frame."""
    palette = [
        bytes((c * 17 % 256, c * 29 % 256, c * 41 % 256))
        for c in range(1 + n_extra)
    ]
    frames = [
        b"".join(
            palette[rnd.randrange(len(palette))] for _ in range(w * h)
        )
        for _ in range(n_frames)
    ]
    gif = encode_gif(w, h, frames, delays_ms=120, interlace=interlace)
    w2, h2, _delays, out = decode_gif(gif)
    assert (w2, h2, out) == (w, h, frames)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=5),
    st.randoms(use_true_random=False),
)
def test_png_roundtrip_any_rgb(w, h, levels, _seed, rnd):
    """Any RGB image round-trips through PNG exactly (zlib is
    lossless; the filter chooser must reconstruct whatever it picked)."""
    rgb = bytes(rnd.randrange(0, 256) for _ in range(w * h * 3))
    w2, h2, out = decode_png(encode_png(w, h, rgb))
    assert (w2, h2, out) == (w, h, rgb)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=7),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=1, max_value=4),
)
def test_mp4_tables_cover_any_layout(n_frames, spc, sync_every, fps_pow):
    """The stsc/stco/stts/stss walk reconstructs every frame for any
    chunking × keyframe spacing × rate combination (frames are lossy
    JPEG, so the assertion is structural: count, durations, sync)."""
    w, h = 16, 8
    frames = [
        bytes(((x * 37 + y * 11 + k * 53) % 256 for y in range(h) for x in range(w) for _ in (0, 1, 2)))
        for k in range(n_frames)
    ]
    fps = 2 ** fps_pow
    mp4 = encode_mp4(
        w, h, frames, fps=fps, sync_every=sync_every, samples_per_chunk=spc
    )
    w2, h2, durations, out, sync = decode_mp4(mp4)
    assert (w2, h2, len(out)) == (w, h, n_frames)
    assert durations == [1_000_000 // fps] * n_frames
    expect_sync = (
        [True] * n_frames
        if sync_every == 1
        else [i % sync_every == 0 for i in range(n_frames)]
    )
    assert sync == expect_sync
