import pytest

# Pure-Python codec suite: deselected by the default pytest run
# (pytest.ini addopts -m "not codec"); run with `-m codec`.
pytestmark = pytest.mark.codec



def test_phash_dedup_finds_only_perturbed_copies(spark, sf_dir):
    """Every detected pair must link an original to ITS perturbed copy
    (media_id + 1e6) within the hamming bound — no cross-image false
    positives among the ~67 decoded images."""
    from reindexer_spark.registry import get_query

    rows = get_query("multimodal_phash_dedup").fn(spark, sf_dir).collect()
    assert rows, "perturbed-copy lane must produce detectable pairs"
    for r in rows:
        assert r.m2 == r.m1 + 1_000_000, (r.m1, r.m2)
        assert 0 <= r.hamming <= 6


def test_audio_dedup_finds_cross_container_copies(spark, sf_dir):
    """Every clip is re-encoded through the OTHER container with
    byte-identical PCM: each (id, id+100000) pair must surface with
    overlap 1.0 despite zero shared payload bytes, and no unrelated
    pair may reach the threshold."""
    from reindexer_spark.operators.multimodal import audio_dedup_fingerprint

    rows = audio_dedup_fingerprint(spark, sf_dir).collect()
    cross = {(r.m1, r.m2): r for r in rows if r.m2 == r.m1 + 100000}
    other = [r for r in rows if r.m2 != r.m1 + 100000]
    assert len(cross) >= 10  # every audio row under doc_id<200 pairs up
    assert all(r.overlap == 1.0 for r in cross.values())
    # unrelated digest-seeded clips shouldn't look acoustically equal
    assert all(r.overlap < 1.0 for r in other)


def test_audio_fingerprint_is_amplitude_invariant():
    """The fingerprint survives gain changes and codec round-trips —
    the invariances that make it a fingerprint, not a checksum."""
    import numpy as np

    from reindexer_spark.codecs import decode_flac, encode_flac
    from reindexer_spark.operators.multimodal import audio_fingerprint

    t = np.arange(16000)
    sig = (3000 * np.sin(t / 17) + 800 * np.sin(t / 5)).astype(np.int64)
    samples = [int(v) for v in sig]
    fp = audio_fingerprint(samples)
    assert len(fp) > 5
    # halve the gain: zero crossings and energy trend are unchanged
    assert audio_fingerprint([v // 2 for v in samples]) == fp
    # FLAC round-trip is lossless, so the fingerprint is identical
    _, back = decode_flac(encode_flac(samples, 8000))
    assert audio_fingerprint(back) == fp
    # different audio → different fingerprint
    other = [int(v) for v in (2500 * np.sin(t / 3)).astype(np.int64)]
    assert audio_fingerprint(other) != fp


def test_scene_cuts_match_ground_truth_all_containers(spark, sf_dir):
    """Detected cuts equal the constructed scene boundaries on every
    container: exactly on lossless DIB, and across the lossy JPEG/mp4
    paths the codec noise must stay far enough below the scene signal
    to change nothing."""
    from reindexer_spark.operators.multimodal import video_scene_cuts

    rows = video_scene_cuts(spark, sf_dir).collect()
    assert len(rows) > 0
    seen = {r.container for r in rows}
    assert seen == {"avi-dib", "avi-mjpg", "mp4", "mkv"}
    for r in rows:
        assert r.cuts == r.true_cuts, (r.media_id, r.container)
        assert r.n_cuts >= 1  # every video has >= 2 scenes
        # intra-scene deltas sit well under the threshold (codec noise
        # margin — if this creeps toward 40 the operator is fragile)
        assert r.max_intra_delta < 25, (r.media_id, r.container)


def test_probe_agrees_with_full_decoders(spark, sf_dir):
    """The header-only probe must report the SAME dimensions / counts
    the full decoders produce on every fixture row — otherwise the
    cheap filtering pass would pass/reject the wrong objects."""
    from pyspark.sql import functions as F

    from reindexer_spark.catalog import load_table
    from reindexer_spark.operators.multimodal import (
        _synth_media,
        multimodal_probe_meta,
    )

    probed = {r.media_id: r for r in multimodal_probe_meta(spark, sf_dir).collect()}
    # 200 decode-rotation rows + the probe-only WebP rows (round 10:
    # one per doc_id < 200 with doc_id % 12 == 9, media_id + 2_000_000)
    n_webp = len([i for i in range(200) if i % 12 == 9])
    assert len(probed) == 200 + n_webp
    for i in range(200):
        if i % 12 == 9:
            pw = probed[i + 2_000_000]
            assert pw.probe_kind == "webp" and pw.kind == "image-webp"
            assert pw.width >= 8 and pw.height >= 8 and pw.n_frames >= 1
    media = _synth_media(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    ).collect()
    from reindexer_spark.codecs import (
        PurePythonCodec,
        decode_avi,
        decode_flac,
        decode_gif,
        decode_mp4,
        decode_wav,
    )

    for m in media:
        p = probed[m.media_id]
        payload = bytes(m.payload)
        assert p.probe_kind is not None, m.kind
        if m.kind.startswith("image") or m.kind.startswith("video"):
            if m.kind == "image-gif":
                w, h, _d, frames = decode_gif(payload)
                assert (p.width, p.height, p.n_frames) == (w, h, len(frames))
            elif m.kind in ("video-avi", "video-mjpeg"):
                w, h, _u, frames = decode_avi(payload)
                assert (p.width, p.height, p.n_frames) == (w, h, len(frames))
            elif m.kind == "video-mp4":
                w, h, _d, frames, _s = decode_mp4(payload)
                assert (p.width, p.height, p.n_frames) == (w, h, len(frames))
            else:
                d = PurePythonCodec().decode(payload)
                assert (p.width, p.height) == (d["width"], d["height"])
        else:
            rate, samples = (
                decode_flac(payload)
                if m.kind == "audio-flac"
                else decode_wav(payload)
            )
            assert (p.sample_rate, p.n_samples) == (rate, len(samples))
