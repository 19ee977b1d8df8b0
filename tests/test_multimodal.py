"""Multimodal pipeline tests: binary payload plumbing through
mapInPandas with the deterministic FakeCodec, null handling, byte-budget
repartitioning, and the LibraryCodec stub contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reindexer_spark.multimodal import (
    FakeCodec,
    LibraryCodec,
    extract_media_features,
    repartition_by_bytes,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake payload one", {"src": "cam0"}),
        (2, "image", b"\x89PNG fake payload two bigger " * 10, {"src": "cam1"}),
        (3, "audio", b"RIFF fake wav", {}),
        (4, "image", None, {"src": "cam2"}),  # missing payload
    ]
    return spark.createDataFrame(
        rows, "media_id bigint, kind string, payload binary, meta map<string,string>"
    )


def test_extract_features_schema_and_determinism(spark, media):
    out = extract_media_features(media, codec=FakeCodec())
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 4
    r1 = rows[1]
    assert r1.n_bytes == 21
    assert len(r1.features) == 8
    assert 16 <= r1.width < 80 and 1 <= r1.n_channels <= 3
    # deterministic: a second run yields identical features
    again = {r.media_id: r for r in extract_media_features(media).collect()}
    assert again[1].features == r1.features and again[1].checksum == r1.checksum


def test_extract_features_null_payload(spark, media):
    out = extract_media_features(media)
    r4 = next(r for r in out.collect() if r.media_id == 4)
    assert r4.n_bytes == 0 and r4.checksum is None and r4.features is None


def test_repartition_by_bytes(spark, media):
    big = media.filter(F.col("payload").isNotNull())
    out = repartition_by_bytes(big, target_partition_bytes=64)
    assert out.count() == 3
    assert out.rdd.getNumPartitions() >= 2  # ~350 payload bytes / 64


def test_library_codec_is_explicit_stub():
    with pytest.raises(NotImplementedError, match="Pillow"):
        LibraryCodec().decode(b"payload")
