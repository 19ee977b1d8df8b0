"""WebDataset tar-shard DataSource: sample grouping by key prefix,
streamed reads, shard pruning, and the multimodal integration."""

from __future__ import annotations

import io

import pytest
from pyspark.sql import functions as F

from reindexer_spark.codecs import encode_bmp
from reindexer_spark.sources.webdataset import (
    WebDatasetSource,
    iter_samples,
    sample_key,
    write_webdataset_shard,
)


def _bmp(c: int) -> bytes:
    return encode_bmp(4, 2, bytes([c]) * 24)


def _samples(n=4, tag=b"s"):
    return [
        (
            f"{i:06d}",
            {
                "bmp": _bmp(i * 30),
                "txt": tag + b" caption %d" % i,
                "json": b'{"label": %d}' % i,
            },
        )
        for i in range(n)
    ]


def test_sample_key_convention():
    assert sample_key("000017.jpg") == ("000017", "jpg")
    assert sample_key("a/b/000017.seg.png") == ("a/b/000017", "seg.png")
    assert sample_key("x.tar.gz") == ("x", "tar.gz")


def test_roundtrip_plain_and_gzip_shards(spark, tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    write_webdataset_shard(str(d / "shard-000.tar"), _samples(4))
    write_webdataset_shard(str(d / "shard-001.tar.gz"), _samples(3, tag=b"z"))
    spark.dataSource.register(WebDatasetSource)
    got = spark.read.format("webdataset").load(str(d))
    rows = got.collect()
    assert len(rows) == 7
    assert got.rdd.getNumPartitions() == 2  # one task per shard
    r = next(
        r for r in rows if r.shard == "shard-000.tar" and r.key == "000002"
    )
    assert sorted(r.members) == ["bmp", "json", "txt"]
    assert bytes(r.members["bmp"]) == _bmp(60)
    assert bytes(r.members["txt"]) == b"s caption 2"
    assert r.n_members == 3
    assert r.n_bytes == sum(len(v) for v in r.members.values())
    gz = [r for r in rows if r.shard == "shard-001.tar.gz"]
    assert len(gz) == 3 and bytes(gz[0].members["txt"]).startswith(b"z")


def test_shard_pruning_is_conjunctive(spark, tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    write_webdataset_shard(str(d / "a.tar"), _samples(2))
    write_webdataset_shard(str(d / "b.tar"), _samples(2))
    spark.dataSource.register(WebDatasetSource)
    df = spark.read.format("webdataset").load(str(d))
    one = df.filter(F.col("shard") == "a.tar")
    assert one.rdd.getNumPartitions() == 1
    assert one.count() == 2
    none = df.filter((F.col("shard") == "a.tar") & (F.col("shard") == "b.tar"))
    assert none.count() == 0


def test_members_feed_decode_lane(spark, tmp_path):
    """The WebDataset→multimodal integration: image members decode to
    real features through the Arrow-batched seam."""
    from reindexer_spark.multimodal import LibraryCodec, extract_media_features

    d = tmp_path / "shards"
    d.mkdir()
    write_webdataset_shard(str(d / "a.tar"), _samples(5))
    spark.dataSource.register(WebDatasetSource)
    media = (
        spark.read.format("webdataset")
        .load(str(d))
        .select(
            F.monotonically_increasing_id().alias("media_id"),
            F.lit("image-bmp").alias("kind"),
            F.col("members")["bmp"].alias("payload"),
            F.create_map(
                F.lit("caption"),
                F.col("members")["txt"].cast("string"),
            ).alias("meta"),
        )
    )
    feats = extract_media_features(media, codec=LibraryCodec()).collect()
    assert len(feats) == 5 and all(r.width == 4 and r.height == 2 for r in feats)


def test_adjacency_contract_and_corruption():
    # interleaved keys violate the WebDataset adjacency contract →
    # surfaces as SPLIT samples (two rows for 'a'), never corruption
    buf = io.BytesIO()
    import tarfile

    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [
            ("a.txt", b"1"), ("b.txt", b"2"), ("a.json", b"3")
        ]:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    buf.seek(0)
    got = list(iter_samples(buf))
    assert [k for k, _ in got] == ["a", "b", "a"]
    # garbage is a loud ValueError naming the shard, not a silent skip
    with pytest.raises(ValueError, match="bad-shard"):
        list(iter_samples(io.BytesIO(b"\x00garbage" * 100), where="bad-shard"))


def test_stream_reader_ingests_each_shard_once(tmp_path):
    """Streaming offsets over a shard directory: every shard lands in
    exactly one batch's partitions; later arrivals appear only in the
    next batch; replays of an offset pair re-read the same shards."""
    from reindexer_spark.sources.webdataset import (
        WebDatasetStreamReader,
        write_webdataset_shard,
    )

    write_webdataset_shard(
        str(tmp_path / "s0.tar"),
        [("a", {"txt": b"one"}), ("b", {"txt": b"two"})],
    )
    rdr = WebDatasetStreamReader({"path": str(tmp_path)})
    o0, o1 = rdr.initialOffset(), rdr.latestOffset()
    assert o1 == {"b": "", "recent": ["s0.tar"]}
    parts1 = rdr.partitions(o0, o1)
    keys1 = sorted(r[1] for p in parts1 for r in rdr.read(p))
    assert keys1 == ["a", "b"]

    write_webdataset_shard(str(tmp_path / "s1.tar"), [("c", {"txt": b"3"})])
    o2 = rdr.latestOffset()
    parts2 = rdr.partitions(o1, o2)
    assert [p.path.split("/")[-1] for p in parts2] == ["s1.tar"]
    assert [r[1] for p in parts2 for r in rdr.read(p)] == ["c"]
    # replay determinism
    assert sorted(p.path for p in rdr.partitions(o0, o1)) == sorted(
        p.path for p in parts1
    )


def test_stream_matches_batch_over_same_shards(spark, tmp_path):
    from reindexer_spark.sources.webdataset import (
        WebDatasetSource,
        write_webdataset_shard,
    )
    from reindexer_spark.streaming import run_stream_to_memory

    write_webdataset_shard(
        str(tmp_path / "w0.tar"),
        [("k0", {"txt": b"x", "json": b"{}"}), ("k1", {"txt": b"yy"})],
    )
    write_webdataset_shard(
        str(tmp_path / "w1.tar"), [("k2", {"txt": b"zzz"})]
    )
    spark.dataSource.register(WebDatasetSource)
    stream = run_stream_to_memory(
        spark.readStream.format("webdataset")
        .load(str(tmp_path))
        .select("shard", "key", "n_members", "n_bytes"),
        output_mode="append",
    )
    batch = (
        spark.read.format("webdataset")
        .load(str(tmp_path))
        .select("shard", "key", "n_members", "n_bytes")
    )
    assert sorted(map(tuple, stream.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_distributed_writer_is_deterministic_and_atomic(spark, tmp_path):
    """The production sink (write_webdataset_shards): writing the same
    samples twice produces byte-identical shard files (zeroed tar
    metadata + sorted member order — the retry-idempotence claim), no
    .tmp turds survive the atomic rename, and the repo's own reader
    gets every sample back with byte-exact members."""
    import os

    from reindexer_spark.sources.webdataset import write_webdataset_shards

    rows = [
        (i % 2, f"k{i:04d}", {"txt": f"body {i}".encode(), "bin": bytes([i])})
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "shard int, key string, members map<string, binary>"
    )
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_webdataset_shards(df, out1)
    write_webdataset_shards(df, out2)

    names1 = sorted(os.listdir(out1))
    assert names1 == ["shard-00000.tar", "shard-00001.tar"]
    assert not any(n.endswith(".tmp") for n in names1)
    for n in names1:
        b1 = open(os.path.join(out1, n), "rb").read()
        b2 = open(os.path.join(out2, n), "rb").read()
        assert b1 == b2, n  # byte-identical across writes

    spark.dataSource.register(WebDatasetSource)
    back = spark.read.format("webdataset").load(out1).collect()
    got = {r.key: dict(r.members) for r in back}
    assert set(got) == {k for _, k, _ in rows}
    for shard, key, members in rows:
        assert bytes(got[key]["txt"]) == members["txt"]
        assert bytes(got[key]["bin"]) == members["bin"]

    # gzip shards: same determinism (zeroed gzip mtime, empty FNAME —
    # the bytes must not depend on the output directory), same read-back
    outg1, outg2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    write_webdataset_shards(df, outg1, compress=True)
    write_webdataset_shards(df, outg2, compress=True)
    namesg = sorted(os.listdir(outg1))
    assert namesg == ["shard-00000.tar.gz", "shard-00001.tar.gz"]
    for n in namesg:
        bg1 = open(os.path.join(outg1, n), "rb").read()
        bg2 = open(os.path.join(outg2, n), "rb").read()
        assert bg1 == bg2, n
    backg = spark.read.format("webdataset").load(outg1).collect()
    assert {r.key: dict(r.members) for r in backg}.keys() == got.keys()
