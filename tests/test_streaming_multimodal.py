"""The multimodal decode lane is streaming-compatible: the SAME
Arrow-batched mapInPandas decode stage runs under the real streaming
engine (file source → micro-batches → memory sink) and produces
byte-identical features to the batch run — decode-on-arrival, the
shape a 100 TB ingest pipeline actually has (media decodes as shards
land, not in a nightly batch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reindexer_spark.streaming.runner import run_stream_to_memory

MEDIA_SCHEMA = "media_id bigint, kind string, payload binary, meta map<string,string>"


def _write_media(spark, sf_dir, out_dir, n_files=3):
    from reindexer_spark.catalog import load_table
    from reindexer_spark.operators.multimodal import _synth_media

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    media = _synth_media(d)
    # several files so the file source has multiple units to discover
    media.repartition(n_files).write.mode("overwrite").parquet(out_dir)
    return media


def test_streaming_decode_equals_batch(spark, sf_dir, tmp_path):
    from reindexer_spark.multimodal import LibraryCodec, extract_media_features

    out = str(tmp_path / "media")
    _write_media(spark, sf_dir, out)

    batch = extract_media_features(spark.read.parquet(out), codec=LibraryCodec())
    batch_rows = {r.media_id: r for r in batch.collect()}

    stream_src = (
        spark.readStream.schema(MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(out)
    )
    streamed = extract_media_features(stream_src, codec=LibraryCodec())
    got = run_stream_to_memory(streamed, output_mode="append")
    stream_rows = {r.media_id: r for r in got.collect()}

    assert set(stream_rows) == set(batch_rows) and len(batch_rows) == 60
    for mid, b in batch_rows.items():
        s = stream_rows[mid]
        assert (s.width, s.height, s.n_channels) == (b.width, b.height, b.n_channels)
        assert s.features == b.features  # bit-identical decode either path
        assert s.checksum == b.checksum


def test_streaming_probe_filter_pipeline(spark, sf_dir, tmp_path):
    """The probe→filter→decode curation pipeline under the streaming
    engine: header-probe every arriving object, decode only images
    past a resolution filter — the decode-only-survivors pattern."""
    import pandas as pd

    out = str(tmp_path / "media2")
    _write_media(spark, sf_dir, out)

    def probe(batches):
        from reindexer_spark.codecs import MediaFormatError, probe_media

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                try:
                    p = probe_media(bytes(r["payload"]))
                except MediaFormatError:
                    continue
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "probe_kind": p["kind"],
                        "width": p["width"] or 0,
                        "height": p["height"] or 0,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "probe_kind", "width", "height"]
            )

    stream_src = (
        spark.readStream.schema(MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(out)
    )
    probed = stream_src.mapInPandas(
        probe, "media_id bigint, probe_kind string, width int, height int"
    ).filter((F.col("width") >= 10) & (F.col("height") >= 8))
    got = run_stream_to_memory(probed, output_mode="append").collect()
    assert len(got) > 0
    assert all(r.width >= 10 and r.height >= 8 for r in got)
    # equals the batch version of the same filter
    batch = (
        spark.read.parquet(out)
        .mapInPandas(probe, "media_id bigint, probe_kind string, width int, height int")
        .filter((F.col("width") >= 10) & (F.col("height") >= 8))
        .collect()
    )
    assert sorted(r.media_id for r in got) == sorted(r.media_id for r in batch)


def test_streaming_warc_crawl_probe_equals_batch(spark, sf_dir, tmp_path):
    """The full crawl-to-curation front half UNDER STREAMING: media WARC
    shards (gzip wire forms, 404s, decoys, junk-claiming-bmp) arrive
    through the warc DataSource's streaming reader, the header-only
    probe runs per micro-batch, and the surviving probe rows must equal
    the batch run over the same directory — crawl ingestion, wire
    decoding, and probe curation all engine-agnostic."""
    import pandas as pd
    from pyspark.sql import functions as F

    from reindexer_spark.catalog import load_table
    from reindexer_spark.operators.crawl import _synth_media_warc
    from reindexer_spark.operators.multimodal import _synth_media
    from reindexer_spark.sources.warc import WarcDataSource

    media = _synth_media(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    )
    out = str(tmp_path / "mediawarc")
    import os

    os.makedirs(out, exist_ok=True)
    _synth_media_warc(media, out)
    spark.dataSource.register(WarcDataSource)

    def probe(batches):
        from reindexer_spark.codecs import MediaFormatError, probe_media

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    p = probe_media(bytes(r.payload))
                except MediaFormatError:
                    continue
                rows.append(
                    {
                        "record_id": r.record_id,
                        "probe_kind": p["kind"],
                        "n_bytes": int(r.n_bytes),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["record_id", "probe_kind", "n_bytes"]
            )

    def lane(df):
        return (
            df.filter(F.col("warc_type") == "response")
            .filter(F.col("http_status") == 200)
            .select("record_id", "payload", "n_bytes")
            .mapInPandas(
                probe, "record_id string, probe_kind string, n_bytes bigint"
            )
        )

    got = run_stream_to_memory(
        lane(spark.readStream.format("warc").load(out)), output_mode="append"
    ).collect()
    batch = lane(spark.read.format("warc").load(out)).collect()
    assert len(got) > 0
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
