"""Tier C12 — multimodal columns: vectors as array<float>, media as
opaque binary with typed metadata.

The vector side is fully real (norms, stats, element access).  The media
side treats payloads as binary columns; the Spark plumbing (schema,
batching, mapInPandas signature) is real and tested, while the actual
image/audio decode is stubbed behind ``reindexer_spark.multimodal``
(decode libs are not in this container — see that module's docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reindexer_spark.catalog import load_table
from reindexer_spark.registry import query


@query(
    "embed_vector_stats",
    oracle="""
    WITH n AS (
      SELECT label,
             len(embedding) AS dim,
             ROUND(SQRT(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) AS norm,
             embedding[1]::DOUBLE AS first_dim
      FROM embeddings
    )
    SELECT label,
           COUNT(*) AS n_vectors,
           MIN(dim) AS min_dim,
           MAX(dim) AS max_dim,
           CAST(SUM(CAST(norm AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_norm,
           CAST(MIN(CAST(norm AS DECIMAL(18,6))) AS DOUBLE) AS min_norm,
           CAST(MAX(CAST(first_dim AS DECIMAL(18,9))) AS DOUBLE) AS max_first_dim
    FROM n
    GROUP BY label
    """,
)
def embed_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-column statistics by label: dimension checks, L2 norms,
    element access.  Norms are rounded once then aggregated as exact
    decimals so group averages are reduction-order-independent."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    norm = F.round(
        F.sqrt(
            F.aggregate(
                emb,
                F.lit(0.0),
                lambda acc, v: acc + v.cast("double") * v.cast("double"),
            )
        ),
        6,
    )
    base = e.select(
        "label",
        F.size(emb).cast("bigint").alias("dim"),
        norm.cast("decimal(18,6)").alias("norm"),
        F.element_at(emb, 1).cast("double").cast("decimal(18,9)").alias("first_dim"),
    )
    return base.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.min("dim").alias("min_dim"),
        F.max("dim").alias("max_dim"),
        (F.sum("norm").cast("double") / F.count("*")).alias("avg_norm"),
        F.min("norm").cast("double").alias("min_norm"),
        F.max("first_dim").cast("double").alias("max_first_dim"),
    )


@query(
    "embed_normalize",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(list_sum(list_transform(embedding::DOUBLE[], x -> x)), 6) AS sum_components,
           ROUND(SQRT(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) AS norm,
           ROUND(embedding[1]::DOUBLE
                 / SQRT(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6)
             AS first_dim_normalized
    FROM embeddings
    WHERE vec_id < 100
    """,
)
def embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 normalization of a vector column (shown via its first component
    and invariants) — per-row array math, zero shuffles, the preprocessing
    step ahead of any cosine-based dedup/ANN job."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    emb = F.col("embedding")
    dbl = lambda c: c.cast("double")  # noqa: E731
    ssum = F.aggregate(emb, F.lit(0.0), lambda acc, v: acc + dbl(v))
    norm = F.sqrt(F.aggregate(emb, F.lit(0.0), lambda acc, v: acc + dbl(v) * dbl(v)))
    return e.select(
        "vec_id",
        F.size(emb).cast("bigint").alias("dim"),
        F.round(ssum, 6).alias("sum_components"),
        F.round(norm, 6).alias("norm"),
        F.round(F.element_at(emb, 1).cast("double") / norm, 6).alias(
            "first_dim_normalized"
        ),
    )


@query(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS checksum,
           CASE WHEN octet_length(encode(text)) > 256 THEN 'large' ELSE 'small' END
             AS size_class
    FROM documents
    WHERE doc_id < 200
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column plumbing: encode payloads to binary, compute
    byte length + checksum + typed metadata.  This is the metadata lane
    of the media pipeline; the decode lane (images/audio) is exercised in
    tests via reindexer_spark.multimodal (mapInPandas over binary)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.md5(payload).alias("checksum"),
        F.when(F.octet_length(payload) > 256, "large")
        .otherwise("small")
        .alias("size_class"),
    )


def _synth_media(d: DataFrame) -> DataFrame:
    """documents → media rows with REAL payloads: a deterministic 24-bit
    BMP per document (pixels seeded from the text digest), every third
    row a real mono 16-bit WAV, every doc_id % 3 == 1 row a real
    multi-frame uncompressed-DIB AVI.  Built in mapInPandas because
    container encoding is byte-level Python — this is the fixture lane;
    the decode lane downstream parses these bytes back for real."""
    schema = (
        "media_id bigint, kind string, payload binary, meta map<string,string>"
    )

    def build(batches):
        import hashlib

        import pandas as pd

        from reindexer_spark.codecs import encode_avi, encode_bmp, encode_wav

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                seed = hashlib.sha256(r["text"].encode("utf-8")).digest()
                if r["doc_id"] % 3 == 2:
                    samples = [
                        int.from_bytes(
                            seed[(2 * i) % 31 : (2 * i) % 31 + 2],
                            "little",
                            signed=True,
                        )
                        for i in range(16000)
                    ]
                    payload, kind = encode_wav(samples, 8000), "audio-wav"
                elif r["doc_id"] % 3 == 1:
                    w, h = 6 + seed[0] % 7, 6 + seed[1] % 7
                    frames = []
                    for i in range(3 + seed[2] % 4):  # 3-6 frames @ 4 fps
                        fseed = hashlib.sha256(seed + bytes([i])).digest()
                        frames.append(
                            (fseed * ((w * h * 3) // len(fseed) + 1))[
                                : w * h * 3
                            ]
                        )
                    payload, kind = encode_avi(w, h, frames, 4), "video-avi"
                else:
                    w, h = 8 + seed[0] % 9, 8 + seed[1] % 9
                    rgb = (seed * ((w * h * 3) // len(seed) + 1))[: w * h * 3]
                    payload, kind = encode_bmp(w, h, bytes(rgb)), "image-bmp"
                rows.append(
                    {
                        "media_id": r["doc_id"],
                        "kind": kind,
                        "payload": payload,
                        "meta": {"lang": r["lang"]},
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    return d.select("doc_id", "text", "lang").mapInPandas(build, schema)


@query("multimodal_decode_features")  # Python codec output → rows-only check
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media-decode pipeline on REAL bytes end-to-end: deterministic
    BMP/WAV/DIB-AVI payloads are synthesized per document, then parsed back by
    the dependency-free stdlib codecs (reindexer_spark.codecs) through
    the Arrow-batched mapInPandas seam — decoded dimensions, channel
    means, amplitude stats are computed from actual pixel/sample data,
    not digest stubs.  Deterministic but not SQL-expressible (byte-level
    container parsing) → rows-only check; the metadata lane
    (multimodal_binary_meta) carries the oracle."""
    from reindexer_spark.multimodal import LibraryCodec, extract_media_features

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    feats = extract_media_features(_synth_media(d), codec=LibraryCodec())
    # serialize the feature vector: the external comparator canonicalizes
    # via pandas and cannot hash raw array cells (round-1 driver ERR class)
    return feats.withColumn(
        "features",
        F.array_join(
            F.transform("features", lambda x: F.format_string("%.6f", x)), ","
        ),
    )


@query("multimodal_thumbnail")  # Python resize output → rows-only check
def multimodal_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize on real pixels: BMP payloads downscale via the
    nearest-neighbor pure-Python resizer; output thumbnails are
    themselves decodable BMPs.  Emits (dims, checksum) — byte-stable,
    bounded by max_dim² per row."""
    from reindexer_spark.multimodal import LibraryResizer, resize_thumbnails

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    media = _synth_media(d).filter(F.col("kind") == "image-bmp")
    thumbs = resize_thumbnails(media, max_dim=8, resizer=LibraryResizer())
    return thumbs.select(
        "media_id",
        "kind",
        "thumb_w",
        "thumb_h",
        F.octet_length("thumbnail").alias("thumb_bytes"),
        F.md5("thumbnail").alias("thumb_checksum"),
    )


@query("multimodal_frame_sample")  # Python sampler output → rows-only check
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamped frame sampling on REAL media, audio AND video: the
    synthesized WAV payloads (2 s of real 16-bit PCM) sample a 100 ms
    window at each 500 ms mark, and the synthesized multi-frame DIB-AVI
    payloads sample the decoded video frame covering each mark,
    re-encoded as a standalone BMP — actual timestamp→offset math on
    parsed containers in both modalities (compressed video needs pyav
    and quarantines via MediaFormatError).  Each input row fans out to
    a data-dependent number of frame rows via mapInPandas — the one
    shape a fixed-arity UDF cannot express.  Deterministic but
    Python-side → rows-only check; frames are emitted as (bytes,
    checksum), not raw binary, for the pandas canonicalizer."""
    from reindexer_spark.multimodal import LibraryFrameSampler, sample_video_frames

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    media = _synth_media(d).filter(
        F.col("kind").isin("audio-wav", "video-avi")
    )
    frames = sample_video_frames(
        media, every_ms=500, max_frames=4, sampler=LibraryFrameSampler()
    )
    return frames.select(
        "media_id",
        "frame_idx",
        "frame_ts_ms",
        F.octet_length("frame").alias("frame_bytes"),
        F.md5("frame").alias("frame_checksum"),
    )


AHASH_BANDS = 4  # 64-bit hash split into 4x16-bit bands for LSH
AHASH_HAMMING_MAX = 6


@query("multimodal_phash_dedup")  # Python decode output → rows-only check
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup on REAL pixels: decode each BMP,
    average-hash it (8x8 nearest-neighbor downsample of the grayscale,
    threshold at the mean → 64-bit signature), then find near-duplicate
    pairs by hamming distance ≤ 6 — the image-modality twin of
    dedup_simhash, closing the loop between the multimodal decode lane
    and the dedup family.

    Scale shape mirrors SimHash text dedup exactly: the signature is 8
    bytes per image regardless of resolution (the ONLY full-data pass
    is the decode), candidates come from equality on one of 4 16-bit
    hash bands — hamming ≤ 6 pairs must agree on ≥1 band by pigeonhole
    when corruption spreads, and identical images (duplicate documents
    produce byte-identical payloads here) collide on all 4 — and the
    exact hamming check via bit_count(xor) runs on candidates only.
    Decode is Arrow-batched mapInPandas; the band join shuffles 8-byte
    signatures, never pixels."""
    from reindexer_spark.codecs import decode_bmp

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = _synth_media(d).filter(F.col("kind") == "image-bmp")

    # Near-duplicate lane: every 5th image re-enters slightly brightened
    # (a few pixels nudged, media_id offset by 1e6) — the fixture's
    # stand-in for the re-encoded/re-scaled copies a real crawl carries.
    # The corpus itself has no byte-identical images (the generator
    # seeds pixels from document text, which is duplicate-free at this
    # sf), so these perturbed copies are what a perceptual hash must
    # catch that an exact checksum cannot.
    def perturb(batches):
        import numpy as np
        import pandas as pd

        from reindexer_spark.codecs import encode_bmp

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["media_id"] % 15 != 0:
                    continue
                w, h, rgb = decode_bmp(bytes(r["payload"]))
                px = np.frombuffer(rgb, dtype=np.uint8).copy()
                px[:: max(1, len(px) // 7)] = np.minimum(
                    px[:: max(1, len(px) // 7)].astype(np.int16) + 9, 255
                ).astype(np.uint8)
                rows.append(
                    {
                        "media_id": int(r["media_id"]) + 1_000_000,
                        "kind": "image-bmp",
                        "payload": encode_bmp(w, h, px.tobytes()),
                        "meta": dict(r["meta"]) if r["meta"] else {},
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    copies = media.mapInPandas(
        perturb,
        "media_id bigint, kind string, payload binary, meta map<string,string>",
    )
    media = media.unionByName(copies)

    def ahash(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                w, h, rgb = decode_bmp(bytes(r["payload"]))
                px = (
                    np.frombuffer(rgb, dtype=np.uint8)
                    .reshape(h, w, 3)
                    .mean(axis=2)
                )
                # nearest-neighbor 8x8: integer index grid, no float
                # resampling → engine/library-independent
                yi = (np.arange(8) * h) // 8
                xi = (np.arange(8) * w) // 8
                small = px[np.ix_(yi, xi)]
                bits = (small > small.mean()).flatten()
                sig = 0
                for b in bits:
                    sig = (sig << 1) | int(b)
                # store as signed int64 (Spark bigint)
                if sig >= 1 << 63:
                    sig -= 1 << 64
                out.append((int(r["media_id"]), sig))
            yield pd.DataFrame(out, columns=["media_id", "ahash"])

    sigs = media.mapInPandas(ahash, "media_id bigint, ahash bigint")
    from reindexer_spark.cache import track

    sigs = track(sigs)
    # band signatures: 4x16 bits via shiftrightunsigned + mask
    def band_col(i: int):
        return (
            F.shiftrightunsigned(F.col("ahash"), 16 * i)
            .bitwiseAND(F.lit(0xFFFF))
            .alias(f"b{i}")
        )

    banded = sigs.select(
        "media_id", "ahash", *[band_col(i) for i in range(AHASH_BANDS)]
    )
    a = banded.select(
        F.col("media_id").alias("m1"),
        F.col("ahash").alias("h1"),
        *[F.col(f"b{i}").alias(f"a{i}") for i in range(AHASH_BANDS)],
    )
    b = banded.select(
        F.col("media_id").alias("m2"),
        F.col("ahash").alias("h2"),
        *[F.col(f"b{i}").alias(f"c{i}") for i in range(AHASH_BANDS)],
    )
    band_match = a["a0"] == b["c0"]
    for i in range(1, AHASH_BANDS):
        band_match = band_match | (a[f"a{i}"] == b[f"c{i}"])
    cand = a.join(b, (F.col("m1") < F.col("m2")) & band_match).select(
        "m1", "m2", "h1", "h2"
    ).distinct()
    hamming = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return (
        cand.select("m1", "m2", hamming.alias("hamming"))
        .filter(F.col("hamming") <= AHASH_HAMMING_MAX)
    )
