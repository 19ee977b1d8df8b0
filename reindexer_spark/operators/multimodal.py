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


@query("multimodal_decode_features")  # Python codec output → rows-only check
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media-decode pipeline as a contract query: documents' bytes
    stand in for media payloads, flow through the Arrow-batched
    mapInPandas decode (reindexer_spark.multimodal, deterministic
    FakeCodec), and come out as typed features.  Deterministic but not
    SQL-expressible (the codec is Python) → rows-only check; the
    metadata lane (multimodal_binary_meta) carries the oracle."""
    from reindexer_spark.multimodal import extract_media_features

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text-as-image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("meta"),
    )
    return extract_media_features(media)


@query("multimodal_frame_sample")  # Python sampler output → rows-only check
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video frame-sampling leg as a contract query: documents'
    bytes stand in for video payloads, the deterministic
    FakeFrameSampler derives a duration and digest-stamped frames, and
    each input row fans out to a bounded, data-dependent number of
    frame rows via mapInPandas — the one shape a fixed-arity UDF cannot
    express.  Deterministic but Python-side → rows-only check."""
    from reindexer_spark.multimodal import sample_video_frames

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text-as-video").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("meta"),
    )
    return sample_video_frames(media, every_ms=5000, max_frames=4)
