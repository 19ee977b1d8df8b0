"""Tier C10 — similarity search over the ``embeddings`` table.

Two paths:

- ``knn_bruteforce``: exact cosine top-k — the correctness baseline.
  O(|Q|·|N|) with the query side broadcast; right answer at any scale
  where |Q| is small, and the oracle for the approximate path.
- ``knn_ivf_lsh``: random-hyperplane LSH bucketing (sign bits of 8 fixed
  projections → 256 buckets), exact re-rank within the probed bucket.
  This is the 100 TB path: candidates shrink ~256× and the bucket join
  is a plain equi-join (shuffle on bucket id, or broadcast the bucketed
  queries).  The hyperplanes are deterministic module constants, so the
  DuckDB oracle replicates the bucketing exactly and the result is
  fully checkable — no "approximate, trust me" gap.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reindexer_spark.catalog import load_table
from reindexer_spark.functions import cosine_similarity
from reindexer_spark.registry import query

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
EMBED_DIM = 64
N_PLANES = 8

# Deterministic random hyperplanes (fixed seed → identical in the oracle).
_rng = random.Random(20240813)
HYPERPLANES: list[list[float]] = [
    [round(_rng.uniform(-1.0, 1.0), 6) for _ in range(EMBED_DIM)]
    for _ in range(N_PLANES)
]


def _dot_literal(emb: Column, plane: list[float]) -> Column:
    """Dot product of an array<float> column with a literal plane, in
    DOUBLE, accumulated in array order (matches DuckDB list_dot_product)."""
    lit_plane = F.array(*[F.lit(v) for v in plane])
    return F.aggregate(
        F.zip_with(emb, lit_plane, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def bucket_expr(emb: Column) -> Column:
    """LSH bucket id: bit i = sign of projection onto hyperplane i."""
    bits = [
        F.when(_dot_literal(emb, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, plane in enumerate(HYPERPLANES)
    ]
    return sum(bits[1:], bits[0]).cast("int")


def _bucket_sql(col: str) -> str:
    terms = []
    for i, plane in enumerate(HYPERPLANES):
        arr = "[" + ", ".join(repr(v) for v in plane) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product({col}::DOUBLE[], {arr}) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


@query(
    "knn_bruteforce",
    oracle=f"""
    SELECT * FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             c.label AS neighbor_label,
             list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                        c.vec_id
             ) AS rnk
      FROM embeddings q JOIN embeddings c ON c.vec_id >= {N_QUERIES}
      WHERE q.vec_id < {N_QUERIES}
    ) WHERE rnk <= {TOP_K}
    """,
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for each query vector: broadcast the
    (tiny) query side, scan candidates once, per-query top-k via window.
    Ties break on neighbor id for determinism."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = e.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("c_emb"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        "neighbor_label",
        cosine_similarity(F.col("q_emb"), F.col("c_emb")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "neighbor_label", "cosine", "rnk")
    )


@query(
    "knn_ivf_lsh",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, label, embedding, {_bucket_sql('embedding')} AS bucket
      FROM embeddings
    )
    SELECT * FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             c.bucket AS bucket,
             list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                        c.vec_id
             ) AS rnk
      FROM b q JOIN b c ON q.bucket = c.bucket AND c.vec_id >= {N_QUERIES}
      WHERE q.vec_id < {N_QUERIES}
    ) WHERE rnk <= {TOP_K}
    """,
)
def knn_ivf_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via random-hyperplane LSH: compare only within the query's
    bucket, then exact cosine re-rank.  One narrow projection pass to
    bucket everything, one equi-join on bucket id — the shape that
    survives a 100×-scale-up where brute force cannot."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", bucket_expr(F.col("embedding"))
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("bucket").alias("q_bucket"),
        F.col("embedding").alias("q_emb"),
    )
    c = e.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("bucket").alias("bucket"),
        F.col("embedding").alias("c_emb"),
    )
    scored = c.join(F.broadcast(q), F.col("q_bucket") == F.col("bucket")).select(
        "query_id",
        "neighbor_id",
        "bucket",
        cosine_similarity(F.col("q_emb"), F.col("c_emb")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "bucket", "cosine", "rnk")
    )


EMBED_LSH_THRESHOLD = 0.4


@query(
    "dedup_embedding_lsh",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
      FROM embeddings
    )
    SELECT x.vec_id AS v1, y.vec_id AS v2, x.bucket AS bucket,
           list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) AS cosine
    FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    WHERE list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[])
          >= {EMBED_LSH_THRESHOLD}
    """,
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup at scale: candidate pairs only within the same
    random-hyperplane LSH bucket (≈256× fewer comparisons than the
    quadratic baseline in operators.dedup.dedup_embedding), exact cosine
    verification inside the bucket.  Unlike typical ANN this is still
    fully oracle-checkable: the hyperplanes are deterministic module
    constants the oracle replicates, so 'approximate' means a defined
    candidate set, not an unreproducible one.

    Scale shape: one narrow projection pass to bucket, one equi-join on
    bucket id (self-join shuffles once on an 8-bit key — salting note:
    buckets are balanced by construction for zero-mean embeddings)."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", bucket_expr(F.col("embedding"))
    )
    a = e.select(
        F.col("vec_id").alias("v1"),
        F.col("bucket").alias("bucket"),
        F.col("embedding").alias("emb1"),
    )
    b = e.select(
        F.col("vec_id").alias("v2"),
        F.col("bucket").alias("b2"),
        F.col("embedding").alias("emb2"),
    )
    pairs = a.join(b, (F.col("bucket") == F.col("b2")) & (F.col("v1") < F.col("v2")))
    cos = cosine_similarity(F.col("emb1"), F.col("emb2"))
    return pairs.select("v1", "v2", "bucket", cos.alias("cosine")).filter(
        F.col("cosine") >= EMBED_LSH_THRESHOLD
    )


# Multi-band LSH: 4 independent bands of 4 planes (16 buckets each).
# Collision prob per band for angle θ is (1-θ/π)^4; the union over 4
# bands lifts recall to 1-(1-p)^4 — the standard recall lever that a
# single wider band cannot provide.
N_BANDS = 4
PLANES_PER_BAND = 4
_rng_mb = random.Random(20260813)
BAND_PLANES: list[list[list[float]]] = [
    [
        [round(_rng_mb.uniform(-1.0, 1.0), 6) for _ in range(EMBED_DIM)]
        for _ in range(PLANES_PER_BAND)
    ]
    for _ in range(N_BANDS)
]


def band_bucket_expr(emb: Column, band: int) -> Column:
    bits = [
        F.when(_dot_literal(emb, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, plane in enumerate(BAND_PLANES[band])
    ]
    return sum(bits[1:], bits[0]).cast("int")


def _band_bucket_sql(col: str, band: int) -> str:
    terms = []
    for i, plane in enumerate(BAND_PLANES[band]):
        arr = "[" + ", ".join(repr(v) for v in plane) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product({col}::DOUBLE[], {arr}) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


@query(
    "knn_multiband_lsh",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             [{", ".join(_band_bucket_sql("embedding", bd) for bd in range(N_BANDS))}]
               AS bb
      FROM embeddings
    ), e AS (
      SELECT vec_id, embedding,
             generate_subscripts(bb, 1) AS band, unnest(bb) AS bucket
      FROM b
    ), cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM e q JOIN e c
        ON q.band = c.band AND q.bucket = c.bucket AND c.vec_id >= {N_QUERIES}
      WHERE q.vec_id < {N_QUERIES}
    )
    SELECT * FROM (
      SELECT cand.query_id, cand.neighbor_id,
             list_cosine_similarity(q.embedding::DOUBLE[],
                                    c.embedding::DOUBLE[]) AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY cand.query_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                               c.embedding::DOUBLE[]) DESC,
                        cand.neighbor_id
             ) AS rnk
      FROM cand
      JOIN embeddings q ON q.vec_id = cand.query_id
      JOIN embeddings c ON c.vec_id = cand.neighbor_id
    ) WHERE rnk <= {TOP_K}
    """,
)
def knn_multiband_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via multi-band LSH: candidates are the UNION of
    collisions across {N_BANDS} independent {PLANES_PER_BAND}-plane
    bands, deduplicated, then exactly re-ranked by cosine.

    This is the recall lever of every production LSH system (banding:
    per-band collision (1-θ/π)^b, union 1-(1-p)^r) — compare
    knn_ivf_lsh, whose single wide band maximizes pruning instead.  The
    plan is |bands| narrow projections folded into one posexplode, a
    (band, bucket) equi-join, a pair-dedup aggregate, and a re-rank
    join — every stage hash-partitioned, nothing quadratic, and still
    fully oracle-checkable because the planes are fixed constants."""
    e = load_table(spark, sf_dir, "embeddings")
    banded = e.select(
        "vec_id",
        "embedding",
        F.posexplode(
            F.array(
                *[band_bucket_expr(F.col("embedding"), bd) for bd in range(N_BANDS)]
            )
        ).alias("band", "bucket"),
    )
    q = banded.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "band", "bucket"
    )
    c = banded.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), "band", "bucket"
    )
    cand = (
        c.join(F.broadcast(q), ["band", "bucket"])
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qe = e.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    ce = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        cand.join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("q_emb"), F.col("c_emb")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


@query(
    "knn_recall_at_k",
    oracle=f"""
    WITH sb AS (
      SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
      FROM embeddings
    ),
    bf AS (
      SELECT * FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                          c.vec_id
               ) AS rnk
        FROM embeddings q JOIN embeddings c ON c.vec_id >= {N_QUERIES}
        WHERE q.vec_id < {N_QUERIES}
      ) WHERE rnk <= {TOP_K}
    ),
    ivf AS (
      SELECT * FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                          c.vec_id
               ) AS rnk
        FROM sb q JOIN sb c ON q.bucket = c.bucket AND c.vec_id >= {N_QUERIES}
        WHERE q.vec_id < {N_QUERIES}
      ) WHERE rnk <= {TOP_K}
    ),
    mbb AS (
      SELECT vec_id, embedding,
             [{", ".join(_band_bucket_sql("embedding", bd) for bd in range(N_BANDS))}]
               AS bb
      FROM embeddings
    ), mbe AS (
      SELECT vec_id, embedding,
             generate_subscripts(bb, 1) AS band, unnest(bb) AS bucket
      FROM mbb
    ), mbcand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM mbe q JOIN mbe c
        ON q.band = c.band AND q.bucket = c.bucket AND c.vec_id >= {N_QUERIES}
      WHERE q.vec_id < {N_QUERIES}
    ),
    mb AS (
      SELECT * FROM (
        SELECT mbcand.query_id, mbcand.neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY mbcand.query_id
                 ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                                 c.embedding::DOUBLE[]) DESC,
                          mbcand.neighbor_id
               ) AS rnk
        FROM mbcand
        JOIN embeddings q ON q.vec_id = mbcand.query_id
        JOIN embeddings c ON c.vec_id = mbcand.neighbor_id
      ) WHERE rnk <= {TOP_K}
    )
    SELECT bf.query_id,
           CAST(COUNT(ivf.neighbor_id) AS BIGINT) AS n_hits_ivf,
           COUNT(ivf.neighbor_id) / {TOP_K} AS recall_ivf,
           CAST(COUNT(mb.neighbor_id) AS BIGINT) AS n_hits_multiband,
           COUNT(mb.neighbor_id) / {TOP_K} AS recall_multiband
    FROM bf
    LEFT JOIN ivf ON ivf.query_id = bf.query_id
                 AND ivf.neighbor_id = bf.neighbor_id
    LEFT JOIN mb  ON mb.query_id = bf.query_id
                 AND mb.neighbor_id = bf.neighbor_id
    GROUP BY bf.query_id
    """,
)
def knn_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality measurement — recall@k of BOTH LSH kNN variants
    against the exact bruteforce ground truth, per query vector: the
    acceptance metric every similarity-search deployment monitors, and
    the banding tradeoff made visible (one wide 8-plane band prunes
    hardest but loses most true neighbors; 4 independent 4-plane bands
    recover them via the union — the 1-(1-p^r)^b recall lever).  Fully
    oracle-checkable because the hyperplanes are deterministic module
    constants both engines replicate.  Ground truth is the left side of
    the join, so a query whose bucket lost true neighbors shows
    recall < 1 rather than vanishing."""
    from reindexer_spark.cache import track

    # Each component result is N_QUERIES × TOP_K rows; materializing them
    # decouples the three candidate-generation plans from the final join
    # (without this, the composite plan re-executes shared scan/window
    # subtrees and costs ~3× the sum of its parts — measured at sf0.1).
    bf = track(knn_bruteforce(spark, sf_dir).select("query_id", "neighbor_id"))
    ivf = track(
        knn_ivf_lsh(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit_ivf", F.lit(1))
    )
    mb = track(
        knn_multiband_lsh(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit_mb", F.lit(1))
    )
    return (
        bf.join(ivf, ["query_id", "neighbor_id"], "left")
        .join(mb, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit_ivf"), F.lit(0))).alias("n_hits_ivf"),
            F.sum(F.coalesce(F.col("hit_mb"), F.lit(0))).alias(
                "n_hits_multiband"
            ),
        )
        .select(
            "query_id",
            "n_hits_ivf",
            (F.col("n_hits_ivf") / TOP_K).alias("recall_ivf"),
            "n_hits_multiband",
            (F.col("n_hits_multiband") / TOP_K).alias("recall_multiband"),
        )
    )


@query(
    "embed_ann_bucket_stats",
    oracle=f"""
    WITH b AS (
      SELECT {_bucket_sql('embedding')} AS bucket FROM embeddings
    ),
    occ AS (
      SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(MIN(n) AS BIGINT) AS min_occupancy,
           CAST(MAX(n) AS BIGINT) AS max_occupancy,
           CAST(SUM(n) AS BIGINT) AS n_vectors,
           ROUND(MAX(n) / (SUM(n) / COUNT(*)), 6) AS skew_ratio
    FROM occ
    """,
)
def embed_ann_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index health: LSH bucket occupancy distribution and skew
    ratio (max/mean occupancy).  At scale this is the number that
    predicts the worst-case task in the bucket equi-join — a skew ratio
    far above 1 says the hyperplanes are misaligned with the data (or
    the data is clustered) and the hot bucket needs salting; it is the
    monitoring query behind the dedup_embedding_lsh/knn_ivf_lsh plans."""
    e = load_table(spark, sf_dir, "embeddings").select(
        bucket_expr(F.col("embedding")).alias("bucket")
    )
    occ = e.groupBy("bucket").agg(F.count("*").alias("n"))
    return occ.agg(
        F.count("*").alias("n_buckets"),
        F.min("n").alias("min_occupancy"),
        F.max("n").alias("max_occupancy"),
        F.sum("n").alias("n_vectors"),
        F.round(
            F.max("n") / (F.sum("n") / F.count("*")), 6
        ).alias("skew_ratio"),
    )


# Train/test split-leakage detection: md5 batch split (same convention
# as operators.sampling / operators.incremental), LSH-bucketed candidate
# generation, exact cosine verification above this threshold.
LEAK_TEST_HEX = "1999"
LEAK_THRESHOLD = 0.4
LEAK_TOP = 3


@query(
    "split_leakage_lsh",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket,
             substr(md5(vec_id::VARCHAR), 1, 4) < '{LEAK_TEST_HEX}' AS is_test
      FROM embeddings
    ),
    pairs AS (
      SELECT t.vec_id AS test_id, tr.vec_id AS train_id,
             list_cosine_similarity(t.embedding::DOUBLE[],
                                    tr.embedding::DOUBLE[]) AS cosine
      FROM b t JOIN b tr ON t.bucket = tr.bucket
      WHERE t.is_test AND NOT tr.is_test
    ),
    ranked AS (
      SELECT test_id, train_id, cosine,
             ROW_NUMBER() OVER (
               PARTITION BY test_id ORDER BY cosine DESC, train_id
             ) AS rnk
      FROM pairs WHERE cosine >= {LEAK_THRESHOLD}
    )
    SELECT test_id, train_id, cosine, rnk FROM ranked WHERE rnk <= {LEAK_TOP}
    """,
)
def split_leakage_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination check over EMBEDDINGS: for each held-out
    vector (md5 split, ~10%), the top train-side vectors with cosine ≥
    0.4 — the near-duplicate-across-the-split pairs that inflate eval
    scores.  The text-level analogue is text_contamination; this is the
    semantic-level guard, and the LSH bucketing makes it the same
    O(candidates) shape as dedup_embedding_lsh rather than test×train
    brute force.

    Scale shape: one projection pass to bucket both sides (the 100 TB
    train side never self-joins — only same-bucket test×train pairs
    form), exact cosine re-rank inside the bucket, per-test top-k via
    window.  Deterministic hyperplanes keep the candidate set — and
    hence the result — oracle-checkable.
    """
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", bucket_expr(F.col("embedding"))
    )
    is_test = (
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 4)
        < F.lit(LEAK_TEST_HEX)
    )
    test = e.filter(is_test).select(
        F.col("vec_id").alias("test_id"),
        F.col("bucket"),
        F.col("embedding").alias("t_emb"),
    )
    train = e.filter(~is_test).select(
        F.col("vec_id").alias("train_id"),
        F.col("bucket").alias("b2"),
        F.col("embedding").alias("tr_emb"),
    )
    pairs = test.join(train, F.col("bucket") == F.col("b2"))
    cos = cosine_similarity(F.col("t_emb"), F.col("tr_emb"))
    scored = pairs.select(
        "test_id", "train_id", cos.alias("cosine")
    ).filter(F.col("cosine") >= LEAK_THRESHOLD)
    w = Window.partitionBy("test_id").orderBy(
        F.col("cosine").desc(), F.col("train_id")
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= LEAK_TOP
    )


# Hard-negative mining for contrastive training: per anchor, the most
# similar vectors with a DIFFERENT label.  The standard recipe for
# embedding-model training data (triplet/InfoNCE batches need negatives
# near the decision boundary; random negatives are too easy to carry
# gradient signal).
HN_ANCHORS = 20
HN_K = 5


@query(
    "embed_hard_negatives",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, label, embedding, {_bucket_sql('embedding')} AS bucket
      FROM embeddings
    )
    SELECT * FROM (
      SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
             n.vec_id AS negative_id, n.label AS negative_label,
             list_cosine_similarity(a.embedding::DOUBLE[],
                                    n.embedding::DOUBLE[]) AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_cosine_similarity(a.embedding::DOUBLE[],
                                               n.embedding::DOUBLE[]) DESC,
                        n.vec_id
             ) AS rnk
      FROM b a JOIN b n ON a.bucket = n.bucket AND n.label <> a.label
      WHERE a.vec_id < {HN_ANCHORS}
    ) WHERE rnk <= {HN_K}
    """,
)
def embed_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 hard negatives per anchor: nearest-by-cosine vectors whose
    LABEL DIFFERS, mined within the anchor's LSH bucket.

    In-bucket mining is not a compromise here — it is the right
    semantics: hard negatives are by definition near the anchor, which
    is exactly what the bucket preserves; the recall the LSH gives up
    is on FAR pairs, i.e. easy negatives a contrastive batch does not
    want.  Same 100 TB shape as knn_ivf_lsh: one projection pass, one
    bucket equi-join (anchors broadcast), exact re-rank on candidates
    only.  Deterministic hyperplanes make the approximate path
    value-exact against the oracle (n.vec_id <> a.vec_id is implied by
    the label inequality — labels are per-vector constants)."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", bucket_expr(F.col("embedding"))
    )
    a = e.filter(F.col("vec_id") < HN_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("bucket").alias("a_bucket"),
        F.col("embedding").alias("a_emb"),
    )
    n = e.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        "bucket",
        F.col("embedding").alias("n_emb"),
    )
    scored = n.join(
        F.broadcast(a),
        (F.col("a_bucket") == F.col("bucket"))
        & (F.col("negative_label") != F.col("anchor_label")),
    ).select(
        "anchor_id",
        "anchor_label",
        "negative_id",
        "negative_label",
        cosine_similarity(F.col("a_emb"), F.col("n_emb")).alias("cosine"),
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("negative_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= HN_K)
        .select(
            "anchor_id",
            "anchor_label",
            "negative_id",
            "negative_label",
            "cosine",
            "rnk",
        )
    )
