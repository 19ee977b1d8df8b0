"""North-star: incremental corpus maintenance operators.

A 100 TB training corpus is not re-deduplicated from scratch when a new
crawl lands; the new batch is checked against the standing corpus, and
corpus-level statistics (audience overlap, distinct counts) are
maintained from small mergeable sketches rather than full rescans.
These operators model both patterns with the repo's determinism
conventions (md5 batch split, hash-order sketches), so even the
"approximate" sketch estimates are value-exact at the DuckDB gate.

Reference anchor: the reference's resume path (driver.go:69-83) is the
same idea one tier down — never reprocess what a previous run already
ingested.  Here the unit of increment is a document batch, not a cursor
position.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reindexer_spark.cache import track
from reindexer_spark.catalog import load_table
from reindexer_spark.operators.banding import HOT_BUCKET_CAP
from reindexer_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    MH_MD5_VERIFY,
    _MH_MD5_BANDS_SQL,
    _SHINGLE_SQL,
    shingle_table,
)
from reindexer_spark.registry import query

# md5 hex prefix below this marks a document as part of the "new" batch
# (~10% of the corpus) — same convention as operators.sampling.
NEW_BATCH_HEX = "1999"

# KMV (k-minimum-values) sketch size.  Small enough that the per-type
# estimate branch (not the exact-count fallback) is exercised even at
# sf0.01's 150 distinct users.
KMV_K = 64
# Hashes are the first 8 md5 hex chars → uniform integers in [0, 2^32).
KMV_SPACE = float(1 << 32)


def _batch_hash(col: str):
    return F.substring(F.md5(F.col(col).cast("string")), 1, 4)


@query(
    "dedup_incremental",
    oracle=f"""
    WITH {_SHINGLE_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
    new_ex AS (
      SELECT * FROM ex WHERE substr(md5(doc_id::VARCHAR), 1, 4) < '{NEW_BATCH_HEX}'
    ),
    old_ex AS (
      SELECT * FROM ex WHERE substr(md5(doc_id::VARCHAR), 1, 4) >= '{NEW_BATCH_HEX}'
    ),
    pairs AS (
      SELECT n.doc_id AS new_id, o.doc_id AS corpus_id, COUNT(*) AS n_common
      FROM new_ex n JOIN old_ex o ON n.shingle = o.shingle
      GROUP BY 1, 2
    )
    SELECT new_id, corpus_id, n_common,
           CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common) AS jaccard
    FROM pairs
    JOIN sizes s1 ON s1.doc_id = new_id
    JOIN sizes s2 ON s2.doc_id = corpus_id
    WHERE CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common)
          >= {JACCARD_THRESHOLD}
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup check: the NEW batch (~10% of docs, md5
    split) against the STANDING corpus — the maintenance mode of
    dedup_ngram_jaccard (which is the from-scratch build).

    Scale shape: the corpus-side inverted index is first SEMI-JOINED to
    the distinct shingles of the new batch, so the 100 TB standing index
    contributes only postings that can possibly match (at a 10% batch
    the probe discards the overwhelming majority of corpus postings
    before any pair is formed — and in steady state, when the new batch
    is ~0.1% of the corpus, nearly all of it).  The subsequent equi-join
    is new-side small, so Catalyst broadcasts it; pair verification is
    exact Jaccard, same threshold as the batch build.
    """
    ex = shingle_table(spark, sf_dir)
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n"))
    is_new = _batch_hash("doc_id") < F.lit(NEW_BATCH_HEX)
    new_ex = ex.filter(is_new)
    old_ex = ex.filter(~is_new)
    # the incremental step: prune corpus postings to the new batch's
    # shingle vocabulary before pairing
    probe = new_ex.select("sh").distinct()
    old_pruned = old_ex.join(probe, "sh", "left_semi")
    pairs = (
        new_ex.select(F.col("sh"), F.col("doc_id").alias("new_id"))
        .join(
            old_pruned.select(F.col("sh"), F.col("doc_id").alias("corpus_id")),
            "sh",
        )
        .groupBy("new_id", "corpus_id")
        .agg(F.count("*").alias("n_common"))
    )
    # s1 is FILTERED to the arriving batch BEFORE the broadcast hint —
    # hinting the full per-corpus-doc sizes relation renamed to new_id
    # would ship billions of rows (the join key restricts rows, not
    # the broadcast build side).  s2 stays per-CORPUS-doc: no hint,
    # AQE broadcasts while it fits (always, locally).
    s1 = sizes.filter(is_new).select(
        F.col("doc_id").alias("new_id"), F.col("n").alias("n1")
    )
    s2 = sizes.select(
        F.col("doc_id").alias("corpus_id"), F.col("n").alias("n2")
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("n_common")
    )
    return (
        pairs.join(F.broadcast(s1), "new_id")
        .join(s2, "corpus_id")
        .select("new_id", "corpus_id", "n_common", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


@query(
    "sketch_kmv_overlap",
    oracle=f"""
    WITH uh AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT AS h
      FROM events
    ),
    ranked AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn,
             COUNT(*)    OVER (PARTITION BY event_type) AS n_distinct
      FROM uh
    ),
    sk AS (SELECT * FROM ranked WHERE rn <= {KMV_K}),
    est AS (
      SELECT event_type,
             CASE WHEN MAX(n_distinct) < {KMV_K}
                  THEN CAST(MAX(n_distinct) AS DOUBLE)
                  ELSE ({KMV_K} - 1) * {KMV_SPACE!r}
                       / MAX(CASE WHEN rn = {KMV_K} THEN h END)
             END AS est_distinct
      FROM sk GROUP BY event_type
    ),
    pair_sk AS (
      SELECT DISTINCT a.event_type AS type_a, b.event_type AS type_b, s.h
      FROM est a
      JOIN est b ON a.event_type < b.event_type
      JOIN sk s ON s.event_type IN (a.event_type, b.event_type)
    ),
    union_ranked AS (
      SELECT type_a, type_b, h,
             ROW_NUMBER() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn,
             COUNT(*)    OVER (PARTITION BY type_a, type_b) AS n_union_sk
      FROM pair_sk
    ),
    union_est AS (
      SELECT type_a, type_b,
             CASE WHEN MAX(n_union_sk) < {KMV_K}
                  THEN CAST(MAX(n_union_sk) AS DOUBLE)
                  ELSE ({KMV_K} - 1) * {KMV_SPACE!r}
                       / MAX(CASE WHEN rn = {KMV_K} THEN h END)
             END AS est_union
      FROM union_ranked WHERE rn <= {KMV_K} GROUP BY type_a, type_b
    ),
    exact AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS exact_overlap
      FROM (SELECT DISTINCT event_type, user_id FROM events) a
      JOIN (SELECT DISTINCT event_type, user_id FROM events) b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT u.type_a, u.type_b,
           ea.est_distinct AS est_a,
           eb.est_distinct AS est_b,
           u.est_union,
           ea.est_distinct + eb.est_distinct - u.est_union AS est_overlap,
           x.exact_overlap
    FROM union_est u
    JOIN est ea ON ea.event_type = u.type_a
    JOIN est eb ON eb.event_type = u.type_b
    JOIN exact x ON x.type_a = u.type_a AND x.type_b = u.type_b
    """,
)
def sketch_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation between event types via KMV
    (k-minimum-values) distinct sketches — with the exact answer joined
    alongside, so the gate checks the ESTIMATOR itself, not a tolerance.

    KMV is the mergeable-sketch workhorse: per group, keep the k
    smallest hash values of the keys; D̂ = (k-1)/h_(k) (normalized).
    Union sketches merge by taking the k smallest of the concatenation —
    which is why the pairwise overlap (|A|+|B|-|A∪B| by inclusion-
    exclusion) needs only the 5 sketches, not the data.  The md5-derived
    hashes make the sketch — and hence the estimate — deterministic and
    engine-independent, unlike approx_count_distinct's opaque HLL.

    Scale shape: ONE full-data pass (the distinct (type, hash) partial
    aggregation, map-side combined); everything after operates on
    k·|types| rows.  At 100 TB the sketches are what you'd persist and
    merge across daily partitions.
    """
    e = load_table(spark, sf_dir, "events")
    uh = (
        e.select(
            "event_type",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            )
            .cast("bigint")
            .alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    ranked = uh.select(
        "event_type",
        "h",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n_distinct"),
    )
    # The sketch is k·|types| rows derived from the ONE full-data pass;
    # persist it so the est/pair/union branches below reuse it instead
    # of re-deriving each lineage from the events scan (unpersisted,
    # Spark would plan 12+ scans of the fact table — the exact failure
    # mode sketches exist to avoid at 100 TB).
    sk = track(ranked.filter(F.col("rn") <= KMV_K))

    def _estimate(n_col, kth_col):
        return F.when(
            n_col < KMV_K, n_col.cast("double")
        ).otherwise(F.lit((KMV_K - 1) * KMV_SPACE) / kth_col)

    est = sk.groupBy("event_type").agg(
        _estimate(
            F.max("n_distinct"),
            F.max(F.when(F.col("rn") == KMV_K, F.col("h"))),
        ).alias("est_distinct")
    )
    # pairwise union sketches: tiny relations from here on (k·|types| rows)
    ea = est.select(
        F.col("event_type").alias("type_a"), F.col("est_distinct").alias("est_a")
    )
    eb = est.select(
        F.col("event_type").alias("type_b"), F.col("est_distinct").alias("est_b")
    )
    type_pairs = ea.join(eb, F.col("type_a") < F.col("type_b"))
    pair_sk = (
        type_pairs.join(
            sk.select("event_type", "h"),
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .select("type_a", "type_b", "h")
        .distinct()
    )
    wu = Window.partitionBy("type_a", "type_b").orderBy("h")
    union_ranked = pair_sk.select(
        "type_a",
        "type_b",
        "h",
        F.row_number().over(wu).alias("rn"),
        F.count("*")
        .over(Window.partitionBy("type_a", "type_b"))
        .alias("n_union_sk"),
    ).filter(F.col("rn") <= KMV_K)
    union_est = union_ranked.groupBy("type_a", "type_b").agg(
        _estimate(
            F.max("n_union_sk"),
            F.max(F.when(F.col("rn") == KMV_K, F.col("h"))),
        ).alias("est_union")
    )
    # second (inherent) full pass: the exact answer the estimator is
    # checked against; persisted because the self-join consumes it twice
    du = track(e.select("event_type", "user_id").distinct())
    xa = du.select(F.col("event_type").alias("type_a"), "user_id")
    xb = du.select(F.col("event_type").alias("type_b"), "user_id")
    exact = (
        xa.join(xb, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("exact_overlap"))
    )
    return (
        union_est.join(type_pairs, ["type_a", "type_b"])
        .join(exact, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "est_a",
            "est_b",
            "est_union",
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
                "est_overlap"
            ),
            "exact_overlap",
        )
    )


DIFF_CHANGE_MOD = 11  # docs modified between snapshot versions
DIFF_ADD_MOD = 13  # docs present only in v2
DIFF_DROP_MOD = 17  # docs present only in v1


@query(
    "dataset_snapshot_diff",
    oracle=f"""
    WITH v1 AS (
      SELECT doc_id, source, md5(text) AS content_hash
      FROM documents WHERE doc_id % {DIFF_ADD_MOD} <> 0
    ),
    v2 AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % {DIFF_CHANGE_MOD} = 0
                  THEN md5(text || ' edited')
                  ELSE md5(text) END AS content_hash
      FROM documents WHERE doc_id % {DIFF_DROP_MOD} <> 0
    ),
    joined AS (
      SELECT coalesce(v1.source, v2.source) AS source,
             CASE
               WHEN v1.doc_id IS NULL THEN 'added'
               WHEN v2.doc_id IS NULL THEN 'removed'
               WHEN v1.content_hash <> v2.content_hash THEN 'modified'
               ELSE 'unchanged'
             END AS change
      FROM v1 FULL OUTER JOIN v2 USING (doc_id)
    )
    SELECT source, change, COUNT(*) AS n_docs
    FROM joined
    GROUP BY source, change
    ORDER BY source, change
    """,
)
def dataset_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset VERSION auditing: diff two corpus snapshots by content
    hash — added / removed / modified / unchanged counts per source,
    the report every dataset release pipeline publishes between
    versions (and the input to incremental reprocessing decisions:
    only 'added' + 'modified' need re-embedding/re-deduping).

    The two versions are derived deterministically from the one
    corpus on both engines (v1 drops doc_id % {DIFF_ADD_MOD} = 0 —
    those become 'added'; v2 drops % {DIFF_DROP_MOD} = 0 — 'removed';
    % {DIFF_CHANGE_MOD} = 0 texts are edited in v2 — 'modified');
    the operator under test is the hash-project → full-outer-join →
    classify → aggregate pipeline.

    Scale shape: both sides project to (doc_id, source, 32-byte hash)
    BEFORE the join, so the shuffle moves hashes, never text; the
    full-outer join is doc_id-partitioned on both sides (one logical
    shuffle key) and the classification is codegen'd CASE logic.
    At 100 TB the hash projection reads columnar text once and the
    diff itself is hash-sized."""
    d = load_table(spark, sf_dir, "documents")
    v1 = d.filter(F.col("doc_id") % DIFF_ADD_MOD != 0).select(
        "doc_id", "source", F.md5("text").alias("content_hash")
    )
    v2 = d.filter(F.col("doc_id") % DIFF_DROP_MOD != 0).select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % DIFF_CHANGE_MOD == 0,
            F.md5(F.concat(F.col("text"), F.lit(" edited"))),
        )
        .otherwise(F.md5("text"))
        .alias("content_hash"),
    )
    joined = v1.alias("a").join(
        v2.alias("b"), on="doc_id", how="full_outer"
    )
    change = (
        F.when(F.col("a.source").isNull(), "added")
        .when(F.col("b.source").isNull(), "removed")
        .when(F.col("a.content_hash") != F.col("b.content_hash"), "modified")
        .otherwise("unchanged")
    )
    return (
        joined.select(
            F.coalesce("a.source", "b.source").alias("source"),
            change.alias("change"),
        )
        .groupBy("source", "change")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source", "change")
    )


@query(
    "dedup_minhash_incremental",
    oracle=f"""
    WITH {_SHINGLE_SQL},
    {_MH_MD5_BANDS_SQL},
    nb AS (
      SELECT * FROM bands
      WHERE substr(md5(doc_id::VARCHAR), 1, 4) < '{NEW_BATCH_HEX}'
    ),
    obc AS MATERIALIZED (
      SELECT doc_id, band, sig FROM (
        SELECT doc_id, band, sig,
               ROW_NUMBER() OVER (PARTITION BY band, sig ORDER BY doc_id)
                 AS rn
        FROM bands
        WHERE substr(md5(doc_id::VARCHAR), 1, 4) >= '{NEW_BATCH_HEX}'
      ) WHERE rn <= {HOT_BUCKET_CAP}
    ),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS corpus_id
      FROM nb n JOIN obc o ON n.band = o.band AND n.sig = o.sig
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
    verified AS (
      SELECT c.new_id, c.corpus_id, COUNT(*) AS n_common
      FROM cand c
      JOIN ex e1 ON e1.doc_id = c.new_id
      JOIN ex e2 ON e2.doc_id = c.corpus_id AND e2.shingle = e1.shingle
      GROUP BY 1, 2
    )
    SELECT v.new_id, v.corpus_id, v.n_common,
           CAST(v.n_common AS DOUBLE) / (s1.n + s2.n - v.n_common)
             AS jaccard
    FROM verified v
    JOIN sizes s1 ON s1.doc_id = v.new_id
    JOIN sizes s2 ON s2.doc_id = v.corpus_id
    WHERE CAST(v.n_common AS DOUBLE) / (s1.n + s2.n - v.n_common)
          >= {MH_MD5_VERIFY}
    """,
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup via MinHash LSH: the NEW batch (~10% of
    docs, md5 split) banded and probed against the STANDING corpus's
    band index — the maintenance mode of dedup_minhash, completing the
    incremental family next to dedup_incremental (whose candidate
    generation is the exact inverted-shingle join; this one scales by
    LSH banding instead).

    Scale shape: the batch's band signatures are a bounded relation
    (Catalyst broadcasts them), so the standing index contributes only
    the buckets the batch actually probes — no corpus self-join
    anywhere.  The corpus side of each bucket is CAPPED at the
    HOT_BUCKET_CAP smallest doc_ids (deterministic, oracle-replicated):
    a new document landing in a boilerplate bucket of 100k re-crawls
    still surfaces as a duplicate (it pairs with the bucket's stable
    representatives) while per-probe fan-out stays bounded.
    Verification is exact Jaccard against the DF-capped shingle index,
    same threshold as the from-scratch md5 twin; the whole pipeline —
    signatures, band split, bucket cap, candidate set, verification —
    is replicated by the DuckDB oracle, so this 'approximate
    incremental' lane is value-exact at the gate."""
    from reindexer_spark.operators.dedup import _md5_shingle_bands

    ex, bands = _md5_shingle_bands(spark, sf_dir)
    is_new = _batch_hash("doc_id") < F.lit(NEW_BATCH_HEX)
    nb = bands.filter(is_new)
    ob = bands.filter(~is_new)
    w = Window.partitionBy("band", "sig").orderBy("doc_id")
    obc = (
        ob.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= HOT_BUCKET_CAP)
        .drop("rn")
    )
    cand = (
        nb.select("band", "sig", F.col("doc_id").alias("new_id"))
        .join(
            obc.select("band", "sig", F.col("doc_id").alias("corpus_id")),
            ["band", "sig"],
        )
        .select("new_id", "corpus_id")
        .distinct()
    )
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n"))
    e1 = ex.select(F.col("doc_id").alias("new_id"), F.col("gram").alias("g1"))
    e2 = ex.select(
        F.col("doc_id").alias("corpus_id"), F.col("gram").alias("g2")
    )
    verified = (
        cand.join(e1, "new_id")
        .join(
            e2,
            (cand.corpus_id == e2.corpus_id) & (F.col("g1") == F.col("g2")),
        )
        .groupBy(cand.new_id, cand.corpus_id)
        .agg(F.count("*").alias("n_common"))
    )
    # batch-bounded broadcast: filter sizes to the batch BEFORE the
    # hint (the full per-doc relation is not broadcastable at corpus
    # scale — same fix as dedup_incremental)
    s1 = sizes.filter(is_new).select(
        F.col("doc_id").alias("new_id"), F.col("n").alias("n1")
    )
    s2 = sizes.select(
        F.col("doc_id").alias("corpus_id"), F.col("n").alias("n2")
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("n_common")
    )
    return (
        verified.join(F.broadcast(s1), "new_id")  # batch-bounded side
        .join(s2, "corpus_id")  # per-corpus-doc: AQE decides, no hint
        .select("new_id", "corpus_id", "n_common", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= MH_MD5_VERIFY)
    )
