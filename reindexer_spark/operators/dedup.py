"""Tier C9 + north-star — the deduplication family over ``documents``.

Five strategies, cheapest to richest:

- exact (group-by full text)           → dedup_exact
- exact by content hash (sha256)       → dedup_exact_hash
- n-gram Jaccard via inverted index    → dedup_ngram_jaccard (exact near-dup)
- MinHash + LSH banding                → dedup_minhash (approximate; rows-only check;
                                         value-exact md5 twin: dedup_minhash_md5)
- SimHash (hamming on 64-bit sketches) → dedup_simhash (approximate; rows-only check;
                                         value-exact md5 twin: dedup_simhash_md5)

Scale design: the exact variants are single-shuffle hash aggregations on
the hash of the text (never shuffle the full text — shuffle the 32-byte
digest).  The near-dup variants all follow the inverted-index shape:
explode features, join on the feature, aggregate pair counts.  The
document-frequency cap (DF_CAP) bounds the worst-case join fan-out: a
feature appearing in k docs produces k² candidate pairs, so hot features
(boilerplate) are dropped on BOTH sides — the standard trick that keeps
MinHash/Jaccard jobs alive at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reindexer_spark.cache import track, untrack
from reindexer_spark.catalog import load_table
from reindexer_spark.operators.banding import (
    banded_pairs,
    banded_pairs_sql,
    bstat_sql,
)
from reindexer_spark.registry import query

SHINGLE_K = 3  # word n-gram width
JACCARD_THRESHOLD = 0.8
# the threshold as an exact rational, for integer prefix-length
# arithmetic (float ceil(0.8*n) is off-by-one at multiples of 5)
JACCARD_NUM, JACCARD_DEN = 4, 5
assert JACCARD_NUM / JACCARD_DEN == JACCARD_THRESHOLD
DF_CAP = 1000  # drop shingles occurring in more docs than this

# MinHash parameters: 32 hashes in 8 bands of 4 rows.
MINHASH_PERMS = 32
MINHASH_BANDS = 8
MINHASH_ROWS = MINHASH_PERMS // MINHASH_BANDS


def word_shingles(toks_col, k: int = SHINGLE_K):
    """Distinct word k-gram shingles from a MATERIALIZED token-array
    column (codegen'd; no UDF).

    Takes a column reference, not an expression: passing ``split(text)``
    directly would inline the split into every ``element_at`` call inside
    the lambda — O(k·len) re-tokenizations per document (measured 5×
    slowdown).  Returns an empty array for texts shorter than k words
    (guards the descending-sequence pitfall of F.sequence).
    """
    n = F.size(toks_col)
    idx = F.sequence(F.lit(1), n - (k - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks_col, i + j) for j in range(k)]
        ),
    )
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shingle_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh) exploded inverted index with the DF cap applied.

    Shingles are carried as their ``xxhash64`` (8-byte longs), never as
    gram strings: every consumer (pair generation, MinHash signatures,
    verification joins) only equi-joins or counts them, so the cached
    index, the DF-cap aggregation, and every downstream shuffle move
    fixed-width longs instead of ~20-40-byte strings (collision odds
    ~1e-10 at this scale — the same trade _pairs_by_shingle already
    documented).

    The raw index is persisted BEFORE the document-frequency cap: the
    cap's hot-list aggregation and the anti-join both consume it, and
    every downstream user (sizes, pair generation, verification) walks
    the result 2-4 more times — without the persist the explode would
    re-run for each.  At cluster scale this is the
    materialize-the-feature-table step of any dedup pipeline.
    """
    d = load_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split("text", " ")
    )
    raw = track(
        d.select(
            "doc_id", F.explode(word_shingles(F.col("toks"))).alias("gram")
        ).select("doc_id", F.xxhash64("gram").alias("sh"))
    )
    hot = (
        raw.groupBy("sh")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > DF_CAP)
        .select("sh")
    )
    return raw.join(F.broadcast(hot), "sh", "left_anti")


def _pairs_by_shingle(ex: DataFrame, sizes: DataFrame, threshold: float) -> DataFrame:
    """Candidate pair counts |S1 ∩ S2| via group-and-combine.

    Instead of the textbook inverted-index SELF-JOIN (shuffles the index
    twice, then shuffles the join output), group once per shingle,
    collect the (sorted) doc list, and emit the i<j combinations with
    array algebra — one wide shuffle + one pair-count shuffle.  The DF
    cap bounds each list, so the per-group combination fan-out is
    ≤ DF_CAP²/2 by construction.  Shingles travel as xxhash64 ints, not
    strings (8-byte shuffle keys; collision odds ~1e-10 at this scale).

    Lossless size-ratio prune: jaccard = |∩|/|∪| ≤ min(n1,n2)/max(n1,n2),
    so pairs whose set sizes differ by more than the threshold ratio are
    dropped BEFORE the pair shuffle — they cannot reach the threshold.
    This is the length-filter from the set-similarity-join literature and
    typically cuts the shuffled pair volume several-fold.

    Output: (d1, d2, n1, n2, n_common) — sizes ride along so the caller
    needs no further joins.
    """
    # no broadcast HINT on the per-doc sizes relation: at billions of
    # docs it is not broadcastable; AQE picks broadcast when it fits
    # (it always does at test scale, so local plans are unchanged)
    hashed = ex.join(sizes, "doc_id").select(
        "sh",
        F.struct(F.col("doc_id").alias("d"), F.col("n")).alias("dn"),
    )
    grouped = (
        hashed.groupBy("sh")
        .agg(F.sort_array(F.collect_list("dn")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    pair_structs = F.filter(
        F.flatten(
            F.transform(
                F.col("ds"),
                lambda x, i: F.transform(
                    F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                    lambda y: F.struct(
                        x["d"].alias("d1"),
                        y["d"].alias("d2"),
                        x["n"].alias("n1"),
                        y["n"].alias("n2"),
                    ),
                ),
            )
        ),
        lambda p: F.least(p["n1"], p["n2"])
        >= F.lit(threshold) * F.greatest(p["n1"], p["n2"]),
    )
    return (
        grouped.select(F.explode(pair_structs).alias("p"))
        .groupBy(
            F.col("p.d1").alias("d1"),
            F.col("p.d2").alias("d2"),
            F.col("p.n1").alias("n1"),
            F.col("p.n2").alias("n2"),
        )
        .agg(F.count("*").alias("n_common"))
    )


_SHINGLE_SQL = f"""
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(t) - {SHINGLE_K - 2}),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      WHERE len(t) >= {SHINGLE_K}
    ),
    ex_all AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    hot AS (
      SELECT shingle FROM ex_all GROUP BY shingle HAVING COUNT(*) > {DF_CAP}
    ),
    ex AS (
      SELECT * FROM ex_all WHERE shingle NOT IN (SELECT shingle FROM hot)
    )
"""


@query(
    "dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies,
           MIN(n_chars) AS n_chars
    FROM documents
    GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one keeper (min doc_id) per distinct text."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("keeper_id"),
        F.count("*").alias("n_copies"),
        F.min("n_chars").alias("n_chars"),
    ).drop("text")


@query(
    "dedup_exact_hash",
    oracle="""
    SELECT sha256(text) AS content_hash,
           MIN(doc_id) AS keeper_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY sha256(text)
    """,
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keyed on sha256(text): at 100 TB the shuffle moves
    32-byte digests, not document bodies — same answer, ~100× less
    shuffle I/O for long documents."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.sha2("text", 256).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies"))
    )


# One oracle for BOTH exact near-dup lanes (all-shingles baseline and
# the prefix-filtered scale path): identical declared semantics, so the
# prefix filter's losslessness is gate-checked every round.
_NGRAM_JACCARD_ORACLE = f"""
    WITH {_SHINGLE_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT d1, d2, n_common,
           CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common) AS jaccard
    FROM pairs
    JOIN sizes s1 ON s1.doc_id = d1
    JOIN sizes s2 ON s2.doc_id = d2
    WHERE CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common) >= {JACCARD_THRESHOLD}
    """


@query("dedup_ngram_jaccard", oracle=_NGRAM_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-duplicate pairs by word-3-gram Jaccard ≥ 0.8 via the
    inverted index, pair counts generated group-wise (_pairs_by_shingle)
    rather than by self-join.  The pair aggregation shuffles on (d1, d2)
    — both keys high-cardinality, so no skew.

    VALIDATION-ONLY at scale (round-8 sweep: wall ×15.5 / shuffle ×89.5
    at 10× on a dense corpus — candidate pairs under the absolute
    DF_CAP grow quadratically while every shingle's df is still below
    the cap).  This lane is the trusted all-shingles baseline the
    others are checked against; ``dedup_ngram_prefix`` (same answer,
    prefix-filtered candidates) is the exact lane that scales on
    NATURAL zipf-DF corpora, and ``dedup_minhash`` is the approximate
    headline lane.  Excluded from bench HEADLINE and the scale claims
    accordingly."""
    ex = shingle_table(spark, sf_dir)
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n"))
    pairs = _pairs_by_shingle(ex, sizes, JACCARD_THRESHOLD)
    jac = F.col("n_common").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("n_common")
    )
    return pairs.select(
        "d1", "d2", "n_common", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)


@query("dedup_ngram_prefix", oracle=_NGRAM_JACCARD_ORACLE)
def dedup_ngram_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs (identical answer and oracle to
    ``dedup_ngram_jaccard``) with PPJoin-style PREFIX FILTERING — the
    round-9 remediation of the round-8 sweep's one superlinear lane.

    Prefix principle (set-similarity-join literature — Chaudhuri et al.
    ICDE'06 primitive, Xiao et al. WWW'08 PPJoin): order every doc's
    shingles by a global rank (ascending document frequency, ties by
    shingle hash — rarest first); if jaccard(A,B) ≥ t, then A and B
    must collide within their first ``|S| - ceil(t·|S|) + 1`` shingles
    (≈ the rarest 20% + 1 at t = 0.8).  So the candidate join runs on a
    ~5× smaller index whose entries are biased to RARE shingles.
    Candidates are then verified with the true intersection against the
    full index.  Measured (SCALE_PROOF): ~linear on natural zipf-DF
    corpora (wall ×1.79 at 10× docs, vs ×14.2 for the all-shingles
    lane) — the regime real text lives in.  On the adversarial dense
    corpus, where EVERY shingle is common, prefixes stay hot and any
    exact pair counter is candidate-quadratic (this lane still shuffles
    3× fewer records there); both exact lanes are therefore
    validation-only at scale and ``dedup_minhash`` is the headline.

    Prefix length uses exact integer arithmetic (ceil(4n/5) as
    ``(4n+4) div 5``): float 0.8·n overshoots at n divisible by 5,
    which would shorten the prefix and silently drop true pairs.

    Shape at 100 TB: df rank join + one window shuffle by doc_id for
    the prefix cut, pair generation on the pruned index
    (_pairs_by_shingle: group-and-combine, size-ratio prune), then a
    verification join of the (few) candidates against the full index.
    Every shuffle key is either the 8-byte shingle hash or doc ids."""
    ex = shingle_table(spark, sf_dir)
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n"))
    df_rank = ex.groupBy("sh").agg(F.count("*").alias("df"))
    p = F.expr(
        f"n - (({JACCARD_NUM} * n + {JACCARD_DEN - 1}) div {JACCARD_DEN}) + 1"
    )
    wdoc = Window.partitionBy("doc_id")
    worder = Window.partitionBy("doc_id").orderBy("df", "sh")
    prefix = (
        ex.join(df_rank, "sh")
        .withColumn("n", F.count("*").over(wdoc))
        .withColumn("pos", F.row_number().over(worder))
        .filter(F.col("pos") <= p)
        .select("doc_id", "sh")
    )
    cand = _pairs_by_shingle(prefix, sizes, JACCARD_THRESHOLD).select(
        "d1", "d2", "n1", "n2"
    )
    inter = (
        cand.join(ex.alias("e1"), F.col("d1") == F.col("e1.doc_id"))
        .join(
            ex.alias("e2"),
            (F.col("d2") == F.col("e2.doc_id"))
            & (F.col("e1.sh") == F.col("e2.sh")),
        )
        .groupBy("d1", "d2", "n1", "n2")
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("n_common")
    )
    return inter.select(
        "d1", "d2", "n_common", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)


def minhash_bands(ex: DataFrame) -> DataFrame:
    """(doc_id, sh) shingle relation → (doc_id, band_id, band_hash) LSH
    band relation: 32 xxhash64 minhashes in 8 bands of 4.  Split out of
    dedup_minhash so scale_proof.py's boilerplate leg can measure the
    band join's candidate volume (guard on vs off) in isolation."""
    # Rendered as SQL text (optimization r17, the r16 simhash/LSH
    # trick): the 32 hash columns + 32 MIN aggs + 8-band pack built as
    # F.* expression objects cost ~1 s of Py4J round-trips per call;
    # F.expr/selectExpr parse the identical Catalyst trees JVM-side.
    hashed = ex.selectExpr(
        "doc_id",
        "sh",
        *[f"xxhash64(sh, {i}) AS h{i}" for i in range(MINHASH_PERMS)],
    )
    sig = hashed.groupBy("doc_id").agg(
        *[F.expr(f"MIN(h{i}) AS mh{i}") for i in range(MINHASH_PERMS)],
    )
    # Bands: hash 4 consecutive minhashes together.
    band_arr = ", ".join(
        "xxhash64("
        + ", ".join(
            f"mh{b * MINHASH_ROWS + r}" for r in range(MINHASH_ROWS)
        )
        + ")"
        for b in range(MINHASH_BANDS)
    )
    return sig.select(
        "doc_id",
        F.expr(f"posexplode(array({band_arr}))").alias(
            "band_id", "band_hash"
        ),
    )


@query("dedup_minhash")  # approximate → rows-only check (no SQL oracle)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup candidates, verified by true Jaccard.

    Pipeline: shingle → 32 minhashes (xxhash64 over the 8-byte shingle
    hash + permutation index — fixed-width input, no per-permutation
    string concat; multiply-add permutations would be cheaper still but
    overflow under ANSI mode) → 8 bands of 4 → hot-bucket-guarded band
    join on (band_id, band_hash) (banding.banded_pairs: all-pairs in
    buckets ≤ HOT_BUCKET_CAP, min-id star pairs above — a boilerplate
    bucket of k near-identical docs emits k-1 candidates, not k²/2) →
    exact Jaccard verification of the candidates only.  At 100 TB the
    band join replaces the quadratic shingle self-join with an equality
    join whose fan-out is controlled by the band width AND the bucket
    cap; this is the scale path, dedup_ngram_jaccard is the exact
    baseline it is validated against (see tests; candidate-volume
    growth measured in scale_proof.py's boilerplate leg).

    Hot-bucket recall contract (round-11, per review): above the cap
    the guard's plain min-id star preserves connectivity at the
    CANDIDATE level only.  Exact-Jaccard verification (≥ 0.5) can
    reject both (rep, m1) and (rep, m2) where (m1, m2) would have
    passed, so a >cap bucket can lose true pairs post-verification and
    fragment clusters — the deliberate trade: grouping by the full
    signature instead (sig_cols) would turn a boilerplate bucket of k
    near-identical-but-not-identical pages (distinct full sketches)
    back into ~k²/2 representative pairs, undoing the guard exactly
    where it matters (SCALE_PROOF boilerplate leg: ×101.8 unguarded vs
    ×0.62 guarded).  Band equality of 4 minhashes is strong evidence of
    high Jaccard, not a guarantee; banding.py's star-equivalence proof
    covers sketch-verified lanes (simhash/phash), not this exact-verify
    lane.
    """
    ex = shingle_table(spark, sf_dir)
    cand = banded_pairs(
        minhash_bands(ex), ("band_id", "band_hash"), "doc_id"
    )
    # Verify candidates with true Jaccard.  Optimization r17 (§2.4 —
    # fold exchanges): ONE groupBy builds the per-doc shingle-hash SET
    # (sorted array) with its size riding along, replacing the old
    # four-relation verify (sizes groupBy + two shuffles of the full
    # inverted index through the e1/e2 equi-joins + a pair groupBy +
    # two sizes joins).  |S1 ∩ S2| over per-doc-distinct hash sets is
    # exactly the old join-count: size(array_intersect) on distinct
    # arrays.  A collision-only candidate pair (n_common = 0) fell out
    # of the old inner join; here it scores jaccard 0.0 and dies at
    # the ≥ {JACCARD_THRESHOLD} filter — same output either way.
    docsets = track(
        ex.groupBy("doc_id").agg(
            F.sort_array(F.collect_list("sh")).alias("shs"),
            F.count("*").alias("n"),
        )
    )
    paired = (
        cand.join(
            docsets.select(
                F.col("doc_id").alias("d1"),
                F.col("shs").alias("shs1"),
                F.col("n").alias("n1"),
            ),
            "d1",
        )
        .join(
            docsets.select(
                F.col("doc_id").alias("d2"),
                F.col("shs").alias("shs2"),
                F.col("n").alias("n2"),
            ),
            "d2",
        )
        .withColumn(
            "n_common", F.size(F.array_intersect("shs1", "shs2")).cast("bigint")
        )
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("n_common")
    )
    return paired.select(
        "d1", "d2", "n_common", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)


SIMHASH_HAMMING = 6
SIMHASH_BANDS = 8  # 8x8-bit bands: shared band GUARANTEED at hamming <= 7
SIMHASH_BAND_BITS = 64 // SIMHASH_BANDS


def simhash_sketches(d: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, simhash): 64-bit sign-of-vote sketch
    over xxhash64 token hashes, pure column algebra (explode tokens →
    per-bit ±1 contributions → sum → sign bits packed by shifted adds).
    Exposed so the recall-bound test (tests/test_approx_bounds.py) can
    brute-force the exact hamming relation over the SAME sketches the
    production query bands."""
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    # Per-bit vote: +1 if bit set else -1; sum over tokens; bit = vote > 0.
    # Rendered as SQL text (optimization r16) — the 64-agg F.when forest
    # cost ~1-2 s of Py4J construction per call; same Catalyst trees.
    votes = toks.groupBy("doc_id").agg(
        *[
            F.expr(
                f"SUM(CASE WHEN (h & SHIFTLEFT(CAST(1 AS BIGINT), {i}))"
                f" != 0 THEN 1 ELSE -1 END) AS v{i}"
            )
            for i in range(64)
        ]
    )
    pack = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN SHIFTLEFT(CAST(1 AS BIGINT), {i})"
        f" ELSE CAST(0 AS BIGINT) END)"
        for i in range(64)
    )
    return votes.select(
        "doc_id",
        F.expr(f"CAST(0 AS BIGINT) + {pack}").alias("simhash"),
    )


@query("dedup_simhash")  # approximate → rows-only check (no SQL oracle)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 64-bit sketch per doc (sign of per-bit sums of
    token hashes), candidates = equal 8-bit band, verified by exact
    hamming distance ≤ 6.  With 8 bands of 8 bits, pigeonhole
    guarantees a shared band for every pair at hamming ≤ 7, so the ≤ 6
    filter never loses a pair to banding — recall 1.0 by construction
    (asserted against the exact hamming relation in
    tests/test_approx_bounds.py).  The value-exact md5 twin below
    (dedup_simhash_md5) gates this shared pipeline shape against the
    DuckDB oracle.

    Band width is the recall/cost dial: b-bit bands spread N sketches
    over 2^b buckets, so expected candidate pairs grow as
    bands · N²/2^b.  8-bit bands buy the hamming ≤ 7 guarantee at the
    price of 256× more candidates than 16-bit bands; candidates are
    verified by one xor+bit_count each (cheap), while a missed
    near-duplicate is unrecoverable — the right trade until N makes
    the candidate join itself the bottleneck, at which point widen the
    bands and either tighten the filter to bands-1 or accept
    best-effort recall above it (document whichever you choose)."""
    d = load_table(spark, sf_dir, "documents")
    # tracked: the sketch relation is read again to re-attach simhash
    # values to the guarded candidate pairs (64-vote aggregation is the
    # expensive half — never recompute it per join side)
    fingerprint = track(simhash_sketches(d))
    chunks = fingerprint.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(
                        F.col("simhash"), SIMHASH_BAND_BITS * c
                    ).bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
                    for c in range(SIMHASH_BANDS)
                ]
            )
        ).alias("chunk_id", "chunk_val"),
    )
    cand = (
        banded_pairs(
            chunks, ("chunk_id", "chunk_val"), "doc_id",
            sig_cols=("simhash",),
        )
        .join(
            fingerprint.select(
                F.col("doc_id").alias("d1"), F.col("simhash").alias("sh1")
            ),
            "d1",
        )
        .join(
            fingerprint.select(
                F.col("doc_id").alias("d2"), F.col("simhash").alias("sh2")
            ),
            "d2",
        )
    )
    hamming = F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2")))
    return cand.select("d1", "d2", hamming.alias("hamming")).filter(
        F.col("hamming") <= SIMHASH_HAMMING
    )


# Span-level exact duplication (Lee et al., "Deduplicating Training
# Data Makes Language Models Better", 2021: the exact-substring signal).
# Document-level dedup misses boilerplate/quotes REPEATED ACROSS many
# otherwise-distinct documents; the span relation surfaces exactly those.
SPAN_K = 8  # tokens per span — long enough that sharing is never chance
SPAN_TOP = 100


@query(
    "dedup_shared_spans",
    oracle=f"""
    WITH sp AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(t) - {SPAN_K - 2}),
               i -> array_to_string(list_slice(t, i, i + {SPAN_K - 1}), ' ')))
               AS spans
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      WHERE len(t) >= {SPAN_K}
    ),
    ex AS (SELECT doc_id, unnest(spans) AS span FROM sp),
    agg AS (
      SELECT span, COUNT(*) AS n_docs,
             MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      FROM ex GROUP BY span HAVING COUNT(*) >= 2
    )
    SELECT span, n_docs, first_doc, last_doc
    FROM agg
    ORDER BY n_docs DESC, span
    LIMIT {SPAN_TOP}
    """,
)
def dedup_shared_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication at span granularity: every 8-token
    span occurring in >= 2 documents, ranked by document frequency —
    the signal behind suffix-array substring dedup (Lee et al. 2021),
    approximated at fixed span width so it stays one aggregation
    instead of a suffix-array build.  Catches cross-document
    boilerplate (license headers, templates, quoted passages) that
    document-level Jaccard/MinHash cannot see when the surrounding
    text differs.

    Scale shape: spans are per-doc distinct (array_distinct before the
    explode), so the shuffle carries |docs| x |distinct spans/doc| rows
    once, aggregated by span with map-side partial counts; the top-K
    ordering runs on the >= 2-doc survivors only (a tiny fraction —
    chance span collisions are ~0 at 8 tokens).  At 100 TB the span
    STRING would be replaced by xxhash64(span) for the shuffle with the
    text recovered via a second semi-join pass; the string form here
    keeps the oracle value-exact."""
    d = (
        load_table(spark, sf_dir, "documents")
        .withColumn("t", F.split("text", " "))
        .filter(F.size("t") >= SPAN_K)
    )
    ex = d.select(
        "doc_id", F.explode(word_shingles(F.col("t"), SPAN_K)).alias("span")
    )
    agg = (
        ex.groupBy("span")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    return agg.orderBy(F.desc("n_docs"), "span").limit(SPAN_TOP)


# Variable-length shared runs: chain overlapping fixed-width spans into
# MAXIMAL shared substrings — the actual Lee et al. exact-substring
# signal (dedup_shared_spans reports fixed-width fragments; a 50-token
# shared passage is one row here, 43 rows there).  DF cap bounds the
# pairwise match relation the way the Jaccard inverted index does.
RUN_DF_CAP = 20
RUN_TOP = 100


@query(
    "dedup_shared_runs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sp AS (
      SELECT doc_id, CAST(pos - 1 AS BIGINT) AS pos,
             array_to_string(list_slice(t, pos, pos + {SPAN_K - 1}), ' ')
               AS span
      FROM t, UNNEST(range(1, len(t) - {SPAN_K - 2})) AS u(pos)
    ),
    df AS (
      SELECT span FROM sp GROUP BY span
      HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {RUN_DF_CAP}
    ),
    m AS (
      SELECT x.doc_id AS d1, x.pos AS p1, y.doc_id AS d2, y.pos AS p2
      FROM sp x JOIN df USING (span) JOIN sp y USING (span)
      WHERE x.doc_id < y.doc_id
    ),
    runs AS (
      SELECT d1, d2, p1 - p2 AS diag, p1, p2,
             p1 - ROW_NUMBER() OVER (
               PARTITION BY d1, d2, p1 - p2 ORDER BY p1
             ) AS grp
      FROM m
    ),
    agg AS (
      SELECT d1, d2, MIN(p1) AS start1, MIN(p2) AS start2,
             COUNT(*) AS run_spans,
             COUNT(*) + {SPAN_K - 1} AS run_tokens
      FROM runs GROUP BY d1, d2, diag, grp
      HAVING COUNT(*) >= 2
    )
    SELECT d1, d2, start1, start2, run_spans, run_tokens
    FROM agg
    ORDER BY run_tokens DESC, d1, d2, start1, start2
    LIMIT {RUN_TOP}
    """,
)
def dedup_shared_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal shared token runs between document pairs: positional
    8-token spans matched across documents are chained along each
    pair's alignment diagonal (p1 - p2 constant) into maximal
    consecutive runs via the islands trick (offset minus rank is
    constant within a run), so a shared 50-token passage reports once
    with run_tokens = 50 instead of as 43 fragments.  run_tokens =
    run_spans + 7 because adjacent spans overlap by 7 tokens.

    Scale shape: the pairwise match relation is the only quadratic
    risk, and it is bounded the same way the Jaccard inverted index
    is — spans with document frequency > {RUN_DF_CAP} are dropped
    before the self-join (mega-boilerplate is already surfaced
    per-span by dedup_shared_spans; pairwise ALIGNMENT of it is not
    actionable), so per-span fan-out is <= DF_CAP². Downstream of the
    match, everything is one window (hash-partitioned by pair+diagonal)
    and one aggregation; the final top-K is TakeOrderedAndProject."""
    d = (
        load_table(spark, sf_dir, "documents")
        .withColumn("t", F.split("text", " "))
        .filter(F.size("t") >= SPAN_K)
    )
    # positional spans (no array_distinct — offsets matter here)
    idx = F.sequence(F.lit(1), F.size("t") - (SPAN_K - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("t"), i + j) for j in range(SPAN_K)]
        ),
    )
    sp = d.select(
        "doc_id", F.posexplode(grams).alias("pos", "span")
    ).withColumn("pos", F.col("pos").cast("bigint"))
    eligible = (
        sp.groupBy("span")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= RUN_DF_CAP))
        .select("span")
    )
    spe = sp.join(eligible, "span")
    m = (
        spe.alias("x")
        .join(
            spe.alias("y"),
            (F.col("x.span") == F.col("y.span"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("d1"),
            F.col("x.pos").alias("p1"),
            F.col("y.doc_id").alias("d2"),
            F.col("y.pos").alias("p2"),
        )
    )
    from pyspark.sql import Window

    runs = m.withColumn("diag", F.col("p1") - F.col("p2")).withColumn(
        "grp",
        F.col("p1")
        - F.row_number().over(
            Window.partitionBy("d1", "d2", "diag").orderBy("p1")
        ),
    )
    agg = (
        runs.groupBy("d1", "d2", "diag", "grp")
        .agg(
            F.min("p1").alias("start1"),
            F.min("p2").alias("start2"),
            F.count("*").alias("run_spans"),
        )
        .filter(F.col("run_spans") >= 2)
        .select(
            "d1",
            "d2",
            "start1",
            "start2",
            "run_spans",
            (F.col("run_spans") + (SPAN_K - 1)).alias("run_tokens"),
        )
    )
    return agg.orderBy(
        F.desc("run_tokens"), "d1", "d2", "start1", "start2"
    ).limit(RUN_TOP)


# md5-twin SimHash: same pipeline as dedup_simhash but every bit is
# derived from md5(token), the one hash both engines share, so the
# DuckDB oracle replicates the 64-bit sketches, the 8x8-bit band split,
# and the exact candidate set — upgrading SimHash candidate generation
# from rows-only to value-exact (the dedup_minhash_md5 pattern).  The
# 64-bit sketch is carried as two NON-NEGATIVE 32-bit halves (lo/hi)
# end-to-end: a packed 64-bit long with the sign bit set cannot be
# parsed from hex portably across engines, two uint32-in-bigint halves
# can.  Hamming distance = bit_count(xor(lo)) + bit_count(xor(hi)).
SIMHASH_MD5_HAMMING = 6


@query(
    "dedup_simhash_md5",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, tok
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents)
    ),
    h AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hlo,
             ('0x' || substr(md5(tok), 9, 8))::BIGINT AS hhi
      FROM toks
    ),
    votes AS (
      SELECT doc_id, i,
             SUM(CASE WHEN i < 32
                      THEN CASE WHEN (hlo >> i) & 1 = 1 THEN 1 ELSE -1 END
                      ELSE CASE WHEN (hhi >> (i - 32)) & 1 = 1
                                THEN 1 ELSE -1 END
                 END) AS v
      FROM h CROSS JOIN range(64) r(i)
      GROUP BY doc_id, i
    ),
    fp AS MATERIALIZED (
      SELECT doc_id,
             SUM(CASE WHEN v > 0 AND i < 32
                      THEN (1::BIGINT << i) ELSE 0 END) AS sh_lo,
             SUM(CASE WHEN v > 0 AND i >= 32
                      THEN (1::BIGINT << (i - 32)) ELSE 0 END) AS sh_hi
      FROM votes GROUP BY doc_id
    ),
    chunks AS (
      SELECT doc_id, sh_lo, sh_hi, c AS chunk_id,
             CASE WHEN c < 4 THEN (sh_lo >> (8 * c)) & 255
                  ELSE (sh_hi >> (8 * (c - 4))) & 255 END AS chunk_val
      FROM fp CROSS JOIN range(8) r(c)
    ),
    bstat AS MATERIALIZED (
      {bstat_sql("chunks", ("chunk_id", "chunk_val"), "doc_id",
                 ("sh_lo", "sh_hi"))}
    ),
    cand AS (
      {banded_pairs_sql("bstat", ("chunk_id", "chunk_val"), "doc_id")}
    )
    SELECT d1, d2,
           (bit_count(xor(f1.sh_lo, f2.sh_lo))
            + bit_count(xor(f1.sh_hi, f2.sh_hi))) AS hamming
    FROM cand
    JOIN fp f1 ON f1.doc_id = d1
    JOIN fp f2 ON f2.doc_id = d2
    WHERE bit_count(xor(f1.sh_lo, f2.sh_lo))
          + bit_count(xor(f1.sh_hi, f2.sh_hi))
          <= {SIMHASH_MD5_HAMMING}
    """,
)
def dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup with md5 token hashes — the ORACLE-CHECKABLE twin
    of dedup_simhash.  Same pipeline (per-bit votes → sign sketch →
    8x8-bit banding → exact hamming verify <= 6); the only change is
    the token hash (md5 halves instead of xxhash64) and carrying the
    sketch as two 32-bit halves so both engines compute identical
    non-negative integers.  dedup_simhash (xxhash64, packed 64-bit long)
    remains the production variant — this twin exists so a wrong band
    split or vote/sign bug in the shared shape cannot ship silently.

    Banding guarantee: 8 bands of 8 bits force a shared band for every
    pair at hamming <= 7 (pigeonhole), so the <= 6 filter's recall is
    1.0 by construction on both lanes; the production lane's recall is
    additionally asserted against the exact hamming relation in
    tests/test_approx_bounds.py."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    dig = toks.select("doc_id", F.md5("tok").alias("dg")).select(
        "doc_id",
        F.conv(F.substring("dg", 1, 8), 16, 10).cast("bigint").alias("hlo"),
        F.conv(F.substring("dg", 9, 8), 16, 10).cast("bigint").alias("hhi"),
    )
    # per-bit vote aggs / sign packing / chunk split rendered as SQL
    # text (optimization r16): the 64×F.sum(F.when(...)) forest plus
    # the two 32-term packers cost ~2 s of Py4J round-trips per call;
    # F.expr parses the identical Catalyst expressions in one JVM call
    # apiece
    votes = dig.groupBy("doc_id").agg(
        *[
            F.expr(
                f"SUM(CASE WHEN (SHIFTRIGHT("
                f"{'hlo' if i < 32 else 'hhi'}, {i % 32}) & 1) = 1 "
                f"THEN 1 ELSE -1 END) AS v{i}"
            )
            for i in range(64)
        ]
    )

    def _pack(base: int) -> str:
        # 0L + CASE ... mirrors the old sum([...], zero) left-fold
        terms = " + ".join(
            f"(CASE WHEN v{base + i} > 0 THEN SHIFTLEFT(1L, {i})"
            f" ELSE CAST(0 AS BIGINT) END)"
            for i in range(32)
        )
        return f"CAST(0 AS BIGINT) + {terms}"

    fingerprint = votes.select(
        "doc_id",
        F.expr(_pack(0)).alias("sh_lo"),
        F.expr(_pack(32)).alias("sh_hi"),
    )
    fingerprint = track(fingerprint)
    chunk_arr = ", ".join(
        [f"SHIFTRIGHT(sh_lo, {8 * i}) & 255" for i in range(4)]
        + [f"SHIFTRIGHT(sh_hi, {8 * i}) & 255" for i in range(4)]
    )
    chunks = fingerprint.select(
        "doc_id",
        "sh_lo",
        "sh_hi",
        F.posexplode(F.expr(f"array({chunk_arr})")).alias(
            "chunk_id", "chunk_val"
        ),
    )
    cand = (
        banded_pairs(
            chunks, ("chunk_id", "chunk_val"), "doc_id",
            sig_cols=("sh_lo", "sh_hi"),
        )
        .join(
            fingerprint.select(
                F.col("doc_id").alias("d1"),
                F.col("sh_lo").alias("lo1"),
                F.col("sh_hi").alias("hi1"),
            ),
            "d1",
        )
        .join(
            fingerprint.select(
                F.col("doc_id").alias("d2"),
                F.col("sh_lo").alias("lo2"),
                F.col("sh_hi").alias("hi2"),
            ),
            "d2",
        )
    )
    hamming = F.bit_count(
        F.col("lo1").bitwiseXOR(F.col("lo2"))
    ) + F.bit_count(F.col("hi1").bitwiseXOR(F.col("hi2")))
    return cand.select("d1", "d2", hamming.alias("hamming")).filter(
        F.col("hamming") <= SIMHASH_MD5_HAMMING
    )


EMBED_NEARDUP_THRESHOLD = 0.4
EMBED_SAMPLE = 1000  # bound the exact pairwise comparison in the oracle


@query(
    "dedup_embedding",
    oracle=f"""
    SELECT a.vec_id AS v1, b.vec_id AS v2,
           list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cosine
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < {EMBED_SAMPLE} AND b.vec_id < {EMBED_SAMPLE}
      AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          >= {EMBED_NEARDUP_THRESHOLD}
    """,
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs over a bounded id range (the exact
    quadratic baseline; the scale path is the LSH bucketing in
    operators.similarity).  Cosine accumulates in DOUBLE in array order →
    bit-identical to the oracle's list_cosine_similarity."""
    from reindexer_spark.functions import cosine_similarity

    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < EMBED_SAMPLE
    )
    a = e.select(
        F.col("vec_id").alias("v1"), F.col("embedding").alias("emb1")
    )
    b = e.select(
        F.col("vec_id").alias("v2"), F.col("embedding").alias("emb2")
    )
    pairs = a.join(b, F.col("v1") < F.col("v2"))
    cos = cosine_similarity(F.col("emb1"), F.col("emb2"))
    return pairs.select("v1", "v2", cos.alias("cosine")).filter(
        F.col("cosine") >= EMBED_NEARDUP_THRESHOLD
    )


# Reuse the exact pair query as the edge list for clustering.
_PAIRS_ORACLE = f"""
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
    pruned AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT d1, d2
      FROM pruned
      JOIN sizes s1 ON s1.doc_id = d1
      JOIN sizes s2 ON s2.doc_id = d2
      WHERE CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common)
            >= {JACCARD_THRESHOLD}
    )
"""


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SHINGLE_SQL},
    {_PAIRS_ORACLE},
    edges AS (
      SELECT d1 AS u, d2 AS v FROM pairs
      UNION
      SELECT d2, d1 FROM pairs
    ),
    reach(u, v) AS (
      SELECT DISTINCT u, u FROM edges
      UNION
      SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u
    )
    SELECT u AS doc_id, MIN(v) AS cluster_id,
           COUNT(*) AS n_reachable
    FROM reach GROUP BY u
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-duplicate pair graph — the
    'which copies form one document family' step after pair finding, and
    the engine's iterative-algorithm surface (SURVEY §2 C14 note).

    Implemented as driver-looped min-label propagation: each iteration
    joins labels across edges and keeps the per-node minimum, stopping
    at a fixpoint.  Iterations = graph diameter (near-dup families are
    tiny, so 2-4 in practice; hard cap 20).  Each step is a broadcast-
    scale join at these cardinalities and a hash-partition join at
    100 TB — the standard large-graph CC recipe (alternating small/large
    star steps are the upgrade path if families ever get deep).

    The oracle is the same computation as a recursive CTE (transitive
    closure + min label), plus n_reachable as a structural cross-check.
    """
    labels = _cluster_labels(spark, sf_dir)
    comp_sizes = labels.groupBy("label").agg(F.count("*").alias("n_reachable"))
    return labels.join(comp_sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        "n_reachable",
    )


def _cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-label-propagation connected components over the exact
    near-dup pair graph; returns (node, label) — shared by
    ``dedup_clusters`` and ``dedup_cluster_representatives``."""
    # Exact near-dup pairs (same plan as dedup_ngram_jaccard).
    ex = shingle_table(spark, sf_dir)
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n"))
    pairs = (
        _pairs_by_shingle(ex, sizes, JACCARD_THRESHOLD)
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("d1", "d2")
    )
    raw_edges = track(
        pairs.union(
            pairs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2"))
        ).distinct()
    )
    # The pair graph is orders of magnitude smaller than the corpus (only
    # docs with a near-dup candidate appear), so the loop's shuffles get a
    # partition count sized to the EDGE count, not the session default —
    # at sf0.01 that is 1 partition instead of 32 tiny ones; at 100 TB the
    # same formula lands in the hundreds.
    n_edges = raw_edges.count()
    parts = max(1, min(200, n_edges // 100_000 + 1))
    edges = track(raw_edges.repartition(parts, "d2"))
    edges.count()  # materialize from the cached raw edges, then drop them
    untrack(raw_edges)
    labels = track(
        edges.select(F.col("d1").alias("node")).distinct().withColumn(
            "label", F.col("node")
        )
    )
    # ``untrack`` matches by object identity, so the handle released each
    # iteration must be the frame that was TRACKED — ``labels`` becomes a
    # derived ``.select`` after the first pass and untracking it would be
    # a silent no-op, leaking up to 20 persisted iterations per query.
    tracked_prev = labels
    for _ in range(20):
        neighbor_min = (
            edges.join(labels, edges.d2 == labels.node)
            .groupBy(F.col("d1").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # Keep old and new label side by side in ONE persisted frame: the
        # convergence count reads it directly instead of re-joining the
        # old labels against the new (one join + one shuffle less per
        # iteration).
        stepped = track(
            labels.join(neighbor_min, labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.col("label").alias("old_label"),
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
        )
        changed = stepped.filter(F.col("label") != F.col("old_label")).count()
        untrack(tracked_prev)  # superseded iteration — release immediately
        tracked_prev = stepped
        labels = stepped.select("node", "label")
        if changed == 0:
            break
    return labels


@query(
    "dedup_cluster_representatives",
    oracle=f"""
    WITH RECURSIVE {_SHINGLE_SQL},
    {_PAIRS_ORACLE},
    edges AS (
      SELECT d1 AS u, d2 AS v FROM pairs
      UNION
      SELECT d2, d1 FROM pairs
    ),
    reach(u, v) AS (
      SELECT DISTINCT u, u FROM edges
      UNION
      SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u
    ),
    comp AS (
      SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u
    ),
    member AS (
      SELECT c.cluster_id, c.doc_id, d.n_chars
      FROM comp c JOIN documents d USING (doc_id)
    ),
    ranked AS (
      SELECT cluster_id, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY n_chars DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY cluster_id) AS n_members,
             SUM(n_chars) OVER (PARTITION BY cluster_id) AS total_chars
      FROM member
    )
    SELECT cluster_id, doc_id AS rep_doc_id,
           CAST(n_members AS BIGINT) AS n_members,
           n_chars AS rep_chars,
           CAST(total_chars AS BIGINT) AS total_chars
    FROM ranked WHERE rn = 1
    """,
)
def dedup_cluster_representatives(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Canonical-document selection — the step AFTER clustering in a
    dedup pipeline: per near-dup family, keep the best document (longest
    text; ties to the smallest doc_id) and report how much the family
    would collapse (members, representative size, total size).

    This is the policy HuggingFace/Gopher-style dedup applies before
    training: one keeper per cluster, everything else dropped.  The
    representative choice is a per-cluster argmax — one window over the
    (tiny) member relation; the cluster labels come from the same
    min-label propagation as ``dedup_clusters`` (shared helper), and the
    document metadata joins in by doc_id (hash join keyed on the
    corpus's primary key — no extra shuffle shape at 100 TB).
    """
    labels = _cluster_labels(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    member = labels.join(docs, labels.node == docs.doc_id).select(
        F.col("label").alias("cluster_id"), "doc_id", "n_chars"
    )
    w = Window.partitionBy("cluster_id")
    ranked = member.select(
        "cluster_id",
        "doc_id",
        "n_chars",
        F.row_number()
        .over(w.orderBy(F.desc("n_chars"), F.asc("doc_id")))
        .alias("rn"),
        F.count("*").over(w).alias("n_members"),
        F.sum("n_chars").over(w).alias("total_chars"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("rep_doc_id"),
        F.col("n_members").cast("bigint").alias("n_members"),
        F.col("n_chars").alias("rep_chars"),
        F.col("total_chars").cast("bigint").alias("total_chars"),
    )


CONTAINMENT_THRESHOLD = 0.9


@query(
    "dedup_containment",
    oracle=f"""
    WITH {_SHINGLE_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT CASE WHEN s1.n <= s2.n THEN d1 ELSE d2 END AS contained_id,
           CASE WHEN s1.n <= s2.n THEN d2 ELSE d1 END AS container_id,
           n_common,
           CAST(n_common AS DOUBLE) / LEAST(s1.n, s2.n) AS containment
    FROM pairs
    JOIN sizes s1 ON s1.doc_id = d1
    JOIN sizes s2 ON s2.doc_id = d2
    WHERE CAST(n_common AS DOUBLE) / LEAST(s1.n, s2.n)
          >= {CONTAINMENT_THRESHOLD}
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup: |A∩B| / min(|A|,|B|) ≥ 0.9 —
    the quote/excerpt/subset detector.  Jaccard misses exactly these
    pairs (a document wholly quoted inside a 10× longer one has Jaccard
    ≈ 0.1), and so does dedup_ngram_jaccard's length-ratio prune, which
    is LOSSLESS only for the symmetric metric.  So the pair generation
    here runs the same group-and-combine inverted-index shape with the
    prune DISABLED (threshold 0.0): the DF cap still bounds the
    per-shingle fan-out, which is what keeps the job alive at 100 TB —
    containment jobs are the reason the cap exists, since boilerplate
    shingles are precisely the ones shared by small-in-big pairs.

    Cost honesty: with the ratio prune off, total pair volume is
    strictly larger than the Jaccard-pruned path — every co-occurring
    pair under the DF cap is aggregated, and only the post-aggregation
    threshold filter discards.  No size-based pre-prune is lossless
    here (containment of a small doc in a huge one is exactly the
    pair a ratio prune would drop), so the cap is the load-bearing
    bound, and a containment pass budgets more shuffle than a Jaccard
    pass over the same corpus — SCALE_PROOF's dedup legs measure the
    delta.

    Output orients each pair as (contained, container) by set size (ties
    → lower doc_id is the contained side, matching the d1<d2 pair
    order)."""
    ex = shingle_table(spark, sf_dir)
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n"))
    pairs = _pairs_by_shingle(ex, sizes, 0.0)
    containment = F.col("n_common").cast("double") / F.least(
        F.col("n1"), F.col("n2")
    )
    small_first = F.col("n1") <= F.col("n2")
    return (
        pairs.select(
            F.when(small_first, F.col("d1")).otherwise(F.col("d2")).alias(
                "contained_id"
            ),
            F.when(small_first, F.col("d2")).otherwise(F.col("d1")).alias(
                "container_id"
            ),
            "n_common",
            containment.alias("containment"),
        )
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
    )


# md5-permutation MinHash: slower than the xxhash64 production variant
# above, but replicable in DuckDB — which upgrades the BANDED CANDIDATE
# GENERATION itself to a value-exact oracle check (the xxhash64 variant
# is rows-only because DuckDB lacks that hash).
MH_MD5_PERMS = 16
MH_MD5_BANDS = 4
MH_MD5_ROWS = MH_MD5_PERMS // MH_MD5_BANDS
MH_MD5_VERIFY = 0.5  # exact-Jaccard verification threshold
# Largest prime below 2^32 — the modulus for Kirsch-Mitzenmacher double
# hashing: perm_i(g) = (h1(g) + i*h2(g)) mod P with h1/h2 the two 32-bit
# halves of ONE md5 digest.  One md5 per gram instead of PERMS md5s over
# decorated strings — severalfold cheaper with identical LSH guarantees
# (Kirsch & Mitzenmacher, "Less Hashing, Same Performance", 2006).
MH_MD5_P = 4294967291


# md5 MinHash band construction as DuckDB CTEs (dig/mh/bands over the
# _SHINGLE_SQL `ex` relation) — ONE text shared by dedup_minhash_md5's
# and dedup_minhash_incremental's oracles so they cannot drift.
_MH_MD5_BANDS_SQL = f"""
    dig AS (
      SELECT doc_id,
             ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h1,
             ('0x' || substr(md5(shingle), 9, 8))::BIGINT AS h2
      FROM ex
    ),
    mh AS (
      SELECT doc_id, i, MIN((h1 + i * h2) % {MH_MD5_P}) AS mhv
      FROM dig CROSS JOIN range({MH_MD5_PERMS}) r(i)
      GROUP BY doc_id, i
    ),
    bands AS (
      SELECT doc_id, i // {MH_MD5_ROWS} AS band,
             string_agg(mhv::VARCHAR, ':' ORDER BY i) AS sig
      FROM mh GROUP BY doc_id, i // {MH_MD5_ROWS}
    )"""


def _md5_shingle_bands(spark: SparkSession, sf_dir: str):
    """(DF-capped md5 shingle relation, LSH band-signature relation) —
    the oracle-replicable MinHash pipeline shared by dedup_minhash_md5
    (from-scratch build) and dedup_minhash_incremental (maintenance):
    gram strings → ONE md5 per gram split into two 32-bit halves →
    MH_MD5_PERMS Kirsch-Mitzenmacher permutations → per-doc mins →
    MH_MD5_BANDS band signature strings."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split("text", " ")
    )
    raw = track(
        d.select(
            "doc_id", F.explode(word_shingles(F.col("toks"))).alias("gram")
        )
    )
    hot = (
        raw.groupBy("gram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > DF_CAP)
        .select("gram")
    )
    ex = track(raw.join(F.broadcast(hot), "gram", "left_anti"))
    dig = ex.select("doc_id", F.md5("gram").alias("dg")).select(
        "doc_id",
        F.conv(F.substring("dg", 1, 8), 16, 10).cast("bigint").alias("h1"),
        F.conv(F.substring("dg", 9, 8), 16, 10).cast("bigint").alias("h2"),
    )
    hashed = dig.select(
        "doc_id",
        "h1",
        "h2",
        F.explode(F.sequence(F.lit(0), F.lit(MH_MD5_PERMS - 1))).alias("i"),
    ).select(
        "doc_id",
        "i",
        ((F.col("h1") + F.col("i") * F.col("h2")) % MH_MD5_P).alias("hv"),
    )
    mh = hashed.groupBy("doc_id", "i").agg(F.min("hv").alias("mhv"))
    bands = mh.groupBy(
        "doc_id", (F.col("i") / MH_MD5_ROWS).cast("int").alias("band")
    ).agg(
        F.concat_ws(
            ":",
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "mhv"))),
                lambda s: s["mhv"].cast("string"),
            ),
        ).alias("sig")
    )
    return ex, bands


@query(
    "dedup_minhash_md5",
    oracle=f"""
    WITH {_SHINGLE_SQL},
    {_MH_MD5_BANDS_SQL},
    bstat AS MATERIALIZED (
      {bstat_sql("bands", ("band", "sig"), "doc_id")}
    ),
    cand AS (
      {banded_pairs_sql("bstat", ("band", "sig"), "doc_id")}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
    verified AS (
      SELECT c.d1, c.d2, COUNT(*) AS n_common
      FROM cand c
      JOIN ex e1 ON e1.doc_id = c.d1
      JOIN ex e2 ON e2.doc_id = c.d2 AND e2.shingle = e1.shingle
      GROUP BY c.d1, c.d2
    )
    SELECT v.d1, v.d2, v.n_common,
           CAST(v.n_common AS DOUBLE) / (s1.n + s2.n - v.n_common) AS jaccard
    FROM verified v
    JOIN sizes s1 ON s1.doc_id = v.d1
    JOIN sizes s2 ON s2.doc_id = v.d2
    WHERE CAST(v.n_common AS DOUBLE) / (s1.n + s2.n - v.n_common)
          >= {MH_MD5_VERIFY}
    """,
)
def dedup_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH with md5 permutations — the ORACLE-CHECKABLE twin of
    dedup_minhash: because md5 is the one hash both engines expose, the
    minhash signatures, the band signatures, and hence the exact
    candidate set are replicated by the DuckDB oracle, so the gate
    value-checks the banded LSH pipeline itself (not just the verified
    survivors).  dedup_minhash (xxhash64 over 8-byte shingle hashes)
    remains the production variant — same pipeline shape, ~3x cheaper
    hashing — with its recall bounded in tests/test_approx_bounds.py.

    Pipeline: gram strings (not hashed longs — md5 must see identical
    bytes on both engines) → ONE md5 per gram, split into two 32-bit
    halves h1/h2 → 16 permutations via Kirsch-Mitzenmacher double
    hashing (h1 + i*h2) mod P (the ``MH_MD5_P`` note above; one digest
    replaces 16 digests over decorated strings) → 4 bands of 4 →
    band-signature equi-join → exact-Jaccard verification of the
    distinct candidates at 0.5.  Scale shape identical to dedup_minhash:
    the 16x fan-out is cheap bigint arithmetic aggregating map-side to
    |docs|x16 partial mins before the shuffle, and the band join's
    fan-out is bounded by band width, never corpus size."""
    ex, bands = _md5_shingle_bands(spark, sf_dir)
    cand = banded_pairs(bands, ("band", "sig"), "doc_id")
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n"))
    e1 = ex.select(F.col("doc_id").alias("d1"), F.col("gram").alias("g1"))
    e2 = ex.select(F.col("doc_id").alias("d2"), F.col("gram").alias("g2"))
    verified = (
        cand.join(e1, "d1")
        .join(e2, (cand.d2 == e2.d2) & (F.col("g1") == F.col("g2")))
        .groupBy(cand.d1, cand.d2)
        .agg(F.count("*").alias("n_common"))
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    jac = F.col("n_common").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("n_common")
    )
    return (
        verified.join(s1, "d1")  # per-doc relation: AQE decides, no hint
        .join(s2, "d2")
        .select("d1", "d2", "n_common", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= MH_MD5_VERIFY)
    )


@query(
    "dedup_cascade_attribution",
    oracle=f"""
    WITH {_SHINGLE_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT d1, d2,
             CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common) AS jaccard,
             CAST(n_common AS DOUBLE) / LEAST(s1.n, s2.n) AS containment,
             (t1.text = t2.text) AS same_text
      FROM pairs
      JOIN sizes s1 ON s1.doc_id = d1
      JOIN sizes s2 ON s2.doc_id = d2
      JOIN documents t1 ON t1.doc_id = d1
      JOIN documents t2 ON t2.doc_id = d2
    )
    SELECT d1, d2,
           CASE WHEN same_text THEN 'exact'
                WHEN jaccard >= {JACCARD_THRESHOLD} THEN 'jaccard'
                ELSE 'containment' END AS tier,
           jaccard, containment
    FROM scored
    WHERE same_text OR jaccard >= {JACCARD_THRESHOLD}
       OR containment >= {CONTAINMENT_THRESHOLD}
    """,
)
def dedup_cascade_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production dedup CASCADE made visible: every near-dup pair
    any tier catches, attributed to the cheapest tier that catches it —
    exact (byte-equal text; a digest groupBy at scale), then symmetric
    Jaccard ≥ 0.8, then asymmetric containment ≥ 0.9.  The attribution
    is what sizes each tier's real workload: pairs the exact tier
    catches never reach the shingle pipeline, and the containment tier
    only pays for what Jaccard's length prune structurally missed.

    One inverted-index pass produces BOTH set metrics (the pair
    relation carries sizes, so jaccard and containment are two
    projections of the same n_common), and the text-equality check
    joins only the surviving pairs back to the documents — candidate-
    bounded, never corpus x corpus."""
    ex = shingle_table(spark, sf_dir)
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n"))
    pairs = _pairs_by_shingle(ex, sizes, 0.0)
    jac = F.col("n_common").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("n_common")
    )
    cont = F.col("n_common").cast("double") / F.least(
        F.col("n1"), F.col("n2")
    )
    d = load_table(spark, sf_dir, "documents")
    t1 = d.select(F.col("doc_id").alias("d1"), F.col("text").alias("text1"))
    t2 = d.select(F.col("doc_id").alias("d2"), F.col("text").alias("text2"))
    scored = (
        pairs.select(
            "d1", "d2", jac.alias("jaccard"), cont.alias("containment")
        )
        .join(t1, "d1")
        .join(t2, "d2")
        .withColumn("same_text", F.col("text1") == F.col("text2"))
        .drop("text1", "text2")
    )
    tier = (
        F.when(F.col("same_text"), F.lit("exact"))
        .when(F.col("jaccard") >= JACCARD_THRESHOLD, F.lit("jaccard"))
        .otherwise(F.lit("containment"))
    )
    return (
        scored.filter(
            F.col("same_text")
            | (F.col("jaccard") >= JACCARD_THRESHOLD)
            | (F.col("containment") >= CONTAINMENT_THRESHOLD)
        )
        .select("d1", "d2", tier.alias("tier"), "jaccard", "containment")
    )


@query(
    "dedup_url_canonical",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             concat(
               CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW.' ELSE 'https://' END,
               source, '.example.com',
               CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END,
               '/docs/', CAST(doc_id % 50 AS VARCHAR),
               CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,
               '?utm_source=feed&ref=', lang,
               CASE WHEN doc_id % 5 = 0 THEN '&b=2&a=1' ELSE '&a=1&b=2' END,
               CASE WHEN doc_id % 7 = 0 THEN '#sec' ELSE '' END
             ) AS url
      FROM documents
    ),
    parts AS (
      SELECT doc_id, url,
             regexp_replace(url, '#.*$', '') AS base
      FROM urls
    ),
    split AS (
      SELECT doc_id, url,
             split_part(base, '?', 1) AS loc,
             split_part(base, '?', 2) AS q
      FROM parts
    ),
    canon AS (
      SELECT doc_id, url,
             concat(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     lower(regexp_extract(loc, '^[^/]+//[^/]+')),
                     '^(https?://)www\\.', '\\1'),
                   ':443$', ''),
                 ':80$', ''),
               regexp_replace(
                 substr(loc, length(regexp_extract(loc, '^[^/]+//[^/]+')) + 1),
                 '/$', ''),
               CASE WHEN kept = '' THEN '' ELSE concat('?', kept) END
             ) AS canonical_url
      FROM (
        SELECT *,
               array_to_string(
                 list_sort(
                   list_filter(string_split(q, '&'),
                               x -> NOT (x LIKE 'utm\\_%' ESCAPE '\\'
                                         OR x LIKE 'ref=%'))),
                 '&') AS kept
        FROM split
      )
    )
    SELECT canonical_url,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT url) AS n_raw_forms,
           MIN(doc_id) AS rep_doc_id
    FROM canon
    GROUP BY canonical_url
    HAVING COUNT(*) >= 2
    ORDER BY canonical_url
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the step a crawl pipeline runs
    BEFORE any content dedup: the same page arrives under dozens of
    surface forms (scheme/host case, www., default ports, trailing
    slash, tracking parameters, parameter order, fragments), and
    collapsing them first is orders of magnitude cheaper than letting
    content dedup discover the duplicates.

    The corpus has no URL column, so a deterministic messy URL is
    synthesized per document from (source, doc_id, lang) — upper-case
    scheme+www on some rows, :443 default port, trailing slash,
    utm/ref tracking params, shuffled parameter order, fragments —
    IDENTICALLY on both engines; the operator under test is the
    canonicalization chain: fragment strip, scheme+host lowercase,
    www. strip, default-port strip, trailing-slash strip,
    tracking-param removal, parameter sort.  Different (source,
    doc_id % 50) pages stay distinct; surface variants collapse.

    Scale shape: canonicalization is pure per-row string work (no
    shuffle, whole-stage codegen), and the dedup itself is ONE hash
    aggregation on the canonical key — at 100 TB the canonical URL is
    a ~60-byte shuffle key vs the kilobytes of page content a
    content-first dedup would move.  reference driver.go:85-92 scans
    by id only; URL identity is part of the north-star extension
    surface."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("HTTPS://WWW.")).otherwise(
            F.lit("https://")
        ),
        F.col("source"),
        F.lit(".example.com"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/docs/"),
        (F.col("doc_id") % 50).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=feed&ref="),
        F.col("lang"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("&b=2&a=1")).otherwise(
            F.lit("&a=1&b=2")
        ),
        F.when(F.col("doc_id") % 7 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    base = F.regexp_replace(F.col("url"), "#.*$", "")
    with_parts = (
        d.select("doc_id", url.alias("url"))
        .withColumn("loc", F.split_part(base, F.lit("?"), F.lit(1)))
        .withColumn("q", F.split_part(base, F.lit("?"), F.lit(2)))
    )
    scheme_host = F.regexp_extract(F.col("loc"), "^[^/]+//[^/]+", 0)
    host_clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.lower(scheme_host), r"^(https?://)www\.", r"$1"
            ),
            ":443$",
            "",
        ),
        ":80$",
        "",
    )
    path_clean = F.regexp_replace(
        F.expr("substring(loc, length(regexp_extract(loc, '^[^/]+//[^/]+', 0)) + 1)"),
        "/$",
        "",
    )
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.col("q"), "&"),
                lambda x: ~(x.like(r"utm\_%") | x.like("ref=%")),
            )
        ),
        "&",
    )
    canonical = F.concat(
        host_clean,
        path_clean,
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )
    return (
        with_parts.withColumn("canonical_url", canonical)
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("url").alias("n_raw_forms"),
            F.min("doc_id").alias("rep_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("canonical_url")
    )


FUNNEL_MIN_CHARS = 200  # stage-3 minimum document length


@query(
    "corpus_dedup_funnel",
    oracle=f"""
    WITH urls AS (
      SELECT doc_id, source, n_chars,
             concat(source, '/', CAST(doc_id % 50 AS VARCHAR)) AS canon
      FROM documents
    ),
    s1 AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY canon ORDER BY doc_id) AS rn1
      FROM urls
    ),
    s2 AS (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY md5((SELECT text FROM documents d
                                 WHERE d.doc_id = s1.doc_id))
               ORDER BY doc_id) AS rn2
      FROM s1 WHERE rn1 = 1
    ),
    classified AS (
      SELECT u.source,
             CASE
               WHEN s1.rn1 > 1 THEN 'url_dup'
               WHEN s2.rn2 > 1 THEN 'exact_dup'
               WHEN u.n_chars < {FUNNEL_MIN_CHARS} THEN 'too_short'
               ELSE 'kept'
             END AS outcome
      FROM urls u
      JOIN s1 ON s1.doc_id = u.doc_id
      LEFT JOIN s2 ON s2.doc_id = u.doc_id
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN outcome = 'url_dup' THEN 1 ELSE 0 END)
                AS BIGINT) AS removed_url_dup,
           CAST(SUM(CASE WHEN outcome = 'exact_dup' THEN 1 ELSE 0 END)
                AS BIGINT) AS removed_exact_dup,
           CAST(SUM(CASE WHEN outcome = 'too_short' THEN 1 ELSE 0 END)
                AS BIGINT) AS removed_short,
           CAST(SUM(CASE WHEN outcome = 'kept' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept
    FROM classified
    GROUP BY source
    ORDER BY source
    """,
)
def corpus_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup-side attrition funnel — the per-stage report every
    dataset release publishes: stage 1 collapses canonical-URL
    duplicates (cheapest signal first), stage 2 collapses exact
    content duplicates among URL survivors, stage 3 drops too-short
    survivors; each document is attributed to the FIRST stage that
    removed it, counted per source.  The ordering is the point:
    running cheap signals first is what keeps the expensive stages
    small, and the attribution tells you which signal is earning its
    cost (the quality-side twin is corpus_curation_funnel).

    Stage keepers are deterministic (min doc_id per group, the
    cluster-representative convention) so the report is value-exact.
    Scale shape: two window functions over successively SHRINKING
    relations — URL keys first (everything), content hashes second
    (URL survivors only) — shuffling ~40-byte keys, then one
    conditional aggregation; text never shuffles (the hash does)."""
    d = load_table(spark, sf_dir, "documents")
    urls = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.md5("text").alias("content_hash"),
        F.concat(
            F.col("source"), F.lit("/"), (F.col("doc_id") % 50).cast("string")
        ).alias("canon"),
    )
    s1 = urls.withColumn(
        "rn1",
        F.row_number().over(
            Window.partitionBy("canon").orderBy("doc_id")
        ),
    )
    s2 = (
        s1.filter(F.col("rn1") == 1)
        .withColumn(
            "rn2",
            F.row_number().over(
                Window.partitionBy("content_hash").orderBy("doc_id")
            ),
        )
        .select("doc_id", "rn2")
    )
    outcome = (
        F.when(F.col("rn1") > 1, "url_dup")
        .when(F.col("rn2") > 1, "exact_dup")
        .when(F.col("n_chars") < FUNNEL_MIN_CHARS, "too_short")
        .otherwise("kept")
    )
    return (
        s1.join(s2, "doc_id", "left")
        .select("source", outcome.alias("outcome"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("outcome") == "url_dup").cast("bigint")).alias(
                "removed_url_dup"
            ),
            F.sum((F.col("outcome") == "exact_dup").cast("bigint")).alias(
                "removed_exact_dup"
            ),
            F.sum((F.col("outcome") == "too_short").cast("bigint")).alias(
                "removed_short"
            ),
            F.sum((F.col("outcome") == "kept").cast("bigint")).alias("n_kept"),
        )
        .orderBy("source")
    )


# --- hot-bucket guard value gate -------------------------------------------
# 500 docs at both gate scales: doc_id % 4 != 0 lands 375 members in ONE
# band bucket — above banding.HOT_BUCKET_CAP (256) at every sf, so this
# is the query that exercises the guard's STAR path (min-id
# representative ↔ member) hash-exactly; the md5 LSH twins keep their
# buckets small and gate the all-pairs path.  Together they value-pin
# both branches of banded_pairs every round.


@query(
    "dedup_lsh_hotcap",
    oracle=f"""
    WITH bands AS (
      SELECT doc_id, 0 AS band_id,
             CASE WHEN doc_id % 4 <> 0 THEN CAST(-1 AS BIGINT)
                  ELSE CAST(doc_id // 40 AS BIGINT) END AS band_val
      FROM documents
    ),
    bstat AS MATERIALIZED (
      {bstat_sql("bands", ("band_id", "band_val"), "doc_id")}
    )
    {banded_pairs_sql("bstat", ("band_id", "band_val"), "doc_id")}
    """,
)
def dedup_lsh_hotcap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value gate for the hot-LSH-bucket guard (banding.banded_pairs,
    round-9 VERDICT "What's wrong" #1): a constructed band relation
    where 75% of documents share one bucket — the boilerplate-crawl
    shape (k near-identical pages) that made the unguarded band join
    emit k²/2 candidates.  Above the cap the guard degrades to min-id
    star pairs (k-1 candidates, cluster connectivity preserved through
    the representative); the remaining docs form ≤10-member buckets
    that take the exact all-pairs path.  The oracle replicates both
    branches arithmetically, so a drift in the cap, the representative
    choice, or either branch's pair set fails the hash."""
    d = load_table(spark, sf_dir, "documents")
    bands = d.select(
        "doc_id",
        F.lit(0).alias("band_id"),
        F.when(
            F.col("doc_id") % 4 != 0, F.lit(-1).cast("bigint")
        )
        .otherwise(F.expr("doc_id div 40"))
        .alias("band_val"),
    )
    return banded_pairs(bands, ("band_id", "band_val"), "doc_id")


@query(
    "dedup_lsh_hotcap_grouped",
    oracle=f"""
    WITH bands AS (
      SELECT doc_id, 0 AS band_id,
             CASE WHEN doc_id % 4 <> 0 THEN CAST(-1 AS BIGINT)
                  ELSE CAST(doc_id // 40 AS BIGINT) END AS band_val,
             CAST(doc_id % 5 AS BIGINT) AS sig
      FROM documents
    ),
    bstat AS MATERIALIZED (
      {bstat_sql("bands", ("band_id", "band_val"), "doc_id", ("sig",))}
    )
    {banded_pairs_sql("bstat", ("band_id", "band_val"), "doc_id")}
    """,
)
def dedup_lsh_hotcap_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value gate for the SIGNATURE-GROUPED star path (the round-10
    review refinement): the same constructed 375-member hot bucket as
    dedup_lsh_hotcap, but members carry a 5-valued full-sketch column —
    the hot bucket must degrade to star WITHIN each equal-sketch group
    plus all-pairs across the five group representatives, never the
    plain bucket-wide star (which would hide true pairs behind an
    unrelated representative on narrow band keys).  The small buckets
    still take the exact all-pairs path.  Oracle replicates both
    branches arithmetically."""
    d = load_table(spark, sf_dir, "documents")
    bands = d.select(
        "doc_id",
        F.lit(0).alias("band_id"),
        F.when(
            F.col("doc_id") % 4 != 0, F.lit(-1).cast("bigint")
        )
        .otherwise(F.expr("doc_id div 40"))
        .alias("band_val"),
        (F.col("doc_id") % 5).cast("bigint").alias("sig"),
    )
    return banded_pairs(
        bands, ("band_id", "band_val"), "doc_id", sig_cols=("sig",)
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) dedup — round 14 (late)
# ---------------------------------------------------------------------------
# Rolling-window boundary rule: position p (1-based, p in [W, len]) is a
# cut iff the last hex digit of md5 over the W chars ENDING at p is '0'
# (P = 1/16 → expected chunk ~W+16 chars).  Content-defined boundaries
# re-synchronize after insertions/deletions, so shifted copies of a
# passage still share every chunk past the first boundary — the property
# fixed-size chunking (chunk_plan, docpipe/chunker.py) structurally
# lacks, and the reason storage/dataset dedup (LBFS, casync, restic,
# Hugging Face Xet) chunks this way.  md5-over-window is the
# cross-engine-replicable stand-in for a gear/Rabin rolling hash: same
# boundary distribution, value-exact in DuckDB.
CDC_W = 16


def _cdc_chunks(t):
    """Column expr: text → array<string> of content-defined chunks."""
    n = F.length(t)
    # F.sequence(16, n) is DESCENDING when n < 16 (the word_shingles
    # pitfall above) — guard explicitly so short docs never hash
    # partial windows; the `p < n` filter conjunct below is then the
    # interior-cut rule only, not a load-bearing backstop
    pos = F.when(
        n >= CDC_W, F.sequence(F.lit(CDC_W), n)
    ).otherwise(F.array().cast("array<int>"))
    cuts = F.filter(
        pos,
        lambda p: (
            F.md5(t.substr(p - F.lit(CDC_W - 1), F.lit(CDC_W))).endswith("0")
            & (p < n)
        ),
    )
    starts = F.concat(
        F.array(F.lit(1)), F.transform(cuts, lambda p: p + 1)
    )
    ends = F.concat(cuts, F.array(n))
    return F.zip_with(
        starts, ends, lambda s, e: t.substr(s, e - s + 1)
    )


_CDC_SQL = f"""
ex AS (
  SELECT doc_id, chunk
  FROM (
    SELECT doc_id,
      list_transform(
        list_zip(
          list_prepend(1, list_transform(cuts, p -> p + 1)),
          list_append(cuts, n)
        ),
        se -> substring(text, se[1], se[2] - se[1] + 1)
      ) AS chunks
    FROM (
      SELECT doc_id, text, n,
        list_filter(
          range(CAST({CDC_W} AS BIGINT), CAST(n + 1 AS BIGINT)),
          p -> substring(
                 md5(substring(text, CAST(p - {CDC_W - 1} AS INT),
                     {CDC_W})), 32, 1) = '0'
               AND p < n
        ) AS cuts
      FROM (SELECT doc_id, text, length(text) AS n FROM documents)
    )
  ), UNNEST(chunks) AS u(chunk)
)
"""


@query(
    "dedup_cdc_chunks",
    oracle=f"""
    WITH {_CDC_SQL},
    df AS (
      SELECT md5(chunk) AS h, COUNT(DISTINCT doc_id) AS nd
      FROM ex GROUP BY md5(chunk)
    )
    SELECT ex.doc_id,
           COUNT(*) AS n_chunks,
           COUNT(DISTINCT md5(chunk)) AS distinct_chunks,
           CAST(SUM(length(chunk)) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN df.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS shared_occ,
           CAST(SUM(CASE WHEN df.nd > 1 THEN length(chunk) ELSE 0 END)
             AS BIGINT) AS shared_chars
    FROM ex JOIN df ON df.h = md5(ex.chunk)
    GROUP BY ex.doc_id
    """,
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT-DEFINED CHUNKING dedup (round 14 — the chunk-level
    member of the dedup family): every document is split at
    content-defined boundaries (rolling md5 window, CDC_W=16, cut
    probability 1/16 per position) and chunk fingerprints are counted
    across the corpus.  Unlike document-level exact/near dedup, this
    measures SUB-document duplication — boilerplate passages, quoted
    blocks, shared headers — and unlike fixed-size chunking the
    boundaries re-synchronize across insertions, so a passage shifted
    by an edit still deduplicates (the LBFS/FastCDC property; gear
    hash at 100 TB, md5-window here for the value-exact DuckDB
    replica).

    Per document: chunk count, distinct chunk fingerprints, total
    chunk chars (≡ doc length — pins the chunker covers every char
    exactly once), occurrences of chunks shared with ANY other
    document, and the chars those cover (the dedup savings bound).

    Scale shape: the cut scan is one vectorized Arrow pass
    (optimization r17 — the old JVM higher-order filter computed one
    interpreted md5 PER TEXT POSITION; a 16-byte message is exactly
    one md5 block, so _md5_cuts_vec runs the 64 rounds across every
    window of the batch as numpy uint32 ops, byte-equal to the HOF
    by tests/test_dedup_cdc.py and the unchanged oracle); chunk
    substrings and everything downstream stay JVM-side; the corpus
    then shuffles 16-byte chunk HASHES twice (DF count + join back)
    and never the text.  Chunk-hash join fan-out is 1:1 per instance
    — hot boilerplate chunks cost linear rows, never the quadratic
    pair blow-up the pair-enumerating lanes cap with DF_CAP."""
    import pandas as pd  # noqa: F401 — pandas_udf import-time dep

    cuts_udf = F.pandas_udf(_md5_cuts_vec, "array<int>")
    d = load_table(spark, sf_dir, "documents")
    with_cuts = d.select(
        "doc_id", "text", cuts_udf(F.col("text")).alias("cuts")
    )
    return _cdc_rollup(
        with_cuts.select(
            "doc_id",
            F.explode(
                _gear_chunks_from_cuts(F.col("text"), F.col("cuts"))
            ).alias("chunk"),
        )
    )


def _cdc_rollup(exploded: DataFrame) -> DataFrame:
    """Shared per-doc chunk rollup for the CDC lanes: (doc_id, chunk)
    → chunk counts, distinct fingerprints, total chars, shared
    occurrences/chars.  Only 16-byte chunk hashes shuffle."""
    ex = exploded.select(
        "doc_id",
        F.md5(F.col("chunk")).alias("h"),
        F.length("chunk").alias("clen"),
    )
    # two downstream references (DF table + join back): persist until
    # the next query starts (registry release), NOT untrack-now — the
    # consumer has not materialized yet
    ex = track(ex)
    df = ex.groupBy("h").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    return (
        ex.join(df, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count_distinct("h").alias("distinct_chunks"),
            F.sum("clen").alias("total_chars"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).alias(
                "shared_occ"
            ),
            F.sum(
                F.when(F.col("nd") > 1, F.col("clen")).otherwise(0)
            ).alias("shared_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Gear-hash CDC — round 15 (VERDICT r14 ask #4)
# ---------------------------------------------------------------------------
# The md5 lane above recomputes a full digest at EVERY window position
# (O(n*W) digest work — its docstring concedes gear hash is the 100 TB
# choice).  This lane IS the gear hash: h' = (2*h + GEAR[c]) mod 2^48,
# cut iff (h & GEAR_MASK) == 0 — O(1) integer work per character,
# computed as one JVM-side `aggregate` fold (no Python, no shuffle).
#
# Cross-engine exactness WITHOUT a sequential fold in DuckDB: because h
# is reduced mod 2^48 every step, the char at distance j contributes
# (GEAR[c] << j) mod 2^48, which is 0 for j >= 48 — so the masked test
# at position p depends ONLY on the last min(p, 48) characters, and the
# oracle can recompute it as a bounded WINDOWED sum per position
# (mod 2^48 distributes over the sum).  The rolling fold and the
# windowed sum are algebraically identical, not approximations of each
# other; tests pin the equivalence on directed vectors.
_GEAR_BITS = 48
_GEAR_MOD = (1 << _GEAR_BITS) - 1
# 4 spread mask bits -> P(cut) = 1/16 (same boundary density as the
# md5 twin), effective window 48 chars (FastCDC-style spread mask)
_GEAR_MASK = (1 << 47) | (1 << 31) | (1 << 15) | (1 << 7)


def _gear_table() -> list[int]:
    """256 deterministic 48-bit gear constants (md5-derived so any
    engine can rebuild them; embedded as literals in both plans)."""
    import hashlib

    return [
        int(hashlib.md5(str(b).encode()).hexdigest()[:12], 16)
        for b in range(256)
    ]


_GEAR = _gear_table()


def _gear_cuts(t):
    """Column expr: text → array<int> of gear-hash cut positions
    (1-based, interior only) via one O(n) rolling fold."""
    n = F.length(t)
    chars = F.when(n >= 1, F.split(t, "")).otherwise(
        F.array().cast("array<string>")
    )
    gear_arr = F.array(*[F.lit(g) for g in _GEAR])

    def step(acc, c):
        g = F.element_at(gear_arr, (F.ascii(c) % 256) + 1)
        h2 = (acc["h"] * 2 + g).bitwiseAND(F.lit(_GEAR_MOD))
        p2 = acc["p"] + 1
        is_cut = (h2.bitwiseAND(F.lit(_GEAR_MASK)) == 0) & (p2 < n)
        return F.struct(
            h2.alias("h"),
            p2.alias("p"),
            F.when(is_cut, F.concat(acc["cuts"], F.array(p2)))
            .otherwise(acc["cuts"])
            .alias("cuts"),
        )

    return F.aggregate(
        chars,
        F.struct(
            F.lit(0).cast("long").alias("h"),
            F.lit(0).alias("p"),
            F.array().cast("array<int>").alias("cuts"),
        ),
        step,
        lambda acc: acc["cuts"],
    )


def _gear_chunks(t):
    """Column expr: text → array<string> of gear-CDC chunks."""
    cuts = _gear_cuts(t)
    n = F.length(t)
    starts = F.concat(
        F.array(F.lit(1)), F.transform(cuts, lambda p: p + 1)
    )
    ends = F.concat(cuts, F.array(n))
    return F.zip_with(
        starts, ends, lambda s, e: t.substr(s, e - s + 1)
    )


def _gear_cuts_vec(texts):
    """VECTORIZED gear cuts (round 16): the same mod-2^48 window
    identity the oracle uses, as 48 shifted adds over the WHOLE Arrow
    batch concatenated — h(p) = Σ_{j<min(p,48)} GEAR[c_{p-j}]·2^j
    (mod 2^48), wrap-exact in uint64 because 2^64 is a multiple of
    2^48.  Docs are separated by 48 zero-gear pads so no window
    crosses a boundary; short prefixes get their partial windows from
    the same zeros.  Replaces the interpreted JVM `aggregate` fold in
    the hot lane after a clean same-session A/B showed the md5 twin
    BEATING the fold on both corpus shapes (dense md5/gear 0.49-0.60,
    zipf 0.69-0.75): Catalyst evaluates HOF lambdas interpreted, so
    the O(n) fold pays ~10 interpreted expression evals per character
    while the md5 twin's per-position digest runs inside codegen.
    The numpy form is ~50 C-speed vector ops per batch.  The fold
    (_gear_cuts) stays as the cross-checked reference twin —
    tests/test_dedup_cdc.py pins vec == fold on directed and random
    vectors."""
    import numpy as np
    import pandas as pd

    gear_arr = np.asarray(_GEAR, dtype=np.uint64)
    gs = []
    lens = []
    pad = np.zeros(48, dtype=np.uint64)
    for t in texts:
        if t:
            cps = (
                np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
                % 256
            )
            g = gear_arr[cps]
        else:
            g = np.zeros(0, dtype=np.uint64)
        gs.append(g)
        gs.append(pad)
        lens.append(len(g))
    if not lens:
        return pd.Series([], dtype=object)
    big = np.concatenate(gs)
    acc = big.copy()
    for j in range(1, 48):
        acc[j:] += big[:-j] << np.uint64(j)
    cut = (acc & np.uint64(_GEAR_MASK)) == 0
    out = []
    off = 0
    for n in lens:
        pos = np.flatnonzero(cut[off : off + n]).astype(np.int32) + 1
        out.append(pos[pos < n])
        off += n + 48
    return pd.Series(out)


# --- vectorized md5-window CDC cuts (optimization r17) ---------------
#
# The md5 CDC lanes' cut scan was one interpreted-JVM md5 PER TEXT
# POSITION (filter HOF: substring → MessageDigest → hex → endswith —
# §4.2's worst case, ~µs of interpreter+digest overhead per char).  A
# 16-byte message pads to EXACTLY ONE md5 block, so the whole scan
# vectorizes: every window of every doc in the batch becomes one row
# of an (N, 16) matrix and the 64 MD5 rounds run as numpy uint32 ops
# across all N lanes at once.  Only the cut predicate (last hex digit
# of the digest = low nibble of output byte 15 = (d >> 24) & 0xF == 0)
# is needed, so just the d register's final value is kept.
#
# _md5_cuts_scalar is the byte-equal reference twin (hashlib per
# position) and the dispatch for non-ASCII docs, where char windows !=
# byte windows (SQL substring is character-based; a multi-byte char
# makes the 16-char window exceed one md5 block).  Equivalence is
# pinned in tests/test_dedup_cdc.py on directed + random vectors and
# by the unchanged DuckDB oracles of both cdc lanes.

_MD5_S = (
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4
    + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4
)


def _md5_k_table():
    import math

    return [int(abs(math.sin(i + 1)) * (1 << 32)) & 0xFFFFFFFF for i in range(64)]


_MD5_K = _md5_k_table()


def _md5_d16_vec(m):
    """Final d register of MD5 over (N, 16)-byte messages, vectorized.

    ``m``: uint8 array of shape (N, 16).  Returns uint32 (N,) — the
    little-endian 4th output word (digest bytes 12..15)."""
    import numpy as np

    u32 = np.uint32
    w = m.view("<u4")  # (N, 4): the 4 data words
    # padded block: M4 = 0x80, M5..M13 = 0, M14 = 128 (bit length LE), M15 = 0
    mk = [w[:, 0], w[:, 1], w[:, 2], w[:, 3]] + [u32(0)] * 12
    mk[4] = u32(0x80)
    mk[14] = u32(128)
    a = np.full(m.shape[0], 0x67452301, dtype=u32)
    b = np.full(m.shape[0], 0xEFCDAB89, dtype=u32)
    c = np.full(m.shape[0], 0x98BADCFE, dtype=u32)
    d = np.full(m.shape[0], 0x10325476, dtype=u32)
    d0 = d.copy()
    for i in range(64):
        if i < 16:
            f = (b & c) | (~b & d)
            g = i
        elif i < 32:
            f = (d & b) | (~d & c)
            g = (5 * i + 1) % 16
        elif i < 48:
            f = b ^ c ^ d
            g = (3 * i + 5) % 16
        else:
            f = c ^ (b | ~d)
            g = (7 * i) % 16
        f = f + a + u32(_MD5_K[i]) + mk[g]  # uint32 wraps
        s = _MD5_S[i]
        a, d, c = d, c, b
        b = c + ((f << u32(s)) | (f >> u32(32 - s)))
    return d0 + d


def _md5_cuts_scalar(t: str) -> list[int]:
    """Reference/fallback md5-window cuts (hashlib per position) —
    byte-equal to the JVM HOF formulation: cut at p (1-based char
    position, CDC_W <= p < n) iff md5(utf8(chars p-15..p)) hex ends
    in '0'."""
    import hashlib

    n = len(t)
    return [
        p
        for p in range(CDC_W, n)
        if hashlib.md5(t[p - CDC_W : p].encode()).hexdigest()[-1] == "0"
    ]


def _md5_cuts_vec(texts):
    """Arrow-batch md5 CDC cut positions: ASCII docs go through the
    vectorized single-block MD5 over all windows of the batch at once;
    non-ASCII docs fall back to the scalar reference (char windows are
    not fixed-byte there)."""
    import numpy as np
    import pandas as pd

    out: list = []
    wins = []
    spans = []  # (out_index, n_windows, n_chars)
    for t in texts:
        if not t or len(t) < CDC_W:
            out.append(np.zeros(0, dtype=np.int32))
            continue
        if not t.isascii():
            out.append(np.asarray(_md5_cuts_scalar(t), dtype=np.int32))
            continue
        b = np.frombuffer(t.encode(), dtype=np.uint8)
        # windows j = 0..n-16 cover chars (j+1..j+16); position p = j+16
        wv = np.lib.stride_tricks.sliding_window_view(b, CDC_W)
        out.append(None)
        spans.append((len(out) - 1, wv.shape[0], len(t)))
        wins.append(wv)
    if wins:
        m = np.ascontiguousarray(np.concatenate(wins, axis=0))
        dreg = _md5_d16_vec(m)
        hit = ((dreg >> np.uint32(24)) & np.uint32(0xF)) == 0
        off = 0
        for oi, nw, nchars in spans:
            pos = np.flatnonzero(hit[off : off + nw]).astype(np.int32) + CDC_W
            # interior cuts only (p < n): the last window's position == n
            out[oi] = pos[pos < nchars]
            off += nw
    return pd.Series(out)


def _gear_chunks_from_cuts(t, cuts):
    """Column expr: (text, array<int> cut positions) → array<string>
    chunks (the substr/zip_with half _gear_chunks runs, reused by the
    vectorized lane)."""
    n = F.length(t)
    starts = F.concat(
        F.array(F.lit(1)), F.transform(cuts, lambda p: p + 1)
    )
    ends = F.concat(cuts, F.array(n))
    return F.zip_with(
        starts, ends, lambda s, e: t.substr(s, e - s + 1)
    )


_GEAR_SQL_LIST = "[" + ", ".join(str(g) for g in _GEAR) + "]"
_P2_SQL_LIST = "[" + ", ".join(str(1 << j) for j in range(49)) + "]"


@query(
    "dedup_cdc_gear",
    oracle=f"""
    WITH gear AS (
      SELECT {_GEAR_SQL_LIST} AS G, {_P2_SQL_LIST} AS P2
    ),
    ex AS (
      SELECT doc_id, chunk
      FROM (
        SELECT doc_id,
          list_transform(
            list_zip(
              list_prepend(1, list_transform(cuts, p -> p + 1)),
              list_append(cuts, n)
            ),
            se -> substring(text, se[1], se[2] - se[1] + 1)
          ) AS chunks
        FROM (
          SELECT doc_id, text, n,
            -- windowed replica of the rolling gear fold: the masked
            -- test at p depends only on the last min(p, 48) chars
            -- because (GEAR << j) mod 2**48 vanishes for j >= 48
            list_filter(
              range(CAST(1 AS BIGINT), CAST(n AS BIGINT)),
              p -> CAST(list_sum(list_transform(
                     range(CAST(0 AS BIGINT),
                           CAST(LEAST(p, {_GEAR_BITS}) AS BIGINT)),
                     j -> (G[ord(substring(
                              text, CAST(p - j AS INT), 1)) % 256 + 1]
                           % P2[CAST({_GEAR_BITS} - j + 1 AS INT)])
                          * P2[CAST(j + 1 AS INT)]
                   )) AS BIGINT) & {_GEAR_MASK} = 0
            ) AS cuts
          FROM (SELECT doc_id, text, length(text) AS n FROM documents)
          CROSS JOIN gear
        )
      ), UNNEST(chunks) AS u(chunk)
    ),
    df AS (
      SELECT md5(chunk) AS h, COUNT(DISTINCT doc_id) AS nd
      FROM ex GROUP BY md5(chunk)
    )
    SELECT ex.doc_id,
           COUNT(*) AS n_chunks,
           COUNT(DISTINCT md5(chunk)) AS distinct_chunks,
           CAST(SUM(length(chunk)) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN df.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS shared_occ,
           CAST(SUM(CASE WHEN df.nd > 1 THEN length(chunk) ELSE 0 END)
             AS BIGINT) AS shared_chars
    FROM ex JOIN df ON df.h = md5(ex.chunk)
    GROUP BY ex.doc_id
    """,
)
def dedup_cdc_gear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEAR-HASH content-defined chunking (round 15 — the 100 TB
    headline the md5 twin above stood in for): boundaries come from a
    rolling gear hash h' = (2h + GEAR[codepoint%256]) mod 2^48, cut
    where (h & spread-4-bit-mask) == 0 — O(1) integer work per
    character instead of a full md5 digest per window position, at
    the same 1/16 boundary density.  (The round-15 SCALE_PROOF
    cross-leg comparison reported the JVM fold 1.68x faster than md5
    on dense; a clean same-session A/B in round 16 showed that was a
    measurement artifact — the interpreted fold actually LOSES both
    shapes, hence the vectorized formulation below.)

    Same per-doc rollup as ``dedup_cdc_chunks``: chunk counts,
    distinct fingerprints, total chars (≡ doc length — the chunker
    covers every char exactly once), shared occurrences and chars.

    Oracle exactness: the fold reduces h mod 2^48 every step, so the
    masked boundary test at position p depends only on the last
    min(p, 48) characters — DuckDB recomputes it as a bounded
    windowed sum per position (mod 2^48 distributes over the sum),
    algebraically identical to the Spark-side rolling fold.

    Scale shape (round 16): cut positions come from ONE Arrow-batched
    numpy pass (_gear_cuts_vec — 48 C-speed shifted adds over the
    whole batch; ArrowEvalPython, which the plan lint allows, never
    row-at-a-time BatchEvalPython), chunk substrings and everything
    downstream stay JVM-side; text never shuffles, only 16-byte chunk
    hashes do, 1:1 join fan-out per instance — same as the md5 twin.
    The interpreted JVM `aggregate` fold formulation (_gear_cuts)
    remains the cross-checked reference twin; a clean same-session
    A/B showed it LOSING to the md5 twin on both corpus shapes
    (interpreted HOF lambda overhead), which is why the hot lane
    vectorized."""
    import pandas as pd  # noqa: F401 — pandas_udf import-time dep

    cuts_udf = F.pandas_udf(_gear_cuts_vec, "array<int>")
    d = load_table(spark, sf_dir, "documents")
    with_cuts = d.select(
        "doc_id",
        F.col("text"),
        cuts_udf(F.col("text")).alias("cuts"),
    )
    return _cdc_rollup(
        with_cuts.select(
            "doc_id",
            F.explode(
                _gear_chunks_from_cuts(F.col("text"), F.col("cuts"))
            ).alias("chunk"),
        )
    )
