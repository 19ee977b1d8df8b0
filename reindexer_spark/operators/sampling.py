"""North-star training-data sampling operators (BASELINE.json `north_star`;
no reference implementation — the reference pipes every row, `driver.go:192-207`).

Everything here is **hash-deterministic**: membership is a pure function of
the row key (md5 — the one cryptographic hash both Spark and DuckDB expose
with identical output), never `rand()`.  That is the only sampling design
that survives Spark's execution model at 100 TB: task retries and
speculative execution re-run partitions, so a `rand()`-based sample is
non-reproducible and can even lose/duplicate rows across retries, while a
hash sample is idempotent, needs no seed coordination between executors,
and pushes down as an ordinary filter (no shuffle, no state).

Hex-threshold convention: `substr(md5(key), 1, 4)` is uniform over 65 536
buckets; comparing the hex *string* against a threshold avoids any
engine-specific hex→int conversion in the hot path ('g' sorts after every
hex digit → keep-all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from reindexer_spark.catalog import load_table
from reindexer_spark.registry import query

# ~12.5% Bernoulli sample: 0x2000 / 0x10000.
BERNOULLI_HEX = "2000"

# Deterministic source-mixing weights (hex thresholds over 65 536 buckets):
# src0 keeps everything, src1 half, src2 a quarter, everything else 10%.
MIX_WEIGHTS: dict[str, str] = {"src0": "g", "src1": "8000", "src2": "4000"}
MIX_DEFAULT_HEX = "199a"  # ceil(0.1 * 65536) = 6554 = 0x199A

N_SHARDS = 8
STRATA_FRAC = 0.2


def _hash4(col: str):
    return F.substring(F.md5(F.col(col).cast("string")), 1, 4)


@query(
    "sample_hash_bernoulli",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(doc_id::VARCHAR), 1, 4) < '{BERNOULLI_HEX}'
    """,
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~12.5% Bernoulli sample keyed on md5(doc_id).

    Plan shape: a single stateless Filter over the scan — embarrassingly
    parallel, no shuffle, reproducible across runs/retries/engines
    (unlike ``df.sample()``, whose membership depends on partition layout
    and task attempt)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(_hash4("doc_id") < BERNOULLI_HEX).select(
        "doc_id", "lang", "source"
    )


@query(
    "sample_train_test_split",
    oracle="""
    WITH tagged AS (
      SELECT lang,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 100 AS bucket
      FROM documents
    )
    SELECT lang,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs
    FROM tagged
    GROUP BY 1, 2
    """,
)
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment from a hash bucket of the key.

    The split label is a pure projection (derivable anywhere downstream
    without storing it); the per-language counts here are the audit query
    a pipeline runs to confirm the split is balanced.  One map-side
    partial + final hash aggregate; cardinality of the output is
    |langs| × 3, so the shuffle is negligible at any scale."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.conv(_hash4("doc_id"), 16, 10).cast("bigint") % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "sample_stratified_exact",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n_stratum
      FROM documents
    )
    SELECT doc_id, lang, rn
    FROM ranked
    WHERE rn <= CEIL({STRATA_FRAC} * n_stratum)
    """,
)
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size stratified sample: per language, the first
    ceil(20% · |stratum|) rows of the deterministic md5 ordering.

    Guarantees exact per-stratum counts (a Bernoulli sample only hits the
    fraction in expectation).  Cost: one shuffle on the stratum key plus a
    per-stratum sort — at scale the strata are processed independently, so
    skew is bounded by the largest stratum, and a hot stratum can be
    sub-salted by extending the partition key with a hash prefix."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.select(
        "doc_id",
        "lang",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("lang")).alias("n_stratum"),
    )
    return ranked.filter(
        F.col("rn") <= F.ceil(F.lit(STRATA_FRAC) * F.col("n_stratum"))
    ).select("doc_id", "lang", "rn")


@query(
    "sample_weighted_mix",
    oracle=f"""
    WITH weights(source, keep_hex) AS (
      VALUES ('src0', 'g'), ('src1', '8000'), ('src2', '4000')
    ), kept AS (
      SELECT d.source
      FROM documents d LEFT JOIN weights w USING (source)
      WHERE substr(md5(d.doc_id::VARCHAR), 1, 4)
              < COALESCE(w.keep_hex, '{MIX_DEFAULT_HEX}')
    )
    SELECT source, COUNT(*) AS n_kept
    FROM kept GROUP BY source
    """,
)
def sample_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source mixing: per-source keep-rates (src0 100%, src1 50%,
    src2 25%, default 10%) applied as deterministic hash thresholds —
    the mixture step that turns N crawls into one training corpus with
    target proportions.

    The weights are pipeline *config*, not data, so they compile into the
    plan as a map literal — the whole mixing step is a map-side
    projection+filter with zero joins, zero shuffles of the corpus, and
    nothing to broadcast.  (With thousands of sources or weights that
    live in a table, the same query becomes a broadcast left join — see
    docpipe.authority for that pattern.)  Changing the mixture = a new
    literal, not a recomputation of hashes."""
    d = load_table(spark, sf_dir, "documents")
    wmap = F.create_map(
        *[F.lit(x) for kv in MIX_WEIGHTS.items() for x in kv]
    )
    kept = d.filter(
        _hash4("doc_id")
        < F.coalesce(wmap[F.col("source")], F.lit(MIX_DEFAULT_HEX))
    )
    return kept.groupBy("source").agg(F.count("*").alias("n_kept"))


@query(
    "corpus_shuffle_shard",
    oracle=f"""
    SELECT doc_id,
           ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % {N_SHARDS}
             AS shard,
           ROW_NUMBER() OVER (
             PARTITION BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT
                            % {N_SHARDS}
             ORDER BY md5(doc_id::VARCHAR), doc_id) AS pos
    FROM documents
    """,
)
def corpus_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into training shards: shard =
    hash(key) mod N, position = rank of md5(key) within the shard.

    Reading shards in (shard, pos) order visits the corpus in md5 order —
    a reproducible full shuffle with NO global sort: one hash-partition
    exchange + independent per-shard sorts, exactly how a 100 TB corpus
    gets shuffled for training (N scales with the cluster; 8 here)."""
    d = load_table(spark, sf_dir, "documents")
    h4 = _hash4("doc_id")
    shard = F.conv(h4, 16, 10).cast("bigint") % N_SHARDS
    w = Window.partitionBy(shard).orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return d.select(
        "doc_id", shard.alias("shard"), F.row_number().over(w).alias("pos")
    )


SEQ_LEN = 2048  # token budget per packed training sequence


@query(
    "corpus_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % {N_SHARDS}
               AS shard,
             md5(doc_id::VARCHAR) AS h,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    placed AS (
      SELECT shard, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens AS start_offset
      FROM toks
    )
    SELECT shard,
           CAST(start_offset // {SEQ_LEN} AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(MIN(start_offset) % {SEQ_LEN} AS BIGINT) AS first_doc_offset
    FROM placed
    GROUP BY shard, start_offset // {SEQ_LEN}
    """,
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the concat-and-chunk step every LLM pretraining
    pipeline runs: documents are laid end-to-end in a deterministic
    shuffled order (md5 within hash shards, same order as
    corpus_shuffle_shard) and cut into fixed token-budget sequences;
    each output row is one packed sequence with its document count and
    fill level.  Shape at 100 TB: one hash exchange + per-shard window
    cumsum — NO global sort, no driver-side loop; the running offset is
    the only state and it is per-shard.  Token counts are whitespace
    tokens (the text_token_stats convention)."""
    d = load_table(spark, sf_dir, "documents")
    h4 = _hash4("doc_id")
    shard = (F.conv(h4, 16, 10).cast("bigint") % N_SHARDS).alias("shard")
    toks = d.select(
        "doc_id",
        shard,
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = toks.withColumn(
        "start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    seq = (F.col("start_offset") / SEQ_LEN).cast("bigint")
    return placed.groupBy("shard", seq.alias("seq_id")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        (F.min("start_offset") % SEQ_LEN).alias("first_doc_offset"),
    )


# Per-source token budget for the budgeted mix (tokens, not docs — the
# unit an LLM data recipe is actually written in).
MIX_TOKEN_BUDGET = 1_200


@query(
    "corpus_mix_token_budget",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT AS bucket
      FROM documents
    ), t AS (
      SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tokens
      FROM d GROUP BY source
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           t.src_tokens,
           CAST(SUM(CASE WHEN t.src_tokens <= {MIX_TOKEN_BUDGET}
                           OR bucket * t.src_tokens
                              < {MIX_TOKEN_BUDGET} * 65536
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN t.src_tokens <= {MIX_TOKEN_BUDGET}
                           OR bucket * t.src_tokens
                              < {MIX_TOKEN_BUDGET} * 65536
                         THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens
    FROM d JOIN t USING (source)
    GROUP BY d.source, t.src_tokens
    """,
)
def corpus_mix_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted data mixing: cap every source at a fixed TOKEN budget by
    deterministic hash-Bernoulli downsampling at rate budget/source_tokens
    (sources under budget keep everything) — how an LLM data recipe
    ("100B tokens web, 20B code, ...") turns into a per-row filter.

    The keep decision is all-integer: md5 bucket (0..65535) × source
    tokens < budget × 65536 ⇔ bucket/65536 < budget/source_tokens, so no
    float threshold exists anywhere (reproducible across engines,
    retries, and partitionings).  Per-source totals are a tiny broadcast
    relation; the keep filter is stateless per row; the audit output
    reports achieved vs requested budget per source.

    Scale shape: one map-side-combinable aggregate for totals, one
    broadcast join, one conditional aggregate — no shuffle of the corpus
    itself, so the plan is scan-bound at 100 TB."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
        F.conv(_hash4("doc_id"), 16, 10).cast("bigint").alias("bucket"),
    )
    t = d.groupBy("source").agg(
        F.sum("n_tok").cast("bigint").alias("src_tokens")
    )
    kept = (F.col("src_tokens") <= MIX_TOKEN_BUDGET) | (
        F.col("bucket") * F.col("src_tokens")
        < F.lit(MIX_TOKEN_BUDGET) * 65536
    )
    return (
        d.join(F.broadcast(t), "source")
        .groupBy("source", "src_tokens")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias(
                "n_kept"
            ),
            F.sum(F.when(kept, F.col("n_tok")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
        .select(
            "source", "n_docs", "src_tokens", "n_kept", "kept_tokens"
        )
    )


MIX_BUDGET = 200  # total documents the temperature-mixed corpus keeps


@query(
    "corpus_mix_temperature",
    oracle=f"""
    WITH srcs AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    wts AS (
      SELECT source, n_docs,
             FLOOR(SQRT(n_docs) * 1000000) / 1000000 AS w
      FROM srcs
    ),
    tot AS (SELECT SUM(CAST(w AS DECIMAL(20,6))) AS tw FROM wts)
    SELECT w.source, w.n_docs, w.w,
           ROUND(w.w / (SELECT CAST(tw AS DOUBLE) FROM tot), 6) AS share,
           CAST(FLOOR(
             (w.w / (SELECT CAST(tw AS DOUBLE) FROM tot)) * {MIX_BUDGET}
           ) AS BIGINT) AS target_docs,
           LEAST(
             CAST(FLOOR(
               (w.w / (SELECT CAST(tw AS DOUBLE) FROM tot)) * {MIX_BUDGET}
             ) AS BIGINT),
             w.n_docs
           ) AS kept_docs
    FROM wts w
    """,
)
def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing at α = 0.5: sampling weights
    w_i ∝ n_i^α flatten the source distribution so low-resource sources
    are up-weighted relative to their raw share — the multilingual/
    multi-source mixing rule LLM data pipelines use.  α is fixed at 0.5
    deliberately: n^0.5 is SQRT, a correctly-rounded IEEE primitive, so
    the weights are bit-identical across engines, while a general
    pow(n, α) routes through exp/ln whose last-ulp behavior is
    libm-specific (the same reasoning that keeps ln out of every other
    hash-gated expression here).

    The weight table is |sources| rows built from one map-side-combined
    count; quantized weights sum as exact decimals, so the shares and
    integer floor targets are deterministic.  The kept_docs cap
    (LEAST(target, n)) is where a low-resource source saturates — the
    epoch-repeat decision a real mixing run logs.  Downstream, the
    per-source keep is the stratified md5-rank selection
    (sample_stratified_exact); this query is the planning relation that
    drives it."""
    d = load_table(spark, sf_dir, "documents")
    srcs = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    wts = srcs.select(
        "source",
        "n_docs",
        (F.floor(F.sqrt(F.col("n_docs")) * 1e6) / 1e6).alias("w"),
    )
    tot = wts.agg(
        F.sum(F.col("w").cast("decimal(20,6)")).cast("double").alias("tw")
    )
    share = F.col("w") / F.col("tw")
    target = F.floor(share * MIX_BUDGET).cast("bigint")
    return (
        wts.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "w",
            F.round(share, 6).alias("share"),
            target.alias("target_docs"),
            F.least(target, F.col("n_docs")).alias("kept_docs"),
        )
    )


# No-split greedy packing: token budget per sequence.  Smaller than
# SEQ_LEN so multi-doc bins AND overflow both actually occur at testdata
# scale (docs are ~20-100 whitespace tokens).
GREEDY_BUDGET = 256


def _pack_toks_sql(src_rel: str) -> str:
    """The packing input relation over an arbitrary (doc_id, text)
    source — the SQL twin of :func:`pack_tokens`."""
    return f"""(
      SELECT doc_id,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % {N_SHARDS}
               AS shard,
             md5(doc_id::VARCHAR) AS h,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM {src_rel}
    )"""


_PACK_RECURSION_SQL = f"""ranked AS (
      SELECT doc_id, shard, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS rk
      FROM toks
    ),
    pack(doc_id, shard, n_tokens, rk, seq_id, fill) AS (
      SELECT doc_id, shard, n_tokens, rk,
             CAST(CASE WHEN n_tokens <= {GREEDY_BUDGET} THEN 0 ELSE 1 END
                  AS BIGINT),
             n_tokens
      FROM ranked WHERE rk = 1
      UNION ALL
      SELECT d.doc_id, d.shard, d.n_tokens, d.rk,
             CASE WHEN p.fill + d.n_tokens <= {GREEDY_BUDGET}
                  THEN p.seq_id ELSE p.seq_id + 1 END,
             CASE WHEN p.fill + d.n_tokens <= {GREEDY_BUDGET}
                  THEN p.fill + d.n_tokens ELSE d.n_tokens END
      FROM pack p JOIN ranked d ON d.shard = p.shard AND d.rk = p.rk + 1
    )"""


_PACK_GREEDY_ORACLE = f"""
    WITH RECURSIVE toks AS {_pack_toks_sql("documents")},
    {_PACK_RECURSION_SQL}
    SELECT doc_id, shard, n_tokens, seq_id, fill AS fill_after
    FROM pack
    ORDER BY doc_id
    """


def pack_tokens(d: DataFrame) -> DataFrame:
    """The packing input relation: md5 shard, shuffle key, whitespace
    token count per document — shared by the batch packer and the
    streaming packer (stream_pack_greedy_live) so both gates run the
    identical recurrence."""
    h4 = _hash4("doc_id")
    return d.select(
        "doc_id",
        (F.conv(h4, 16, 10).cast("bigint") % N_SHARDS).alias("shard"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )


PACK_OUT_SCHEMA = (
    "doc_id bigint, shard bigint, n_tokens bigint, "
    "seq_id bigint, fill_after bigint"
)


def greedy_fold(ns, seq: int, fill: int, budget: int):
    """THE greedy recurrence, shared by the batch packer, the streaming
    packer (which carries (seq, fill) across micro-batches as state),
    and the oracle's recursive CTE spec: place each token count in the
    current sequence if it fits, else open a new one."""
    seq_ids, fills = [], []
    for n in ns:
        n = int(n)
        if fill + n <= budget:
            fill += n
        else:
            seq += 1
            fill = n
        seq_ids.append(seq)
        fills.append(fill)
    return seq_ids, fills, seq, fill


def _greedy_pack_pdf(pdf):
    """One shard's greedy fold (applyInPandas body): deterministic
    (h, doc_id) order, budget-or-new-sequence, oversized docs alone."""
    import pandas as pd

    pdf = pdf.sort_values(["h", "doc_id"], kind="mergesort")
    seq_ids, fills, _, _ = greedy_fold(pdf["n_tokens"], 0, 0, GREEDY_BUDGET)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].astype("int64"),
            "shard": pdf["shard"].astype("int64"),
            "n_tokens": pdf["n_tokens"].astype("int64"),
            "seq_id": pd.Series(seq_ids, index=pdf.index, dtype="int64"),
            "fill_after": pd.Series(fills, index=pdf.index, dtype="int64"),
        }
    )


@query("corpus_pack_greedy", oracle=_PACK_GREEDY_ORACLE)
def corpus_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NO-SPLIT greedy sequence packing — the other packing discipline
    real pipelines run: corpus_pack_sequences lays documents end-to-end
    and CUTS at the budget (pretraining, where crossing a doc boundary
    is fine); this operator keeps every document CONTIGUOUS (SFT /
    instruction tuning, where an example must not be split), placing
    each doc in the current sequence if it fits and opening a new one
    otherwise — first-fit in the same deterministic md5-shuffled order,
    so padding waste is an honest measurement, not an artifact of input
    order.  An oversized doc (> budget) gets a sequence to itself.

    The per-shard greedy fold is genuinely sequential state, so this is
    the applyInPandas showcase: one Arrow batch per hash shard, a
    10-line integer loop inside, per-doc (sequence, fill) assignments
    out.  The oracle expresses the identical recurrence as a recursive
    CTE over the within-shard rank — exact, engine-portable integers.

    Shape at 100 TB: one hash exchange on shard, then shard-local
    sequential state — shards are the parallelism unit exactly like the
    real packers (each data-loader worker packs its own shard); no
    global sort, no driver state, payload text never leaves the scan
    (only doc_id + token counts shuffle)."""
    return (
        pack_tokens(load_table(spark, sf_dir, "documents"))
        .groupBy("shard")
        .applyInPandas(_greedy_pack_pdf, schema=PACK_OUT_SCHEMA)
        .orderBy("doc_id")
    )


def _training_batches_oracle() -> str:
    from reindexer_spark.operators.text import LOGREG_ITERS, _logreg_chain

    chain = _logreg_chain(LOGREG_ITERS).replace(
        "WITH ", "WITH RECURSIVE ", 1
    )
    return f"""{chain}
    , kept AS MATERIALIZED (
      SELECT f.doc_id
      FROM feats f CROSS JOIN w{LOGREG_ITERS} w
      WHERE FLOOR(1000000.0 / (1.0 + EXP(-(w.w0 + w.w1 * f.x1
              + w.w2 * f.x2 + w.w3 * f.x3)))) / 1000000.0 >= 0.5
    ),
    survivors AS MATERIALIZED (
      SELECT d.doc_id, d.text
      FROM documents d JOIN kept k USING (doc_id)
      QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    ),
    toks AS {_pack_toks_sql("survivors")},
    {_PACK_RECURSION_SQL}
    SELECT shard, seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / {GREEDY_BUDGET} AS fill_frac
    FROM pack
    GROUP BY shard, seq_id
    ORDER BY shard, seq_id
    """


@query("corpus_training_batches", oracle=_training_batches_oracle())
def corpus_training_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FINAL-ASSEMBLY flagship — the last mile of an LLM data
    pipeline, composed from three individually-gated operators into the
    artifact a training run actually consumes: (1) the TRAINED quality
    classifier gates the corpus (quality_logreg_score's 12-iteration GD
    chain, score >= 0.5), (2) exact content dedup keeps the lowest
    doc_id per md5 digest, (3) the survivors pack into contiguous
    training sequences (corpus_pack_greedy's no-split first-fit in
    deterministic md5-shuffle order).  One row per packed sequence:
    document count, token count, fill fraction — the padding-waste /
    batch-shape report a data-loading team reads before a run.

    Scale shape: the GD chain is one corpus scan per iteration with an
    O(1) broadcast model; the gate + dedup are one digest-keyed
    exchange (text never shuffles — the digest does); packing is one
    hash exchange then shard-local sequential state.  Nothing in the
    composition adds a shuffle the parts didn't already have.

    The oracle replays the whole composition — GD chain, sigmoid gate,
    QUALIFY dedup, recursive-CTE packing — so the hash gate proves the
    three-stage pipeline value-exact end to end, fill fractions
    included (exact: the budget is a power of two)."""
    from reindexer_spark.operators.text import _logreg_fit, _logreg_score_col

    feats, w, _hist = _logreg_fit(spark, sf_dir)
    kept = feats.filter(_logreg_score_col(w) >= 0.5).select("doc_id")

    w_dg = Window.partitionBy("dg").orderBy("doc_id")
    survivors = (
        load_table(spark, sf_dir, "documents")
        .join(kept, "doc_id")
        .withColumn("dg", F.md5("text"))
        .withColumn("rn", F.row_number().over(w_dg))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text")
    )
    packed = (
        pack_tokens(survivors)
        .groupBy("shard")
        .applyInPandas(_greedy_pack_pdf, schema=PACK_OUT_SCHEMA)
    )
    return (
        packed.groupBy("shard", "seq_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("seq_tokens"),
            (F.sum("n_tokens").cast("double") / GREEDY_BUDGET).alias(
                "fill_frac"
            ),
        )
        .orderBy("shard", "seq_id")
    )


# Total training-token budget for the epoch schedule — 2-3x this
# testdata corpus, so up-weighted low-resource sources genuinely repeat
# (epochs > 1), which is the phenomenon the table exists to expose.
EPOCH_BUDGET = 60_000


@query(
    "corpus_mix_epochs",
    oracle=f"""
    WITH srcs AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    wts AS (
      SELECT source, n_tokens,
             FLOOR(SQRT(n_tokens) * 1000000) / 1000000 AS w
      FROM srcs
    ),
    tot AS (SELECT SUM(CAST(w AS DECIMAL(20,6))) AS tw FROM wts)
    SELECT w.source, w.n_tokens,
           ROUND(w.w / (SELECT CAST(tw AS DOUBLE) FROM tot), 6) AS share,
           CAST(FLOOR(
             (w.w / (SELECT CAST(tw AS DOUBLE) FROM tot)) * {EPOCH_BUDGET}
           ) AS BIGINT) AS alloc_tokens,
           FLOOR(1000000.0 * CAST(FLOOR(
             (w.w / (SELECT CAST(tw AS DOUBLE) FROM tot)) * {EPOCH_BUDGET}
           ) AS BIGINT) / w.n_tokens) / 1000000.0 AS epochs
    FROM wts w
    ORDER BY w.source
    """,
)
def corpus_mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EPOCH-SCHEDULE table a data recipe publishes: per source, its
    temperature-weighted (α = 0.5) share of a total training-token
    budget, the tokens allocated, and the resulting EPOCH COUNT
    (allocated / available) — epochs > 1 means the source repeats
    (up-sampled low-resource data), < 1 means it is subsampled.  This is
    corpus_mix_temperature re-expressed in the unit recipes are actually
    written in (tokens, not documents) with the repetition factor made
    explicit.

    Scale shape: one corpus scan for per-source token totals, a
    |sources|-row weight relation, one decimal total broadcast back —
    the schedule itself is O(|sources|)."""
    d = load_table(spark, sf_dir, "documents")
    srcs = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " ")))
        .cast("bigint")
        .alias("n_tokens")
    )
    wts = srcs.select(
        "source",
        "n_tokens",
        (F.floor(F.sqrt(F.col("n_tokens")) * 1e6) / 1e6).alias("w"),
    )
    tot = wts.agg(
        F.sum(F.col("w").cast("decimal(20,6)")).cast("double").alias("tw")
    )
    share = F.col("w") / F.col("tw")
    alloc = F.floor(share * EPOCH_BUDGET).cast("bigint")
    return (
        wts.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            F.round(share, 6).alias("share"),
            alloc.alias("alloc_tokens"),
            (F.floor(F.lit(1000000.0) * alloc / F.col("n_tokens")) / 1e6)
            .alias("epochs"),
        )
        .orderBy("source")
    )
