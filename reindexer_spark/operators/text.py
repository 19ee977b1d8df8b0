"""Tier C11 — text analysis over ``documents``: language-ID, quality
scoring, token statistics, content fingerprinting.

Everything is built-in column algebra (codegen'd); the fingerprint shows
that even a rolling hash needs no UDF.  All outputs are integer/exact or
single-rounding doubles, so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from reindexer_spark.catalog import load_table
from reindexer_spark.registry import query

# Tiny stopword lexicons for the n-gram/stopword language heuristic.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "ist", "nicht"),
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "es"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de", "shi", "le", "bu", "wo"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for")

FP_MOD = 1_000_000_007
FP_BASE = 131


def _hits(toks, words: tuple[str, ...]):
    """Lexicon hit count over the split tokens.  An interpreted HOF
    (HigherOrderFunction nodes never codegen), but MEASURED NOT WORTH
    REPLACING (optimization r17, guide §1.3): on a 20×-replicated
    sf0.1 corpus the 6-lexicon battery costs ~0.9-1.4 s HOF vs ~1.6 s
    as one codegen'd regexp_count with lookaround token anchors
    (alternation scan over the full text loses to ~40 ns/token·lexicon
    interpretation) vs ~0.8 s as a single all-lexicons Arrow UDF —
    a ~15% composite gain that inverts for the single-lexicon lanes
    once the Python boundary ships the text; both exact-equal
    (0 mismatches at sf0.001/0.01 + adversarial boundary cases).
    The consumers are scan-bound at lane scale."""
    lst = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lst, t)))


def _hits_sql(words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(string_split(text, ' '), t -> t IN ({inlist})))"


@query(
    "text_langid",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_hits_sql(LANG_LEXICONS['de'])} AS hits_de,
             {_hits_sql(LANG_LEXICONS['en'])} AS hits_en,
             {_hits_sql(LANG_LEXICONS['es'])} AS hits_es,
             {_hits_sql(LANG_LEXICONS['fr'])} AS hits_fr,
             {_hits_sql(LANG_LEXICONS['zh'])} AS hits_zh
      FROM documents
    )
    SELECT doc_id, lang,
           CASE GREATEST(hits_de, hits_en, hits_es, hits_fr, hits_zh)
             WHEN hits_de THEN 'de'
             WHEN hits_en THEN 'en'
             WHEN hits_es THEN 'es'
             WHEN hits_fr THEN 'fr'
             ELSE 'zh' END AS pred_lang,
           GREATEST(hits_de, hits_en, hits_es, hits_fr, hits_zh) AS best_hits
    FROM scored
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-lexicon language ID: count lexicon hits per language,
    argmax with deterministic alphabetical tie-break (the CASE evaluates
    languages in sorted order on both engines)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = d.select(
        "doc_id",
        "lang",
        *[
            _hits(toks, LANG_LEXICONS[lang]).alias(f"hits_{lang}")
            for lang in sorted(LANG_LEXICONS)
        ],
    )
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in sorted(LANG_LEXICONS)])
    pred = F.when(F.col("hits_de") == best, "de")
    for lang in ["en", "es", "fr"]:
        pred = pred.when(F.col(f"hits_{lang}") == best, lang)
    pred = pred.otherwise("zh")
    return scored.select(
        "doc_id", "lang", pred.alias("pred_lang"), best.alias("best_hits")
    )


@query(
    "text_quality",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_words,
           LENGTH(text) AS n_chars_actual,
           CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
             / len(string_split(text, ' ')) AS avg_word_len,
           CAST({_hits_sql(STOPWORDS)} AS DOUBLE)
             / len(string_split(text, ' ')) AS stopword_ratio,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) AS distinct_ratio,
           (LENGTH(text) BETWEEN 100 AND 20000
            AND CAST({_hits_sql(STOPWORDS)} AS DOUBLE)
                / len(string_split(text, ' ')) >= 0.05) AS is_quality
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length bounds, mean word length,
    stopword ratio, lexical diversity — the standard cheap pre-filters
    of a training-data pipeline, one scan, no UDFs."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_words = F.size(toks).cast("bigint")
    stop_ratio = _hits(toks, STOPWORDS).cast("double") / n_words
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / n_words
        ).alias("avg_word_len"),
        stop_ratio.alias("stopword_ratio"),
        (F.size(F.array_distinct(toks)).cast("double") / n_words).alias(
            "distinct_ratio"
        ),
        (F.length("text").between(100, 20000) & (stop_ratio >= 0.05)).alias(
            "is_quality"
        ),
    )


@query(
    "text_token_stats",
    oracle=r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_ish_tokens,
           len(regexp_extract_all(text, '[0-9]+')) AS numeric_tokens,
           len(regexp_extract_all(text, '[aeiou]')) AS vowels,
           LENGTH(text) - LENGTH(REPLACE(text, 'e', '')) AS letter_e_count
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, a BPE-ish regex
    (letter runs / digit runs / single punctuation), and char-class
    counts — regex kept to the RE2-compatible subset both engines share."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))
        .cast("bigint")
        .alias("bpe_ish_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[0-9]+"), 0))
        .cast("bigint")
        .alias("numeric_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[aeiou]"), 0))
        .cast("bigint")
        .alias("vowels"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit("e"), F.lit("")))
        )
        .cast("bigint")
        .alias("letter_e_count"),
    )


@query(
    "text_fingerprint",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id,
             list_reduce(
               list_prepend(0::BIGINT,
                 list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
               (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD}
             ) AS fingerprint
      FROM documents
    )
    SELECT doc_id, fingerprint,
           fingerprint % 1024 AS fp_bucket
    FROM fp
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic polynomial rolling-hash fingerprint (base 131 mod
    1e9+7) over the characters — pure fold expression, engine-portable
    (unlike xxhash/md5-based fingerprints, this one the oracle can
    recompute).  The bucket column shows fingerprint-keyed partitioning."""
    d = load_table(spark, sf_dir, "documents")
    chars = F.split("text", "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * FP_BASE + F.ascii(c)) % FP_MOD,
    )
    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        (fp % 1024).alias("fp_bucket"),
    )


@query(
    "text_lang_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           COUNT(DISTINCT source) AS n_sources
    FROM documents
    GROUP BY lang
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics by language (the reporting side of the text
    pipeline)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


TFIDF_TERMS = ("spark", "data", "query", "join", "filter")


@query(
    "text_tfidf",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), n_docs AS (
      SELECT COUNT(*) AS n FROM documents
    ), tf AS (
      SELECT doc_id, word, COUNT(*) AS tf
      FROM words WHERE word IN {TFIDF_TERMS!r}
      GROUP BY doc_id, word
    ), df AS (
      SELECT word, COUNT(DISTINCT doc_id) AS df
      FROM words WHERE word IN {TFIDF_TERMS!r}
      GROUP BY word
    )
    SELECT tf.doc_id, tf.word, tf.tf, df.df,
           tf.tf * ROUND(LN((n.n + 1.0) / (df.df + 1.0)) + 1.0, 6) AS tfidf
    FROM tf JOIN df USING (word) CROSS JOIN n_docs n
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF over a fixed probe vocabulary, in pure relational algebra
    (term frequency per doc ⋈ broadcast document frequency ⋈ corpus
    size).  The smoothed IDF (ln((N+1)/(df+1))+1, the scikit-learn
    convention) is rounded once — ln is the only transcendental, and
    libm implementations differ in the last ulp across engines.

    Scale shape: TF is one explode + hash agg; DF is a tiny aggregate
    (|vocabulary| rows) that broadcasts; nothing quadratic anywhere.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word").isin(*TFIDF_TERMS))
    n_docs = d.count()
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df = words.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.round(
        F.log((F.lit(n_docs) + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
        + F.lit(1.0),
        6,
    )
    return tf.join(F.broadcast(df), "word").select(
        "doc_id", "word", "tf", "df", (F.col("tf") * idf).alias("tfidf")
    )


# --- BM25 ranked retrieval over the corpus ----------------------------

# The reference exists to feed Solr (driver.go: bulk upsert sink), and
# Solr/Lucene rank with BM25 — this operator runs that retrieval model
# natively: the index build (inverted term relation), the collection
# statistics, and the Okapi BM25 scorer, as one Catalyst plan.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
BM25_QUERIES: dict[int, tuple[str, ...]] = {
    1: ("table", "scan"),
    2: ("fast", "join", "query"),
    3: ("vector", "merge"),
    4: ("window", "batch", "spark"),
}

_BM25_TERMS = tuple(sorted({t for q in BM25_QUERIES.values() for t in q}))
_BM25_QUERY_SQL = " UNION ALL ".join(
    f"SELECT {qid} AS query_id, '{t}' AS word"
    for qid, terms in BM25_QUERIES.items()
    for t in terms
)


def bm25_rank(
    spark: SparkSession,
    tokenized: DataFrame,
    id_col: str,
    terms: tuple[str, ...],
    queries: dict[int, tuple[str, ...]],
    k1: float,
    b: float,
    topk: int,
) -> DataFrame:
    """THE Okapi BM25 scorer, shared by docs_bm25_search (ranking the
    documents table) and reindex_then_search (ranking the sunk Solr
    index): one definition of the determinism contract — integer-exact
    avgdl, once-rounded Lucene-style idf, once-rounded term scores
    summed as DECIMAL, doc-id tie-break — so the two gates cannot
    silently diverge.  ``tokenized`` carries (id_col, t: array<string>);
    returns (query_id, rnk, id_col, score, n_terms_hit)."""
    dl = tokenized.select(id_col, F.size("t").cast("bigint").alias("dl"))
    corpus = dl.agg(
        F.count("*").cast("bigint").alias("n"),
        (
            F.expr("(sum(dl) * 1000000) div count(*)").cast("double")
            / 1000000.0
        ).alias("avgdl"),
    )
    words = tokenized.select(id_col, F.explode("t").alias("word")).filter(
        F.col("word").isin(*terms)
    )
    tf = words.groupBy(id_col, "word").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    df = words.groupBy("word").agg(
        F.countDistinct(id_col).cast("bigint").alias("df")
    )
    q = spark.createDataFrame(
        [(qid, t) for qid, qterms in queries.items() for t in qterms],
        "query_id int, word string",
    )
    idf = F.round(
        F.log(
            (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ),
        6,
    )
    term_score = F.round(
        idf
        * (
            (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1
                * (
                    1.0
                    - b
                    + b * (F.col("dl").cast("double") / F.col("avgdl"))
                )
            )
        ),
        6,
    ).cast("decimal(20,6)")
    totals = (
        F.broadcast(q)
        .join(tf, "word")
        .join(F.broadcast(df), "word")
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
        .select("query_id", id_col, term_score.alias("term_score"))
        .groupBy("query_id", id_col)
        .agg(
            F.sum("term_score").cast("double").alias("score"),
            F.count("*").cast("bigint").alias("n_terms_hit"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        totals.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
        .select("query_id", "rnk", id_col, "score", "n_terms_hit")
    )


@query(
    "docs_bm25_search",
    oracle=f"""
    WITH q(query_id, word) AS ({_BM25_QUERY_SQL}),
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), dl AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
    ), corpus AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST((SUM(dl) * 1000000) // COUNT(*) AS DOUBLE) / 1000000.0
               AS avgdl
      FROM dl
    ), words AS (
      SELECT doc_id, unnest(t) AS word FROM toks
    ), tf AS (
      SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
      FROM words WHERE word IN {_BM25_TERMS!r}
      GROUP BY doc_id, word
    ), df AS (
      SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM words WHERE word IN {_BM25_TERMS!r}
      GROUP BY word
    ), scored AS (
      SELECT qq.query_id, tf.doc_id,
             CAST(ROUND(
               ROUND(LN((c.n - df.df + 0.5) / (df.df + 0.5) + 1.0), 6)
               * ((tf.tf * 2.2)
                  / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                     + {BM25_B} * (CAST(dl.dl AS DOUBLE) / c.avgdl)))),
               6) AS DECIMAL(20,6)) AS term_score
      FROM q qq
      JOIN tf ON tf.word = qq.word
      JOIN df ON df.word = qq.word
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN corpus c
    ), totals AS (
      SELECT query_id, doc_id,
             CAST(SUM(term_score) AS DOUBLE) AS score,
             CAST(COUNT(*) AS BIGINT) AS n_terms_hit
      FROM scored GROUP BY query_id, doc_id
    )
    SELECT query_id, rnk, doc_id, score, n_terms_hit FROM (
      SELECT query_id, doc_id, score, n_terms_hit,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rnk
      FROM totals
    ) WHERE rnk <= {BM25_TOPK}
    """,
)
def docs_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval (Robertson et al., TREC-3; the
    Lucene/Solr default similarity — the ranking the reference's Solr
    sink ultimately serves, run natively): top-{BM25_TOPK} documents per
    probe query with k1={BM25_K1}, b={BM25_B} and the Lucene-style
    non-negative idf = ln(1 + (N - df + ½)/(df + ½)).

    Scale shape: the inverted relation (term, doc, tf) is one explode +
    hash agg over the corpus — the classic index build; df and the
    collection stats (N, avgdl) are tiny aggregates that broadcast; the
    query set is a literal dimension joined onto the posting lists, so
    scoring touches only candidate postings, never the corpus, and the
    per-query top-k is a window over candidates.  At 100 TB the posting
    relation is the thing you persist (bucketed by term); everything
    downstream of it here is exactly the query-time plan.

    Determinism: avgdl is integer-division-exact, ln is rounded once
    (libm last-ulp drift), each term score is rounded once then summed
    as DECIMAL (order-free), and ranks break ties on doc_id."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    return bm25_rank(
        spark, toks, "doc_id", _BM25_TERMS, BM25_QUERIES,
        BM25_K1, BM25_B, BM25_TOPK,
    )


# --- logistic-regression quality classifier, trained on the plan ------

LOGREG_ITERS = 12
LOGREG_LR = 5.0  # exactly representable; features live in ~[0, 1]

# Distill the is_quality heuristic (text_quality's rule) into a smooth
# learned scorer — the CCNet/fastText pattern where a cheap rule (or a
# reference corpus) labels the training set and a classifier learns a
# smooth decision surface from DIFFERENT features.  The TRAINING runs
# as one Catalyst plan (plan-unrolled batch gradient descent, the
# embed_kmeans_lloyd / embed_pca_power pattern).
_LR_X1_WORDS = LANG_LEXICONS["en"]  # overlaps the rule's lexicon
_LR_X2_WORDS = tuple(sorted(set(STOPWORDS) - set(_LR_X1_WORDS)))


def _logreg_feats_sql() -> str:
    # MATERIALIZED: every unrolled iteration references feats; without
    # it DuckDB inlines the CTE and re-scans documents per reference
    return f"""
    feats AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN LENGTH(text) BETWEEN 100 AND 20000
                   AND CAST({_hits_sql(STOPWORDS)} AS DOUBLE)
                       / len(string_split(text, ' ')) >= 0.05
                  THEN 1.0 ELSE 0.0 END AS y,
             FLOOR({_hits_sql(_LR_X1_WORDS)} * 10000000.0
                   / len(string_split(text, ' '))) / 1000000.0 AS x1,
             FLOOR({_hits_sql(_LR_X2_WORDS)} * 10000000.0
                   / len(string_split(text, ' '))) / 1000000.0 AS x2,
             FLOOR(len(string_split(text, ' ')) * 1000000.0 / 600)
               / 1000000.0 AS x3
      FROM documents
    ), n_docs AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM feats
    )
    """


def _logreg_step_sql(i: int) -> str:
    """One GD iteration.  Every CTE is referenced exactly once except
    r{i} (the per-iteration output row, MATERIALIZED because both the
    next iteration's weights and the final union read it) — a CTE
    referenced twice would otherwise inline and re-expand the whole
    chain per iteration (exponential).  The entering weights ride
    THROUGH the aggregate via MIN (constant per group, exact) for the
    same single-reference reason."""
    return f"""
    , p{i} AS (
      SELECT f.y, f.x1, f.x2, f.x3, w.w0, w.w1, w.w2, w.w3,
             FLOOR(1000000.0 / (1.0 + EXP(-(w.w0 + w.w1 * f.x1
                     + w.w2 * f.x2 + w.w3 * f.x3)))) / 1000000.0 AS p
      FROM feats f CROSS JOIN w{i - 1} w
    ), a{i} AS (
      SELECT n.n, MIN(w0) AS w0, MIN(w1) AS w1, MIN(w2) AS w2,
             MIN(w3) AS w3,
             FLOOR(CAST(SUM(CAST(FLOOR(-(y * LN(p + 0.000000001)
                     + (1.0 - y) * LN(1.0 - p + 0.000000001)) * 1000000)
                     AS BIGINT)) AS DOUBLE) / n.n)
               / 1000000.0 AS loss,
             CAST(SUM(CASE WHEN (p >= 0.5) = (y = 1.0) THEN 1 ELSE 0 END)
               AS BIGINT) AS n_correct,
             CAST(SUM(CAST(FLOOR((p - y) * 1000000) AS BIGINT)) AS BIGINT)
               AS g0,
             CAST(SUM(CAST(FLOOR((p - y) * x1 * 1000000) AS BIGINT))
               AS BIGINT) AS g1,
             CAST(SUM(CAST(FLOOR((p - y) * x2 * 1000000) AS BIGINT))
               AS BIGINT) AS g2,
             CAST(SUM(CAST(FLOOR((p - y) * x3 * 1000000) AS BIGINT))
               AS BIGINT) AS g3
      FROM p{i} CROSS JOIN n_docs n GROUP BY n.n
    ), r{i} AS MATERIALIZED (
      SELECT {i} AS iter, loss, n_correct,
             w0 - FLOOR({LOGREG_LR} * g0 / n) / 1000000.0 AS w0,
             w1 - FLOOR({LOGREG_LR} * g1 / n) / 1000000.0 AS w1,
             w2 - FLOOR({LOGREG_LR} * g2 / n) / 1000000.0 AS w2,
             w3 - FLOOR({LOGREG_LR} * g3 / n) / 1000000.0 AS w3
      FROM a{i}
    ), w{i} AS (
      SELECT w0, w1, w2, w3 FROM r{i}
    )"""


def _logreg_chain(iters: int) -> str:
    """The shared WITH-chain: quantized features plus ``iters`` unrolled
    GD steps, ending at the trained weight relation ``w{iters}``.
    quality_logreg_train unions the per-iteration rows;
    quality_logreg_score applies ``w{iters}`` back to the corpus."""
    parts = [
        "WITH "
        + _logreg_feats_sql()
        + ", w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"
    ]
    for i in range(1, iters + 1):
        parts.append(_logreg_step_sql(i))
    return "".join(parts)


def _logreg_oracle(iters: int) -> str:
    unions = "\n      UNION ALL ".join(
        f"SELECT iter, loss, n_correct, w0, w1, w2, w3 FROM r{i}"
        for i in range(1, iters + 1)
    )
    return _logreg_chain(iters) + f"\n    {unions}"


def _logreg_fit(spark: SparkSession, sf_dir: str):
    """Shared Spark half of the GD chain (mirrors :func:`_logreg_chain`):
    returns the persisted quantized feature relation, the final trained
    weights as a 4-tuple of doubles, and the per-iteration history rows.
    Referenced by quality_logreg_train (emits the history) and
    quality_logreg_score / corpus_training_batches (apply the final
    weights as literals).

    Execution shape (optimization r16): driver-COORDINATED gradient
    descent — the classic data-parallel GD layout.  Each iteration is
    ONE distributed aggregation over the cached feature relation with
    the entering weights injected as 4 literal doubles, reduced to six
    exact integers (decimal-free: the per-doc terms are FLOOR-quantized
    to BIGINT before summing, so the reduction is order-independent),
    collected to the driver (one 6-value row — bounded, O(1) in corpus
    size), and the weight update applied driver-side.  The arithmetic
    is IEEE-identical to the previous plan-unrolled broadcast chain:
    the update w' = w - FLOOR(LR·g/n)/1e6 runs the same binary64 ops in
    the same order whether Catalyst or CPython evaluates them, and
    weights round-trip exactly through repr/parameter binding.  What
    changed is ONLY the execution plan: the old form nested 12
    broadcast exchanges (83 serialized micro-stages, ~4 s of pure
    stage-launch overhead at sf0.1) and re-built ~2500 Py4J expression
    objects per call (~4-5 s of driver-side construction); this form is
    12 parameterized-SQL jobs over one cached scan (guide §1.2: fix the
    distributed algorithm first — per-iteration work is one corpus
    pass either way, but the orchestration cost drops an order of
    magnitude, and at cluster scale the collect ships 48 bytes where
    the broadcast chain shipped a plan with 12 nested exchanges)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_toks = F.size(toks)
    stop_ratio = _hits(toks, STOPWORDS).cast("double") / n_toks
    feats = d.select(
        "doc_id",
        F.when(
            F.length("text").between(100, 20000) & (stop_ratio >= 0.05),
            1.0,
        )
        .otherwise(0.0)
        .alias("y"),
        (
            F.floor(
                _hits(toks, _LR_X1_WORDS).cast("bigint") * 10000000.0
                / n_toks
            )
            / 1e6
        ).alias("x1"),
        (
            F.floor(
                _hits(toks, _LR_X2_WORDS).cast("bigint") * 10000000.0
                / n_toks
            )
            / 1e6
        ).alias("x2"),
        (F.floor(n_toks.cast("bigint") * 1000000.0 / 600) / 1e6).alias("x3"),
    )
    # feats is scanned by every iteration — persist the tiny feature
    # relation so 12 iterations don't re-read and re-tokenize the corpus
    from math import floor as _pyfloor

    from reindexer_spark.cache import track

    feats = track(feats)
    # run-unique view name (ADVICE r16) — dropped after the GD loop
    import uuid as _uuid

    vfeats = f"__logreg_feats_{_uuid.uuid4().hex[:8]}"
    feats.createOrReplaceTempView(vfeats)
    # One iteration = one parameterized-SQL aggregation (parsed JVM-side
    # in one call — no per-iteration Py4J expression forest) returning
    # SIX EXACT INTEGERS.  Expression structure mirrors the previous
    # DataFrame form token for token: p quantizes through
    # FLOOR(1e6/(1+EXP(-z)))/1e6 with z = ((w0 + w1*x1) + w2*x2) + w3*x3
    # left-associated, per-doc loss/gradient terms FLOOR-quantize to
    # BIGINT before the SUM, so every float op happens pre-reduction and
    # the reduction itself is exact integer addition.
    step_sql = """
      SELECT
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        SUM(CAST(FLOOR(-(y * LN(p + 1.0E-9) + (1.0D - y)
                         * LN(1.0D - p + 1.0E-9)) * 1.0E6) AS BIGINT))
          AS loss_i,
        CAST(SUM(CASE WHEN (p >= 0.5D) = (y = 1.0D) THEN 1 ELSE 0 END)
          AS BIGINT) AS n_correct,
        SUM(CAST(FLOOR((p - y) * 1.0E6) AS BIGINT)) AS g0,
        SUM(CAST(FLOOR((p - y) * x1 * 1.0E6) AS BIGINT)) AS g1,
        SUM(CAST(FLOOR((p - y) * x2 * 1.0E6) AS BIGINT)) AS g2,
        SUM(CAST(FLOOR((p - y) * x3 * 1.0E6) AS BIGINT)) AS g3
      FROM (
        SELECT y, x1, x2, x3,
               FLOOR(1.0E6 / (1.0D + EXP(-(:w0 + :w1 * x1 + :w2 * x2
                                           + :w3 * x3)))) / 1.0E6 AS p
        FROM {vfeats}
      )
    """.replace("{vfeats}", vfeats)
    w0 = w1 = w2 = w3 = 0.0
    n = 0
    hist: list[tuple] = []
    for i in range(1, LOGREG_ITERS + 1):
        r = spark.sql(
            step_sql, args={"w0": w0, "w1": w1, "w2": w2, "w3": w3}
        ).collect()[0]
        # n rides in the aggregate (constant across iterations — one
        # fewer job than a separate count())
        n = int(r["n_docs"])
        # driver-side binary64 arithmetic, op-for-op the Catalyst form:
        # loss = FLOOR(CAST(loss_i AS DOUBLE)/n)/1e6;
        # w'   = w - FLOOR(LR * g / n)/1e6  (LR*g first, then /n)
        loss = _pyfloor(float(r["loss_i"]) / float(n)) / 1e6
        w0 -= _pyfloor(LOGREG_LR * float(r["g0"]) / float(n)) / 1e6
        w1 -= _pyfloor(LOGREG_LR * float(r["g1"]) / float(n)) / 1e6
        w2 -= _pyfloor(LOGREG_LR * float(r["g2"]) / float(n)) / 1e6
        w3 -= _pyfloor(LOGREG_LR * float(r["g3"]) / float(n)) / 1e6
        hist.append((i, loss, int(r["n_correct"]), w0, w1, w2, w3))
    spark.catalog.dropTempView(vfeats)
    return feats, (w0, w1, w2, w3), hist


LOGREG_HIST_SCHEMA = (
    "iter int, loss double, n_correct bigint, "
    "w0 double, w1 double, w2 double, w3 double"
)


def _logreg_score_col(w: tuple[float, float, float, float]):
    """The quantized sigmoid score under literal trained weights —
    identical doubles to the old broadcast-crossJoin form (literals vs
    broadcast columns carry the same binary64 values)."""
    z = (
        F.lit(w[0])
        + F.lit(w[1]) * F.col("x1")
        + F.lit(w[2]) * F.col("x2")
        + F.lit(w[3]) * F.col("x3")
    )
    return F.floor(1e6 / (1.0 + F.exp(-z))) / 1e6


@query("quality_logreg_train", oracle=_logreg_oracle(LOGREG_ITERS))
def quality_logreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a logistic-regression quality classifier with plan-unrolled
    batch gradient descent — the learned-filter slot of a curation
    pipeline (CCNet/fastText-style classifiers gate quality at corpus
    scale).  The label distills the `text_quality` heuristic (length
    band + stopword-rate rule); the features are related but distinct
    surface statistics, so the smooth scorer genuinely has to LEARN the
    rule's boundary: accuracy climbs monotonically from the
    majority-class baseline (294→415 of 500 at sf0.01, asserted
    non-decreasing in tests).  Each of {LOGREG_ITERS} iterations scores
    the corpus under the entering weights (a broadcast 1-row relation),
    reduces gradients as decimal sums of once-rounded per-doc terms,
    and emits one row per iteration with entering loss/accuracy and
    exiting weights.

    Determinism: features are FLOOR-quantized ratios so every input to
    the arithmetic is exact; sigmoid and log-loss round once per
    evaluation (exp/ln are the only transcendentals — libm last-ulp
    drift, the text_tfidf convention); gradient and loss sums go
    through DECIMAL (reduction-order-free); weight updates
    FLOOR-quantize once — so 12 compounding iterations stay bit-exact
    against the chained-CTE oracle.

    Scale shape: per iteration ONE corpus scan (4 multiplies + a
    sigmoid per row, map-side) and one 4-value decimal reduction;
    weights collected/re-injected as an O(1) model — the classic
    data-parallel GD layout where the corpus never reshuffles."""
    _feats, _w, hist = _logreg_fit(spark, sf_dir)
    return spark.createDataFrame(hist, LOGREG_HIST_SCHEMA)


_LOGREG_SCORE_FINAL = f"""
    SELECT f.doc_id, d.source,
           FLOOR(1000000.0 / (1.0 + EXP(-(w.w0 + w.w1 * f.x1
                   + w.w2 * f.x2 + w.w3 * f.x3)))) / 1000000.0 AS score,
           FLOOR(1000000.0 / (1.0 + EXP(-(w.w0 + w.w1 * f.x1
                   + w.w2 * f.x2 + w.w3 * f.x3)))) / 1000000.0 >= 0.5
             AS kept,
           f.y = 1.0 AS rule_label
    FROM feats f
    JOIN documents d USING (doc_id)
    CROSS JOIN w{LOGREG_ITERS} w
    ORDER BY f.doc_id
"""


@query(
    "quality_logreg_score",
    oracle=_logreg_chain(LOGREG_ITERS) + _LOGREG_SCORE_FINAL,
)
def quality_logreg_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained quality classifier back to the corpus — the
    inference half of quality_logreg_train and the learned-filter stage
    a curation pipeline actually runs: train on a labeled slice, then
    score and gate EVERY document.  Emits per-document quantized score,
    the keep decision (score >= 0.5), and the distilled rule's label so
    the gate also value-checks where the smooth scorer disagrees with
    the heuristic it learned from.

    Scale shape: training is the GD chain (one corpus scan per
    iteration, O(1) model); scoring is ONE more corpus-feature scan with
    the 4-weight model injected as literals — map-side only, nothing
    reshuffles; the keep decision pushes down as an ordinary filter for
    downstream consumers."""
    feats, w, _hist = _logreg_fit(spark, sf_dir)
    score = _logreg_score_col(w)
    src_df = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        feats.join(src_df, "doc_id")
        .select(
            "doc_id",
            "source",
            score.alias("score"),
            (score >= 0.5).alias("kept"),
            (F.col("y") == 1.0).alias("rule_label"),
        )
        .orderBy("doc_id")
    )
