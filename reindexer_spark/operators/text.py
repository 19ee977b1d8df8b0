"""Tier C11 — text analysis over ``documents``: language-ID, quality
scoring, token statistics, content fingerprinting.

Everything is built-in column algebra (codegen'd); the fingerprint shows
that even a rolling hash needs no UDF.  All outputs are integer/exact or
single-rounding doubles, so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
