"""North-star text-cleaning operators: PII redaction, normalization,
repetition signals, benchmark-contamination detection (BASELINE.json
`north_star`; the reference has no text processing of its own — it ships
bytes to argot, `ingest.go:29-31`).

Regexes are kept to the syntax subset Java regex (Spark) and RE2 (DuckDB)
share — character classes, bounded repetition, alternation; no lookaround,
no backreferences — so every query stays oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reindexer_spark.catalog import load_table
from reindexer_spark.registry import query

EMAIL_RE = r"[a-z0-9.]+@[a-z0-9.]+\.[a-z]+"
PHONE_RE = r"555-[0-9]{4}"
SHINGLE_K = 5
BENCH_SOURCE = "src0"  # stand-in benchmark/eval corpus


@query(
    "text_pii_redact",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id,
             text || ' contact user' || doc_id::VARCHAR || '@' || source
                  || '.net or 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
               AS raw_text
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(raw_text, '{EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(raw_text, '{PHONE_RE}')) AS n_phones,
           regexp_replace(
             regexp_replace(raw_text, '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{PHONE_RE}', '<PHONE>', 'g') AS redacted,
           LENGTH(raw_text)
             - LENGTH(regexp_replace(
                 regexp_replace(raw_text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                 '{PHONE_RE}', '<PHONE>', 'g')) AS chars_removed
    FROM raw
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count and mask email/phone patterns.

    The testdata text is synthetic and PII-free, so the query first
    derives a raw_text column that embeds a deterministic email+phone per
    row (pure projection of existing columns — no synthesized inputs),
    then runs the real redaction stack: regexp counts for audit, chained
    regexp_replace for masking.  All codegen'd string ops, one scan, no
    shuffle — the shape of a 100 TB scrub pass."""
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@"),
        F.col("source"),
        F.lit(".net or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(raw, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(raw, F.lit(EMAIL_RE), 0))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(raw, F.lit(PHONE_RE), 0))
        .cast("bigint")
        .alias("n_phones"),
        redacted.alias("redacted"),
        (F.length(raw) - F.length(redacted)).cast("bigint").alias("chars_removed"),
    )


# Mojibake signature: a UTF-8 lead byte for the Latin-1 page (0xC2/0xC3)
# read as a Latin-1 char, followed by a continuation byte read the same
# way.  Both engines' regex subsets share \uXXXX-free bracket classes, so
# the class is spelled with literal chars on the Spark side only (the
# oracle pins expected counts arithmetically instead).
MOJI_SIG = "[\u00C2\u00C3][\u0080-\u00BF]"
LATIN1_ONLY = "^[\u0000-\u00FF]*$"


def encoding_fix(x):
    """ONE guarded mojibake-repair round as a codegen column expression
    (shared by text_encoding_repair and the crawl repair flagship so
    the two lanes cannot diverge): re-encode as Latin-1 and re-decode
    as UTF-8, but ONLY when x is Latin-1-page-only (keeps encode()
    total on arbitrary input), shows a mojibake signature, and the
    re-encoded bytes form VALID UTF-8 -- otherwise x passes through
    untouched.  Spark 4's decode() THROWS on malformed input, so the
    CASE short-circuit keeping it off the non-repair path is
    load-bearing."""
    latin1 = F.encode(x, "ISO-8859-1")
    return F.when(
        x.rlike(LATIN1_ONLY) & x.rlike(MOJI_SIG) & F.is_valid_utf8(latin1),
        F.decode(latin1, "UTF-8"),
    ).otherwise(x)


@query(
    "text_encoding_repair",
    oracle="""
    WITH s AS (
      SELECT doc_id, text,
             224 + CAST(('0x' || substr(sha256(text), 1, 2)) AS INT) % 32
               AS c1,
             192 + CAST(('0x' || substr(sha256(text), 3, 2)) AS INT) % 24
               AS c2
      FROM documents
    )
    SELECT doc_id,
      CAST(CASE WHEN doc_id % 6 = 0 THEN 4
                WHEN doc_id % 3 = 0 THEN 2
                ELSE 0 END AS INT) AS n_moji_seqs,
      CAST(CASE WHEN doc_id % 6 = 0 THEN 2
                WHEN doc_id % 3 = 0 THEN 1
                ELSE 0 END AS INT) AS n_repairs,
      CASE WHEN doc_id % 3 = 2 THEN text
           ELSE text || ' ' || chr(c1) || chr(c2) END AS repaired
    FROM s
    """,
)
def text_encoding_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake (encoding-corruption) repair — the ftfy-core cleaning
    pass every crawl pipeline runs: text that was UTF-8 on the wire but
    decoded as Latin-1 somewhere upstream ('é' arriving as 'Ã©'),
    including the DOUBLE-encoded case where the corruption happened
    twice.  The testdata text is pure ASCII, so the query first derives
    a corrupted column per row (pure projection: two digest-picked
    accented chars appended, then mojibake'd 0, 1 or 2 times by
    doc_id class), then runs the real repair stack entirely in codegen:

      fix(x) = re-encode as Latin-1 and re-decode as UTF-8, but ONLY
      when (a) x is Latin-1-page-only, (b) x shows a mojibake
      signature, and (c) the re-encoded bytes form VALID UTF-8 —
      otherwise x is returned untouched.

    Guard (c) is Spark 4's is_valid_utf8; the CASE short-circuit keeps
    the strict decode() (which throws on malformed input) off the
    non-repair path, and the guard order is load-bearing: (a) keeps
    encode() total on arbitrary input, (b)+(c) make the pass a proven
    NO-OP on clean accented text — repairing already-correct 'é' is
    the classic over-correction bug this rule exists to prevent.  Two
    chained fix() applications reach the double-encoding fixpoint.

    The oracle re-derives the expected clean text and repair counts
    arithmetically from sha256(text), so equality proves: single and
    double mojibake both repair to byte-exact originals, clean accented
    and ASCII rows pass through untouched, and the signature count sees
    exactly the corrupted sequences.  One scan, zero shuffle, zero UDF
    — the shape of a 100 TB scrub pass."""
    d = load_table(spark, sf_dir, "documents")
    dg = F.sha2(F.col("text"), 256)
    c1 = F.lit(224) + F.conv(F.substring(dg, 1, 2), 16, 10).cast("int") % 32
    c2 = F.lit(192) + F.conv(F.substring(dg, 3, 2), 16, 10).cast("int") % 24

    def moji(c):  # one mojibake round of a Latin-1 codepoint column
        return F.concat(
            F.char(F.lit(192) + (c / 64).cast("int")), F.char(c % 64 + 128)
        )

    def moji2(c):  # two rounds: each byte of moji(c) mojibake'd again
        lead = F.lit(192) + (c / 64).cast("int")
        trail = c % 64 + 128
        return F.concat(moji(lead), moji(trail))

    clean_tail = F.concat(F.lit(" "), F.char(c1), F.char(c2))
    raw = (
        F.when(
            F.col("doc_id") % 6 == 0,
            F.concat(F.col("text"), F.lit(" "), moji2(c1), moji2(c2)),
        )
        .when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" "), moji(c1), moji(c2)),
        )
        .when(F.col("doc_id") % 3 == 1, F.concat(F.col("text"), clean_tail))
        .otherwise(F.col("text"))
    )

    d2 = d.select(
        "doc_id",
        F.size(F.regexp_extract_all(raw, F.lit(MOJI_SIG), 0))
        .cast("int")
        .alias("n_moji_seqs"),
        raw.alias("_r0"),
    )
    d2 = d2.withColumn("_r1", encoding_fix(F.col("_r0"))).withColumn(
        "_r2", encoding_fix(F.col("_r1"))
    )
    return d2.select(
        "doc_id",
        "n_moji_seqs",
        (
            (F.col("_r1") != F.col("_r0")).cast("int")
            + (F.col("_r2") != F.col("_r1")).cast("int")
        ).alias("n_repairs"),
        F.col("_r2").alias("repaired"),
    )


# The CP1252-specific characters (codepoints > 0xFF) and the C1 chars of
# their byte values: ONE translate() maps a CP1252-misdecoded string back
# onto the Latin-1 page, where the shared Latin-1 repair machinery
# applies.  (Spark whitelists encode/decode charsets to iso-8859-1 /
# us-ascii / utf-8 / utf-16* / utf-32, so windows-1252 cannot be named
# directly -- the translate composition is the codegen route.)
CP1252_SRC = (
    "\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6\u2030\u0160"
    "\u2039\u0152\u017d\u2018\u2019\u201c\u201d\u2022\u2013\u2014"
    "\u02dc\u2122\u0161\u203a\u0153\u017e\u0178"
)
CP1252_DST = (
    "\u0080\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089\u008a"
    "\u008b\u008c\u008e\u0091\u0092\u0093\u0094\u0095\u0096\u0097"
    "\u0098\u0099\u009a\u009b\u009c\u009e\u009f"
)
# any UTF-8 lead byte (2- or 3-byte form) read as Latin-1, followed by a
# continuation byte read the same way
CP1252_MOJI_SIG = "[\u00c2-\u00ef][\u0080-\u00bf]"


def encoding_fix_cp1252(x):
    """One guarded WINDOWS-1252 mojibake-repair round: translate the
    CP1252-specific characters down to the C1 chars of their byte
    values (total, reversible on the guard's no-fire path because the
    original x is returned untouched), then apply the same
    valid-UTF-8-gated re-encode/re-decode as the Latin-1 fix.  Catches
    the most common real-world corruption class -- smart quotes, em
    dashes, euro signs turning into 'â€™' / 'â€"' / 'â‚¬' -- which the
    plain Latin-1 fix cannot, because those corrupted forms contain
    codepoints above 0xFF."""
    y = F.translate(x, CP1252_SRC, CP1252_DST)
    latin1 = F.encode(y, "ISO-8859-1")
    return F.when(
        y.rlike(LATIN1_ONLY)
        & y.rlike(CP1252_MOJI_SIG)
        & F.is_valid_utf8(latin1),
        F.decode(latin1, "UTF-8"),
    ).otherwise(x)


# the five CP1252 casualties real corpora actually show (euro, em dash,
# right single quote, left double quote, trademark) and their
# utf8-read-as-cp1252 corrupted forms (precomputed; each is what
# str.encode('utf-8').decode('windows-1252') produces)
CP1252_SPECIALS = ["\u20ac", "\u2014", "\u2019", "\u201c", "\u2122"]
CP1252_CORRUPTED = [
    "\u00e2\u201a\u00ac",
    "\u00e2\u20ac\u201d",
    "\u00e2\u20ac\u2122",
    "\u00e2\u20ac\u0153",
    "\u00e2\u201e\u00a2",
]


@query(
    "text_encoding_repair_cp1252",
    oracle="""
    WITH s AS (
      SELECT doc_id, text,
             CAST(('0x' || substr(sha256(text), 1, 2)) AS INT) % 5 AS i
      FROM documents
    )
    SELECT doc_id,
      CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INT)
        AS was_corrupted,
      CASE WHEN doc_id % 3 = 2 THEN text
           ELSE text || ' ' ||
             [chr(8364), chr(8212), chr(8217), chr(8220), chr(8482)][i + 1]
      END AS repaired
    FROM s
    """,
)
def text_encoding_repair_cp1252(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINDOWS-1252 mojibake repair -- the variant real corpora need
    most: CP1252 is the web's de-facto 'latin-1', and UTF-8 text
    misread through it turns smart quotes / em dashes / euro signs into
    'â€™' / 'â€"' / 'â‚¬'.  Those corrupted forms contain codepoints
    ABOVE 0xFF (the CP1252 0x80-0x9F page), so the plain Latin-1 repair
    cannot see them; this lane's fix first translate()s the 27
    CP1252-specific characters down to the C1 chars of their byte
    values, then applies the same valid-UTF-8-gated re-encode/re-decode
    (encoding_fix_cp1252, shared module machinery).

    Fixture: one digest-picked CP1252 casualty is appended per row --
    corrupted form on doc_id%3==0, CLEAN form on doc_id%3==1 (the
    must-not-touch case: the guard proves a real '"' or '(tm)' in clean
    text never triggers a rewrite, because its translated bytes are not
    valid UTF-8), plain ASCII otherwise.  The oracle re-derives the
    expected repaired text arithmetically from sha256(text), so
    equality proves repair fires on exactly the corrupted rows and
    recovers the original characters byte-exactly.  One scan, zero
    shuffle, zero UDF."""
    d = load_table(spark, sf_dir, "documents")
    dg = F.sha2(F.col("text"), 256)
    i = F.conv(F.substring(dg, 1, 2), 16, 10).cast("int") % 5
    spec = F.element_at(F.array(*[F.lit(c) for c in CP1252_SPECIALS]), i + 1)
    corr = F.element_at(F.array(*[F.lit(c) for c in CP1252_CORRUPTED]), i + 1)
    raw = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" "), corr),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.col("text"), F.lit(" "), spec),
        )
        .otherwise(F.col("text"))
    )
    fixed = encoding_fix_cp1252(raw)
    return d.select(
        "doc_id",
        (fixed != raw).cast("int").alias("was_corrupted"),
        fixed.alias("repaired"),
    )


@query(
    "text_repetition",
    oracle="""
    WITH uni AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), ucnt AS (
      SELECT doc_id, w, COUNT(*) AS c FROM uni GROUP BY 1, 2
    ), ustat AS (
      SELECT doc_id, MAX(c) AS top_unigram, SUM(c) AS n_words FROM ucnt GROUP BY 1
    ), bi AS (
      SELECT doc_id, unnest(
               list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
             ) AS bg
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ), bcnt AS (
      SELECT doc_id, bg, COUNT(*) AS c FROM bi GROUP BY 1, 2
    ), bstat AS (
      SELECT doc_id, MAX(c) AS top_bigram, SUM(c) AS n_bigrams FROM bcnt GROUP BY 1
    )
    SELECT u.doc_id,
           CAST(u.top_unigram AS DOUBLE) / u.n_words AS top_unigram_frac,
           CAST(b.top_bigram AS DOUBLE) / b.n_bigrams AS top_bigram_frac,
           (CAST(u.top_unigram AS DOUBLE) / u.n_words > 0.2
            OR CAST(b.top_bigram AS DOUBLE) / b.n_bigrams > 0.18)
             AS is_repetitive
    FROM ustat u JOIN bstat b USING (doc_id)
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: fraction of the document taken by
    its most frequent unigram and bigram, plus the filter verdict.

    The per-doc counting never leaves the doc_id key, so both aggregates
    hash-partition on doc_id and the final join is co-partitioned —
    one logical shuffle key end to end.  Documents are independent, so
    this scales linearly and skew equals the longest document."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    uni = d.select("doc_id", F.explode(words).alias("w"))
    ustat = (
        uni.groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_unigram"), F.sum("c").alias("n_words"))
    )
    wcol = F.col("w")
    bi = d.select("doc_id", words.alias("w")).select(
        "doc_id",
        F.explode(
            # guard: a 1-word doc gives size-1 == 0, and sequence(1, 0) is
            # DESCENDING in Spark → element_at(w, 0) raises; emit no bigrams
            F.when(
                F.size(wcol) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(wcol) - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at(wcol, i), F.element_at(wcol, i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bg"),
    )
    bstat = (
        bi.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram"), F.sum("c").alias("n_bigrams"))
    )
    ufrac = F.col("top_unigram").cast("double") / F.col("n_words")
    bfrac = F.col("top_bigram").cast("double") / F.col("n_bigrams")
    return ustat.join(bstat, "doc_id").select(
        "doc_id",
        ufrac.alias("top_unigram_frac"),
        bfrac.alias("top_bigram_frac"),
        ((ufrac > 0.2) | (bfrac > 0.18)).alias("is_repetitive"),
    )


def _shingle_sql(k: int) -> str:
    return (
        f"list_transform(range(1, len(w) - {k - 2}), "
        f"i -> array_to_string(w[i:i+{k - 1}], ' '))"
    )


@query(
    "text_contamination",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ), shingles AS (
      SELECT doc_id, source, unnest({_shingle_sql(SHINGLE_K)}) AS sh FROM docs
    ), bench AS (
      SELECT DISTINCT sh FROM shingles WHERE source = '{BENCH_SOURCE}'
    ), cand AS (
      SELECT DISTINCT doc_id, sh FROM shingles WHERE source <> '{BENCH_SOURCE}'
    ), hits AS (
      SELECT c.doc_id,
             COUNT(*) AS n_shingles,
             COUNT(b.sh) AS n_overlap
      FROM cand c LEFT JOIN bench b USING (sh)
      GROUP BY c.doc_id
    )
    SELECT doc_id, n_shingles, n_overlap,
           CAST(n_overlap AS DOUBLE) / n_shingles AS contamination,
           CAST(n_overlap AS DOUBLE) / n_shingles >= 0.8 AS is_contaminated
    FROM hits
    """,
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: fraction of a document's distinct
    5-word shingles that also appear in the benchmark corpus (stand-in:
    source 'src0'), the standard eval-decontamination pass before
    training.

    Scale shape: both sides are deduped to distinct shingles BEFORE the
    join (bounds the blowup of repeated n-grams); the benchmark shingle
    set is tiny relative to the corpus → Spark broadcasts it, so the
    100 TB side never shuffles.  Counting hits with count(b.sh) on a left
    join keeps zero-overlap documents in the output."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("w")
    )
    wcol = F.col("w")
    k = SHINGLE_K
    sh = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.when(
                F.size(wcol) >= k,
                F.transform(
                    F.sequence(F.lit(1), F.size(wcol) - (k - 1)),
                    lambda i: F.array_join(F.slice(wcol, i, k), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("sh"),
    )
    bench = (
        sh.filter(F.col("source") == BENCH_SOURCE).select("sh").distinct()
    )
    cand = (
        sh.filter(F.col("source") != BENCH_SOURCE)
        .select("doc_id", "sh")
        .distinct()
    )
    hits = (
        cand.join(F.broadcast(bench.withColumn("bsh", F.col("sh"))), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("bsh").alias("n_overlap"),
        )
    )
    contamination = F.col("n_overlap").cast("double") / F.col("n_shingles")
    return hits.select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        contamination.alias("contamination"),
        (contamination >= 0.8).alias("is_contaminated"),
    )


_FUNNEL_SQL = f"""
    WITH uni AS (
      SELECT doc_id, w, COUNT(*) AS c FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
      ) GROUP BY 1, 2
    ), ustat AS (
      SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS uf FROM uni GROUP BY 1
    ), bi AS (
      SELECT doc_id, bg, COUNT(*) AS c FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w)),
                                     i -> w[i] || ' ' || w[i+1])) AS bg
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      ) GROUP BY 1, 2
    ), bstat AS (
      SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS bf FROM bi GROUP BY 1
    ), shingles AS (
      SELECT doc_id, source,
             unnest(list_transform(range(1, len(w) - {{km2}}),
                                   i -> array_to_string(w[i:i+{{km1}}], ' '))) AS sh
      FROM (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents)
    ), bench AS (
      SELECT DISTINCT sh FROM shingles WHERE source = '{BENCH_SOURCE}'
    ), cand AS (
      SELECT DISTINCT doc_id, sh FROM shingles WHERE source <> '{BENCH_SOURCE}'
    ), cont AS (
      SELECT c.doc_id,
             (CAST(COUNT(b.sh) AS DOUBLE) / COUNT(*)) >= 0.8 AS is_contaminated
      FROM cand c LEFT JOIN bench b USING (sh)
      GROUP BY c.doc_id
    ), flags AS (
      SELECT d.doc_id, d.text, d.source,
             (d.source <> '{BENCH_SOURCE}') AS nonbench,
             (LENGTH(d.text) BETWEEN 100 AND 20000
              AND CAST({{stop_hits}} AS DOUBLE)
                  / len(string_split(d.text, ' ')) >= 0.05) AS q,
             COALESCE(u.uf > 0.2, FALSE) OR COALESCE(b.bf > 0.18, FALSE) AS rep_flag,
             COALESCE(c.is_contaminated, FALSE) AS cont_flag,
             substr(md5(d.doc_id::VARCHAR), 1, 4) AS h4
      FROM documents d
      LEFT JOIN ustat u USING (doc_id)
      LEFT JOIN bstat b USING (doc_id)
      LEFT JOIN cont c USING (doc_id)
    ), staged AS (
      SELECT *,
             nonbench AND q AS s2,
             nonbench AND q AND NOT rep_flag AS s3,
             nonbench AND q AND NOT rep_flag AND NOT cont_flag AS s4
      FROM flags
    ), deduped AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY text, s4 ORDER BY doc_id) AS rn
      FROM staged
    ), final AS (
      SELECT *,
             (s4 AND rn = 1) AS s5,
             (s4 AND rn = 1 AND h4 < CASE source
                WHEN 'src1' THEN '8000' WHEN 'src2' THEN '4000'
                ELSE '199a' END) AS s6
      FROM deduped
    )
    SELECT 'a_input' AS stage, COUNT(*) AS n_docs FROM final
    UNION ALL SELECT 'b_non_benchmark', COUNT(*) FILTER (WHERE nonbench) FROM final
    UNION ALL SELECT 'c_quality', COUNT(*) FILTER (WHERE s2) FROM final
    UNION ALL SELECT 'd_not_repetitive', COUNT(*) FILTER (WHERE s3) FROM final
    UNION ALL SELECT 'e_decontaminated', COUNT(*) FILTER (WHERE s4) FROM final
    UNION ALL SELECT 'f_deduped', COUNT(*) FILTER (WHERE s5) FROM final
    UNION ALL SELECT 'g_mixed', COUNT(*) FILTER (WHERE s6) FROM final
"""


@query(
    "corpus_curation_funnel",
    oracle=_FUNNEL_SQL.format(
        km2=SHINGLE_K - 2,
        km1=SHINGLE_K - 1,
        stop_hits="len(list_filter(string_split(d.text, ' '), "
        "t -> t IN ('the', 'a', 'and', 'of', 'to', 'in', 'is', 'on', 'for')))",
    ),
)
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-corpus curation pipeline as ONE query: benchmark
    holdout → quality gate → repetition filter → decontamination → exact
    dedup → source mixing, reported as a survivor funnel.

    Composition reuses the individual operators (text_quality,
    text_repetition, text_contamination — each independently
    oracle-checked), joins their verdicts as boolean flags, and counts
    every stage in ONE conditional aggregation over one pass of the
    corpus — no stage is rescanned, which is the difference between a
    7-job pipeline and a 1-job pipeline at 100 TB.  Dedup-rank windows
    by (text, survivor-flag) so the kept representative is the smallest
    surviving doc_id, computed without a separate filtered pass."""
    from reindexer_spark.operators.sampling import MIX_DEFAULT_HEX, MIX_WEIGHTS
    from reindexer_spark.operators.text import text_quality

    d = load_table(spark, sf_dir, "documents")
    quality = text_quality(spark, sf_dir).select("doc_id", "is_quality")
    rep = text_repetition(spark, sf_dir).select("doc_id", "is_repetitive")
    cont = text_contamination(spark, sf_dir).select("doc_id", "is_contaminated")

    mix_hex = (
        F.when(F.col("source") == "src1", MIX_WEIGHTS["src1"])
        .when(F.col("source") == "src2", MIX_WEIGHTS["src2"])
        .otherwise(MIX_DEFAULT_HEX)
    )
    flags = (
        d.join(quality, "doc_id", "left")
        .join(rep, "doc_id", "left")
        .join(cont, "doc_id", "left")
        .select(
            "doc_id",
            "text",
            "source",
            (F.col("source") != BENCH_SOURCE).alias("nonbench"),
            F.coalesce("is_quality", F.lit(False)).alias("q"),
            F.coalesce("is_repetitive", F.lit(False)).alias("rep_flag"),
            F.coalesce("is_contaminated", F.lit(False)).alias("cont_flag"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4).alias("h4"),
        )
    )
    staged = flags.select(
        "*",
        (F.col("nonbench") & F.col("q")).alias("s2"),
        (F.col("nonbench") & F.col("q") & ~F.col("rep_flag")).alias("s3"),
        (
            F.col("nonbench") & F.col("q") & ~F.col("rep_flag") & ~F.col("cont_flag")
        ).alias("s4"),
    )
    from pyspark.sql.window import Window

    rn = F.row_number().over(
        Window.partitionBy("text", "s4").orderBy("doc_id")
    )
    final = staged.withColumn("rn", rn).select(
        "*",
        (F.col("s4") & (F.col("rn") == 1)).alias("s5"),
        (F.col("s4") & (F.col("rn") == 1) & (F.col("h4") < mix_hex)).alias("s6"),
    )
    agg = final.agg(
        F.count("*").alias("n0"),
        F.count_if(F.col("nonbench")).alias("n1"),
        F.count_if(F.col("s2")).alias("n2"),
        F.count_if(F.col("s3")).alias("n3"),
        F.count_if(F.col("s4")).alias("n4"),
        F.count_if(F.col("s5")).alias("n5"),
        F.count_if(F.col("s6")).alias("n6"),
    )
    return agg.select(
        F.expr(
            "stack(7, 'a_input', n0, 'b_non_benchmark', n1, 'c_quality', n2, "
            "'d_not_repetitive', n3, 'e_decontaminated', n4, 'f_deduped', n5, "
            "'g_mixed', n6) AS (stage, n_docs)"
        )
    )


@query(
    "text_bigram_lm",
    oracle="""
    WITH bi AS (
      SELECT unnest(list_transform(range(1, len(w)),
                                   i -> [w[i], w[i+1]])) AS pair
      FROM (SELECT string_split(text, ' ') AS w FROM documents)
    ), bcnt AS (
      SELECT pair[1] AS w1, pair[2] AS w2, COUNT(*) AS c_bi
      FROM bi GROUP BY 1, 2
    ), ucnt AS (
      SELECT w1, SUM(c_bi) AS c_uni FROM bcnt GROUP BY w1
    ), scored AS (
      SELECT b.w1, b.w2, b.c_bi,
             ROUND(CAST(b.c_bi AS DOUBLE) / u.c_uni, 6) AS p_next,
             ROW_NUMBER() OVER (PARTITION BY b.w1
                                ORDER BY b.c_bi DESC, b.w2) AS rnk
      FROM bcnt b JOIN ucnt u USING (w1)
    )
    SELECT w1, w2, c_bi, p_next, rnk FROM scored WHERE rnk <= 3
    """,
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model estimation: P(w2 | w1) with the top-3
    continuations per word.

    The continuation denominator is the sum of the word's bigram counts
    (not its raw unigram count), so the distribution sums to 1 by
    construction.  Everything aggregates to vocabulary-sized relations
    before the window; the corpus-sized explode feeds a map-side
    combinable count, which is what keeps an n-gram LM build tractable
    over a 100 TB corpus."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    wcol = F.col("w")
    bi = d.select(w.alias("w")).select(
        F.explode(
            # guard as in text_repetition: 1-word docs emit no bigrams
            # instead of a descending sequence(1, 0) → element_at(w, 0) error
            F.when(
                F.size(wcol) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(wcol) - 1),
                    lambda i: F.array(
                        F.element_at(wcol, i), F.element_at(wcol, i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<array<string>>"))
        ).alias("pair")
    )
    bcnt = (
        bi.select(
            F.col("pair")[0].alias("w1"), F.col("pair")[1].alias("w2")
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_bi"))
    )
    ucnt = bcnt.groupBy("w1").agg(F.sum("c_bi").alias("c_uni"))
    from pyspark.sql.window import Window

    rnk = F.row_number().over(
        Window.partitionBy("w1").orderBy(F.desc("c_bi"), F.asc("w2"))
    )
    return (
        bcnt.join(ucnt, "w1")
        .select(
            "w1",
            "w2",
            "c_bi",
            F.round(F.col("c_bi").cast("double") / F.col("c_uni"), 6).alias(
                "p_next"
            ),
            rnk.alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), trans AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS c
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ), totals AS (
      SELECT prev_type, SUM(c) AS total FROM trans GROUP BY prev_type
    )
    SELECT t.prev_type, t.next_type, t.c,
           ROUND(CAST(t.c AS DOUBLE) / x.total, 6) AS p_transition
    FROM trans t JOIN totals x USING (prev_type)
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (lag window keyed by user, ordered by time with event_id
    tie-break).

    The lag window shuffles once on user_id — sequences stay local to
    their partition — and everything after is |event types|² rows.  This
    is the sequence-statistics shape (session flows, clickstream models)
    that needs no UDF and no driver-side state."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    seq = e.select(
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("c")
    )
    totals = trans.groupBy("prev_type").agg(F.sum("c").alias("total"))
    return trans.join(totals, "prev_type").select(
        "prev_type",
        "next_type",
        "c",
        F.round(F.col("c").cast("double") / F.col("total"), 6).alias(
            "p_transition"
        ),
    )


@query(
    "docs_zipf_slope",
    oracle="""
    WITH counts AS (
      SELECT w, COUNT(*) AS c FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
      ) GROUP BY w
    ), ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rnk FROM counts
    )
    SELECT ROUND(regr_slope(LN(c), LN(rnk)), 4) AS zipf_slope,
           ROUND(regr_r2(LN(c), LN(rnk)), 4) AS fit_r2,
           COUNT(*) AS vocab_size
    FROM ranked
    """,
)
def docs_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus: OLS slope of log-frequency vs
    log-rank (a healthy natural-language corpus sits near -1; a heavily
    duplicated or template-generated one does not — this is a cheap
    corpus-health metric for a training pipeline).

    The regression runs over the vocabulary relation (already
    aggregated), so the linear-regression aggregate — regr_slope /
    regr_r2, both single-pass and map-side combinable — touches |vocab|
    rows regardless of corpus size.  Results round to 4 decimals: the
    regression moments are double sums whose reduction-order drift is
    ~1e-13 relative, far inside the rounding."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    from pyspark.sql.window import Window

    ranked = counts.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.desc("c"), F.asc("w")))
        .alias("rnk"),
    )
    return ranked.agg(
        F.round(F.regr_slope(F.log("c"), F.log("rnk")), 4).alias("zipf_slope"),
        F.round(F.regr_r2(F.log("c"), F.log("rnk")), 4).alias("fit_r2"),
        F.count("*").alias("vocab_size"),
    )


@query(
    "docs_langid_confusion",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '), t -> t IN ('der', 'die', 'und', 'ist', 'nicht'))) AS hits_de,
             len(list_filter(string_split(text, ' '), t -> t IN ('the', 'and', 'of', 'to', 'is'))) AS hits_en,
             len(list_filter(string_split(text, ' '), t -> t IN ('el', 'la', 'de', 'que', 'es'))) AS hits_es,
             len(list_filter(string_split(text, ' '), t -> t IN ('le', 'la', 'et', 'les', 'des'))) AS hits_fr,
             len(list_filter(string_split(text, ' '), t -> t IN ('de', 'shi', 'le', 'bu', 'wo'))) AS hits_zh
      FROM documents
    ), pred AS (
      SELECT lang,
             CASE GREATEST(hits_de, hits_en, hits_es, hits_fr, hits_zh)
               WHEN hits_de THEN 'de' WHEN hits_en THEN 'en'
               WHEN hits_es THEN 'es' WHEN hits_fr THEN 'fr'
               ELSE 'zh' END AS pred_lang
      FROM scored
    )
    SELECT lang, pred_lang, COUNT(*) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (PARTITION BY lang), 6) AS row_frac
    FROM pred GROUP BY 1, 2
    """,
)
def docs_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the heuristic language-ID against the labeled
    lang column, with per-true-language row fractions — the evaluation
    query every classifier in the pipeline needs, built by reusing
    text_langid's scoring and aggregating to a |langs|² relation (the
    window share runs on that tiny aggregate)."""
    from reindexer_spark.operators.text import text_langid

    pred = text_langid(spark, sf_dir).select("lang", "pred_lang")
    counts = pred.groupBy("lang", "pred_lang").agg(F.count("*").alias("n"))
    from pyspark.sql.window import Window

    share = F.col("n").cast("double") / F.sum("n").over(
        Window.partitionBy("lang")
    )
    return counts.select(
        "lang", "pred_lang", "n", F.round(share, 6).alias("row_frac")
    )


@query(
    "events_json_profile",
    oracle=r"""
    WITH keys AS (
      SELECT event_id, unnest(regexp_extract_all(props, '"([a-z_0-9]+)":', 1)) AS k,
             props
      FROM events
    )
    SELECT k,
           COUNT(*) AS n_present,
           COUNT(*) FILTER (
             WHERE regexp_matches(props, '"' || k || '":\s*-?[0-9]')
           ) AS n_numeric,
           COUNT(*) FILTER (
             WHERE regexp_matches(props, '"' || k || '":\s*"')
           ) AS n_string
    FROM keys GROUP BY k
    """,
)
def events_json_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schemaless-JSON profiling: which keys appear in the props payload
    and what value types they carry — the schema-inference audit that
    precedes a from_json schema freeze (SURVEY §7 'dynamic Argot payload
    schema').  Pure regexp column algebra so the profile is engine-exact;
    at scale this is one explode + hash agg over key names only, never
    materializing parsed documents."""
    e = load_table(spark, sf_dir, "events")
    keys = e.select(
        "props",
        F.explode(
            F.regexp_extract_all(F.col("props"), F.lit(r'"([a-z_0-9]+)":'), 1)
        ).alias("k"),
    )
    # rlike with a per-row pattern needs the SQL expression form (the
    # DataFrame helper only accepts literal patterns)
    num_match = F.expr(r"""props rlike concat('"', k, '":\\s*-?[0-9]')""")
    str_match = F.expr(r"""props rlike concat('"', k, '":\\s*"')""")
    return keys.groupBy("k").agg(
        F.count("*").alias("n_present"),
        F.count_if(num_match).alias("n_numeric"),
        F.count_if(str_match).alias("n_string"),
    )


@query(
    "text_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
    ), freq AS (
      SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY 1, 2
    ), tot AS (
      SELECT doc_id, SUM(c) AS n, COUNT(*) AS n_distinct FROM freq GROUP BY 1
    )
    SELECT f.doc_id, t.n_distinct,
           ROUND(SUM(CAST(ROUND(
             -(CAST(f.c AS DOUBLE) / t.n) * LN(CAST(f.c AS DOUBLE) / t.n),
             10) AS DECIMAL(18,12))), 6) AS entropy
    FROM freq f JOIN tot t USING (doc_id)
    GROUP BY f.doc_id, t.n_distinct
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the cheap
    gibberish/binary-noise detector of a corpus quality gate (natural
    text sits ~3-4.5 bits·ln2; near-zero or near-uniform values flag
    junk).

    Determinism: each -p·ln(p) term is rounded once (ln differs in the
    last ulp across libm implementations), then summed as DECIMAL so the
    per-document total is independent of aggregation order.  The char
    explode aggregates immediately on (doc_id, char) — alphabet-sized
    state per document, map-side combinable."""
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("c"))
    )
    tot = freq.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.count("*").alias("n_distinct")
    )
    p = F.col("c").cast("double") / F.col("n")
    term = F.round(-p * F.log(p), 10).cast("decimal(18,12)")
    return (
        freq.join(tot, "doc_id")
        .groupBy("doc_id", "n_distinct")
        # cast("double"): ROUND(DECIMAL) stays DECIMAL in Spark but DuckDB's
        # .df() renders its DECIMAL as float64 — align the pandas dtypes
        .agg(F.round(F.sum(term), 6).cast("double").alias("entropy"))
        .select("doc_id", "n_distinct", "entropy")
    )


@query(
    "text_perplexity_bigram",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), pairs AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)),
                                   i -> [w[i], w[i+1]])) AS pair
      FROM words
    ), p2 AS (
      SELECT doc_id, pair[1] AS w1, pair[2] AS w2 FROM pairs
    ), bcnt AS (
      SELECT w1, w2, COUNT(*) AS c_bi FROM p2 GROUP BY 1, 2
    ), ucnt AS (
      SELECT w1, SUM(c_bi) AS c_uni FROM bcnt GROUP BY w1
    ), lm AS (
      SELECT b.w1, b.w2,
             CAST(FLOOR(-LN(CAST(b.c_bi AS DOUBLE) / u.c_uni) * 1000000)
                  AS BIGINT) AS nll_micro
      FROM bcnt b JOIN ucnt u USING (w1)
    )
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(l.nll_micro) AS BIGINT) AS sum_nll_micro
    FROM p2 p JOIN lm l USING (w1, w2)
    GROUP BY p.doc_id
    """,
)
def text_perplexity_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document surprise under the corpus's own bigram LM — the
    classic LM-based quality filter (CCNet/Gopher score documents with a
    reference LM and drop the high-perplexity tail).  Here the LM is the
    corpus itself (leave-nothing-out MLE), so the score flags documents
    whose word transitions are atypical for the corpus: gibberish,
    boilerplate, wrong-language contamination.

    Output is (doc_id, n_bigrams, sum_nll_micro): the total negative
    log-likelihood in integer MICRO-NATS.  Each bigram's -ln P(w2|w1) is
    floor-quantized to an integer once, at the (vocabulary-sized) LM
    relation, then summed exactly — so the corpus-sized aggregation is
    pure integer math and reduction-order-proof, and no float average
    ever crosses the engine boundary (the consumer divides by n_bigrams
    for mean NLL / exp for perplexity).  Docs with <2 words have no
    bigrams and drop out naturally on both engines.

    Scale shape: the LM is vocabulary² at worst (bigram types, not
    tokens) and aggregates with map-side partials; the per-doc score
    joins token-level bigrams to the LM on (w1, w2) — a hash join whose
    build side is the LM — then reduces by doc_id.  Nothing is
    quadratic in corpus size."""
    d = load_table(spark, sf_dir, "documents")
    wcol = F.col("w")
    p2 = (
        d.select("doc_id", F.split("text", " ").alias("w"))
        .select(
            "doc_id",
            F.explode(
                F.when(
                    F.size(wcol) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(wcol) - 1),
                        lambda i: F.array(
                            F.element_at(wcol, i), F.element_at(wcol, i + 1)
                        ),
                    ),
                ).otherwise(F.array().cast("array<array<string>>"))
            ).alias("pair"),
        )
        .select(
            "doc_id",
            F.col("pair")[0].alias("w1"),
            F.col("pair")[1].alias("w2"),
        )
    )
    bcnt = p2.groupBy("w1", "w2").agg(F.count("*").alias("c_bi"))
    ucnt = bcnt.groupBy("w1").agg(F.sum("c_bi").alias("c_uni"))
    lm = bcnt.join(ucnt, "w1").select(
        "w1",
        "w2",
        F.floor(
            -F.log(F.col("c_bi").cast("double") / F.col("c_uni")) * 1e6
        )
        .cast("bigint")
        .alias("nll_micro"),
    )
    return (
        p2.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum("nll_micro").cast("bigint").alias("sum_nll_micro"),
        )
    )


@query(
    "dq_schema_drift",
    oracle=r"""
    WITH keys AS (
      SELECT substr(md5(event_id::VARCHAR), 1, 4) < '8000' AS in_a,
             unnest(regexp_extract_all(props, '"([a-z_0-9]+)":', 1)) AS k,
             props
      FROM events
    ),
    prof AS (
      SELECT k,
             COUNT(*) FILTER (WHERE in_a) AS n_a,
             COUNT(*) FILTER (WHERE NOT in_a) AS n_b,
             COUNT(*) FILTER (
               WHERE in_a AND regexp_matches(props, '"' || k || '":\s*-?[0-9]')
             ) AS n_numeric_a,
             COUNT(*) FILTER (
               WHERE NOT in_a AND regexp_matches(props, '"' || k || '":\s*-?[0-9]')
             ) AS n_numeric_b
      FROM keys GROUP BY k
    )
    SELECT k, n_a, n_b, n_numeric_a, n_numeric_b,
           CASE WHEN n_a = 0 THEN 'added'
                WHEN n_b = 0 THEN 'removed'
                ELSE 'common' END AS status,
           (n_a > 0 AND n_b > 0
            AND ((n_numeric_a > 0) <> (n_numeric_b > 0))) AS type_flip
    FROM prof
    """,
)
def dq_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift audit between two ingest batches (md5-half split of
    events, standing in for yesterday/today): which JSON props keys were
    added, removed, or flipped value type across batches — the check
    that catches an upstream producer change before a from_json schema
    freeze turns it into silent nulls (the same failure class as the
    reference's un-validated dynamic Argot payloads, SURVEY §0.1).

    Scale shape: ONE events scan, key explode, single conditional
    aggregation keyed on the key name — no join anywhere; both batch
    profiles are columns of the same hash-agg row.  At 100 TB this is
    the shape of any two-partition-compare audit."""
    e = load_table(spark, sf_dir, "events")
    in_a = (
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 4)
        < F.lit("8000")
    )
    keys = e.select(
        "props",
        in_a.alias("in_a"),
        F.explode(
            F.regexp_extract_all(F.col("props"), F.lit(r'"([a-z_0-9]+)":'), 1)
        ).alias("k"),
    )
    num_match = F.expr(r"""props rlike concat('"', k, '":\\s*-?[0-9]')""")
    prof = keys.groupBy("k").agg(
        F.count_if(F.col("in_a")).alias("n_a"),
        F.count_if(~F.col("in_a")).alias("n_b"),
        F.count_if(F.col("in_a") & num_match).alias("n_numeric_a"),
        F.count_if(~F.col("in_a") & num_match).alias("n_numeric_b"),
    )
    status = (
        F.when(F.col("n_a") == 0, F.lit("added"))
        .when(F.col("n_b") == 0, F.lit("removed"))
        .otherwise(F.lit("common"))
    )
    type_flip = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & ((F.col("n_numeric_a") > 0) != (F.col("n_numeric_b") > 0))
    )
    return prof.select(
        "k",
        "n_a",
        "n_b",
        "n_numeric_a",
        "n_numeric_b",
        status.alias("status"),
        type_flip.alias("type_flip"),
    )


KN_DISCOUNT = 0.75


@query(
    "text_kneser_ney",
    oracle=f"""
    WITH bi AS (
      SELECT unnest(list_transform(range(1, len(w)),
                                   i -> [w[i], w[i+1]])) AS pair
      FROM (SELECT string_split(text, ' ') AS w FROM documents)
    ), bcnt AS (
      SELECT pair[1] AS w1, pair[2] AS w2, COUNT(*) AS c_bi
      FROM bi GROUP BY 1, 2
    ), ucnt AS (
      SELECT w1, CAST(SUM(c_bi) AS BIGINT) AS c_uni FROM bcnt GROUP BY w1
    ), n1f AS (
      SELECT w1, CAST(COUNT(*) AS BIGINT) AS nf FROM bcnt GROUP BY w1
    ), n1b AS (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS nb FROM bcnt GROUP BY w2
    ), tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM bcnt),
    scored AS (
      SELECT b.w1, b.w2, b.c_bi,
             ROUND(
               (GREATEST(CAST(b.c_bi AS DOUBLE) - {KN_DISCOUNT}, 0.0)
                / u.c_uni)
               + ((({KN_DISCOUNT} * f.nf) / u.c_uni)
                  * (CAST(k.nb AS DOUBLE) / (SELECT t FROM tt))),
               6) AS p_kn
      FROM bcnt b
      JOIN ucnt u USING (w1)
      JOIN n1f f USING (w1)
      JOIN n1b k USING (w2)
    )
    SELECT w1, w2, c_bi, p_kn,
           ROW_NUMBER() OVER (
             PARTITION BY w1 ORDER BY p_kn DESC, w2
           ) AS rnk
    FROM scored QUALIFY rnk <= 3
    """,
)
def text_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM — the smoothing every serious
    n-gram model uses, next to text_bigram_lm's raw MLE: discounted
    bigram mass is redistributed via the CONTINUATION probability (how
    many distinct contexts a word follows), which is what lets the model
    back off sensibly for unseen pairs.  Top-3 smoothed continuations
    per word.

    Scale shape identical to the MLE build: the corpus-sized explode
    feeds one map-side-combinable count; every subsequent relation
    (context totals, distinct-continuation counts, the bigram-type
    total) is vocabulary-bounded, and the final window runs on the
    vocabulary-sized scored relation.  Determinism: all inputs to the
    probability are exact integers; the expression uses only IEEE
    correctly-rounded ops in an explicitly parenthesized order, then
    rounds once at 1e-6 — and the rank orders by the ROUNDED value, so
    the window is engine-stable too."""
    from pyspark.sql.window import Window

    from reindexer_spark.cache import track

    d = load_table(spark, sf_dir, "documents")
    wcol = F.col("w")
    bi = d.select(F.split("text", " ").alias("w")).select(
        F.explode(
            F.when(
                F.size(wcol) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(wcol) - 1),
                    lambda i: F.array(
                        F.element_at(wcol, i), F.element_at(wcol, i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<array<string>>"))
        ).alias("pair")
    )
    bcnt = track(
        bi.select(
            F.col("pair")[0].alias("w1"), F.col("pair")[1].alias("w2")
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_bi"))
    )
    ucnt = bcnt.groupBy("w1").agg(F.sum("c_bi").alias("c_uni"))
    n1f = bcnt.groupBy("w1").agg(F.count("*").alias("nf"))
    n1b = bcnt.groupBy("w2").agg(F.count("*").alias("nb"))
    tt = bcnt.agg(F.count("*").alias("t"))
    p_kn = F.round(
        (
            F.greatest(
                F.col("c_bi").cast("double") - KN_DISCOUNT, F.lit(0.0)
            )
            / F.col("c_uni")
        )
        + (
            ((KN_DISCOUNT * F.col("nf")) / F.col("c_uni"))
            * (F.col("nb").cast("double") / F.col("t"))
        ),
        6,
    )
    scored = (
        bcnt.join(F.broadcast(ucnt), "w1")
        .join(F.broadcast(n1f), "w1")
        .join(F.broadcast(n1b), "w2")
        .crossJoin(F.broadcast(tt))
        .select("w1", "w2", "c_bi", p_kn.alias("p_kn"))
    )
    w = Window.partitionBy("w1").orderBy(F.desc("p_kn"), F.asc("w2"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 3
    )


# First-iteration BPE merge statistics — tokenizer-training prep.  Real
# BPE trainers (Sennrich et al. 2016; the pattern behind GPT/Llama
# tokenizers) never iterate over the corpus: they aggregate once to a
# word-frequency VOCABULARY relation, then select merges over that
# vocab-sized table.  This operator is that first merge-selection step
# at corpus scale; subsequent merges re-run the same vocab-sized
# aggregation driver-side (the text_bigram_lm / text_kneser_ney loop
# pattern).
BPE_TOP = 64


@query(
    "text_bpe_pairs",
    oracle=f"""
    WITH words AS (
      SELECT w, COUNT(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE len(w) >= 2
      GROUP BY w
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, len(w)),
                                   i -> substr(w, i, 2))) AS pair,
             freq
      FROM words
    )
    SELECT pair, CAST(SUM(freq) AS BIGINT) AS freq
    FROM pairs
    GROUP BY pair
    ORDER BY freq DESC, pair
    LIMIT {BPE_TOP}
    """,
)
def text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding merge candidates: the corpus-weighted
    frequency of every adjacent character pair, ranked — the statistic
    a BPE trainer's first merge selection maximizes.

    Scale shape (the part that matters at 100 TB): the ONLY
    corpus-sized operation is the word-frequency aggregation (one
    shuffle with map-side partial counts, keys are words); pair
    explosion and pair aggregation run over the VOCABULARY relation —
    millions of rows regardless of corpus size — weighted by word
    frequency.  A naive per-token pair explode would shuffle
    |corpus tokens| x |word length| rows; this shuffles |vocab| x
    |word length|.  The top-K ordering is total (freq DESC, pair ASC),
    so the result is deterministic across engines."""
    words = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("freq"))
        .orderBy(F.desc("freq"), "pair")
        .limit(BPE_TOP)
    )


# Column-level data-quality profile: the freshness/skew report every
# ingestion pipeline runs before a table feeds training.  Stats are
# restricted to exactly-representable forms (counts, decimal sums,
# integer histogram buckets) so the profile is engine-exact — a float
# stddev would make the gate flaky for no diagnostic gain.
DQ_HIST_BUCKETS = 10


@query(
    "dq_numeric_profile",
    oracle=f"""
    WITH cols AS (
      SELECT 'l_quantity' AS col, CAST(l_quantity AS DECIMAL(18,2)) AS v
      FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', CAST(l_extendedprice AS DECIMAL(18,2))
      FROM lineitem
      UNION ALL
      SELECT 'l_discount', CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
      UNION ALL
      SELECT 'l_tax', CAST(l_tax AS DECIMAL(18,2)) FROM lineitem
    ),
    bounds AS (
      SELECT col, COUNT(*) AS n_rows,
             COUNT(*) - COUNT(v) AS n_nulls,
             COUNT(DISTINCT v) AS n_distinct,
             CAST(MIN(v) AS DOUBLE) AS min_v,
             CAST(MAX(v) AS DOUBLE) AS max_v,
             CAST(SUM(v) AS DOUBLE) AS sum_v
      FROM cols GROUP BY col
    ),
    bucketed AS (
      SELECT c.col,
             LEAST({DQ_HIST_BUCKETS - 1}, CAST(FLOOR(
               (c.v - b.min_v) * {DQ_HIST_BUCKETS} / NULLIF(b.max_v - b.min_v, 0)
             ) AS INT)) AS bucket
      FROM cols c JOIN bounds b ON c.col = b.col
      WHERE c.v IS NOT NULL
    ),
    hist AS (
      SELECT col, string_agg(CAST(n AS VARCHAR), ':' ORDER BY bucket)
               AS histogram
      FROM (SELECT col, bucket, COUNT(*) AS n
            FROM bucketed GROUP BY col, bucket)
      GROUP BY col
    )
    SELECT b.col, b.n_rows, b.n_nulls, b.n_distinct,
           b.min_v, b.max_v, b.sum_v, h.histogram
    FROM bounds b JOIN hist h ON b.col = h.col
    """,
)
def dq_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column numeric profile over lineitem's measure columns:
    row/null/distinct counts, exact decimal min/max/sum, and a
    10-bucket equal-width histogram serialized ``n0:n1:...`` — the
    pre-training ingestion report (value drift shows up as histogram
    shape change; schema drift is dq_schema_drift's job).

    Scale shape: the unpivot (one row per column value) is a
    projection, not a shuffle; the profile is one aggregation per
    column group with map-side partials, and the histogram join
    broadcasts the 4-row bounds relation.  Everything is integer or
    decimal math — bit-identical across engines by construction."""
    li = load_table(spark, sf_dir, "lineitem")
    measures = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    cols = None
    for m in measures:
        part = li.select(
            F.lit(m).alias("col"),
            F.col(m).cast("decimal(18,2)").alias("v"),
        )
        cols = part if cols is None else cols.unionByName(part)
    bounds = cols.groupBy("col").agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("v")).alias("n_nulls"),
        F.countDistinct("v").alias("n_distinct"),
        F.min("v").cast("double").alias("min_v"),
        F.max("v").cast("double").alias("max_v"),
        F.sum("v").cast("double").alias("sum_v"),
    )
    bucketed = (
        cols.join(F.broadcast(bounds), "col")
        .filter(F.col("v").isNotNull())
        .select(
            "col",
            F.least(
                F.lit(DQ_HIST_BUCKETS - 1),
                F.floor(
                    (F.col("v") - F.col("min_v"))
                    * DQ_HIST_BUCKETS
                    / F.nullif(F.col("max_v") - F.col("min_v"), F.lit(0))
                ).cast("int"),
            ).alias("bucket"),
        )
    )
    hist = (
        bucketed.groupBy("col", "bucket")
        .agg(F.count("*").alias("n"))
        .groupBy("col")
        .agg(
            F.concat_ws(
                ":",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("bucket", "n"))),
                    lambda s: s["n"].cast("string"),
                ),
            ).alias("histogram")
        )
    )
    return bounds.join(hist, "col").select(
        "col",
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min_v",
        "max_v",
        "sum_v",
        "histogram",
    )


LINE_WIDTH = 10  # words per pseudo-line
LINE_MIN_WORDS = 5  # C4's minimum-words-per-line rule
LINE_BOILER_DF = 20  # lines appearing in > this many docs are boilerplate


@query(
    "text_line_filter",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             string_split(text, ' ') AS t
      FROM documents
    ),
    lines AS (
      SELECT doc_id, 0 AS pos,
             concat('mirrored copy of ', source, ' archive') AS line
      FROM toks
      UNION ALL
      SELECT doc_id, i + 1 AS pos,
             array_to_string(
               t[(i * {LINE_WIDTH} + 1):((i + 1) * {LINE_WIDTH})], ' ') AS line
      FROM toks
      CROSS JOIN unnest(range((len(t) + {LINE_WIDTH} - 1) // {LINE_WIDTH}))
                 AS r(i)
    ),
    line_df AS (
      SELECT line FROM lines
      GROUP BY line
      HAVING COUNT(DISTINCT doc_id) > {LINE_BOILER_DF}
    ),
    flagged AS (
      SELECT l.doc_id, l.pos, l.line,
             len(string_split(l.line, ' ')) < {LINE_MIN_WORDS} AS is_short,
             (b.line IS NOT NULL) AS is_boiler
      FROM lines l LEFT JOIN line_df b ON l.line = b.line
    )
    SELECT doc_id,
           COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN is_short THEN 1 ELSE 0 END) AS BIGINT)
             AS n_short_dropped,
           CAST(SUM(CASE WHEN is_boiler AND NOT is_short THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boiler_dropped,
           CAST(SUM(CASE WHEN NOT is_short AND NOT is_boiler THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           md5(coalesce(string_agg(line, ' ' ORDER BY pos)
                          FILTER (WHERE NOT is_short AND NOT is_boiler), ''))
             AS cleaned_checksum
    FROM flagged
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style LINE-level cleaning: explode each document
    into lines, drop lines that fail per-line rules — too short
    (< {LINE_MIN_WORDS} words, C4's terminal rule adapted to this
    unpunctuated corpus) or corpus-frequent boilerplate (the same line
    text in > {LINE_BOILER_DF} documents: nav bars, cookie banners,
    mirror headers) — then reassemble the surviving lines IN ORDER and
    checksum the cleaned text.  Line-level dedup is the cleaning pass
    document-level dedup cannot replace: a boilerplate header shared by
    thousands of otherwise-distinct pages never trips a document
    near-dup threshold.

    The corpus has no newlines, so lines are synthesized
    deterministically on both engines: a per-source header line
    ('mirrored copy of srcN archive' — guaranteed boilerplate, every doc of a
    source shares it) plus the token stream in fixed {LINE_WIDTH}-word
    segments (the tail segment is usually short, exercising the
    min-words rule).

    Scale shape: one explode (rows × ~lines-per-doc, each line a short
    string), ONE window/aggregation keyed by the line text to get
    line document-frequency, one per-doc reassembly aggregation sorted
    by line position.  At 100 TB the line-DF aggregation is the big
    shuffle; lines would travel as xxhash64 digests with the DF cap
    trick from the dedup family (documents are the md5-checkable
    gate here).  The reassembly's collect_list is bounded by document
    length, never corpus size."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "t", F.split("text", " ")
    )
    n_segs = (F.size("t") + LINE_WIDTH - 1) / LINE_WIDTH
    seg_lines = F.transform(
        F.sequence(F.lit(0), n_segs.cast("int") - 1),
        lambda i: F.array_join(
            F.slice(F.col("t"), i * LINE_WIDTH + 1, LINE_WIDTH), " "
        ),
    )
    all_lines = F.concat(
        F.array(F.concat(F.lit("mirrored copy of "), F.col("source"), F.lit(" archive"))),
        seg_lines,
    )
    lines = d.select(
        "doc_id", F.posexplode(all_lines).alias("pos", "line")
    )
    # line document-frequency as a grouped relation, joined back — the
    # boilerplate list is tiny by construction (only corpus-frequent
    # lines survive the HAVING), so the join side broadcasts
    boiler = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") > LINE_BOILER_DF)
        .select("line")
    )
    flagged = lines.join(
        F.broadcast(boiler.withColumn("is_boiler", F.lit(True))),
        "line",
        "left",
    ).select(
        "doc_id",
        "pos",
        "line",
        (F.size(F.split("line", " ")) < LINE_MIN_WORDS).alias("is_short"),
        F.coalesce("is_boiler", F.lit(False)).alias("is_boiler"),
    )
    kept = ~F.col("is_short") & ~F.col("is_boiler")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("is_short").cast("bigint")).alias("n_short_dropped"),
            F.sum((F.col("is_boiler") & ~F.col("is_short")).cast("bigint")).alias(
                "n_boiler_dropped"
            ),
            F.sum(kept.cast("bigint")).alias("n_kept"),
            F.md5(
                F.coalesce(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(
                                    F.when(
                                        kept,
                                        F.struct(
                                            F.col("pos"), F.col("line")
                                        ),
                                    )
                                )
                            ),
                            lambda s: s.getField("line"),
                        ),
                        " ",
                    ),
                    F.lit(""),
                )
            ).alias("cleaned_checksum"),
        )
        .orderBy("doc_id")
    )


BPE_MERGES = 3  # plan-unrolled merge iterations (the kmeans pattern)


@query(
    "text_bpe_train",
    oracle="""
    WITH words AS (
      SELECT w, COUNT(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE len(w) >= 2
      GROUP BY w
    ),
    v0 AS (
      SELECT w, freq,
             rtrim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS s
      FROM words
    ),
    p1 AS (
      SELECT l[i] AS a, l[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS f
      FROM (SELECT string_split(s, ' ') AS l, freq FROM v0)
      CROSS JOIN unnest(range(1, len(l))) AS r(i)
      GROUP BY 1, 2
    ),
    b1 AS (SELECT * FROM p1 ORDER BY f DESC, a, b LIMIT 1),
    v1 AS (
      SELECT w, freq,
             trim(replace(
               replace(' ' || replace(s, ' ', '  ') || ' ',
                       ' ' || a || '  ' || b || ' ',
                       ' ' || a || b || ' '),
               '  ', ' ')) AS s
      FROM v0 CROSS JOIN b1
    ),
    p2 AS (
      SELECT l[i] AS a, l[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS f
      FROM (SELECT string_split(s, ' ') AS l, freq FROM v1)
      CROSS JOIN unnest(range(1, len(l))) AS r(i)
      GROUP BY 1, 2
    ),
    b2 AS (SELECT * FROM p2 ORDER BY f DESC, a, b LIMIT 1),
    v2 AS (
      SELECT w, freq,
             trim(replace(
               replace(' ' || replace(s, ' ', '  ') || ' ',
                       ' ' || a || '  ' || b || ' ',
                       ' ' || a || b || ' '),
               '  ', ' ')) AS s
      FROM v1 CROSS JOIN b2
    ),
    p3 AS (
      SELECT l[i] AS a, l[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS f
      FROM (SELECT string_split(s, ' ') AS l, freq FROM v2)
      CROSS JOIN unnest(range(1, len(l))) AS r(i)
      GROUP BY 1, 2
    ),
    b3 AS (SELECT * FROM p3 ORDER BY f DESC, a, b LIMIT 1),
    v3 AS (
      SELECT w, freq,
             trim(replace(
               replace(' ' || replace(s, ' ', '  ') || ' ',
                       ' ' || a || '  ' || b || ' ',
                       ' ' || a || b || ' '),
               '  ', ' ')) AS s
      FROM v2 CROSS JOIN b3
    )
    SELECT 1 AS step, a || '+' || b AS merge_pair, f AS pair_freq,
           (SELECT CAST(SUM(freq * len(string_split(s, ' '))) AS BIGINT)
            FROM v1) AS corpus_tokens_after
    FROM b1
    UNION ALL
    SELECT 2, a || '+' || b, f,
           (SELECT CAST(SUM(freq * len(string_split(s, ' '))) AS BIGINT)
            FROM v2)
    FROM b2
    UNION ALL
    SELECT 3, a || '+' || b, f,
           (SELECT CAST(SUM(freq * len(string_split(s, ' '))) AS BIGINT)
            FROM v3)
    FROM b3
    ORDER BY step
    """,
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, the real iterative algorithm, value-exact:
    start from character symbol sequences over the vocabulary, and for
    each of {BPE_MERGES} unrolled iterations pick the corpus-weighted
    most frequent adjacent symbol pair (total order: freq DESC, pair
    ASC) and merge every occurrence greedily left-to-right — exactly
    what sentencepiece/HF BPE trainers do per merge.  Emits the merge
    table with the post-merge corpus token count, which decreases
    monotonically: the compression the tokenizer is buying.

    Greedy left-to-right apply without a UDF: the symbol string doubles
    its separators (' '→'  ') and pads, so each candidate occurrence
    owns its delimiters and plain string `replace` — identical
    left-to-right non-overlapping semantics on both engines — merges
    'l l l' to 'll l', never 'l ll'.  The best pair is a 1-row
    relation cross-joined (broadcast) into the vocabulary, the same
    plan-unrolled-scalar pattern as embed_kmeans_lloyd — no driver
    collect, no Python loop over data.

    Scale shape: like text_bpe_pairs, the ONLY corpus-sized operation
    is the initial word-frequency aggregation; all {BPE_MERGES}
    iterations run over the VOCABULARY relation (|vocab| rows
    regardless of corpus size) with a broadcast 1-row join each — at
    100 TB each merge is a vocab-sized map stage plus one tiny
    aggregation, which is why real tokenizer training runs on word
    counts, not raw text."""
    words = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    vocab = words.withColumn(
        "s", F.rtrim(F.regexp_replace("w", "(.)", "$1 "))
    )

    def pair_stats(v: DataFrame) -> DataFrame:
        l = F.split("s", " ")
        pairs = F.when(
            F.size(l) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(l) - 1),
                lambda i: F.struct(
                    F.element_at(l, i).alias("a"),
                    F.element_at(l, i + 1).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        return (
            v.select(F.explode(pairs).alias("p"), "freq")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").cast("bigint").alias("f"))
        )

    def apply_merge(v: DataFrame, best: DataFrame) -> DataFrame:
        doubled = F.concat(
            F.lit(" "), F.replace("s", F.lit(" "), F.lit("  ")), F.lit(" ")
        )
        pat = F.concat(F.lit(" "), F.col("a"), F.lit("  "), F.col("b"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.col("a"), F.col("b"), F.lit(" "))
        return (
            v.crossJoin(F.broadcast(best))
            .withColumn(
                "s",
                F.trim(
                    F.replace(
                        F.replace(doubled, pat, rep), F.lit("  "), F.lit(" ")
                    )
                ),
            )
            .drop("a", "b", "f")
        )

    out_rows = []
    v = vocab
    for step in range(1, BPE_MERGES + 1):
        best = pair_stats(v).orderBy(F.desc("f"), "a", "b").limit(1)
        v = apply_merge(v, best)
        tokens_after = v.agg(
            F.sum(F.col("freq") * F.size(F.split("s", " ")))
            .cast("bigint")
            .alias("corpus_tokens_after")
        )
        out_rows.append(
            best.crossJoin(tokens_after).select(
                F.lit(step).alias("step"),
                F.concat("a", F.lit("+"), "b").alias("merge_pair"),
                F.col("f").alias("pair_freq"),
                "corpus_tokens_after",
            )
        )
    res = out_rows[0]
    for r in out_rows[1:]:
        res = res.unionAll(r)
    return res.orderBy("step")


@query(
    "text_bpe_apply",
    oracle="""
    WITH words AS (
      SELECT w, COUNT(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE len(w) >= 2
      GROUP BY w
    ),
    v0 AS (
      SELECT w, freq,
             rtrim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS s
      FROM words
    ),
    p1 AS (
      SELECT l[i] AS a, l[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS f
      FROM (SELECT string_split(s, ' ') AS l, freq FROM v0)
      CROSS JOIN unnest(range(1, len(l))) AS r(i)
      GROUP BY 1, 2
    ),
    b1 AS (SELECT * FROM p1 ORDER BY f DESC, a, b LIMIT 1),
    v1 AS (
      SELECT w, freq,
             trim(replace(
               replace(' ' || replace(s, ' ', '  ') || ' ',
                       ' ' || a || '  ' || b || ' ',
                       ' ' || a || b || ' '),
               '  ', ' ')) AS s
      FROM v0 CROSS JOIN b1
    ),
    p2 AS (
      SELECT l[i] AS a, l[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS f
      FROM (SELECT string_split(s, ' ') AS l, freq FROM v1)
      CROSS JOIN unnest(range(1, len(l))) AS r(i)
      GROUP BY 1, 2
    ),
    b2 AS (SELECT * FROM p2 ORDER BY f DESC, a, b LIMIT 1),
    v2 AS (
      SELECT w, freq,
             trim(replace(
               replace(' ' || replace(s, ' ', '  ') || ' ',
                       ' ' || a || '  ' || b || ' ',
                       ' ' || a || b || ' '),
               '  ', ' ')) AS s
      FROM v1 CROSS JOIN b2
    ),
    p3 AS (
      SELECT l[i] AS a, l[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS f
      FROM (SELECT string_split(s, ' ') AS l, freq FROM v2)
      CROSS JOIN unnest(range(1, len(l))) AS r(i)
      GROUP BY 1, 2
    ),
    b3 AS (SELECT * FROM p3 ORDER BY f DESC, a, b LIMIT 1),
    v3 AS (
      SELECT w,
             trim(replace(
               replace(' ' || replace(s, ' ', '  ') || ' ',
                       ' ' || a || '  ' || b || ' ',
                       ' ' || a || b || ' '),
               '  ', ' ')) AS s
      FROM v2 CROSS JOIN b3
    ),
    lens AS (SELECT w, len(string_split(s, ' ')) AS n_sym FROM v3),
    toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      FROM documents
    )
    SELECT t.doc_id,
           ANY_VALUE(t.lang) AS lang,
           COUNT(*) AS n_words,
           CAST(SUM(CASE WHEN l.n_sym IS NULL THEN len(t.w) ELSE l.n_sym END)
                AS BIGINT) AS n_bpe_tokens
    FROM toks t LEFT JOIN lens l ON t.w = l.w
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the CORPUS with the trained BPE merges — the apply half
    of text_bpe_train, done the way production pipelines do it: train
    over word counts, then tokenization is a LOOKUP — each corpus word
    joins to its final symbol sequence, never re-running merges per
    occurrence.  Emits per-document whitespace-word vs BPE-token counts
    (the token budget a trained tokenizer actually charges; single-char
    words sit outside the trained vocabulary and count one symbol per
    character).

    Scale shape: the merge training runs at vocabulary scale (see
    text_bpe_train); the apply is ONE corpus-sized shuffle join on the
    word string — and because the token-count relation is
    vocabulary-sized, at 100 TB it broadcasts and the apply becomes a
    map-only stage."""
    words = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    v = words.withColumn("s", F.rtrim(F.regexp_replace("w", "(.)", "$1 ")))

    def pair_stats(vv: DataFrame) -> DataFrame:
        l = F.split("s", " ")
        pairs = F.when(
            F.size(l) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(l) - 1),
                lambda i: F.struct(
                    F.element_at(l, i).alias("a"),
                    F.element_at(l, i + 1).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        return (
            vv.select(F.explode(pairs).alias("p"), "freq")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").cast("bigint").alias("f"))
        )

    def apply_merge(vv: DataFrame, best: DataFrame) -> DataFrame:
        doubled = F.concat(
            F.lit(" "), F.replace("s", F.lit(" "), F.lit("  ")), F.lit(" ")
        )
        pat = F.concat(F.lit(" "), F.col("a"), F.lit("  "), F.col("b"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.col("a"), F.col("b"), F.lit(" "))
        return (
            vv.crossJoin(F.broadcast(best))
            .withColumn(
                "s",
                F.trim(
                    F.replace(
                        F.replace(doubled, pat, rep), F.lit("  "), F.lit(" ")
                    )
                ),
            )
            .drop("a", "b", "f")
        )

    for _ in range(BPE_MERGES):
        v = apply_merge(v, pair_stats(v).orderBy(F.desc("f"), "a", "b").limit(1))
    lens = v.select("w", F.size(F.split("s", " ")).alias("n_sym"))
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    return (
        toks.join(F.broadcast(lens), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.count("*").alias("n_words"),
            F.sum(
                F.coalesce(F.col("n_sym"), F.length("w"))
            )
            .cast("bigint")
            .alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


CTX_WINDOW = 64  # tokens per training context window
CTX_STRIDE = 48  # window start stride (16-token overlap)


@query(
    "text_context_windows",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    counts AS (
      SELECT doc_id, t, len(t) AS n,
             CASE WHEN len(t) <= {CTX_WINDOW} THEN 1
                  ELSE (len(t) - {CTX_WINDOW} + {CTX_STRIDE} - 1)
                       // {CTX_STRIDE} + 1 END AS n_windows
      FROM toks
    ),
    wins AS (
      SELECT doc_id, n, n_windows,
             list_transform(
               range(n_windows),
               i -> array_to_string(
                 t[(i * {CTX_STRIDE} + 1):(i * {CTX_STRIDE} + {CTX_WINDOW})],
                 ' ')) AS w
      FROM counts
    )
    SELECT doc_id,
           n AS n_tokens,
           n_windows,
           CAST((SELECT SUM(len(string_split(x, ' ')))
                 FROM unnest(w) AS u(x)) AS BIGINT) AS n_window_tokens,
           md5(w[1]) AS first_window_md5,
           md5(w[n_windows]) AS last_window_md5
    FROM wins
    ORDER BY doc_id
    """,
)
def text_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window splitting for training: each document slices
    into {CTX_WINDOW}-token windows at stride {CTX_STRIDE} (16-token
    overlap so no span is ever seen only at a window boundary) — the
    long-document half of sequence preparation, complementing
    corpus_pack_sequences (which packs SHORT documents up to the
    window).  Emits per-doc window counts, the total token count
    including overlap (the real token budget the training run pays),
    and first/last window checksums pinning boundary math exactly.

    Scale shape: pure per-row array algebra — slicing, hashing,
    arithmetic, all codegen'd, no shuffle at all until the final
    presentation sort; at 100 TB this is a map-only pass emitting
    ~40 bytes per document."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "t", F.split("text", " ")
    )
    n = F.size("t")
    n_windows = F.when(n <= CTX_WINDOW, F.lit(1)).otherwise(
        (n - CTX_WINDOW + CTX_STRIDE - 1) / CTX_STRIDE + 1
    ).cast("int")
    wins = F.transform(
        F.sequence(F.lit(0), n_windows - 1),
        lambda i: F.array_join(
            F.slice(F.col("t"), i * CTX_STRIDE + 1, CTX_WINDOW), " "
        ),
    )
    return (
        d.select("doc_id", n.alias("n_tokens"), n_windows.alias("n_windows"),
                 wins.alias("w"))
        .select(
            "doc_id",
            "n_tokens",
            "n_windows",
            F.aggregate(
                F.transform("w", lambda x: F.size(F.split(x, " "))),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("n_window_tokens"),
            F.md5(F.element_at("w", 1)).alias("first_window_md5"),
            F.md5(F.element_at("w", -1)).alias("last_window_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) tokenizer training.  Parameters are
# small so the unrolled Viterbi oracle stays readable; the Spark side is
# written against the same constants so both engines compute the same
# integers.
UNI_L = 8  # max word length covered by the unrolled DP
UNI_PMAX = 4  # max piece length
UNI_SEED = 40  # seed vocabulary: top-N multi-char substrings
UNI_TARGET = 10  # pruned vocabulary: top-N multi-char pieces kept


def _unigram_round_sql(r: int) -> str:
    """CTE block for one hard-EM round: candidate edges against vocab
    ``v{r}n``, position-unrolled Viterbi DP (integer-encoded
    ``enc = cost*16 + piece_len`` so MIN is a deterministic total order),
    traceback to the chosen pieces, and corpus-weighted piece counts."""
    ctes = [
        f"""e{r} AS MATERIALIZED (
      SELECT wr.w, ci.i, cp.p, vn.nll
      FROM words wr
      CROSS JOIN unnest(range(1, {UNI_L + 1})) AS ci(i)
      CROSS JOIN unnest(range(1, {UNI_PMAX + 1})) AS cp(p)
      JOIN v{r}n vn
        ON ci.i <= len(wr.w) AND ci.i - cp.p + 1 >= 1
       AND vn.piece = substr(wr.w, CAST(ci.i - cp.p + 1 AS INT), CAST(cp.p AS INT))
    )""",
        f"""bb{r}_0 AS (
      SELECT w, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS enc FROM words
    )""",
    ]
    for i in range(1, UNI_L + 1):
        ctes.append(
            f"""b{r}_{i} AS MATERIALIZED (
      SELECT e.w, CAST({i} AS BIGINT) AS pos,
             MIN((b.enc // 16 + e.nll) * 16 + e.p) AS enc
      FROM e{r} e JOIN bb{r}_{i - 1} b ON b.w = e.w AND b.pos = {i} - e.p
      WHERE e.i = {i}
      GROUP BY e.w
    )"""
        )
        ctes.append(
            f"""bb{r}_{i} AS MATERIALIZED (
      SELECT * FROM bb{r}_{i - 1} UNION ALL SELECT * FROM b{r}_{i}
    )"""
        )
    ctes.append(
        f"""vit{r} AS MATERIALIZED (
      SELECT b.w, wr.freq, b.enc
      FROM bb{r}_{UNI_L} b JOIN words wr ON wr.w = b.w AND b.pos = len(wr.w)
    )"""
    )
    ctes.append(
        f"""t{r}_0 AS (
      SELECT w, freq, CAST(len(w) AS BIGINT) AS pos FROM words
    )"""
    )
    for k in range(1, UNI_L + 1):
        ctes.append(
            f"""t{r}_{k} AS MATERIALIZED (
      SELECT t.w, t.freq,
             CASE WHEN t.pos > 0 THEN t.pos - (b.enc % 16) ELSE t.pos END AS pos,
             CASE WHEN t.pos > 0
                  THEN substr(t.w, CAST(t.pos - (b.enc % 16) + 1 AS INT),
                              CAST(b.enc % 16 AS INT)) END AS piece
      FROM t{r}_{k - 1} t JOIN bb{r}_{UNI_L} b ON b.w = t.w AND b.pos = t.pos
    )"""
        )
    union = "\n        UNION ALL SELECT w, freq, piece FROM ".join(
        f"t{r}_{k}" for k in range(1, UNI_L + 1)
    )
    ctes.append(
        f"""pieces{r} AS MATERIALIZED (
      SELECT w, freq, piece FROM (
        SELECT w, freq, piece FROM {union}
      ) u WHERE piece IS NOT NULL
    )"""
    )
    if r < 2:  # the final round's counts feed nothing
        ctes.append(
            f"""cnt{r} AS MATERIALIZED (
      SELECT piece, CAST(SUM(freq) AS BIGINT) AS c FROM pieces{r} GROUP BY 1
    )"""
        )
    return ",\n    ".join(ctes)


def _unigram_nll_sql(src: str) -> str:
    """Vocabulary scoring: one FLOOR-quantized negative log-likelihood per
    piece (the only transcendental; quantized once per round, so the
    integer DP downstream is drift-free — same convention as
    quality_logreg_train)."""
    return f"""(
      SELECT piece, plen,
             CAST(FLOOR(1000000.0 * LN(CAST(t.tf AS DOUBLE) / f)) AS BIGINT) AS nll
      FROM {src} CROSS JOIN (SELECT SUM(f) AS tf FROM {src}) t
    )"""


def _unigram_ctes() -> str:
    """Shared oracle prefix: the full three-round training chain, through
    round 2's Viterbi (``vit2``) and traceback pieces (``pieces2``).
    ``text_unigram_train`` summarizes the rounds; ``text_unigram_apply``
    re-tokenizes the corpus with the final vocabulary."""
    smooth = "CASE WHEN v.plen = 1 THEN 1 ELSE 0 END"
    return f"""
    WITH words AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE len(w) BETWEEN 1 AND {UNI_L}
      GROUP BY w
    ),
    allsub AS MATERIALIZED (
      SELECT substr(w, CAST(st.s AS INT), CAST(pp.p AS INT)) AS piece,
             CAST(pp.p AS INT) AS plen,
             CAST(SUM(freq) AS BIGINT) AS f
      FROM words
      CROSS JOIN unnest(range(1, {UNI_L + 1})) AS st(s)
      CROSS JOIN unnest(range(1, {UNI_PMAX + 1})) AS pp(p)
      WHERE st.s + pp.p - 1 <= len(w)
      GROUP BY 1, 2
    ),
    v0 AS MATERIALIZED (
      SELECT piece, plen, f FROM allsub WHERE plen = 1
      UNION ALL
      SELECT piece, plen, f FROM (
        SELECT piece, plen, f FROM allsub WHERE plen >= 2
        ORDER BY f DESC, piece LIMIT {UNI_SEED})
    ),
    v0n AS MATERIALIZED {_unigram_nll_sql("v0")},
    {_unigram_round_sql(0)},
    v1 AS MATERIALIZED (
      SELECT v.piece, v.plen,
             CAST(COALESCE(c.c, 0) + {smooth} AS BIGINT) AS f
      FROM v0n v LEFT JOIN cnt0 c ON c.piece = v.piece
      WHERE COALESCE(c.c, 0) + {smooth} > 0
    ),
    v1n AS MATERIALIZED {_unigram_nll_sql("v1")},
    {_unigram_round_sql(1)},
    v1x AS MATERIALIZED (
      SELECT v.piece, v.plen,
             CAST(COALESCE(c.c, 0) + {smooth} AS BIGINT) AS f
      FROM v1n v LEFT JOIN cnt1 c ON c.piece = v.piece
    ),
    v2 AS MATERIALIZED (
      SELECT piece, plen, f FROM v1x WHERE plen = 1
      UNION ALL
      SELECT piece, plen, f FROM (
        SELECT piece, plen, f FROM v1x WHERE plen >= 2 AND f > 0
        ORDER BY f DESC, piece LIMIT {UNI_TARGET})
    ),
    v2n AS MATERIALIZED {_unigram_nll_sql("v2")},
    {_unigram_round_sql(2)}
    """


def _unigram_train_oracle() -> str:
    return f"""{_unigram_ctes()}
    SELECT CAST(0 AS INT) AS round,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v0n) AS vocab_size,
           (SELECT CAST(SUM(freq) AS BIGINT) FROM pieces0) AS corpus_tokens,
           (SELECT CAST(SUM(freq * (enc // 16)) AS BIGINT) FROM vit0) AS corpus_cost
    UNION ALL
    SELECT CAST(1 AS INT),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v1n),
           (SELECT CAST(SUM(freq) AS BIGINT) FROM pieces1),
           (SELECT CAST(SUM(freq * (enc // 16)) AS BIGINT) FROM vit1)
    UNION ALL
    SELECT CAST(2 AS INT),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v2n),
           (SELECT CAST(SUM(freq) AS BIGINT) FROM pieces2),
           (SELECT CAST(SUM(freq * (enc // 16)) AS BIGINT) FROM vit2)
    ORDER BY round
    """


_UNI_CANDS = (
    "flatten(transform(sequence(1, cast(length(w) as int)), "
    f"i -> transform(sequence(1, least({UNI_PMAX}, i)), "
    "p -> named_struct('i', i, 'p', p, 'piece', substring(w, i - p + 1, p)))))"
)


def _unigram_rounds(spark: SparkSession, sf_dir: str) -> dict:
    """Spark half of the shared training chain (mirrors
    :func:`_unigram_ctes`): returns per-round 1-row MODELS (``vmap`` —
    piece→quantized-nll map — plus ``vocab_size``) and Viterbi
    segmentations ``vit0/vit1/vit2`` (``w, freq, pieces, icost,
    vocab_size``).

    Plan shape (this is the tuned second version — the first built a
    per-round candidate-edge relation with an explode + broadcast join +
    collect_list groupBy, which cost a shuffle per round and duplicated
    large logical subtrees): the vocabulary rides as ONE broadcast 1-row
    map relation per round, piece lookups happen INSIDE the DP fold via
    element_at (null → candidate skipped, exactly the oracle's join
    miss), and vocab_size rides through the fold so each model row is
    referenced exactly once.  Per round: one vocab-sized aggregate (the
    model row), one map-side fold over words, one counts shuffle.  The
    ONLY corpus-sized operation is the initial word-frequency
    aggregation (persisted, one pass) — which is exactly why production
    tokenizer trainers (SentencePiece) train from word counts."""
    from reindexer_spark.cache import track

    words = track(
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter((F.length("w") >= 1) & (F.length("w") <= UNI_L))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )

    allsub = (
        words.select("freq", F.explode(F.expr(_UNI_CANDS)).alias("c"))
        .groupBy(F.col("c.piece").alias("piece"), F.col("c.p").alias("plen"))
        .agg(F.sum("freq").cast("bigint").alias("f"))
    )

    def model_of(v: DataFrame) -> DataFrame:
        """1-row model: piece→FLOOR-quantized nll map + vocab size.
        The nll is computed inside the row so the vocab relation is
        referenced exactly once (no separate total-frequency join); the
        model row itself is also referenced exactly once (by viterbi),
        so it is NOT persisted — a persist here would only add a
        materialization barrier."""
        return v.agg(
            F.collect_list(F.struct("piece", "f")).alias("ps"),
            F.sum("f").cast("double").alias("tf"),
            F.count("*").cast("bigint").alias("vocab_size"),
        ).select(
            F.expr(
                "map_from_entries(transform(ps, e -> struct(e.piece, "
                "cast(floor(1000000.0 * ln(tf / e.f)) as bigint))))"
            ).alias("vmap"),
            "vocab_size",
        )

    # DP fold: enc[i] = min over piece lengths p of
    #   (enc[i-p] div 16 + nll(substring(w, i-p+1, p))) * 16 + p
    # where a vocabulary miss makes the candidate NULL and array_min
    # skips nulls — the same candidate set as the oracle's edge join.
    enc_expr = (
        "aggregate(sequence(1, cast(length(w) as int)), "
        "array(cast(0 as bigint)), "
        "(acc, i) -> concat(acc, array(array_min(transform("
        f"sequence(1, least({UNI_PMAX}, i)), "
        "p -> (element_at(acc, i - p + 1) div 16 "
        "+ element_at(vmap, substring(w, i - p + 1, p))) * 16 + p)))))"
    )
    tb_expr = (
        f"aggregate(sequence(1, {UNI_L}), "
        "named_struct('pos', cast(length(w) as bigint), "
        "'arr', cast(array() as array<string>)), "
        "(acc, k) -> if(acc.pos > 0, named_struct("
        "'pos', acc.pos - element_at(enc, cast(acc.pos as int) + 1) % 16, "
        "'arr', concat(acc.arr, array(substring(w, "
        "cast(acc.pos - element_at(enc, cast(acc.pos as int) + 1) % 16 + 1 as int), "
        "cast(element_at(enc, cast(acc.pos as int) + 1) % 16 as int))))), "
        "acc))"
    )

    def viterbi(model: DataFrame) -> DataFrame:
        return track(
            words.crossJoin(F.broadcast(model))
            .withColumn("enc", F.expr(enc_expr))
            .withColumn("pieces", F.expr(tb_expr).getField("arr"))
            .withColumn(
                "icost",
                F.expr("element_at(enc, cast(length(w) as int) + 1) div 16"),
            )
            .select("w", "freq", "pieces", "icost", "vocab_size")
        )

    def counts(vit: DataFrame) -> DataFrame:
        return (
            vit.select("freq", F.explode("pieces").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("freq").cast("bigint").alias("c"))
        )

    smooth = F.when(F.col("plen") == 1, 1).otherwise(0)

    def reweight(v: DataFrame, vit: DataFrame) -> DataFrame:
        """EM count re-estimation over the existing vocab relation."""
        return v.join(counts(vit), "piece", "left").select(
            "piece",
            "plen",
            (F.coalesce(F.col("c"), F.lit(0)) + smooth)
            .cast("bigint")
            .alias("f"),
        )

    v0 = track(
        allsub.filter(F.col("plen") == 1).unionAll(
            allsub.filter(F.col("plen") >= 2)
            .orderBy(F.desc("f"), "piece")
            .limit(UNI_SEED)
        )
    )
    m0 = model_of(v0)
    vit0 = viterbi(m0)

    v1 = track(reweight(v0, vit0).filter(F.col("f") > 0))
    m1 = model_of(v1)
    vit1 = viterbi(m1)

    v1x = reweight(v1, vit1)
    v2 = v1x.filter(F.col("plen") == 1).unionAll(
        v1x.filter((F.col("plen") >= 2) & (F.col("f") > 0))
        .orderBy(F.desc("f"), "piece")
        .limit(UNI_TARGET)
    )
    m2 = model_of(v2)
    vit2 = viterbi(m2)

    return {"vit0": vit0, "vit1": vit1, "vit2": vit2}


@query("text_unigram_train", oracle=_unigram_train_oracle())
def text_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer TRAINING (SentencePiece-style), hard-EM
    variant, value-exact: seed a substring vocabulary, then alternate
    Viterbi segmentation (E) with count re-estimation (M) and a final
    prune to UNI_TARGET multi-char pieces — the other tokenizer family
    real pipelines train besides BPE (text_bpe_train).

    Round 0 seeds UNI_SEED corpus-frequent substrings (len 2..UNI_PMAX)
    plus every single character (coverage floor — chars are never pruned,
    and get +1 count smoothing so segmentation always has a path).  Each
    round scores pieces with a FLOOR-quantized negative log-likelihood —
    the single transcendental, quantized once (the logreg convention) —
    after which the entire Viterbi DP runs on BIGINTs: a position's state
    is ``enc = best_cost * 16 + chosen_piece_len``, so MIN(enc) is
    simultaneously the DP relaxation AND a deterministic argmin
    (min cost, then shortest piece), and the traceback just walks
    ``enc % 16`` backwards.  Emits one row per round: vocabulary size
    (monotonically shrinking), corpus token count and total quantized
    cost under that round's segmentation.

    On Spark the DP is a single ``aggregate`` fold per word over its
    candidate-edge array — no joins inside the loop, no UDF; the oracle
    unrolls the same recurrence as UNI_L MATERIALIZED CTE steps.  Both
    engines produce identical integers (see _unigram_rounds for the
    100 TB shape)."""
    r = _unigram_rounds(spark, sf_dir)

    def summary(rd: int, vit: DataFrame) -> DataFrame:
        # vocab_size rides through the segmentation (constant per row,
        # MIN is exact) so the model row is referenced exactly once
        return vit.agg(
            F.min("vocab_size").alias("vocab_size"),
            F.sum(F.col("freq") * F.size("pieces"))
            .cast("bigint")
            .alias("corpus_tokens"),
            F.sum(F.col("freq") * F.col("icost"))
            .cast("bigint")
            .alias("corpus_cost"),
        ).select(
            F.lit(rd).cast("int").alias("round"),
            "vocab_size",
            "corpus_tokens",
            "corpus_cost",
        )

    return (
        summary(0, r["vit0"])
        .unionAll(summary(1, r["vit1"]))
        .unionAll(summary(2, r["vit2"]))
        .orderBy("round")
    )


@query(
    "text_unigram_apply",
    oracle=f"""{_unigram_ctes()},
    lens AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sym FROM pieces2 GROUP BY w
    ),
    toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      FROM documents
    )
    SELECT t.doc_id,
           ANY_VALUE(t.lang) AS lang,
           COUNT(*) AS n_words,
           CAST(SUM(COALESCE(l.n_sym, len(t.w))) AS BIGINT) AS n_unigram_tokens
    FROM toks t LEFT JOIN lens l ON t.w = l.w
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def text_unigram_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the CORPUS with the trained unigram vocabulary — the
    apply half of text_unigram_train, done the way production pipelines
    do it (and the way text_bpe_apply does for BPE): train over word
    counts, then tokenization is a LOOKUP — each corpus word joins to
    its Viterbi-optimal piece count under the final (round-2) pruned
    vocabulary; words outside the trained length band fall back to
    character count.  Emits per-document word and unigram-token counts:
    the corpus-side cost model a token-budgeted pipeline (context
    windows, packing, pricing) actually consumes.

    Scale shape: training is vocabulary-sized (see _unigram_rounds);
    apply is one explode + broadcast lookup join + per-doc aggregation —
    a single shuffle on doc_id at any corpus size."""
    r = _unigram_rounds(spark, sf_dir)
    lens = r["vit2"].select("w", F.size("pieces").cast("bigint").alias("n_sym"))
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    return (
        toks.join(F.broadcast(lens), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.count("*").alias("n_words"),
            F.sum(F.coalesce(F.col("n_sym"), F.length("w").cast("bigint")))
            .cast("bigint")
            .alias("n_unigram_tokens"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_unigram_fertility",
    oracle=f"""{_unigram_ctes()},
    lens AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sym FROM pieces2 GROUP BY w
    ),
    toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    per_doc AS (
      SELECT t.doc_id,
             ANY_VALUE(t.lang) AS lang,
             COUNT(*) AS n_words,
             CAST(SUM(COALESCE(l.n_sym, len(t.w))) AS BIGINT) AS n_toks
      FROM toks t LEFT JOIN lens l ON t.w = l.w
      GROUP BY t.doc_id
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_toks) AS BIGINT) AS n_unigram_tokens,
           FLOOR(1000000.0 * SUM(n_toks) / SUM(n_words)) / 1000000.0
             AS fertility
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
)
def text_unigram_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-equity audit: per-language FERTILITY (tokens per word)
    under the trained unigram vocabulary — the number multilingual
    pipelines watch, because a tokenizer trained on a skewed mix
    over-segments the under-represented languages, silently taxing
    their effective context window and training compute.  One row per
    language with document/word/token totals and the FLOOR-quantized
    fertility ratio.

    Scale shape: identical to text_unigram_apply (train at vocabulary
    scale, tokenize as a broadcast lookup join) plus one |languages|-row
    aggregate — the audit is free once the apply lane exists."""
    r = _unigram_rounds(spark, sf_dir)
    lens = r["vit2"].select("w", F.size("pieces").cast("bigint").alias("n_sym"))
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    per_doc = (
        toks.join(F.broadcast(lens), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.count("*").alias("n_words"),
            F.sum(F.coalesce(F.col("n_sym"), F.length("w").cast("bigint")))
            .cast("bigint")
            .alias("n_toks"),
        )
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_toks").cast("bigint").alias("n_unigram_tokens"),
            (
                F.floor(
                    F.lit(1000000.0) * F.sum("n_toks") / F.sum("n_words")
                )
                / 1e6
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


# Bloom decontamination parameters: M bits, K md5-derived positions per
# shingle.  Deterministic (no seed) so DuckDB replays the arithmetic.
# Sizing note: a deployment sizes M to the BENCHMARK (fixed, small —
# ~10 bits per member for ~1% FP); the fixture's stand-in benchmark is
# a whole corpus source and grows with sf, so the lane's
# n_false_positive column honestly shows the filter saturating when
# 3x|bench| approaches M — that saturation behavior is itself part of
# what the lane measures.
BLOOM_M = 1 << 16
BLOOM_K = 3


def _bloom_pos_sql(col: str, j: int) -> str:
    return (
        f"CAST(('0x' || substr(md5({col}), {1 + 4 * j}, 4)) AS INT) "
        f"% {BLOOM_M}"
    )


@query(
    "text_contamination_bloom",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ), shingles AS (
      SELECT doc_id, source, unnest({_shingle_sql(SHINGLE_K)}) AS sh FROM docs
    ), bench AS (
      SELECT DISTINCT sh FROM shingles WHERE source = '{BENCH_SOURCE}'
    ), bits AS (
      SELECT DISTINCT unnest([
        {", ".join(_bloom_pos_sql("sh", j) for j in range(BLOOM_K))}
      ]) AS b FROM bench
    ), cand AS (
      SELECT DISTINCT doc_id, sh
      FROM shingles WHERE source <> '{BENCH_SOURCE}'
    ), flagged AS (
      SELECT doc_id, sh,
        ({" AND ".join(
            f"{_bloom_pos_sql('sh', j)} IN (SELECT b FROM bits)"
            for j in range(BLOOM_K)
        )}) AS bloom_hit
      FROM cand
    ), verified AS (
      SELECT f.doc_id, f.sh, f.bloom_hit,
             (f.bloom_hit AND b.sh IS NOT NULL) AS exact_hit
      FROM flagged f LEFT JOIN bench b
        ON f.bloom_hit AND f.sh = b.sh
    )
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bloom_hits,
           CAST(SUM(CASE WHEN exact_hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(SUM(CASE WHEN bloom_hit AND NOT exact_hit THEN 1
                    ELSE 0 END) AS BIGINT) AS n_false_positive,
           CAST(SUM(CASE WHEN exact_hit THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS contamination,
           CAST(SUM(CASE WHEN exact_hit THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) >= 0.8 AS is_contaminated
    FROM verified
    GROUP BY doc_id
    """,
)
def text_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-PREFILTERED decontamination (round 14 — the scale path
    next to text_contamination): the benchmark shingle set is folded
    into a FIXED-SIZE bit array (BLOOM_M bits, BLOOM_K md5-derived
    positions per shingle) that broadcasts as a literal — kilobytes
    regardless of benchmark size, where the exact lane broadcasts the
    full shingle STRINGS — and every corpus shingle is tested
    MAP-SIDE with three integer bit probes.  Only bloom-flagged
    shingles reach the exact verify join, so the corpus-side join
    input shrinks by the true-negative rate (at a realistic
    benchmark/corpus ratio, almost everything).

    Per document: n_shingles, n_bloom_hits (prefilter), n_exact
    (verified), n_false_positive (= bloom − exact, the filter's
    measured FP cost), contamination and the SAME is_contaminated
    decision as text_contamination — the prefilter is LOSSLESS by
    construction (a true member's positions are all set; the oracle
    recomputes both stages independently, so a bit-arithmetic drift
    fails the gate).

    Scale shape: ONE driver collect of the benchmark's bit positions
    (≤ BLOOM_M ints — the join_bloom_prune precedent: a bounded
    dimension-side aggregate feeding a broadcast bitset), then the
    corpus side is a map-side filter + the shrunken broadcast verify
    join; the 100 TB side never shuffles."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("w")
    )
    wcol = F.col("w")
    k = SHINGLE_K
    sh = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.when(
                F.size(wcol) >= k,
                F.transform(
                    F.sequence(F.lit(1), F.size(wcol) - (k - 1)),
                    lambda i: F.array_join(F.slice(wcol, i, k), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("sh"),
    )

    def pos(col, j):
        return (
            F.conv(F.substring(F.md5(col), 1 + 4 * j, 4), 16, 10)
            .cast("int")
            % BLOOM_M
        )

    bench = (
        sh.filter(F.col("source") == BENCH_SOURCE).select("sh").distinct()
    )
    # the ONE driver collect: bounded by BLOOM_M regardless of corpus
    # or benchmark size (positions, not shingles)
    bit_rows = (
        bench.select(
            F.explode(
                F.array(*[pos(F.col("sh"), j) for j in range(BLOOM_K)])
            ).alias("b")
        )
        .distinct()
        .collect()
    )
    bits = set(r["b"] for r in bit_rows)
    mask = [0] * ((BLOOM_M + 63) // 64)
    for b in bits:
        mask[b // 64] |= 1 << (b % 64)
    # two's complement: bit 63 pushes the word past signed int64, and
    # Spark literals are signed — bitwiseAND is bit-pattern-exact
    # either way
    mask_lit = F.array(
        *[
            F.lit(m - (1 << 64) if m >= (1 << 63) else m).cast("bigint")
            for m in mask
        ]
    )

    cand = (
        sh.filter(F.col("source") != BENCH_SOURCE)
        .select("doc_id", "sh")
        .distinct()
    )
    # JVM-side bit probe per hash: mask[p//64] AND single-bit[p%64] —
    # the whole prefilter is a map-side expression over two broadcast
    # literal arrays, no Python and no shuffle (shiftleft takes only
    # a literal shift count, so the 64 single-bit masks are an
    # indexed literal array instead)
    onebit = F.array(
        *[
            F.lit(
                (1 << i) - (1 << 64) if i == 63 else (1 << i)
            ).cast("bigint")
            for i in range(64)
        ]
    )
    hit = F.lit(True)
    for j in range(BLOOM_K):
        p = pos(F.col("sh"), j)
        word = F.element_at(mask_lit, (p / F.lit(64)).cast("int") + 1)
        test = (
            word.bitwiseAND(
                F.element_at(onebit, (p % 64).cast("int") + 1)
            )
            != 0
        )
        hit = hit & test
    probed = cand.withColumn("bloom_hit", hit)
    # the verify join: only bloom-flagged rows can match, the rest
    # carry bloom_hit=false straight to the aggregate
    verified = probed.join(
        F.broadcast(bench.select(F.col("sh"), F.lit(1).alias("bmark"))),
        "sh",
        "left",
    ).withColumn(
        "exact_hit", F.col("bloom_hit") & F.col("bmark").isNotNull()
    )
    return (
        verified.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.col("bloom_hit").cast("int")).alias("n_bloom_hits"),
            F.sum(F.col("exact_hit").cast("int")).alias("n_exact"),
            F.sum(
                (F.col("bloom_hit") & ~F.col("exact_hit")).cast("int")
            ).alias("n_false_positive"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_bloom_hits",
            "n_exact",
            "n_false_positive",
            (F.col("n_exact").cast("double") / F.col("n_shingles")).alias(
                "contamination"
            ),
            (
                F.col("n_exact").cast("double") / F.col("n_shingles")
                >= 0.8
            ).alias("is_contaminated"),
        )
    )


WP_MERGES = 3  # plan-unrolled merge iterations (the BPE pattern)

_WP_PAIRS = """
      SELECT l[i] AS a, l[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS f
      FROM (SELECT string_split(s, ' ') AS l, freq FROM {src})
      CROSS JOIN unnest(range(1, len(l))) AS r(i)
      GROUP BY 1, 2
"""
_WP_SYMS = """
      SELECT l[i] AS sym, CAST(SUM(freq) AS BIGINT) AS sf
      FROM (SELECT string_split(s, ' ') AS l, freq FROM {src})
      CROSS JOIN unnest(range(1, len(l) + 1)) AS r(i)
      GROUP BY 1
"""
_WP_BEST = """
      SELECT p.a, p.b, p.f, p.f / (sa.sf * sb.sf) AS score
      FROM p{k} p
      JOIN sy{k} sa ON sa.sym = p.a
      JOIN sy{k} sb ON sb.sym = p.b
      ORDER BY score DESC, p.a, p.b LIMIT 1
"""
_WP_APPLY = """
      SELECT w, freq,
             trim(replace(
               replace(' ' || replace(s, ' ', '  ') || ' ',
                       ' ' || a || '  ' || b || ' ',
                       ' ' || a || b || ' '),
               '  ', ' ')) AS s
      FROM v{prev} CROSS JOIN b{k}
"""


def _wp_oracle() -> str:
    parts = [
        """
    WITH words AS (
      SELECT w, COUNT(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE len(w) >= 2
      GROUP BY w
    ),
    v0 AS (
      SELECT w, freq,
             rtrim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS s
      FROM words
    )"""
    ]
    for k in range(1, WP_MERGES + 1):
        prev = k - 1
        parts.append(
            f", p{k} AS ({_WP_PAIRS.format(src=f'v{prev}')})"
            f", sy{k} AS ({_WP_SYMS.format(src=f'v{prev}')})"
            f", b{k} AS ({_WP_BEST.format(k=k)})"
            f", v{k} AS ({_WP_APPLY.format(prev=prev, k=k)})"
        )
    selects = [
        f"""
    SELECT {k} AS step, a || '+' || b AS merge_pair, f AS pair_freq,
           score,
           (SELECT CAST(SUM(freq * len(string_split(s, ' '))) AS BIGINT)
            FROM v{k}) AS corpus_tokens_after
    FROM b{k}"""
        for k in range(1, WP_MERGES + 1)
    ]
    return "".join(parts) + " UNION ALL ".join(selects) + " ORDER BY step"


@query("text_wordpiece_train", oracle=_wp_oracle())
def text_wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece tokenizer TRAINING — the third trainer next to BPE
    and unigram, value-exact: same character-symbol start and greedy
    merge apply as text_bpe_train, but each iteration picks the pair
    maximizing the LIKELIHOOD score freq(ab) / (freq(a) * freq(b))
    (the published WordPiece criterion: merge what co-occurs more
    than chance, not what is merely frequent — rare-but-coherent
    morphemes win over ubiquitous-letter pairs).  The score is an
    int64/int64 IEEE double division both engines compute bit-
    identically (operands are exact below 2^53), with (a, b) as the
    deterministic tie-break.

    Emits the merge table: pair, raw pair frequency, score, and the
    post-merge corpus token count.  Against the BPE lane on the same
    corpus the CHOSEN PAIRS differ — that divergence is the point of
    the criterion and is pinned in tests.

    Scale shape: identical to text_bpe_train — the only corpus-sized
    operation is the initial word-frequency aggregation; every
    iteration runs over the VOCABULARY relation (pair stats + symbol
    stats + a broadcast 1-row best-pair join), so at 100 TB each
    merge costs two vocab-sized aggregations regardless of corpus
    size."""
    words = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    v = words.withColumn(
        "s", F.rtrim(F.regexp_replace("w", "(.)", "$1 "))
    )

    def pair_stats(vv: DataFrame) -> DataFrame:
        l = F.split("s", " ")
        pairs = F.when(
            F.size(l) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(l) - 1),
                lambda i: F.struct(
                    F.element_at(l, i).alias("a"),
                    F.element_at(l, i + 1).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        return (
            vv.select(F.explode(pairs).alias("p"), "freq")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").cast("bigint").alias("f"))
        )

    def sym_stats(vv: DataFrame) -> DataFrame:
        return (
            vv.select(F.explode(F.split("s", " ")).alias("sym"), "freq")
            .groupBy("sym")
            .agg(F.sum("freq").cast("bigint").alias("sf"))
        )

    def best_pair(vv: DataFrame) -> DataFrame:
        p = pair_stats(vv)
        sy = sym_stats(vv)
        return (
            p.join(
                sy.select(
                    F.col("sym").alias("a"), F.col("sf").alias("fa")
                ),
                "a",
            )
            .join(
                sy.select(
                    F.col("sym").alias("b"), F.col("sf").alias("fb")
                ),
                "b",
            )
            .withColumn("score", F.col("f") / (F.col("fa") * F.col("fb")))
            .orderBy(F.desc("score"), "a", "b")
            .limit(1)
            .select("a", "b", "f", "score")
        )

    def apply_merge(vv: DataFrame, best: DataFrame) -> DataFrame:
        doubled = F.concat(
            F.lit(" "), F.replace("s", F.lit(" "), F.lit("  ")), F.lit(" ")
        )
        pat = F.concat(
            F.lit(" "), F.col("a"), F.lit("  "), F.col("b"), F.lit(" ")
        )
        rep = F.concat(F.lit(" "), F.col("a"), F.col("b"), F.lit(" "))
        return (
            vv.crossJoin(F.broadcast(best))
            .withColumn(
                "s",
                F.trim(
                    F.replace(
                        F.replace(doubled, pat, rep),
                        F.lit("  "),
                        F.lit(" "),
                    )
                ),
            )
            .drop("a", "b", "f", "score")
        )

    out_rows = []
    for step in range(1, WP_MERGES + 1):
        best = best_pair(v)
        v = apply_merge(v, best)
        tokens_after = v.agg(
            F.sum(F.col("freq") * F.size(F.split("s", " ")))
            .cast("bigint")
            .alias("corpus_tokens_after")
        )
        out_rows.append(
            best.crossJoin(tokens_after).select(
                F.lit(step).alias("step"),
                F.concat("a", F.lit("+"), "b").alias("merge_pair"),
                F.col("f").alias("pair_freq"),
                "score",
                "corpus_tokens_after",
            )
        )
    res = out_rows[0]
    for r in out_rows[1:]:
        res = res.unionAll(r)
    return res.orderBy("step")
