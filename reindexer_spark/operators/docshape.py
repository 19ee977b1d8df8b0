"""Tier B5/B6 as graded queries — the argot-equivalent record shaping
(docpipe.flatten) exercised through the correctness gate, not just unit
tests.

The testdata has no Argot JSON column, so the queries synthesize the
payload from ``documents`` columns with ``to_json`` — both engines build
the identical string — then run the REAL pipeline functions
(parse_content → flatten_struct_columns → suffix_columns) over it; the
oracle projects the same values straight from the base table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from reindexer_spark.catalog import load_table
from reindexer_spark.docpipe.flatten import (
    flatten_struct_columns,
    parse_content,
    suffix_columns,
)
from reindexer_spark.registry import query

ARGOT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField(
            "title",
            T.StructType(
                [T.StructField("main", T.StringType()), T.StructField("sub", T.StringType())]
            ),
        ),
        T.StructField("authors", T.ArrayType(T.StringType())),
        T.StructField("year", T.LongType()),
    ]
)


def _with_content(docs: DataFrame) -> DataFrame:
    payload = F.struct(
        F.col("doc_id").alias("id"),
        F.struct(F.col("source").alias("main"), F.col("lang").alias("sub")).alias(
            "title"
        ),
        F.array(F.col("source"), F.col("lang")).alias("authors"),
        F.col("n_chars").alias("year"),
    )
    return docs.select("doc_id", F.to_json(payload).alias("content"))


@query(
    "argot_flatten_suffix",
    oracle="""
    SELECT doc_id,
           doc_id AS id_i,
           source AS title_main_t,
           lang AS title_sub_t,
           array_to_string([source, lang], '|') AS authors_a,
           n_chars AS year_i
    FROM documents
    """,
)
def argot_flatten_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full argot replacement path on real pipeline code: JSON parse
    (explicit schema) → recursive flatten (nested struct → title_main,
    array kept whole) → Solr dynamic-field suffixing.  The oracle reads
    the same values off the base table, so any shaping bug — dropped
    field, wrong suffix, corrupted value — breaks the hash.  Array-typed
    fields are serialized to '|'-joined strings at the output boundary:
    the external comparator canonicalizes via pandas, which cannot hash
    raw array cells (round-1 driver ERR)."""
    docs = _with_content(load_table(spark, sf_dir, "documents"))
    good, _quarantine = parse_content(docs, ARGOT_SCHEMA)
    flat = flatten_struct_columns(good, keep=["doc_id"])
    suffixed = suffix_columns(flat, exclude=("doc_id",))
    out = [
        F.array_join(F.col(f.name).cast("array<string>"), "|").alias(f.name)
        if isinstance(f.dataType, T.ArrayType)
        else F.col(f.name)
        for f in suffixed.schema.fields
    ]
    return suffixed.select(*out)


@query(
    "docs_quarantine_stats",
    oracle="""
    WITH payloads AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 17 = 3 THEN '{broken json'
                  ELSE '{"id": ' || doc_id || '}' END AS content
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN json_valid(content) THEN 0 ELSE 1 END)
                AS BIGINT) AS n_quarantined
    FROM payloads
    GROUP BY source
    """,
)
def docs_quarantine_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The A9 error-channel analogue at the gate: corrupt payloads (every
    17th record, synthesized identically on both sides) land in the
    quarantine frame instead of failing the job; the query reports
    quarantine rates per source — the operational health metric a
    100 TB ingest run watches."""
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % 17 == 3, F.lit("{broken json")).otherwise(
            F.concat(F.lit('{"id": '), F.col("doc_id"), F.lit("}"))
        ).alias("content"),
    )
    schema = T.StructType([T.StructField("id", T.LongType())])
    good, quarantine = parse_content(payloads, schema)
    counts = payloads.groupBy("source").agg(F.count("*").alias("n_docs"))
    qcounts = quarantine.groupBy("source").agg(
        F.count("*").alias("n_quarantined")
    )
    return (
        counts.join(qcounts, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_quarantined", F.lit(0)).alias("n_quarantined"),
        )
    )


def _lang_authorities(d):
    """Synthesized authority snapshot keyed on language — the derived
    stand-in for the Redis store's contents, buildable identically in
    the oracle so the ENRICHMENT JOIN itself is what gets checked."""
    return (
        d.select(F.col("lang").alias("key"))
        .distinct()
        .select(
            "key",
            F.concat(F.upper("key"), F.lit("-AUTH")).alias("auth_label"),
            F.concat(F.lit("lang/"), F.col("key")).alias("auth_uri"),
        )
    )


@query(
    "authority_enrich",
    oracle="""
    WITH auth AS (
      SELECT DISTINCT lang AS key,
             upper(lang) || '-AUTH' AS auth_label,
             'lang/' || lang AS auth_uri
      FROM documents
    )
    SELECT d.doc_id, d.lang, a.auth_label, a.auth_uri
    FROM documents d LEFT JOIN auth a ON d.lang = a.key
    WHERE d.doc_id < 500
    """,
)
def authority_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier B7 at the gate: the REAL enrichment operator
    (docpipe.authority.enrich_with_authorities, scalar-key path — a
    broadcast left join standing in for the reference's per-record Redis
    lookups, ingest.go:28-30) over a snapshot synthesized identically on
    both engines.  At 100 TB the snapshot broadcasts (dimension-sized by
    definition); the docs side never shuffles."""
    from reindexer_spark.docpipe.authority import enrich_with_authorities

    d = load_table(spark, sf_dir, "documents")
    docs = d.filter(F.col("doc_id") < 500).select("doc_id", "lang")
    return enrich_with_authorities(docs, _lang_authorities(d), doc_key="lang")


@query(
    "authority_enrich_multikey",
    oracle="""
    WITH d AS (
      SELECT doc_id, [lang, source] AS subj FROM documents WHERE doc_id < 300
    ), keys AS (
      SELECT DISTINCT lang AS key FROM documents
      UNION SELECT DISTINCT source FROM documents
    ), auth AS (
      SELECT key, upper(key) || '#pref' AS pref_label FROM keys
    ), ex AS (
      SELECT doc_id, unnest(subj) AS k FROM d
    ), j AS (
      SELECT e.doc_id, a.pref_label FROM ex e LEFT JOIN auth a ON e.k = a.key
    )
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(list(pref_label))), '|')
             AS pref_labels
    FROM j GROUP BY doc_id
    """,
)
def authority_enrich_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The array-key enrichment path: a document carries MULTIPLE
    authority keys (subject URIs in the reference's data model); the
    operator explodes, joins each element against the broadcast
    snapshot, and regroups to one row per document.  The gathered labels
    are sorted and serialized at the output boundary (collect order is
    partition-dependent; the comparator needs scalar cells)."""
    from reindexer_spark.docpipe.authority import enrich_with_authorities

    d = load_table(spark, sf_dir, "documents")
    docs = d.filter(F.col("doc_id") < 300).select(
        "doc_id", F.array("lang", "source").alias("subj")
    )
    auth = (
        d.select(F.col("lang").alias("key"))
        .union(d.select(F.col("source").alias("key")))
        .distinct()
        .select("key", F.concat(F.upper("key"), F.lit("#pref")).alias("pref_label"))
    )
    enriched = enrich_with_authorities(docs, auth, doc_key="subj")
    return enriched.select(
        "doc_id",
        F.array_join(F.array_sort("pref_label"), "|").alias("pref_labels"),
    )
