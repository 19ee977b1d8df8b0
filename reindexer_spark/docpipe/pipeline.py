"""End-to-end reindex pipeline — the reference's ``main()``
(/root/reference/driver.go:119-220) as one declarative Spark job.

Reference stage → here:

- Postgres scan + WHERE/ORDER (driver.go:178, config.go:78)
    → source DataFrame + filter/sort plan (pushdown does the rest)
- resume splice (config.go:29-34)           → resume.apply_resume
- chunk temp files (driver.go:192-207)      → sink-side batches
- worker pool + argot exec (driver.go:166-171, ingest.go:27-33)
    → flatten/suffix/enrich column algebra + SolrSink.foreachPartition
- error channel (driver.go:160)             → quarantine DataFrame
- lockfile (driver.go:94-111)               → not ported (scheduler concern)

The whole thing is one action: Spark pipelines scan→shape→sink per
partition with its own backpressure, which is exactly what the
reference hand-built with two bounded channels and a WaitGroup.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reindexer_spark.docpipe.authority import (
    enrich_with_authorities,
    load_authority_snapshot,
)
from reindexer_spark.docpipe.config import ReindexConfig
from reindexer_spark.docpipe.flatten import (
    flatten_struct_columns,
    infer_content_schema,
    parse_content,
    suffix_columns,
)
from reindexer_spark.docpipe.resume import apply_resume
from reindexer_spark.docpipe.solr_sink import SolrSink


@dataclass
class ReindexResult:
    ingested: int = 0
    quarantined: int = 0
    quarantine: DataFrame | None = None
    shaped: DataFrame | None = None


def documents_as_spofford(docs: DataFrame) -> DataFrame:
    """testdata ``documents`` → the reference's source relation shape
    (driver.go:21-26: id / txn_id / owner / content-JSON / deleted).

    Pure column algebra — to_json(struct(...)) builds the nested
    Argot-style payload JVM-side, so an end-to-end run over this view
    measures the PIPELINE (parse→flatten→suffix→sink), not Python
    fixture code.  ~3% of payloads are corrupted (truncated JSON) to
    keep the quarantine lane honest, and ~10% of rows are soft-deleted,
    both deterministic in doc_id."""
    did = F.col("doc_id")
    sid = F.format_string("id%07d", did)
    payload = F.to_json(
        F.struct(
            sid.alias("id"),
            F.struct(
                F.substring("text", 1, 40).alias("main"),
                F.col("lang").alias("sub"),
            ).alias("title"),
            F.slice(F.split("text", " "), 1, 3).alias("authors"),
            F.col("source").alias("publisher"),
            (did % 30 + 1990).alias("publication_year"),
            F.col("n_chars").alias("n_chars"),
        )
    )
    corrupt = did % 31 == 3
    return docs.select(
        sid.alias("id"),
        F.format_string("txn%d", did % 10).alias("txn_id"),
        F.col("source").alias("owner"),
        F.when(corrupt, F.substring(payload, 1, 20)).otherwise(payload).alias(
            "content"
        ),
        (did % 10 == 9).alias("deleted"),
    )


def shape_documents(
    docs: DataFrame,
    conf: ReindexConfig,
    authorities: DataFrame | None = None,
    auth_doc_key: str | None = None,
    id_col: str = "id",
    deleted_col: str | None = "deleted",
) -> tuple[DataFrame, DataFrame]:
    """scan-filter-resume-parse-flatten-suffix-enrich; returns
    (shaped, quarantine)."""
    live = docs
    if deleted_col and deleted_col in docs.columns:
        live = live.filter(~F.col(deleted_col))
    live = apply_resume(live, id_col, conf.start_id, conf.resume_inclusive)

    schema = infer_content_schema(live)
    good, quarantine = parse_content(live, schema)
    flat = flatten_struct_columns(
        good, keep=[c for c in (id_col,) if c in good.columns]
    )
    shaped = suffix_columns(flat, exclude=(id_col,))
    if authorities is not None and auth_doc_key is not None:
        shaped = enrich_with_authorities(shaped, authorities, auth_doc_key)
    return shaped, quarantine


def run_reindex(
    docs: DataFrame,
    conf: ReindexConfig,
    sink: SolrSink | None = None,
    authorities: DataFrame | None = None,
    auth_doc_key: str | None = None,
    id_col: str = "id",
) -> ReindexResult:
    """The full pipeline; counts via one pass each over the two small
    outcome frames (no accumulators — deterministic under retries).

    Authority enrichment follows the reference's ``-a --redis-url`` flag
    pair (ingest.go:28-30): when ``conf.authorities`` is on and no
    snapshot DataFrame is passed explicitly, ``conf.redis_url`` is
    resolved via :func:`load_authority_snapshot` (file-backed snapshot,
    or a live redis:// store where the client exists)."""
    if authorities is None and conf.authorities and conf.redis_url:
        authorities = load_authority_snapshot(docs.sparkSession, conf.redis_url)
    shaped, quarantine = shape_documents(
        docs, conf, authorities, auth_doc_key, id_col=id_col
    )
    # Materialize each branch once (optimization r16): the sink write,
    # the ingested count, and any caller reuse of result.shaped would
    # otherwise each re-run the whole scan→parse→flatten→suffix
    # pipeline (3 full passes measured at sf0.1); same for the
    # quarantine branch.  track() releases both at the next query start.
    from reindexer_spark.cache import track

    shaped = track(shaped)
    quarantine = track(quarantine)
    sink = sink or SolrSink(conf.solr_url, batch_size=conf.chunk_size)
    sink.write(shaped, id_col=id_col)
    return ReindexResult(
        ingested=shaped.count(),
        quarantined=quarantine.count(),
        quarantine=quarantine,
        shaped=shaped,
    )
