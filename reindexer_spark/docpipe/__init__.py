"""The document pipeline — the half of the reference that lives in the
external ``argot`` tool plus the driver's chunk/sink plumbing, natively
on Spark (SURVEY.md §2 Tier A4-A9 / B5-B9).

Stages (each usable standalone, composed by ``pipeline.run_reindex``):

- ``config``     reference-faithful config load/validate (A10) with the
                 reference's bugs fixed (B2 query override, B5 strict >)
- ``flatten``    Argot JSON parse → recursive flatten → Solr-style
                 dynamic-field suffixing (B5, B6)
- ``authority``  broadcast-join authority enrichment (B7)
- ``chunker``    fixed-size NDJSON chunk writing, one record per line (A4,
                 A5; fixes reference bug B10)
- ``solr_sink``  batched, idempotent bulk-upsert sink with pluggable
                 transport (B8) + quarantine of failed records (A9)
- ``resume``     high-water-mark resume (B9 + strict-> B2 semantics)
- ``pipeline``   end-to-end orchestration (the reference's main())
"""

from reindexer_spark.docpipe.config import ReindexConfig
from reindexer_spark.docpipe.flatten import (
    flatten_struct_columns,
    infer_content_schema,
    parse_content,
    suffix_columns,
)
from reindexer_spark.docpipe.authority import enrich_with_authorities
from reindexer_spark.docpipe.chunker import write_ndjson_chunks
from reindexer_spark.docpipe.preflight import PreflightError, preflight
from reindexer_spark.docpipe.resume import apply_resume, highwater
from reindexer_spark.docpipe.solr_sink import SolrSink

__all__ = [
    "ReindexConfig",
    "infer_content_schema",
    "parse_content",
    "flatten_struct_columns",
    "suffix_columns",
    "enrich_with_authorities",
    "write_ndjson_chunks",
    "apply_resume",
    "highwater",
    "SolrSink",
]
