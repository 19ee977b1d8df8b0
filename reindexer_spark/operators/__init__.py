"""Operator inventory (SURVEY.md §2).

Importing this package registers every query with
``reindexer_spark.registry`` — each module covers one tier/family:

- ``reindex``     Tier A/B reference semantics (scan, filter, resume, probe)
- ``relational``  Tier C2-C4: predicates, join zoo, aggregations
- ``windows``     Tier C5-C6: window functions, top-k, sort/limit
- ``setops``      Tier C7: union / intersect / except / distinct
- ``scalar``      Tier C8: string / date / math / array / map / JSON functions
- ``sql_surface`` Tier B10: arbitrary user SQL (subqueries, CTEs) via spark.sql
- ``udfs``        Tier C14: pandas_udf / applyInPandas escape hatch
- ``dedup``       Tier C9 + north-star dedup family
- ``similarity``  Tier C10: ANN / cosine k-NN over embeddings
- ``text``        Tier C11: lang-id, quality, tokens, fingerprints
- ``multimodal``  Tier C12: vector/binary column operations
- ``windows_time``Tier C13: event-time windows (batch-mode semantics)
- ``sampling``    north-star: deterministic sampling / split / mix / shuffle
"""

from reindexer_spark.operators import (  # noqa: F401
    analytics,
    crawl,
    dedup,
    docshape,
    graph,
    incremental,
    layout,
    mlprep,
    multimodal,
    reindex,
    relational,
    sampling,
    scalar,
    scalejoin,
    setops,
    similarity,
    sql_surface,
    text,
    text_clean,
    udfs,
    windows,
    windows_time,
)
