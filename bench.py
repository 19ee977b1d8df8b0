#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "headline_total", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": 0.1}

Each query runs end-to-end into Spark's noop sink (full materialization,
no driver collect bottleneck), which is what a sink-bound production run
looks like.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Coverage across the operator families: reference scan, heavy agg,
# multi-join, window, set op, near-dup (exact + LSH), ANN, text battery,
# event-time sessionization.
HEADLINE = [
    "reindex_scan",
    "q1_pricing_summary",
    "q5_regional_revenue",
    "window_topn_per_group",
    "set_except_all",
    "dedup_exact_hash",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "knn_bruteforce",
    "knn_ivf_lsh",
    "knn_multiband_lsh",
    "text_quality",
    "text_fingerprint",
    "window_session",
    "scalar_json",
    "embed_vector_stats",
    "text_tfidf",
    "sql_tpch_q3ish",
    "dedup_embedding_lsh",
    "sample_weighted_mix",
    "corpus_shuffle_shard",
    "text_repetition",
    "text_contamination",
    "embed_centroid_assign",
    "corpus_curation_funnel",
    "graph_nation_pagerank",
    # Keep the Structured Streaming query LAST: a finished streaming query
    # leaves the JVM intermittently stalling batch jobs for a short while
    # (observed multi-second pauses in the next few actions; state-store
    # maintenance interval ruled out), so nothing should be timed after it.
    "stream_tumbling_live",
]


def main() -> int:
    from reindexer_spark import get_query, get_spark

    spark = get_spark("reindexer-bench")
    # Warm up the JVM/codegen/file-listing paths once so per-query numbers
    # measure the queries, not first-action session initialization.
    from reindexer_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, SF_DIR, t).limit(1).count()

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in HEADLINE:
        q = get_query(name)
        t0 = time.perf_counter()
        q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(time.perf_counter() - t_all, 3)

    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
