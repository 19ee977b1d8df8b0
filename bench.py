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
    # The streaming query's position is NOT load-bearing: the round-1
    # "post-stream stall" did not reproduce in 5 controlled runs (batch
    # latencies flat after the stream, mid-list at sf0.1 included) and
    # matched the known external VM noise spikes; the stream teardown now
    # also hard-joins its thread (runner.run_stream_to_memory).  Kept last
    # only for round-over-round timing comparability with BENCH_r01.
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
    _print_delta_ledger(timings, total, sf)
    return 0


def _print_delta_ledger(timings: dict[str, float], total: float, sf) -> None:
    """Cross-round perf ledger to STDERR (stdout stays the one-line JSON
    contract): per-query delta vs the newest BENCH_r*.json at the same sf.
    This VM shows occasional multi-second external noise spikes — re-run
    before believing any single regression."""
    import glob
    import os.path

    prior = sorted(glob.glob(os.path.join(os.path.dirname(__file__) or ".", "BENCH_r*.json")))
    if not prior:
        return
    try:
        with open(prior[-1]) as fh:
            base = json.load(fh)
    except (OSError, json.JSONDecodeError):
        return
    if "parsed" in base:  # driver-recorded BENCH_r*.json wraps our line
        base = base["parsed"] or {}
    if base.get("sf") != sf:
        return
    bq = base.get("queries", {})
    lines = [f"# perf vs {os.path.basename(prior[-1])} (sf={sf})"]
    for name, t in timings.items():
        b = bq.get(name)
        if b:
            lines.append(f"{name}: {t:.2f}s vs {b:.2f}s ({(t - b) / b:+.0%})")
        else:
            lines.append(f"{name}: {t:.2f}s (new)")
    bt = base.get("value")
    if bt:
        lines.append(f"TOTAL: {total:.2f}s vs {bt:.2f}s ({(total - bt) / bt:+.0%})")
    print("\n".join(lines), file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
