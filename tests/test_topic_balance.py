"""corpus_topic_balance (round 15): topic-balanced resampling on top
of the k-means assignment — inverse-propensity weights and a
deterministic hash-thinned keep decision with NO windows, ranking, or
driver collect (the only shape that survives 100 TB)."""

from __future__ import annotations

import hashlib

from reindexer_spark.operators.mlprep import corpus_topic_balance


def test_weights_and_keep_rule(spark, sf_dir):
    rows = corpus_topic_balance(spark, sf_dir).collect()
    assert rows
    total = len(rows)
    k = 8
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert sum(len(v) for v in by_cluster.values()) == total
    for cid, members in by_cluster.items():
        n = members[0]["n_cluster"]
        assert len(members) == n
        # inverse-propensity weight: total/(k*n) in micro units
        assert members[0]["weight_micro"] == total * 1000000 // (k * n)
        for r in members:
            u32 = int(
                hashlib.md5(str(r["vec_id"]).encode()).hexdigest()[:8],
                16,
            )
            expect = int(u32 * k * n < total * (1 << 32))
            assert r["kept"] == expect, r["vec_id"]
    # small clusters (n <= total/k) keep everything
    for cid, members in by_cluster.items():
        n = members[0]["n_cluster"]
        if n * k <= total:
            assert all(r["kept"] == 1 for r in members)
    # expected kept mass per over-quota cluster ~ total/k: the hash is
    # uniform, so kept count must land within a wide tolerance
    for cid, members in by_cluster.items():
        n = members[0]["n_cluster"]
        if n * k > total * 2:  # clearly over quota
            kept = sum(r["kept"] for r in members)
            assert kept < n  # thinning really happened


def test_plan_has_no_windows_or_rowwise_python(spark, sf_dir):
    """The balancing keep-rule must stay map-side: no row-at-a-time
    Python, no Window nodes at all (the r16 optimization replaced the
    kmeans argmax windows with one VECTORIZED Arrow assignment pass —
    exactly one ArrowEvalPython evaluation, not the duplicated pair the
    optimizer produces when a pushed filter re-inlines the UDF)."""
    df = corpus_topic_balance(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Window" not in plan
    # the assignment UDF runs ONCE, at cache materialization: every
    # ArrowEvalPython occurrence in the plan string is the cached
    # relation's recorded lineage (one per InMemoryTableScan printout),
    # never a stacked duplicate-evaluation pair inside one lineage
    n_arrow = plan.count("ArrowEvalPython")
    n_cached = plan.count("InMemoryRelation")
    assert n_arrow == n_cached, plan
