"""Scale-pattern join tests: bloom-filter properties (the correctness
contract is zero false negatives; the efficiency contract is a bounded
false-positive rate) and the plan shapes of the salted / bloom-pruned /
merge queries."""

from __future__ import annotations

import numpy as np

from reindexer_spark.operators.scalejoin import _bloom_build, _bloom_maybe
from tests.test_plans import plan_of


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**62, size=5000, dtype=np.int64)
    bits, m = _bloom_build(keys)
    assert _bloom_maybe(bits, m, keys).all()


def test_bloom_false_positive_rate_bounded():
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 2**32, size=5000, dtype=np.int64)
    bits, m = _bloom_build(keys)
    # disjoint probe domain
    probes = rng.integers(2**33, 2**34, size=20000, dtype=np.int64)
    fp = _bloom_maybe(bits, m, probes).mean()
    assert fp < 0.02, fp  # 16 bits/key, k=7 → theory ~0.2%


def test_bloom_empty_and_single():
    bits, m = _bloom_build(np.array([], dtype=np.int64))
    assert not _bloom_maybe(bits, m, np.array([1, 2, 3], dtype=np.int64)).any()
    bits, m = _bloom_build(np.array([42], dtype=np.int64))
    assert _bloom_maybe(bits, m, np.array([42], dtype=np.int64)).all()


def test_bloom_prune_join_is_broadcast(spark, sf_dir):
    plan = plan_of(spark, "join_bloom_prune", sf_dir)
    assert "BroadcastHashJoin" in plan
    # the pandas_udf probe runs BEFORE the join: ArrowEvalPython must
    # appear in the fact-side scan stage, not after the join
    assert "ArrowEvalPython" in plan


def test_salted_join_no_cartesian(spark, sf_dir):
    plan = plan_of(spark, "join_skew_salted", sf_dir)
    assert "CartesianProduct" not in plan
    # dimension explode ×S then equi-join on (custkey, salt)
    # the dimension-side explode plans as a Generate node; don't couple
    # to how the (constant-folded) array argument renders
    assert "Generate" in plan and "explode" in plan.lower()


def test_triangle_phase_broadcasts_edges(spark, sf_dir):
    plan = plan_of(spark, "graph_triangle_count", sf_dir)
    # both self-joins on the brand-bounded edge relation are broadcast
    assert plan.count("BroadcastHashJoin") >= 2


def test_merge_upsert_single_shuffle_join(spark, sf_dir):
    plan = plan_of(spark, "merge_upsert", sf_dir)
    assert "FullOuter" in plan


def test_mix64_avalanche():
    # each flipped input bit must flip ~half the output bits (the
    # property whose absence caused the 1000x-over-theory FPR): mean
    # hamming distance across single-bit flips should be near 32
    from reindexer_spark.operators.scalejoin import _mix64

    rng = np.random.default_rng(3)
    base = rng.integers(0, 2**63, size=200, dtype=np.int64).astype(np.uint64)
    h0 = _mix64(base.copy())
    dists = []
    for bit in range(0, 64, 7):
        flipped = base ^ np.uint64(1 << bit)
        diff = h0 ^ _mix64(flipped.copy())
        dists.append(np.unpackbits(diff.view(np.uint8)).sum() / len(base))
    mean = float(np.mean(dists))
    assert 24.0 < mean < 40.0, mean
