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


def _skewed_fixture(spark):
    """Synthetic hot-key corpus: key 7 carries half the fact rows
    (400 of 800), the rest spread over 40 cold keys — skew_vs_mean
    ~20x for the hot key, so the 3/2-mean threshold flags exactly it."""
    from pyspark.sql import functions as F

    orders = (
        spark.range(800)
        .select(
            F.col("id").alias("o_orderkey"),
            F.when(F.col("id") < 400, F.lit(7))
            .otherwise(F.pmod(F.col("id"), F.lit(40)) + 100)
            .alias("o_custkey"),
            (F.col("id") % 50 + 1).cast("decimal(12,2)").alias("o_totalprice"),
        )
    )
    customer = spark.createDataFrame(
        [(7, 0)] + [(100 + i, i % 3) for i in range(40)],
        "c_custkey bigint, c_nationkey int",
    )
    nation = spark.createDataFrame(
        [(0, "ALPHA"), (1, "BETA"), (2, "GAMMA")],
        "n_nationkey int, n_name string",
    )
    return orders, customer, nation


def test_salted_hot_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    from reindexer_spark.operators.scalejoin import salted_hot_join

    orders, customer, nation = _skewed_fixture(spark)
    got = {
        r["n_name"]: (r["order_cnt"], r["hot_orders"], r["total_revenue"])
        for r in salted_hot_join(orders, customer, nation).collect()
    }
    plain = {
        r["n_name"]: (r["cnt"], float(r["rev"]))
        for r in orders.join(
            customer, orders.o_custkey == customer.c_custkey
        )
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("cnt"), F.sum("o_totalprice").alias("rev"))
        .collect()
    }
    assert set(got) == set(plain)
    for name, (cnt, hot, rev) in got.items():
        assert (cnt, rev) == plain[name]
    # the hot key (custkey 7 -> nation ALPHA) rode the salted path
    assert got["ALPHA"][1] == 400
    assert got["BETA"][1] == got["GAMMA"][1] == 0


def test_salted_hot_join_spreads_hot_key_and_keeps_dim_lean(spark):
    """The remediation's two invariants: the hot key's fact rows carry
    multiple salts (so they hash to multiple reducers), and the
    dimension replicates ONLY hot keys (cold keys stay single-row —
    the advantage over uniform whole-dimension salting)."""
    from pyspark.sql import functions as F

    from reindexer_spark.operators.scalejoin import _NSALT, salted_hot_join

    orders, customer, nation = _skewed_fixture(spark)
    out = salted_hot_join(orders, customer, nation)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # the salted equi-join is a real shuffled join on (key, salt), not a
    # broadcast (which would dodge the skew question) or a cartesian
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan

    # fact side: hot rows spread across all salts, cold rows pinned to 0
    hot_salts = (
        orders.withColumn(
            "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(_NSALT))
        )
        .filter(F.col("o_custkey") == 7)
        .select("salt")
        .distinct()
        .count()
    )
    assert hot_salts == _NSALT

    # straggler factor: hash-partitioning the fact on (key) leaves one
    # reducer with ~half the rows; (key, salt) spreads it
    def max_over_mean(df, *cols):
        loads = [
            r["n"]
            for r in df.repartition(8, *cols)
            .groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count("*").alias("n"))
            .collect()
        ]
        return max(loads) / (sum(loads) / 8)

    salted = orders.withColumn(
        "salt",
        F.when(
            F.col("o_custkey") == 7,
            F.pmod(F.xxhash64("o_orderkey"), F.lit(_NSALT)),
        ).otherwise(F.lit(0)),
    )
    unsalted_factor = max_over_mean(orders, "o_custkey")
    salted_factor = max_over_mean(salted, "o_custkey", "salt")
    assert unsalted_factor > 3.0  # hot key makes one straggler partition
    assert salted_factor < unsalted_factor / 2
