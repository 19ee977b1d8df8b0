"""Storage-layout scale techniques: bucketed joins that skip the
shuffle entirely, and partition-pruned scans.  These are the two layout
decisions that matter most at 100 TB; the tests pin that the engine's
recipes actually produce the shuffle-free / pruned plans they promise.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


def _physical(df) -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(jmode)


@pytest.fixture(scope="module")
def warehouse(spark):
    """Bucketed copies of orders + lineitem co-partitioned on the join
    key (the recipe from README 'Shuffle discipline')."""
    # spark.sql.warehouse.dir is a static conf — tables land in the
    # session's default warehouse (./spark-warehouse, gitignored) and are
    # dropped in teardown; stale locations from a previous crashed run
    # are cleared first (managed-table locations must not pre-exist)
    import shutil

    for t in ("orders_bucketed", "lineitem_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    o = spark.table("orders_bucketed")
    li = spark.table("lineitem_bucketed")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
        "o_orderstatus"
    ).agg(F.count("*").alias("n"))
    # at sf0.001 both sides fit the broadcast threshold, which would hide
    # the bucketed sort-merge path this test exists to pin — disable it
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _physical(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # SortMergeJoin consumes bucket layout directly: the only exchange
    # node allowed is the one for the final (tiny) aggregation — an
    # unbucketed SMJ would add one per join side (3 total).
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:1500]
    # and the answer matches the plain-parquet join
    o2 = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li2 = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    expected = (
        li2.join(o2, li2.l_orderkey == o2.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_partitioned_write_prunes(spark, tmp_path):
    """Date-partitioned layout: a month filter must prune partitions at
    planning time (PartitionFilters), not scan-and-discard."""
    out = str(tmp_path / "orders_by_month")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    o.withColumn("order_month", F.date_format("o_orderdate", "yyyy-MM")).write.mode(
        "overwrite"
    ).partitionBy("order_month").parquet(out)

    pruned = spark.read.parquet(out).filter(F.col("order_month") == "1996-03")
    plan = _physical(pruned)
    assert "PartitionFilters" in plan
    assert re.search(r"PartitionFilters:.*order_month.*1996-03", plan)
    expected = o.filter(F.date_format("o_orderdate", "yyyy-MM") == "1996-03").count()
    assert pruned.count() == expected
