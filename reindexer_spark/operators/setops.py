"""Tier C7 — set operations: UNION / INTERSECT / EXCEPT / DISTINCT."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reindexer_spark.catalog import load_table
from reindexer_spark.registry import query


def _custkeys_in_year(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.year("o_orderdate") == year).select("o_custkey")


@query(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
    UNION
    SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): customers active in 1996 or 1997."""
    a = _custkeys_in_year(spark, sf_dir, 1996)
    b = _custkeys_in_year(spark, sf_dir, 1997)
    return a.union(b).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
    INTERSECT
    SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers active in both years."""
    a = _custkeys_in_year(spark, sf_dir, 1996)
    b = _custkeys_in_year(spark, sf_dir, 1997)
    return a.intersect(b)


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — multiplicities subtract)."""
    a = _custkeys_in_year(spark, sf_dir, 1996)
    b = _custkeys_in_year(spark, sf_dir, 1997)
    return a.exceptAll(b)


@query(
    "set_distinct_multi",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def set_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column DISTINCT (dropDuplicates on a projection)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").dropDuplicates()


@query(
    "set_union_by_name",
    oracle="""
    SELECT c_custkey AS entity_id, 'customer' AS kind, c_acctbal AS balance
    FROM customer
    UNION ALL BY NAME
    SELECT s_acctbal AS balance, 'supplier' AS kind, s_suppkey AS entity_id
    FROM supplier
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: position-independent union (column order differs on
    purpose — positional union would silently mix columns)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.lit("customer").alias("kind"),
        F.col("c_acctbal").alias("balance"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_acctbal").alias("balance"),
        F.lit("supplier").alias("kind"),
        F.col("s_suppkey").alias("entity_id"),
    )
    return c.unionByName(s)


@query(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — multiplicities take the minimum)."""
    a = _custkeys_in_year(spark, sf_dir, 1996)
    b = _custkeys_in_year(spark, sf_dir, 1997)
    return a.intersectAll(b)
