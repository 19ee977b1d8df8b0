"""Tier B10 — the arbitrary-user-SQL surface.

The reference's entire query capability is "any SQL PostgreSQL accepts"
shipped as text (/root/reference/config/config.go:20, README.md:64).
The engine's equivalent is ``run_sql``: catalog tables registered as
views + full Spark SQL.  The registered queries below exercise exactly
that path — the query text goes through ``spark.sql``, not the
DataFrame builder API — including the classically hard SQL shapes
(correlated scalar subqueries, EXISTS with ranges, CTEs) that Catalyst
decorrelates/rewrites automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from reindexer_spark.catalog import register_views
from reindexer_spark.registry import query


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """The user-SQL entry point (config.go:20 equivalent, unbroken —
    reference bug B2 made the configurable query dead code)."""
    register_views(spark, sf_dir)
    return spark.sql(sql)


TPCH_Q3ISH = """
SELECT o.o_orderkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
       {date_fn} AS orderdate_str,
       o.o_orderpriority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1996-06-30 00:00:00'
GROUP BY o.o_orderkey, {date_fn}, o.o_orderpriority
"""

SUBQ_CORRELATED = """
SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
FROM customer c
WHERE c.c_acctbal > (
  SELECT AVG(c2.c_acctbal) FROM customer c2
  WHERE c2.c_nationkey = c.c_nationkey
)
"""

SUBQ_EXISTS_RANGE = """
SELECT o.o_orderkey, o.o_orderpriority
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
"""

CTE_CHAIN = """
WITH nation_counts AS (
  SELECT c_nationkey AS nk, COUNT(*) AS n_cust
  FROM customer GROUP BY c_nationkey
), ranked AS (
  SELECT nk, n_cust,
         ROW_NUMBER() OVER (ORDER BY n_cust DESC, nk) AS rn
  FROM nation_counts
)
SELECT n.n_name, r.n_cust, r.rn
FROM ranked r JOIN nation n ON n.n_nationkey = r.nk
WHERE r.rn <= 10
"""


@query(
    "sql_tpch_q3ish",
    oracle=TPCH_Q3ISH.format(date_fn="strftime(o.o_orderdate, '%Y-%m-%d')"),
)
def sql_tpch_q3ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style shipping-priority query submitted as raw SQL text —
    segment-filtered customer broadcast into orders⋈lineitem."""
    return run_sql(
        spark,
        sf_dir,
        TPCH_Q3ISH.format(date_fn="date_format(o.o_orderdate, 'yyyy-MM-dd')"),
    )


@query("sql_subquery_correlated", oracle=SUBQ_CORRELATED)
def sql_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (customers above their nation's average
    balance).  Catalyst decorrelates this into an aggregate + join — no
    per-row re-execution, which is what makes it viable at scale.

    AVG here is a plain double average on both engines: the comparison
    is an inequality against values of much coarser spacing, so the
    reduction-order ulp cannot flip it (acctbal spacing is 0.01; a
    boundary collision would need a customer balance equal to the group
    mean to ~1e-12, which the 2-decimal data cannot produce).
    """
    return run_sql(spark, sf_dir, SUBQ_CORRELATED)


@query("sql_subquery_exists", oracle=SUBQ_EXISTS_RANGE)
def sql_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS with a correlated range predicate (orders with any lineitem
    shipped after the order date) → rewritten to a semi join."""
    return run_sql(spark, sf_dir, SUBQ_EXISTS_RANGE)


@query("sql_cte_chain", oracle=CTE_CHAIN)
def sql_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE pipeline: aggregate → window rank → dimension join → top-k."""
    return run_sql(spark, sf_dir, CTE_CHAIN)
