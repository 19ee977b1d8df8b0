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


TPCH_Q18ISH = """
WITH big AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 120
)
SELECT c.c_name, o.o_orderkey,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
       o.o_totalprice
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN big        ON big.l_orderkey = o.o_orderkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
"""

TPCH_Q19ISH = """
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 25)
   OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 5 AND 30
       AND l.l_quantity >= 10 AND l.l_quantity <= 40)
   OR (p.p_type = 'PROMO' AND l.l_discount > 0.05)
"""


TPCH_Q7ISH = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       {year_fn} AS l_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS volume
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE n1.n_name < n2.n_name
GROUP BY n1.n_name, n2.n_name, {year_fn}
"""

TPCH_Q10ISH = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_returned_lines
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name
"""

TPCH_Q16ISH = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
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


@query("sql_tpch_q18ish", oracle=TPCH_Q18ISH)
def sql_tpch_q18ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume-order query: an aggregate HAVING
    filter used as a semi-join driver, then re-joined for detail.
    Catalyst evaluates `big` once (the agg is the filter's only input)
    and the second lineitem pass re-aggregates only surviving orders;
    decimal quantity sums keep the HAVING boundary exact, so no row can
    flip sides between engines."""
    return run_sql(spark, sf_dir, TPCH_Q18ISH)


@query(
    "sql_tpch_q7ish",
    oracle=TPCH_Q7ISH.format(year_fn="CAST(year(l.l_shipdate) AS BIGINT)"),
)
def sql_tpch_q7ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style nation-pair volume: a six-table join where the two
    nation dimensions are broadcast (tiny), the fact-side joins shuffle
    on their keys, and the pair inequality (n1 < n2) canonicalizes the
    direction without a second pass.  Decimal revenue keeps the sums
    order-independent."""
    return run_sql(
        spark, sf_dir,
        TPCH_Q7ISH.format(year_fn="CAST(year(l.l_shipdate) AS BIGINT)"),
    )


@query("sql_tpch_q10ish", oracle=TPCH_Q10ISH)
def sql_tpch_q10ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item report: the returnflag filter lands
    in the lineitem scan (pushed predicate), customer/nation broadcast,
    and the aggregate carries both a decimal revenue and a row count."""
    return run_sql(spark, sf_dir, TPCH_Q10ISH)


@query("sql_tpch_q16ish", oracle=TPCH_Q16ISH)
def sql_tpch_q16ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style supplier count: NOT IN subquery → null-aware anti
    join against the (tiny, broadcast) excluded-supplier set, then
    COUNT(DISTINCT) per part attribute group — the two-shuffle
    distinct-aggregate shape."""
    return run_sql(spark, sf_dir, TPCH_Q16ISH)


@query("sql_tpch_q19ish", oracle=TPCH_Q19ISH)
def sql_tpch_q19ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive predicate join: an OR-of-ANDs mixing
    part and lineitem columns.  The join key (p_partkey = l_partkey)
    stays an equi-join — the disjunction becomes a post-join filter with
    the single-table conjuncts (brand/size/type, quantity/discount)
    inferred and pushed below the join by Catalyst's
    constraint propagation."""
    return run_sql(spark, sf_dir, TPCH_Q19ISH)
