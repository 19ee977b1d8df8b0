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


# --- the rest of the TPC-H suite, schema-adapted ("-ish") -------------
#
# With the queries below the repo covers all 22 TPC-H query shapes on
# the driver's synthetic subset schema (TESTDATA.md; no partsupp table,
# no commit/receipt dates — each query notes its adaptation).  All SQL
# is engine-shared text: the SAME string runs through spark.sql and the
# DuckDB oracle, so aliases/types cannot drift.  Money math follows the
# house rule: exact DECIMAL accumulation, DOUBLE only at the output
# boundary, CAST(... AS BIGINT) around counts (DuckDB SUMs of integers
# are HUGEINT).

TPCH_Q2ISH = """
SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE p.p_type = 'LARGE' AND p.p_size <= 10 AND r.r_name = 'EUROPE'
  AND s.s_acctbal = (
    SELECT MIN(s2.s_acctbal)
    FROM supplier s2
    JOIN lineitem l2 ON l2.l_suppkey = s2.s_suppkey
    JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
    JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
    WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
  )
"""

TPCH_Q4ISH = """
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o.o_orderpriority
"""

TPCH_Q6ISH = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""

TPCH_Q8ISH = """
SELECT l_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_9' THEN vol END) AS DOUBLE)
          / CAST(SUM(vol) AS DOUBLE) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS l_year,
         CAST(l.l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l.l_discount AS DECIMAL(12,2))) AS vol,
         n2.n_name AS supp_nation
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = n1.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
) all_nations
GROUP BY l_year
"""

TPCH_Q9ISH = """
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
         - CAST(p.p_retailprice AS DECIMAL(12,2)) * CAST(0.2 AS DECIMAL(2,1))
           * CAST(l.l_quantity AS DECIMAL(12,2)) AS amount
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%ring%'
) profit
GROUP BY nation, o_year
"""

TPCH_Q11ISH = """
WITH partrev AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS part_value
  FROM lineitem
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(part_value AS DOUBLE) AS part_value
FROM partrev
WHERE part_value > (SELECT SUM(part_value) * 0.0006 FROM partrev)
"""

TPCH_Q12ISH = """
SELECT l.l_returnflag AS shipmode,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > o.o_orderdate
GROUP BY l.l_returnflag
"""

TPCH_Q13ISH = """
WITH c_orders AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY c_count
"""

TPCH_Q14ISH = """
SELECT CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                          THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                               * (1 - CAST(l.l_discount AS DECIMAL(12,2))) END)
                 AS DOUBLE) * 100
          / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE)
       AS DOUBLE) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
"""

TPCH_Q15ISH = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""

TPCH_Q17ISH = """
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
       AS DOUBLE) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_small_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13' AND p.p_size < 10
  AND l.l_quantity < (
    SELECT 0.5 * AVG(l2.l_quantity)
    FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""

TPCH_Q20ISH = """
SELECT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  WHERE l.l_partkey IN (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
    )
    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l.l_suppkey
  HAVING SUM(CAST(l.l_quantity AS DECIMAL(12,2))) > 500
)
"""

TPCH_Q21ISH = """
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s.s_name
"""

TPCH_Q22ISH = """
SELECT c.c_nationkey AS cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer c,
     (SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
             SUM(CAST(c2.c_acctbal AS DECIMAL(14,2))) AS tot
      FROM customer c2
      WHERE c2.c_acctbal > 0.00
        AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)) t
WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  AND CAST(c.c_acctbal AS DECIMAL(14,2)) * t.cnt > t.tot
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
  )
GROUP BY c.c_nationkey
"""


@query("sql_tpch_q2ish", oracle=TPCH_Q2ISH)
def sql_tpch_q2ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style minimum-cost supplier.  No partsupp table in the
    subset schema, so "cost" is the supplier's account balance and the
    part↔supplier relation comes from shipped lineitems.  The shape is
    preserved: a correlated MIN subquery per part over a multi-dimension
    join, which Catalyst decorrelates into an aggregate + rejoin (one
    pass, no per-row re-execution).  DISTINCT collapses the lineitem
    multiplicity.  Equality on s_acctbal compares stored doubles with
    no arithmetic, so it cannot drift between engines."""
    return run_sql(spark, sf_dir, TPCH_Q2ISH)


@query("sql_tpch_q4ish", oracle=TPCH_Q4ISH)
def sql_tpch_q4ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking.  commit/receipt dates don't
    exist in the subset schema; "late" is ship > order date + 30 days.
    The correlated EXISTS becomes a left-semi join on l_orderkey with
    the date comparison carried in the join condition."""
    return run_sql(spark, sf_dir, TPCH_Q4ISH)


@query("sql_tpch_q6ish", oracle=TPCH_Q6ISH)
def sql_tpch_q6ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast-revenue change: the pure scan-filter-aggregate
    query.  Every predicate (shipdate range, discount band, quantity
    cap) pushes into the parquet scan; the aggregation is a single
    map-side-combined decimal sum — the cheapest possible plan shape,
    and the canonical pushdown litmus test."""
    return run_sql(spark, sf_dir, TPCH_Q6ISH)


@query("sql_tpch_q8ish", oracle=TPCH_Q8ISH)
def sql_tpch_q8ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: an 8-table join (lineitem at the
    center; part/orders/customer/supplier plus two nation aliases and
    region) feeding a conditional-share aggregate.  Exact decimal sums
    per year, ratio taken in double only at the output boundary.  The
    three dimension chains all broadcast; lineitem is scanned once."""
    return run_sql(spark, sf_dir, TPCH_Q8ISH)


@query("sql_tpch_q9ish", oracle=TPCH_Q9ISH)
def sql_tpch_q9ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit.  partsupp's supplycost is absent,
    so cost is proxied as 20% of p_retailprice per unit — the shape
    (part-name LIKE filter, 5-table join, profit expression aggregated
    by nation × year) is intact.  All money math in DECIMAL; the LIKE
    filter prunes part before the join fans out."""
    return run_sql(spark, sf_dir, TPCH_Q9ISH)


@query("sql_tpch_q11ish", oracle=TPCH_Q11ISH)
def sql_tpch_q11ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock: group-by-part value vs a global-total
    scalar subquery over the SAME aggregate.  Catalyst evaluates the
    CTE once per consumer; both consumers reduce the same shuffle
    output, and the threshold comparison is exact decimal × decimal
    (0.0006 parses as DECIMAL(4,4) in both engines)."""
    return run_sql(spark, sf_dir, TPCH_Q11ISH)


@query("sql_tpch_q12ish", oracle=TPCH_Q12ISH)
def sql_tpch_q12ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-mode priority split.  No l_shipmode column —
    l_returnflag stands in as the 3-value mode proxy.  One fact-fact
    join (orders⋈lineitem on the order key) then two conditional counts
    per mode; the CAST(... AS BIGINT) pins DuckDB's HUGEINT sums to the
    Spark LongType."""
    return run_sql(spark, sf_dir, TPCH_Q12ISH)


@query("sql_tpch_q13ish", oracle=TPCH_Q13ISH)
def sql_tpch_q13ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution: LEFT JOIN with an
    extra non-key join predicate (the priority exclusion must live in
    the ON clause, not WHERE, to preserve order-less customers), then a
    double aggregation — count per customer, histogram of counts."""
    return run_sql(spark, sf_dir, TPCH_Q13ISH)


@query("sql_tpch_q14ish", oracle=TPCH_Q14ISH)
def sql_tpch_q14ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promo-revenue share: single-month lineitem slice joined
    to part, conditional decimal sum over total decimal sum.  The
    division happens once, on two exact sums, in double — deterministic
    on both engines because the operand trees are identical."""
    return run_sql(spark, sf_dir, TPCH_Q14ISH)


@query("sql_tpch_q15ish", oracle=TPCH_Q15ISH)
def sql_tpch_q15ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: a revenue CTE consumed twice — once for
    the MAX scalar, once re-joined for the winner's detail row.  The
    decimal total_revenue makes the MAX-equality exact (the classic
    Q15 floating-point tie hazard disappears)."""
    return run_sql(spark, sf_dir, TPCH_Q15ISH)


@query("sql_tpch_q17ish", oracle=TPCH_Q17ISH)
def sql_tpch_q17ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: correlated AVG subquery
    per part (quantity < half the part's average), decorrelated by
    Catalyst into one aggregate over lineitem + rejoin.  Quantities are
    small integral doubles, so the per-part average is exact IEEE
    arithmetic — identical on both engines even at the boundary."""
    return run_sql(spark, sf_dir, TPCH_Q17ISH)


@query("sql_tpch_q20ish", oracle=TPCH_Q20ISH)
def sql_tpch_q20ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 part promotion: a two-deep nested IN — suppliers who
    shipped > 500 units of name-filtered parts in a year.  Both INs
    rewrite to semi joins; the inner part filter broadcasts, and the
    HAVING threshold is an exact decimal sum."""
    return run_sql(spark, sf_dir, TPCH_Q20ISH)


@query("sql_tpch_q21ish", oracle=TPCH_Q21ISH)
def sql_tpch_q21ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers-kept-waiting: the hardest subquery shape in
    the suite — EXISTS (another supplier touched the order) AND NOT
    EXISTS (any other supplier was also late), with "late" derived from
    the outer order's date.  Spark plans these as a left-semi plus a
    left-anti join against lineitem, both keyed on l_orderkey with the
    extra predicates in the join condition."""
    return run_sql(spark, sf_dir, TPCH_Q21ISH)


@query("sql_tpch_q22ish", oracle=TPCH_Q22ISH)
def sql_tpch_q22ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global-sales opportunity: customers in selected
    countries (c_nationkey stands in for the phone-prefix country code)
    with above-average positive balances and no recent orders.  An
    uncorrelated AVG scalar + NOT EXISTS anti join.  The AVG inequality
    tolerates the double reduction-order ulp because acctbal spacing is
    0.01 (same argument as sql_subquery_correlated)."""
    return run_sql(spark, sf_dir, TPCH_Q22ISH)
