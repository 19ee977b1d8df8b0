"""Tier C2-C4 — predicates, the join zoo, aggregations.

These are the semantics the reference delegates wholesale to PostgreSQL
through its configurable SQL query (/root/reference/config/config.go:20,
README.md:64 — Tier B10 'arbitrary user SQL'), implemented as native
DataFrame plans.  Scale notes per query in the docstrings; the common
themes:

- dimension tables (region/nation/supplier/customer vs lineitem) are
  broadcast — no shuffle of the fact table for those joins;
- aggregations are hash-aggs with map-side partial aggregation (automatic
  for all algebraic aggs used here);
- money math goes through DECIMAL (see reindexer_spark.functions) so the
  result is independent of partitioning / reduction order — a correctness
  property at 100 TB, not just an oracle convenience.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reindexer_spark.catalog import load_table
from reindexer_spark.functions import dec, dsum, mean_exact, stddev_exact
from reindexer_spark.registry import query

Q1_CUTOFF = "1998-09-02 00:00:00"


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(12,2)))
               * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: single scan → partial+final hash agg.

    Plan at scale: parquet scan with the shipdate filter pushed down, no
    shuffle until the (tiny: |returnflag × linestatus|) final aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty, ext, disc, tax = (
        dec("l_quantity"),
        dec("l_extendedprice"),
        dec("l_discount"),
        dec("l_tax"),
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(qty, "sum_qty"),
            dsum(ext, "sum_base_price"),
            dsum(ext * (F.lit(1) - disc), "sum_disc_price"),
            dsum(ext * (F.lit(1) - disc) * (F.lit(1) + tax), "sum_charge"),
            mean_exact(qty, "avg_qty"),
            mean_exact(ext, "avg_price"),
            mean_exact(disc, "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "filter_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_size BETWEEN 10 AND 20
      AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND p_name LIKE '%widget%'
      AND p_type IS NOT NULL
      AND NOT (p_size = 13)
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier C2 predicate battery: BETWEEN / IN / LIKE / IS NOT NULL / NOT —
    all pushed to the parquet scan (verify via PushedFilters in explain)."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_size").between(10, 20)
        & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & F.col("p_name").like("%widget%")
        & F.col("p_type").isNotNull()
        & ~(F.col("p_size") == 13)
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


@query(
    "q5_regional_revenue",
    oracle="""
    SELECT
      n.n_name,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_lineitems
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way join: fact table (lineitem) joined to
    broadcast dimensions; only orders⋈lineitem is a real (shuffled) join
    at scale, and AQE converts even that to broadcast when the filtered
    orders side is small enough."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), "revenue"),
        F.count("*").alias("n_lineitems"),
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_spend
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping order-less customers (n_orders = 0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(12,2)"))
            .cast("double")
            .alias("total_spend"),
        )
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus,
           c.c_name, c.c_mktsegment
    FROM customer c
    RIGHT JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_orderkey < 500
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join preserving the orders side (Catalyst plans it as
    the mirrored left-outer; registered so the full outer-join inventory
    — left/right/full — is explicit in the gate, not implied)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return c.join(o, c.c_custkey == o.o_custkey, "right").select(
        "o_orderkey", "o_orderstatus", "c_name", "c_mktsegment"
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one finished order.
    Semi joins never duplicate the probe side — at scale this avoids a
    join-then-distinct blowup entirely."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cn AS (
      SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
      FROM customer GROUP BY c_nationkey
    ), sn AS (
      SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
      FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
           COALESCE(cn.n_customers, 0) AS n_customers,
           COALESCE(sn.n_suppliers, 0) AS n_suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides (aggregate-then-join:
    shrink both inputs before the shuffle, never after)."""
    cn = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return cn.join(sn, "nationkey", "full_outer").select(
        F.col("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, s.o_orderstatus
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny relations (broadcast nested loop)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    s = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s)


@query(
    "join_theta_pairs",
    oracle="""
    SELECT p1.p_size AS p_size, COUNT(*) AS n_pairs
    FROM part p1
    JOIN part p2
      ON p1.p_size = p2.p_size
     AND p1.p_partkey < p2.p_partkey
     AND p1.p_brand <> p2.p_brand
    GROUP BY p1.p_size
    """,
)
def join_theta_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + theta join: same-size cross-brand part pairs.  The equi key
    carries the shuffle; the theta conditions evaluate as residual
    predicates inside the join, never as a cartesian product."""
    p1 = load_table(spark, sf_dir, "part").alias("p1")
    p2 = load_table(spark, sf_dir, "part").alias("p2")
    return (
        p1.join(
            p2,
            (F.col("p1.p_size") == F.col("p2.p_size"))
            & (F.col("p1.p_partkey") < F.col("p2.p_partkey"))
            & (F.col("p1.p_brand") != F.col("p2.p_brand")),
        )
        .groupBy(F.col("p1.p_size").alias("p_size"))
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "join_range_band",
    oracle="""
    SELECT l.l_returnflag, COUNT(*) AS n_in_band,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS band_price
    FROM lineitem l
    JOIN part p
      ON l.l_partkey = p.p_partkey
     AND l.l_extendedprice >= p.p_retailprice * 10
     AND l.l_extendedprice <  p.p_retailprice * 40
    GROUP BY l.l_returnflag
    """,
)
def join_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-band join: equi key + numeric band residual (the scalable
    shape for range joins — bucket on the equi key, band as residual)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(
            F.broadcast(p),
            (li.l_partkey == p.p_partkey)
            & (li.l_extendedprice >= p.p_retailprice * 10)
            & (li.l_extendedprice < p.p_retailprice * 40),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_in_band"),
            dsum(dec("l_extendedprice"), "band_price"),
        )
    )


@query(
    "agg_distinct_stats",
    oracle="""
    SELECT
      o_orderpriority,
      COUNT(*) AS n_orders,
      COUNT(DISTINCT o_custkey) AS n_customers,
      CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price,
      CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_price,
      ROUND(SQRT((ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2))), 2)::DOUBLE
            - SUM(CAST(o_totalprice AS DECIMAL(12,2)))::DOUBLE
              * SUM(CAST(o_totalprice AS DECIMAL(12,2)))::DOUBLE / COUNT(o_totalprice))
           / (COUNT(o_totalprice) - 1)), 2) AS std_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation + order-statistics battery.  COUNT DISTINCT
    triggers Spark's expand/two-phase distinct-agg rewrite; stddev is
    computed from exact decimal sums (see functions.stddev_exact) so the
    value is reduction-order-independent."""
    o = load_table(spark, sf_dir, "orders")
    price = dec("o_totalprice")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.min(price).cast("double").alias("min_price"),
        F.max(price).cast("double").alias("max_price"),
        mean_exact(price, "avg_price"),
        stddev_exact(price, "std_price"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() markers (distinguish NULL-as-total from a
    genuine NULL key)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        dsum(dec("l_quantity"), "sum_qty"),
        F.count("*").alias("n"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping sets)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), dsum(dec("o_totalprice"), "total")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface (Tier B10: the engine
    exposes full Spark SQL for user queries, as the reference exposes
    PostgreSQL SQL)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_open,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_finished
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation) with an explicit value list — the explicit
    list matters at scale: it avoids the extra distinct-values job."""
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")))
    )
    return piv.select(
        "l_returnflag",
        F.col("O").cast("double").alias("qty_open"),
        F.col("F").cast("double").alias("qty_finished"),
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.9) AS p90,
           MAX(o_totalprice) AS p_max
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (SQL PERCENTILE = DuckDB
    quantile_cont).  At 100 TB swap to approx_percentile — exact
    percentile requires a per-group sort; the approximate sketch is
    mergeable and one-pass."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", 0.5).alias("p50"),
        F.percentile("o_totalprice", 0.9).alias("p90"),
        F.max("o_totalprice").alias("p_max"),
    )


@query(
    "agg_approx_sketches",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS orders_in_band,
           TRUE AS parts_in_band,
           TRUE AS median_in_band,
           TRUE AS p25_in_band,
           TRUE AS p75_in_band
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the 100 TB substitutes for their exact
    cousins: HyperLogLog++ distinct counts and quantile sketches are
    single-pass, mergeable, and fixed-memory, where COUNT(DISTINCT) and
    exact percentiles need a shuffle of every distinct value.  Sketch
    VALUES are engine-specific, so what is oracle-checked is the
    published accuracy contract: each estimate is reduced to a boolean
    "within its error band of the exact answer" (HLL++ default
    rsd=0.05 → ±15 % ≈ 3σ; rsd=0.01 → ±3 %; percentile_approx with
    accuracy 10 000 → rank error ≪ ±0.01 quantile, checked against the
    exact percentiles at q±0.01).  The DuckDB oracle computes the same
    exact counts and asserts the bands as literal TRUE — a sketch
    drifting out of contract hash-mismatches into a red driver row."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_orderkey").alias("_ao"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("_ap"),
        F.percentile_approx("l_extendedprice", 0.5, 10_000)
        .cast("double")
        .alias("_amed"),
        F.percentile_approx("l_extendedprice", 0.25, 10_000)
        .cast("double")
        .alias("_a25"),
        F.percentile_approx("l_extendedprice", 0.75, 10_000)
        .cast("double")
        .alias("_a75"),
        F.percentile(price, F.lit(0.49)).alias("_lo50"),
        F.percentile(price, F.lit(0.51)).alias("_hi50"),
        F.percentile(price, F.lit(0.24)).alias("_lo25"),
        F.percentile(price, F.lit(0.26)).alias("_hi25"),
        F.percentile(price, F.lit(0.74)).alias("_lo75"),
        F.percentile(price, F.lit(0.76)).alias("_hi75"),
    )
    in_band = lambda a, lo, hi: F.col(a).between(F.col(lo), F.col(hi))  # noqa: E731
    rel_band = lambda a, exact, tol: (  # noqa: E731
        F.abs(F.col(a) - F.col(exact)) <= tol * F.col(exact)
    )
    return agg.select(
        "l_returnflag",
        "n",
        "exact_orders",
        "exact_parts",
        rel_band("_ao", "exact_orders", 0.15).alias("orders_in_band"),
        rel_band("_ap", "exact_parts", 0.03).alias("parts_in_band"),
        in_band("_amed", "_lo50", "_hi50").alias("median_in_band"),
        in_band("_a25", "_lo25", "_hi25").alias("p25_in_band"),
        in_band("_a75", "_lo75", "_hi75").alias("p75_in_band"),
    )


@query(
    "agg_salted_twostage",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
           COUNT(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def agg_salted_twostage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-stage aggregation: pre-aggregate on
    (key, salt) so a hot key's rows split across 16 reducers, then
    combine partials per key.  Identical answer to the direct GROUP BY
    (the oracle IS the direct GROUP BY) — the point of the pattern is
    that correctness survives the rewrite.  events.user_id is genuinely
    skewed testdata (15 users); at 100 TB this and AQE skew handling
    are the two tools for hot keys.  COUNT DISTINCT is rewritten as
    distinct-then-count so stage 1 can carry it."""
    e = load_table(spark, sf_dir, "events")
    salted = e.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
    partial = salted.groupBy("user_id", "salt").agg(
        F.count("*").alias("pn"),
        F.sum(dec("value")).alias("pv"),
        F.collect_set("event_type").alias("ptypes"),
    )
    return partial.groupBy("user_id").agg(
        F.sum("pn").alias("n_events"),
        F.sum("pv").cast("double").alias("total_value"),
        F.size(F.array_distinct(F.flatten(F.collect_list("ptypes"))))
        .cast("bigint")
        .alias("n_types"),
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list(c_custkey)), ',') AS custkeys_csv,
           COUNT(*) AS n
    FROM customer
    WHERE c_acctbal > 9000
    GROUP BY c_nationkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: collect_list is order-nondeterministic under
    parallelism, so the engine convention is sort_array(collect_list(...))
    — deterministic on any partitioning.  The array is serialized to a
    CSV string in the output: the external comparator canonicalizes via
    pandas, which cannot sort/hash raw array cells (round-1 driver ERR)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    arr = F.sort_array(F.collect_list("c_custkey"))
    return c.groupBy("c_nationkey").agg(
        F.array_join(arr.cast("array<string>"), ",").alias("custkeys_csv"),
        F.count("*").alias("n"),
    )


@query(
    "join_null_safe",
    oracle="""
    WITH lhs AS (
      SELECT o_orderkey, CASE WHEN o_orderstatus = 'P' THEN NULL
                              ELSE o_orderstatus END AS status_key
      FROM orders
    ), dim AS (
      SELECT * FROM (VALUES ('O', 'open'), ('F', 'finished'), (NULL, 'pending'))
        AS t(status_key, status_name)
    )
    SELECT l.o_orderkey, l.status_key, d.status_name
    FROM lhs l JOIN dim d ON l.status_key IS NOT DISTINCT FROM d.status_key
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys match
    NULL dimension rows instead of silently dropping — the standard trap
    when dimension keys carry sentinel NULLs."""
    o = load_table(spark, sf_dir, "orders")
    lhs = o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "P", F.lit(None))
        .otherwise(F.col("o_orderstatus"))
        .alias("status_key"),
    )
    dim = o.sparkSession.createDataFrame(
        [("O", "open"), ("F", "finished"), (None, "pending")],
        "status_key string, status_name string",
    )
    return lhs.join(
        F.broadcast(dim), lhs.status_key.eqNullSafe(dim.status_key)
    ).select(lhs.o_orderkey, lhs.status_key, dim.status_name)


@query(
    "agg_boolean",
    oracle="""
    SELECT c_mktsegment,
           bool_and(c_acctbal > -1000) AS all_above_floor,
           bool_or(c_acctbal > 9000) AS any_premium,
           CAST(count_if(c_acctbal < 0) AS BIGINT) AS n_debtors,
           COUNT(*) AS n
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates: bool_and / bool_or / count_if."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.bool_and(F.col("c_acctbal") > -1000).alias("all_above_floor"),
        F.bool_or(F.col("c_acctbal") > 9000).alias("any_premium"),
        F.count_if(F.col("c_acctbal") < 0).alias("n_debtors"),
        F.count("*").alias("n"),
    )


@query(
    "agg_minmax_by",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rd,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice ASC, o_orderkey ASC) AS ra
      FROM orders
    )
    SELECT o_orderpriority,
           MAX(CASE WHEN rd = 1 THEN o_orderkey END) AS biggest_order,
           MAX(CASE WHEN ra = 1 THEN o_orderkey END) AS smallest_order,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price
    FROM ranked
    GROUP BY o_orderpriority
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN_BY / MAX_BY with a composite (value, unique-key) ordering
    struct: bare max_by(key, price) is nondeterministic when two rows
    tie on price — the struct tie-break makes the picked row unique on
    any partitioning.  (DuckDB's max_by does not order by structs, so
    the oracle states the same semantics via window ranks.)"""
    o = load_table(spark, sf_dir, "orders")
    rank_struct = F.struct(
        F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k")
    )
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", rank_struct).alias("biggest_order"),
        F.min_by("o_orderkey", rank_struct).alias("smallest_order"),
        F.max(dec("o_totalprice")).cast("double").alias("max_price"),
    )


@query(
    "agg_corr_exact",
    oracle="""
    SELECT l_returnflag,
           ROUND(
             (COUNT(*) * SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)))::DOUBLE
              - SUM(CAST(l_quantity AS DECIMAL(12,2)))::DOUBLE
                * SUM(CAST(l_extendedprice AS DECIMAL(12,2)))::DOUBLE)
             / (SQRT(COUNT(*) * ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))), 2)::DOUBLE
                     - SUM(CAST(l_quantity AS DECIMAL(12,2)))::DOUBLE
                       * SUM(CAST(l_quantity AS DECIMAL(12,2)))::DOUBLE)
                * SQRT(COUNT(*) * ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))), 2)::DOUBLE
                       - SUM(CAST(l_extendedprice AS DECIMAL(12,2)))::DOUBLE
                         * SUM(CAST(l_extendedprice AS DECIMAL(12,2)))::DOUBLE)),
             6) AS qty_price_corr,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from exact decimal sums (n·Σxy − ΣxΣy over the
    √ of the variance products) — the built-in corr() is a streaming
    covariance whose low bits depend on merge order; this formulation is
    reduction-order-independent and matches the oracle bit-for-bit after
    one final rounding.  Same pattern as functions.stddev_exact."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = dec("l_quantity"), dec("l_extendedprice")
    n = F.count("*")
    sx = F.sum(x).cast("double")
    sy = F.sum(y).cast("double")
    sxy = F.sum(x * y).cast("double")
    sxx = F.sum(x * x).cast("decimal(38,2)").cast("double")
    syy = F.sum(y * y).cast("decimal(38,2)").cast("double")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return li.groupBy("l_returnflag").agg(
        F.round(corr, 6).alias("qty_price_corr"), n.alias("n")
    )


@query(
    "unpivot_metrics",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, value
    FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
          FROM lineitem WHERE l_orderkey < 100)
    UNPIVOT (value FOR metric IN (l_quantity, l_discount, l_tax))
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long): three measure columns melt into
    (metric, value) rows — the inverse of agg_pivot."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "value",
    )


@query(
    "gapfill_monthly_revenue",
    oracle="""
    WITH months AS (
      SELECT strftime(m, '%Y-%m') AS month
      FROM generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '2001-08-01',
                           INTERVAL 1 MONTH) AS t(m)
    ), rev AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT months.month,
           COALESCE(rev.revenue, 0.0) AS revenue,
           COALESCE(rev.n_orders, 0) AS n_orders
    FROM months LEFT JOIN rev USING (month)
    """,
)
def gapfill_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling / densification: a generated calendar spine left-joined
    to the sparse aggregate, zero-filling empty months — the time-series
    completeness pattern (sequence + explode generates the spine
    engine-side; no driver loop)."""
    o = load_table(spark, sf_dir, "orders")
    spine = o.sparkSession.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("timestamp"),
                F.lit("2001-08-01").cast("timestamp"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("m")
    ).select(F.date_format("m", "yyyy-MM").alias("month"))
    rev = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
    ).agg(
        F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
        F.count("*").alias("n_orders"),
    )
    return spine.join(rev, "month", "left").select(
        "month",
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )
