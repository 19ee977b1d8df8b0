"""Tier C5-C6 — window functions, top-k, sort/limit.

Every ranking breaks ties on a unique key: at 100 TB a rank that depends
on partition-internal row order is nondeterministic across runs, which
breaks idempotent re-ingest (the reference's resume contract,
/root/reference/README.md:84-87) as well as the oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reindexer_spark.catalog import load_table
from reindexer_spark.functions import date_str, dec
from reindexer_spark.registry import query


@query(
    "window_topn_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer.  Window + filter beats sort-limit per
    group: one shuffle on the partition key, no global sort."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer over order history (exact decimal prefix
    sums → deterministic)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, event_type,
           LAG(value) OVER w AS prev_value,
           LEAD(event_type) OVER w AS next_type,
           epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG / LEAD over per-user event streams + inter-event gap seconds."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("event_type").over(w).alias("next_type"),
        # exact integer microseconds — truncated-seconds arithmetic
        # (unix_timestamp) is not associative with the subtraction
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )


@query(
    "window_rank_dense",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal,
           RANK()       OVER w AS bal_rank,
           DENSE_RANK() OVER w AS bal_dense_rank,
           NTILE(4)     OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC, c_custkey) AS bal_quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK (tie-aware, same peer groups both engines) and
    NTILE (tie-broken on the unique key for determinism)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    wq = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(wq).alias("bal_quartile"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1995-01-01', o_orderdate::DATE)
             RANGE BETWEEN 90 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_90d_spend
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: trailing-90-day spend per customer (order key = days
    since epoch date, so the frame is value-based, not row-based)."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_day", F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("order_day")
        .rangeBetween(-90, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("trailing_90d_spend"),
    )


@query(
    "sort_limit_topk",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 10
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k.  Spark compiles orderBy+limit into TakeOrderedAndProject
    — a per-partition heap + driver merge, NOT a full sort: exactly the
    plan you want at 100 TB."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(10)
        .select("c_custkey", "c_name", "c_acctbal")
    )


@query(
    "asof_join",
    oracle="""
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS last_click_ts,
           c.value AS last_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one — SURVEY §2 C-custom): for each
    purchase, the most recent preceding click by the same user.

    Implemented as union + window last_value(ignorenulls), which is a
    single shuffle on (user_id) + one sort — O(n log n) and skew-safe,
    versus the naive join-then-max which explodes on hot keys.
    """
    e = load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "purchase")
    right = e.filter(F.col("event_type") == "click")

    tagged = left.select(
        "user_id",
        "ts",
        F.lit(1).alias("is_left"),
        F.col("event_id"),
        F.lit(None).cast("double").alias("r_value"),
        F.lit(None).cast("timestamp").alias("r_ts"),
    ).unionByName(
        right.select(
            "user_id",
            "ts",
            F.lit(0).alias("is_left"),
            F.lit(None).cast("long").alias("event_id"),
            F.col("value").alias("r_value"),
            F.col("ts").alias("r_ts"),
        )
    )
    # Right rows sort before left rows at the same ts (is_left ASC) so a
    # click at exactly p.ts is visible to the purchase, matching ASOF <=.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.select(
        "user_id",
        "ts",
        "is_left",
        "event_id",
        F.last("r_value", ignorenulls=True).over(w).alias("last_click_value"),
        F.last("r_ts", ignorenulls=True).over(w).alias("last_click_ts_raw"),
    )
    return filled.filter(F.col("is_left") == 1).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("last_click_ts_raw", "yyyy-MM-dd HH:mm:ss").alias(
            "last_click_ts"
        ),
        "last_click_value",
    )


@query(
    "window_dist",
    oracle="""
    SELECT c_custkey, c_nationkey,
           PERCENT_RANK() OVER w AS bal_pct_rank,
           CUME_DIST()    OVER w AS bal_cume_dist,
           CAST(CAST(c_acctbal AS DECIMAL(12,2))
                  * COUNT(c_acctbal) OVER (PARTITION BY c_nationkey)
                - SUM(CAST(c_acctbal AS DECIMAL(12,2)))
                    OVER (PARTITION BY c_nationkey) AS DOUBLE)
             AS bal_dev_scaled
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal)
    """,
)
def window_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK / CUME_DIST (tie-aware distribution functions — exact
    int-ratio doubles, identical across engines) and the deviation from
    the group mean, kept in exact decimals as bal·n − Σbal (the scaled
    deviation).  Dividing by n lands exactly on half-cent boundaries for
    power-of-two group sizes, where Spark (rounds the binary value) and
    DuckDB (rounds the shortest decimal repr) disagree — so the division
    is the one step left out."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal")
    wa = Window.partitionBy("c_nationkey")
    dev_scaled = (
        dec("c_acctbal") * F.count("c_acctbal").over(wa)
        - F.sum(dec("c_acctbal")).over(wa)
    ).cast("double")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
        dev_scaled.alias("bal_dev_scaled"),
    )


@query(
    "sort_offset_pagination",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 10 OFFSET 10
    """,
)
def sort_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: page 2 of the balance leaderboard (OFFSET + LIMIT over
    a total order with unique tie-break).  Note for scale: OFFSET n
    still computes the first n rows — keyset pagination (WHERE key >
    last_seen) is the 100 TB pattern; this exercises the operator."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .offset(10)
        .limit(10)
        .select("c_custkey", "c_name", "c_acctbal")
    )


@query(
    "window_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS latest_order,
           NTH_VALUE(o_orderkey, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE with explicit full-partition
    frames (the default running frame makes LAST_VALUE a silent
    identity — the classic window-frame trap)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("latest_order"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
    )


ASOF_TOLERANCE_US = 3_600_000_000  # 1 hour, integer microseconds


@query(
    "asof_join_tolerance",
    oracle=f"""
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= {ASOF_TOLERANCE_US}
                THEN strftime(c.ts, '%Y-%m-%d %H:%M:%S') END AS last_click_ts,
           CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= {ASOF_TOLERANCE_US}
                THEN epoch_us(p.ts) - epoch_us(c.ts) END AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE bound (pandas merge_asof's
    ``tolerance=``, kdb's windowed aj): the most recent preceding click
    counts only within 1 hour of the purchase — stale matches surface
    as NULL, exactly like a miss.  The tolerance is applied AFTER the
    as-of resolution (match-then-bound, the merge_asof semantic), not
    as a join predicate, so a purchase whose nearest click is stale
    does NOT fall back to an older in-window click — there is none by
    construction.

    Same single-shuffle union+window shape as asof_join; the bound is a
    stateless integer-microsecond comparison on the resolved pair, so
    the scale profile is identical."""
    e = load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "purchase")
    right = e.filter(F.col("event_type") == "click")
    tagged = left.select(
        "user_id",
        "ts",
        F.lit(1).alias("is_left"),
        F.col("event_id"),
        F.lit(None).cast("timestamp").alias("r_ts"),
    ).unionByName(
        right.select(
            "user_id",
            "ts",
            F.lit(0).alias("is_left"),
            F.lit(None).cast("long").alias("event_id"),
            F.col("ts").alias("r_ts"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.select(
        "user_id",
        "ts",
        "is_left",
        "event_id",
        F.last("r_ts", ignorenulls=True).over(w).alias("c_ts"),
    ).filter(F.col("is_left") == 1)
    gap = F.unix_micros("ts") - F.unix_micros("c_ts")
    in_tol = gap <= ASOF_TOLERANCE_US
    return filled.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.when(in_tol, F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss")).alias(
            "last_click_ts"
        ),
        F.when(in_tol, gap).alias("gap_us"),
    )


@query(
    "asof_join_forward",
    oracle="""
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS next_purchase_ts,
           p.value AS next_purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND p.ts >= c.ts
    """,
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (pandas merge_asof direction='forward'): for
    each click, the EARLIEST purchase at or after it by the same user —
    the attribution question asked from the other side.  Mirror image
    of the backward operator: right rows sort AFTER left rows at equal
    ts (is_left DESC ordering keeps a purchase at exactly c.ts visible),
    and the window scans forward with first_value(ignorenulls) over
    (currentRow, unboundedFollowing).  Same one-shuffle skew-safe
    shape."""
    e = load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "click")
    right = e.filter(F.col("event_type") == "purchase")
    tagged = left.select(
        "user_id",
        "ts",
        F.lit(0).alias("sort_tag"),  # left rows first at equal ts
        F.col("event_id"),
        F.lit(None).cast("double").alias("r_value"),
        F.lit(None).cast("timestamp").alias("r_ts"),
    ).unionByName(
        right.select(
            "user_id",
            "ts",
            F.lit(1).alias("sort_tag"),
            F.lit(None).cast("long").alias("event_id"),
            F.col("value").alias("r_value"),
            F.col("ts").alias("r_ts"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "sort_tag")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = tagged.select(
        "user_id",
        "ts",
        "sort_tag",
        "event_id",
        F.first("r_value", ignorenulls=True).over(w).alias(
            "next_purchase_value"
        ),
        F.first("r_ts", ignorenulls=True).over(w).alias("p_ts"),
    ).filter(F.col("sort_tag") == 0)
    return filled.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "next_purchase_ts"
        ),
        "next_purchase_value",
    )
