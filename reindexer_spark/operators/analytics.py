"""Behavioral analytics over ``events`` — cohort retention, RFM
segmentation, histograms, active-user ratios.

These are the reporting queries a reindex/ingest pipeline's operators
dashboard runs (Tier B10 territory: the reference would ship them to
Postgres as user SQL, `config.go:20`); here they are native DataFrame
plans, each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reindexer_spark.catalog import load_table
from reindexer_spark.functions import dec
from reindexer_spark.registry import query

HIST_BIN = 50.0


@query(
    "events_cohort_retention",
    oracle="""
    WITH cohort AS (
      SELECT user_id, date_trunc('month', MIN(ts)) AS cohort_month
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('month', ts) AS act_month FROM events
    )
    SELECT strftime(c.cohort_month, '%Y-%m') AS cohort_month,
           date_diff('month', c.cohort_month, a.act_month) AS month_offset,
           COUNT(*) AS n_users
    FROM cohort c JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention triangle: users bucketed by first-seen
    month, counted in each subsequent activity month.

    Both inputs aggregate on user_id first (map-side partials shrink the
    event stream to one row per user/month), so the join is between two
    already-small relations co-partitioned on user_id — the raw event
    table is never joined or shuffled twice."""
    e = load_table(spark, sf_dir, "events")
    cohort = e.groupBy("user_id").agg(
        F.date_trunc("month", F.min("ts")).alias("cohort_month")
    )
    activity = e.select(
        "user_id", F.date_trunc("month", "ts").alias("act_month")
    ).distinct()
    return (
        cohort.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort_month", "yyyy-MM").alias("cohort_month"),
            (F.months_between("act_month", "cohort_month"))
            .cast("bigint")
            .alias("month_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "events_rfm_segments",
    oracle="""
    WITH anchor AS (SELECT MAX(ts) AS max_ts FROM events),
    per_user AS (
      SELECT user_id,
             date_diff('day', MAX(ts), (SELECT max_ts FROM anchor)) AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS monetary
      FROM events GROUP BY user_id
    )
    SELECT user_id, recency_days, frequency, monetary,
           NTILE(4) OVER (ORDER BY recency_days, user_id) AS r_quartile,
           NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS f_quartile,
           NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS m_quartile
    FROM per_user
    """,
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user recency (days before the corpus
    max-timestamp anchor), frequency, decimal-exact monetary sum, each
    quartiled by NTILE with a user_id tie-break for determinism.

    The per-user aggregate is the heavy stage and scales freely.  The
    global NTILE windows are a deliberate small-data tail (one row per
    user); at 100 TB the same segmentation uses approx-quantile cutoff
    literals instead of a global sort — same output contract."""
    e = load_table(spark, sf_dir, "events")
    anchor = e.agg(F.max("ts").alias("max_ts"))
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").alias("frequency"),
            F.sum(dec("value")).cast("double").alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff(F.col("max_ts"), F.col("last_ts"))
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    return per_user.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4)
        .over(Window.orderBy("recency_days", "user_id"))
        .alias("r_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("frequency"), F.asc("user_id")))
        .alias("f_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("monetary"), F.asc("user_id")))
        .alias("m_quartile"),
    )


@query(
    "events_histogram_value",
    oracle=f"""
    SELECT FLOOR(value / {HIST_BIN})::BIGINT AS bin,
           COUNT(*) AS n,
           MIN(value) AS lo,
           MAX(value) AS hi
    FROM events
    GROUP BY 1
    """,
)
def events_histogram_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of the value column — the distributed
    histogram primitive: bin assignment is a pure projection, the
    aggregate shuffles |bins| rows per mapper regardless of data size."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.floor(F.col("value") / HIST_BIN).cast("bigint").alias("bin")
        )
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


@query(
    "events_ohlc_hourly",
    oracle="""
    WITH base AS (
      SELECT date_trunc('hour', ts) AS hour, value, ts, event_id FROM events
    ), ranked AS (
      SELECT hour, value,
             ROW_NUMBER() OVER (PARTITION BY hour
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY hour
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM base
    ), oc AS (
      SELECT hour,
             MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
             MAX(CASE WHEN rn_d = 1 THEN value END) AS close
      FROM ranked GROUP BY hour
    ), hl AS (
      SELECT hour, MAX(value) AS high, MIN(value) AS low,
             COUNT(*) AS n_ticks,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS volume
      FROM base GROUP BY hour
    )
    SELECT strftime(oc.hour, '%Y-%m-%d %H:%M:%S') AS hour,
           oc.open, hl.high, hl.low, oc.close, hl.n_ticks, hl.volume
    FROM oc JOIN hl ON hl.hour = oc.hour
    """,
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series OHLC resampling: per hour, the first/last value (ties
    broken by event_id → deterministic), extremes, tick count, and
    decimal-exact volume.

    Open/close come from per-hour row_number windows — the window key is
    the resample bucket, so state never exceeds one bucket per partition
    stream; high/low/volume are plain hash aggregates.  Both halves
    shuffle on the same key and the final join is co-partitioned."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        F.date_trunc("hour", "ts").alias("hour"), "value", "ts", "event_id"
    )
    w_asc = Window.partitionBy("hour").orderBy(F.asc("ts"), F.asc("event_id"))
    w_desc = Window.partitionBy("hour").orderBy(F.desc("ts"), F.desc("event_id"))
    ranked = base.select(
        "hour",
        "value",
        F.row_number().over(w_asc).alias("rn_a"),
        F.row_number().over(w_desc).alias("rn_d"),
    )
    oc = ranked.groupBy("hour").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
    )
    hl = base.groupBy("hour").agg(
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.count("*").alias("n_ticks"),
        F.sum(dec("value")).cast("double").alias("volume"),
    )
    return oc.join(hl, "hour").select(
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "open",
        "high",
        "low",
        "close",
        "n_ticks",
        "volume",
    )


@query(
    "events_dau_wau",
    oracle="""
    WITH dau AS (
      SELECT date_trunc('day', ts) AS day, COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY 1
    ), wau AS (
      SELECT date_trunc('week', ts) AS week, COUNT(DISTINCT user_id) AS wau
      FROM events GROUP BY 1
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
           ROUND(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
    FROM dau d JOIN wau w ON date_trunc('week', d.day) = w.week
    """,
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily/weekly active users and the DAU/WAU stickiness ratio.

    Two distinct-count aggregates over the same scan (Spark runs them as
    expand + two-phase aggs); the day→week join is on a tiny dimension
    (one row per day), so it broadcasts."""
    e = load_table(spark, sf_dir, "events")
    dau = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    wau = e.groupBy(F.date_trunc("week", "ts").alias("week")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        dau.join(F.broadcast(wau), F.date_trunc("week", F.col("day")) == F.col("week"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
    )


@query(
    "docs_topk_words",
    oracle="""
    WITH words AS (
      SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
    ), counts AS (
      SELECT lang, word, COUNT(*) AS c FROM words GROUP BY 1, 2
    ), ranked AS (
      SELECT lang, word, c,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, word) AS rnk
      FROM counts
    )
    SELECT lang, word, c, rnk FROM ranked WHERE rnk <= 10
    """,
)
def docs_topk_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary extraction: top-10 words per language by frequency
    (ties broken alphabetically).

    The explode is the wide stage but aggregates immediately with
    map-side partials on (lang, word); the rank window runs on the
    aggregated counts — |vocabulary| rows, not |corpus| — so the top-k
    never sorts raw data."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("word"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("lang", "word", "c", "rnk")
    )


@query(
    "orders_basket_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    )
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
           COUNT(*) AS support
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    GROUP BY 1, 2
    HAVING COUNT(*) >= 5
    """,
)
def orders_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: brand co-occurrence support within an
    order (the pairwise-frequent-itemset step of association mining).

    The self-join is keyed on l_orderkey, so the pair blowup is bounded
    by (lines per order)² — a constant ~7² here, not data-sized; the
    `<` predicate halves it and canonicalizes pair order.  Brand
    cardinality is small, so the support aggregate is tiny; the part
    dimension broadcasts into the fact scan."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    p = load_table(spark, sf_dir, "part")
    items = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 5)
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS s,
             CAST(SUM(CAST(value * value AS DECIMAL(30,8))) AS DOUBLE) AS sq
      FROM events GROUP BY event_type
    ), scored AS (
      SELECT e.event_id, e.event_type, e.value,
             ROUND((e.value - t.s / t.n)
                   / sqrt((t.sq - t.s * t.s / t.n) / (t.n - 1)), 6) AS z
      FROM events e JOIN stats t USING (event_type)
    )
    SELECT event_id, event_type, value, z
    FROM scored WHERE abs(z) >= 2.5
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly detection per event type.

    The per-type variance is computed from decimal-exact sum and
    sum-of-squares (a plain stddev over doubles depends on the reduction
    order, so it could flip rows at the |z| boundary between engines or
    between runs with different partitioning) — the two-accumulator
    formula is also what makes this a single map-side-combinable pass.
    The stats relation is |event types| rows → broadcast back onto the
    stream; one scan for stats, one for scoring."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("s"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(30,8)"))
        .cast("double")
        .alias("sq"),
    )
    mean = F.col("s") / F.col("n")
    var = (F.col("sq") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    z = F.round((F.col("value") - mean) / F.sqrt(var), 6)
    return (
        e.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) >= 2.5)
    )


@query(
    "supplier_pareto_share",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS revenue
      FROM lineitem GROUP BY l_suppkey
    ), total AS (SELECT SUM(revenue) AS t FROM rev),
    ranked AS (
      SELECT l_suppkey, revenue,
             ROW_NUMBER() OVER (ORDER BY revenue DESC, l_suppkey) AS rnk,
             SUM(revenue) OVER (ORDER BY revenue DESC, l_suppkey
                                ROWS UNBOUNDED PRECEDING) AS cum_rev
      FROM rev
    )
    SELECT rnk, l_suppkey,
           CAST(revenue AS DOUBLE) AS revenue,
           ROUND(CAST(cum_rev AS DOUBLE) / CAST(t.t AS DOUBLE), 6) AS cum_share,
           CAST(cum_rev AS DOUBLE) / CAST(t.t AS DOUBLE) <= 0.8 AS in_top80
    FROM ranked CROSS JOIN total t
    """,
)
def supplier_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) analysis: suppliers ranked by revenue with their
    cumulative revenue share.

    The running sum stays in DECIMAL — exact prefix sums independent of
    how either engine's window operator associates the additions (a
    double running sum can differ in the last ulp between a sequential
    fold and a segment-tree implementation, which would flip the
    `in_top80` boundary).  The heavy aggregate shuffles on l_suppkey;
    the global rank window runs on one row per supplier."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (1 - F.col("l_discount").cast("decimal(12,2)"))
        ).alias("revenue")
    )
    total = rev.agg(F.sum("revenue").alias("t"))
    w = Window.orderBy(F.desc("revenue"), F.asc("l_suppkey"))
    ranked = rev.select(
        "l_suppkey",
        "revenue",
        F.row_number().over(w).alias("rnk"),
        F.sum("revenue").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum_rev"
        ),
    )
    share = F.col("cum_rev").cast("double") / F.col("t").cast("double")
    return ranked.crossJoin(F.broadcast(total)).select(
        "rnk",
        "l_suppkey",
        F.col("revenue").cast("double").alias("revenue"),
        F.round(share, 6).alias("cum_share"),
        (share <= 0.8).alias("in_top80"),
    )


@query(
    "events_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS d FROM events
    ), isl AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INT) AS grp
      FROM days
    ), streaks AS (
      SELECT user_id, grp, COUNT(*) AS len FROM isl GROUP BY 1, 2
    )
    SELECT user_id, MAX(len) AS longest_streak, COUNT(*) AS n_streaks
    FROM streaks GROUP BY user_id
    """,
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user longest run of consecutive active days
    and total number of streaks (the date-minus-row_number island trick,
    all integer/date arithmetic → exactly portable).

    One distinct-days aggregate, one window partitioned by user, two
    more aggregates — every stage keyed on user_id, so the whole plan
    rides a single hash partitioning; no self-joins, no explode."""
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("d"))
    isl = days.select(
        "user_id", "d", F.date_sub(F.col("d"), rn).alias("grp")
    )
    streaks = isl.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"), F.count("*").alias("n_streaks")
    )


@query(
    "dq_audit_orders",
    oracle="""
    WITH base AS (
      SELECT COUNT(*) AS total,
             COUNT(*) FILTER (WHERE o_custkey IS NULL) AS null_custkey,
             COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_orderkey,
             COUNT(*) FILTER (WHERE o_totalprice <= 0) AS nonpositive_price,
             COUNT(*) FILTER (WHERE o_orderdate >= TIMESTAMP '1999-01-01')
               AS future_date
      FROM orders
    ), orphans AS (
      SELECT COUNT(*) AS orphan_orders
      FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_custkey IS NULL
    )
    SELECT chk, violations, total FROM (
      SELECT 'null_custkey' AS chk, null_custkey AS violations, total FROM base
      UNION ALL SELECT 'dup_orderkey', dup_orderkey, total FROM base
      UNION ALL SELECT 'nonpositive_price', nonpositive_price, total FROM base
      UNION ALL SELECT 'future_date', future_date, total FROM base
      UNION ALL SELECT 'orphan_orders', o.orphan_orders, b.total
                 FROM orphans o CROSS JOIN base b
    )
    """,
)
def dq_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit of the orders table (the Deequ-style
    constraint report an ingest pipeline runs before publishing a
    partition): null keys, duplicate primary keys, domain violations,
    and referential orphans against customer.

    Every row-level check folds into ONE conditional-aggregation scan;
    only the referential check needs a second plan leg (anti-join
    semantics via left join + null filter, customer side broadcast).
    Output is a fixed five-row report regardless of data size."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = o.agg(
        F.count("*").alias("total"),
        F.count_if(F.col("o_custkey").isNull()).alias("null_custkey"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("dup_orderkey"),
        F.count_if(F.col("o_totalprice") <= 0).alias("nonpositive_price"),
        F.count_if(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .alias("future_date"),
    )
    orphans = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("orphan_orders"))
    )
    report = base.select(
        F.expr(
            "stack(4, 'null_custkey', null_custkey, 'dup_orderkey', dup_orderkey, "
            "'nonpositive_price', nonpositive_price, 'future_date', future_date) "
            "AS (chk, violations)"
        ),
        "total",
    ).unionByName(
        orphans.crossJoin(base.select("total")).select(
            F.lit("orphan_orders").alias("chk"),
            F.col("orphan_orders").alias("violations"),
            "total",
        )
    )
    return report


@query(
    "orders_yoy_growth",
    oracle="""
    WITH monthly AS (
      SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS yr,
             EXTRACT(month FROM o_orderdate)::BIGINT AS mo,
             SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS rev
      FROM orders GROUP BY 1, 2
    )
    SELECT cur.yr, cur.mo,
           CAST(cur.rev AS DOUBLE) AS revenue,
           CAST(prev.rev AS DOUBLE) AS revenue_prev_year,
           ROUND(CAST(cur.rev AS DOUBLE) / CAST(prev.rev AS DOUBLE) - 1, 6)
             AS yoy_growth
    FROM monthly cur
    LEFT JOIN monthly prev ON prev.yr = cur.yr - 1 AND prev.mo = cur.mo
    """,
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth via a self-join on the
    (year-1, month) key — robust to gap months, unlike LAG(12), and the
    join runs on the tiny monthly aggregate, not the fact table."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("rev"))
    cur = monthly.alias("cur")
    prev = monthly.alias("prev")
    return cur.join(
        prev,
        (F.col("prev.yr") == F.col("cur.yr") - 1)
        & (F.col("prev.mo") == F.col("cur.mo")),
        "left",
    ).select(
        F.col("cur.yr").alias("yr"),
        F.col("cur.mo").alias("mo"),
        F.col("cur.rev").cast("double").alias("revenue"),
        F.col("prev.rev").cast("double").alias("revenue_prev_year"),
        F.round(
            F.col("cur.rev").cast("double") / F.col("prev.rev").cast("double")
            - 1,
            6,
        ).alias("yoy_growth"),
    )


@query(
    "nation_revenue_share",
    oracle="""
    WITH rev AS (
      SELECT n.n_regionkey AS rk, n.n_name,
             SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS rev
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    )
    SELECT r.r_name, rev.n_name,
           CAST(rev.rev AS DOUBLE) AS revenue,
           ROUND(CAST(rev.rev AS DOUBLE)
                 / CAST(SUM(rev.rev) OVER (PARTITION BY rev.rk) AS DOUBLE),
                 6) AS region_share
    FROM rev JOIN region r ON r.r_regionkey = rev.rk
    """,
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent: each nation's share of its region's revenue via
    a partitioned window sum over the aggregated (tiny) relation —
    decimal totals make the shares exactly reproducible.  The fact scan
    aggregates before any window; dimensions broadcast."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_regionkey").alias("rk"), "n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("rev"))
    )
    share = F.col("rev").cast("double") / F.sum("rev").over(
        Window.partitionBy("rk")
    ).cast("double")
    return rev.join(F.broadcast(r), rev.rk == r.r_regionkey).select(
        "r_name",
        "n_name",
        F.col("rev").cast("double").alias("revenue"),
        F.round(share, 6).alias("region_share"),
    )


@query(
    "customer_tier_migration",
    oracle="""
    WITH yearly AS (
      SELECT o_custkey AS ck, EXTRACT(year FROM o_orderdate)::BIGINT AS yr,
             SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS spend
      FROM orders GROUP BY 1, 2
    ), tiered AS (
      SELECT ck, yr,
             CASE WHEN spend >= 400000 THEN 'high'
                  WHEN spend >= 150000 THEN 'mid'
                  ELSE 'low' END AS tier
      FROM yearly
    )
    SELECT a.tier AS tier_from, b.tier AS tier_to, a.yr AS yr_from,
           COUNT(*) AS n_customers
    FROM tiered a JOIN tiered b ON b.ck = a.ck AND b.yr = a.yr + 1
    GROUP BY 1, 2, 3
    """,
)
def customer_tier_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longitudinal segment migration: customers' spend tier each year,
    joined to their own next year — the churn/upgrade transition matrix.

    Tier thresholds compare decimal-exact yearly sums, so no customer
    can sit on a tier boundary differently across engines or partition
    layouts.  The self-join runs on the per-(customer, year) aggregate
    (one row each), co-partitioned on the customer key."""
    o = load_table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        F.col("o_custkey").alias("ck"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("spend"))
    tier = (
        F.when(F.col("spend") >= 400000, "high")
        .when(F.col("spend") >= 150000, "mid")
        .otherwise("low")
    )
    tiered = yearly.select("ck", "yr", tier.alias("tier"))
    a = tiered.alias("a")
    b = tiered.alias("b")
    return (
        a.join(
            b,
            (F.col("b.ck") == F.col("a.ck")) & (F.col("b.yr") == F.col("a.yr") + 1),
        )
        .groupBy(
            F.col("a.tier").alias("tier_from"),
            F.col("b.tier").alias("tier_to"),
            F.col("a.yr").alias("yr_from"),
        )
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "segment_concentration_hhi",
    oracle="""
    WITH rev AS (
      SELECT c.c_mktsegment AS seg, c.c_nationkey AS nk,
             SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS r
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ), shares AS (
      SELECT seg,
             CAST(r AS DOUBLE) / CAST(SUM(r) OVER (PARTITION BY seg) AS DOUBLE)
               AS share
      FROM rev
    )
    SELECT seg,
           ROUND(SUM(CAST(POWER(share, 2) AS DECIMAL(18,15))), 6) AS hhi,
           COUNT(*) AS n_players
    FROM shares GROUP BY seg
    """,
)
def segment_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index per market segment
    (how concentrated each segment's revenue is across nations — the
    standard market-structure metric).

    Shares come from decimal totals (exact), the squared shares are
    summed through DECIMAL so the index is independent of aggregation
    order, and the single rounding happens at the end.  Everything
    downstream of the fact-table aggregate is |segments|×|nations|
    rows."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("c_nationkey").alias("nk"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("r"))
    )
    share = F.col("r").cast("double") / F.sum("r").over(
        Window.partitionBy("seg")
    ).cast("double")
    shares = rev.select("seg", share.alias("share"))
    return shares.groupBy("seg").agg(
        # final cast to double: Spark ROUND(DECIMAL) stays DECIMAL (pandas
        # object) while DuckDB's .df() renders it float64 — dtype drift
        # the driver's comparator hashes differently
        F.round(F.sum(F.pow("share", 2).cast("decimal(18,15)")), 6)
        .cast("double")
        .alias("hhi"),
        F.count("*").alias("n_players"),
    )


@query(
    "events_conversion_latency",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    ), gaps AS (
      SELECT epoch_us(t_purchase) - epoch_us(t_signup) AS gap_us
      FROM firsts
      WHERE t_signup IS NOT NULL AND t_purchase IS NOT NULL
        AND t_purchase >= t_signup
    )
    SELECT COUNT(*) AS n_converted,
           MIN(gap_us) AS min_us,
           quantile_cont(gap_us, 0.5) AS p50_us,
           quantile_cont(gap_us, 0.9) AS p90_us,
           MAX(gap_us) AS max_us
    FROM gaps
    """,
)
def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion latency distribution: one conditional
    aggregation per user, then exact interpolated percentiles over the
    integer-microsecond gaps (ints in, deterministic interpolation out —
    no float-sum drift anywhere).

    At 100 TB the per-user firsts aggregate is the only data-sized
    stage; the percentile runs over one gap per converted user, and the
    mergeable approx_percentile swaps in when even that is too wide."""
    e = load_table(spark, sf_dir, "events")
    first_of = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    firsts = e.groupBy("user_id").agg(
        first_of("signup").alias("t_signup"),
        first_of("purchase").alias("t_purchase"),
    )
    gaps = firsts.filter(
        F.col("t_signup").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") >= F.col("t_signup"))
    ).select(
        (F.unix_micros("t_purchase") - F.unix_micros("t_signup")).alias("gap_us")
    )
    return gaps.agg(
        F.count("*").alias("n_converted"),
        F.min("gap_us").alias("min_us"),
        F.percentile("gap_us", 0.5).alias("p50_us"),
        F.percentile("gap_us", 0.9).alias("p90_us"),
        F.max("gap_us").alias("max_us"),
    )


@query(
    "corpus_after_dedup",
    oracle="""
    WITH keepers AS (
      SELECT sha256(text) AS h, MIN(doc_id) AS keeper_id
      FROM documents GROUP BY sha256(text)
    )
    SELECT d.lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN d.doc_id = k.keeper_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN d.doc_id <> k.keeper_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed,
           CAST(SUM(CASE WHEN d.doc_id = k.keeper_id THEN d.n_chars
                         ELSE 0 END) AS BIGINT) AS kept_chars
    FROM documents d JOIN keepers k ON sha256(d.text) = k.h
    GROUP BY d.lang
    """,
)
def corpus_after_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup APPLY step: the keeper mapping (min doc_id per content
    hash) joined back onto the corpus, reporting per language what
    survives.  The shape that matters at 100 TB: both sides shuffle on
    the 32-byte digest — never on document bodies — and the keeper side
    is the output of a map-side-combinable aggregate, so the whole apply
    is two digest-keyed exchanges regardless of document size.  The
    filtered corpus itself would be the same join with a
    ``doc_id = keeper_id`` filter; counts are reported here so the
    result is auditable (and the filter is provably a projection of this
    plan)."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "h", F.sha2("text", 256)
    )
    keepers = d.groupBy("h").agg(F.min("doc_id").alias("keeper_id"))
    kept = F.col("doc_id") == F.col("keeper_id")
    return (
        d.join(keepers, "h")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(~kept, 1).otherwise(0)).alias("n_removed"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias(
                "kept_chars"
            ),
        )
    )


TRUNC_BUDGET = 256  # whitespace-token context budget for the audit


@query(
    "corpus_truncation_loss",
    oracle=f"""
    WITH toks AS (
      SELECT source, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_tokens > {TRUNC_BUDGET} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_truncated,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN n_tokens > {TRUNC_BUDGET}
                         THEN n_tokens - {TRUNC_BUDGET} ELSE 0 END)
                AS BIGINT) AS tokens_lost,
           ROUND(SUM(CASE WHEN n_tokens > {TRUNC_BUDGET}
                          THEN n_tokens - {TRUNC_BUDGET} ELSE 0 END)
                 / SUM(n_tokens), 6) AS loss_frac
    FROM toks
    GROUP BY source
    """,
)
def corpus_truncation_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-budget truncation audit: per source, how many documents
    exceed the token budget and what fraction of tokens a hard truncation
    at that budget would discard — the measurement that decides between
    truncating and sequence-packing (corpus_pack_sequences) a corpus.
    One map-side projection + one tiny aggregate; integer token math so
    the loss fraction is bit-stable."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("bigint")
    over = n_tokens > TRUNC_BUDGET
    lost = F.when(over, n_tokens - TRUNC_BUDGET).otherwise(F.lit(0))
    toks = d.select("source", n_tokens.alias("n_tokens"), lost.alias("lost"))
    return toks.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("n_tokens") > TRUNC_BUDGET, 1).otherwise(0)).alias(
            "n_truncated"
        ),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("lost").alias("tokens_lost"),
        F.round(F.sum("lost") / F.sum("n_tokens"), 6).alias("loss_frac"),
    )


@query(
    "events_ab_test",
    oracle="""
    WITH assign AS (
      SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 4))::BIGINT % 2
               AS variant,
             user_id, event_type, value
      FROM events
    ),
    users AS (
      SELECT variant, user_id,
             MAX(CASE WHEN event_type = 'purchase' AND value > 150.0 THEN 1 ELSE 0 END)
               AS converted
      FROM assign GROUP BY variant, user_id
    ),
    arms AS (
      SELECT variant,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_converted
      FROM users GROUP BY variant
    ),
    wide AS (
      SELECT MAX(CASE WHEN variant = 0 THEN n_users END) AS n0,
             MAX(CASE WHEN variant = 0 THEN n_converted END) AS c0,
             MAX(CASE WHEN variant = 1 THEN n_users END) AS n1,
             MAX(CASE WHEN variant = 1 THEN n_converted END) AS c1
      FROM arms
    )
    SELECT n0, c0, n1, c1,
           ROUND((CAST(c0 AS DOUBLE) / n0), 6) AS p0,
           ROUND((CAST(c1 AS DOUBLE) / n1), 6) AS p1,
           ROUND(
             ((CAST(c0 AS DOUBLE) / n0) - (CAST(c1 AS DOUBLE) / n1))
             / SQRT(
                 ((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                  * (1.0 - (CAST(c0 + c1 AS DOUBLE) / (n0 + n1))))
                 * ((1.0 / n0) + (1.0 / n1))
               ),
             6) AS z_score
    FROM wide
    """,
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B test readout: users deterministically hash-
    bucketed into two arms (md5 — the same retry-safe assignment the
    sampling family uses; never rand(), which would re-assign users
    across task retries), per-arm conversion rates (conversion = any high-value purchase,
    value > 150 — every user has SOME purchase in this data, which would
    degenerate the pooled variance to zero), and the
    pooled two-proportion z-score — the experimentation primitive every
    event pipeline grows.

    Scale shape: one (variant, user) aggregation over the events scan
    (map-side combinable), then arm totals are 2 rows; the z-score is
    driver-free column arithmetic on a 1-row relation.  Determinism:
    integer counts into an explicitly-parenthesized IEEE expression
    (division/sqrt are correctly rounded), rounded once at 1e-6."""
    e = load_table(spark, sf_dir, "events")
    variant = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint") % 2
    )
    users = (
        e.select(
            variant.alias("variant"),
            "user_id",
            F.when((F.col("event_type") == "purchase") & (F.col("value") > 150.0), 1)
            .otherwise(0)
            .alias("is_purchase"),
        )
        .groupBy("variant", "user_id")
        .agg(F.max("is_purchase").alias("converted"))
    )
    arms = users.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pbar = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    z = (p0 - p1) / F.sqrt(
        (pbar * (F.lit(1.0) - pbar))
        * ((F.lit(1.0) / F.col("n0")) + (F.lit(1.0) / F.col("n1")))
    )
    return wide.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(p0, 6).alias("p0"),
        F.round(p1, 6).alias("p1"),
        F.round(z, 6).alias("z_score"),
    )


@query(
    "orders_seasonal_forecast",
    oracle="""
    WITH monthly AS (
      SELECT CAST(strftime(o_orderdate, '%Y') AS INTEGER) AS yr,
             CAST(strftime(o_orderdate, '%m') AS INTEGER) AS mo,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
               AS revenue
      FROM orders GROUP BY 1, 2
    )
    SELECT a.yr, a.mo, a.revenue,
           f.revenue AS forecast_seasonal_naive,
           ROUND(ABS(a.revenue - f.revenue), 2) AS abs_error,
           ROUND(ABS(a.revenue - f.revenue) / a.revenue, 6) AS ape
    FROM monthly a
    JOIN monthly f ON f.yr = a.yr - 1 AND f.mo = a.mo
    """,
)
def orders_seasonal_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast evaluation: predict each month's revenue
    as the same month one year earlier, and score the prediction with
    absolute error and APE — the baseline every demand-forecasting
    pipeline must beat, and the backtest shape (align t with t-season,
    score, aggregate) that any fancier model reuses.

    The self-join runs on the |years|x12 monthly aggregate, not the
    fact table, and joining on (yr-1, mo) rather than LAG(12) OVER a
    month sequence makes missing months score as absent instead of
    silently sliding the season window (the gap-robustness trick from
    orders_yoy_growth).  Decimal sums make each month's revenue exact,
    so error metrics are engine-identical."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            .cast("double")
            .alias("revenue")
        )
    )
    a = monthly.alias("a")
    f = monthly.select(
        (F.col("yr") + 1).alias("yr"),
        F.col("mo").alias("mo"),
        F.col("revenue").alias("forecast_seasonal_naive"),
    )
    joined = a.join(F.broadcast(f), ["yr", "mo"])
    err = F.abs(F.col("revenue") - F.col("forecast_seasonal_naive"))
    return joined.select(
        "yr",
        "mo",
        "revenue",
        "forecast_seasonal_naive",
        F.round(err, 2).alias("abs_error"),
        F.round(err / F.col("revenue"), 6).alias("ape"),
    )


@query(
    "dq_key_skew",
    oracle="""
    WITH counts AS (
      SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    ),
    stats AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_keys
      FROM counts
    ),
    ranked AS (
      SELECT key, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rnk
      FROM counts
    )
    SELECT r.rnk, r.key, r.cnt,
           FLOOR(1000000.0 * r.cnt / s.total) / 1000000.0 AS share,
           FLOOR(1000000.0 * SUM(r.cnt) OVER (
             ORDER BY r.rnk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) / s.total) / 1000000.0 AS cum_share,
           FLOOR(1000000.0 * r.cnt * s.n_keys / s.total) / 1000000.0
             AS skew_vs_mean
    FROM ranked r CROSS JOIN stats s
    WHERE r.rnk <= 10
    ORDER BY r.rnk
    """,
)
def dq_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key skew audit — the diagnostic a 100 TB shuffle runs BEFORE
    choosing a join strategy: per-key row counts on the prospective
    shuffle key (customer key over orders), the 10 hottest keys with
    their corpus share, cumulative share, and skew-vs-mean factor (how
    many times an average partition's load the hottest key carries).
    A skew_vs_mean in the tens is the signal to salt that key or let
    AQE split it; near 1.0 means hash partitioning is already fair.

    Scale shape: one hash aggregation on the key (the same exchange the
    real join would pay), a 2-value global aggregate broadcast back,
    and a top-10 window over the count relation — the audit costs one
    pass over the key column, never touching payloads."""
    counts = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    from reindexer_spark.cache import track

    counts = track(counts)
    stats = counts.agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_keys"),
    )
    # top-10 via orderBy+limit (TakeOrderedAndProject — a reduce, never
    # a global single-partition window over the full key relation); the
    # rank/cumsum windows then run over 10 rows only
    topk = counts.orderBy(F.desc("cnt"), "key").limit(10)
    w_rnk = Window.orderBy(F.desc("cnt"), "key")
    w_cum = Window.orderBy("rnk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # operand order matches the oracle exactly ((1e6 * x) / total, not
    # 1e6 * (x / total)) — double multiply/divide associativity decides
    # the last ulp, and FLOOR amplifies it
    M = F.lit(1000000.0)
    return (
        topk.withColumn("rnk", F.row_number().over(w_rnk))
        .crossJoin(F.broadcast(stats))
        .select(
            "rnk",
            "key",
            "cnt",
            (F.floor(M * F.col("cnt") / F.col("total")) / 1e6).alias("share"),
            (
                F.floor(M * F.sum("cnt").over(w_cum) / F.col("total")) / 1e6
            ).alias("cum_share"),
            (
                F.floor(M * F.col("cnt") * F.col("n_keys") / F.col("total"))
                / 1e6
            ).alias("skew_vs_mean"),
        )
        .orderBy("rnk")
    )
