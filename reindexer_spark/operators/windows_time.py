"""Tier C13 — event-time windowing over ``events``, batch-mode semantics.

``window()`` / ``session_window()`` produce identical results in batch
and streaming execution; these oracle-checked batch queries pin the
semantics, and ``reindexer_spark.streaming`` runs the same plans through
Structured Streaming (readStream → memory sink) in the test suite to
prove batch/stream equivalence (watermarks, late data, stateful dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reindexer_spark.catalog import load_table
from reindexer_spark.functions import dec
from reindexer_spark.registry import query

SESSION_GAP = "2 hours"


@query(
    "window_tumbling",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "window_sliding",
    oracle="""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS slot_start, value, ts FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, value, ts
      FROM events
    )
    SELECT strftime(slot_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM assigned
    GROUP BY 1
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour wide, 30-minute slide): each event lands in
    two windows.  The oracle replicates Spark's assignment rule (window
    starts are the two 30-minute-aligned slots covering each event)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "total_value",
        )
    )


@query(
    "window_session",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 2 HOUR
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), numbered AS (
      SELECT *, SUM(is_new) OVER (
        PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS session_seq
      FROM marked
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
    FROM numbered
    GROUP BY user_id, session_seq
    """,
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (2-hour inactivity gap) per user.  Spark's
    session_window merges events closer than the gap; the oracle is the
    classic gaps-and-islands rewrite.  Session end = last event + gap
    (Spark's definition)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


@query(
    "window_dedup_latest",
    oracle="""
    SELECT user_id, event_type,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS latest_ts,
           COUNT(*) AS n_superseded
    FROM events
    GROUP BY user_id, event_type
    """,
)
def window_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key dedup (the batch analogue of streaming
    dropDuplicates state: one row per (user, type), latest event wins)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id", "event_type").agg(
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("latest_ts"),
        F.count("*").alias("n_superseded"),
    )


@query(
    "stream_tumbling_live",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same tumbling aggregation as window_tumbling, but executed by
    the ACTUAL Structured Streaming engine (readStream file source →
    availableNow trigger → memory sink) rather than as a batch plan.
    Shares window_tumbling's oracle: batch/stream equivalence is not a
    test-only claim here, it is checked value-for-value at the
    correctness gate."""
    from reindexer_spark.streaming import run_stream_to_memory, stream_events

    events = stream_events(spark, sf_dir)
    agg = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    return run_stream_to_memory(agg, output_mode="complete")
