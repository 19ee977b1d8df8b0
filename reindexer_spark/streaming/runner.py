"""Streaming execution harness.

``stream_events`` exposes the catalog's ``events`` table as a streaming
DataFrame (file source; schema supplied explicitly — streaming sources
cannot infer).  ``run_stream_to_memory`` drives any streaming plan to
completion synchronously via the memory sink — the local test analogue
of a Kafka→sink deployment; the transformations are identical, only the
source/sink formats change in production.

``maxFilesPerTrigger`` keeps multiple micro-batches flowing so state
(watermarks, dedup, sessions) is actually exercised across batches, not
trivially satisfied by one batch containing everything.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# parquet matches columns by name: `ts` holds raw nanos under the
# nanosAsLong conf and is converted in place below
EVENTS_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """events.parquet as a streaming source (ns timestamps read as raw
    nanos — same workaround as catalog.load_table — then converted)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file source requires a directory path; pathGlobFilter selects
    # just the events file out of the shared testdata dir
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def run_stream_to_memory(
    streaming_df: DataFrame, output_mode: str = "complete"
) -> DataFrame:
    """Run a streaming plan to completion into a memory table; returns a
    batch DataFrame over the final result."""
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    spark = streaming_df.sparkSession
    q = (
        streaming_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        # join the micro-batch thread completely and drop the terminated
        # query's bookkeeping — the stream leaves nothing running in the
        # JVM that could interfere with later batch jobs in this session
        q.awaitTermination()
        spark.streams.resetTerminated()
    return spark.sql(f"SELECT * FROM {name}")
