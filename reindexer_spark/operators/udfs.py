"""Tier C14 — the UDF/UDAF surface, used the way the engine recommends:
Arrow-vectorized pandas_udf / applyInPandas only, never row-at-a-time
Python, and only where demonstrating the seam (all shipped operators use
built-ins; these queries prove the escape hatch works and is exactly as
correct as the built-in path)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reindexer_spark.catalog import load_table
from reindexer_spark.registry import query


def _norm_udf():
    """L2 norm pandas_udf, vectorized over the Arrow batch.  Sums
    sequentially in float64 to match the oracle's list_sum; rounded by
    the caller.  Constructed lazily — decorating at module import would
    require an active SparkContext before the session exists (the
    registry imports operator modules eagerly)."""

    def norm(emb: pd.Series) -> pd.Series:
        return emb.map(lambda v: sum(float(x) * float(x) for x in v) ** 0.5)

    return F.pandas_udf(norm, "double")


@query(
    "udf_vector_norm",
    oracle="""
    SELECT vec_id, label,
           ROUND(SQRT(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) AS norm
    FROM embeddings
    WHERE vec_id < 200
    """,
)
def udf_vector_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas_udf vector norm — Arrow batches in, one rounded double out;
    value-identical to the pure-SQL formulation (the point: dropping to
    Python must not change answers)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return e.select(
        "vec_id", "label", F.round(_norm_udf()("embedding"), 6).alias("norm")
    )


@query(
    "udaf_grouped_minmax_gap",
    oracle="""
    SELECT label,
           COUNT(*) AS n,
           ROUND(MAX(embedding[1]::DOUBLE) - MIN(embedding[1]::DOUBLE), 6) AS first_dim_range
    FROM embeddings
    GROUP BY label
    """,
)
def udaf_grouped_minmax_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped aggregation (the UDAF surface): per-label
    range of the first embedding component."""
    e = load_table(spark, sf_dir, "embeddings")

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        first = pdf["embedding"].map(lambda v: float(v[0]))
        return pd.DataFrame(
            {
                "label": [pdf["label"].iloc[0]],
                "n": [len(pdf)],
                "first_dim_range": [round(first.max() - first.min(), 6)],
            }
        )

    return e.groupBy("label").applyInPandas(
        per_group, schema="label int, n bigint, first_dim_range double"
    )


@query(
    "udaf_grouped_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, MEDIAN(value) AS med FROM events GROUP BY 1
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MAX(m.med), 6) AS median_value,
           ROUND(MEDIAN(ABS(e.value - m.med)), 6) AS mad
    FROM events e JOIN med m USING (event_type)
    GROUP BY e.event_type
    """,
)
def udaf_grouped_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas robust statistics: per-event-type median and median
    absolute deviation — the outlier-resistant spread measure that has
    no built-in Spark aggregate (percentile_approx is approximate; this
    is exact), which is precisely when the UDAF escape hatch earns its
    keep.

    Value-exact across engines because median interpolation is plain
    IEEE arithmetic on the two middle elements ((a+b)/2 — numpy and
    DuckDB agree bit-for-bit), and the deviations are single
    subtractions.  Scale note: per-group exact medians require the
    group's values in one place — the applyInPandas shuffle — which is
    the honest cost of EXACT order statistics; the approximate sketch
    path (agg_approx_sketches) is the no-shuffle alternative at 100 TB.
    """
    import numpy as np

    e = load_table(spark, sf_dir, "events")

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy(dtype="float64")
        med = float(np.median(v))
        mad = float(np.median(np.abs(v - med)))
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [len(v)],
                "median_value": [round(med, 6)],
                "mad": [round(mad, 6)],
            }
        )

    return e.select("event_type", "value").groupBy("event_type").applyInPandas(
        per_group,
        schema="event_type string, n bigint, median_value double, mad double",
    )
