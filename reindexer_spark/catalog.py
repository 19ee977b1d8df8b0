"""Table catalog: the driver's synthetic star schema (TESTDATA.md) plus
loading helpers.

At test scale tables are parquet files under ``{sf_dir}``; in production the
``documents`` relation is a JDBC source (the reference pulls it from
PostgreSQL — /root/reference/driver.go:153, config/config.go:78).  The
loading surface is identical either way: callers get a DataFrame and
Catalyst handles pushdown into whichever source is behind it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table from ``sf_dir`` as a DataFrame.

    Parquet scan → columnar vectorized reader, predicate pushdown and
    column pruning apply automatically to downstream plans.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; it is read as raw nanos (legacy conf) and
    converted to a microsecond timestamp (lossless here: the generator's
    timestamps carry microsecond precision).
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            # integer division: ns values exceed 2^53, double division
            # would corrupt the low microseconds
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register catalog tables as temp views so ``spark.sql`` (the Tier B10
    'arbitrary user SQL' surface — /root/reference/config/config.go:20) can
    address them by name."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
