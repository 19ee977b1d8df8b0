"""Partitioned JDBC source — the production ``documents`` relation.

The reference opens ONE Postgres cursor and streams every row through a
single connection (/root/reference/driver.go:85-92,153), with a global
ORDER BY the README itself warns is slow (driver.go:172).  The Spark
shape: N parallel range-partitioned reads on the key, each executor
pulling its slice — predicates (NOT deleted, resume id) push down into
each partition's WHERE clause, and no global sort is issued at all
(the sink is idempotent per id; see docpipe.resume).

No database exists in the test environment, so ``read_documents_jdbc``
is exercised through ``jdbc_reader_options`` (unit-testable plan
construction) and gated at call time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from reindexer_spark.docpipe.config import ReindexConfig


def jdbc_reader_options(
    conf: ReindexConfig,
    partition_column: str = "doc_seq",
    num_partitions: int = 32,
    lower_bound: int = 0,
    upper_bound: int = 1 << 31,
    fetchsize: int = 10_000,
) -> dict[str, str]:
    """Build the option map for a partitioned read of the reference's
    query (config.go:78 semantics).

    The reference's key is a string (asciibetical id); Spark's JDBC range
    partitioning needs a numeric/date column, so the pushed-down query
    wraps the user query with a stable numeric ``doc_seq`` derived
    server-side (hashtext is Postgres-specific, abs() keeps bounds
    simple).  ``fetchsize`` matters: the Postgres driver defaults to
    fetching the whole result set into memory per partition without it.
    """
    user_query = conf.query.rstrip().rstrip(";")
    # Strip the reference's trailing global sort: partitioned reads make
    # a server-side total order meaningless (and it is the documented
    # dominant cost — driver.go:172).
    upper = user_query.upper()
    if "ORDER BY" in upper:
        user_query = user_query[: upper.rindex("ORDER BY")].rstrip()
    wrapped = (
        f"SELECT q.*, abs(hashtext(q.id)) AS {partition_column} "
        f"FROM ({user_query}) q"
    )
    return {
        "url": conf.jdbc_url(),
        "user": conf.dbuser,
        "password": conf.password,
        "dbtable": f"({wrapped}) AS partitioned_src",
        "partitionColumn": partition_column,
        "numPartitions": str(num_partitions),
        "lowerBound": str(lower_bound),
        "upperBound": str(upper_bound),
        "fetchsize": str(fetchsize),
        "pushDownPredicate": "true",
    }


def read_documents_jdbc(
    spark: SparkSession, conf: ReindexConfig, **kwargs
) -> DataFrame:
    opts = jdbc_reader_options(conf, **kwargs)
    reader = spark.read.format("jdbc")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load().drop(kwargs.get("partition_column", "doc_seq"))
