"""Storage-layout operators: space-filling-curve keys for
multi-dimensional data clustering.

At 100 TB, file-level min/max pruning only helps on the sort key; a
Z-order (Morton) key interleaves the bits of two (or more) dimensions so
that sorting by it co-clusters BOTH — range predicates on either column
then prune most files.  The key itself is pure integer bit algebra
(codegen'd, order-independent), so it is oracle-checkable exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from reindexer_spark.catalog import load_table
from reindexer_spark.registry import query

Z_BITS = 16
N_ZBUCKETS = 64


def morton_key(a: str, b: str, bits: int = Z_BITS) -> Column:
    """Interleave the low ``bits`` bits of two integer columns into a
    Morton (Z-order) key: a's bit i lands at position 2i, b's at 2i+1.
    Integer sum of disjoint powers of two → exact and order-independent.
    (SQL-expression form: the DataFrame shiftleft/shiftright helpers only
    take literal shift amounts, but the underlying expressions shift by
    any integer column.)"""
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> acc"
        f" + cast(shiftleft(shiftright({a}, i) & 1, 2 * i) as bigint)"
        f" + cast(shiftleft(shiftright({b}, i) & 1, 2 * i + 1) as bigint))"
    )


@query(
    "layout_zorder_key",
    oracle=f"""
    WITH keyed AS (
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             list_reduce(
               list_prepend(0::BIGINT,
                 list_transform(range(0, {Z_BITS}),
                   i -> (((l_partkey >> i) & 1) << (2 * i))::BIGINT
                        + (((l_suppkey >> i) & 1) << (2 * i + 1))::BIGINT)),
               (acc, x) -> acc + x
             ) AS zkey
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, zkey,
           zkey % {N_ZBUCKETS} AS zbucket
    FROM keyed
    """,
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order key over (l_partkey, l_suppkey) plus its file bucket.

    Writing lineitem sorted/bucketed by zkey co-clusters part AND
    supplier locality in the same files, so min/max zone maps prune
    point/range scans on either dimension — the standard lakehouse
    layout trick, computed here with nothing but codegen'd bit algebra
    (no UDF, no shuffle: the key is a projection; the write-side
    repartitionByRange(zkey) is where the one exchange belongs)."""
    li = load_table(spark, sf_dir, "lineitem")
    z = morton_key("l_partkey", "l_suppkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        z.alias("zkey"),
        (z % N_ZBUCKETS).alias("zbucket"),
    )
