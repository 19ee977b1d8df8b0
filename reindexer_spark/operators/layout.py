"""Storage-layout operators: space-filling-curve keys for
multi-dimensional data clustering.

At 100 TB, file-level min/max pruning only helps on the sort key; a
Z-order (Morton) key interleaves the bits of two (or more) dimensions so
that sorting by it co-clusters BOTH — range predicates on either column
then prune most files.  The key itself is pure integer bit algebra
(codegen'd, order-independent), so it is oracle-checkable exactly.
"""

from __future__ import annotations

import pandas as pd
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


H_BITS = 16
N_HBUCKETS = 64


def hilbert_key(a: str, b: str, bits: int = H_BITS) -> Column:
    """Hilbert-curve index of the point (a, b) on the 2^bits × 2^bits
    grid (Gonzalez/Warren xy→d: walk the bit planes high→low, rotate
    the frame per quadrant).  Unlike the Morton key, CONSECUTIVE
    Hilbert keys are always grid-ADJACENT cells — the locality
    property that makes it the better file-clustering curve (pinned
    by an exhaustive adjacency test).  Pure integer bit algebra via a
    struct-accumulator fold — codegen'd, no UDF."""
    mask = (1 << bits) - 1
    return F.expr(
        f"""aggregate(
          sequence({bits - 1}, 0, -1),
          named_struct(
            'x', cast({a} as bigint) & {mask}L,
            'y', cast({b} as bigint) & {mask}L,
            'd', 0L),
          (acc, i) -> named_struct(
            'x', CASE
                   WHEN (shiftright(acc.y, i) & 1) = 1 THEN acc.x
                   WHEN (shiftright(acc.x, i) & 1) = 1
                     THEN shiftleft(1L, i) - 1 - acc.y
                   ELSE acc.y END,
            'y', CASE
                   WHEN (shiftright(acc.y, i) & 1) = 1 THEN acc.y
                   WHEN (shiftright(acc.x, i) & 1) = 1
                     THEN shiftleft(1L, i) - 1 - acc.x
                   ELSE acc.x END,
            'd', acc.d + shiftleft(1L, 2 * i)
                 * cast(((3 * (shiftright(acc.x, i) & 1))
                         ^ (shiftright(acc.y, i) & 1)) as bigint)),
          acc -> acc.d)"""
    )


def _hilbert_sql(a: str, b: str, bits: int = H_BITS) -> str:
    """The identical fold as chained CTE steps (DuckDB's list_reduce
    needs homogeneous element/accumulator types, so the unrolled form
    is the clean mirror).  Returns (cte_sql, final_cte_name)."""
    mask = (1 << bits) - 1
    steps = [
        f"h{bits} AS (SELECT *, ({a} & {mask})::BIGINT AS hx, "
        f"({b} & {mask})::BIGINT AS hy, 0::BIGINT AS hd FROM __SRC__)"
    ]
    for i in range(bits - 1, -1, -1):
        prev = f"h{i + 1}"
        s = 1 << i
        steps.append(
            f"""h{i} AS (
      SELECT * REPLACE (
        CASE WHEN ((hy >> {i}) & 1) = 1 THEN hx
             WHEN ((hx >> {i}) & 1) = 1 THEN {s} - 1 - hy
             ELSE hy END AS hx,
        CASE WHEN ((hy >> {i}) & 1) = 1 THEN hy
             WHEN ((hx >> {i}) & 1) = 1 THEN {s} - 1 - hx
             ELSE hx END AS hy,
        hd + {s}::BIGINT * {s} *
          xor(3 * ((hx >> {i}) & 1), (hy >> {i}) & 1) AS hd
      ) FROM {prev}
    )"""
        )
    return ",\n    ".join(steps), "h0"


_H_CTES, _H_FINAL = _hilbert_sql("l_partkey", "l_suppkey")


def hilbert_key_np(x, y, bits: int = H_BITS):
    """The identical per-plane walk over numpy int64 vectors — one
    vectorized pass for a whole Arrow batch.  Op-for-op the
    :func:`hilbert_key` fold (same rotation cases, same d term from the
    pre-rotation plane bits), pinned equal to it by
    tests/test_plans.py's cross-implementation sweep."""
    import numpy as np

    mask = (1 << bits) - 1
    x = x.astype(np.int64) & mask
    y = y.astype(np.int64) & mask
    d = np.zeros_like(x)
    for i in range(bits - 1, -1, -1):
        ry = (y >> i) & 1
        rx = (x >> i) & 1
        d += (1 << (2 * i)) * ((3 * rx) ^ ry)
        s1 = (1 << i) - 1
        nx = np.where(ry == 1, x, np.where(rx == 1, s1 - y, y))
        ny = np.where(ry == 1, y, np.where(rx == 1, s1 - x, x))
        x, y = nx, ny
    return d


@query(
    "layout_hilbert_key",
    oracle=f"""
    WITH __base AS (
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
      FROM lineitem
    ),
    {_H_CTES.replace("__SRC__", "__base")}
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           hd AS hkey, hd % {N_HBUCKETS} AS hbucket
    FROM {_H_FINAL}
    """,
)
def layout_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve layout key over (l_partkey, l_suppkey) plus its
    file bucket — the zorder lane's stronger sibling: consecutive
    Hilbert keys are always grid-adjacent cells (exhaustively pinned
    in tests over the full 16×16 grid), so a file of contiguous keys
    covers a COMPACT 2-D region and min/max zone maps prune range
    predicates on either dimension tighter than Z-order's jumpy
    diagonal seams (the curve Databricks liquid clustering and many
    spatial stores use for exactly this reason).

    Execution (optimization r16, guide §4.2): the 16-plane fold as a
    Catalyst higher-order ``aggregate`` evaluates INTERPRETED per row —
    and the before-plan carried TWO copies of it (hkey and hkey%64
    each inlined), ~12 µs/row and no whole-stage codegen for the lane.
    The same walk over a whole Arrow batch is 16 iterations of numpy
    int64 vector ops — one ArrowEvalPython pass, one evaluation, with
    :func:`hilbert_key` (the Column form) kept as the cross-checked
    reference implementation for write paths that must stay UDF-free.

    Scale shape: a projection pass, no shuffle; the write-side
    repartitionByRange(hkey) is where the one exchange belongs."""

    @F.pandas_udf("bigint")
    def _hkey(px: pd.Series, sy: pd.Series) -> pd.Series:
        return pd.Series(
            hilbert_key_np(px.to_numpy(), sy.to_numpy())
        )

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        _hkey("l_partkey", "l_suppkey").alias("hkey"),
    ).withColumn("hbucket", F.col("hkey") % N_HBUCKETS)
