"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names, and
values (order-insensitive, exact — floats must match bit-for-bit, which
the engine's determinism conventions guarantee; see registry docstring).

Used by tests/test_oracle.py and runnable directly:

    python -m reindexer_spark.oracle [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

from reindexer_spark.catalog import TABLES


def run_oracle_duckdb(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Run oracle SQL on DuckDB with catalog tables registered as views;
    returns (column_names, rows) materialized while the connection lives."""
    import duckdb

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        rel = con.sql(sql)
        return list(rel.columns), rel.fetchall()
    finally:
        con.close()


def _canon(value):
    """Canonicalize a cell for comparison."""
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return value
    if isinstance(value, (list, tuple)):
        return tuple(_canon(v) for v in value)
    return value


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(repr(x) for x in t),
    )


def compare_query(spark, name: str, sf_dir: str) -> list[str]:
    """Compare one query against its oracle; returns a list of problems
    (empty = match).  Queries without an oracle get a rows-only check."""
    from reindexer_spark.registry import get_query

    q = get_query(name)
    sdf = q.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    if q.oracle is None:
        return []  # rows-only: executable + stable schema is the check

    ocols, orows = run_oracle_duckdb(q.oracle, sf_dir)

    problems: list[str] = []
    if sorted(scols) != sorted(c for c in ocols):
        problems.append(f"schema mismatch: spark={sorted(scols)} oracle={sorted(ocols)}")
        return problems
    if len(srows) != len(orows):
        problems.append(f"row count: spark={len(srows)} oracle={len(orows)}")
    s_set = _rowset(scols, srows)
    o_set = _rowset(ocols, orows)
    if s_set != o_set:
        diffs = [
            (a, b) for a, b in zip(s_set, o_set) if a != b
        ][:3]
        extra_s = [r for r in s_set[:2000] if r not in o_set[:2000]][:2]
        problems.append(
            f"values differ; first aligned diffs={diffs!r} spark-only sample={extra_s!r}"
        )
    return problems


def main() -> int:
    from reindexer_spark import all_queries, get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(all_queries())
    import time

    spark = get_spark("oracle-check")
    failed = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            problems = compare_query(spark, name, sf_dir)
        except Exception as exc:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(exc).__name__}: {exc}"]
        elapsed = time.perf_counter() - t0
        if problems:
            failed += 1
            print(f"FAIL {name} ({elapsed:.1f}s)", flush=True)
            for p in problems:
                print(f"     {p[:1000]}", flush=True)
        else:
            print(f"ok   {name} ({elapsed:.1f}s)", flush=True)
    print(f"\n{len(names) - failed}/{len(names)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
