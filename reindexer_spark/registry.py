"""Query registry.

Every operator from SURVEY.md §2 registers itself here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when the semantics
are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL.  The driver's
correctness gate runs both sides at sf0.01 and compares row-count, schema
and an order-insensitive value hash — so the decorator keeps the two
definitions adjacent in the source, which is the only reliable way to keep
them in sync.

Conventions that make the hash comparison deterministic (see SURVEY §5):

- alias every computed column identically on both sides;
- monetary aggregations go through DECIMAL (exact, order-independent) and
  are cast back to DOUBLE at the end → bit-identical across engines, no
  dependence on floating-point summation order;
- timestamps in output are formatted to strings (session TZ pinned UTC);
- anything ranked breaks ties on a unique key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from reindexer_spark.session import tune

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does a rows-only check
    doc: str


_REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as the named query; ``oracle`` is the DuckDB-equivalent
    ANSI SQL (omit only for genuinely non-SQL-expressible operators)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from reindexer_spark.cache import release_all

            tune(spark)  # UTC/AQE/Arrow regardless of who built the session
            release_all()  # previous query's internal persists end here
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = Query(name, wrapped, oracle, fn.__doc__ or "")
        return fn

    return deco


def _ensure_loaded() -> None:
    # Importing the operators package populates the registry.
    import reindexer_spark.operators  # noqa: F401


def gate_order(names: list[str]) -> list[str]:
    """Deterministic family-interleaved ordering for the correctness gate.

    The external gate runs queries in the order this dict yields them and
    stops when its time budget runs out (round 1: 50 of 133, alphabetical
    a-f, so window/scalar/text/knn families got no row at all).  Round-robin
    across operator families (the ``<family>_`` name prefix) means ANY
    prefix of the budget checks one query from every family before any
    family gets its second — the checked window always spans the whole
    operator surface.
    """
    families: dict[str, list[str]] = {}
    for n in sorted(names):
        families.setdefault(n.split("_", 1)[0], []).append(n)
    queues = [families[f] for f in sorted(families)]
    out: list[str] = []
    while queues:
        queues = [q for q in queues if q]
        for q in queues:
            if q:
                out.append(q.pop(0))
    return out


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: _REGISTRY[name].fn for name in gate_order(list(_REGISTRY))}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: _REGISTRY[name].oracle
        for name in gate_order(list(_REGISTRY))
        if _REGISTRY[name].oracle is not None
    }


def get_query(name: str) -> Query:
    _ensure_loaded()
    return _REGISTRY[name]
