"""Session-scoped cache lifecycle for queries that persist internally.

Several operators materialize an intermediate (shingle index, CC edge
list, range-partitioned chunk input) that multiple downstream jobs in
the SAME query consume — the persist is load-bearing there.  But the
correctness gate and the bench run 130+ queries through one
SparkSession, and a persist that outlives its query accumulates cached
partitions for the whole session (round-1 VERDICT "What's wrong" #4).

The contract: operators call :func:`track` instead of ``df.persist()``;
the registry wrapper calls :func:`release_all` as each query STARTS, so
a query's caches live exactly until the next query begins.  Unpersist
never breaks lineage — a late consumer recomputes — so track() is safe
ONLY for materializations whose recompute is deterministic.  A frame
whose recompute could legitimately differ (e.g. repartitionByRange's
SAMPLED boundaries feeding driver-collected offsets — see
``docpipe/chunker.chunk_ids``) must use ``localCheckpoint()`` instead:
the checkpoint severs lineage, so the materialized result cannot be
silently recomputed into something else after release.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def track(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """Persist ``df`` and register it for release at the next query start."""
    df.persist(level if level is not None else StorageLevel.MEMORY_AND_DISK)
    _TRACKED.append(df)
    return df


def untrack(df: DataFrame) -> None:
    """Unpersist ``df`` now (e.g. a superseded loop iteration) and drop it
    from the tracked set."""
    try:
        df.unpersist()
    except Exception:  # session already gone — nothing to release
        pass
    _TRACKED[:] = [d for d in _TRACKED if d is not df]


def release_all() -> None:
    """Unpersist every tracked DataFrame (idempotent, exception-safe)."""
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:
            pass
