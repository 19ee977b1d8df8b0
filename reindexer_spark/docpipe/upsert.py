"""MERGE-less upsert (CDC apply) — the idempotent-sink semantics the
reference leans on (re-running overwrites by doc id,
/root/reference/README.md:84-87) expressed for a snapshot store.

No Delta/Iceberg in this stack, so MERGE INTO is emulated with the
classic anti-join + union (insert/update) and an optional tombstone
filter (delete).  At scale both sides shuffle once on the key — or not
at all if the snapshot is bucketed on it (see tests/test_scale_layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    deleted_col: str | None = None,
) -> DataFrame:
    """Return the post-merge snapshot: rows from ``changes`` win on key
    collisions; unchanged snapshot rows pass through; change rows with
    ``deleted_col = true`` tombstone the key entirely.

    Columns are aligned by name (changes must carry the snapshot schema,
    plus optionally the tombstone flag).
    """
    live_changes = changes
    tombstones = None
    if deleted_col is not None and deleted_col in changes.columns:
        tombstones = changes.filter(F.col(deleted_col)).select(key)
        live_changes = changes.filter(~F.col(deleted_col)).drop(deleted_col)

    kept = snapshot.join(changes.select(key), key, "left_anti")
    merged = kept.unionByName(live_changes.select(*snapshot.columns))
    if tombstones is not None:
        merged = merged.join(tombstones, key, "left_anti")
    return merged
