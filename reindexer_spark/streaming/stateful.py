"""Custom stateful streaming operator via ``applyInPandasWithState``
(Tier C14 × C13): per-key quota alerting — emit an alert each time a
user's cumulative value crosses another multiple of the threshold.

This is the operator class the built-in windows genuinely cannot
express (the emission condition depends on an unbounded running total,
not on event-time buckets): custom per-key state, arbitrary Python
transition logic, Arrow-batched.  State is one float per key, so
executor state-store memory is O(|keys|) regardless of event volume;
keys are hash-partitioned, so the operator scales exactly like a
streaming aggregation.

The reference has no streaming at all (BASELINE.json: "real-time
indexing does not [map]"); this is north-star surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALERT_SCHEMA = (
    "user_id bigint, event_id bigint, total double, crossed double"
)
STATE_SCHEMA = "total double"


def quota_alerts(events: DataFrame, threshold: float = 100.0) -> DataFrame:
    """Per-user cumulative-value threshold alerts over a (possibly
    streaming) events DataFrame with columns
    (event_id, ts, user_id, value, ...).

    Within a micro-batch, events are applied in (ts, event_id) order —
    deterministic given deterministic batch boundaries (the tests pin
    them with one file per trigger).
    """

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (total,) = state.get if state.exists else (0.0,)
        out: list[tuple] = []
        # A group's rows can span several Arrow chunks; sorting each chunk
        # independently would interleave out of (ts, event_id) order, so
        # gather the whole micro-batch for this key before sorting.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            for eid, val in zip(pdf["event_id"], pdf["value"]):
                before = int(total // threshold)
                total += float(val)
                after = int(total // threshold)
                if after > before:
                    out.append((key[0], int(eid), total, after * threshold))
        state.update((total,))
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "total", "crossed"]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=ALERT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def quota_alerts_cents(
    events: DataFrame, threshold_cents: int = 10_000
) -> DataFrame:
    """Oracle-exact variant of :func:`quota_alerts`: the running total is
    carried as INTEGER CENTS (the input must provide a ``v`` column of
    DECIMAL(12,2), which Arrow delivers to pandas as ``decimal.Decimal``),
    so every crossing decision is integer arithmetic — bit-identical to a
    SQL window cumsum over the same decimal column, which is what lets a
    custom stateful streaming operator pass a value-exact DuckDB gate.

    The float variant above keeps the reference-free float semantics for
    unit tests; this one trades generality for cross-engine exactness
    (floor division on ints ≡ SQL FLOOR; cents/100.0 ≡ CAST(decimal AS
    DOUBLE), both correctly-rounded from the same rational).
    """

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (cents,) = state.get if state.exists else (0,)
        out = pd.DataFrame(
            columns=["user_id", "event_id", "total", "crossed"]
        )
        # Concatenate all Arrow chunks for this key before sorting so the
        # crossing is attributed under a global (ts, event_id) order, not
        # a per-chunk one (matches the SQL window oracle exactly).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            # Vectorized crossing detection (the hot path: one numpy
            # cumsum instead of a per-event Python loop).  cents stay
            # exact: DECIMAL(12,2)*100 ≤ 1e14 < 2^53, so the float64
            # round-trip through rint is the same integer the Decimal
            # arithmetic yields.
            deltas = np.rint(
                pdf["v"].astype("float64").to_numpy() * 100
            ).astype(np.int64)
            cum = cents + np.cumsum(deltas)
            after = cum // threshold_cents
            before = (cum - deltas) // threshold_cents
            mask = after > before
            if mask.any():
                out = pd.DataFrame(
                    {
                        "user_id": key[0],
                        "event_id": pdf["event_id"].to_numpy()[mask],
                        "total": cum[mask] / 100.0,
                        "crossed": after[mask] * (threshold_cents / 100.0),
                    }
                )
            cents = int(cum[-1])
        state.update((cents,))
        yield out

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=ALERT_SCHEMA,
        stateStructType="cents bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
