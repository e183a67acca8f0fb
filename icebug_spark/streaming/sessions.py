"""Custom stateful streaming operator: incremental per-user
sessionization via ``applyInPandasWithState``.

The batch twin is q17 (gap-based sessionization over ``events``): a new
session starts when a user's inter-event gap exceeds ``gap_seconds``.
This operator maintains (last event time, event count, session count)
per user as GroupState across micro-batches and emits the user's updated
running aggregates every batch — the same (user_id, n_events,
n_sessions) row q17 computes over the full history, kept incrementally.

This is the one streaming shape Structured Streaming's built-ins can't
express: ``session_window`` aggregates within watermark-bounded windows,
but a RUNNING per-key session count over unbounded history needs custom
state. State is O(1) per user (three longs) — at cluster scale the state
store shards by user_id exactly like the shuffle.

Ordering contract: within each micro-batch the operator sorts by
(ts, event_id); ACROSS batches events must arrive per-user
time-ordered (the standard state-based sessionization assumption —
bound out-of-orderness upstream with a watermark + sorted re-ingest, or
accept gap misclassification for stragglers, exactly as the reference
dynamic algorithms assume in-order event batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_GAP_US_DEFAULT = 1800 * 1_000_000


def _make_update_fn(gap_us: int):
    import pandas as pd

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        batch = pd.concat(list(pdf_iter), ignore_index=True)
        batch = batch.sort_values(["ts_us", "event_id"], kind="mergesort")
        if state.exists:
            last_us, n_events, n_sessions = state.get
        else:
            last_us, n_events, n_sessions = None, 0, 0
        for ts_us in batch["ts_us"]:
            ts_us = int(ts_us)
            if last_us is None:
                n_sessions += 1
            elif ts_us - last_us > gap_us:
                n_sessions += 1
            n_events += 1
            last_us = ts_us
        state.update((last_us, n_events, n_sessions))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n_events],
                "n_sessions": [n_sessions],
            }
        )

    return update


def sessionize_with_state(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """events: a STREAMING DataFrame with (event_id, ts, user_id, ...).
    Returns the running (user_id, n_events, n_sessions) per user, updated
    every micro-batch (output mode "update")."""
    from pyspark.sql import functions as F

    prepped = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(int(gap_seconds) * 1_000_000),
        outputStructType="user_id LONG, n_events LONG, n_sessions LONG",
        stateStructType="last_us LONG, n_events LONG, n_sessions LONG",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
