"""Custom stateful streaming operators via applyInPandasWithState.

The escape hatch for stateful semantics Spark's built-in windows can't
express (SURVEY §2.9 / engine extension): arbitrary per-key state
carried across micro-batches, with timeout-based eviction bounding
state size at scale.

``running_user_stats``: per-key running aggregates (event count,
value sum, last-seen timestamp) emitted once per micro-batch per
active key — the canonical sessionless profile accumulator for a
100 TB event stream. State is one small tuple per key; a processing-
time timeout expires idle keys so state does not grow unboundedly.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])


def _make_update(timeout_ms: int | None):
    def _update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # timeout sweep: evict the idle key WITHOUT re-updating state
            # or re-arming the timeout (else idle keys live forever and a
            # spurious duplicate row is emitted per sweep)
            state.remove()
            return
        (n, total) = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return _update


def running_user_stats(
    events: DataFrame,
    key: str = "user_id",
    timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming per-key running profile (count + value sum).

    Pass ``timeout_ms`` on a long-lived continuous stream so idle keys
    expire and state stays bounded (ProcessingTimeTimeout). Leave it
    None for bounded replays (Trigger.AvailableNow) — the
    timeout-sweep batch is unnecessary there (and trips a planner bug
    in Spark 4.1.2's applyInPandasWithState timeout path).
    """
    return events.groupBy(key).applyInPandasWithState(
        _make_update(timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout if timeout_ms else GroupStateTimeout.NoTimeout
        ),
    )
