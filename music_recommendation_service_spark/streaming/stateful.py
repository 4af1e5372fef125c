"""Custom stateful streaming operator: per-user running totals via
``applyInPandasWithState`` — the arbitrary-state API (the built-in windowed
aggregates in pipeline.py cover time-bucketed state; this covers state that
never expires or has custom transition logic, e.g. lifetime counters,
per-entity models, fraud scores).

Scale design: state lives in the state store partitioned by the grouping
key — one shuffle per micro-batch keyed by user; state size is O(distinct
users), not O(events). Pandas batches move Arrow-vectorized. A production
deployment bounds state with a timeout (GroupStateTimeout) — here NoTimeout,
since lifetime totals are the point.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = "n_events LONG, total_value DOUBLE"
OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update(key, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Lifetime (n_events, total_value) per user, emitted on every update."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4.x arbitrary-state v2): richer state
# than applyInPandasWithState — multiple named state variables per key with
# independent schemas/TTLs. Here: a ValueState scalar aggregate plus a
# bounded ListState holding the most recent values (a per-entity feature
# a model server would read). Requires the RocksDB state store provider —
# state lives off-heap/on-disk per partition, so total state scales with
# executor-local disk, not JVM heap (the 100-TB-stream sizing argument).
# ---------------------------------------------------------------------------
RECENT_K = 5
TWS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
        StructField("n_recent", LongType()),
    ]
)

try:  # the v2 API exists on PySpark >= 4.0 only
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStatsProcessor(StatefulProcessor):
        """Lifetime (count, sum, max) + last-RECENT_K values per user."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState(
                "stats", "n LONG, total DOUBLE, mx DOUBLE"
            )
            self._recent = handle.getListState("recent", "v DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            n, total, mx = (
                self._stats.get() if self._stats.exists() else (0, 0.0, float("-inf"))
            )
            new_vals: list[float] = []
            for pdf in rows:
                vals = pdf["value"].fillna(0.0)
                n += len(pdf)
                total += float(vals.sum())
                if len(vals):
                    mx = max(mx, float(vals.max()))
                new_vals.extend(float(v) for v in vals)
            self._stats.update((n, total, mx))
            kept = [t for t in self._recent.get()] if self._recent.exists() else []
            kept = (kept + [(v,) for v in new_vals])[-RECENT_K:]
            self._recent.put(kept)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "max_value": [mx],
                    "n_recent": [len(kept)],
                }
            )

        def close(self) -> None:
            pass

except ImportError:  # pragma: no cover - PySpark < 4.0
    UserStatsProcessor = None  # type: ignore[assignment]


def user_stats_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas pipeline over a streaming events frame."""
    if UserStatsProcessor is None:  # pragma: no cover
        raise NotImplementedError("transformWithState requires PySpark >= 4.0")
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserStatsProcessor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
