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


# ---------------------------------------------------------------------------
# Streaming EWMA: the per-key recursive smoother s = (1-a)*s + a*x as a
# stateful streaming operator — the streaming twin of the batch paths
# (plans/analytics_ext.py q121 windowed identity; operators/scan.py
# linear_scan for unbounded batch series). State per key is O(1): the
# current level and the count. Rows are folded in EVENT-TIME order within
# each micro-batch (sorted on (ts, event_id)); across batches the fold is
# arrival-order — in-order sources (file ledgers, partitioned Kafka with
# per-key ordering) therefore get exact event-order semantics, and a
# straggler that arrives after its successors folds late (documented
# processing-order recursion; strict event-time late handling would buffer
# behind a watermark like interval_join, trading latency for order).
# ---------------------------------------------------------------------------
EWMA_STATE_SCHEMA = "s DOUBLE, n LONG"
EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ewma", DoubleType()),
    ]
)


def streaming_ewma(
    events: DataFrame,
    alpha: float = 0.3,
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user recursive EWMA over a stream, emitted on every update."""
    from music_recommendation_service_spark.operators.scan import _fold_arrays

    import numpy as np

    def update(key, batches: Iterator[pd.DataFrame], state: GroupState):
        import pandas as _pd

        rows = [p for p in batches if len(p)]
        if not rows:
            if state.exists:
                s, n = state.get
                yield _pd.DataFrame(
                    {"user_id": [key[0]], "n_events": [n], "ewma": [s]}
                )
            return
        pdf = _pd.concat(rows).sort_values([ts_col, id_col])
        x = pdf[value_col].to_numpy(dtype=np.float64)
        if state.exists:
            s, n = state.get
        else:
            s, n = float(x[0]), 0  # seed: s_1 = x_1 (adjust=False parity)
        m = np.full(len(x), 1.0 - alpha)
        b = alpha * x
        _, s = _fold_arrays(m, b, float(s))
        n += len(x)
        state.update((float(s), int(n)))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "ewma": [float(s)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
