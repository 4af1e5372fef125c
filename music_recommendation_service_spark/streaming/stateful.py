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
