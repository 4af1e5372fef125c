"""As-of (most-recent-match) join — an operator the Spark DataFrame API
lacks as a primitive (pandas-on-Spark ``merge_asof`` exists, but routes
through a union-window plan; this is that plan made explicit and tunable).

Semantics: for each left row, attach the single right row with the same key
and the greatest right-timestamp <= left-timestamp (backward as-of). Left
rows with no prior right row keep nulls (left-outer as-of).

Scale design
------------
The naive formulations are both pathological at 100 TB: a range join
(t_r <= t_l) explodes to O(n x m) per key before picking the max, and a
per-left-row subquery is a correlated scan. This implementation is the
standard single-shuffle union trick:

  1. tag left rows (side=1) and right rows (side=0), union them aligned;
  2. one hash-partition shuffle on the join key, sort within partitions by
     (key, ts, side) — right rows sort before left rows at equal ts, so a
     right row AT the left timestamp matches (inclusive as-of);
  3. running ``last(right_payload, ignorenulls=True)`` over
     (unbounded preceding .. current row) carries the most recent right
     values forward; keep only left rows.

Cost: ONE shuffle of |L|+|R| rows and one sort — the same shape as a
sort-merge join, with no row explosion regardless of key skew or timestamp
density. Window state is O(1) per partition (running last), not O(window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: tuple[str, ...],
) -> DataFrame:
    """Backward, inclusive, left-outer as-of join.

    ``on``: equi key column name present in both inputs; ``right_payload``:
    right columns to attach (each emitted as-is, null when no match).
    """
    lcols = [c for c in left.columns]
    # The payload travels as ONE struct so the carried values always come
    # from the SAME right row (per-column carry could mix rows when payload
    # columns are legitimately null).
    payload_struct = F.struct(*[F.col(c).alias(c) for c in right_payload])
    struct_type = (
        right.select(payload_struct.alias("__r")).schema["__r"].dataType
    )
    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(struct_type).alias("__r"),
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        payload_struct.alias("__r"),
    )
    unioned = tagged_left.unionByName(tagged_right)

    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__m")
    )
    return carried.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col(f"__m.{c}").alias(c) for c in right_payload],
    )
