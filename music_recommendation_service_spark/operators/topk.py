"""Top-k operators.

The reference only ever takes a global top-k by sort+limit
(``run_weekly_trending_analysis.py:55-56``, ``RecommendationService.cs:97-101``,
SURVEY.md §2.6). Spark plans ``orderBy(...).limit(k)`` as
``TakeOrderedAndProject`` — per-partition heap + driver merge, no global sort
shuffle, which is exactly the scalable physical shape.

``topk_per_key`` is the windowed generalization the reference lacks
(SURVEY.md §2.5): rank within a partition and keep k. At scale this is one
shuffle on the partition key; ties are broken deterministically by the
caller-supplied ordering columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """Global top-k -> TakeOrderedAndProject (O2/O5)."""
    return df.orderBy(*order).limit(k)


def topk_per_key(df: DataFrame, keys: list[str], k: int, *order: Column) -> DataFrame:
    """Top-k per group via row_number window; output keeps all input columns
    plus ``rank``."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
