"""Pair co-occurrence operators.

The reference computes item-item similarity twice with the same shape:
playlist co-occurrence (``process_song_similarity.py:30-39``, SURVEY.md J2/A2)
and co-like collaborative filtering (``process_collaborative_filtering.py:25-43``,
J3/A2): distinct (group, item) pairs, self-join on the group key with the
canonical ``item_1 < item_2`` residual, then count per pair. The serving layer
then symmetrizes the pair table into both directions
(``RecommendationService.cs:225-236``, U2/J6).

Spark-first realization: equi-join on the group key (sort-merge / shuffled
hash chosen by Catalyst; AQE splits skewed keys), with ``<`` as the residual
non-equi condition; symmetrization is a union of the two column orders — no
driver-side maps.

Scale notes
-----------
- Pair explosion is O(sum n_k^2) per group key. ``cap_group_size`` bounds the
  contribution of pathological hot keys (a playlist with 10^6 tracks produces
  5*10^11 pairs): rank items within a group and keep the first ``cap`` —
  deterministic, and at 100 TB the only thing standing between you and a
  runaway shuffle stage.
- ``distinct()`` before the self-join both fixes semantics (a user liking a
  track twice is one co-occurrence) and shrinks the join input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cooccurrence_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    score_col: str = "score",
    cap_group_size: int | None = None,
) -> DataFrame:
    """Distinct (group, item) -> canonical pair counts.

    Returns columns ``{item_col}_1, {item_col}_2, {score_col}`` with
    ``_1 < _2`` (canonical ordering removes self-pairs and mirror
    duplicates, per ``process_song_similarity.py:33-34``).
    """
    base = df.select(group_col, item_col).distinct()
    if cap_group_size is not None:
        rn = F.row_number().over(
            Window.partitionBy(group_col).orderBy(F.col(item_col))
        )
        base = base.withColumn("_rn", rn).filter(F.col("_rn") <= cap_group_size).drop("_rn")

    left = base.alias("l")
    right = base.alias("r")
    pairs = left.join(
        right,
        (F.col(f"l.{group_col}") == F.col(f"r.{group_col}"))
        & (F.col(f"l.{item_col}") < F.col(f"r.{item_col}")),
    ).select(
        F.col(f"l.{item_col}").alias(f"{item_col}_1"),
        F.col(f"r.{item_col}").alias(f"{item_col}_2"),
    )
    return pairs.groupBy(f"{item_col}_1", f"{item_col}_2").agg(
        F.count(F.lit(1)).alias(score_col)
    )


def symmetrize_pairs(
    pairs: DataFrame, a: str, b: str, score_col: str = "score"
) -> DataFrame:
    """Canonical pair table -> both-direction adjacency (U2).

    Relational form of the serving layer's dict symmetrization
    (``RecommendationService.cs:230-234``): each (t1, t2, s) row contributes
    (t1->t2) and (t2->t1).
    """
    fwd = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"), F.col(score_col))
    rev = pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"), F.col(score_col))
    return fwd.unionByName(rev)
