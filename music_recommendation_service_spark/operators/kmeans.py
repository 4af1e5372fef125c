"""Spherical k-means to convergence — the iterative-clustering engine the
catalog's single-step queries (q108 one Lloyd refinement, q44's unrolled
two-step quantizer) are snapshots of. Generalizes the reference's static
label centroids (``generate_seed_data.py`` assigns labels at generation
time; ``RecommendationService.cs:225-236`` serves similarity from them)
into a trainable quantizer.

Algorithm: normalize every vector to the unit sphere once, seed ``k``
centroids deterministically (md5-ordered vector ids — reproducible across
sessions with no RNG), then Lloyd-iterate: assign each vector to the
highest-cosine centroid, recompute each centroid as the MEAN OF ITS
ASSIGNED UNIT VECTORS, stop when the largest centroid direction shift
drops to ``tol`` or after ``max_iterations``. With mean-of-unit-vector
updates the summed-cosine objective is non-decreasing per round (each
half-step is an argmax), which `tests/test_kmeans.py` pins as an
invariant; empty clusters keep their previous centroid.

Scale design
------------
- Per round: ONE broadcast join (corpus x k centroids — centroids are
  O(k x DIM), always tiny), one hash aggregate for the argmax (map-side
  combinable ``max(struct(cos, -cid))``, shuffles (id, cid, cos)
  triples), and one posexplode + (cid, dim) hash aggregate for the mean
  recompute — O(k x DIM) state. The corpus itself is never shuffled.
- The normalized corpus is persisted once and reused every round; the
  centroid table is ``localCheckpoint``ed per round so the plan does not
  grow with iteration count (the components.py / PageRank discipline).
- Convergence needs two tiny driver-side actions per round (max shift,
  objective) over k-row / 1-row aggregates — standard for iterative
  algorithms: bounded by rounds, not data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class KMeansResult:
    assignments: DataFrame  # (id_col, cluster_id, cos)
    centroids: DataFrame    # (cluster_id, centroid: array<double>)
    history: list[dict]     # per round: {iteration, cost, max_shift}
    converged: bool
    iterations: int


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def kmeans_fit(
    vectors: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iterations: int = 20,
    tol: float = 1e-6,
) -> KMeansResult:
    """Fit spherical k-means over ``vectors[(id_col, vec_col)]``.

    ``cost`` in the history is the mean cosine DISTANCE (1 - cos) of the
    round's assignment — non-increasing round over round. ``max_shift``
    is the largest L2 movement between consecutive unit-normalized
    centroid directions; the loop stops once it is <= ``tol``.
    """
    if k < 1:
        raise ValueError(f"kmeans_fit: k must be >= 1, got {k}")
    spark = vectors.sparkSession

    base = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    nrm = F.sqrt(_dot(F.col("_v"), F.col("_v")))
    un = (
        base.withColumn("_u", F.transform("_v", lambda x: x / nrm))
        .select("_id", "_u")
        .persist()
    )

    # Deterministic seeds: k vectors in md5(id) order — TakeOrderedAndProject
    # at any corpus size, never a global single-partition window.
    cent = (
        un.orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
        .limit(k)
        .select(F.col("_id").alias("_cid"), F.col("_u").alias("_c"))
        .localCheckpoint()
    )

    def _unit(c):
        n = F.sqrt(_dot(c, c))
        return F.transform(c, lambda x: x / n)

    def assign(cent_df: DataFrame) -> DataFrame:
        # Argmax as a map-side-combinable min(struct(-cos, cid, cos)):
        # highest cosine wins, exact ties break to the SMALLEST cid for
        # any orderable id type (negating the id would NULL out / throw
        # on string ids). The third field never influences ordering —
        # cids are unique within the centroid table — it just carries the
        # winning cosine out without a re-negation.
        cn = cent_df.select("_cid", _unit(F.col("_c")).alias("_cn"))
        scored = un.crossJoin(F.broadcast(cn)).select(
            "_id", "_cid", _dot(F.col("_u"), F.col("_cn")).alias("_cos")
        )
        best = scored.groupBy("_id").agg(
            F.min(
                F.struct(
                    (-F.col("_cos")).alias("_neg"),
                    F.col("_cid"),
                    F.col("_cos"),
                )
            ).alias("_b")
        )
        return best.select(
            "_id",
            F.col("_b._cid").alias("_cid"),
            F.col("_b._cos").alias("_cos"),
        )

    history: list[dict] = []
    converged = False
    it = 0
    assigned = assign(cent)
    try:
        for it in range(1, max_iterations + 1):
            assigned = assigned.localCheckpoint()
            cost = assigned.agg(
                F.avg(F.lit(1.0) - F.col("_cos")).alias("c")
            ).collect()[0]["c"]

            # Mean of assigned unit vectors per cluster; empty clusters
            # keep their previous centroid (left join + coalesce).
            comp = (
                assigned.join(un, "_id")
                .select("_cid", F.posexplode("_u").alias("_dim", "_val"))
                .groupBy("_cid", "_dim")
                .agg(F.avg("_val").alias("_avg"))
            )
            means = comp.groupBy("_cid").agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("_dim", "_avg"))),
                    lambda s: s["_avg"],
                ).alias("_cnew")
            )
            new_cent = (
                cent.join(means, "_cid", "left")
                .select(
                    "_cid", F.coalesce(F.col("_cnew"), F.col("_c")).alias("_c")
                )
                .localCheckpoint()
            )

            shift_row = (
                cent.alias("o")
                .join(new_cent.alias("n"), "_cid")
                .select(
                    F.sqrt(
                        F.aggregate(
                            F.zip_with(
                                _unit(F.col("o._c")),
                                _unit(F.col("n._c")),
                                lambda a, b: (a - b) * (a - b),
                            ),
                            F.lit(0.0).cast("double"),
                            lambda acc, x: acc + x,
                        )
                    ).alias("_shift")
                )
                .agg(F.max("_shift").alias("m"))
                .collect()[0]
            )
            max_shift = float(shift_row["m"])
            history.append(
                {"iteration": it, "cost": float(cost), "max_shift": max_shift}
            )
            cent = new_cent
            assigned = assign(cent)
            if max_shift <= tol:
                converged = True
                break

        assignments = assigned.select(
            F.col("_id").alias(id_col),
            F.col("_cid").alias("cluster_id"),
            F.col("_cos").alias("cos"),
        ).localCheckpoint()
    finally:
        un.unpersist()
    centroids = cent.select(
        F.col("_cid").alias("cluster_id"), F.col("_c").alias("centroid")
    )
    return KMeansResult(assignments, centroids, history, converged, it)
