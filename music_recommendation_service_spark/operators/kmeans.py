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

Scale design (reworked in the round-12 optimization pass; see
OPTIMIZATION_r12.md)
--------------------
- Centroids are O(k x DIM) — ALWAYS tiny — so they live on the driver and
  enter each round's plan as LITERAL arrays: the per-row argmax is pure
  codegen arithmetic (an unrolled multiply-add per centroid element — no
  interpreted ``aggregate(zip_with(...))`` fold, which Spark cannot
  codegen), there is NO crossJoin fan-out (the old plan materialized
  n x k scored rows, shuffled them through a groupBy(_id) argmax, then
  sort-merge-joined the winners back onto the corpus for the mean
  recompute — three corpus-sized exchanges per round). Now the corpus is
  never shuffled OR joined: per round exactly ONE distributed job runs
  scan -> assign (map) -> posexplode -> partial/final hash agg with
  O(k x DIM) state, and the k x DIM result is collected to the driver
  (bounded by k and DIM, never by data — the same bounded driver-action
  budget the old loop already spent on its cost/shift collects).
- Mean, shift and cost arithmetic on the driver replicates the previous
  executor-side expressions operation-for-operation (same left-to-right
  IEEE-754 fold order), so histories and assignments are bit-identical
  with the pre-optimization operator — pinned by test_kmeans.py and the
  q109 DuckDB oracle.
- Per round: 1 job, 1 shuffle of k x DIM partial-agg rows (was: 2
  localCheckpoint jobs + 2 collect jobs, with an n x k fan-out, a
  corpus-keyed groupBy exchange and a corpus join inside them).
  Measured at sf0.1 (2k vectors, k=8, 3 rounds): q109 4.16s -> see
  OPTIMIZATION_r12.md.
"""

from __future__ import annotations

import math
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


def _unit_py(c: list[float]) -> list[float]:
    """Driver twin of the executor-side ``_unit`` expression: n is the
    same left-to-right fold of squares, division is per-element IEEE-754
    — identical doubles. Division by a zero norm mirrors SQL double
    semantics (0/0 -> NaN, x/0 -> signed Infinity) instead of raising."""
    n = 0.0
    for x in c:
        n = n + x * x
    n = math.sqrt(n)
    if n == 0.0:
        return [
            float("nan") if x == 0.0 else math.copysign(float("inf"), x)
            for x in c
        ]
    return [x / n for x in c]


def _dot_lit(u, c: list[float]):
    """Codegen dot product of array column ``u`` against the literal
    centroid ``c``: an unrolled left-to-right multiply-add — the same
    summation order as the ``aggregate(zip_with(...))`` fold (products
    first, then acc + x left to right), so results are bit-identical,
    but whole-stage-codegen compiles it (higher-order functions are
    interpreted per row)."""
    acc = F.lit(0.0).cast("double")
    for i, x in enumerate(c):
        acc = acc + F.element_at(u, i + 1) * F.lit(float(x))
    return acc


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
    cid_type = un.schema["_id"].dataType

    # Deterministic seeds: k vectors in md5(id) order — TakeOrderedAndProject
    # at any corpus size, never a global single-partition window. Seeds (and
    # every later centroid) are k x DIM scalars — collected to the driver,
    # the bounded per-round driver action this loop always had.
    seed_rows = (
        un.orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
        .limit(k)
        .collect()
    )
    cents: list[tuple[object, list[float]]] = [
        (r["_id"], list(r["_u"])) for r in seed_rows
    ]

    def _best_expr(cn: list[tuple[object, list[float]]]):
        # Argmax over the k literal unit centroids as min(struct(-cos,
        # cid, cos)) — highest cosine wins, exact ties break to the
        # SMALLEST cid for any orderable id type; the third field carries
        # the winning cosine out without re-negation. array_min over a
        # k-element literal-struct array is the row-wise twin of the old
        # crossJoin + groupBy(_id).min(struct) — same comparator, same
        # result, zero exchanges.
        structs = []
        for cid, c in cn:
            cu = _unit_py(c)
            cos = _dot_lit(F.col("_u"), cu)
            structs.append(
                F.struct(
                    (-cos).alias("_neg"),
                    F.lit(cid).cast(cid_type).alias("_cid"),
                    cos.alias("_cos"),
                )
            )
        return F.array_min(F.array(*structs)).alias("_b")

    history: list[dict] = []
    converged = False
    it = 0
    try:
        for it in range(1, max_iterations + 1):
            # ONE distributed job per round: assign (map) -> posexplode ->
            # (cid, dim) hash agg, k x DIM rows back. _c1m/_n ride the
            # dim=0 groups so the round's cost needs no second action.
            stats = (
                un.select(_best_expr(cents), F.posexplode("_u").alias("_dim", "_val"))
                .groupBy(F.col("_b._cid").alias("_cid"), "_dim")
                .agg(
                    F.avg("_val").alias("_avg"),
                    F.sum(F.lit(1.0) - F.col("_b._cos")).alias("_c1m"),
                    F.count(F.lit(1)).alias("_n"),
                )
                .collect()
            )
            means: dict = {}
            cost_num = 0.0
            n_rows = 0
            for r in stats:
                means.setdefault(r["_cid"], {})[r["_dim"]] = r["_avg"]
                if r["_dim"] == 0:
                    n_rows += r["_n"]
            # deterministic reduction order for the scalar cost: cid-sorted
            for cid in sorted(means, key=str):
                row0 = next(
                    r for r in stats if r["_cid"] == cid and r["_dim"] == 0
                )
                cost_num += row0["_c1m"]
            cost = cost_num / n_rows if n_rows else float("nan")

            # Mean of assigned unit vectors per cluster; empty clusters
            # keep their previous centroid.
            new_cents: list[tuple[object, list[float]]] = []
            max_shift = float("-inf")
            for cid, c in cents:
                if cid in means:
                    dims = means[cid]
                    newc = [dims[d] for d in sorted(dims)]
                else:
                    newc = c
                a, b = _unit_py(c), _unit_py(newc)
                s = 0.0
                for x, y in zip(a, b):
                    d = x - y
                    s = s + d * d
                shift = math.sqrt(s)
                if shift > max_shift:
                    max_shift = shift
                new_cents.append((cid, newc))
            history.append(
                {"iteration": it, "cost": float(cost), "max_shift": max_shift}
            )
            cents = new_cents
            if max_shift <= tol:
                converged = True
                break

        # Final assignment under the post-update centroids: a pure map over
        # the corpus (no exchange). localCheckpoint keeps the result valid
        # and cheap to re-consume after un.unpersist() below.
        assignments = (
            un.select("_id", _best_expr(cents))
            .select(
                F.col("_id").alias(id_col),
                F.col("_b._cid").alias("cluster_id"),
                F.col("_b._cos").alias("cos"),
            )
            .localCheckpoint()
        )
    finally:
        un.unpersist()
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    centroids = spark.createDataFrame(
        [(cid, list(c)) for cid, c in cents],
        StructType(
            [
                StructField("cluster_id", cid_type),
                StructField("centroid", ArrayType(DoubleType())),
            ]
        ),
    )
    return KMeansResult(assignments, centroids, history, converged, it)
