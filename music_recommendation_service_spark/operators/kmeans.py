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

Scale design (re-measured in the round-12 optimization pass; see
OPTIMIZATION_r12.md)
--------------------
- Centroids are O(k x DIM) — ALWAYS tiny — so they live on the driver and
  the corpus is never shuffled OR joined: per round exactly ONE
  distributed job runs scan -> assign + per-cluster partial sums
  (a ``mapInArrow`` NumPy kernel) and O(batches x k) tiny stat rows come
  back to the driver (bounded by k, DIM and the batch count — the same
  bounded driver-action budget the Lloyd loop always spent on its
  cost/shift collects).
- The per-round kernel is the guide's vectorized-native shape (§4.2):
  Arrow batches of (id, unit-vector) arrive zero-copy, NumPy computes the
  k cosines per row with a LEFT-TO-RIGHT fold over dimensions
  (``acc = acc + u_i * c_i`` — the exact IEEE-754 op sequence of the SQL
  ``aggregate(zip_with(...))`` fold and of the previous unrolled-codegen
  expression, so assignments are bit-identical), picks the argmax with
  first-occurrence tie-break over cid-ASCENDING centroids (ties go to the
  smallest cluster id, NaN cosines never win — the ``min(struct(-cos,
  cid))`` comparator's semantics), and emits per-cluster (count,
  sum(1-cos), per-dim sums).
- Why not per-round JVM expressions: centroid literals change every
  round, so ANY literal-bearing codegen plan re-JITs per round (measured
  at sf0.1: ~2-3 s/round of compile + py4j expression build for a 0.05 s
  compute), and interpreted higher-order functions are ~50x slower per
  row. The Arrow kernel has no codegen at all; the Python worker is
  reused across rounds, so a round's fixed cost is one job dispatch.
  Measured at sf0.1 (2k vectors, k=8, 3 rounds + final assign): q109
  27.0 s (unrolled-literal codegen) -> 2.6 s; the pre-rewrite
  crossJoin/shuffle form measured 5.9 s on the same host.
- Mean, shift and cost arithmetic on the driver replicates the
  executor-side expressions operation-for-operation, so assignment
  decisions match the DuckDB oracle's unrolled SQL (pinned by
  test_kmeans.py and the q109 oracle hash).
- At 100 TB: the corpus crosses the Arrow boundary once per round —
  batch-columnar, only (id, vector) — and the partial-sum rows returned
  per task are O(k x DIM). No exchange ever carries a corpus-sized
  relation; rounds are scan-bound, exactly like the codegen form, with
  NumPy's vectorized multiply-add matching compiled-JVM throughput.
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


def _cos_matrix(U, C):
    """Row x centroid cosine matrix with the SQL fold's exact op order:
    ``acc = acc + u_i * c_i`` left to right over dimensions (array
    element adds are independent per (row, centroid) cell, so the
    per-cell IEEE-754 sequence is identical to the scalar fold)."""
    import numpy as np

    n = U.shape[0]
    k = C.shape[0]
    acc = np.zeros((n, k), dtype=np.float64)
    for i in range(C.shape[1]):
        acc = acc + U[:, i : i + 1] * C[:, i]
    return acc


def _best_idx(cos):
    """Argmax with the ``min(struct(-cos, cid))`` comparator's semantics
    over cid-ASCENDING centroid columns: highest cosine wins, exact ties
    break to the FIRST (= smallest-cid) column, NaN cosines never beat a
    number (all-NaN rows fall to the first column — the all-equal tie)."""
    import numpy as np

    key = np.where(np.isnan(cos), -np.inf, cos)
    return np.argmax(key, axis=1)  # first occurrence on ties


def _unflatten(batch, col_idx, dim):
    """Zero-copy-ish (n, dim) float64 view of a list<double> column."""
    import numpy as np

    arr = batch.column(col_idx)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return np.asarray(flat, dtype=np.float64).reshape(len(batch), dim)


def _round_kernel(cents_sorted: list, dim: int):
    """mapInArrow round pass: per batch, assign rows to centroids and
    emit one row per NON-EMPTY cluster: (cid, n, sum(1-cos), per-dim
    sums of the assigned unit vectors)."""
    cids = [cid for cid, _ in cents_sorted]
    cent_rows = [_unit_py(c) for _, c in cents_sorted]

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        C = np.array(cent_rows, dtype=np.float64)
        for batch in batches:
            n = len(batch)
            if n == 0:
                continue
            u_idx = batch.schema.get_field_index("_u")
            cid_type = batch.schema.field(
                batch.schema.get_field_index("_id")
            ).type
            U = _unflatten(batch, u_idx, dim)
            cos = _cos_matrix(U, C)
            best = _best_idx(cos)
            out_cid, out_n, out_c1m, out_sums = [], [], [], []
            for j, cid in enumerate(cids):
                mask = best == j
                nj = int(mask.sum())
                if nj == 0:
                    continue
                out_cid.append(cid)
                out_n.append(nj)
                out_c1m.append(float(np.sum(1.0 - cos[mask, j])))
                out_sums.append([float(s) for s in U[mask].sum(axis=0)])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_cid, type=cid_type),
                    pa.array(out_n, type=pa.int64()),
                    pa.array(out_c1m, type=pa.float64()),
                    pa.array(out_sums, type=pa.list_(pa.float64())),
                ],
                names=["_cid", "_n", "_c1m", "_sums"],
            )

    return fn


def _assign_kernel(cents_sorted: list, dim: int, id_name: str):
    """mapInArrow final-assignment pass: (id, cluster_id, cos) per row."""
    cids = [cid for cid, _ in cents_sorted]
    cent_rows = [_unit_py(c) for _, c in cents_sorted]

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        C = np.array(cent_rows, dtype=np.float64)
        for batch in batches:
            n = len(batch)
            if n == 0:
                continue
            id_idx = batch.schema.get_field_index("_id")
            cid_type = batch.schema.field(id_idx).type
            U = _unflatten(
                batch, batch.schema.get_field_index("_u"), dim
            )
            cos = _cos_matrix(U, C)
            best = _best_idx(cos)
            best_cos = cos[np.arange(n), best]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(id_idx),
                    pa.array([cids[j] for j in best], type=cid_type),
                    pa.array(best_cos, type=pa.float64()),
                ],
                names=[id_name, "cluster_id", "cos"],
            )

    return fn


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
    dim = len(cents[0][1]) if cents else 0

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    stats_schema = StructType(
        [
            StructField("_cid", cid_type, True),
            StructField("_n", LongType(), False),
            StructField("_c1m", DoubleType(), False),
            StructField("_sums", ArrayType(DoubleType()), False),
        ]
    )
    assign_schema = StructType(
        [
            StructField(id_col, cid_type, True),
            StructField("cluster_id", cid_type, True),
            StructField("cos", DoubleType(), True),
        ]
    )

    def _cid_sorted(cn):
        # cid-ascending order for the argmax tie-break; Python's < on the
        # id domain (ints / strings) matches Spark's ordering (UTF-8 byte
        # order equals code-point order).
        return sorted(cn, key=lambda t: t[0])

    history: list[dict] = []
    converged = False
    it = 0
    try:
        for it in range(1, max_iterations + 1):
            # ONE distributed job per round: the Arrow kernel assigns and
            # partial-aggregates; O(batches x k) tiny rows come back.
            rows = un.mapInArrow(
                _round_kernel(_cid_sorted(cents), dim), stats_schema
            ).collect()
            per_cid: dict = {}
            for r in rows:  # collect order is deterministic
                st = per_cid.setdefault(
                    r["_cid"], {"n": 0, "c1m": 0.0, "sums": [0.0] * dim}
                )
                st["n"] += r["_n"]
                st["c1m"] = st["c1m"] + r["_c1m"]
                ss = st["sums"]
                for d, v in enumerate(r["_sums"]):
                    ss[d] = ss[d] + v
            n_rows = sum(st["n"] for st in per_cid.values())
            # deterministic reduction order for the scalar cost: cid-sorted
            cost_num = 0.0
            for cid in sorted(per_cid, key=str):
                cost_num += per_cid[cid]["c1m"]
            cost = cost_num / n_rows if n_rows else float("nan")

            # Mean of assigned unit vectors per cluster; empty clusters
            # keep their previous centroid.
            new_cents: list[tuple[object, list[float]]] = []
            max_shift = float("-inf")
            for cid, c in cents:
                if cid in per_cid:
                    st = per_cid[cid]
                    newc = [s / st["n"] for s in st["sums"]]
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
        assignments = un.mapInArrow(
            _assign_kernel(_cid_sorted(cents), dim, id_col), assign_schema
        ).localCheckpoint()
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
