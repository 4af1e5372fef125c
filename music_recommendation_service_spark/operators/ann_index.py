"""IVF-flat ANN as BUILD-ONCE / PROBE-MANY engine operators.

The catalog's q44 runs quantizer-build + probe in one statement so a
DuckDB oracle can check it; a 100 TB deployment does not — it builds the
index once (an expensive corpus pass), persists it (e.g. as snapshot
tables via ``sources.snapshots``), and serves many query batches against
it. These operators are that split:

- :func:`build_ivf_index` — the quantizer build, implemented BY
  ``operators.kmeans.kmeans_fit`` (fixed ``lloyd_steps`` rounds, tol=0):
  k-means IS the IVF coarse quantizer, one implementation, not two.
- :func:`ann_query` — multi-probe + exact re-rank against a built index:
  per query, rank the ``nprobe`` nearest cells (broadcast centroid
  table), equi-join the probed cells against the assignment map for
  candidates, exact-cosine re-rank, top-k.

Parity: with (k=32, lloyd_steps=2, nprobe=12) this path reproduces the
q44 catalog output bit-for-bit (same seeds, same unit-mean Lloyd
arithmetic, same tie-breaks) — pinned by ``tests/test_ann_index.py``.

Scale design: the centroid table is O(k x DIM) and broadcast everywhere;
the probe fan-out shuffles (query_id, cid) pairs; the candidate join is
equi on cid; only candidate pairs are exact-scored. The corpus embedding
column is touched once at build and once per candidate — never
all-pairs. Replaces the reference's full-scan in-memory similarity
serving (``RecommendationService.cs:225-236``) with an indexed path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from music_recommendation_service_spark.operators.kmeans import _dot, kmeans_fit


@dataclass
class IVFIndex:
    centroids: DataFrame    # (cluster_id, centroid: array<double>) — unit-mean
    assignments: DataFrame  # (id, cluster_id)
    id_col: str
    vec_col: str


def build_ivf_index(
    vectors: DataFrame,
    k: int = 32,
    lloyd_steps: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IVFIndex:
    """One corpus pass: fit the coarse quantizer (k-means, fixed rounds)
    and materialize the inverted assignment map."""
    res = kmeans_fit(
        vectors, k=k, id_col=id_col, vec_col=vec_col,
        max_iterations=lloyd_steps, tol=0.0,
    )
    return IVFIndex(
        res.centroids,
        res.assignments.select(id_col, "cluster_id"),
        id_col,
        vec_col,
    )


def ann_query(
    vectors: DataFrame,
    index: IVFIndex,
    queries: DataFrame,
    nprobe: int = 12,
    topk: int = 10,
) -> DataFrame:
    """Approximate top-``topk`` cosine neighbors for every row of
    ``queries`` (same (id, vector) shape as ``vectors``) against the
    indexed corpus. Returns (query_id, neighbor_id, cosine, rank); a
    query never matches itself."""
    idc, vecc = index.id_col, index.vec_col

    def shaped(df: DataFrame, prefix: str, with_unit: bool) -> DataFrame:
        # The unit vector is only needed on the QUERY side (cell
        # probing); carrying it for the corpus would double the vector
        # payload through the candidate equi-join — the widest join here.
        v = F.col(vecc).cast("array<double>")
        nrm = F.sqrt(_dot(v, v))
        cols = [
            F.col(idc).alias(f"{prefix}_id"),
            v.alias(f"{prefix}_v"),
            nrm.alias(f"{prefix}_nrm"),
        ]
        if with_unit:
            cols.append(F.transform(v, lambda x: x / nrm).alias(f"{prefix}_u"))
        return df.select(*cols)

    qn = shaped(queries, "q", with_unit=True)
    cn = index.centroids.select(
        F.col("cluster_id").alias("_cid"),
        F.transform(
            "centroid",
            lambda x: x
            / F.sqrt(_dot(F.col("centroid"), F.col("centroid"))),
        ).alias("_cn"),
    )

    from pyspark.sql import Window

    probe_w = Window.partitionBy("q_id").orderBy(
        F.desc("_cos"), F.asc("_cid")
    )
    probes = (
        qn.crossJoin(F.broadcast(cn))
        .select("q_id", "_cid", _dot(F.col("q_u"), F.col("_cn")).alias("_cos"))
        .withColumn("_rnk", F.row_number().over(probe_w))
        .filter(F.col("_rnk") <= nprobe)
        .select("q_id", "_cid")
    )

    cand = (
        probes.join(
            index.assignments.select(
                F.col(idc).alias("n_id"), F.col("cluster_id").alias("_cid")
            ),
            "_cid",
        )
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id")
    )

    xn = shaped(vectors, "x", with_unit=False)
    scored = (
        cand.join(qn, "q_id")
        .join(xn, cand.n_id == xn.x_id)
        .select(
            "q_id",
            "n_id",
            (
                _dot(F.col("q_v"), F.col("x_v"))
                / (F.col("q_nrm") * F.col("x_nrm"))
            ).alias("_cos"),
        )
    )
    rank_w = Window.partitionBy("q_id").orderBy(F.desc("_cos"), F.asc("n_id"))
    return (
        scored.withColumn("_rnk", F.row_number().over(rank_w))
        .filter(F.col("_rnk") <= topk)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("n_id").alias("neighbor_id"),
            F.col("_cos").alias("cosine"),
            F.col("_rnk").cast("int").alias("rank"),
        )
    )
