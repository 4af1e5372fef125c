"""q109 — spherical k-means run TO CONVERGENCE by the engine-side Lloyd
loop (`operators/kmeans.py`), surfaced as a catalog query the same way
q97 surfaces the tolerance-based PageRank: the catalog entry pins a FIXED
small configuration (K=8 seeds, 3 Lloyd rounds, tol=0) so the DuckDB
oracle can unroll the exact same rounds in closed SQL, while the operator
itself iterates to a movement-based stop for production use.

Reference tie: the reference's clustering surface is the static per-label
centroid similarity (``generate_seed_data.py`` labels,
``RecommendationService.cs:225-236`` serving); this is its trainable
generalization.

Scale: per round one broadcast (k x DIM centroid table) join + a
map-side-combinable argmax aggregate + an O(k x DIM)-state mean
recompute; the corpus is never shuffled. The oracle unrolls the identical
arithmetic (normalize -> seed by md5 order -> assign/mean x3 -> final
assign) so every float matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from music_recommendation_service_spark.functions import rnd, rnd_sql

_K = 8
_ROUNDS = 3


def _q109_build(spark, sf_dir: str):
    from music_recommendation_service_spark.operators.kmeans import kmeans_fit
    from music_recommendation_service_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    res = kmeans_fit(
        emb, k=_K, id_col="vec_id", vec_col="embedding",
        max_iterations=_ROUNDS, tol=0.0,
    )
    return (
        res.assignments.groupBy("cluster_id")
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            rnd(F.avg("cos"), 6).alias("mean_cosine"),
            F.min("vec_id").alias("exemplar_id"),
        )
        .select("cluster_id", "n_vectors", "mean_cosine", "exemplar_id")
    )


def _q109_oracle() -> str:
    """DuckDB twin: the _ROUNDS Lloyd iterations unrolled by the ONE
    canonical quantizer renderer (``similarity._ivf_refined_ctes``) — the
    same text generator q44 and its candidate-share probe use, so the
    parity-critical arithmetic (unit-normalize, dot against the
    unit-normalized centroid, per-(cid, dim) avg of unit components,
    empty cells keep the previous centroid) lives in exactly one place."""
    from music_recommendation_service_spark.functions.dialect import DUCK
    from music_recommendation_service_spark.plans.similarity import (
        _ivf_refined_ctes,
    )

    return f"""
    WITH {_ivf_refined_ctes(DUCK, k=_K, steps=_ROUNDS)}
    SELECT cid                              AS cluster_id,
           CAST(count(*) AS BIGINT)         AS n_vectors,
           {rnd_sql('avg(cos)', 6)}         AS mean_cosine,
           min(vec_id)                      AS exemplar_id
    FROM affinity
    WHERE rnk = 1
    GROUP BY cid
    """


def _register():
    from music_recommendation_service_spark.plans import register

    register(
        "q109_kmeans_converged",
        oracle=_q109_oracle(),
        doc=f"Spherical k-means via the engine Lloyd loop (K={_K}, "
        f"{_ROUNDS} fixed rounds for oracle parity; production path "
        "iterates to a movement tolerance): per-cluster size, mean "
        "cosine, exemplar.",
        tags=("similarity", "kmeans", "iterative", "clustering"),
    )(_q109_build)


_register()
