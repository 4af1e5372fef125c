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

from music_recommendation_service_spark.functions import rnd_sql

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
            F.round(F.avg("cos"), 6).alias("mean_cosine"),
            F.min("vec_id").alias("exemplar_id"),
        )
        .select("cluster_id", "n_vectors", "mean_cosine", "exemplar_id")
    )


def _q109_oracle() -> str:
    """DuckDB twin: the _ROUNDS Lloyd iterations unrolled. Engine parity
    requires identical arithmetic ORDER: unit-normalize, dot against the
    unit-normalized centroid, per-(cid, dim) avg of unit components,
    empty cells keep the previous centroid (left join + coalesce)."""
    unit = "list_transform({c}, x -> x / sqrt(list_dot_product({c}, {c})))"
    cos = (
        "list_dot_product(a.u, "
        + unit.format(c="c.c")
        + ")"
    )
    parts = [
        f"""e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    un AS (
        SELECT vec_id, {unit.format(c='v')} AS u FROM e
    ),
    cent0 AS (
        SELECT vec_id AS cid, u AS c FROM (
            SELECT vec_id, u FROM un
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
            LIMIT {_K}
        )
    )"""
    ]
    for i in range(_ROUNDS):
        parts.append(f"""assign{i} AS (
        SELECT vec_id, cid FROM (
            SELECT a.vec_id, c.cid,
                   row_number() OVER (
                       PARTITION BY a.vec_id ORDER BY {cos} DESC, c.cid
                   ) AS rnk
            FROM un a CROSS JOIN cent{i} c
        ) WHERE rnk = 1
    ),
    means{i} AS (
        SELECT cid, list(avg_val ORDER BY dim) AS c
        FROM (
            SELECT cid, dim, avg(val) AS avg_val
            FROM (
                SELECT g.cid, generate_subscripts(e.u, 1) AS dim,
                       unnest(e.u) AS val
                FROM assign{i} g JOIN un e ON g.vec_id = e.vec_id
            )
            GROUP BY cid, dim
        )
        GROUP BY cid
    ),
    cent{i + 1} AS (
        SELECT p.cid, coalesce(m.c, p.c) AS c
        FROM cent{i} p LEFT JOIN means{i} m ON p.cid = m.cid
    )""")
    return f"""
    WITH {','.join(parts)},
    final AS (
        SELECT vec_id, cid, cos FROM (
            SELECT a.vec_id, c.cid, {cos} AS cos,
                   row_number() OVER (
                       PARTITION BY a.vec_id ORDER BY {cos} DESC, c.cid
                   ) AS rnk
            FROM un a CROSS JOIN cent{_ROUNDS} c
        ) WHERE rnk = 1
    )
    SELECT cid                              AS cluster_id,
           CAST(count(*) AS BIGINT)         AS n_vectors,
           {rnd_sql('avg(cos)', 6)}         AS mean_cosine,
           min(vec_id)                      AS exemplar_id
    FROM final
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
