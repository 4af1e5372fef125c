"""Graph analytics on DataFrames (q73): the reference's graph usage is 1-hop
joins over a symmetric edge list (SURVEY.md §1.1 graph_user_follows); the
engine generalizes to multi-hop patterns with plain relational joins — no
graph runtime needed. Triangle counting is the canonical example: it is THE
join-order-sensitive query (edge ⋈ edge ⋈ edge), and the standard
degree-ordered orientation below is what makes it feasible at scale.

Scale notes (100 TB):
- Orientation (keep only src < dst after canonicalization) halves the edge
  list and makes each triangle countable exactly once — no /6 correction,
  no mirror-pair explosion.
- The wedge join (e1 ⋈ e2 on e1.dst = e2.src... here canonical a<b<c via
  two joins on shared endpoints) fans out as O(sum deg^2); at 100 TB the
  mitigation is degree-capping hot vertices first (same cap_group_size
  guard as operators/pairs.py) — the dense-vertex wedges are exactly the
  ones AQE skew-split handles worst because they are a single logical key.
- Every join here shares the edge relation; Spark reuses the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from music_recommendation_service_spark.plans import register
from music_recommendation_service_spark.sources.catalog import load_table as _t

# Strong co-occurrence graph: items co-returned by >= 3 users (the same
# "similar items" graph the reference's CF pipeline materializes, thresholded
# so the graph is sparse). Vertices are items; edges canonical (a < b).
_EDGES_SQL = """
    likes AS (
        SELECT DISTINCT o.o_custkey AS user_id, l.l_partkey AS item_id
        FROM orders o
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_returnflag = 'R'
    ),
    edges AS (
        SELECT a.item_id AS a, b.item_id AS b
        FROM likes a
        JOIN likes b ON a.user_id = b.user_id AND a.item_id < b.item_id
        GROUP BY a.item_id, b.item_id
        HAVING count(*) >= 3
    )
"""


@register(
    "q73_triangle_count",
    oracle=f"""
    WITH {_EDGES_SQL}
    SELECT CAST(count(*) AS BIGINT)          AS n_triangles,
           CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges
    FROM edges e1
    JOIN edges e2 ON e2.a = e1.a AND e2.b > e1.b
    JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b
    """,
    tags=("graph", "triangle", "self-join"),
)
def q73_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count on the canonical (a<b) co-return graph.

    Triangles a<b<c are found as: wedge (a-b, a-c with b<c) closed by edge
    (b-c). All three legs are the SAME canonical edge relation — one
    computation, two ReusedExchanges."""
    from music_recommendation_service_spark.operators.pairs import cooccurrence_pairs
    from music_recommendation_service_spark.plans.reference_parity import _likes
    from music_recommendation_service_spark.sources.writers import scratch_materialize

    likes = _likes(spark, sf_dir)
    edges = scratch_materialize(
        cooccurrence_pairs(likes, "user_id", "item_id")
        .filter(F.col("score") >= 3)
        .select(F.col("item_id_1").alias("a"), F.col("item_id_2").alias("b")),
        "q73_edges",
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, (F.col("e2.a") == F.col("e1.a")) & (F.col("e2.b") > F.col("e1.b")))
        .join(e3, (F.col("e3.a") == F.col("e1.b")) & (F.col("e3.b") == F.col("e2.b")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return tri.crossJoin(F.broadcast(n_edges))
