"""Engine-side spherical k-means (operators/kmeans.py): Lloyd invariants
that the unrolled catalog snapshots (q44's quantizer, q108, q109) rely
on — objective monotonicity, movement-based convergence, empty-cluster
resilience, determinism."""

from __future__ import annotations

from music_recommendation_service_spark.operators.kmeans import kmeans_fit
from music_recommendation_service_spark.sources.catalog import load_table


def test_kmeans_cost_non_increasing(spark, sf_dir):
    """Each Lloyd round is two argmax half-steps, so the mean cosine
    distance of the assignment must never increase round over round."""
    emb = load_table(spark, sf_dir, "embeddings")
    res = kmeans_fit(emb, k=6, max_iterations=8, tol=0.0)
    costs = [h["cost"] for h in res.history]
    assert len(costs) == 8
    for a, b in zip(costs, costs[1:]):
        assert b <= a + 1e-9, f"cost increased: {costs}"
    # the loop made progress at all
    assert costs[-1] < costs[0]


def test_kmeans_converges_on_tolerance(spark, sf_dir):
    """A loose movement tolerance stops the loop early with
    converged=True; the last recorded shift is within it."""
    emb = load_table(spark, sf_dir, "embeddings")
    res = kmeans_fit(emb, k=4, max_iterations=20, tol=0.2)
    assert res.converged
    assert res.iterations < 20
    assert res.history[-1]["max_shift"] <= 0.2
    # every vector assigned to exactly one of the k surviving centroids
    n = emb.count()
    assert res.assignments.count() == n
    assert res.centroids.count() == 4


def test_kmeans_empty_clusters_keep_previous_centroid(spark):
    """More centroids than distinct directions: emptied cells keep their
    previous centroid instead of vanishing — k is stable and the fit
    still converges."""
    rows = [(i, [1.0, 0.0, 0.0]) for i in range(5)] + [
        (i, [0.0, 1.0, 0.0]) for i in range(5, 10)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    res = kmeans_fit(df, k=4, max_iterations=5, tol=0.0)
    assert res.centroids.count() == 4
    got = {r["cluster_id"] for r in res.assignments.collect()}
    # only <= 2 cells can be populated (two distinct directions)
    assert 1 <= len(got) <= 2
    # all members of one direction land together with cos ~ 1
    assert all(
        abs(r["cos"] - 1.0) < 1e-9 for r in res.assignments.collect()
    )


def test_kmeans_deterministic(spark, sf_dir):
    """md5-seeded, RNG-free: two fits over the same data are identical."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = kmeans_fit(emb, k=5, max_iterations=3, tol=0.0)
    b = kmeans_fit(emb, k=5, max_iterations=3, tol=0.0)
    rows_a = sorted(
        (r["vec_id"], r["cluster_id"]) for r in a.assignments.collect()
    )
    rows_b = sorted(
        (r["vec_id"], r["cluster_id"]) for r in b.assignments.collect()
    )
    assert rows_a == rows_b
    assert a.history == b.history


def test_kmeans_rejects_bad_k(spark, sf_dir):
    import pytest

    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="k must be"):
        kmeans_fit(emb, k=0)


def test_kmeans_string_ids_and_tie_break(spark):
    """Non-numeric id columns must work (cluster ids are seed ids, so the
    argmax tie-break cannot negate them), and exact cosine ties must
    deterministically break to the SMALLEST cluster id — duplicate
    embeddings are the norm in dedup corpora."""
    rows = (
        [(f"doc{i:02d}", [1.0, 0.0]) for i in range(4)]
        + [(f"doc{i:02d}", [0.0, 1.0]) for i in range(4, 8)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "embedding"])
    res = kmeans_fit(
        df, k=4, id_col="doc_id", vec_col="embedding",
        max_iterations=3, tol=0.0,
    )
    got = {r["doc_id"]: r["cluster_id"] for r in res.assignments.collect()}
    assert set(got) == {f"doc{i:02d}" for i in range(8)}
    # duplicate vectors tie on cosine against every centroid of their
    # direction: all of them must land on the SAME, smallest, cluster id
    by_dir = [
        {got[f"doc{i:02d}"] for i in range(4)},
        {got[f"doc{i:02d}"] for i in range(4, 8)},
    ]
    assert all(len(s) == 1 for s in by_dir), by_dir
    assert res.history  # loop ran
