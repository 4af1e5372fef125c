"""ANN quality: the approximate indexes (LSH q32, IVF q44) must actually
retrieve neighbors — measured as recall@10 against the exact baseline
(q31). Parity with the oracle proves the MECHANISM; this proves the
index is useful (deterministic value on the fixed testdata)."""

from __future__ import annotations

from music_recommendation_service_spark.plans import registry


def _topk(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ann_recall_vs_exact(spark, sf_dir):
    exact = _topk(registry()["q31_knn_bruteforce"].build(spark, sf_dir))
    lsh = _topk(registry()["q32_ann_lsh"].build(spark, sf_dir))
    ivf = _topk(registry()["q44_ann_ivf"].build(spark, sf_dir))

    def recall(approx):
        hits = total = 0
        for q, want in exact.items():
            got = approx.get(q, set())
            hits += len(got & want)
            total += len(want)
        return hits / total

    r_lsh, r_ivf = recall(lsh), recall(ivf)
    # Embeddings are near-random (max cos ~0.5), the hardest ANN regime;
    # measured on this fixed data: LSH ~0.44 (r=4 bands), IVF ~0.32.
    assert r_lsh > 0.25, f"LSH recall@10 collapsed: {r_lsh}"
    assert r_ivf > 0.15, f"IVF recall@10 collapsed: {r_ivf}"
