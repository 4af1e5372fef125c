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
    # measured on this fixed data: multi-probe LSH (4x6 bands, 4 margin
    # flips) ~0.70 at ~29% candidate share; IVF with the k-means-refined
    # fine quantizer (K=32 md5 seeds, 2 Lloyd steps, nprobe=12) ~0.72 at
    # ~38% share — up from 0.32 with the old k=10 label-cell nprobe=2.
    assert r_lsh >= 0.60, f"LSH recall@10 collapsed: {r_lsh}"
    assert r_ivf >= 0.60, f"IVF recall@10 collapsed: {r_ivf}"


def test_ann_ivf_candidate_share_bounded(spark, sf_dir):
    """The IVF recall floor must not come from degenerating into brute
    force: the candidate set q44 re-ranks (its own CTE chain) stays a
    bounded fraction of all query-corpus pairs."""
    from music_recommendation_service_spark.plans.similarity import (
        ivf_candidate_counts,
    )

    n_cand, n_q, corpus = ivf_candidate_counts(spark, sf_dir)
    assert n_q > 0
    share = n_cand / (n_q * (corpus - 1))
    assert share <= 0.45, f"IVF candidate share blew up: {share:.3f}"
    assert share >= 0.05, f"IVF candidate set suspiciously empty: {share:.3f}"


def test_ann_lsh_candidate_share_bounded(spark, sf_dir):
    """The recall above must NOT come from degenerating into brute force:
    the candidate set q32 actually re-ranks (its own cand CTE, not a
    reimplementation) stays a bounded fraction of all query-corpus pairs."""
    from music_recommendation_service_spark.plans.similarity import (
        ann_candidate_counts,
    )

    n_cand, n_q, corpus = ann_candidate_counts(spark, sf_dir)
    assert n_q > 0
    share = n_cand / (n_q * (corpus - 1))
    assert share <= 0.35, f"LSH candidate share blew up: {share:.3f}"
    assert share >= 0.01, f"LSH candidate set suspiciously empty: {share:.3f}"


def test_ann_pq_recall_and_share(spark):
    """q134 (product quantization): ADC top-candidates + exact re-rank must
    retrieve real L2 neighbors. Measured on the fixed sf0.01 corpus:
    recall@10 = 0.50 at a 10% exact-read share (round-11 reconstructed corpus; see README 'testdata incident') — PQ trades recall for the
    smallest exact-read share of the three ANN legs plus a 64x-compressed
    ADC scan (codes, not embeddings). Pinned at sf0.01 because at sf0.001
    the candidate budget covers the whole corpus and recall is trivially
    1.0. The baseline is exact L2 (PQ approximates L2, not cosine — q31's
    cosine top-k is a different relation on unnormalized vectors)."""
    import duckdb

    from music_recommendation_service_spark.plans import registry
    from music_recommendation_service_spark.plans.similarity import (
        _PQ_CAND,
    )

    sf_dir = "/root/testdata/sf0.01"
    got = {}
    for r in registry()["q134_ann_pq"].build(spark, sf_dir).collect():
        got.setdefault(r["qid"], set()).add(r["vec_id"])

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    exact = con.sql("""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        SELECT q.vec_id AS qid, x.vec_id AS vid
        FROM e q JOIN e x ON q.vec_id % 100 = 0 AND x.vec_id <> q.vec_id
        QUALIFY row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_dot_product(q.v, q.v) - 2 * list_dot_product(q.v, x.v)
                     + list_dot_product(x.v, x.v), x.vec_id
        ) <= 10
    """).fetchall()
    want = {}
    for qid, vid in exact:
        want.setdefault(qid, set()).add(vid)

    hits = total = 0
    for q, w in want.items():
        hits += len(got.get(q, set()) & w)
        total += len(w)
    recall = hits / total
    assert recall >= 0.35, f"PQ recall@10 collapsed: {recall}"
    # the exact-read share is the candidate budget, by construction
    corpus = con.sql("SELECT count(*) FROM embeddings").fetchone()[0]
    assert _PQ_CAND / (corpus - 1) <= 0.15
