"""Invariant tests for the corpus-preparation family (q100-q103) beyond
the value-level DuckDB oracles: the properties that make the operators
SAFE to run on a corpus you cannot eyeball — total token coverage, exact
overlap, score sanity, keeper ordering.

A pure-Python reference chunker (15 lines) pins q100's semantics
independently of BOTH engines; hypothesis drives it across adversarial
token counts (empty-ish docs, exact-boundary lengths, last-chunk stubs).
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from music_recommendation_service_spark.plans import registry
from music_recommendation_service_spark.plans.corpus_ops import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    SEMDEDUP_TAU,
)


def _py_chunks(tokens: list[str]) -> list[tuple[int, int, str]]:
    """Reference chunker: (chunk_idx, n_tokens, fingerprint16)."""
    n = len(tokens)
    out = []
    ci = 0
    while ci * CHUNK_STRIDE <= n - 1:
        piece = tokens[ci * CHUNK_STRIDE : ci * CHUNK_STRIDE + CHUNK_TOKENS]
        text = " ".join(piece)
        out.append(
            (ci, len(piece), hashlib.md5(text.encode()).hexdigest()[:16])
        )
        ci += 1
    return out


@given(
    st.lists(
        st.integers(1, CHUNK_TOKENS * 3 + 7),  # token counts incl. stubs
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=20, deadline=None)
def test_q100_matches_pure_python_reference(ns):
    """Spark chunking == the 15-line reference chunker for adversarial
    token counts (boundary lengths, single-token docs, stub tails)."""
    from music_recommendation_service_spark.session import get_spark

    spark = get_spark("tests")
    rows = [
        (i, " ".join(f"t{i}w{j}" for j in range(n)), "en", "src", n)
        for i, n in enumerate(ns)
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.createOrReplaceTempView("documents")
    from music_recommendation_service_spark.plans.corpus_ops import _q100
    from music_recommendation_service_spark.functions.dialect import SPARK

    got = {
        (r["doc_id"], r["chunk_idx"], r["n_tokens"], r["fingerprint"])
        for r in spark.sql(_q100(SPARK)).collect()
    }
    want = set()
    for i, n in enumerate(ns):
        toks = [f"t{i}w{j}" for j in range(n)]
        for ci, npc, fp in _py_chunks(toks):
            want.add((i, ci, npc, fp))
    assert got == want


def test_q100_total_coverage_and_overlap(spark, sf_dir):
    """Every document's tokens are fully covered: chunk k starts at
    k*stride, full chunks carry CHUNK_TOKENS tokens, consecutive chunks
    overlap by CHUNK_TOKENS - CHUNK_STRIDE, and the union of chunk spans
    is exactly [0, n)."""
    rows = registry()["q100_doc_chunking"].build(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        # contiguous chunk indexes from 0
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        last = chunks[-1]
        assert 1 <= last["n_tokens"] <= CHUNK_TOKENS
        # reconstruct the doc's token count from the final (clamped) chunk,
        # then every chunk's length must be exactly min(W, n - k*stride) —
        # full windows where possible, clamped tails at the end (several
        # trailing chunks can be short when stride < window)
        n_doc = (len(chunks) - 1) * CHUNK_STRIDE + last["n_tokens"]
        for c in chunks:
            assert c["n_tokens"] == min(
                CHUNK_TOKENS, n_doc - c["chunk_idx"] * CHUNK_STRIDE
            )
        # coverage: the last chunk starts inside the doc, and one more
        # chunk would have started past the end
        assert (len(chunks) - 1) * CHUNK_STRIDE <= n_doc - 1 < len(chunks) * CHUNK_STRIDE


def test_q101_scores_are_sane(spark, sf_dir):
    """Log-probabilities are negative; every doc with >= 2 tokens scores;
    n_bigrams == token_count - 1 (the exploded index covers every
    adjacent pair exactly once)."""
    from pyspark.sql import functions as F

    from music_recommendation_service_spark.sources.catalog import load_table

    scored = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in registry()["q101_bigram_quality"].build(spark, sf_dir).collect()
    }
    toks = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    assert set(scored) == {d for d, n in toks.items() if n >= 2}
    for d, (nb, lp) in scored.items():
        assert nb == toks[d] - 1
        assert lp < 0.0


def test_q102_keeper_ordering_and_threshold(spark, sf_dir):
    """Every dropped vector's keeper has a smaller id; max_cosine >= tau;
    n_dups counts same-cluster neighbors below it."""
    rows = registry()["q102_semantic_dedup"].build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["kept_id"] < r["vec_id"]
        assert r["max_cosine"] >= SEMDEDUP_TAU - 1e-6
        assert r["n_dups"] >= 1


def test_q102_subdivision_recall_guard(spark, sf_dir):
    """The hyperplane-bit subdivision is a recall trade (a pair is missed
    when its vectors land in different sign-bit cells of the same coarse
    IVF cell). Pin it: against the UNsubdivided ground truth (all pairs
    with cos >= tau inside a coarse cell), the subdivided dedup must
    still drop >= 70% of the true duplicates at the default bits."""
    from music_recommendation_service_spark.plans import corpus_ops
    from music_recommendation_service_spark.plans.corpus_ops import _q102

    dropped = {
        r["vec_id"]
        for r in registry()["q102_semantic_dedup"].build(spark, sf_dir).collect()
    }
    old_bits = corpus_ops.SEMDEDUP_BITS
    try:
        corpus_ops.SEMDEDUP_BITS = 0  # no subdivision = ground truth
        truth = {
            r["vec_id"]
            for r in registry()["q102_semantic_dedup"].build(spark, sf_dir).collect()
        }
    finally:
        corpus_ops.SEMDEDUP_BITS = old_bits
    assert truth  # the fixture corpus has semantic dups
    assert dropped <= truth  # subdivision can only MISS, never invent
    recall = len(dropped) / len(truth)
    # The synthetic corpus has ONLY moderate-similarity pairs (max cosine
    # < 0.5), the worst case for sign-bit agreement — measured 0.53 at
    # bits=2. Pin a floor under it; the exact-duplicate guarantee below
    # is the contract that matters for dedup.
    assert recall >= 0.45, f"SemDeDup subdivision recall {recall:.2f}"


def test_q102_exact_duplicates_never_missed(spark):
    """Identical vectors have identical sign bits and identical coarse
    assignment, so subdivision can never split an exact-duplicate pair:
    every exact dup must be dropped, at ANY bits setting."""
    import random

    from music_recommendation_service_spark.functions.dialect import SPARK
    from music_recommendation_service_spark.plans.corpus_ops import _q102

    rng = random.Random(7)
    rows = []
    for i in range(20):
        v = [round(rng.uniform(-1, 1), 3) for _ in range(64)]
        rows.append((2 * i, v, i % 10))       # original
        rows.append((2 * i + 1, v, i % 10))   # exact duplicate
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    df.createOrReplaceTempView("embeddings")
    out = {r["vec_id"]: r["kept_id"] for r in spark.sql(_q102(SPARK)).collect()}
    for i in range(20):
        assert out.get(2 * i + 1) == 2 * i  # the dup names its original


def test_q103_dup_chunks_consistent_with_q100(spark, sf_dir):
    """q103's duplicated fingerprints are exactly the q100 fingerprints
    with multiplicity > 1, and each keeper is the lexicographically first
    (doc, chunk) carrying it."""
    chunks = registry()["q100_doc_chunking"].build(spark, sf_dir).collect()
    mult: dict[str, list] = {}
    for r in chunks:
        mult.setdefault(r["fingerprint"], []).append((r["doc_id"], r["chunk_idx"]))
    dups = registry()["q103_chunk_dedup"].build(spark, sf_dir).collect()
    want = {fp: sorted(v) for fp, v in mult.items() if len(v) > 1}
    assert {r["fingerprint"] for r in dups} == set(want)
    for r in dups:
        locs = want[r["fingerprint"]]
        assert r["n_copies"] == len(locs)
        assert (r["keep_doc_id"], r["keep_chunk_idx"]) == locs[0]
