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
