"""Misra-Gries heavy hitters (operators/heavyhitters.py): the guarantees
that make the two-pass plan EXACT, driven adversarially by hypothesis
against a pure-Python exact counter.

- Superset guarantee: every item with freq > n/k appears among the MG
  candidates, for ANY partitioning of the stream (pigeonhole + the MG
  survivor bound). Checked at the pure-Python level across random streams
  and fold orders, and end-to-end through Spark at several partitionings.
- State bound: a summary never holds more than k counters.
- Exactness: the operator's output equals the brute-force groupBy answer
  (the sketch only proposes; the verify pass decides).
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from music_recommendation_service_spark.operators.heavyhitters import (
    _mg_fold,
    heavy_hitters,
)

_streams = st.lists(st.integers(0, 30), min_size=1, max_size=400)


@given(stream=_streams, k=st.integers(2, 8))
@settings(max_examples=200, deadline=None)
def test_mg_superset_guarantee_pure(stream, k):
    counters: dict = {}
    for item in stream:
        _mg_fold(counters, item, 1, k)
    assert len(counters) <= k
    n = len(stream)
    exact = Counter(stream)
    for item, c in exact.items():
        if c * k > n:
            assert item in counters, (item, c, n, k)


@given(stream=_streams, k=st.integers(2, 8), cut=st.integers(1, 399))
@settings(max_examples=100, deadline=None)
def test_mg_partitioned_union_superset_pure(stream, k, cut):
    """Split the stream at an arbitrary point into two 'partitions': the
    UNION of the two summaries' survivors still covers every global heavy
    hitter — the distributed argument in miniature."""
    cut = min(cut, len(stream))
    survivors: set = set()
    for part in (stream[:cut], stream[cut:]):
        counters: dict = {}
        for item in part:
            _mg_fold(counters, item, 1, k)
        survivors |= set(counters)
    n = len(stream)
    for item, c in Counter(stream).items():
        if c * k > n:
            assert item in survivors


@pytest.mark.parametrize("parts", [1, 3, 32])
def test_heavy_hitters_exact_through_spark(spark, parts):
    # zipf-ish synthetic: item i appears ~ (40 - i) times
    rows = [(f"w{i:02d}",) for i in range(40) for _ in range(40 - i)]
    df = spark.createDataFrame(rows, ["t"]).repartition(parts)
    got = {(r.item, r.freq) for r in heavy_hitters(df, "t", 25).collect()}
    n = len(rows)
    exact = Counter(r[0] for r in rows)
    want = {(w, c) for w, c in exact.items() if c * 25 > n}
    assert got == want
    assert got  # non-trivial case


def test_heavy_hitters_ignores_nulls_and_empty(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",)], ["t"]
    )
    got = {(r.item, r.freq) for r in heavy_hitters(df, "t", 2).collect()}
    # n = 3 non-null; a appears 2 > 3/2
    assert got == {("a", 2)}
    empty = spark.createDataFrame([], "t string")
    assert heavy_hitters(empty, "t", 5).count() == 0
