"""Quality-gate tests: passing suite chains through; each expectation kind
fails with a specific, complete failure list in one scan."""

from __future__ import annotations

import pytest

from music_recommendation_service_spark.operators.quality import (
    QualityGate,
    QualityGateError,
)
from music_recommendation_service_spark.sources.catalog import load_table


def test_gate_passes_and_chains(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    gate = QualityGate(
        expect_columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        not_null=("event_id", "user_id", "ts"),
        value_in_set={"event_type": ("view", "click", "purchase", "signup", "error")},
        unique=("event_id",),
    )
    out = gate.run(e)
    assert out is e  # chains unchanged


def test_gate_collects_all_failures(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    gate = QualityGate(
        expect_columns=["wrong"],
        value_in_set={"event_type": ("view",)},  # too narrow -> violations
        unique=("event_type",),  # not unique
    )
    with pytest.raises(QualityGateError) as err:
        gate.run(e)
    msgs = err.value.failures
    assert len(msgs) == 3
    assert any("columns" in m for m in msgs)
    assert any("value_in_set" in m for m in msgs)
    assert any("unique" in m for m in msgs)


def test_gate_null_detection(spark):
    df = spark.createDataFrame([(1, "a"), (None, "b")], ["id", "v"])
    with pytest.raises(QualityGateError, match="not_null"):
        QualityGate(not_null=("id",)).run(df)
