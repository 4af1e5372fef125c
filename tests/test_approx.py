"""Accuracy bounds for the sketch aggregates (q40): no cross-engine oracle
exists by design, so correctness is |approx - exact| within the sketch's
stated error."""

from __future__ import annotations

from pyspark.sql import functions as F

from music_recommendation_service_spark.plans import registry
from music_recommendation_service_spark.sources.catalog import load_table


def test_approx_within_bounds(spark, sf_dir):
    approx = {
        r["event_type"]: r
        for r in registry()["q40_approx_stats"].build(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r
        for r in e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, array(0.5, 0.95))").alias("pcts"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for t in exact:
        got, want = approx[t]["approx_users"], exact[t]["users"]
        assert abs(got - want) <= max(2, 0.05 * want), (t, got, want)
        for g, w in zip(
            (approx[t]["approx_p50"], approx[t]["approx_p95"]), exact[t]["pcts"]
        ):
            spread = abs(w) + 1.0
            assert abs(g - w) <= 0.1 * spread, (t, g, w)
