"""Edge-case unit tests for the as-of join operator (the catalog query
q37 cross-checks it against DuckDB's native ASOF JOIN at corpus scale)."""

from __future__ import annotations

import datetime as dt

from music_recommendation_service_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_basic_no_match_and_tie(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00")),  # between r1 and r2
            (2, 10, _ts("2024-01-01T12:00:00")),  # exactly at r2 (inclusive)
            (3, 10, _ts("2023-12-31T00:00:00")),  # before all -> null
            (4, 99, _ts("2024-01-01T10:00:00")),  # key with no right rows
        ],
        ["event_id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T09:00:00"), 1.0, "a"),
            (10, _ts("2024-01-01T12:00:00"), 2.0, None),  # null payload col
        ],
        ["k", "rts", "price", "tag"],
    )
    out = {
        r["event_id"]: (r["price"], r["tag"])
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_payload=("price", "tag"),
        ).collect()
    }
    assert out[1] == (1.0, "a")
    # inclusive: the row AT the left timestamp wins, and its null tag must
    # NOT be backfilled from the earlier row (struct carry, not per-column)
    assert out[2] == (2.0, None)
    assert out[3] == (None, None)
    assert out[4] == (None, None)


def test_asof_row_count_preserved(spark, sf_dir):
    from music_recommendation_service_spark.plans import registry

    q = registry()["q37_asof_last_order"]
    df = q.build(spark, sf_dir)
    from music_recommendation_service_spark.sources.catalog import load_table

    assert df.count() == load_table(spark, sf_dir, "events").count()
