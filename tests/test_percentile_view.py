"""Maintained-percentile-view E2E: streaming ingest waves -> keyed MERGE
into a snapshot -> snapshot_maintain_aggregate(histogram_cols) folds the
CDF into per-group fixed-bin histograms -> histogram_quantile serves
percentiles that match a full recompute EXACTLY after every wave — the
latency dashboard shape at 100 TB, where per-wave cost must be O(changed
rows), not O(history). Deletes (GDPR-style DML) retract from the
histogram exactly; replaying a landing file is a content no-op."""

from __future__ import annotations

import json as _json

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

LO, HI, NB = 0.0, 100.0, 10


def _recomputed_p50(spark, S, store):
    hb = S._hist_bin("latency", LO, HI, NB)
    return {
        r["svc"]: r["p50"]
        for r in S.snapshot_read(spark, store)
        .withColumn("_hb", hb)
        .groupBy("svc")
        .agg(
            F.array(
                *[
                    F.sum(F.when(F.col("_hb") == i, 1).otherwise(0)).cast("long")
                    for i in range(NB + 2)
                ]
            ).alias("h")
        )
        .select("svc", S.histogram_quantile("h", 0.5, LO, HI, NB).alias("p50"))
        .collect()
    }


def _maintained_p50(spark, S, view):
    return {
        r["svc"]: r["p50"]
        for r in S.snapshot_read(spark, view)
        .select(
            "svc",
            S.histogram_quantile("hist_latency", 0.5, LO, HI, NB).alias("p50"),
        )
        .collect()
    }


def test_streaming_percentile_view_front_door(spark, tmp_path):
    from music_recommendation_service_spark.sources import snapshots as S
    from music_recommendation_service_spark.streaming.pipeline import (
        stream_from_directory,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    store = str(tmp_path / "events")
    view = str(tmp_path / "lat_view")
    cursor = str(tmp_path / "lat_cursor")
    ckpt = str(tmp_path / "ckpt")
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("svc", StringType()),
            StructField("latency", DoubleType()),
            StructField("seq", LongType()),
        ]
    )

    def drop(name, rows):
        with open(landing / name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    def ingest(batch, _id):
        if not batch.take(1):
            return
        S.snapshot_merge(batch, store, key_cols=["event_id"], seq_col="seq")
        S.snapshot_maintain_aggregate(
            spark, store, view, cursor,
            group_cols=["svc"], key_cols=["event_id"],
            histogram_cols=[("latency", LO, HI, NB)],
        )

    def run_stream():
        q = (
            stream_from_directory(spark, str(landing), schema)
            .writeStream.option("checkpointLocation", ckpt)
            .foreachBatch(ingest)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # wave 1: two services
    drop("w1.json", [
        {"event_id": i, "svc": "api" if i % 2 else "db",
         "latency": float(i % 90), "seq": 1}
        for i in range(40)
    ])
    run_stream()
    assert _maintained_p50(spark, S, view) == _recomputed_p50(spark, S, store)

    # wave 2:update some events (same key, higher seq, shifted latency) + new
    drop("w2.json", [
        {"event_id": i, "svc": "api" if i % 2 else "db",
         "latency": float((i * 7) % 100), "seq": 2}
        for i in range(20, 60)
    ])
    run_stream()
    assert _maintained_p50(spark, S, view) == _recomputed_p50(spark, S, store)

    # replay: same landing content under a new name is a content no-op
    # (merge seq ties resolve to identical rows; view version may advance).
    # Must run BEFORE the delete — a replay after it would legitimately
    # re-insert the deleted keys (their tombstones don't outrank a fresh
    # offer at the same seq), which is merge semantics, not a defect.
    before = _maintained_p50(spark, S, view)
    drop("w2_replay.json", [
        {"event_id": i, "svc": "api" if i % 2 else "db",
         "latency": float((i * 7) % 100), "seq": 2}
        for i in range(20, 60)
    ])
    run_stream()
    after = _maintained_p50(spark, S, view)
    assert after == before == _recomputed_p50(spark, S, store)

    # GDPR-style predicate delete retracts from the histogram exactly
    S.snapshot_delete_where(spark, store, "latency >= 80.0")
    S.snapshot_maintain_aggregate(
        spark, store, view, cursor,
        group_cols=["svc"], key_cols=["event_id"],
        histogram_cols=[("latency", LO, HI, NB)],
    )
    got = _maintained_p50(spark, S, view)
    assert got == _recomputed_p50(spark, S, store)
    # and the maintained histograms hold no mass at/above the deleted band
    for r in S.snapshot_read(spark, view).collect():
        assert sum(r["hist_latency"][9:]) == 0  # bins [80,100) + overflow
