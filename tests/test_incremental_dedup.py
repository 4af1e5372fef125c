"""Incremental corpus dedup E2E: a fingerprint index maintained from the
document store's change feed dedups each ingest wave WITHOUT recomputing
the corpus index — the 100 TB shape, where "re-hash the whole corpus per
wave" is the thing you cannot afford.

Pipeline per wave (all engine primitives, zero ad-hoc state):
  1. the incoming batch is deduped WITHIN itself (keep min doc_id per
     fingerprint — q26's shape),
  2. batch fingerprints already present in the INDEX VIEW are dropped
     (anti-join against the view, which is O(|batch|) + an index lookup,
     never an O(|corpus|) scan),
  3. survivors merge into the keyed document snapshot,
  4. ``snapshot_maintain_aggregate`` folds the store's CDF into the index
     view (group by fingerprint; count + min doc_id) — cost O(changed
     rows).

Invariant checked after EVERY wave: the store contains exactly the docs a
batch-global dedup over everything ingested so far would keep (first
occurrence by doc_id per fingerprint), and the index view agrees with a
full recompute.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_incremental_dedup_by_maintained_fingerprint_index(spark, tmp_path):
    from music_recommendation_service_spark.pipelines import incremental_dedup_ingest
    from music_recommendation_service_spark.sources import snapshots as S

    store = str(tmp_path / "docs")
    view = str(tmp_path / "fp_index")
    cursor = str(tmp_path / "fp_cursor")

    waves = [
        # wave 1: internal dup (1 vs 3 share text)
        [(1, "alpha beta"), (2, "gamma"), (3, "alpha beta")],
        # wave 2: cross-wave dup (gamma again), one novel
        [(10, "gamma"), (11, "delta")],
        # wave 3: dup of wave-2 novel + internal dup + novel
        [(20, "delta"), (21, "epsilon"), (22, "epsilon"), (23, "zeta")],
    ]
    expected_landed = [2, 1, 2]

    seen = []  # ground truth: every row ever offered

    for rows, want_n in zip(waves, expected_landed):
        batch = spark.createDataFrame(rows, ["doc_id", "text"])
        seen.extend(rows)
        n = incremental_dedup_ingest(batch, store, view, cursor)
        assert n == want_n

        # --- invariants -------------------------------------------------
        truth_df = spark.createDataFrame(seen, ["doc_id", "text"]).withColumn(
            "fp", F.substring(F.md5("text"), 1, 16)
        )
        truth = {
            (r["fp"], r["keep"])
            for r in truth_df.groupBy("fp")
            .agg(F.min("doc_id").alias("keep"))
            .collect()
        }
        stored = {
            (r["fp"], r["doc_id"])
            for r in S.snapshot_read(spark, store).collect()
        }
        assert stored == truth  # store holds exactly the first-seen docs

        index_rows = {
            (r["fp"], r["n"], r["min_doc_id"])
            for r in S.snapshot_read(spark, view).collect()
        }
        want_index = {(fp, 1, keep) for fp, keep in truth}
        assert index_rows == want_index  # view == full recompute

    # the index never saw a duplicate insert, so every count is exactly 1
    assert all(n == 1 for _, n, _ in index_rows)


def test_streaming_dedup_ingest_front_door(spark, tmp_path):
    """The dedup front door as a STREAM: landing JSON waves ->
    foreachBatch(incremental_dedup_ingest) -> deduped document snapshot +
    maintained fingerprint index. Duplicate content across waves (and a
    full replay of the same landing file under a new name) lands exactly
    once; the store equals batch-global dedup ground truth."""
    import json as _json

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from music_recommendation_service_spark.pipelines import incremental_dedup_ingest
    from music_recommendation_service_spark.sources import snapshots as S
    from music_recommendation_service_spark.streaming.pipeline import (
        stream_from_directory,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    store = str(tmp_path / "docs")
    view = str(tmp_path / "fp_index")
    cursor = str(tmp_path / "fp_cursor")
    ckpt = str(tmp_path / "ckpt")
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )

    def drop(name, rows):
        with open(landing / name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    def run_stream():
        stream = stream_from_directory(spark, str(landing), schema)
        q = (
            stream.writeStream.option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda batch, _id: incremental_dedup_ingest(
                    batch, store, view, cursor
                )
                if batch.take(1)
                else None
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    seen = []
    w1 = [
        {"doc_id": 1, "text": "alpha"},
        {"doc_id": 2, "text": "beta"},
        {"doc_id": 3, "text": "alpha"},
    ]
    drop("w1.json", w1)
    seen += w1
    run_stream()

    w2 = [{"doc_id": 10, "text": "beta"}, {"doc_id": 11, "text": "gamma"}]
    drop("w2.json", w2)
    seen += w2
    # full replay of wave 1 under a new landing name (at-least-once
    # delivery upstream): content must not land twice
    drop("w1_replay.json", w1)
    seen += w1
    run_stream()

    truth_df = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in seen], ["doc_id", "text"]
    ).withColumn("fp", F.substring(F.md5("text"), 1, 16))
    truth = {
        (r["fp"], r["keep"])
        for r in truth_df.groupBy("fp").agg(F.min("doc_id").alias("keep")).collect()
    }
    stored = {
        (r["fp"], r["doc_id"]) for r in S.snapshot_read(spark, store).collect()
    }
    assert stored == truth
    index = {
        (r["fp"], r["n"], r["min_doc_id"])
        for r in S.snapshot_read(spark, view).collect()
    }
    assert index == {(fp, 1, keep) for fp, keep in truth}
