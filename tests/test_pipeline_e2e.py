"""Full medallion pipeline E2E: all five reference jobs in dependency order
over the seeded music fixtures, materialized to a lake directory."""

from __future__ import annotations

from pyspark.sql import functions as F

from music_recommendation_service_spark.pipelines import run_full_pipeline
from music_recommendation_service_spark.plans.music_domain import (
    bronze_ingest,
    silver_weekly_trending,
)

ANCHOR = "2024-02-08"


def test_full_pipeline(spark, tmp_path):
    from tests.music_fixtures import build_fixtures

    src = tmp_path / "src"
    src.mkdir()
    build_fixtures(str(src))
    lake = str(tmp_path / "lake")

    paths = run_full_pipeline(spark, str(src), lake, ANCHOR)
    assert set(paths) == {
        "bronze/fact_listening_events",
        "bronze/dim_songs",
        "bronze/dim_users",
        "bronze/dim_playlists",
        "bronze/graph_user_follows",
        "silver/weekly_trending_tracks",
        "silver/song_similarity_by_playlist",
        "silver/song_collaborative_filtering",
        "silver/likes_analysis",
        "gold/hybrid_recommendations",
    }

    # Bronze is partitioned by year/month and complete.
    events = spark.read.parquet(f"{src}/fact_listening_events.parquet")
    bronze = spark.read.parquet(paths["bronze/fact_listening_events"])
    assert bronze.count() == events.count()
    assert {"year", "month"} <= set(bronze.columns)

    # Silver trending equals the directly-computed silver table.
    direct = silver_weekly_trending(
        bronze_ingest(events),
        spark.read.parquet(f"{src}/dim_songs.parquet"),
        ANCHOR,
    )
    got = spark.read.parquet(paths["silver/weekly_trending_tracks"])
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in direct.collect()}

    # Gold: at most k recos per user, never an already-liked track.
    gold = spark.read.parquet(paths["gold/hybrid_recommendations"])
    per_user = gold.groupBy("user_id").count()
    assert per_user.agg(F.max("count")).first()[0] <= 5
    likes = (
        bronze.filter(F.col("event_type") == "like")
        .select("user_id", "track_id")
        .distinct()
    )
    assert gold.join(likes, ["user_id", "track_id"], "inner").count() == 0


def test_pipeline_observed_metrics(spark, tmp_path):
    """df.observe metrics ride the bronze write job — no extra scan — and
    must agree with directly-computed values."""
    from tests.music_fixtures import build_fixtures

    src = tmp_path / "src2"
    src.mkdir()
    build_fixtures(str(src))
    lake = str(tmp_path / "lake2")

    metrics: dict = {}
    run_full_pipeline(spark, str(src), lake, ANCHOR, metrics=metrics)
    events = spark.read.parquet(f"{src}/fact_listening_events.parquet")
    assert metrics["rows"] == events.count()
    assert metrics["null_user_id"] == 0 and metrics["null_track_id"] == 0
    lo, hi = events.select(
        F.min(F.to_date("timestamp")), F.max(F.to_date("timestamp"))
    ).first()
    assert (metrics["first_day"], metrics["last_day"]) == (lo, hi)
