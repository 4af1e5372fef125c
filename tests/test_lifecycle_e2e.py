"""SURVEY §3.1 lifecycle E2E: CSV landing zone -> declared-schema scan ->
bronze (derived partitions + quality gate) -> partitioned lake write ->
pruned read-back -> silver trending — the Airflow DAG path as one test."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from music_recommendation_service_spark.plans.music_domain import (
    bronze_ingest,
    silver_weekly_trending,
)
from music_recommendation_service_spark.sources.catalog import Catalog
from music_recommendation_service_spark.sources.writers import write_partitioned

CSV_SCHEMA = StructType(
    [
        StructField("event_id", StringType(), False),
        StructField("user_id", LongType(), False),
        StructField("track_id", LongType(), False),
        StructField("event_type", StringType()),
        StructField("timestamp", TimestampType()),
    ]
)


def test_csv_to_bronze_to_silver(spark, tmp_path):
    from tests.music_fixtures import build_fixtures

    fixture_dir = tmp_path / "fx"
    fixture_dir.mkdir()
    paths = build_fixtures(str(fixture_dir))
    events = spark.read.parquet(paths["fact_listening_events"])
    songs = spark.read.parquet(paths["dim_songs"])

    # 1. land as CSV (the reference's landing zone, header row, ISO ts)
    landing = str(tmp_path / "landing")
    events.withColumn(
        "timestamp", F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss")
    ).write.option("header", True).csv(landing)

    # 2. declared-schema CSV scan (S1) -> bronze with gate + partitions
    raw = Catalog(spark, landing).csv(landing, CSV_SCHEMA)
    bronze = bronze_ingest(raw)

    # 3. partitioned bronze write (S5) + pruned read-back
    bronze_path = str(tmp_path / "bronze")
    write_partitioned(bronze, bronze_path, "year", "month")
    back = spark.read.parquet(bronze_path)
    assert back.count() == events.count()
    feb = back.filter("year = 2024 AND month = 2")
    assert feb.count() == bronze.filter("month = 2").count()
    assert feb.count() > 0  # fixtures span the month boundary

    # 4. silver trending over the lake table == over the in-memory frame
    got = {
        (r["track_id"], r["listen_count"])
        for r in silver_weekly_trending(back, songs, "2024-02-08").collect()
    }
    want = {
        (r["track_id"], r["listen_count"])
        for r in silver_weekly_trending(
            bronze_ingest(events), songs, "2024-02-08"
        ).collect()
    }
    assert got == want and len(got) > 0
