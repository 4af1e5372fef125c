"""End-to-end pipeline runner: the reference's FIVE Airflow-orchestrated
jobs (SURVEY.md §3.1) as one dependency-ordered program over a medallion
lake layout.

    raw events (+ dims) ──> bronze/fact_listening_events  (partitioned, gated)
    bronze ──> silver/weekly_trending_tracks              (trending job)
    bridge ──> silver/song_similarity_by_playlist         (similarity job)
    bronze ──> silver/song_collaborative_filtering        (CF job)
    bronze + similarity ──> silver/likes_analysis         (analysis job)
    everything ──> gold/hybrid_recommendations            (serving scorer)

The reference splits these across five spark-submits with Airflow edges;
on Spark the dependency order IS the dataflow, so one driver program runs
the whole DAG and each materialized layer gets real file statistics for
the next job's planning (the same scratch-materialize reasoning as q05,
promoted to named lake tables). Any external scheduler can still run
stages separately — every function consumed here is independently
importable (plans/music_domain.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from music_recommendation_service_spark.plans.music_domain import (
    bronze_ingest,
    collaborative_filtering,
    hybrid_recommendations,
    likes_analysis,
    silver_weekly_trending,
    song_similarity,
)
from music_recommendation_service_spark.sources.writers import (
    write_partitioned,
    write_table,
)

# Source table names expected in the source directory (FIXTURES.md §1-§6 —
# the reference's bronze layout, process_historical_data.py:17-55).
SOURCE_TABLES = (
    "fact_listening_events",
    "dim_songs",
    "dim_users",
    "dim_playlists",
    "bridge_playlist_tracks",
    "graph_user_follows",
)


def run_full_pipeline(
    spark: SparkSession,
    source_dir: str,
    lake_dir: str,
    anchor: str,
    k: int = 5,
    validate: bool = True,
    metrics: dict | None = None,
) -> dict[str, str]:
    """Run all five pipelines source -> bronze -> silver -> gold.

    ``anchor`` parameterizes the reference's ``current_date() - 7`` window
    (SURVEY.md §7.3d) so runs are reproducible. Returns table -> path.

    Pass a dict as ``metrics`` to receive observed bronze ingest metrics
    (row count, key null counts) measured DURING the write job via
    ``df.observe`` — zero extra scans, the one-pass monitoring pattern that
    replaces a separate metrics query at 100 TB. (The quality gate's
    correctness checks still run their own single-pass aggregate because
    they must be able to FAIL the job before anything lands.)
    """
    src = {t: spark.read.parquet(f"{source_dir}/{t}.parquet") for t in SOURCE_TABLES}
    out: dict[str, str] = {}

    def land(name: str, df: DataFrame, partition_cols: tuple[str, ...] = ()) -> DataFrame:
        path = f"{lake_dir}/{name}"
        if partition_cols:
            write_partitioned(df, path, *partition_cols)
        else:
            write_table(df, path)
        out[name] = path
        return spark.read.parquet(path)

    # Bronze: derived partition columns + quality gate, partitioned write
    # (process_historical_data.py:70-78). Dims land as-is (S4).
    bronze_df = bronze_ingest(src["fact_listening_events"], validate=validate)
    obs = None
    if metrics is not None:
        from pyspark.sql import Observation

        obs = Observation("bronze_ingest")
        bronze_df = bronze_df.observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0)).alias(
                "null_user_id"
            ),
            F.sum(F.when(F.col("track_id").isNull(), 1).otherwise(0)).alias(
                "null_track_id"
            ),
            F.min("event_date").alias("first_day"),
            F.max("event_date").alias("last_day"),
        )
    bronze = land("bronze/fact_listening_events", bronze_df, ("year", "month"))
    if obs is not None:
        metrics.update(obs.get)
    for dim in ("dim_songs", "dim_users", "dim_playlists", "graph_user_follows"):
        land(f"bronze/{dim}", src[dim])

    # Silver: the four analytical jobs, each reading materialized bronze.
    trending = land(
        "silver/weekly_trending_tracks",
        silver_weekly_trending(bronze, src["dim_songs"], anchor),
    )
    similarity = land(
        "silver/song_similarity_by_playlist",
        song_similarity(src["bridge_playlist_tracks"]),
    )
    cf = land(
        "silver/song_collaborative_filtering",
        collaborative_filtering(bronze),
    )
    land("silver/likes_analysis", likes_analysis(bronze, similarity))

    # Gold: the serving scorer over the materialized silver layer.
    land(
        "gold/hybrid_recommendations",
        hybrid_recommendations(
            bronze,
            similarity,
            cf,
            src["graph_user_follows"],
            trending.select("track_id", "listen_count"),
            k=k,
        ),
    )
    return out
