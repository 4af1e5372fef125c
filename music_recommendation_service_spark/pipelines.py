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


def _ledger_done_df(
    spark: SparkSession, ledger_path: str, names_df: DataFrame
) -> DataFrame:
    """Which of ``names_df.file_name`` are already in the ingest ledger?
    A distributed semi-join that BROADCASTS the small landing listing and
    scans the (unboundedly growing) ledger executor-side — the driver only
    ever receives the intersection, never the full ledger."""
    from music_recommendation_service_spark.sources.snapshots import snapshot_read

    return (
        snapshot_read(spark, ledger_path)
        .select("file_name")
        .join(F.broadcast(names_df), "file_name", "semi")
    )


def incremental_file_ingest(
    spark: SparkSession,
    landing_dir: str,
    bronze_path: str,
    ledger_path: str,
    suffix: str = ".parquet",
    reader=None,
    transform=None,
) -> list[str]:
    """Incremental landing-zone batch ingest with a processed-file ledger —
    the reference's weekly-trends DAG dedup
    (``airflow_dags/dag_weekly_trends_ingestion.py:31-65``: an Airflow
    Variable holding the processed-file list, new files fanned out per run)
    re-realized crash-safely on the snapshot protocol.

    Re-running over an overlapping file set ingests each file EXACTLY once:

    1. reconcile: the bronze table's latest manifest carries
       ``pending_files`` — files whose rows committed to bronze but whose
       ledger merge may not have landed (the crash window the Airflow
       Variable pattern leaves open). Merge them into the ledger first
       (keyed merge: idempotent).
    2. list ``landing_dir`` for ``suffix`` files not in the ledger.
    3. append their rows to bronze in ONE job (all new files in a single
       ``spark.read`` — per-file fan-out like the DAG's dynamic tasks
       would schedule O(files) jobs at 100 TB), recording the batch as
       ``pending_files`` in the bronze manifest (same atomic commit as the
       data).
    4. merge the batch into the ledger.

    A crash between 3 and 4 is healed by the next run's step 1; a crash
    inside 3 leaves no committed manifest, so the batch simply re-runs.
    Rows gain a ``_src_file`` lineage column. ``reader`` overrides the
    default parquet reader (e.g. CSV with a declared schema — the
    reference lands CSVs); ``transform`` maps the batch DataFrame before
    landing (derived columns, quality gate). Returns the file names
    ingested this run.
    """
    import os as _os

    from music_recommendation_service_spark.sources.snapshots import (
        _latest_manifest,
        snapshot_append,
        snapshot_merge,
        snapshot_versions,
        snapshot_write,
    )

    def ledger_merge(names: list[str]) -> None:
        if not names:
            return
        batch = spark.createDataFrame(
            [(n, 1) for n in sorted(names)], ["file_name", "seq"]
        )
        snapshot_merge(batch, ledger_path, key_cols=["file_name"], seq_col="seq")

    # 1. reconcile a possibly-crashed previous run
    if snapshot_versions(bronze_path):
        pending = _latest_manifest(bronze_path).get("pending_files", [])
        ledger_merge(list(pending))

    # 2. the new files (names are the ledger key, as in the DAG). The
    # ledger is never collect()ed — it grows O(every file ever ingested),
    # a driver bottleneck at millions of landed files. Instead the landing
    # listing (O(current dir)) probes the ledger via a distributed
    # broadcast SEMI-join; only the already-done intersection (≤ the
    # listing, never the ledger) comes back to the driver.
    all_names = sorted(
        f for f in _os.listdir(landing_dir) if f.endswith(suffix)
    )
    listing = all_names
    if all_names and snapshot_versions(ledger_path):
        names_df = spark.createDataFrame(
            [(n,) for n in all_names], ["file_name"]
        )
        done = {
            r["file_name"]
            for r in _ledger_done_df(spark, ledger_path, names_df).collect()
        }
        listing = [n for n in all_names if n not in done]
    if not listing:
        return []

    # 3. one read over all new files; lineage column via input_file_name
    paths = [_os.path.join(landing_dir, f) for f in listing]
    batch = (
        reader(spark, paths) if reader is not None else spark.read.parquet(*paths)
    )
    batch = batch.withColumn(
        "_src_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    if transform is not None:
        batch = transform(batch)
    extra = {"pending_files": listing}
    if snapshot_versions(bronze_path):
        snapshot_append(batch, bronze_path, manifest_extra=extra)
    else:
        snapshot_write(batch, bronze_path, manifest_extra=extra)

    # 4. ledger commit
    ledger_merge(listing)
    return listing


def incremental_dedup_ingest(
    batch: DataFrame,
    store_path: str,
    index_path: str,
    cursor_path: str,
    id_col: str = "doc_id",
    content_col: str = "text",
    fp_col: str = "fp",
    lake_root: str | None = None,
) -> int:
    """Dedup-on-ingest against a CDF-maintained fingerprint index: land
    only first-seen content, O(batch) per wave, never an O(corpus)
    rescan — the ingest front door of a 100 TB training-data store.

    Per wave:
      1. fingerprint the batch (16-hex md5 of ``content_col``) and dedup
         WITHIN it (smallest ``id_col`` per fingerprint wins);
      2. anti-join the batch against the INDEX VIEW (an aggregate over
         fingerprints — O(distinct corpus content), far smaller than the
         store, and broadcast-friendly at micro-batch sizes);
      3. keyed-merge survivors into the document snapshot at
         ``store_path``;
      4. fold the store's change feed into the index via
         ``snapshot_maintain_aggregate`` (count + min id per
         fingerprint), advancing ``cursor_path``.

    Returns the number of rows actually landed. Crash-safe by
    construction: every step is an idempotent snapshot-protocol commit
    (replaying a wave re-lands nothing, and the maintainer's
    view-recorded source_version makes the index fold exactly-once).

    With ``lake_root``, the wave ends by PUBLISHING one atomic multi-table
    lake commit (sources/multicommit.py) pinning the store and index
    versions that belong together — readers resolving through
    ``lake_read`` can never observe the store advanced with the index
    stale, even if a crash lands between the two table commits (the
    publish is the last step; an unpublished wave is invisible and the
    re-run converges then publishes).
    """
    from pyspark.sql import Window

    from music_recommendation_service_spark.sources.snapshots import (
        snapshot_maintain_aggregate,
        snapshot_merge,
        snapshot_read,
        snapshot_versions,
    )

    spark = batch.sparkSession
    keyed = batch.withColumn(fp_col, F.substring(F.md5(F.col(content_col)), 1, 16))
    w = Window.partitionBy(fp_col)
    keyed = (
        keyed.withColumn("_keep", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("_keep"))
        .drop("_keep")
    )
    if snapshot_versions(index_path):
        index = snapshot_read(spark, index_path).select(fp_col)
        # the equi-key floats to the front after the join; pin the stored
        # column order so every wave presents the same schema to the store
        keyed = keyed.join(index, fp_col, "anti")
    landed = keyed.select(*batch.columns, fp_col).persist()
    n = landed.count()
    if n:
        snapshot_merge(
            landed, store_path, key_cols=[id_col], seq_col=id_col
        )
    if snapshot_versions(store_path):
        snapshot_maintain_aggregate(
            spark,
            store_path,
            index_path,
            cursor_path,
            group_cols=[fp_col],
            key_cols=[id_col],
            minmax_cols=[id_col],
        )
    if lake_root is not None and snapshot_versions(store_path):
        import os

        from music_recommendation_service_spark.sources.multicommit import (
            lake_commit,
        )

        lake_commit(
            lake_root,
            {
                os.path.relpath(store_path, lake_root):
                    snapshot_versions(store_path)[-1],
                os.path.relpath(index_path, lake_root):
                    snapshot_versions(index_path)[-1],
            },
        )
    landed.unpersist()
    return n
