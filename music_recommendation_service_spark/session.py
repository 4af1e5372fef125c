"""SparkSession factory.

Replaces the reference's session bootstrap (``pyspark_jobs/spark_utils.py:20-39``
builds a session against a standalone master with Delta + S3A config). Here the
session is cluster-agnostic: master/shuffle-partitions come from the
environment so the same code runs on local[32] in tests and on a large cluster
unchanged.

Scale notes
-----------
- AQE on: runtime partition coalescing, skew-join splitting, and dynamic
  join-strategy switching are the first line of defense at 100 TB.
- ``spark.sql.shuffle.partitions`` defaults to an env-provided core count
  locally; on a real cluster leave it to AQE's coalescing from a high initial
  value (set SPARK_GRAFT_SHUFFLE_PARTITIONS).
- Arrow enabled for the Pandas-UDF slow path (vectorized batches, not rows).
- Session timezone pinned UTC so date/timestamp semantics are deterministic
  across engines (the DuckDB oracle also runs in UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, "") or default)
    except ValueError:
        return default


def get_spark(app_name: str = "music_recommendation_service_spark") -> SparkSession:
    """Build (or reuse) the engine session.

    Environment overrides:
      SPARK_GRAFT_MASTER  — master URL (default ``local[N]`` with
                            N = SPARK_GRAFT_CPUS or ``*``).
      SPARK_GRAFT_CPUS    — local core count, also used for shuffle
                            partition sizing in local mode.
      SPARK_GRAFT_SHUFFLE_PARTITIONS — explicit shuffle partition count.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "").strip()
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus or '*'}]")
    shuffle = _env_int(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", int(cpus) if cpus.isdigit() else 32
    )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # TESTDATA parquet carries TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long nanos and convert in the catalog
        # (values are microsecond-aligned, so no precision is lost).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    try:
        # Delta session wiring (reference parity: ``spark_utils.py:33-37``
        # configures the same two settings). Only when delta-spark is
        # importable — on plain-parquet environments the engine's snapshot
        # protocol (sources/snapshots.py) supplies the transactional layer.
        import delta  # noqa: F401

        builder = builder.config(
            "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
        ).config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    except Exception:
        pass
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
