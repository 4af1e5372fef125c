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


def _delta_jars_available() -> bool:
    """True only when BOTH the delta-spark Python package and the Delta JVM
    jars are present. The reference pins the jars via
    ``spark.jars.packages`` (``spark_utils.py``); offline we can only use
    what is already on disk, so probe pyspark's bundled jars dir plus an
    optional override dir instead of trusting ``import delta``."""
    try:
        import delta  # noqa: F401
    except Exception:
        return False
    import glob

    dirs = []
    extra = os.environ.get("SPARK_GRAFT_DELTA_JARS", "").strip()
    if extra:
        dirs.append(extra)
    try:
        import pyspark

        dirs.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except Exception:
        pass
    for d in dirs:
        if glob.glob(os.path.join(d, "delta-spark*.jar")) or glob.glob(
            os.path.join(d, "delta-core*.jar")
        ):
            return True
    return False


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
    if _delta_jars_available():
        # Delta session wiring (reference parity: ``spark_utils.py:33-37``
        # configures the same two settings). The pip ``delta-spark`` package
        # alone is NOT enough — it ships no JVM jars, and setting the
        # DeltaCatalog without them turns every catalog-touching operation
        # into a runtime ClassNotFoundException. Wire Delta only when the
        # jars are actually on the classpath (pyspark's jars dir or an
        # explicit SPARK_GRAFT_DELTA_JARS dir); on plain-parquet
        # environments the engine's snapshot protocol
        # (sources/snapshots.py) supplies the transactional layer.
        builder = builder.config(
            "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
        ).config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try:
        # format("snapshot") everywhere the engine session reaches
        # (sources/datasource.py). Guarded: the Python DataSource API
        # needs PySpark >= 4.
        from music_recommendation_service_spark.sources.datasource import (
            register_snapshot_datasource,
        )

        register_snapshot_datasource(spark)
    except Exception:
        pass
    return spark
