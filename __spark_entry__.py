"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()``
exposes the engine's named query catalog
(music_recommendation_service_spark.plans); ``oracle_sql()`` gives each
query's DuckDB twin for the correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession

from music_recommendation_service_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (hybrid recommender) on /root/testdata/sf0.001."""
    return registry()["q05_hybrid_recommendations"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
