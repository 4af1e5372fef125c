"""Scalar/column helper expressions shared by the query catalog.

All helpers are built-in pyspark.sql.functions compositions (JVM-side,
whole-stage-codegen friendly) with an exact DuckDB-SQL twin, so catalog
queries and their oracles stay value-identical across engines.
"""

from music_recommendation_service_spark.functions.portable import rnd, rnd_sql

__all__ = ["rnd", "rnd_sql"]
