"""Range-join catalog query: events matched into variable-width value bands
(a genuine interval table — geometric widths, so plain width-bucketing can't
express it) through the grid-bucketed range join in operators/rangejoin.py.
Oracle: DuckDB's native inequality join — an independent implementation of
the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from music_recommendation_service_spark.functions import rnd, rnd_sql
from music_recommendation_service_spark.operators.rangejoin import range_join
from music_recommendation_service_spark.plans import register
from music_recommendation_service_spark.sources.catalog import load_table as _t

# Geometric bands: lo_i = 5*(2^i - 1); covers value in [0, 635).
BANDS = [(i, 5.0 * (2**i - 1), 5.0 * (2 ** (i + 1) - 1)) for i in range(7)]

_BANDS_SQL = ", ".join(f"({i}, {lo!r}, {hi!r})" for i, lo, hi in BANDS)


@register(
    "q49_range_join_bands",
    oracle=f"""
    SELECT b.band_id,
           CAST(b.lo AS DOUBLE) AS lo,
           CAST(b.hi AS DOUBLE) AS hi,
           CAST(count(*) AS BIGINT)   AS n_events,
           {rnd_sql("sum(e.value)", 2)} AS total_value
    FROM events e
    JOIN (VALUES {_BANDS_SQL}) AS b(band_id, lo, hi)
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band_id, b.lo, b.hi
    """,
    doc="Point-in-interval range join (grid-bucketed equi plan vs DuckDB's "
    "native inequality join) into variable-width value bands.",
    tags=("range-join", "join"),
)
def q49_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    bands = spark.createDataFrame(BANDS, ["band_id", "lo", "hi"])
    joined = range_join(e, bands, point="value", lo="lo", hi="hi", bucket_width=20.0)
    return joined.groupBy("band_id", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n_events"),
        rnd(F.sum("value"), 2).alias("total_value"),
    )
