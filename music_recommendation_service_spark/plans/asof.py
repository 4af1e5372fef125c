"""As-of join catalog query: every event picks up the customer's most
recent order at-or-before the event time (backward inclusive, left-outer).
The right side is first reduced to one row per (customer, order-ts) so the
match is deterministic in both engines.

Oracle: DuckDB's native ``ASOF LEFT JOIN`` — an independent implementation
of the same semantics, so this cross-checks the union-window plan in
operators/asof.py rather than restating it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from music_recommendation_service_spark.operators.asof import asof_join
from music_recommendation_service_spark.plans import register
from music_recommendation_service_spark.sources.catalog import load_table as _t


@register(
    "q37_asof_last_order",
    oracle="""
    WITH odedup AS (
        SELECT o_custkey, o_orderdate, max(o_totalprice) AS last_order_price
        FROM orders
        GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id,
           e.user_id,
           e.ts,
           o.o_orderdate       AS last_order_ts,
           o.last_order_price
    FROM events e
    ASOF LEFT JOIN odedup o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    doc="Backward as-of join: most recent order per customer at each event "
    "(single-shuffle union-window plan; oracle is DuckDB's native ASOF).",
    tags=("asof", "join"),
)
def q37_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("order_ts"),
        )
        .agg(F.max("o_totalprice").alias("last_order_price"))
    )
    joined = asof_join(
        events,
        orders,
        on="user_id",
        left_ts="ts",
        right_ts="order_ts",
        right_payload=("order_ts", "last_order_price"),
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("order_ts").alias("last_order_ts"),
        "last_order_price",
    )
