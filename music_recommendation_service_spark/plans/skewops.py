"""Skew-mitigation queries: the salting operators as oracle-checked catalog
entries. The DuckDB twins are the PLAIN (unsalted) group-by / join — hash
parity proves the salted rewrites are exact, not approximations.

Scale shape (SURVEY.md §4.2's skew hazard made executable):
- q89: two-phase salted aggregation — the hot key's combine reads
  ``n_salts`` partial rows, not every raw row.
- q90: fact ⋈ mid-size-dim with the dim replicated per salt — a hot order
  key spreads over ``n_salts`` reducers. Join stays equi on (key, salt),
  so Catalyst plans an ordinary shuffled hash/sort-merge join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from music_recommendation_service_spark.functions import rnd, rnd_sql
from music_recommendation_service_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)
from music_recommendation_service_spark.plans import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from music_recommendation_service_spark.sources.catalog import load_table

    return load_table(spark, sf_dir, name)


@register(
    "q89_salted_agg",
    oracle=f"""
    SELECT l_suppkey,
           CAST(count(*) AS BIGINT)                 AS n_items,
           {rnd_sql('sum(l_quantity)', 6)}          AS sum_qty,
           min(l_extendedprice)                     AS min_price,
           max(l_extendedprice)                     AS max_price
    FROM lineitem
    GROUP BY l_suppkey
    """,
    doc="Two-phase salted aggregation over lineitem by supplier — exact "
    "parity with the plain GROUP BY (operators/skew.py::salted_aggregate).",
    tags=("skew", "salting", "aggregate"),
)
def q89_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    out = salted_aggregate(
        li,
        ["l_suppkey"],
        [
            ("n_items", "*", "count"),
            ("sum_qty", "l_quantity", "sum"),
            ("min_price", "l_extendedprice", "min"),
            ("max_price", "l_extendedprice", "max"),
        ],
        n_salts=16,
    )
    return out.select(
        "l_suppkey",
        "n_items",
        rnd(F.col("sum_qty"), 6).alias("sum_qty"),
        "min_price",
        "max_price",
    )


@register(
    "q90_salted_join",
    oracle=f"""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT)             AS n_items,
           {rnd_sql('sum(l.l_extendedprice)', 6)} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc="Salted fact⋈dim equi-join (dim replicated per salt) aggregated to "
    "priority revenue — exact parity with the plain join "
    "(operators/skew.py::salted_join).",
    tags=("skew", "salting", "join"),
)
def q90_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, ["l_orderkey"], n_salts=16)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        rnd(F.sum("l_extendedprice"), 6).alias("revenue"),
    )
