"""Dataset profiling — the describe/summarize pass every ingest pipeline
runs before trusting a new drop: per-column row/null/distinct counts,
numeric ranges, string ranges and mean lengths, date ranges.

Reference tie: the reference eyeballs its inputs with ad-hoc
``printSchema``/``show`` in the PySpark jobs (``process_historical_data
.py``) — this is that step as a first-class, oracle-checked relation.

Scale design: ONE scan of the table computes every aggregate — the
multi-``count(DISTINCT col)`` SELECT compiles to Spark's Expand strategy
(the scan is read once, expanded rows route each distinct aggregate to
its own hash slot, partials combine map-side). The per-column output rows
are constant projections over the materialized 1-ROW aggregate. The
materialization matters: Spark inlines WITH-CTEs, so without it each
UNION branch re-plans its own (column-pruned) scan+aggregate of the
table — measured as 6 separate scan pipelines on this 6-column profile.
Profiling N columns costs one table pass + an O(N x distinct) shuffle,
never N aggregation jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from music_recommendation_service_spark.functions.dialect import DUCK, SPARK
from music_recommendation_service_spark.plans import register

# (column, kind) — kind picks which aggregate family applies.
_EVENTS_COLS = [
    ("event_id", "num"),
    ("ts", "date"),
    ("user_id", "num"),
    ("event_type", "str"),
    ("value", "num"),
    ("props", "str"),
]


def profile_agg_sql(d: dict, table: str, cols: list) -> str:
    """The 1-row wide aggregate over ``table``: every per-column statistic
    in ONE SELECT (one scan; Spark plans the multi-distinct via Expand)."""
    str_t = "VARCHAR" if d["name"] == "duck" else "STRING"
    aggs = ["CAST(count(*) AS BIGINT) AS n"]
    for i, (c, kind) in enumerate(cols):
        aggs.append(f"CAST(count({c}) AS BIGINT) AS nn_{i}")
        aggs.append(f"CAST(count(DISTINCT {c}) AS BIGINT) AS nd_{i}")
        if kind == "num":
            aggs.append(f"round(CAST(min({c}) AS DOUBLE) + 1e-9, 6) AS mn_{i}")
            aggs.append(f"round(CAST(max({c}) AS DOUBLE) + 1e-9, 6) AS mx_{i}")
        elif kind == "str":
            aggs.append(f"min({c}) AS ms_{i}")
            aggs.append(f"max({c}) AS xs_{i}")
            aggs.append(f"round(avg(length({c})) + 1e-9, 6) AS al_{i}")
        elif kind == "date":
            # timestamps profile their DATE range: renders identically on
            # both engines (sub-second text formatting does not)
            aggs.append(f"CAST(CAST(min({c}) AS DATE) AS {str_t}) AS ms_{i}")
            aggs.append(f"CAST(CAST(max({c}) AS DATE) AS {str_t}) AS xs_{i}")
        else:
            raise ValueError(f"profile_agg_sql: unknown kind {kind!r} for {c}")
    return f"SELECT {', '.join(aggs)}\n    FROM {table}"


def profile_out_sql(d: dict, agg_src: str, cols: list) -> str:
    """Reshape the 1-row aggregate into one row per column: (col_name,
    kind, n, nulls, n_distinct, min_num, max_num, min_str, max_str,
    avg_len) — constant projections, no table re-scan."""
    str_t = "VARCHAR" if d["name"] == "duck" else "STRING"
    null_num = "CAST(NULL AS DOUBLE)"
    null_str = f"CAST(NULL AS {str_t})"
    outs = []
    for i, (c, kind) in enumerate(cols):
        outs.append(
            f"""SELECT '{c}' AS col_name, '{kind}' AS kind, n,
           n - nn_{i} AS nulls, nd_{i} AS n_distinct,
           {f"mn_{i}" if kind == "num" else null_num} AS min_num,
           {f"mx_{i}" if kind == "num" else null_num} AS max_num,
           {f"ms_{i}" if kind != "num" else null_str} AS min_str,
           {f"xs_{i}" if kind != "num" else null_str} AS max_str,
           {f"al_{i}" if kind == "str" else null_num} AS avg_len
    FROM {agg_src}"""
        )
    return "\n    UNION ALL\n    ".join(outs)


def profile_sql(d: dict, table: str, cols: list) -> str:
    """Self-contained profile query (the oracle form: DuckDB evaluates the
    CTE once; Spark's build materializes it instead — see module doc)."""
    return f"""
    WITH agg AS (
        {profile_agg_sql(d, table, cols)}
    )
    {profile_out_sql(d, "agg", cols)}
    """


def _q136_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from music_recommendation_service_spark.sources.catalog import load_table
    from music_recommendation_service_spark.sources.writers import (
        scratch_materialize,
    )

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    agg = scratch_materialize(
        spark.sql(profile_agg_sql(SPARK, "events", _EVENTS_COLS)),
        "q136_profile_agg",
    )
    agg.createOrReplaceTempView("q136_agg_mat")
    return spark.sql(profile_out_sql(SPARK, "q136_agg_mat", _EVENTS_COLS))


register(
    "q136_table_profile",
    oracle=profile_sql(DUCK, "events", _EVENTS_COLS),
    doc="Single-pass dataset profile of the events stream table: per "
    "column (null count, exact distinct, numeric range, string range + "
    "mean length, date range) — one Expand-based multi-distinct scan, "
    "materialized 1-row aggregate, constant-projection reshape.",
    tags=("profiling", "quality", "llm-pipeline"),
)(_q136_build)
