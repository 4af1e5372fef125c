"""Analytical extensions (q75-q77): batch sessionization, statistical
outlier detection, and embedding quantization — three shapes a production
analytics/training pipeline runs constantly that the reference lacks
entirely (its "session" notion is a 7-day batch filter, its quality gate is
schema-level only, and it has no vector processing).

Scale notes (100 TB):
- q75 sessionization is ONE shuffle (user key) + one in-partition sort —
  the lag/cumsum trick turns gap-based sessions into window arithmetic with
  no iteration, no state store, and no session-length bound needed (its
  streaming twin q34 needs watermark-bounded state).
- q76 broadcasts the per-type moment table (|event_types| rows) back onto
  the stream — the fact is scanned twice but shuffled never.
- q77 quantization is a pure per-row projection (array lambda inside
  whole-stage codegen): int8 storage is 4x smaller than float32, which at
  100 TB of embeddings is the difference between fitting the ANN working
  set in cluster memory or not. Values stay integer end-to-end so the
  DuckDB oracle matches bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from music_recommendation_service_spark.functions import rnd, rnd_sql
from music_recommendation_service_spark.plans import register
from music_recommendation_service_spark.sources.catalog import load_table as _t

SESSION_GAP_S = 1800  # 30 minutes, matching the streaming session gap (q34)


# ---------------------------------------------------------------------------
# q75 — batch sessionization: gap > 30 min starts a new session; session_id
# is the running count of session starts (lag + conditional cumsum). The
# batch twin of the streaming session_window query (q34) — same gap
# semantics, zero state.
# ---------------------------------------------------------------------------
@register(
    "q75_batch_sessionize",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_S}
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WHERE user_id % 50 = 0
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, event_id, ts, value,
               sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS session_id
        FROM ordered
    )
    SELECT user_id,
           CAST(session_id AS BIGINT)  AS session_id,
           CAST(count(*) AS BIGINT)    AS n_events,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_s,
           {rnd_sql("sum(value)", 2)}  AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("sessionization", "window", "lag", "cumsum"),
)
def q75_batch_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0)
    sessions = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("session_id"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "duration_s"
        ),
        rnd(F.sum("value"), 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# q76 — statistical outliers: events whose value is > 3 sample standard
# deviations from their type's mean. The per-type moment table decorrelates
# to a broadcast join (the scalar-subquery-per-group pattern); reported as
# per-type counts + extremes so the output is stable.
# ---------------------------------------------------------------------------
@register(
    "q76_value_outliers",
    oracle=f"""
    WITH stats AS (
        SELECT event_type,
               avg(value)         AS m,
               stddev_samp(value) AS s
        FROM events
        GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_outliers,
           {rnd_sql("min(e.value)", 4)} AS min_outlier,
           {rnd_sql("max(e.value)", 4)} AS max_outlier
    FROM events e
    JOIN stats t ON e.event_type = t.event_type
    WHERE abs(e.value - t.m) > 3 * t.s
    GROUP BY e.event_type
    """,
    tags=("quality", "outliers", "scalar-subquery"),
)
def q76_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    stats = e.groupBy(F.col("event_type").alias("t_type")).agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("s")
    )
    return (
        e.join(F.broadcast(stats), e.event_type == F.col("t_type"))
        .filter(F.abs(F.col("value") - F.col("m")) > 3 * F.col("s"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            rnd(F.min("value"), 4).alias("min_outlier"),
            rnd(F.max("value"), 4).alias("max_outlier"),
        )
    )


# ---------------------------------------------------------------------------
# q77 — per-vector uint8 quantization: min/max scale each embedding to
# 0..255 (floor(x*scale + 0.5 + eps) keeps the rounding decision identical
# across engines — same trick as functions/portable.rnd). Output stays
# integer (sum + first/last quantized dims), so the check is exact.
# ---------------------------------------------------------------------------
@register(
    "q77_embedding_quantize",
    oracle="""
    WITH prep AS (
        SELECT vec_id,
               CAST(embedding AS DOUBLE[]) AS v,
               CAST(list_aggregate(CAST(embedding AS DOUBLE[]), 'min') AS DOUBLE) AS mn,
               CAST(list_aggregate(CAST(embedding AS DOUBLE[]), 'max') AS DOUBLE) AS mx
        FROM embeddings
        WHERE vec_id % 10 = 0
    ),
    q AS (
        SELECT vec_id,
               list_transform(
                   v, x -> CAST(floor((x - mn) * (255.0 / (mx - mn)) + 0.5 + 1e-9)
                               AS BIGINT)
               ) AS qv
        FROM prep
    )
    SELECT vec_id,
           CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
           CAST(qv[1] AS BIGINT)                     AS q_first,
           CAST(qv[64] AS BIGINT)                    AS q_last
    FROM q
    """,
    tags=("vector", "quantization", "codegen"),
)
def q77_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    prep = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    ).select(
        "vec_id",
        "v",
        F.array_min("v").alias("mn"),
        F.array_max("v").alias("mx"),
    )
    q = prep.select(
        "vec_id",
        F.expr(
            "transform(v, x -> CAST(floor((x - mn) * (255.0 / (mx - mn))"
            " + 0.5 + 1e-9) AS BIGINT))"
        ).alias("qv"),
    )
    return q.select(
        "vec_id",
        F.expr("aggregate(qv, CAST(0 AS BIGINT), (acc, x) -> acc + x)").alias("q_sum"),
        F.element_at("qv", 1).alias("q_first"),
        F.element_at("qv", 64).alias("q_last"),
    )


# ---------------------------------------------------------------------------
# q81 — calendar densification: every (day, event_type) cell over the full
# observed range, zero-filled where no events landed. The day spine is a
# sequence-explode of the 1-row global min/max (generator + broadcast cross
# join — |days| x |types| rows, trivially small next to the fact), left-
# joined by the aggregated counts. Gap-free series are what window/trend
# models downstream consume.
# ---------------------------------------------------------------------------
@register(
    "q81_daily_dense_counts",
    oracle="""
    WITH bounds AS (
        SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day,
               t.event_type
        FROM bounds, (SELECT DISTINCT event_type FROM events) t
    ),
    actual AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT s.day, s.event_type, COALESCE(a.n, 0) AS n_events
    FROM spine s
    LEFT JOIN actual a ON s.day = a.day AND s.event_type = a.event_type
    """,
    tags=("densify", "generator", "J5", "P7"),
)
def q81_daily_dense_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    days = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    types = e.select("event_type").distinct()
    spine = days.crossJoin(F.broadcast(types))
    actual = e.groupBy(
        F.to_date("ts").alias("a_day"), F.col("event_type").alias("a_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        spine.join(
            actual,
            (spine.day == actual.a_day) & (spine.event_type == actual.a_type),
            "left",
        )
        .select("day", "event_type", F.coalesce("n", F.lit(0)).alias("n_events"))
    )


# ---------------------------------------------------------------------------
# q82 — bivariate statistics: correlation / sample covariance / regression
# slope of quantity vs extended price per return flag — the moment
# aggregates (corr, covar_samp) the reference's A-family lacks entirely.
# Single partial+final hash agg; slope derived from the same moments.
# ---------------------------------------------------------------------------
@register(
    "q82_price_qty_moments",
    oracle=f"""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           {rnd_sql("corr(l_extendedprice, l_quantity)", 6)}       AS price_qty_corr,
           {rnd_sql("covar_samp(l_extendedprice, l_quantity)", 4)} AS price_qty_covar,
           {rnd_sql(
               "covar_samp(l_extendedprice, l_quantity) / var_samp(l_quantity)", 6
           )} AS slope
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("statistics", "corr", "A-family"),
)
def q82_price_qty_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        rnd(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
        rnd(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias(
            "price_qty_covar"
        ),
        rnd(
            F.covar_samp("l_extendedprice", "l_quantity")
            / F.var_samp("l_quantity"),
            6,
        ).alias("slope"),
    )


# ---------------------------------------------------------------------------
# q83 — SCD Type-2 interval construction: each user's event stream becomes
# versioned validity intervals [ts, next_ts) via lead(), open-ended for the
# current version — the dimension-history builder every warehouse runs, and
# the natural join target for the as-of operator (q37). Same
# one-shuffle-per-user-window shape as q54/q75.
# ---------------------------------------------------------------------------
@register(
    "q83_scd2_intervals",
    oracle="""
    SELECT user_id,
           event_id   AS version_id,
           ts         AS effective_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      AS effective_to,
           CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                IS NULL AS INT) AS is_current,
           event_type AS state
    FROM events
    WHERE user_id % 100 = 0
    """,
    tags=("scd2", "lead", "window", "warehouse"),
)
def q83_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") % 100 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        F.col("event_id").alias("version_id"),
        F.col("ts").alias("effective_from"),
        nxt.alias("effective_to"),
        nxt.isNull().cast("int").alias("is_current"),
        F.col("event_type").alias("state"),
    )


# ---------------------------------------------------------------------------
# q88 — keep-newest-per-key dedup via max_by: the CDC/compaction primitive
# (latest state per user) expressed as a ONE-PASS aggregate instead of the
# row_number()-over-window idiom. At 100 TB this is the difference between
# a partial+final hash aggregate (map-side combine collapses each partition
# to |keys| rows before the single shuffle) and a full shuffle+sort of every
# row that the window form pays. Ties on ts are broken by event_id through
# the struct ordering, so the result is deterministic even if a key has two
# events in the same microsecond. Reference analogue: the serving layer's
# "latest table state" reads (SURVEY.md §2.1 S13/S14) — here as a query.
# ---------------------------------------------------------------------------
@register(
    "q88_latest_events",
    oracle="""
    SELECT user_id,
           event_id   AS last_event_id,
           ts         AS last_ts,
           event_type AS last_type,
           round(value, 6) AS last_value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
    doc="Latest event per user: max_by one-pass aggregate (map-side "
    "combinable) replacing the shuffle+sort row_number window idiom; "
    "oracle runs the window form to pin identical semantics.",
    tags=("dedup", "max_by", "cdc", "compaction"),
)
def q88_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    key = "struct(ts, event_id)"
    return e.groupBy("user_id").agg(
        F.expr(f"max_by(event_id, {key})").alias("last_event_id"),
        F.max("ts").alias("last_ts"),
        F.expr(f"max_by(event_type, {key})").alias("last_type"),
        F.round(F.expr(f"max_by(value, {key})"), 6).alias("last_value"),
    )


# ---------------------------------------------------------------------------
# q104 — sequential funnel analysis (view -> click -> purchase): per user,
# each stage must happen strictly AFTER the previous stage's first
# occurrence — the product-analytics query every event warehouse runs.
#
# Scale shape (round 12): ONE user_id exchange. The strictly-after chain
# is three min() windows over the same user partition (each stage's
# predicate consumes the previous window's column), the per-user rollup
# reuses that partitioning, and the funnel report is a 1-row global
# aggregate. Raw events shuffle once; per-user state is three
# timestamps — O(users) memory, not O(events). The oracle keeps the
# textbook three-CTE join chain, pinning identical semantics.
# ---------------------------------------------------------------------------
def _q104_sql(duck: bool) -> str:
    # epoch seconds with fractional part, identical in both engines
    # (Spark reads the catalog's converted NTZ timestamps; an NTZ cannot
    # cast straight to DOUBLE, but NTZ->TIMESTAMP is exact under the
    # pinned UTC session timezone)
    ep = (lambda t: f"epoch({t})") if duck else (
        lambda t: f"cast(cast({t} AS TIMESTAMP) AS DOUBLE)"
    )
    return f"""
    WITH v AS (
        SELECT user_id, min(ts) AS t0
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t1
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t0
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t1
        GROUP BY e.user_id
    ),
    j AS (
        SELECT v.user_id, v.t0, c.t1, p.t2
        FROM v LEFT JOIN c ON v.user_id = c.user_id
                LEFT JOIN p ON v.user_id = p.user_id
    )
    SELECT CAST(count(*) AS BIGINT)  AS n_view,
           CAST(count(t1) AS BIGINT) AS n_click,
           CAST(count(t2) AS BIGINT) AS n_purchase,
           {_RND6.format(x='count(t1) * 1.0 / count(*)')}  AS conv_view_click,
           {_RND6.format(x='count(t2) * 1.0 / count(*)')}  AS conv_view_purchase,
           {_RND2.format(x=f"avg({ep('t1')} - {ep('t0')})")} AS avg_s_view_click,
           {_RND2.format(x=f"avg({ep('t2')} - {ep('t1')})")} AS avg_s_click_purchase
    FROM j
    """


_RND6 = "round(({x}) + 1e-9, 6)"
_RND2 = "round(({x}) + 1e-9, 2)"


@register(
    "q104_funnel",
    oracle=_q104_sql(duck=True),
    doc="Sequential view->click->purchase funnel: per-stage first-touch "
    "chained by strictly-after joins; stage counts, conversion rates, and "
    "mean stage-transition seconds in one row.",
    tags=("events", "funnel", "analytics"),
)
def q104_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-12: the SQL form scanned events three times (one stage-filtered
    # aggregate per CTE) and chained them through joins — 8 jobs at sf0.1.
    # The same strictly-after chain is three min() windows over ONE
    # user_id partition (each stage's condition consumes the previous
    # window's column, so Spark plans a single exchange + three Window
    # nodes), and the per-user rollup reuses that partitioning with no
    # second shuffle. The DuckDB oracle keeps the CTE-chain SQL, pinning
    # identical output.
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    ty = F.col("event_type")
    # Only the three funnel types feed the windows; rows of other types
    # would ride along as inert carriers (their t0..t2 collapse in the
    # per-user min), so filtering them BEFORE the exchange shuffles ~40%
    # fewer bytes and pushes the IN-list into the parquet scan. A user
    # with no view row is dropped by the t0 filter either way.
    e = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .where(ty.isin("view", "click", "purchase"))
    )
    staged = (
        e.withColumn(
            "t0", F.min(F.when(ty == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "t1",
            F.min(
                F.when(
                    (ty == "click") & (F.col("ts") > F.col("t0")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (ty == "purchase") & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = (
        staged.groupBy("user_id")
        .agg(
            F.min("t0").alias("t0"),
            F.min("t1").alias("t1"),
            F.min("t2").alias("t2"),
        )
        .where(F.col("t0").isNotNull())
    )

    def ep(c: str):
        return F.col(c).cast("timestamp").cast("double")

    n_view = F.count(F.lit(1))
    n_click = F.count("t1")
    n_purchase = F.count("t2")
    return per_user.agg(
        n_view.cast("long").alias("n_view"),
        n_click.cast("long").alias("n_click"),
        n_purchase.cast("long").alias("n_purchase"),
        rnd(n_click * F.lit(1.0) / n_view, 6).alias("conv_view_click"),
        rnd(n_purchase * F.lit(1.0) / n_view, 6).alias("conv_view_purchase"),
        rnd(F.avg(ep("t1") - ep("t0")), 2).alias("avg_s_view_click"),
        rnd(F.avg(ep("t2") - ep("t1")), 2).alias("avg_s_click_purchase"),
    )


# ---------------------------------------------------------------------------
# q105 — retention cohorts: users grouped by signup week, distinct active
# users per (cohort_week, weeks_since_signup) — the second canonical
# event-warehouse analytic (the funnel's companion). Two hash aggregates
# keyed on user_id then on the (cohort, offset) pair; the cohort dimension
# is derived from a broadcast-joined first-touch table, O(users).
# ---------------------------------------------------------------------------
def _q105_sql(duck: bool) -> str:
    if duck:
        dd = "date_diff('day', s.w0, date_trunc('week', e.ts))"
    else:
        dd = "datediff(date_trunc('week', e.ts), s.w0)"
    return f"""
    WITH s AS (
        SELECT user_id, date_trunc('week', min(ts)) AS w0
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT CAST(s.w0 AS DATE)                    AS cohort_week,
           CAST(({dd}) / 7 AS INT)               AS week_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
    FROM events e JOIN s ON e.user_id = s.user_id
    WHERE e.ts >= s.w0
    GROUP BY s.w0, 2
    """


@register(
    "q105_retention_cohorts",
    oracle=_q105_sql(duck=True),
    doc="Weekly retention cohorts: signup-week first touch broadcast onto "
    "the event stream; distinct active users per (cohort, week offset).",
    tags=("events", "retention", "analytics"),
)
def q105_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_q105_sql(duck=False))


# ---------------------------------------------------------------------------
# q106 — per-series gap interpolation: densify each user's daily series to
# its own [first, last] day range, then fill interior gaps by LINEAR
# interpolation between the surrounding observations (the time-series
# prep step before any trend/seasonality model).
#
# Scale shape: the anchors are four IGNORE-NULLS running window functions
# over ONE per-user sort — no self-join to find "previous/next observed
# row", which is the naive O(n^2)-ish formulation. Per-user spines bound
# the densification to each series' own range, so the explode factor is
# sum(user range days), not |users| x global range.
# ---------------------------------------------------------------------------
def _q106_sql(duck: bool) -> str:
    if duck:
        spine = """
        SELECT user_id,
               unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
        FROM b
        """
        dd = lambda a, b: f"date_diff('day', {a}, {b})"
    else:
        spine = """
        SELECT user_id, day
        FROM b LATERAL VIEW explode(sequence(lo, hi, interval 1 day)) t AS day
        """
        dd = lambda a, b: f"datediff({b}, {a})"
    prev_frame = (
        "OVER (PARTITION BY user_id ORDER BY day "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    next_frame = (
        "OVER (PARTITION BY user_id ORDER BY day "
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
    )

    # IGNORE NULLS spelling differs: DuckDB puts it inside the call
    # parens, Spark after them.
    def anchor(fn: str, expr: str, frame: str) -> str:
        if duck:
            return f"{fn}({expr} IGNORE NULLS) {frame}"
        return f"{fn}({expr}) IGNORE NULLS {frame}"
    return f"""
    WITH obs AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               round(avg(value) + 1e-9, 6) AS v
        FROM events WHERE user_id % 25 = 0
        GROUP BY user_id, CAST(ts AS DATE)
    ),
    b AS (
        SELECT user_id, min(day) AS lo, max(day) AS hi FROM obs GROUP BY user_id
    ),
    spine AS ({spine}),
    j AS (
        SELECT s.user_id, s.day, o.v
        FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.day = o.day
    ),
    w AS (
        SELECT user_id, day, v,
               {anchor('last_value', 'v', prev_frame)} AS pv,
               {anchor('last_value', 'CASE WHEN v IS NOT NULL THEN day END', prev_frame)} AS pd,
               {anchor('first_value', 'v', next_frame)} AS nv,
               {anchor('first_value', 'CASE WHEN v IS NOT NULL THEN day END', next_frame)} AS nd
        FROM j
    )
    SELECT user_id, day,
           (v IS NOT NULL) AS observed,
           round(CASE
               WHEN v IS NOT NULL THEN v
               ELSE pv + (nv - pv) * ({dd('pd', 'day')} * 1.0)
                                   / ({dd('pd', 'nd')})
           END + 1e-9, 6) AS filled
    FROM w
    """


@register(
    "q106_series_interpolation",
    oracle=_q106_sql(duck=True),
    doc="Per-user daily densification + linear interpolation of interior "
    "gaps via IGNORE-NULLS running anchors (one window pass, no "
    "previous-observation self-join).",
    tags=("timeseries", "interpolation", "window", "densify"),
)
def q106_series_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_q106_sql(duck=False))


# ---------------------------------------------------------------------------
# q113 — fixed-bin histogram + midpoint-quantile estimates per group: the
# BATCH twin of the engine's maintainable percentile view
# (sources/snapshots.py histogram_quantile over hist_<c> columns kept
# current by snapshot_maintain_aggregate). The estimator here is the SAME
# rule — ceil(q*total)-th value's bin, reported as the bin midpoint with
# lo/hi clamps for the flow bins — so the DuckDB oracle pins the semantics
# the incremental path serves (tests/test_snapshots.py proves the batch and
# maintained answers coincide on shared data).
#
# Scale design: one partial+final hash agg to O(groups x nbins) bin counts,
# one tiny window over that to pick quantile bins — the value stream is
# never sorted (q43's exact percentile_cont must shuffle values per group;
# this is the sketch that replaces it at 100 TB for a half-bin-width error).
# ---------------------------------------------------------------------------
_H_LO, _H_HI, _H_NB = 0.0, 110000.0, 22


def _q113_counts_sql() -> str:
    """The O(groups x bins) bin-count aggregate — the ONLY corpus-sized
    stage; shared between the inline (oracle) form and the Spark build's
    materialization so they can never drift."""
    w = (_H_HI - _H_LO) / _H_NB
    x = "l_extendedprice"
    bin_expr = (
        f"CASE WHEN {x} < {_H_LO} THEN 0 "
        f"WHEN {x} >= {_H_HI} THEN {_H_NB + 1} "
        f"ELSE least({_H_NB}, greatest(1, "
        f"CAST(floor(({x} - {_H_LO}) / {w}) AS INT) + 1)) END"
    )
    return f"""binned AS (
        SELECT l_returnflag AS flag, {bin_expr} AS bin FROM lineitem
    ),
    counts AS (
        SELECT flag, bin, CAST(count(*) AS BIGINT) AS c
        FROM binned GROUP BY flag, bin
    )"""


def _q113(d: dict, counts_src: str | None = None) -> str:
    w = (_H_HI - _H_LO) / _H_NB
    mid = (
        f"CASE WHEN qbin = 0 THEN {_H_LO} "
        f"WHEN qbin = {_H_NB + 1} THEN {_H_HI} "
        f"ELSE {_H_LO} + (qbin - 0.5) * {w} END"
    )
    if counts_src is None:
        head = f"    WITH {_q113_counts_sql()},\n"
        counts = "counts"
    else:
        head = "    WITH "
        counts = counts_src
    return f"""
{head}    cum AS (
        SELECT flag, bin, c,
               sum(c) OVER (PARTITION BY flag ORDER BY bin) AS cum_c,
               sum(c) OVER (PARTITION BY flag)              AS total
        FROM {counts}
    ),
    quantiles AS (
        SELECT flag, q, min(bin) AS qbin
        FROM cum
        CROSS JOIN (SELECT 0.5 AS q UNION ALL SELECT 0.9 UNION ALL SELECT 0.99) qs
        WHERE cum_c >= ceil(q * total)
        GROUP BY flag, q
    )
    SELECT flag, {rnd_sql("q", 2)} AS q, {rnd_sql(mid, 6)} AS estimate,
           (SELECT CAST(max(total) AS BIGINT) FROM cum c2
            WHERE c2.flag = quantiles.flag) AS n_values
    FROM quantiles
    """


# Round-12 optimization: the correlated n_values scalar subquery made
# Spark execute the whole binned+counts lineitem aggregate a second time
# (4 parquet scans / 12 Exchange in the sf0.1 plan). The Spark build
# materializes the O(groups x bins) counts relation once; the quantile
# window, the quantile pick, and the subquery all read the tiny parquet.
# The DuckDB oracle keeps the inline form, pinning identical rows.
def _q113_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from music_recommendation_service_spark.sources.writers import (
        scratch_materialize,
    )

    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    counts = scratch_materialize(
        spark.sql(
            f"WITH {_q113_counts_sql()}\n    SELECT flag, bin, c FROM counts"
        ),
        "q113_counts",
    )
    counts.createOrReplaceTempView("q113_counts_mat")
    from music_recommendation_service_spark.functions.dialect import SPARK

    return spark.sql(_q113(SPARK, counts_src="q113_counts_mat"))


def _register_q113():
    from music_recommendation_service_spark.plans import register
    from music_recommendation_service_spark.functions.dialect import DUCK

    register(
        "q113_histogram_quantiles",
        oracle=_q113(DUCK),
        doc="Fixed-bin histogram p50/p90/p99 midpoint estimates per return "
        "flag — the batch twin of the maintainable percentile view "
        "(histogram_quantile over snapshot_maintain_aggregate hist state); "
        "O(groups x bins) agg, no per-group value sort.",
        tags=("analytics", "histogram", "quantile", "sketch"),
    )(_q113_build)


_register_q113()


# ---------------------------------------------------------------------------
# q114 — Pareto frontier (skyline): orders not dominated on
# (o_totalprice, o_orderdate) — no other order has both a >= price and a
# >= date with at least one strict (exact (price, date) ties keep the min
# orderkey). The multi-objective shortlist query ("latest AND largest")
# that a naive formulation writes as an O(n^2) NOT EXISTS self-join.
#
# Single-pass identity: sorted by (price DESC, date DESC, key), a row is
# on the frontier iff its date strictly exceeds the running max date of
# all PRECEDING rows — every preceding row has higher price (or equal
# price with later/equal date), so "some preceding date >= mine" is
# exactly "I am dominated".
#
# Scale design: the oracle keeps the one-window form; Spark's side
# exploits skyline decomposability — skyline(S) = skyline(U_b skyline(S_b))
# — with price-band partitions: the heavy window runs PARTITIONED (parallel,
# shuffle on band), and only the tiny per-band frontiers (≈log-sized for
# non-adversarial data) meet the final single-partition window. Identical
# output by construction (band-local dominance is a subset of global
# dominance; cross-band survivors are re-tested globally).
# ---------------------------------------------------------------------------
_Q114_FRAME = (
    "ORDER BY o_totalprice DESC, d DESC, o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
)


def _q114_oracle() -> str:
    return f"""
    WITH pts AS (
        SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS d
        FROM orders
    ),
    w AS (
        SELECT o_orderkey, o_totalprice, d,
               max(d) OVER ({_Q114_FRAME}) AS best_d
        FROM pts
    )
    SELECT o_orderkey,
           {rnd_sql("o_totalprice", 2)} AS price,
           d                            AS order_date
    FROM w WHERE best_d IS NULL OR d > best_d
    """


def _q114_spark() -> str:
    return f"""
    WITH pts AS (
        SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS d,
               CAST(floor(o_totalprice / 20000.0) AS INT) AS band
        FROM orders
    ),
    loc AS (
        SELECT o_orderkey, o_totalprice, d,
               max(d) OVER (PARTITION BY band {_Q114_FRAME}) AS band_best
        FROM pts
    ),
    cand AS (
        SELECT o_orderkey, o_totalprice, d FROM loc
        WHERE band_best IS NULL OR d > band_best
    ),
    fin AS (
        SELECT o_orderkey, o_totalprice, d,
               max(d) OVER ({_Q114_FRAME}) AS best_d
        FROM cand
    )
    SELECT o_orderkey,
           {rnd_sql("o_totalprice", 2)} AS price,
           d                            AS order_date
    FROM fin WHERE best_d IS NULL OR d > best_d
    """


@register(
    "q114_pareto_frontier",
    oracle=_q114_oracle(),
    doc="Pareto frontier (skyline) of orders on (totalprice, orderdate): "
    "banded parallel windows + frontier-of-frontiers, vs the naive O(n^2) "
    "dominance self-join.",
    tags=("analytics", "skyline", "pareto"),
)
def q114_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_q114_spark())


# ---------------------------------------------------------------------------
# q116 — CUSUM change-point detection over the daily event series: the
# monitoring twin of q110 (drift) and q76 (outliers). Each day's count is
# standardized against the EXPANDING history of prior days (z = 0 until 7
# days of history), then the one-sided CUSUM S_t = max(0, S_{t-1} + z_t - k)
# accumulates sustained upward drift that single-day outlier rules miss.
#
# The max(0, ...) recursion is not a window aggregate — but it has the
# closed form S_t = R_t - min(0, min_{j<=t} R_j) with R the plain running
# sum of (z - k), so the whole detector stays in TWO ordinary window
# passes over O(types x days) rows: no recursion, no UDF, no driver loop.
# Scale: the series table is an O(groups x days) aggregate of the raw
# events (partial+final hash agg); every window partitions by event_type.
# ---------------------------------------------------------------------------
_CUSUM_K = 0.5
_CUSUM_H = 4.0


def _q116(d: dict) -> str:
    return f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    hist AS (
        SELECT event_type, day, n,
               avg(CAST(n AS DOUBLE))         OVER w AS mu,
               stddev_samp(CAST(n AS DOUBLE)) OVER w AS sd,
               count(*)                       OVER w AS n_prior
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    z AS (
        SELECT event_type, day, n,
               CASE WHEN n_prior >= 7 AND sd > 0
                    THEN (CAST(n AS DOUBLE) - mu) / sd ELSE 0.0 END AS z
        FROM hist
    ),
    r AS (
        SELECT event_type, day, n, z,
               sum(z - {_CUSUM_K}) OVER (
                   PARTITION BY event_type ORDER BY day) AS rsum
        FROM z
    )
    SELECT event_type, day, n,
           {rnd_sql("z", 6)} AS z,
           {rnd_sql(f"rsum - least(min(rsum) OVER (PARTITION BY event_type ORDER BY day), 0.0)", 6)} AS cusum,
           (rsum - least(min(rsum) OVER (PARTITION BY event_type ORDER BY day), 0.0)) >= {_CUSUM_H} AS flagged
    FROM r
    """


def _register_q116():
    from music_recommendation_service_spark.functions.dialect import register_sql

    register_sql(
        "q116_cusum_changepoint",
        _q116,
        ("events",),
        doc="One-sided CUSUM change-point detector over daily event counts "
        "(expanding-history z-scores; max(0,.) recursion via the running-"
        "sum-minus-running-min identity — two window passes, no recursion).",
        tags=("analytics", "monitoring", "changepoint", "cusum"),
    )


_register_q116()


# ---------------------------------------------------------------------------
# q120 — first-order Markov transition model over per-user event sequences:
# P(next_type | prev_type) estimated from consecutive event pairs. The
# sequence model a session-analysis / next-event-prediction layer fits over
# the reference's event stream.
#
# Scale (100 TB): ONE user_id shuffle for the lag window (sequences are
# per-user, so consecutive pairs never cross partitions), then the pair
# aggregate is over a |types|^2-sized key space — the partial aggregate
# collapses each partition to <= 25 rows before the second (trivial)
# exchange. The row-probability normalizer is a window over the 25-row
# aggregate, not the fact.
# ---------------------------------------------------------------------------
@register(
    "q120_markov_transitions",
    oracle=f"""
    WITH seq AS (
        SELECT event_type AS prev_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    counts AS (
        SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n,
           {rnd_sql('n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE)', 5)}
               AS prob
    FROM counts
    """,
    doc="First-order Markov transition matrix (counts + row-normalized "
    "probabilities) over per-user consecutive event pairs.",
    tags=("analytics", "sequence", "markov", "window"),
)
def q120_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wrow = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        rnd(F.col("n") / F.sum("n").over(wrow).cast("double"), 5).alias("prob"),
    )


# ---------------------------------------------------------------------------
# q121 — per-user EWMA smoothing (adjusted weights, alpha=0.3) of the event
# value series, reporting the final smoothed level per user. The recursive
# EWMA s_t = a*x_t + (1-a)*s_{t-1} is re-expressed as a RATIO OF TWO
# CUMULATIVE SUMS: with r = 1-a and rn the 1-based row number,
#     s_t = sum_j x_j * r^(-j) / sum_j r^(-j)        (j <= t)
# (both sides of the textbook weight r^(t-j) divided by r^t) — so the
# whole computation is ONE ordered window pass per user, no recursion, no
# UDF, identical arithmetic in the DuckDB twin.
#
# Scale (100 TB): valid while per-key series are bounded (r^(-rn) overflows
# double near rn ~ 2000 for r=0.7); for unbounded/global series the engine
# path is operators/scan.py::linear_scan, the segmented affine prefix scan
# whose per-chunk state composition is exact at any length. Test-SF series
# max out at 99 rows/user, 15 orders of magnitude inside the safe range.
# ---------------------------------------------------------------------------
_EWMA_ALPHA = 0.3


@register(
    "q121_ewma_last",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, value,
               row_number() OVER w AS rn,
               count(*)  OVER (PARTITION BY user_id) AS n_events
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sums AS (
        SELECT user_id, rn, n_events,
               sum(value * power({1.0 - _EWMA_ALPHA}, -rn)) OVER w2 AS num,
               sum(power({1.0 - _EWMA_ALPHA}, -rn))         OVER w2 AS den
        FROM ordered
        WINDOW w2 AS (PARTITION BY user_id ORDER BY rn
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id,
           CAST(n_events AS BIGINT)      AS n_events,
           {rnd_sql('num / den', 4)}     AS ewma
    FROM sums
    WHERE rn = n_events
    """,
    doc="Per-user adjusted EWMA (alpha=0.3) of event values via the "
    "two-cumulative-sums identity — one window pass, no recursion.",
    tags=("analytics", "timeseries", "ewma", "window"),
)
def q121_ewma_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    r = 1.0 - _EWMA_ALPHA
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_events"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wgt = F.pow(F.lit(r), -F.col("rn"))
    sums = ordered.select(
        "user_id",
        "rn",
        "n_events",
        F.sum(F.col("value") * wgt).over(w2).alias("num"),
        F.sum(wgt).over(w2).alias("den"),
    )
    return sums.filter(F.col("rn") == F.col("n_events")).select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        rnd(F.col("num") / F.col("den"), 4).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# q125 — rolling 7-day distinct users per day (exact). Sliding-window
# COUNT(DISTINCT) cannot ride a window frame (distinct doesn't decompose),
# so the scalable exact form is the CONTRIBUTION EXPAND: reduce the fact
# to distinct (day, user) first — the only pass over the full data — then
# fan each row out to the <= 7 target days it contributes to and count
# distinct per target. The x7 amplification applies to the REDUCED
# |days x users| relation, not the event stream; the approximate
# alternative at extreme scale is a per-day HLL sketch union over the
# window (the snapshot layer's maintained HLL is exactly that primitive).
# A semi-join against the observed-day spine trims targets past the data's
# edge, keeping the output aligned with the calendar the data actually
# covers.
# ---------------------------------------------------------------------------
_ROLL_DAYS = 7


@register(
    "q125_rolling_distinct_users",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    expanded AS (
        SELECT day + CAST(i AS INTEGER) AS target, user_id
        FROM du, (SELECT unnest(generate_series(0, {_ROLL_DAYS - 1})) AS i)
    )
    SELECT e.target                              AS day,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users_7d
    FROM expanded e
    WHERE e.target IN (SELECT day FROM du)
    GROUP BY e.target
    """,
    doc="Exact rolling 7-day distinct users via contribution expand over "
    "the reduced (day,user) relation; HLL-union is the sketch alternative.",
    tags=("analytics", "rolling-distinct", "window", "expand"),
)
def q125_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    du = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    spine = du.select("day").distinct()
    expanded = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), _ROLL_DAYS - 1))
        ).alias("target"),
        "user_id",
    )
    return (
        expanded.join(
            F.broadcast(spine), expanded.target == spine.day, "left_semi"
        )
        .groupBy(F.col("target").alias("day"))
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
    )


# ---------------------------------------------------------------------------
# q126 — decile profile: NTILE(10) over customers by account balance, then
# per-decile stats. The equal-height bucketing a risk/LTV report runs; ties
# and remainder rows follow the SQL-standard NTILE algorithm (identical in
# both engines), made deterministic by the custkey tiebreak.
#
# Scale design: a literal F.ntile over Window.orderBy is a SINGLE-PARTITION
# sort — the classic global-rank scale trap. This build computes the same
# result with the banded global-rank decomposition (q114's pattern):
#   1. band rows by a monotone function of the leading sort key
#      (floor(acctbal / 1000) — bands respect the global order);
#   2. local row_number within each band (the heavy window runs
#      PARTITIONED by band);
#   3. cumulative band offsets + the total row count come off the
#      |bands|-row count table (the only SinglePartition pass, tiny) and
#      broadcast back: global_rn = band_offset + local_rn;
#   4. the decile is pure arithmetic on (global_rn, n) replicating the SQL
#      NTILE remainder rule — first (n mod 10) buckets get ceil(n/10) rows.
# The oracle runs the literal NTILE window, pinning that the decomposition
# IS ntile, not an approximation. The approximate path at extreme scale is
# the maintained histogram (q113).
# ---------------------------------------------------------------------------
@register(
    "q126_balance_deciles",
    oracle=f"""
    WITH ranked AS (
        SELECT c_custkey, c_acctbal,
               ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
        FROM customer
    )
    SELECT decile,
           CAST(count(*) AS BIGINT)        AS n_customers,
           {rnd_sql('min(c_acctbal)')}     AS min_bal,
           {rnd_sql('max(c_acctbal)')}     AS max_bal,
           {rnd_sql('avg(c_acctbal)')}     AS avg_bal
    FROM ranked
    GROUP BY decile
    """,
    doc="NTILE(10) equal-height deciles of customer balance with "
    "per-decile stats; exact twin of the histogram-quantile path (q113).",
    tags=("analytics", "ntile", "window", "report"),
)
def q126_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    banded = c.select(
        "c_acctbal",
        "c_custkey",
        F.floor(F.col("c_acctbal") / 1000).alias("band"),
    )
    local_rn = F.row_number().over(
        Window.partitionBy("band").orderBy("c_acctbal", "c_custkey")
    )
    ranked_local = banded.withColumn("local_rn", local_rn)
    # |bands|-row side table: exclusive cumulative offset + grand total.
    band_counts = banded.groupBy("band").agg(F.count(F.lit(1)).alias("bn"))
    w_tiny = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = band_counts.select(
        "band",
        (F.sum("bn").over(w_tiny) - F.col("bn")).alias("band_offset"),
        F.sum("bn").over(
            Window.orderBy("band").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    rn = F.col("band_offset") + F.col("local_rn")
    n = F.col("n")
    k = F.lit(10)
    r = n % k                      # buckets that get one extra row
    size_small = F.floor(n / k)
    size_big = size_small + 1
    cutoff = r * size_big          # rows covered by the big buckets
    # greatest(.,1) guards the n<k edge (size_small=0): that branch is never
    # SELECTED then, but ANSI mode evaluates both and would raise on /0.
    decile = (
        F.when(rn <= cutoff, F.ceil(rn / size_big))
        .otherwise(r + F.ceil((rn - cutoff) / F.greatest(size_small, F.lit(1))))
        .cast("int")
    )
    return (
        ranked_local.join(F.broadcast(offsets), "band")
        .select("c_acctbal", decile.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            rnd(F.min("c_acctbal")).alias("min_bal"),
            rnd(F.max("c_acctbal")).alias("max_bal"),
            rnd(F.avg("c_acctbal")).alias("avg_bal"),
        )
    )


# ---------------------------------------------------------------------------
# q127 / q128 — the two A/B-testing primitives an experimentation layer
# runs over the event stream: chi-square independence (categorical outcome
# vs cohort) and Welch's t-test (continuous outcome vs cohort). Cohorts are
# the deterministic user_id parity split (the q68 family's hash-split in
# miniature). Everything is two-level aggregation: O(types x cohorts) /
# O(cohorts) state, map-side combinable, one shuffle — the fact stream is
# never sorted or windowed. At 100 TB these are exactly the shapes that
# stay cheap: tiny key spaces, pure arithmetic on the aggregate.
# ---------------------------------------------------------------------------
@register(
    "q127_chi_square_independence",
    oracle=f"""
    WITH obs AS (
        SELECT event_type, user_id % 2 AS cohort,
               CAST(count(*) AS DOUBLE) AS o
        FROM events GROUP BY event_type, user_id % 2
    ),
    tot AS (
        SELECT o.*,
               sum(o) OVER (PARTITION BY event_type) AS row_tot,
               sum(o) OVER (PARTITION BY cohort)     AS col_tot,
               sum(o) OVER ()                        AS n
        FROM obs o
    )
    SELECT CAST(count(*) AS BIGINT)                       AS n_cells,
           CAST((count(DISTINCT event_type) - 1)
                * (count(DISTINCT cohort) - 1) AS BIGINT) AS dof,
           CAST(max(n) AS BIGINT)                          AS n_events,
           {rnd_sql('sum(pow(o - row_tot * col_tot / n, 2) / (row_tot * col_tot / n))', 4)}
               AS chi2
    FROM tot
    """,
    doc="Chi-square independence of event_type vs user-parity cohort: "
    "contingency counts + expected-frequency arithmetic, one shuffle.",
    tags=("analytics", "stats", "ab-test", "chi-square"),
)
def q127_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type", (F.col("user_id") % 2).alias("cohort")
    ).agg(F.count(F.lit(1)).cast("double").alias("o"))
    tot = obs.select(
        "event_type",
        "cohort",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("cohort")).alias("col_tot"),
        F.sum("o").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    expected = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return tot.agg(
        F.count(F.lit(1)).alias("n_cells"),
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("cohort") - 1)
        ).alias("dof"),
        F.max("n").cast("long").alias("n_events"),
        rnd(F.sum(F.pow(F.col("o") - expected, 2) / expected), 4).alias("chi2"),
    )


@register(
    "q128_welch_ttest",
    oracle=f"""
    WITH g AS (
        SELECT user_id % 2 AS cohort,
               CAST(count(*) AS DOUBLE) AS n,
               avg(value)               AS m,
               var_samp(value)          AS v
        FROM events GROUP BY user_id % 2
    ),
    w AS (
        SELECT max(CASE WHEN cohort = 0 THEN n END) AS n0,
               max(CASE WHEN cohort = 0 THEN m END) AS m0,
               max(CASE WHEN cohort = 0 THEN v END) AS v0,
               max(CASE WHEN cohort = 1 THEN n END) AS n1,
               max(CASE WHEN cohort = 1 THEN m END) AS m1,
               max(CASE WHEN cohort = 1 THEN v END) AS v1
        FROM g
    )
    SELECT CAST(n0 AS BIGINT) AS n_control,
           CAST(n1 AS BIGINT) AS n_treatment,
           {rnd_sql('m0 - m1', 6)} AS mean_diff,
           {rnd_sql('(m0 - m1) / sqrt(v0 / n0 + v1 / n1)', 4)} AS t_stat,
           {rnd_sql('''pow(v0 / n0 + v1 / n1, 2)
               / (pow(v0 / n0, 2) / (n0 - 1) + pow(v1 / n1, 2) / (n1 - 1))''', 2)}
               AS welch_dof
    FROM w
    """,
    doc="Welch's unequal-variance t-test between user-parity cohorts: "
    "per-cohort (n, mean, var) then closed-form t and Satterthwaite dof.",
    tags=("analytics", "stats", "ab-test", "ttest"),
)
def q128_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    g = e.groupBy((F.col("user_id") % 2).alias("cohort")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
    )
    pick = lambda c, col: F.max(F.when(F.col("cohort") == c, F.col(col)))
    w = g.agg(
        pick(0, "n").alias("n0"), pick(0, "m").alias("m0"), pick(0, "v").alias("v0"),
        pick(1, "n").alias("n1"), pick(1, "m").alias("m1"), pick(1, "v").alias("v1"),
    )
    se2 = F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1")
    dof = F.pow(se2, 2) / (
        F.pow(F.col("v0") / F.col("n0"), 2) / (F.col("n0") - 1)
        + F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
    )
    return w.select(
        F.col("n0").cast("long").alias("n_control"),
        F.col("n1").cast("long").alias("n_treatment"),
        rnd(F.col("m0") - F.col("m1"), 6).alias("mean_diff"),
        rnd((F.col("m0") - F.col("m1")) / F.sqrt(se2), 4).alias("t_stat"),
        rnd(dof, 2).alias("welch_dof"),
    )


# ---------------------------------------------------------------------------
# q129 — session path mining: the first three event types of every session
# (q75's gap rule), counted by path string. The "how do sessions start"
# analysis a product team runs weekly; path assembly is pure array algebra
# (collect → sort by step → transform → concat), no UDF.
#
# Scale: the session window is q75's single user_id shuffle; the path
# aggregate's key space is <= |types|^3 and map-side combines. The
# collect_list is bounded at 3 elements per group by the rn<=3 filter
# BEFORE aggregation — never an unbounded per-session buffer.
# ---------------------------------------------------------------------------
@register(
    "q129_session_paths",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_S}
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WHERE user_id % 50 = 0
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, event_type, ts, event_id,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS session_id
        FROM ordered
    ),
    steps AS (
        SELECT user_id, session_id, event_type,
               row_number() OVER (PARTITION BY user_id, session_id
                                  ORDER BY ts, event_id) AS rn
        FROM sessions
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM (
        SELECT user_id, session_id,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM steps WHERE rn <= 3
        GROUP BY user_id, session_id
    )
    GROUP BY path
    """,
    doc="Top session-opening paths: first 3 event types per gap-session, "
    "counted by path string — array algebra, no UDF.",
    tags=("analytics", "sessionization", "path", "sequence"),
)
def q129_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0)
    sessions = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "session_id"
        ),
    )
    steps = sessions.select(
        "user_id", "session_id", "event_type",
        F.row_number().over(
            Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
        ).alias("rn"),
    ).filter(F.col("rn") <= 3)
    paths = (
        steps.groupBy("user_id", "session_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rn", "event_type"))
            ).alias("steps")
        )
        .select(
            F.concat_ws(
                ">", F.expr("transform(steps, s -> s.event_type)")
            ).alias("path")
        )
    )
    return paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))


# ---------------------------------------------------------------------------
# q130 — Gini concentration of demand across items: how unequal are order
# counts over parts — the popularity-bias / catalog-concentration number a
# recommender team tracks next to q115's coverage metrics.
#   G = 2*Σ(i*x_i) / (N*Σx) - (N+1)/N     (x ascending, i = 1..N rank)
# The heavy work is ONE map-side-combinable count aggregate (fact -> one
# row per item); the rank window runs over that |items|-row aggregate.
# At extreme item cardinality the rank decomposes exactly like q126's
# banded global row_number (band on the count value); here |items| is
# thousands of rows — aggregate-scale, not fact-scale.
# ---------------------------------------------------------------------------
@register(
    "q130_demand_gini",
    oracle=f"""
    WITH counts AS (
        SELECT l_partkey AS item, CAST(count(*) AS DOUBLE) AS x
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT x, row_number() OVER (ORDER BY x, item) AS i,
               count(*) OVER ()  AS nn,
               sum(x)  OVER ()   AS s
        FROM counts
    )
    SELECT CAST(max(nn) AS BIGINT)                  AS n_items,
           CAST(max(s) AS BIGINT)                   AS n_lineitems,
           {rnd_sql('2.0 * sum(i * x) / (max(nn) * max(s)) - (max(nn) + 1.0) / max(nn)', 6)}
               AS gini
    FROM ranked
    """,
    doc="Gini coefficient of per-part order-line counts: one fact "
    "aggregate + a rank window over the |items|-row result.",
    tags=("analytics", "gini", "concentration", "window"),
)
def q130_demand_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_partkey").alias("item")).agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    full = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = counts.select(
        "x",
        F.row_number().over(Window.orderBy("x", "item")).alias("i"),
        F.count(F.lit(1)).over(full).alias("nn"),
        F.sum("x").over(full).alias("s"),
    )
    return ranked.agg(
        F.max("nn").cast("long").alias("n_items"),
        F.max("s").cast("long").alias("n_lineitems"),
        rnd(
            2.0 * F.sum(F.col("i") * F.col("x")) / (F.max("nn") * F.max("s"))
            - (F.max("nn") + 1.0) / F.max("nn"),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# q133 — classical seasonal decomposition of the daily event series:
# trend = centered 7-day moving average (full windows only — edge days get
# NULL, the standard convention), seasonal = day-of-week mean of the
# detrended series, residual = observed - trend - seasonal. The moving-
# average decomposition is the additive core of STL without the loess
# robustness loop — exactly SQL-expressible, so the oracle pins it.
#
# Scale design: ONE shuffle to O(days) daily counts; the 7-row window and
# the O(7)-row seasonal table are metadata-sized from there (the window
# over the daily relation is a single global sort of |days| rows — at ten
# years of data that is 3,653 rows, not a scale term). Day-of-week is
# computed as days-since-epoch-Monday mod 7: identical integer arithmetic
# in both engines (Spark dayofweek() and DuckDB dayofweek() disagree on
# numbering, so neither is used).
# ---------------------------------------------------------------------------
def _q133_sql(duck: bool) -> str:
    dow = (
        "(day - DATE '1970-01-05') % 7"
        if duck
        else "datediff(day, DATE '1970-01-05') % 7"
    )
    return f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY CAST(ts AS DATE)
    ),
    trended AS (
        -- CAST, not n * 1.0: Spark parses the literal as DECIMAL and
        -- avg(DECIMAL) keeps decimal arithmetic (scale+4 truncation);
        -- avg(DOUBLE) is IEEE in both engines.
        SELECT day, n,
               CASE WHEN count(*) OVER w = 7
                    THEN avg(CAST(n AS DOUBLE)) OVER w END AS trend
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    seasonal AS (
        SELECT {dow} AS dow, avg(n - trend) AS s
        FROM trended WHERE trend IS NOT NULL GROUP BY 1
    )
    SELECT t.day, t.n,
           {rnd_sql("t.trend", 6)} AS trend,
           {rnd_sql("s.s", 6)} AS seasonal,
           {rnd_sql("t.n - t.trend - s.s", 6)} AS resid
    FROM trended t
    JOIN seasonal s ON {dow.replace("day", "t.day")} = s.dow
    """


@register(
    "q133_seasonal_decompose",
    oracle=_q133_sql(duck=True),
    doc="Additive seasonal decomposition of daily event volume: centered "
    "7-day moving-average trend (full windows only), day-of-week seasonal "
    "means of the detrended series, residuals.",
    tags=("timeseries", "decomposition", "analytics"),
)
def q133_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_q133_sql(duck=False))


# ---------------------------------------------------------------------------
# q137 — Holt linear-trend exponential smoothing of daily event volume: the
# RECURSIVE time-series smoother (level + trend state) the windowed
# identities (q121 EWMA, q133 moving averages) cannot express — each day's
# state depends on the previous day's OUTPUT, not a fixed window of inputs.
# Spark side: operators/scan.py matrix_scan (the d=2 affine lift of the
# distributed linear-recurrence scan — one range shuffle + two narrow
# passes, partition-count independent). Oracle: the literal recurrence as
# a DuckDB RECURSIVE CTE, one row per day. l_1 = y_1, b_1 = 0;
# alpha = 0.5, beta = 0.3. At 100 TB the daily series is O(days) rows —
# the scan exists for the general case (per-key or high-frequency series
# where the driver must never hold the sequence).
# ---------------------------------------------------------------------------
_HOLT_A, _HOLT_B = 0.5, 0.3


def _q137_oracle() -> str:
    a, b = _HOLT_A, _HOLT_B
    return f"""
    WITH RECURSIVE daily AS (
        SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY CAST(ts AS DATE)
    ),
    seq AS (
        SELECT d, y, row_number() OVER (ORDER BY d) AS t FROM daily
    ),
    holt AS (
        SELECT t, d, y, CAST(y AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b
        FROM seq WHERE t = 1
        UNION ALL
        SELECT s.t, s.d, s.y,
               {a}*s.y + {1 - a}*(h.l + h.b),
               {b}*(({a}*s.y + {1 - a}*(h.l + h.b)) - h.l) + {1 - b}*h.b
        FROM seq s JOIN holt h ON s.t = h.t + 1
    )
    SELECT d, y, {rnd_sql("l", 6)} AS level, {rnd_sql("b", 6)} AS trend
    FROM holt
    """


@register(
    "q137_holt_smoothing",
    oracle=_q137_oracle(),
    doc="Holt linear-trend smoothing (alpha=0.5, beta=0.3) of daily event "
    "counts via the distributed 2x2 matrix affine scan; oracle is the "
    "literal recurrence as a recursive CTE.",
    tags=("timeseries", "smoothing", "scan", "analytics"),
)
def q137_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from music_recommendation_service_spark.operators.scan import holt_linear

    from music_recommendation_service_spark.sources.writers import (
        scratch_materialize,
    )

    # holt_linear's scan takes three actions over its input (head-row
    # collect, range-partitioner sample, localCheckpoint): land the
    # O(days) daily aggregate on scratch once (round-12) so those
    # actions read a tiny parquet instead of re-aggregating the fact
    # table each time.
    daily = scratch_materialize(
        _t(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("y")),
        "q137_daily",
    )
    out = holt_linear(daily, "d", "y", _HOLT_A, _HOLT_B)
    return out.select(
        "d", "y",
        rnd("level", 6).alias("level"),
        rnd("trend", 6).alias("trend"),
    )


# ---------------------------------------------------------------------------
# q139 — Kaplan-Meier survival for time-to-first-purchase with RIGHT
# CENSORING: the estimator product analytics ships next to retention
# (q105 counts fixed cohort offsets; KM handles subjects still
# event-free at the observation cutoff without biasing the curve).
# Subject = user; clock starts at the user's first event; the event is
# the first 'purchase'; observation ends 96 hours after entry — users
# whose first purchase lands later (or never) are censored at 96h, which
# on this corpus censors a real fraction (mean purchase gap ~2.3 days).
# Durations are integer HOURS (floor of the epoch difference — identical
# arithmetic both engines).
#
#   S(t) = prod_{t_i <= t} (1 - d_i / n_i)
#
# n_i (at risk) is a DESCENDING cumulative sum over the O(distinct
# durations) relation; the product is exp(sum(ln(factor))) with an
# explicit zero flag (ln(0) diverges between engines: NULL on Spark,
# -inf on DuckDB — the CASE keeps both out). Scale: one user_id
# aggregate over the fact table; everything after is O(<=97) rows, so
# the global windows run on a tiny relation — the q133 discipline.
# ---------------------------------------------------------------------------
_KM_CUT_H = 96


def _q139_sql(duck: bool) -> str:
    # epoch seconds, identical in both engines (q104's discipline)
    ep = (lambda t: f"epoch({t})") if duck else (
        lambda t: f"cast(cast({t} AS TIMESTAMP) AS DOUBLE)"
    )
    dur_h = (
        f"CAST(floor(({ep('u.fp')} - {ep('u.entry')}) / 3600.0) AS BIGINT)"
    )
    r = "(1.0 - d * 1.0 / n)"
    return f"""
    WITH per_user AS (
        SELECT user_id, min(ts) AS entry,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
        FROM events GROUP BY user_id
    ),
    obs AS (
        SELECT u.user_id,
               CASE WHEN u.fp IS NOT NULL AND {dur_h} <= {_KM_CUT_H}
                    THEN {dur_h} ELSE {_KM_CUT_H} END AS dur,
               CASE WHEN u.fp IS NOT NULL AND {dur_h} <= {_KM_CUT_H}
                    THEN 1 ELSE 0 END AS purchased
        FROM per_user u
    ),
    risk AS (
        SELECT dur AS t, CAST(sum(purchased) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS here
        FROM obs GROUP BY dur
    ),
    km AS (
        SELECT t, d,
               CAST(sum(here) OVER (
                   ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n
        FROM risk
    )
    SELECT CAST(t AS BIGINT) AS t_hours, n AS n_at_risk, d AS events,
           {rnd_sql(
               "CASE WHEN min(" + r + ") OVER cum <= 0 THEN 0.0 "
               "ELSE exp(sum(CASE WHEN " + r + " > 0 THEN ln(" + r + ") END) "
               "OVER cum) END", 6
           )} AS survival
    FROM km
    WINDOW cum AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """


@register(
    "q139_survival_curve",
    oracle=_q139_sql(duck=True),
    doc="Kaplan-Meier time-to-first-purchase with right censoring at 96 "
    "hours: at-risk via a descending cumulative sum, the product via "
    "exp-sum-ln with an engine-portable zero guard.",
    tags=("timeseries", "survival", "analytics"),
)
def q139_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_q139_sql(duck=False))
