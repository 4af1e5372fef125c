"""Customer/event segmentation analytics: RFM quartile segments and
U-shaped (position-based) touch attribution.

Both are staples of the analytics layer a recommendation product ships
around its models — the reference serves raw recommendations
(``RecommendationService.cs:20-102``) but any production deployment also
answers "which customers are worth retaining" (RFM) and "which touchpoints
drive conversions" (attribution). Expressed as portable SQL through the
dialect layer so the DuckDB oracle pins tie-breaks exactly.

Scale notes (100 TB):
- q144's three NTILE windows are global sorts, but over the PER-CUSTOMER
  aggregate (O(customers) rows), never the order fact — the group-by
  reduces first, and customers are orders of magnitude fewer than orders.
  (At billions of customers swap NTILE for approx_percentile cut points;
  the aggregate-first shape is what makes either viable.)
- q145 sessionizes with one user-partitioned window (lag + running sum),
  the same single-shuffle shape as q75/q129; credit assignment is pure
  row-local arithmetic afterward, and the final rollup is O(event types).
"""

from __future__ import annotations

from music_recommendation_service_spark.functions import rnd_sql
from music_recommendation_service_spark.functions.dialect import register_sql


# ---------------------------------------------------------------------------
# q144 — RFM segmentation: per customer recency (days since their last
# order, against the dataset's max order date as the deterministic "now"),
# frequency (order count), monetary (total spend); quartile-score each
# dimension with NTILE(4) (deterministic custkey tie-break), then profile
# every R-F-M segment. Quartile convention: score 1 is BEST (most recent /
# most frequent / highest spend), the common RFM labeling.
# ---------------------------------------------------------------------------
def _q144(d: dict) -> str:
    dd = (
        (lambda a, b: f"date_diff('day', {a}, {b})")
        if d["name"] == "duck"
        else (lambda a, b: f"datediff({b}, {a})")
    )
    return f"""
    WITH base AS (
        SELECT o_custkey AS custkey,
               max(o_orderdate) AS last_order,
               CAST(count(*) AS BIGINT) AS n_orders,
               -- integer cents PER ROW before any sum: float-sum fold
               -- order differs between engines (boundary customers would
               -- flip NTILE quartiles and segment averages at sf1);
               -- integer sums stay exact (< 2^53) in both, so ranking and
               -- averages are bit-identical
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS monetary_c
        FROM orders GROUP BY o_custkey
    ),
    anchor AS (SELECT max(last_order) AS now_d FROM base),
    scored AS (
        SELECT custkey,
               CAST({dd('b.last_order', 'a.now_d')} AS BIGINT) AS recency_d,
               n_orders, monetary_c,
               ntile(4) OVER (ORDER BY {dd('b.last_order', 'a.now_d')} ASC,
                              custkey) AS r,
               ntile(4) OVER (ORDER BY n_orders DESC, custkey) AS f,
               ntile(4) OVER (ORDER BY monetary_c DESC, custkey) AS m
        FROM base b CROSS JOIN anchor a
    )
    SELECT concat(CAST(r AS STRING), '-', CAST(f AS STRING), '-',
                  CAST(m AS STRING)) AS segment,
           CAST(count(*) AS BIGINT)  AS n_customers,
           {rnd_sql('avg(recency_d)', 6)} AS avg_recency_d,
           {rnd_sql('avg(n_orders)', 6)}  AS avg_orders,
           {rnd_sql('avg(monetary_c) / 100.0', 4)} AS avg_monetary
    FROM scored
    GROUP BY r, f, m
    ORDER BY n_customers DESC, segment
    """


def _q144_gen(d: dict) -> str:
    sql = _q144(d)
    if d["name"] == "duck":
        # DuckDB spells CAST AS STRING as VARCHAR
        sql = sql.replace("AS STRING", "AS VARCHAR")
    return sql


register_sql(
    "q144_rfm_segmentation",
    _q144_gen,
    ("orders",),
    doc="RFM quartile segments (NTILE over per-customer aggregates, "
    "deterministic tie-breaks): segment sizes and mean R/F/M profiles.",
    tags=("analytics", "segmentation", "rfm", "windows"),
)


# ---------------------------------------------------------------------------
# q145 — U-shaped (position-based) touch attribution: gap-sessionize each
# user's event stream (30-min inactivity boundary, q75's discipline); in
# sessions that CONVERT (contain a purchase), every non-purchase touch
# shares the session's purchase value — 100% to a lone touch, 50/50 for
# two, otherwise 40% first / 40% last / 20% split across middles. Rollup:
# credited value per touch event_type. Deterministic ordering: (ts,
# event_id) everywhere.
# ---------------------------------------------------------------------------
def _q145(d: dict) -> str:
    ep = (
        (lambda t: f"epoch({t})")
        if d["name"] == "duck"
        else (lambda t: f"cast(cast({t} AS TIMESTAMP) AS DOUBLE)")
    )
    return f"""
    WITH ev AS (
        SELECT user_id, ts, event_id, event_type, value,
               CASE WHEN {ep('ts')} - {ep('lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)')}
                         > 1800 THEN 1 ELSE 0 END AS boundary
        FROM events
    ),
    sess AS (
        SELECT user_id, ts, event_id, event_type, value,
               sum(boundary) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM ev
    ),
    conv AS (
        SELECT user_id, session_id,
               sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
                   AS conv_value,
               CAST(sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_touch
        FROM sess GROUP BY user_id, session_id
    ),
    touches AS (
        SELECT s.event_type, c.conv_value, c.n_touch,
               row_number() OVER (
                   PARTITION BY s.user_id, s.session_id
                   ORDER BY s.ts, s.event_id
               ) AS pos
        FROM sess s
        JOIN conv c
          ON s.user_id = c.user_id AND s.session_id = c.session_id
        WHERE s.event_type <> 'purchase'
          AND c.conv_value > 0 AND c.n_touch > 0
    ),
    credited AS (
        SELECT event_type,
               conv_value * (
                   CASE
                       WHEN n_touch = 1 THEN 1.0
                       WHEN n_touch = 2 THEN 0.5
                       WHEN pos = 1 OR pos = n_touch THEN 0.4
                       ELSE 0.2 / (n_touch - 2)
                   END
               ) AS credit
        FROM touches
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT)        AS n_credited_touches,
           {rnd_sql('sum(credit)', 4)}     AS credited_value
    FROM credited
    GROUP BY event_type
    ORDER BY credited_value DESC, event_type
    """


register_sql(
    "q145_touch_attribution",
    _q145,
    ("events",),
    doc="U-shaped position-based attribution over 30-min gap sessions: "
    "credited purchase value per touch event type (40/20/40 split).",
    tags=("analytics", "attribution", "sessionization", "windows"),
)
