"""Skew-handling operators: salting for hot keys.

Spark's own defenses cover most skew — AQE splits skewed sort-merge join
partitions and partial aggregation collapses per-key volume map-side — but
two shapes still serialize on one reducer at 100 TB:

- a shuffle JOIN whose hot key exceeds what AQE's split granularity can
  balance and whose dimension side is too big to broadcast;
- a KEYED AGGREGATE whose per-key partial state is itself large (so
  map-side combine doesn't shrink the hot key's traffic).

Salting is the classical fix, made explicit here as composable operators
(the reference has no equivalent — its 1-core cluster never meets skew;
SURVEY.md §4.2 flags the self-join explosion as the scale hazard):

- ``salted_join``: replicate the build side ``n_salts`` times, scatter the
  probe side uniformly, equi-join on (keys + salt). Hot-key rows spread
  over ``n_salts`` reducers at the cost of replicating the build side.
- ``salted_aggregate``: two-phase aggregation — partials on
  (keys + salt), then combine on keys. The hot key's final combine reads
  ``n_salts`` partial rows instead of every raw row.

Both are EXACT rewrites (algebraic aggregates only), proven by DuckDB
oracle parity in the q89/q90 registry queries and by property tests.
The salt is deterministic (xxhash64 of the full row, mod ``n_salts``), so
plans replay identically — no RNG state in a distributed computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (phase-1 partial, phase-2 combine) per supported aggregate. AVG is
# deliberately absent as a primitive: derive it as sum/count — averaging
# partials would need weighting, the classic distributed-agg bug.
_ALGEBRAIC = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase keyed aggregation: ``aggs`` is ``[(out_col, in_col, fn)]``
    with fn in {count, sum, min, max}. Exactly equal to
    ``df.groupBy(keys).agg(...)`` for these algebraic functions.
    """
    unknown = [fn for _, _, fn in aggs if fn not in _ALGEBRAIC]
    if unknown:
        raise ValueError(f"non-algebraic aggregate(s) {unknown}; salting would be wrong")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            *[
                _ALGEBRAIC[fn][0](F.lit(1) if col == "*" else col).alias(out)
                for out, col, fn in aggs
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[_ALGEBRAIC[fn][1](out).alias(out) for out, _, fn in aggs]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the RIGHT side replicated ``n_salts`` times and the
    LEFT side scattered uniformly — each hot join key spreads across
    ``n_salts`` reducers instead of serializing on one.

    The left's salt hashes the FULL row, never the join key: a key-derived
    salt is constant per key, so the hot key's rows would all still share
    one (key, salt) bucket and nothing would spread (the subtle way salting
    is usually implemented wrong).

    Cost model: right-side shuffle volume multiplies by ``n_salts``; use
    when the left is large AND hot-keyed AND the right is too big to
    broadcast but far smaller than the left (the fact ⋈ mid-size-dim shape).
    Only ``inner`` and ``left`` are exact under replication (an unmatched
    right row would appear ``n_salts`` times in right/full outer joins).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r}: only inner/left are exact under salting")
    on = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_salted.join(r_salted, [*on, "_salt"], how).drop("_salt")
