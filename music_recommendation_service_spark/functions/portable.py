"""Cross-engine-stable numeric expressions.

Floating-point aggregates (sum/avg over doubles) differ between engines at
the ulp level because summation order is not associative; worse, exact
decimal results (e.g. avg = sum_of_cents/40 = 4190.83825) sit EXACTLY on a
rounding boundary, where Spark's binary-value HALF_UP and DuckDB's
shortest-decimal rounding disagree.

``rnd`` therefore rounds ``x + 1e-9``: the epsilon pushes values off the
decimal lattice, so (a) boundary values round the same way everywhere and
(b) cross-engine ulp noise (~1e-12) can no longer flip the rounded digit.
Raw stored doubles (simple projections) must NOT be rounded at all — they
are already bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPS = 1e-9


def rnd(c: Column | str, p: int = 2) -> Column:
    """Engine-portable rounding of a derived double aggregate."""
    col = F.col(c) if isinstance(c, str) else c
    return F.round(col + F.lit(EPS), p)


def rnd_sql(expr: str, p: int = 2) -> str:
    """DuckDB twin of :func:`rnd` for oracle SQL strings."""
    return f"round(({expr}) + 1e-9, {p})"
