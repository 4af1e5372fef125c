"""Skew-mitigation join: explicit key salting.

AQE's skew-join splitting (on by default in the engine session) handles most
skew at runtime by splitting oversized shuffle partitions. Salting is the
static fallback for the cases AQE cannot fix: a single join KEY so hot that
one task would still own it after splitting (power-law keys at 100 TB), or
broadcast-ineligible build sides.

Mechanics: the big (probe) side gets a deterministic salt
``pmod(hash(key), factor)`` appended to the join key; the small (build) side
is replicated ``factor`` ways via a posexplode of 0..factor-1. The join key
becomes (key, salt): the hot key's rows spread across ``factor`` tasks, at
the cost of replicating the build side ``factor`` times — so keep the build
side the smaller input and the factor modest (8-32).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    factor: int = 16,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with ``factor``-way key
    salting. Result equals ``big.join(small, on, how)`` (column order: big
    columns then small's non-key columns). Supported: inner / left."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    salt = F.pmod(F.hash(F.col(on)), F.lit(factor))
    big_s = big.withColumn("__salt", salt)
    small_s = small.select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(factor)])).alias("__salt")
    )
    out = big_s.join(small_s, [on, "__salt"], how).drop("__salt")
    return out
