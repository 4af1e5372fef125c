"""Range (interval) join — point-in-interval matching, the second join
family the Spark DataFrame API lacks as a primitive (with as-of,
operators/asof.py).

Naive formulation ``L.v BETWEEN R.lo AND R.hi`` has no equi key, so Spark
plans a broadcast-nested-loop or cartesian — O(|L| x |R|) comparisons.
This implementation is grid bucketing: pick a bucket width, map each left
point to its bucket, explode each right interval to every bucket it covers,
equi-join on the bucket id, then apply the exact interval predicate as a
residual filter.

Scale design
------------
- One equi-join shuffle keyed by bucket id; work is O(|L| + |R| x spread + M)
  where spread = avg interval width / bucket width and M = true matches.
  Pick ``bucket_width`` near the median interval width: smaller wastes
  replication, larger wastes residual comparisons.
- Interval explosion is a JVM-side ``sequence`` — no Python, no UDF.
- Skewed buckets (a bucket holding many intervals) are ordinary join skew:
  AQE splits them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lo: str,
    hi: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join left rows to right rows where ``lo <= point < hi``.

    Output: all left columns + all right columns. ``how``: inner only (the
    outer variants compose from an anti-join on the same plan).
    """
    if how != "inner":
        raise ValueError("range_join supports inner; compose outer via anti-join")
    lb = F.floor(F.col(point) / bucket_width).cast("long")
    left_b = left.withColumn("__bucket", lb)
    # exact half-open semantics: a hi on a bucket boundary never matches, so
    # its bucket needn't be generated; floor((hi - epsilon)/w) is captured by
    # floor(hi/w) and the residual filter removes false positives.
    right_b = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / bucket_width).cast("long"),
                F.floor(F.col(hi) / bucket_width).cast("long"),
            )
        ),
    )
    return (
        left_b.join(right_b, "__bucket")
        .filter((F.col(point) >= F.col(lo)) & (F.col(point) < F.col(hi)))
        .drop("__bucket")
    )
