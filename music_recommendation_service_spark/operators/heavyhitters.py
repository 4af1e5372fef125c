"""Exact distributed heavy hitters with bounded state: Misra-Gries
candidates + one exact verification pass.

The naive exact plan — ``groupBy(item).count()`` — shuffles the FULL item
vocabulary, which on a 100 TB token stream is itself enormous. The classic
two-pass trick (Misra-Gries '82; the "MG summary" of Cormode/Hadjieleftheriou
VLDB'08) bounds both state and shuffle:

pass 1  Each partition folds its items through a k-counter Misra-Gries
        summary (weighted update: per Arrow batch, ``value_counts`` then
        fold — O(unique-per-batch) work, k counters of state). Pigeonhole
        guarantee: any item with GLOBAL frequency > n/k has local frequency
        > n_p/k in at least one partition, and MG with k counters never
        evicts an item whose remaining local frequency exceeds n_p/(k+1) —
        so the union of per-partition survivors is a SUPERSET of the true
        heavy hitters. Shuffle volume: O(partitions x k), not O(vocab).

pass 2  Exact counts for candidates only (broadcast semi-join against the
        candidate set), filtered by the integer-exact test freq * k > n.
        Output is EXACT — the sketch only bounds the candidate set, it
        never decides membership — which is what makes the operator
        oracle-checkable value-for-value against plain SQL.

The reference has no sketch operators; this generalizes its exact
``GroupBy().Count()`` aggregations (SURVEY.md §2.4) to the cardinality
regime where the full-vocabulary shuffle stops being an option.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _mg_fold(counters: dict, item, weight: int, k: int) -> None:
    """Weighted Misra-Gries update: add, then if over k counters decrement
    all by the minimum and drop zeros (the batched form of the classic
    one-decrement-per-arrival rule; same survivor guarantee)."""
    counters[item] = counters.get(item, 0) + int(weight)
    if len(counters) > k:
        m = min(counters.values())
        for key in list(counters):
            c = counters[key] - m
            if c > 0:
                counters[key] = c
            else:
                del counters[key]


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: one row per surviving counter
    ``(item, lb)`` plus one ``(NULL, n_p)`` row carrying the partition's
    total item count, so the caller gets n without a second scan. At most
    ``k + 1`` rows leave each partition."""
    from pyspark.sql.types import LongType, StructField, StructType

    in_field = df.schema[col]
    out_schema = StructType(
        [
            StructField("item", in_field.dataType, True),
            StructField("lb", LongType(), False),
        ]
    )

    def summarize(batches):
        import pandas as pd

        counters: dict = {}
        total = 0
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            total += int(vc.sum())  # n counts non-null items only
            for item, c in vc.items():
                _mg_fold(counters, item, c, k)
        yield pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "lb": list(counters.values()) + [total],
            }
        )

    return df.select(col).mapInPandas(summarize, schema=out_schema)


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """EXACT items with frequency strictly greater than n/k (phi = 1/k
    heavy hitters) over ``df[col]``, with sketch-bounded intermediate
    state. Returns ``(item, freq)``. NULL items are ignored (SQL GROUP BY
    would keep them; a heavy-hitter report on a token column does not
    want a null bucket — filter upstream if it does)."""
    summaries = mg_candidates(df, col, k)
    # The (NULL, n_p) rows sum to n; the rest are candidates. One collect
    # of O(partitions x k) rows — the whole point of the sketch — with the
    # candidate set re-broadcast into the exact pass.
    rows = summaries.groupBy("item").agg(F.sum("lb").alias("lb")).collect()
    n = sum(r["lb"] for r in rows if r["item"] is None)
    cand = [r["item"] for r in rows if r["item"] is not None]
    if not cand or n == 0:
        return (
            df.select(F.col(col).alias("item"))
            .limit(0)
            .withColumn("freq", F.lit(0).cast("long"))
        )
    cand_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(c,) for c in cand], schema=summaries.select("item").schema
        )
    )
    exact = (
        df.select(F.col(col).alias("item"))
        .where(F.col("item").isNotNull())
        .join(cand_df, "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("freq"))
        # integer-exact threshold: freq > n/k  <=>  freq * k > n
        .where(F.col("freq") * F.lit(k) > F.lit(n))
    )
    return exact
