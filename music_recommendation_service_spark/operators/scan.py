"""Distributed linear-recurrence prefix scan (segmented affine composition).

Computes s_i = m_i * s_{i-1} + b_i over a GLOBALLY ordered series — the
recurrence behind recursive EWMA, leaky integrators, compound growth,
IIR smoothing — without bringing the series to one executor.

Why this exists: the windowed pow-weight identity used by the catalog's
per-key EWMA (plans/analytics_ext.py q121) overflows double once a single
key's series passes ~2000 rows (r^-rn explodes), and a naive implementation
of the recurrence is inherently sequential. But each row's update is the
affine map f_i(s) = m_i*s + b_i, and affine maps COMPOSE associatively:

    (f_j .. f_i) (s) = M*s + B   with  M = prod(m), B = f-chain of b's.

So the classic two-pass segmented scan applies, Spark-shaped:

  1. range-partition by the order column, sort within partitions,
     localCheckpoint (both passes must see identical partition contents);
  2. pass A (mapInPandas): each partition folds its rows into ONE (M, B)
     pair — O(rows) work, O(1) output;
  3. the driver prefix-composes the P partition pairs (P ~ hundreds even
     on a 1000-executor cluster: trivial) into each partition's incoming
     state;
  4. pass B (mapInPandas): each partition re-folds its rows seeded with
     its incoming state, emitting the exact per-row states.

Total: one range shuffle + two linear passes, any series length, any
partition count. The result is MATHEMATICALLY independent of partitioning
(every partition folds the same row sequence); numerically it agrees
across partition counts to float tolerance (pinned at rtol 1e-10) — not
bit-for-bit, because block boundaries of the vectorized fold restart per
partition and shift rounding at the last-ulp level.

Numerics: within a partition the fold is vectorized in blocks via the
cumprod/cumsum identity s = P*(s0 + cumsum(b/P)); a block whose running
product leaves [1e-200, 1e200] (strong damping/growth would over/underflow
the identity's intermediate terms) falls back to the exact sequential loop
for that block only. Block size 128 keeps the vectorized path active for
all |m| in [~0.03, ~36].
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BLOCK = 128
_SAFE_LO, _SAFE_HI = 1e-200, 1e200


def _fold_block(m: np.ndarray, b: np.ndarray, s0: float) -> tuple[np.ndarray, float]:
    """States for one block given incoming state s0; vectorized when safe."""
    P = np.cumprod(m)
    lo = np.min(np.abs(P))
    hi = np.max(np.abs(P))
    if lo > _SAFE_LO and hi < _SAFE_HI and np.all(P != 0.0):
        s = P * (s0 + np.cumsum(b / P))
        return s, float(s[-1])
    # Exact sequential fallback (zeros / extreme damping or growth).
    s = np.empty_like(b)
    acc = s0
    for i in range(len(b)):
        acc = m[i] * acc + b[i]
        s[i] = acc
    return s, float(acc)


def _fold_arrays(m: np.ndarray, b: np.ndarray, s0: float) -> tuple[np.ndarray, float]:
    out = np.empty_like(b)
    acc = s0
    for lo in range(0, len(b), _BLOCK):
        hi = lo + _BLOCK
        out[lo:hi], acc = _fold_block(m[lo:hi], b[lo:hi], acc)
    return out, acc


def linear_scan(
    df: DataFrame,
    order_col: str,
    m_col: str,
    b_col: str,
    init: float = 0.0,
    out_col: str = "state",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact s_i = m_i*s_{i-1} + b_i over ``df`` ordered by ``order_col``.

    Returns the input columns plus ``out_col`` (double). ``order_col`` must
    be globally unique (it defines the sequence). Cost: one range shuffle
    + two narrow passes; partition-count independent by construction.
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    sdf = (
        df.repartitionByRange(parts, F.col(order_col))
        .sortWithinPartitions(order_col)
        .localCheckpoint()  # pin identical partition contents for both passes
    )
    m_name, b_name = m_col, b_col

    def pass_a(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        big_m, big_b = 1.0, 0.0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = pdf[m_name].to_numpy(dtype=np.float64)
            b = pdf[b_name].to_numpy(dtype=np.float64)
            _, tail = _fold_arrays(m, b, 0.0)
            big_m_chunk = float(np.prod(m))
            # compose chunk after accumulated: s -> chunk(acc(s))
            big_b = big_m_chunk * big_b + tail
            big_m = big_m * big_m_chunk
        yield pd.DataFrame({"pid": [pid], "m": [big_m], "b": [big_b]})

    affines = sdf.select(m_name, b_name).mapInPandas(
        pass_a, "pid int, m double, b double"
    ).collect()
    # Driver prefix-compose: P rows, P = partition count — trivially small.
    by_pid = {r["pid"]: (r["m"], r["b"]) for r in affines}
    incoming: dict[int, float] = {}
    state = float(init)
    for pid in range(parts):
        incoming[pid] = state
        m, b = by_pid.get(pid, (1.0, 0.0))
        state = m * state + b
        if not math.isfinite(state):
            raise ArithmeticError(
                f"linear_scan diverged at partition {pid}: state={state}"
            )
    inc = {k: float(v) for k, v in incoming.items()}

    from pyspark.sql.types import DoubleType, StructField, StructType

    out_fields = sdf.schema.fieldNames() + [out_col]
    out_schema = StructType(list(sdf.schema.fields) + [StructField(out_col, DoubleType())])

    def pass_b(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        acc = inc.get(pid, float(init))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = pdf[m_name].to_numpy(dtype=np.float64)
            b = pdf[b_name].to_numpy(dtype=np.float64)
            states, acc = _fold_arrays(m, b, acc)
            out = pdf.copy()
            out[out_col] = states
            yield out[out_fields]

    return sdf.mapInPandas(pass_b, out_schema)


def ewma_recursive(
    df: DataFrame,
    order_col: str,
    x_col: str,
    alpha: float,
    out_col: str = "ewma",
    num_partitions: int | None = None,
) -> DataFrame:
    """Recursive (adjust=False) EWMA of ``x_col`` over the global order:
    s_1 = x_1, s_i = (1-alpha)*s_{i-1} + alpha*x_i — pandas
    ``Series.ewm(alpha, adjust=False).mean()`` semantics, distributed.

    Seeding s_0 = x_1 makes the first update a fixed point (s_1 = x_1),
    which costs one tiny head-row job instead of a special-cased first row.
    """
    first = (
        df.select(order_col, x_col).orderBy(order_col).limit(1).collect()
    )
    if not first:
        return df.withColumn(out_col, F.lit(None).cast("double"))
    init = float(first[0][x_col])
    prepared = df.withColumn("__m", F.lit(1.0 - alpha)).withColumn(
        "__b", F.lit(alpha) * F.col(x_col).cast("double")
    )
    out = linear_scan(
        prepared, order_col, "__m", "__b",
        init=init, out_col=out_col, num_partitions=num_partitions,
    )
    return out.drop("__m", "__b")
