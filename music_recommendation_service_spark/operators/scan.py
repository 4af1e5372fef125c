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


def _default_parts(df: DataFrame) -> int:
    """Scale-adaptive scan width: one fold task per upstream split, capped
    by the session's parallelism. The result is partitioning-independent
    (every width folds the same sequence), so width is purely a cost knob:
    a tiny series (a daily aggregate, a materialized O(days) relation)
    folds in one task instead of paying default-parallelism empty shuffle
    partitions and Python workers per pass, while a multi-split input
    still fans out to the full session width."""
    sc = df.sparkSession.sparkContext
    try:
        upstream = df.rdd.getNumPartitions()
    except Exception:
        upstream = sc.defaultParallelism
    return max(1, min(sc.defaultParallelism, upstream))


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
    parts = num_partitions or _default_parts(df)
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


# ---------------------------------------------------------------------------
# Matrix affine scan: the d-dimensional lift of linear_scan. State vectors
# s_i = A_i s_{i-1} + c_i cover what the scalar recurrence cannot: Holt's
# linear-trend smoothing (d=2: level+trend), damped-trend variants,
# second-order IIR filters, any constant-coefficient linear recurrence of
# order d rewritten in companion form. Affine maps over R^d compose
# associatively — (A2,c2)∘(A1,c1) = (A2@A1, A2@c1 + c2) — so the same
# two-pass segmented structure applies; within a partition the per-row
# prefix compositions run as a VECTORIZED Hillis-Steele scan (log2(n)
# einsum passes over (n,d,d) stacks) instead of a Python row loop.
# ---------------------------------------------------------------------------
def _mat_prefix(A: np.ndarray, c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inclusive prefix compositions P_i = f_i ∘ ... ∘ f_1 of the affine
    maps (A, c): returns (P, Q) with s_i = P_i @ s0 + Q_i. Hillis-Steele:
    log2(n) vectorized passes, no Python row loop."""
    P = A.copy()
    Q = c.copy()
    n = len(A)
    offset = 1
    while offset < n:
        # current map (suffix f_i..f_{i-offset+1}) composes AFTER the
        # earlier prefix ending at i-offset
        P_new = np.einsum("nij,njk->nik", P[offset:], P[:-offset])
        Q_new = (
            np.einsum("nij,nj->ni", P[offset:], Q[:-offset]) + Q[offset:]
        )
        P[offset:] = P_new
        Q[offset:] = Q_new
        offset *= 2
    return P, Q


def matrix_scan(
    df: DataFrame,
    order_col: str,
    a_cols: list,
    c_cols: list,
    init: list,
    out_cols: list,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact s_i = A_i @ s_{i-1} + c_i over ``df`` ordered by ``order_col``
    (globally unique). ``a_cols`` is the row-major d*d list of matrix
    entry columns, ``c_cols`` the d offset columns, ``init`` the length-d
    seed, ``out_cols`` the d output state column names (double).

    Cost: one range shuffle + two narrow passes (partition totals, then
    seeded per-row prefixes); the driver composes O(partitions) d x d
    maps. Partition-count independent by construction, same as
    :func:`linear_scan`."""
    d = len(c_cols)
    if len(a_cols) != d * d or len(init) != d or len(out_cols) != d:
        raise ValueError(
            f"matrix_scan: need d*d a_cols, d c_cols/init/out_cols (d={d})"
        )
    parts = num_partitions or _default_parts(df)
    sdf = (
        df.repartitionByRange(parts, F.col(order_col))
        .sortWithinPartitions(order_col)
        .localCheckpoint()
    )

    def arrays(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        n = len(pdf)
        A = np.empty((n, d, d), dtype=np.float64)
        for i in range(d):
            for j in range(d):
                A[:, i, j] = pdf[a_cols[i * d + j]].to_numpy(dtype=np.float64)
        c = np.empty((n, d), dtype=np.float64)
        for i in range(d):
            c[:, i] = pdf[c_cols[i]].to_numpy(dtype=np.float64)
        return A, c

    def pass_a(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        M = np.eye(d)
        B = np.zeros(d)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A, c = arrays(pdf)
            P, Q = _mat_prefix(A, c)
            # chunk total composes AFTER the accumulated total
            B = P[-1] @ B + Q[-1]
            M = P[-1] @ M
        yield pd.DataFrame(
            {"pid": [pid], "m": [M.ravel().tolist()], "b": [B.tolist()]}
        )

    affines = sdf.select(*a_cols, *c_cols).mapInPandas(
        pass_a, "pid int, m array<double>, b array<double>"
    ).collect()
    by_pid = {
        r["pid"]: (np.array(r["m"]).reshape(d, d), np.array(r["b"]))
        for r in affines
    }
    incoming: dict[int, list] = {}
    state = np.array(init, dtype=np.float64)
    for pid in range(parts):
        incoming[pid] = state.tolist()
        M, B = by_pid.get(pid, (np.eye(d), np.zeros(d)))
        state = M @ state + B
        if not np.all(np.isfinite(state)):
            raise ArithmeticError(
                f"matrix_scan diverged at partition {pid}: state={state}"
            )

    from pyspark.sql.types import DoubleType, StructField, StructType

    out_fields = sdf.schema.fieldNames() + list(out_cols)
    out_schema = StructType(
        list(sdf.schema.fields)
        + [StructField(o, DoubleType()) for o in out_cols]
    )

    def pass_b(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        acc = np.array(incoming.get(pid, init), dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A, c = arrays(pdf)
            P, Q = _mat_prefix(A, c)
            states = np.einsum("nij,j->ni", P, acc) + Q
            acc = states[-1]
            out = pdf.copy()
            for i, o in enumerate(out_cols):
                out[o] = states[:, i]
            yield out[out_fields]

    return sdf.mapInPandas(pass_b, out_schema)


def holt_linear(
    df: DataFrame,
    order_col: str,
    y_col: str,
    alpha: float,
    beta: float,
    level_col: str = "level",
    trend_col: str = "trend",
    num_partitions: int | None = None,
) -> DataFrame:
    """Holt's linear-trend exponential smoothing over the global order —
    the d=2 matrix recurrence the scalar EWMA cannot express:

        l_t = a*y_t + (1-a)*(l_{t-1} + b_{t-1})
        b_t = B*(l_t - l_{t-1}) + (1-B)*b_{t-1}

    In companion form s=(l,b): A = [[1-a, 1-a], [-a*B, 1-a*B]],
    c_t = (a*y_t, a*B*y_t). Initialization l_1 = y_1, b_1 = 0 is encoded
    ROW-WISE (the first row's map is A=0, c=(y_1, 0)) so no special-cased
    head pass exists — the scan stays one shuffle + two passes."""
    first = df.select(F.min(order_col).alias("o")).collect()
    if not first or first[0]["o"] is None:
        return df.withColumn(level_col, F.lit(None).cast("double")).withColumn(
            trend_col, F.lit(None).cast("double")
        )
    first_o = first[0]["o"]
    is_first = F.col(order_col) == F.lit(first_o)
    y = F.col(y_col).cast("double")
    a, b = float(alpha), float(beta)

    def sel(f, rest):
        return F.when(is_first, F.lit(f)).otherwise(F.lit(rest))

    prepared = (
        df.withColumn("__a00", sel(0.0, 1.0 - a))
        .withColumn("__a01", sel(0.0, 1.0 - a))
        .withColumn("__a10", sel(0.0, -a * b))
        .withColumn("__a11", sel(0.0, 1.0 - a * b))
        .withColumn("__c0", F.when(is_first, y).otherwise(F.lit(a) * y))
        .withColumn("__c1", F.when(is_first, F.lit(0.0)).otherwise(F.lit(a * b) * y))
    )
    out = matrix_scan(
        prepared,
        order_col,
        ["__a00", "__a01", "__a10", "__a11"],
        ["__c0", "__c1"],
        [0.0, 0.0],
        [level_col, trend_col],
        num_partitions=num_partitions,
    )
    return out.drop("__a00", "__a01", "__a10", "__a11", "__c0", "__c1")
