"""linear_scan / ewma_recursive: the distributed affine prefix scan.

Ground truth is the literal sequential recurrence (and pandas ewm for the
EWMA wrapper). The load-bearing claims: exactness vs the loop, partition-
count invariance, robustness where the windowed pow-weight identity
(q121's in-SQL formulation) would overflow, and the vectorized block
fold agreeing with the sequential fallback around zeros/extreme damping.
"""

import numpy as np
import pandas as pd
import pytest

from music_recommendation_service_spark.operators.scan import (
    _fold_arrays,
    ewma_recursive,
    linear_scan,
)


def _loop(m, b, s0):
    out = np.empty_like(b)
    acc = s0
    for i in range(len(b)):
        acc = m[i] * acc + b[i]
        out[i] = acc
    return out


def test_fold_arrays_matches_loop_random():
    rng = np.random.default_rng(7)
    m = rng.uniform(0.2, 1.8, size=5000)
    b = rng.normal(size=5000)
    got, tail = _fold_arrays(m, b, 0.5)
    want = _loop(m, b, 0.5)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
    assert tail == got[-1]


def test_fold_arrays_zero_and_extreme_m_fall_back_exactly():
    rng = np.random.default_rng(8)
    m = rng.uniform(0.5, 1.5, size=1000)
    m[100] = 0.0          # hard reset inside a block
    m[400:600] = 1e-3     # strong damping: cumprod underflows the identity
    b = rng.normal(size=1000)
    got, _ = _fold_arrays(m, b, 2.0)
    want = _loop(m, b, 2.0)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_linear_scan_matches_loop(spark):
    rng = np.random.default_rng(11)
    n = 20000
    m = rng.uniform(0.3, 1.6, size=n)
    b = rng.normal(size=n)
    pdf = pd.DataFrame({"seq": np.arange(n), "m": m, "b": b})
    df = spark.createDataFrame(pdf)
    out = (
        linear_scan(df, "seq", "m", "b", init=1.0, num_partitions=8)
        .orderBy("seq")
        .select("state")
        .toPandas()["state"]
        .to_numpy()
    )
    np.testing.assert_allclose(out, _loop(m, b, 1.0), rtol=1e-8, atol=1e-8)


def test_linear_scan_partition_count_invariant(spark):
    rng = np.random.default_rng(13)
    n = 5000
    pdf = pd.DataFrame(
        {"seq": np.arange(n),
         "m": rng.uniform(0.5, 1.4, size=n),
         "b": rng.normal(size=n)}
    )
    df = spark.createDataFrame(pdf)
    one = (
        linear_scan(df, "seq", "m", "b", num_partitions=1)
        .orderBy("seq").toPandas()["state"].to_numpy()
    )
    many = (
        linear_scan(df, "seq", "m", "b", num_partitions=16)
        .orderBy("seq").toPandas()["state"].to_numpy()
    )
    np.testing.assert_allclose(one, many, rtol=1e-10, atol=1e-10)


def test_ewma_matches_pandas_and_survives_long_series(spark):
    """300k rows at alpha=0.3: r^-rn in the windowed identity would hit
    0.7**-300000 ~ inf; the affine scan stays exact end to end."""
    rng = np.random.default_rng(17)
    n = 300_000
    x = rng.normal(loc=100.0, scale=20.0, size=n)
    pdf = pd.DataFrame({"seq": np.arange(n), "x": x})
    df = spark.createDataFrame(pdf)
    got = (
        ewma_recursive(df, "seq", "x", alpha=0.3, num_partitions=12)
        .orderBy("seq").toPandas()["ewma"].to_numpy()
    )
    want = pd.Series(x).ewm(alpha=0.3, adjust=False).mean().to_numpy()
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_ewma_empty_input(spark):
    df = spark.createDataFrame([], "seq long, x double")
    out = ewma_recursive(df, "seq", "x", alpha=0.5)
    assert out.count() == 0
    assert "ewma" in out.columns


def test_linear_scan_divergence_raises(spark):
    n = 4000
    pdf = pd.DataFrame({"seq": np.arange(n), "m": np.full(n, 2.0),
                        "b": np.full(n, 1.0)})
    df = spark.createDataFrame(pdf)
    with pytest.raises(ArithmeticError):
        linear_scan(df, "seq", "m", "b", init=1.0, num_partitions=4).count()


# --- matrix affine scan (d=2) ----------------------------------------------


def test_matrix_scan_matches_python_across_partitions(spark):
    """Random per-row 2x2 affine maps: the distributed scan equals the
    sequential recursion at every row, identically across 1/3/8
    partitions (the segmented structure is partition-independent)."""
    import numpy as np

    from music_recommendation_service_spark.operators.scan import matrix_scan

    rng = np.random.default_rng(7)
    n, d = 137, 2
    A = rng.uniform(-0.9, 0.9, (n, d, d))
    c = rng.uniform(-1, 1, (n, d))
    s = np.zeros(d)
    seq = []
    for i in range(n):
        s = A[i] @ s + c[i]
        seq.append(s.copy())
    seq = np.array(seq)
    df = spark.createDataFrame(
        [(i, *A[i].ravel().tolist(), *c[i].tolist()) for i in range(n)],
        ["t", "a00", "a01", "a10", "a11", "c0", "c1"],
    )
    for parts in (1, 3, 8):
        out = matrix_scan(
            df, "t", ["a00", "a01", "a10", "a11"], ["c0", "c1"],
            [0.0, 0.0], ["s0", "s1"], num_partitions=parts,
        )
        got = np.array(
            [(r["s0"], r["s1"]) for r in out.orderBy("t").collect()]
        )
        assert np.abs(got - seq).max() < 1e-9, f"parts={parts}"


def test_holt_linear_matches_recursion(spark):
    """Holt level+trend over a 300-row series equals the literal recurrence
    (l_1=y_1, b_1=0) — the shape the windowed EWMA identity cannot
    express because each state feeds the next."""
    import numpy as np

    from music_recommendation_service_spark.operators.scan import holt_linear

    rng = np.random.default_rng(11)
    y = rng.uniform(0, 100, 300)
    a, b = 0.4, 0.2
    l, tr = y[0], 0.0
    exp = [(l, tr)]
    for t in range(1, len(y)):
        l_new = a * y[t] + (1 - a) * (l + tr)
        tr = b * (l_new - l) + (1 - b) * tr
        l = l_new
        exp.append((l, tr))
    exp = np.array(exp)
    df = spark.createDataFrame(
        [(i, float(y[i])) for i in range(len(y))], ["t", "y"]
    )
    out = holt_linear(df, "t", "y", a, b, num_partitions=5)
    got = np.array(
        [(r["level"], r["trend"]) for r in out.orderBy("t").collect()]
    )
    assert np.abs(got - exp).max() < 1e-9


def test_holt_linear_empty_series(spark):
    from music_recommendation_service_spark.operators.scan import holt_linear

    df = spark.createDataFrame([], "t long, y double")
    out = holt_linear(df, "t", "y", 0.5, 0.3)
    assert out.count() == 0 and "level" in out.columns


def test_default_parts_adapts_to_upstream_splits(spark):
    """Round-12: the scan's default width derives from the input's split
    count (capped by the session parallelism), not a flat
    defaultParallelism — a tiny series folds in one task per pass, and
    the default-width result matches an explicit wide scan exactly."""
    from music_recommendation_service_spark.operators.scan import (
        _default_parts,
        holt_linear,
    )

    tiny = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(30)], ["t", "y"]
    ).coalesce(1)
    assert _default_parts(tiny) == 1
    par = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 100000, 1, par * 4).selectExpr(
        "id AS t", "CAST(id % 11 AS DOUBLE) AS y"
    )
    assert _default_parts(wide) == par  # capped at session parallelism

    got = {
        r["t"]: (r["level"], r["trend"])
        for r in holt_linear(tiny, "t", "y", 0.5, 0.3).collect()
    }
    want = {
        r["t"]: (r["level"], r["trend"])
        for r in holt_linear(
            tiny, "t", "y", 0.5, 0.3, num_partitions=16
        ).collect()
    }
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k][0] - want[k][0]) < 1e-9
        assert abs(got[k][1] - want[k][1]) < 1e-9
