"""DuckDB-oracle comparison harness, mirroring the driver's t2 gate:
row-count + schema-shape + order-insensitive value comparison, with columns
sorted by name before comparing (so Spark/oracle column ORDER need not match,
but names and values must)."""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_run(sf_dir: str, sql: str):
    import os

    con = duckdb.connect()
    try:
        con.execute("SET TimeZone='UTC'")
        for t in TABLES:
            # driver testdata is one file per table; Spark-written twins
            # (scripts/make_sf1.py) are DIRECTORIES of part files
            p = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def _norm_cell(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return str(v) if not isinstance(v, (int,)) else v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def assert_matches_oracle(spark_df, sf_dir: str, oracle: str, name: str = "?"):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duck_run(sf_dir, oracle)

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    _, sc = _canon(s_cols, s_rows)
    _, dc = _canon(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(sc, dc)):
        assert a == b, f"{name}: row {i} differs\n  spark={a}\n  duck ={b}"
