"""Minimal SQL dialect layer for engine-portable generated queries.

Spark SQL and DuckDB agree on md5/instr/substring/concat_ws/CASE/joins/
window functions; they differ in list-function spellings and array literal
syntax. Queries generated against this table produce ONE SQL text per
dialect, so the DuckDB oracle pins the exact semantics of the Spark plan —
including hash values and tie-breaks.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession


def _spark_arrlit(vals: Iterable[float]) -> str:
    inner = ", ".join(f"CAST({v!r} AS DOUBLE)" for v in vals)
    return f"array({inner})"


def _duck_arrlit(vals: Iterable[float]) -> str:
    inner = ", ".join(repr(float(v)) for v in vals)
    return f"CAST([{inner}] AS DOUBLE[])"


SPARK = {
    "name": "spark",
    "lt": "transform",          # list transform
    "lf": "filter",             # list filter
    "len": "size",              # list length
    "ldistinct": "array_distinct",
    "lmin": lambda l: f"array_min({l})",
    "elem": lambda l, i: f"element_at({l}, {i})",
    "seq": lambda a, b: f"sequence({a}, {b})",          # inclusive
    "shr": lambda x, b: f"shiftright({x}, {b})",
    "shl": lambda x, b: f"shiftleft({x}, {b})",
    "xor": lambda a, b: f"({a} ^ {b})",
    "idiv": lambda a, b: f"({a} DIV {b})",
    "explode": lambda e, al: f"explode({e}) AS {al}",
    "split": lambda c: f"split({c}, ' ')",
    "lhead": lambda l, k: f"slice({l}, 1, {k})",        # first k elements
    "ljoin": lambda l, sep: f"array_join({l}, '{sep}')",
    "dblarr": lambda c: f"CAST({c} AS ARRAY<DOUBLE>)",
    "arrlit": _spark_arrlit,
    "dot": lambda a, b: (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        f" CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    ),
}

DUCK = {
    "name": "duck",
    "lt": "list_transform",
    "lf": "list_filter",
    "len": "len",
    "ldistinct": "list_distinct",
    "lmin": lambda l: f"list_aggregate({l}, 'min')",
    "elem": lambda l, i: f"{l}[{i}]",
    "seq": lambda a, b: f"range({a}, ({b}) + 1)",       # range is exclusive
    "shr": lambda x, b: f"({x} >> {b})",
    "shl": lambda x, b: f"({x} << {b})",
    "xor": lambda a, b: f"xor({a}, {b})",
    "idiv": lambda a, b: f"({a} // {b})",
    "explode": lambda e, al: f"unnest({e}) AS {al}",
    "split": lambda c: f"string_split({c}, ' ')",
    "lhead": lambda l, k: f"list_slice({l}, 1, {k})",
    "ljoin": lambda l, sep: f"array_to_string({l}, '{sep}')",
    "dblarr": lambda c: f"CAST({c} AS DOUBLE[])",
    "arrlit": _duck_arrlit,
    "dot": lambda a, b: f"list_dot_product({a}, {b})",
}


def register_sql(name: str, gen, tables: tuple[str, ...], **kw):
    """Register a dialect-generated SQL query in the plan catalog: Spark
    runs ``gen(SPARK)`` over temp views; the oracle is ``gen(DUCK)``."""
    from music_recommendation_service_spark.plans import register
    from music_recommendation_service_spark.sources.catalog import load_table

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        for t in tables:
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        return spark.sql(gen(SPARK))

    build.__name__ = name
    register(name, oracle=gen(DUCK), **kw)(build)
