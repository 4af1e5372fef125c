"""The named query catalog.

Every capability in SURVEY.md §2 (plus the large-scale pipeline extensions)
is an executable named query: a Spark builder ``(spark, sf_dir) -> DataFrame``
and, where SQL-expressible, a DuckDB oracle SQL twin producing identical
columns. The driver's correctness gate and the bench harness both consume
this registry.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over the pre-registered table views
    doc: str = ""
    bench: bool = False  # include in the headline bench suite
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
):
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the catalog."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QueryDef(name, fn, oracle, doc or fn.__doc__ or "", bench, tags)
        return fn

    return wrap


def registry() -> dict[str, QueryDef]:
    # Import side-effect modules once, on first use.
    from music_recommendation_service_spark.plans import (  # noqa: F401
        analytics_ext,
        asof,
        clustering,
        corpus_ops,
        dedup,
        graphops,
        multimodal,
        olap_ext,
        profiling,
        rangequery,
        pipeline_ops,
        reference_parity,
        relational,
        segmentation,
        textops,
        tpch_more,
        similarity,
        skewops,
        windows,
    )
    # Imported LAST: q115's oracle composes q05/q02 oracle texts out of the
    # registry at registration time, so reference_parity must already be in;
    # q142 (incremental_reco) composes q05's oracle the same way.
    from music_recommendation_service_spark.plans import (  # noqa: F401
        incremental_reco,
        music_domain,
    )

    return dict(_REGISTRY)
