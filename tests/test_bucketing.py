"""Bucketed-table co-location: the write-once-shuffle, join-many-times
layout. These tests pin the PLAN contracts that make bucketing worth its
write cost at 100 TB: a same-bucketing equi-join and a bucket-key groupBy
run with ZERO Exchange, a half-bucketed join shuffles only the unbucketed
side, and a bucket-key point filter scans 1/N buckets."""

from __future__ import annotations

import contextlib

import pytest

from music_recommendation_service_spark.sources.catalog import load_table
from music_recommendation_service_spark.sources.writers import write_bucketed


@contextlib.contextmanager
def _no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    t_orders = write_bucketed(
        orders, "bk_orders", 8, ("o_orderkey",), ("o_orderkey",),
        path=str(base / "orders"),
    )
    t_line = write_bucketed(
        lineitem, "bk_lineitem", 8, ("l_orderkey",), ("l_orderkey",),
        path=str(base / "lineitem"),
    )
    yield t_orders, t_line, orders, lineitem
    for t in ("bk_orders", "bk_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_cobucketed_join_no_exchange(spark, bucketed):
    t_orders, t_line, orders, lineitem = bucketed
    with _no_broadcast(spark):
        j = t_orders.join(t_line, t_orders.o_orderkey == t_line.l_orderkey)
        plan = _formatted(j)
        assert "Exchange" not in plan, plan
        # correctness: identical to the unbucketed join
        want = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert j.count() == want


def test_half_bucketed_join_shuffles_only_probe_side(spark, bucketed):
    t_orders, _, _, lineitem = bucketed
    with _no_broadcast(spark):
        j = t_orders.join(lineitem, t_orders.o_orderkey == lineitem.l_orderkey)
        plan = _formatted(j)
        n_ex = sum(
            1
            for l in plan.splitlines()
            if l.strip().startswith("(") and l.strip().endswith(" Exchange")
        )
        assert n_ex == 1, plan


def test_bucket_key_groupby_no_exchange(spark, bucketed):
    t_line = bucketed[1]
    agg = t_line.groupBy("l_orderkey").count()
    plan = _formatted(agg)
    assert "Exchange" not in plan, plan


def test_bucket_pruning_on_point_filter(spark, bucketed):
    # autoBucketedScan turns the bucketed layout OFF for plans with no
    # join/agg to co-locate (a plain filter-scan), which also forfeits
    # bucket pruning; pin it on to assert the pruning contract itself.
    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try:
        t_orders = bucketed[0]
        key = t_orders.select("o_orderkey").first()[0]
        plan = _formatted(t_orders.filter(t_orders.o_orderkey == key))
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.set(conf, old)
