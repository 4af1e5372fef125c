"""Bucketed tables -> co-located joins: pre-shuffling to a bucketed layout
removes the Exchange from every subsequent equi-join on the bucket key —
the amortize-one-shuffle-across-many-queries strategy for 100 TB fact
tables (SURVEY §4.2 / engine scale notes)."""

from __future__ import annotations

import contextlib
import io
import uuid

from music_recommendation_service_spark.sources.catalog import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_cust = f"orders_b_{suffix}", f"customer_b_{suffix}"
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable(t_orders)
    c.write.bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable(t_cust)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob, cb = spark.table(t_orders), spark.table(t_cust)
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        # both sides read bucketed: the equi-join needs NO shuffle
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and the result is still correct
        assert joined.count() == o.join(c, o.o_custkey == c.c_custkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_cust}")
