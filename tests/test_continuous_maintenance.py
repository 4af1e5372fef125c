"""Continuous view maintenance: snapshot table -> snapshot STREAM source ->
foreachBatch -> maintained snapshot view (streaming/pipeline.py
maintain_on_commit). Closes the lake loop the round-7 maintenance family
left pull-based: commits on the fact table PUSH the maintainer, and both
layers are exactly-once (stream checkpoint dedups notifications, the
maintenance cursor dedups applications)."""

import os
import time

import pytest
from pyspark.sql import functions as F

from music_recommendation_service_spark.sources import snapshots as sn
from music_recommendation_service_spark.streaming.pipeline import (
    maintain_on_commit,
    snapshot_table_stream,
)


def _mk_fact(spark, path, lo, hi):
    df = spark.range(lo, hi).selectExpr(
        "id", "id % 7 as g", "cast(id % 11 as double) as v"
    )
    if sn.snapshot_versions(path):
        sn.snapshot_append(df, path, stats_cols=["g"])
    else:
        sn.snapshot_write(df, path, stats_cols=["g"])


def _recompute(spark, path):
    return sorted(
        tuple(r)
        for r in sn.snapshot_read(spark, path)
        .groupBy("g")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sum_v"))
        .collect()
    )


def _view(spark, view):
    return sorted(
        tuple(r)
        for r in sn.snapshot_read(spark, view).select("g", "n", "sum_v").collect()
    )


@pytest.fixture()
def paths(tmp_path):
    return {
        k: str(tmp_path / k) for k in ("fact", "view", "cursor", "cp")
    }


def _maintainer(spark, p):
    def maintain():
        sn.snapshot_maintain_aggregate(
            spark, p["fact"], p["view"], p["cursor"],
            group_cols=["g"], sum_cols=["v"], key_cols=["id"],
        )
    return maintain


def test_maintain_on_commit_drain_and_idempotent_replay(spark, paths):
    _mk_fact(spark, paths["fact"], 0, 500)
    q = maintain_on_commit(
        spark, paths["fact"], _maintainer(spark, paths), paths["cp"]
    )
    q.awaitTermination(120)
    assert _view(spark, paths["view"]) == _recompute(spark, paths["fact"])

    # two churn waves: append + DV delete storm, then drain again
    _mk_fact(spark, paths["fact"], 500, 800)
    sn.snapshot_delete_where(spark, paths["fact"], "id % 5 = 0", mode="dv")
    q = maintain_on_commit(
        spark, paths["fact"], _maintainer(spark, paths), paths["cp"]
    )
    q.awaitTermination(120)
    assert _view(spark, paths["view"]) == _recompute(spark, paths["fact"])

    # replay with no new commits: NEITHER layer moves (stream checkpoint
    # yields no batch; even if it did, the cursor makes maintain a no-op)
    v_before = sn.snapshot_versions(paths["view"])[-1]
    q = maintain_on_commit(
        spark, paths["fact"], _maintainer(spark, paths), paths["cp"]
    )
    q.awaitTermination(120)
    assert sn.snapshot_versions(paths["view"])[-1] == v_before


def test_maintain_on_commit_live(spark, paths):
    """A LIVE maintainer converges the view while commits land."""
    _mk_fact(spark, paths["fact"], 0, 200)
    q = maintain_on_commit(
        spark, paths["fact"], _maintainer(spark, paths), paths["cp"],
        available_now=False, processing_time="300 milliseconds",
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline and not sn.snapshot_versions(paths["view"]):
            time.sleep(0.3)
        _mk_fact(spark, paths["fact"], 200, 350)
        want = _recompute(spark, paths["fact"])
        while time.time() < deadline:
            if sn.snapshot_versions(paths["view"]) and _view(
                spark, paths["view"]
            ) == want:
                break
            time.sleep(0.4)
        assert _view(spark, paths["view"]) == want
    finally:
        q.stop()


def test_snapshot_table_stream_append_mode(spark, paths, tmp_path):
    """The plain (non-CDF) stream helper is the engine-side twin of the
    reference's Delta streaming read: appends flow through; the initial
    snapshot covers pre-existing rows."""
    _mk_fact(spark, paths["fact"], 0, 100)
    out = str(tmp_path / "out")
    q = (
        snapshot_table_stream(spark, paths["fact"])
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", paths["cp"])
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 100


def test_incremental_reco_daemon_matches_batch_dag(spark, tmp_path, sf_dir):
    """The flagship composition: likes-table commits PUSH the whole
    incremental-recommendation DAG (q142's five maintained stages) through
    maintain_on_commit, and the daemon-maintained gold table equals the
    step-by-step batch-maintained one (which itself hash-matches the
    from-scratch q05 recompute in the oracle gate)."""
    from music_recommendation_service_spark.plans import registry
    from music_recommendation_service_spark.plans.incremental_reco import (
        RecoLake,
        churn_waves,
        reco_maintain,
        reco_serve,
    )

    lake = RecoLake(str(tmp_path / "lake"))
    cp = str(tmp_path / "cp")
    waves = churn_waves(spark, sf_dir, lake)

    def drain():
        q = maintain_on_commit(
            spark, lake.likes, lambda: reco_maintain(spark, sf_dir, lake), cp
        )
        q.awaitTermination(240)

    next(waves)   # bootstrap likes
    drain()       # daemon bootstraps the DAG
    next(waves)   # delete churn wave
    next(waves)   # insert churn wave
    drain()       # ONE drain applies both pending commits

    got = sorted(tuple(r) for r in reco_serve(spark, lake).collect())
    want = sorted(
        tuple(r)
        for r in registry()["q142_incremental_hybrid_recommendations"]
        .build(spark, sf_dir).collect()
    )
    assert got == want
