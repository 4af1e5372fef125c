"""Round-10 surface over the conditional-PUT metadata backend.

`InMemoryObjectStoreFS` was exercised by a handful of commit-race tests;
the partitioned-table lifecycle (Hive writes, replaceWhere, dynamic
partition overwrite, CONVERT, OPTIMIZE/ZORDER, vacuum, parquet
checkpoints) had only ever run over the local O_EXCL filesystem —
local-FS assumptions (path semantics, link-based claims, orphan sweeps)
would surface only in production. This module runs the WHOLE lifecycle
over both backends (round-10 verdict order #6).
"""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from music_recommendation_service_spark.sources import snapshots as S


@pytest.fixture(params=["local", "objectstore"])
def snapshot_fs(request):
    from music_recommendation_service_spark.sources.objectstore import (
        InMemoryObjectStoreFS,
    )

    if request.param == "local":
        yield None
        return
    fs = InMemoryObjectStoreFS()
    prev = S.set_snapshot_fs(fs)
    try:
        yield fs
    finally:
        S.set_snapshot_fs(prev)


def _pdf(spark, rows):
    return spark.createDataFrame(rows, ["k", "year", "payload"])


def test_partitioned_lifecycle_over_both_backends(spark, tmp_path, snapshot_fs):
    """write(partitionBy) -> append -> replaceWhere -> dynamic partition
    overwrite -> metadata DROP PARTITION -> OPTIMIZE ZORDER -> vacuum,
    identical state over local O_EXCL and conditional-PUT metadata."""
    p = str(tmp_path / "pt_lc")
    S.snapshot_write(
        _pdf(spark, [(i, 1990 + i % 3, f"pay{i}") for i in range(30)]),
        p, stats_cols=["k"], partition_by=["year"],
    )
    S.snapshot_append(_pdf(spark, [(100, 1993, "new")]), p, stats_cols=["k"])
    assert S.snapshot_read(spark, p).count() == 31

    # replaceWhere swaps one partition's rows in one commit
    S.snapshot_replace_where(
        _pdf(spark, [(200 + i, 1991, f"rw{i}") for i in range(3)]),
        p, "year = 1991",
    )
    got = S.snapshot_read(spark, p)
    assert got.count() == 24  # 20 + 1 new + 3 replacements
    assert {r["k"] for r in got.where("year = 1991").collect()} == {200, 201, 202}

    # dynamic partition overwrite replaces exactly the incoming partitions
    S.snapshot_dynamic_partition_overwrite(
        _pdf(spark, [(300, 1990, "dpo")]), p
    )
    got = S.snapshot_read(spark, p)
    assert got.where("year = 1990").count() == 1
    assert got.count() == 15

    # metadata-only partition drop
    files_before = {e["path"] for e in S._manifest_files(p, S._latest_manifest(p))}
    S.snapshot_delete_where(spark, p, "year = 1993")
    files_after = {e["path"] for e in S._manifest_files(p, S._latest_manifest(p))}
    assert files_after < files_before
    assert S.snapshot_read(spark, p).where("year = 1993").count() == 0

    # maintenance keeps partition purity, then vacuum reclaims history
    v = S.snapshot_zorder(spark, p, ["k"])
    assert v is not None
    for e in S._manifest_files(p, S._latest_manifest(p)):
        assert e.get("partition", {}).get("year") is not None
    removed = S.snapshot_vacuum(p, keep_last=1, orphan_min_age_sec=0)
    assert removed  # old partition dirs actually reclaimed
    got = S.snapshot_read(spark, p)
    assert got.count() == 14
    assert {r["year"] for r in got.collect()} == {1990, 1991, 1992}
    # partition metadata still answers from the manifest alone
    recs = S.snapshot_partitions(p)
    assert sum(r["n_rows"] for r in recs) == 14


def test_convert_and_checkpoint_over_both_backends(
    spark, tmp_path, snapshot_fs, monkeypatch
):
    """In-place CONVERT of a hand-laid Hive tree and a parquet-checkpoint
    write/resolve both run over the conditional-PUT backend."""
    monkeypatch.setattr(S, "_PARQUET_CHECKPOINT_MIN_FILES", 8)
    monkeypatch.setattr(S, "_DELTA_MANIFEST_MIN_FILES", 4)

    # CONVERT: existing partitioned parquet onboards in place
    src = str(tmp_path / "plain_hive")
    df = _pdf(spark, [(i, 1990 + i % 2, f"p{i}") for i in range(10)])
    df.write.partitionBy("year").parquet(src)
    t1 = str(tmp_path / "converted")
    S.snapshot_convert(spark, src, t1, stats_cols=["k"])
    m = S._latest_manifest(t1)
    assert m["partition_cols"] == ["year"]
    assert S.snapshot_read(spark, t1).count() == 10

    # parquet checkpoint through the binary blob surface
    t2 = str(tmp_path / "ckpt_os")
    big = (
        spark.range(120)
        .selectExpr("id AS k", "1990 + id % 3 AS year", "'x' AS payload")
        .repartition(12, "k")
    )
    S.snapshot_write(big, t2, stats_cols=["k"])
    m2 = S._latest_manifest(t2)
    assert "files_ckpt" in m2
    assert S.snapshot_read(spark, t2).count() == 120
    # delta chain over the checkpointed base, then vacuum GC
    S.snapshot_append(
        spark.createDataFrame([(999, 1990, "y")], "k long, year long, payload string"),
        t2, stats_cols=["k"],
    )
    assert S.snapshot_read(spark, t2).count() == 121
    S.snapshot_vacuum(t2, keep_last=1, orphan_min_age_sec=0)
    assert S.snapshot_read(spark, t2).count() == 121


def test_multicommit_lake_over_object_store(spark, tmp_path, snapshot_fs):
    """The cross-table lake log (BEGIN LAKE TRANSACTION publish set) runs
    over the conditional-PUT backend too."""
    from music_recommendation_service_spark.engine import Engine
    from music_recommendation_service_spark.sources.multicommit import (
        lake_latest,
    )

    root = str(tmp_path)
    sch = "k int, amount double"
    S.snapshot_write(spark.createDataFrame([(1, 1.0)], sch), f"{root}/a")
    S.snapshot_write(spark.createDataFrame([(1, 1.0)], sch), f"{root}/b")
    e = Engine(root, spark=spark)
    e.snapshot(f"{root}/a", view="ta")
    e.snapshot(f"{root}/b", view="tb")
    e.sql(
        "BEGIN LAKE TRANSACTION; "
        "INSERT INTO ta SELECT 2 AS k, CAST(2.0 AS DOUBLE) AS amount; "
        "INSERT INTO tb SELECT 2 AS k, CAST(2.0 AS DOUBLE) AS amount; "
        "COMMIT"
    )
    assert lake_latest(root)["tables"] == {"a": 2, "b": 2}
    assert e.sql("SELECT count(*) AS n FROM ta").collect()[0]["n"] == 2
