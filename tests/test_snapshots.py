"""Versioned snapshot tables (S13 re-realized engine-side): atomic commits,
metadata-only append, time travel, rollback, vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from music_recommendation_service_spark.sources.catalog import load_table
from music_recommendation_service_spark.sources.snapshots import (
    snapshot_append,
    snapshot_read,
    snapshot_rollback,
    snapshot_vacuum,
    snapshot_versions,
    snapshot_write,
)


def test_snapshot_lifecycle(spark, sf_dir, tmp_path):
    path = str(tmp_path / "snap")
    orders = load_table(spark, sf_dir, "orders")
    first = orders.filter(F.col("o_orderkey") % 2 == 0)
    second = orders.filter(F.col("o_orderkey") % 2 == 1)

    # v1 overwrite, v2 metadata-only append
    assert snapshot_write(first, path) == 1
    assert snapshot_append(second, path) == 2
    assert snapshot_versions(path) == [1, 2]
    assert snapshot_read(spark, path).count() == orders.count()
    # time travel
    assert snapshot_read(spark, path, version=1).count() == first.count()

    # schema drift must fail loudly (S6 contract)
    with pytest.raises(ValueError, match="schema mismatch"):
        snapshot_append(first.withColumn("extra", F.lit(1)), path)

    # v3 full overwrite; v1/v2 still readable
    assert snapshot_write(first.limit(10), path) == 3
    assert snapshot_read(spark, path).count() == 10
    assert snapshot_read(spark, path, version=2).count() == orders.count()

    # rollback -> v4 points at v2's files without rewriting data
    assert snapshot_rollback(path, 2) == 4
    assert snapshot_read(spark, path).count() == orders.count()

    # vacuum keeps last 2 (v3, v4); v4 still shares v1+v2's data dirs, so
    # those dirs survive; v1/v2 manifests are gone
    removed = snapshot_vacuum(path, keep_last=2)
    assert snapshot_versions(path) == [3, 4]
    assert snapshot_read(spark, path).count() == orders.count()
    assert snapshot_read(spark, path, version=3).count() == 10
    with pytest.raises(ValueError):
        snapshot_read(spark, path, version=1)

    # orphaned data dir from a crashed write is swept
    os.makedirs(os.path.join(path, "v=99-crashed"), exist_ok=True)
    removed = snapshot_vacuum(path, keep_last=2)
    assert "v=99-crashed" in removed
