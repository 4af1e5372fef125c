"""Shallow clone + TIMESTAMP AS OF time travel.

Clone references the source's files by absolute path (zero data copy);
the pinned hazards: the clone's vacuum must never delete source data, the
clone must stay readable after the source advances, and constraints must
ride along. AS-OF resolution follows Delta: newest version committed at
or before the timestamp, error before the first commit.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from music_recommendation_service_spark.sources.catalog import load_table
from music_recommendation_service_spark.sources.snapshots import (
    ConstraintViolationError,
    snapshot_add_constraint,
    snapshot_append,
    snapshot_clone,
    snapshot_compact,
    snapshot_history,
    snapshot_read,
    snapshot_vacuum,
    snapshot_versions,
    snapshot_write,
)


def test_read_as_of_timestamp(spark, sf_dir, tmp_path):
    path = str(tmp_path / "t")
    orders = load_table(spark, sf_dir, "orders")
    snapshot_write(orders.limit(5), path)
    t_between = time.time()
    time.sleep(0.05)
    snapshot_write(orders.limit(9), path)

    assert snapshot_read(spark, path, as_of=t_between).count() == 5
    assert snapshot_read(spark, path, as_of=time.time()).count() == 9
    with pytest.raises(ValueError, match="committed at or before"):
        snapshot_read(spark, path, as_of=t_between - 10_000)
    with pytest.raises(ValueError, match="not both"):
        snapshot_read(spark, path, version=1, as_of=t_between)


def test_shallow_clone_zero_copy_and_divergence(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 2 == 0).limit(20)
    b = orders.filter(F.col("o_orderkey") % 2 == 1).limit(10)
    snapshot_write(a, src)
    snapshot_append(b, src)

    v = snapshot_clone(src, dst)
    assert v == 1
    # no parquet data landed under dst — metadata only
    local_dirs = [d for d in os.listdir(dst) if d.startswith("v=")]
    assert local_dirs == []
    assert snapshot_read(spark, dst).count() == 30
    assert snapshot_history(dst)[0]["op"] == "clone"

    # time-travel clone of the source's v1
    dst1 = str(tmp_path / "dst1")
    snapshot_clone(src, dst1, version=1)
    assert snapshot_read(spark, dst1).count() == 20

    # clone diverges: appends land locally, source unaffected
    snapshot_append(a.limit(7), dst)
    assert snapshot_read(spark, dst).count() == 37
    assert snapshot_read(spark, src).count() == 30
    assert any(d.startswith("v=") for d in os.listdir(dst))

    # source advancing does not change the clone
    snapshot_write(b, src)
    assert snapshot_read(spark, dst).count() == 37


def test_clone_vacuum_never_touches_source(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    orders = load_table(spark, sf_dir, "orders")
    snapshot_write(orders.limit(25), src)
    snapshot_clone(src, dst)
    # local rewrite at dst drops the external refs from the live manifest
    snapshot_compact(spark, dst)
    removed = snapshot_vacuum(dst, keep_last=1, orphan_min_age_sec=0.0)
    # nothing removed may resolve into the source tree
    assert all(not os.path.isabs(r) for r in removed)
    assert snapshot_read(spark, src).count() == 25  # source intact
    assert snapshot_read(spark, dst).count() == 25


def test_clone_carries_constraints(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    orders = load_table(spark, sf_dir, "orders")
    snapshot_write(orders.limit(10), src)
    snapshot_add_constraint(spark, src, "pos_price", "o_totalprice > 0")
    snapshot_clone(src, dst)
    bad = orders.limit(3).withColumn("o_totalprice", F.lit(-1.0))
    with pytest.raises(ConstraintViolationError):
        snapshot_append(bad, dst)
