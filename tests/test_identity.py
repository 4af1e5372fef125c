"""Identity columns (GENERATED ALWAYS AS IDENTITY) on the snapshot protocol.

Contract (snapshots.snapshot_set_identity / _assign_identity):
- writers must NOT supply the column; write/append auto-assign;
- assignment is distributed (per-partition offset blocks over the pinned
  input — no shuffle, no global sort) and contiguous within a batch;
- a claim-once RESERVATION commit precedes the data commit, so concurrent
  writers can never mint the same id (a lost/aborted write burns its
  range — Delta's gap semantics);
- the watermark survives compact/zorder/RESTORE (never moves backward);
- declaring identity on a column with nulls / wrong type / existing
  identity fails loudly; values seed from max(existing)+step.
"""

import threading

import pytest
from pyspark.sql import functions as F

from music_recommendation_service_spark.sources import snapshots as sn


def _ids(spark, path):
    return sorted(r["rid"] for r in sn.snapshot_read(spark, path).select("rid").collect())


def _mk(spark, path, n=10):
    sn.snapshot_write(
        spark.range(n).selectExpr("id + 1 as rid", "id as payload"), path
    )
    sn.snapshot_set_identity(spark, path, "rid")


def test_identity_appends_assign_unique_contiguous(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t, n=10)  # rids 1..10 -> watermark 11
    sn.snapshot_append(
        spark.range(7).selectExpr("id * 10 as payload").repartition(4), t
    )
    got = _ids(spark, t)
    assert got == list(range(1, 18))  # 10 seeded + 7 assigned, no dups/gaps
    m = sn._latest_manifest(t)
    assert m["identity"]["next"] == 18
    # history shows the reservation commit (Delta-style metadata op)
    assert any(h["op"] == "identity_reserve" for h in sn.snapshot_history(t))


def test_identity_rejects_supplied_values(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t)
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS IDENTITY"):
        sn.snapshot_append(
            spark.range(3).selectExpr("id + 100 as rid", "id as payload"), t
        )


def test_identity_overwrite_also_assigns_and_keeps_watermark(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t, n=5)  # watermark 6
    sn.snapshot_write(spark.range(3).selectExpr("id as payload"), t)
    assert _ids(spark, t) == [6, 7, 8]  # overwrite REPLACES rows, never ids
    assert sn._latest_manifest(t)["identity"]["next"] == 9


def test_identity_declaration_validation(spark, tmp_path):
    t = str(tmp_path / "t")
    sn.snapshot_write(
        spark.range(5).selectExpr(
            "id + 1 as rid", "cast(id as int) as small",
            "cast(case when id = 3 then null else id end as long) as holey",
        ),
        t,
    )
    with pytest.raises(ValueError, match="no column"):
        sn.snapshot_set_identity(spark, t, "nope")
    with pytest.raises(ValueError, match="must be BIGINT"):
        sn.snapshot_set_identity(spark, t, "small")
    with pytest.raises(ValueError, match="has nulls"):
        sn.snapshot_set_identity(spark, t, "holey")
    sn.snapshot_set_identity(spark, t, "rid", start=100)
    # seeds above BOTH the requested start and max(existing)+step
    assert sn._latest_manifest(t)["identity"]["next"] == 100
    with pytest.raises(ValueError, match="already has identity"):
        sn.snapshot_set_identity(spark, t, "rid")


def test_identity_step_and_negative(spark, tmp_path):
    t = str(tmp_path / "t")
    sn.snapshot_write(spark.range(1).selectExpr("cast(0 as long) as rid", "id as payload"), t)
    # a descending identity must seed BELOW min(existing) even when the
    # requested start is higher — otherwise the sequence would eventually
    # collide with the seeded value 0
    sn.snapshot_set_identity(spark, t, "rid", start=10, step=-2)
    sn.snapshot_append(spark.range(3).selectExpr("id as payload"), t)
    assert set(_ids(spark, t)) == {0, -2, -4, -6}
    assert sn._latest_manifest(t)["identity"]["next"] == -8


def test_identity_concurrent_appends_never_collide(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t, n=1)
    errs = []

    def go(n):
        try:
            sn.snapshot_append(spark.range(n).selectExpr("id as payload"), t)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th = [threading.Thread(target=go, args=(n,)) for n in (20, 30)]
    [x.start() for x in th]
    [x.join() for x in th]
    assert not errs
    got = _ids(spark, t)
    assert len(got) == 51 and len(set(got)) == 51  # reservation = no dups


def test_identity_survives_compact_zorder_restore(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t, n=4)
    sn.snapshot_append(spark.range(4).selectExpr("id as payload"), t)
    wm = sn._latest_manifest(t)["identity"]["next"]
    sn.snapshot_compact(spark, t, small_file_max_rows=1_000)
    sn.snapshot_zorder(spark, t, ["rid"])
    assert sn._latest_manifest(t)["identity"]["next"] == wm
    # RESTORE keeps the NEWEST watermark: restored-then-appended rows can
    # never reuse ids minted after the restore target
    sn.snapshot_rollback(t, 1)
    assert sn._latest_manifest(t)["identity"]["next"] == wm
    sn.snapshot_append(spark.range(2).selectExpr("id as payload"), t)
    fresh = set(_ids(spark, t)) - set(range(1, 5))
    assert fresh == {wm, wm + 1}


def test_identity_burned_range_on_abandoned_write(spark, tmp_path):
    """A writer that reserves its range but crashes before the data commit
    BURNS the range: the next append starts past it (gaps, never
    duplicates) — the exact trade Delta identity makes."""
    t = str(tmp_path / "t")
    _mk(spark, t, n=2)  # rids 1..2, watermark 3
    # simulate the crash: reserve for a 3-row batch, never land the data
    _df, unpin = sn._assign_identity(
        spark.range(3).selectExpr("id as payload"), t, "append"
    )
    unpin()
    assert sn._latest_manifest(t)["identity"]["next"] == 6  # range burned
    sn.snapshot_append(spark.range(2).selectExpr("id as payload"), t)
    assert _ids(spark, t) == [1, 2, 6, 7]  # gap 3-5, no duplicates


def test_identity_datasource_writer_autofills(spark, tmp_path):
    """Round-11 verdict order #7: the DataSource writer no longer rejects
    identity tables — a batch OMITTING the column gets task-reserved ids
    (unique, above the watermark); SUPPLYING it still refuses."""
    from music_recommendation_service_spark.sources.datasource import (
        register_snapshot_datasource,
    )

    register_snapshot_datasource(spark)
    t = str(tmp_path / "t")
    _mk(spark, t)  # rids 1..10 -> watermark 11
    spark.range(3).selectExpr("id as payload") \
        .write.format("snapshot").mode("append").save(t)
    got = _ids(spark, t)
    assert len(got) == 13 and len(set(got)) == 13
    assert sorted(got)[:10] == list(range(1, 11))
    assert all(i >= 11 for i in sorted(got)[10:])
    with pytest.raises(Exception, match="GENERATED ALWAYS AS IDENTITY"):
        spark.range(3).selectExpr(
            "id + 99 as rid", "id as payload"
        ).write.format("snapshot").mode("append").save(t)


def test_identity_drop_then_writer_supplies(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t, n=3)
    sn.snapshot_drop_identity(t)
    sn.snapshot_append(
        spark.range(3).selectExpr("id + 50 as rid", "id as payload"), t
    )
    assert set(_ids(spark, t)) == {1, 2, 3, 50, 51, 52}
    with pytest.raises(KeyError):
        sn.snapshot_drop_identity(t)
