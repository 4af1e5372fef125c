"""Deletion vectors on the snapshot protocol: DELETE without rewriting a
single data file (``snapshot_delete_where(mode="dv")``), the write shape
that keeps GDPR-scale deletes O(matched rows) on a 100 TB table.

The invariants under test:
- the DV commit writes NO data files — every prior entry path is carried
  byte-identical, only the manifest's dv refs move;
- every protocol reader (read / scan / scan_in / merge / predicate DML /
  compact / CDF / maintainers) applies the vectors — no path can resurrect
  a dead row;
- refs are cumulative per file (one anti-join on read, any number of
  deletes) and time travel / rollback restore the exact prior dead sets;
- the change feed emits exact row-level deletes for DV commits in BOTH
  keyed and keyless modes (keyless position-diffs the refs — the cheap CDF
  deletion vectors exist to enable), and rollback within a window emits
  un-deletes as inserts;
- ``snapshot_compact(purge_dvs=True)`` (REORG PURGE parity) folds the
  vectors away; vacuum treats live position dirs as live data.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import music_recommendation_service_spark.sources.snapshots as S


def _t(tmp_path, name="t"):
    return str(tmp_path / name)


def _base(spark, n=100, parts=4):
    return (
        spark.range(n)
        .withColumn("grp", F.col("id") % 10)
        .withColumn("val", F.col("id") * 2)
        .repartition(parts)
    )


def _rows(spark, path, **kw):
    return {
        (r.id, r.grp, r.val)
        for r in S.snapshot_read(spark, path, **kw).collect()
    }


def test_dv_delete_reads_and_counts(spark, tmp_path):
    t = _t(tmp_path)
    S.snapshot_write(_base(spark), t, stats_cols=["id"])
    before = {e["path"] for e in S._latest_manifest(t)["files"]}
    v2 = S.snapshot_delete_where(spark, t, "grp = 3", mode="dv")
    m = S._latest_manifest(t)
    # no data file rewritten: same paths, only dv refs attached
    assert {e["path"] for e in m["files"]} == before
    assert m["n_rows"] == 90
    assert sum((e.get("dv") or {}).get("n", 0) for e in m["files"]) == 10
    got = _rows(spark, t)
    assert len(got) == 90 and not any(g == 3 for _, g, _ in got)
    # SQL three-valued semantics twin of the rewrite path: count only TRUE
    assert S.snapshot_read(spark, t).filter("grp = 3").count() == 0
    assert v2 == 2


def test_dv_delete_cumulative_and_time_travel(spark, tmp_path):
    t = _t(tmp_path)
    S.snapshot_write(_base(spark), t)
    v1 = S.snapshot_versions(t)[-1]
    v2 = S.snapshot_delete_where(spark, t, "grp = 3", mode="dv")
    v3 = S.snapshot_delete_where(spark, t, "grp = 5", mode="dv")
    assert S.snapshot_read(spark, t).count() == 80
    assert S.snapshot_read(spark, t, version=v1).count() == 100
    assert S.snapshot_read(spark, t, version=v2).count() == 90
    # cumulative ref: exactly one anti-join source per file
    for e in S._latest_manifest(t)["files"]:
        if e.get("dv"):
            assert e["dv"]["n"] in (2, 4, 6, 8, 10, 20)  # 2 groups x per-file share
    # rollback restores the prior dead set exactly
    S.snapshot_rollback(t, v2)
    assert _rows(spark, t) == _rows(spark, t, version=v2)
    assert S._latest_manifest(t)["n_rows"] == 90
    assert v3 == 3


def test_dv_delete_noop_leaves_no_commit(spark, tmp_path):
    t = _t(tmp_path)
    S.snapshot_write(_base(spark), t)
    assert S.snapshot_delete_where(spark, t, "grp = 42", mode="dv") is None
    assert len(S.snapshot_versions(t)) == 1
    # and no orphan position dir either
    assert all(
        not d.startswith("v=2") for d in os.listdir(t) if d != "_snapshots"
    ) or len([d for d in os.listdir(t) if d.startswith("v=")]) == 1


def test_dv_delete_null_predicate_keeps_rows(spark, tmp_path):
    t = _t(tmp_path)
    df = spark.createDataFrame(
        [(1, None), (2, 5), (3, 10)], "id long, x long"
    )
    S.snapshot_write(df, t)
    S.snapshot_delete_where(spark, t, "x > 6", mode="dv")
    got = {r.id for r in S.snapshot_read(spark, t).collect()}
    assert got == {1, 2}  # NULL predicate row kept (three-valued semantics)


def test_merge_does_not_resurrect_dv_dead_rows(spark, tmp_path):
    t = _t(tmp_path)
    df = spark.createDataFrame(
        [(i, i % 10, i * 2, 1) for i in range(100)],
        "id long, grp long, val long, _seq long",
    ).repartition(4)
    S.snapshot_merge(df, t, ["id"], "_seq")
    S.snapshot_delete_where(spark, t, "grp = 3", mode="dv")
    # upsert a key whose file holds dead rows: dead neighbors must not return
    upd = spark.createDataFrame([(4, 4, 999, 2)], "id long, grp long, val long, _seq long")
    S.snapshot_merge(upd, t, ["id"], "_seq")
    got = S.snapshot_read(spark, t)
    assert got.filter("grp = 3").count() == 0
    assert got.filter("id = 4").select("val").first()[0] == 999
    assert got.count() == 90
    # merge onto a DV-DEAD key re-inserts it (it is gone from the table)
    revive = spark.createDataFrame([(13, 3, -1, 3)], "id long, grp long, val long, _seq long")
    S.snapshot_merge(revive, t, ["id"], "_seq")
    assert S.snapshot_read(spark, t).filter("id = 13").select("val").first()[0] == -1
    assert S.snapshot_read(spark, t).count() == 91


def test_rewrite_dml_on_dv_table(spark, tmp_path):
    t = _t(tmp_path)
    S.snapshot_write(_base(spark), t)
    S.snapshot_delete_where(spark, t, "grp = 3", mode="dv")
    # rewrite-mode UPDATE on files carrying dvs: dead rows must not reappear
    S.snapshot_update_where(spark, t, "grp = 4", {"val": "val + 1000000"})
    got = S.snapshot_read(spark, t)
    assert got.count() == 90
    assert got.filter("grp = 3").count() == 0
    assert got.filter("grp = 4 AND val >= 1000000").count() == 10
    # rewrite-mode DELETE too
    S.snapshot_delete_where(spark, t, "grp = 5")
    assert S.snapshot_read(spark, t).count() == 80


def test_scan_and_scan_in_apply_dvs(spark, tmp_path):
    t = _t(tmp_path)
    S.snapshot_write(_base(spark).orderBy("id").coalesce(1), t, stats_cols=["id"])
    S.snapshot_append(_base(spark).filter("id < 0"), t)  # keep protocol shape
    S.snapshot_delete_where(spark, t, "id IN (7, 8)", mode="dv")
    got = S.snapshot_scan(spark, t, {"id": (0, 20)})
    assert {r.id for r in got.collect()} == set(range(21)) - {7, 8}
    got_in = S.snapshot_scan_in(spark, t, "id", [7, 9, 11])
    assert {r.id for r in got_in.collect()} == {9, 11}


def test_keyless_cdf_dv_exact_deletes_and_rollback_inserts(spark, tmp_path):
    t = _t(tmp_path)
    S.snapshot_write(_base(spark), t)
    v1 = S.snapshot_versions(t)[-1]
    v2 = S.snapshot_delete_where(spark, t, "grp = 3", mode="dv")
    v3 = S.snapshot_delete_where(spark, t, "grp = 5", mode="dv")
    ch = S.snapshot_changes(spark, t, v1, v3)
    rows = ch.collect()
    assert all(r["_change_type"] == "delete" for r in rows)
    assert sorted((r.id, r.grp) for r in rows) == sorted(
        (i, i % 10) for i in range(100) if i % 10 in (3, 5)
    )
    # window over the SECOND delete only: grp-3 deaths must not re-emit
    ch2 = S.snapshot_changes(spark, t, v2, v3)
    assert sorted(r.grp for r in ch2.collect()) == [5] * 10
    assert set(r["_change_type"] for r in ch2.collect()) == {"delete"}
    # rollback inside a window emits the un-deleted rows as inserts
    v4 = S.snapshot_rollback(t, v2)
    ch3 = S.snapshot_changes(spark, t, v3, v4)
    rows3 = ch3.collect()
    assert all(r["_change_type"] == "insert" for r in rows3)
    assert sorted(r.grp for r in rows3) == [5] * 10


def test_keyed_cdf_dv_deletes_and_carried_cancel(spark, tmp_path):
    t = _t(tmp_path)
    df = spark.createDataFrame(
        [(i, i % 10, i * 2, 1) for i in range(100)],
        "id long, grp long, val long, _seq long",
    ).repartition(4)
    S.snapshot_merge(df, t, ["id"], "_seq")
    v1 = S.snapshot_versions(t)[-1]
    S.snapshot_delete_where(spark, t, "grp = 3", mode="dv")
    v3 = S.snapshot_merge(
        spark.createDataFrame([(4, 4, 999, 2)], "id long, grp long, val long, _seq long"),
        t, ["id"], "_seq",
    )
    ch = S.snapshot_changes(spark, t, v1, v3, key_cols=["id"])
    by_type = {
        r["_change_type"]: c
        for r, c in (
            (row, row["count"])
            for row in ch.groupBy("_change_type").count().collect()
        )
    }
    assert by_type.get("delete", 0) == 10  # the dv-dead rows, nothing carried
    assert by_type.get("update_preimage", 0) == 1
    assert by_type.get("update_postimage", 0) == 1
    assert "insert" not in by_type


def test_compact_purges_dvs_content_identical(spark, tmp_path):
    t = _t(tmp_path)
    S.snapshot_write(_base(spark), t, stats_cols=["id"])
    S.snapshot_delete_where(spark, t, "grp = 3", mode="dv")
    want = _rows(spark, t)
    v = S.snapshot_compact(spark, t, purge_dvs=True)
    assert v is not None
    m = S._latest_manifest(t)
    assert not any(e.get("dv") for e in m["files"])
    assert m["n_rows"] == 90
    assert _rows(spark, t) == want
    # keyed CDF across the purge still cancels carried rows
    ch = S.snapshot_changes(spark, t, v - 1, v, key_cols=["id"])
    assert ch.count() == 0


def test_vacuum_keeps_live_dv_dirs_drops_dead_ones(spark, tmp_path):
    t = _t(tmp_path)
    S.snapshot_write(_base(spark), t)
    S.snapshot_delete_where(spark, t, "grp = 3", mode="dv")
    m2 = S._latest_manifest(t)
    ref2 = next(e["dv"]["ref"] for e in m2["files"] if e.get("dv"))
    S.snapshot_delete_where(spark, t, "grp = 5", mode="dv")
    ref3 = next(
        e["dv"]["ref"] for e in S._latest_manifest(t)["files"] if e.get("dv")
    )
    assert ref2 != ref3
    # keep the last two manifests (v2 with ref2, v3 with ref3): both refs live
    S.snapshot_vacuum(t, keep_last=2, orphan_min_age_sec=0.0)
    assert os.path.isdir(os.path.join(t, ref2))
    assert os.path.isdir(os.path.join(t, ref3))
    assert S.snapshot_read(spark, t).count() == 80
    # now retain only v3: ref2 is reclaimable, ref3 must survive
    S.snapshot_vacuum(t, keep_last=1, orphan_min_age_sec=0.0)
    assert not os.path.isdir(os.path.join(t, ref2))
    assert os.path.isdir(os.path.join(t, ref3))
    assert S.snapshot_read(spark, t).count() == 80


def test_clone_of_dv_table(spark, tmp_path):
    src, dst = _t(tmp_path, "src"), _t(tmp_path, "dst")
    S.snapshot_write(_base(spark), src)
    S.snapshot_delete_where(spark, src, "grp = 3", mode="dv")
    S.snapshot_clone(src, dst)
    assert _rows(spark, dst) == _rows(spark, src)
    # clone's own dv delete stays local to the clone
    S.snapshot_delete_where(spark, dst, "grp = 5", mode="dv")
    assert S.snapshot_read(spark, dst).count() == 80
    assert S.snapshot_read(spark, src).count() == 90
    # clone vacuum never touches the source's data or position dirs
    S.snapshot_vacuum(dst, keep_last=1, orphan_min_age_sec=0.0)
    assert S.snapshot_read(spark, src).count() == 90
    assert S.snapshot_read(spark, dst).count() == 80


def test_maintained_aggregate_sees_dv_deletes(spark, tmp_path):
    t, view, cur = _t(tmp_path, "fact"), _t(tmp_path, "view"), _t(tmp_path, "cur")
    df = spark.createDataFrame(
        [(i, i % 10, 1, 1) for i in range(100)],
        "id long, grp long, qty long, _seq long",
    ).repartition(4)
    S.snapshot_merge(df, t, ["id"], "_seq")
    S.snapshot_maintain_aggregate(
        spark, t, view, cur, group_cols=["grp"], sum_cols=["qty"], key_cols=["id"]
    )
    S.snapshot_delete_where(spark, t, "grp = 3", mode="dv")
    S.snapshot_maintain_aggregate(
        spark, t, view, cur, group_cols=["grp"], sum_cols=["qty"], key_cols=["id"]
    )
    got = {
        (r.grp, r.n, r.sum_qty)
        for r in S.snapshot_read(spark, view).select("grp", "n", "sum_qty").collect()
    }
    want = {
        (r.grp, r.n, r.sum_qty)
        for r in S.snapshot_read(spark, t)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("qty").alias("sum_qty"))
        .collect()
    }
    assert got == want
    assert not any(g == 3 for g, _, _ in got)


def test_reserved_lineage_column_names_guarded(spark, tmp_path):
    t = _t(tmp_path)
    df = spark.range(5).withColumn("_sn_file", F.lit("x"))
    S.snapshot_write(df, t)
    with pytest.raises(ValueError, match="reserved"):
        S.snapshot_delete_where(spark, t, "id = 1", mode="dv")


def test_dv_unknown_mode_raises(spark, tmp_path):
    t = _t(tmp_path)
    S.snapshot_write(_base(spark), t)
    with pytest.raises(ValueError, match="unknown mode"):
        S.snapshot_delete_where(spark, t, "grp = 1", mode="bitmap")


def test_dv_update_writes_only_images(spark, tmp_path):
    t = _t(tmp_path)
    S.snapshot_write(_base(spark), t, stats_cols=["id"])
    before_paths = {e["path"] for e in S._latest_manifest(t)["files"]}
    v2 = S.snapshot_update_where(
        spark, t, "grp = 3", {"val": "val + 1000000"}, mode="dv"
    )
    m = S._latest_manifest(t)
    # old entries all carried; exactly the image file(s) added
    assert before_paths <= {e["path"] for e in m["files"]}
    assert m["n_rows"] == 100
    got = S.snapshot_read(spark, t)
    assert got.count() == 100
    assert got.filter("grp = 3 AND val < 1000000").count() == 0
    assert got.filter("grp = 3").count() == 10
    assert v2 == 2


def test_dv_update_preimage_semantics_and_constraints(spark, tmp_path):
    t = _t(tmp_path)
    df = spark.createDataFrame(
        [(1, 10, 20), (2, 30, 40)], "id long, a long, b long"
    )
    S.snapshot_write(df, t)
    # column swap: both RHS evaluate on the pre-update row
    S.snapshot_update_where(spark, t, "id = 1", {"a": "b", "b": "a"}, mode="dv")
    r = S.snapshot_read(spark, t).filter("id = 1").first()
    assert (r.a, r.b) == (20, 10)
    # an assignment that falsifies its own predicate still can't smuggle a
    # CHECK violation past enforcement
    S.snapshot_add_constraint(spark, t, "a_pos", "a >= 0")
    with pytest.raises(S.ConstraintViolationError):
        S.snapshot_update_where(spark, t, "a = 20", {"a": "-5"}, mode="dv")
    assert S.snapshot_read(spark, t).filter("a = -5").count() == 0


def test_dv_update_cdf_keyed_and_keyless(spark, tmp_path):
    t = _t(tmp_path)
    df = spark.createDataFrame(
        [(i, i % 10, i * 2, 1) for i in range(100)],
        "id long, grp long, val long, _seq long",
    ).repartition(4)
    S.snapshot_merge(df, t, ["id"], "_seq")
    v1 = S.snapshot_versions(t)[-1]
    v2 = S.snapshot_update_where(spark, t, "grp = 3", {"val": "val + 1"}, mode="dv")
    keyed = S.snapshot_changes(spark, t, v1, v2, key_cols=["id"])
    by = {r["_change_type"]: r["count"] for r in keyed.groupBy("_change_type").count().collect()}
    assert by == {"update_preimage": 10, "update_postimage": 10}
    keyless = S.snapshot_changes(spark, t, v1, v2)
    by2 = {r["_change_type"]: r["count"] for r in keyless.groupBy("_change_type").count().collect()}
    assert by2 == {"delete": 10, "insert": 10}
    # the keyless delete side carries the OLD images, insert side the NEW
    dels = {r.val for r in keyless.filter("_change_type = 'delete'").collect()}
    ins = {r.val for r in keyless.filter("_change_type = 'insert'").collect()}
    assert ins == {v + 1 for v in dels}


def test_dv_update_then_delete_then_purge(spark, tmp_path):
    t = _t(tmp_path)
    S.snapshot_write(_base(spark), t)
    S.snapshot_update_where(spark, t, "grp = 3", {"val": "-1"}, mode="dv")
    S.snapshot_delete_where(spark, t, "grp = 5", mode="dv")
    want = _rows(spark, t)
    assert len(want) == 90 and sum(1 for _, g, v in want if g == 3 and v == -1) == 10
    S.snapshot_compact(spark, t, purge_dvs=True)
    assert _rows(spark, t) == want
    assert not any(e.get("dv") for e in S._latest_manifest(t)["files"])


def test_dv_merge_upsert_tombstone_and_replay(spark, tmp_path):
    t = _t(tmp_path)
    df = spark.createDataFrame(
        [(i, i % 10, i * 2, 1) for i in range(100)],
        "id long, grp long, val long, _seq long",
    ).repartition(4)
    S.snapshot_merge(df, t, ["id"], "_seq")
    v1 = S.snapshot_versions(t)[-1]
    files1 = {e["path"] for e in S._latest_manifest(t)["files"]}
    batch = spark.createDataFrame(
        [(4, 4, 999, 2, False), (13, 3, 888, 2, False), (200, 0, 1, 2, False),
         (7, 7, 0, 2, True)],
        "id long, grp long, val long, _seq long, _del boolean",
    )
    v2 = S.snapshot_merge(batch, t, ["id"], "_seq", delete_col="_del", mode="dv")
    m = S._latest_manifest(t)
    # O(batch) write: every pre-existing file carried by path
    assert files1 <= {e["path"] for e in m["files"]}
    got = S.snapshot_read(spark, t)
    assert got.count() == 100  # +1 insert, -1 tombstone
    assert m["n_rows"] == 100
    assert {r.val for r in got.filter("id in (4, 13)").collect()} == {999, 888}
    assert got.filter("id = 7").count() == 0
    assert got.filter("id = 200").count() == 1
    # losing batch: content unchanged
    S.snapshot_merge(
        spark.createDataFrame(
            [(4, 4, -1, 1, False)],
            "id long, grp long, val long, _seq long, _del boolean",
        ),
        t, ["id"], "_seq", delete_col="_del", mode="dv",
    )
    assert S.snapshot_read(spark, t).filter("id = 4").first().val == 999
    # replay: content no-op, keyed feed empty across the replay commit
    v3 = S.snapshot_versions(t)[-1]
    v4 = S.snapshot_merge(batch, t, ["id"], "_seq", delete_col="_del", mode="dv")
    assert S.snapshot_read(spark, t).count() == 100
    assert S.snapshot_changes(spark, t, v3, v4, key_cols=["id"]).count() == 0
    # keyed CDF over the original dv merge
    ch = S.snapshot_changes(spark, t, v1, v2, key_cols=["id"])
    by = {
        r["_change_type"]: r["count"]
        for r in ch.groupBy("_change_type").count().collect()
    }
    assert by == {
        "insert": 1, "delete": 1, "update_preimage": 2, "update_postimage": 2
    }


def test_dv_merge_equals_rewrite_merge_content(spark, tmp_path):
    """Same batches through mode=dv and mode=rewrite produce identical
    table content at every step (unique-key tables)."""
    a, b = _t(tmp_path, "a"), _t(tmp_path, "b")
    batches = [
        [(i, i % 5, i, 1) for i in range(40)],
        [(3, 3, 100, 2), (41, 1, 41, 2)],
        [(3, 3, 50, 1), (7, 2, 700, 3)],   # losing + winning mix
        [(41, 1, -41, 2)],                  # tie: incoming wins
    ]
    for rows in batches:
        df = spark.createDataFrame(rows, "id long, grp long, val long, _seq long")
        S.snapshot_merge(df, a, ["id"], "_seq", mode="dv")
        S.snapshot_merge(df, b, ["id"], "_seq")
        ga = {(r.id, r.grp, r.val, r._seq) for r in S.snapshot_read(spark, a).collect()}
        gb = {(r.id, r.grp, r.val, r._seq) for r in S.snapshot_read(spark, b).collect()}
        assert ga == gb


def test_dv_dml_concurrent_commit_aborts(spark, tmp_path, monkeypatch):
    """A commit landing between a DV DML's state read and its manifest
    write must abort it (the position sets were computed against a stale
    file list), never clobber the concurrent writer — same optimistic-
    concurrency rule as merge/compact."""
    t = _t(tmp_path)
    S.snapshot_write(_base(spark), t, stats_cols=["id"])

    real = S._new_data_dir
    fired = {"done": False}

    def racing(p):
        if p == t and not fired["done"]:
            fired["done"] = True
            S.snapshot_append(
                spark.range(9999, 10000)
                .withColumn("grp", F.col("id") % 10)
                .withColumn("val", F.col("id") * 2),
                t,
            )
        return real(p)

    monkeypatch.setattr(S, "_new_data_dir", racing)
    with pytest.raises(S.ConcurrentSnapshotError):
        S.snapshot_delete_where(spark, t, "grp = 3", mode="dv")
    assert S.snapshot_read(spark, t).filter("id = 9999").count() == 1
    # and the table never lost the grp=3 rows (the delete aborted whole)
    assert S.snapshot_read(spark, t).count() == 101

    fired["done"] = False
    with pytest.raises(S.ConcurrentSnapshotError):
        S.snapshot_update_where(spark, t, "grp = 3", {"val": "0"}, mode="dv")
    # the aborted update applied nothing
    assert S.snapshot_read(spark, t).filter("grp = 3 AND val = 0").count() == 0


def test_auto_optimize_policy(spark, tmp_path):
    """snapshot_auto_optimize: O(manifest) decision — no commit on a
    healthy table; compacts + purges once small files or dv dead weight
    cross the thresholds; health numbers come from snapshot_table_stats."""
    t = _t(tmp_path)
    S.snapshot_write(_base(spark, parts=2), t)
    # healthy: 2 files, no dvs
    assert (
        S.snapshot_auto_optimize(spark, t, max_small_files=8, max_dead_ratio=0.2)
        is None
    )
    assert len(S.snapshot_versions(t)) == 1

    # dv weight past the ratio: 30% dead
    S.snapshot_delete_where(spark, t, "grp IN (1, 2, 3)", mode="dv")
    st = S.snapshot_table_stats(t)
    assert st["dead_rows"] == 30 and abs(st["dead_ratio"] - 0.3) < 1e-9
    v = S.snapshot_auto_optimize(spark, t, max_small_files=8, max_dead_ratio=0.2)
    assert v is not None
    st2 = S.snapshot_table_stats(t)
    assert st2["dead_rows"] == 0 and st2["files_with_dv"] == 0
    assert S.snapshot_read(spark, t).count() == 70

    # small-file accumulation: appends past the count threshold
    for i in range(4):
        S.snapshot_append(
            spark.range(1000 + i, 1001 + i)
            .withColumn("grp", F.col("id") % 10)
            .withColumn("val", F.col("id") * 2),
            t,
        )
    assert S.snapshot_table_stats(t)["n_files"] > 4
    v2 = S.snapshot_auto_optimize(spark, t, max_small_files=4)
    assert v2 is not None
    assert S.snapshot_table_stats(t)["n_files"] <= 4
    assert S.snapshot_read(spark, t).count() == 74
