"""Staged multi-table transactions (snapshot protocol v4).

A LAKE TRANSACTION commits each table's version STAGED — invisible to
every reader until the transaction's single decision file reads
"published". One ``create_exclusive`` on that file decides the whole
transaction (publish and timeout-abort race on the same path, so there
is exactly one outcome). These tests pin the protocol layer directly:
visibility, read-your-writes, the pending-writer gate, timeout abort,
the decision race, vacuum GC of aborted versions, and the
reader/writer-version fail-closed gates. Engine-level semantics
(sql_atomic) are pinned in tests/test_multicommit.py.

Reference tie: the reference's hand-rolled Delta log reader
(``MusicRecommendationService/Services/MinioService.cs:120-161``) replays
only COMMITTED log entries — the staged form generalizes that "nothing
half-applied is ever visible" discipline across N tables.
"""
from __future__ import annotations

import json
import os

import pytest

from music_recommendation_service_spark.sources import snapshots as S
from music_recommendation_service_spark.sources.snapshots import (
    ConcurrentSnapshotError,
    TxnAbortedError,
    snapshot_append,
    snapshot_read,
    snapshot_versions,
    snapshot_write,
)


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


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v long")


def _staged_commit(spark, root, path, rows):
    """Stage one append under a fresh txn and leave it UNDECIDED."""
    txn = S.begin_staged_txn(root)
    try:
        v = snapshot_append(_df(spark, rows), path)
    finally:
        S.end_staged_txn()
    return txn, v


def test_staged_version_invisible_until_published(spark, tmp_path, snapshot_fs):
    root = str(tmp_path)
    p = f"{root}/t"
    snapshot_write(_df(spark, [(1, 1)]), p)
    txn, v2 = _staged_commit(spark, root, p, [(2, 2)])
    assert v2 == 2
    # invisible: versions, read, history all serve the old state
    assert snapshot_versions(p) == [1]
    assert snapshot_read(spark, p).count() == 1
    assert [h["version"] for h in S.snapshot_history(p)] == [1]
    # ...while the raw claim sequence holds the slot
    assert snapshot_versions(p, include_pending=True) == [1, 2]
    # publish: ONE claim flips it visible
    S.txn_publish(txn)
    assert snapshot_versions(p) == [1, 2]
    assert snapshot_read(spark, p).count() == 2
    assert [h["version"] for h in S.snapshot_history(p)] == [2, 1]


def test_read_your_writes_inside_txn(spark, tmp_path):
    root = str(tmp_path)
    p = f"{root}/t"
    snapshot_write(_df(spark, [(1, 1)]), p)
    txn = S.begin_staged_txn(root)
    try:
        snapshot_append(_df(spark, [(2, 2)]), p)
        # the staging thread reads its own staged version...
        assert snapshot_versions(p) == [1, 2]
        assert snapshot_read(spark, p).count() == 2
        # ...and a second commit in the SAME txn builds on it
        snapshot_append(_df(spark, [(3, 3)]), p)
        assert snapshot_read(spark, p).count() == 3
    finally:
        S.end_staged_txn()
    assert snapshot_versions(p) == [1]
    S.txn_publish(txn)
    assert snapshot_versions(p) == [1, 2, 3]


def test_pending_stage_blocks_concurrent_writer(spark, tmp_path, snapshot_fs):
    root = str(tmp_path)
    p = f"{root}/t"
    snapshot_write(_df(spark, [(1, 1)]), p)
    txn, _ = _staged_commit(spark, root, p, [(2, 2)])
    with pytest.raises(ConcurrentSnapshotError, match="staged transaction"):
        snapshot_append(_df(spark, [(9, 9)]), p)
    # after publish the writer goes through, rebased on the staged commit
    S.txn_publish(txn)
    snapshot_append(_df(spark, [(9, 9)]), p)
    assert snapshot_versions(p) == [1, 2, 3]
    assert snapshot_read(spark, p).count() == 3


def test_stale_pending_txn_aborted_by_blocked_writer(spark, tmp_path, monkeypatch, snapshot_fs):
    root = str(tmp_path)
    p = f"{root}/t"
    snapshot_write(_df(spark, [(1, 1)]), p)
    txn, _ = _staged_commit(spark, root, p, [(2, 2)])  # stager "crashed"
    monkeypatch.setattr(S, "_STAGED_TXN_TIMEOUT", 0.0)
    snapshot_append(_df(spark, [(9, 9)]), p)  # decides abort, claims past
    assert snapshot_versions(p) == [1, 3]  # v2 is a permanent hole
    assert {r["k"] for r in snapshot_read(spark, p).collect()} == {1, 9}
    # the crashed stager's late publish attempt refuses loudly
    with pytest.raises(TxnAbortedError):
        S.txn_publish(txn)


def test_decision_race_is_single_outcome(tmp_path):
    """Publish vs timeout-abort race on ONE decision file: whoever claims
    first wins; the loser reads the decided outcome."""
    root = str(tmp_path)
    txn = S.begin_staged_txn(root)
    S.end_staged_txn()
    assert S.txn_abort(txn) == "aborted"
    with pytest.raises(TxnAbortedError):
        S.txn_publish(txn)
    # and the reverse order on a second txn
    txn2 = S.begin_staged_txn(root)
    S.end_staged_txn()
    S.txn_publish(txn2)
    assert S.txn_abort(txn2) == "published"  # abort reports, never reverts


def test_time_travel_refuses_invisible_versions(spark, tmp_path):
    root = str(tmp_path)
    p = f"{root}/t"
    snapshot_write(_df(spark, [(1, 1)]), p)
    txn, _ = _staged_commit(spark, root, p, [(2, 2)])
    with pytest.raises(ValueError, match="not in"):
        snapshot_read(spark, p, version=2)
    S.txn_abort(txn)
    with pytest.raises(ValueError, match="not in"):
        snapshot_read(spark, p, version=2)


def test_vacuum_reclaims_aborted_staged_versions(spark, tmp_path, monkeypatch, snapshot_fs):
    root = str(tmp_path)
    p = f"{root}/t"
    snapshot_write(_df(spark, [(1, 1)]), p)
    txn, _ = _staged_commit(spark, root, p, [(2, 2)])
    S.txn_abort(txn)
    removed = S.snapshot_vacuum(p, keep_last=5, orphan_min_age_sec=0.0)
    # the aborted manifest, its hint, and its orphaned data dir are gone
    assert not os.path.exists(os.path.join(p, "_snapshots", "2.json"))
    assert not os.path.exists(os.path.join(p, "_snapshots", "2.staged.json"))
    assert snapshot_versions(p, include_pending=True) == [1]
    assert any(r.startswith("v=2") or "staged" in r for r in removed)
    assert snapshot_read(spark, p).count() == 1


def test_vacuum_protects_young_pending_txn(spark, tmp_path, snapshot_fs):
    root = str(tmp_path)
    p = f"{root}/t"
    snapshot_write(_df(spark, [(1, 1)]), p)
    txn, _ = _staged_commit(spark, root, p, [(2, 2)])
    S.snapshot_vacuum(p, keep_last=1, orphan_min_age_sec=0.0)
    # the pending staged version survives (manifest AND data)
    assert snapshot_versions(p, include_pending=True) == [1, 2]
    S.txn_publish(txn)
    assert snapshot_read(spark, p).count() == 2


def test_old_reader_and_writer_refuse_staged_manifests(spark, tmp_path, monkeypatch):
    root = str(tmp_path)
    p = f"{root}/t"
    snapshot_write(_df(spark, [(1, 1)]), p)
    txn, _ = _staged_commit(spark, root, p, [(2, 2)])
    S.txn_publish(txn)
    m = json.loads(
        S._fs().read_text(os.path.join(p, "_snapshots", "2.json"))
    )
    assert m["min_reader"] >= 4 and m["min_writer"] >= 4
    monkeypatch.setattr(S, "_READER_VERSION", 3)
    with pytest.raises(S.UnsupportedSnapshotProtocolError):
        snapshot_read(spark, p)
    monkeypatch.setattr(S, "_READER_VERSION", 4)
    monkeypatch.setattr(S, "_WRITER_VERSION", 3)
    with pytest.raises(S.UnsupportedSnapshotProtocolError):
        snapshot_append(_df(spark, [(9, 9)]), p)


def test_tombstone_backfill_keeps_checks_local(spark, tmp_path):
    root = str(tmp_path)
    p = f"{root}/t"
    snapshot_write(_df(spark, [(1, 1)]), p)
    txn, _ = _staged_commit(spark, root, p, [(2, 2)])
    S.txn_publish(txn)
    # first visibility check backfills the table-local tombstone...
    assert snapshot_versions(p) == [1, 2]
    local = os.path.join(p, "_snapshots", "txn", f"{txn.id}.final")
    assert (S._fs().read_text(local) or "").strip() == "published"
    # ...so visibility survives the GLOBAL decision file disappearing
    # (e.g. a relocated lake root)
    S._fs().delete_file(txn.final)
    assert snapshot_versions(p) == [1, 2]
    assert snapshot_read(spark, p).count() == 2


def test_published_txn_hints_garbage_collected(spark, tmp_path):
    """After publish + tombstone backfill, the versions' staged hints are
    gone (published versions are unconditionally visible — the resolver
    returns to the zero-overhead listing fast path), while an ABORTED
    transaction keeps its hints (they route readers to the invisibility
    check)."""
    root = str(tmp_path)
    p = f"{root}/t"
    snapshot_write(_df(spark, [(1, 1)]), p)
    txn, v2 = _staged_commit(spark, root, p, [(2, 2)])
    hint = os.path.join(p, "_snapshots", f"{v2}.staged.json")
    assert S._fs().is_file(hint)
    S.txn_publish(txn)
    S.txn_backfill_tombstones(txn, [p])
    assert not S._fs().is_file(hint)
    assert snapshot_versions(p) == [1, 2]
    assert snapshot_read(spark, p).count() == 2

    # aborted: hint survives, version stays invisible
    txn2, v3 = _staged_commit(spark, root, p, [(3, 3)])
    S.txn_abort(txn2)
    S.txn_backfill_tombstones(txn2, [p])
    hint3 = os.path.join(p, "_snapshots", f"{v3}.staged.json")
    assert S._fs().is_file(hint3)
    assert snapshot_versions(p) == [1, 2]


def test_engine_transaction_context_manager(spark, tmp_path):
    """`with eng.transaction():` — the Python twin of BEGIN LAKE
    TRANSACTION for direct snapshot-API callers: both commits publish
    together on exit; an exception leaves both invisible."""
    from music_recommendation_service_spark.engine import Engine

    root = str(tmp_path)
    a, b = f"{root}/a", f"{root}/b"
    snapshot_write(_df(spark, [(1, 1)]), a)
    snapshot_write(_df(spark, [(1, 1)]), b)
    e = Engine(root, spark=spark)

    with e.transaction():
        snapshot_append(_df(spark, [(2, 2)]), a)
        snapshot_append(_df(spark, [(2, 2)]), b)
    assert snapshot_read(spark, a).count() == 2
    assert snapshot_read(spark, b).count() == 2

    with pytest.raises(RuntimeError, match="boom"):
        with e.transaction():
            snapshot_append(_df(spark, [(3, 3)]), a)
            raise RuntimeError("boom")
    # the staged commit never surfaced; a later writer claims past it
    assert snapshot_versions(a) == [1, 2]
    assert snapshot_read(spark, a).count() == 2
