"""Multi-clause MERGE (snapshot_merge_when): Delta's full ``MERGE INTO ...
WHEN MATCHED [AND c] THEN UPDATE/DELETE / WHEN NOT MATCHED [AND c] THEN
INSERT / WHEN NOT MATCHED BY SOURCE`` surface on the snapshot protocol —
clause ordering, pre-image expression semantics, the multiple-source-match
guard, constraint enforcement on stored rows, CDF integration, and the
insert-only fast path (no rewrite).

Reference parity: the conditional upsert/sync shapes the reference's Delta
writes imply (`pyspark_jobs/spark_utils.py:58`, historical MERGE loads in
`process_historical_data.py:75-78`) beyond latest-per-key upsert.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from music_recommendation_service_spark.sources.snapshots import (
    ConstraintViolationError,
    _manifest_files,
    _read_manifest,
    snapshot_add_constraint,
    snapshot_changes,
    snapshot_merge_when,
    snapshot_read,
    snapshot_write,
)


def _df(spark, rows, cols=("k", "seq", "payload")):
    return spark.createDataFrame(rows, list(cols))


def _state(spark, path):
    return {
        r["k"]: (r["seq"], r["payload"])
        for r in snapshot_read(spark, path).collect()
    }


def test_conditional_update_insert(spark, tmp_path):
    """The canonical upsert: update only when the source is newer, insert
    unmatched — a stale source row leaves the target row alone."""
    path = str(tmp_path / "mw_basic")
    snapshot_write(_df(spark, [(1, 5, "a"), (2, 5, "b")]), path)
    v = snapshot_merge_when(
        _df(spark, [(1, 9, "a9"), (2, 3, "stale"), (3, 1, "c")]),
        path,
        key_cols=["k"],
        when_matched=[{"condition": "s.seq > t.seq", "action": "update",
                       "set": {"seq": "s.seq", "payload": "s.payload"}}],
        when_not_matched=[{"action": "insert"}],
    )
    assert v == 2
    assert _state(spark, path) == {1: (9, "a9"), 2: (5, "b"), 3: (1, "c")}


def test_clause_order_first_match_wins(spark, tmp_path):
    """Two overlapping matched clauses: the FIRST satisfied condition
    applies (Delta clause-order semantics), later clauses never fire."""
    path = str(tmp_path / "mw_order")
    snapshot_write(_df(spark, [(1, 10, "x"), (2, 10, "y")]), path)
    snapshot_merge_when(
        _df(spark, [(1, 10, "src1"), (2, 10, "src2")]),
        path,
        key_cols=["k"],
        when_matched=[
            {"condition": "t.payload = 'x'", "action": "delete"},
            # unconditional second clause — must not see k=1
            {"action": "update", "set": {"payload": "concat(t.payload, '+')"}},
        ],
    )
    assert _state(spark, path) == {2: (10, "y+")}


def test_pre_image_expression_semantics(spark, tmp_path):
    """Assignments evaluate against PRE-merge images: a column swap via
    t.* references cannot observe its own writes."""
    path = str(tmp_path / "mw_preimg")
    snapshot_write(
        _df(spark, [(1, 7, "p")], cols=("k", "a", "b")), path
    )
    snapshot_merge_when(
        _df(spark, [(1, 0, "s")], cols=("k", "a", "b")),
        path,
        key_cols=["k"],
        when_matched=[{"action": "update",
                       "set": {"a": "t.a + 1", "b": "concat(t.b, cast(t.a as string))"}}],
    )
    rows = snapshot_read(spark, path).collect()
    assert [(r["k"], r["a"], r["b"]) for r in rows] == [(1, 8, "p7")]


def test_not_matched_by_source_sync(spark, tmp_path):
    """Full sync: target rows with no source image are deleted (the
    `WHEN NOT MATCHED BY SOURCE THEN DELETE` mirror-table shape), with a
    condition carving out an exempt subset."""
    path = str(tmp_path / "mw_nms")
    snapshot_write(
        _df(spark, [(k, 1, f"r{k}") for k in range(6)]), path
    )
    snapshot_merge_when(
        _df(spark, [(0, 2, "keep0")]),
        path,
        key_cols=["k"],
        when_matched=[{"action": "update", "set": {"seq": "s.seq",
                                                   "payload": "s.payload"}}],
        when_not_matched_by_source=[
            {"condition": "t.k % 3 = 2", "action": "update",
             "set": {"payload": "'orphan'"}},
            {"action": "delete"},
        ],
    )
    assert _state(spark, path) == {
        0: (2, "keep0"), 2: (1, "orphan"), 5: (1, "orphan")
    }


def test_insert_values_and_null_defaults(spark, tmp_path):
    """Explicit insert values: unlisted target columns land NULL; NULL
    conditions count as not-satisfied (three-valued logic)."""
    path = str(tmp_path / "mw_vals")
    snapshot_write(_df(spark, [(1, 1, "a")]), path)
    snapshot_merge_when(
        _df(spark, [(2, None, "b"), (3, 9, "c")],
            cols=("k", "seq", "payload")),
        path,
        key_cols=["k"],
        when_not_matched=[
            # NULL condition for k=2 (s.seq is NULL) -> clause skipped
            {"condition": "s.seq > 0", "action": "insert"},
            {"action": "insert",
             "values": {"k": "s.k", "payload": "upper(s.payload)"}},
        ],
    )
    assert _state(spark, path) == {1: (1, "a"), 3: (9, "c"),
                                   2: (None, "B")}


def test_multiple_source_match_raises(spark, tmp_path):
    """A target row matched by two source rows is a hard error (Delta's
    multiple-source-rows guard); duplicate UNMATCHED keys insert freely."""
    path = str(tmp_path / "mw_dup")
    snapshot_write(_df(spark, [(1, 1, "a")]), path)
    with pytest.raises(ValueError, match="multiple source rows"):
        snapshot_merge_when(
            _df(spark, [(1, 2, "x"), (1, 3, "y")]),
            path, key_cols=["k"],
            when_matched=[{"action": "update", "set": {"seq": "s.seq"}}],
        )
    # duplicates that match nothing are plain inserts (no key-uniqueness
    # invariant in multi-clause merge — Delta parity)
    snapshot_merge_when(
        _df(spark, [(7, 1, "d1"), (7, 2, "d2")]),
        path, key_cols=["k"],
        when_not_matched=[{"action": "insert"}],
    )
    assert snapshot_read(spark, path).filter("k = 7").count() == 2


def test_insert_only_fast_path_rewrites_nothing(spark, tmp_path):
    """An insert-only merge carries every existing file by reference —
    matched source keys are dropped via anti-join, no file rewrites."""
    path = str(tmp_path / "mw_insonly")
    base = _df(spark, [(k, 1, f"r{k}") for k in range(100)])
    v1 = snapshot_write(base.repartitionByRange(4, "k"), path,
                        stats_cols=["k"])
    v2 = snapshot_merge_when(
        _df(spark, [(0, 9, "dupe"), (500, 1, "new")]),
        path, key_cols=["k"],
        when_not_matched=[{"action": "insert"}],
    )
    f1 = {e["path"] for e in _manifest_files(path, _read_manifest(path, v1))}
    f2 = {e["path"] for e in _manifest_files(path, _read_manifest(path, v2))}
    assert f1 <= f2  # every old file carried by reference
    st = _state(spark, path)
    assert st[0] == (1, "r0") and st[500] == (1, "new")
    assert len(st) == 101


def test_noop_returns_none(spark, tmp_path):
    path = str(tmp_path / "mw_noop")
    snapshot_write(_df(spark, [(1, 1, "a")]), path)
    # no matched keys, no insert clauses
    assert snapshot_merge_when(
        _df(spark, [(99, 1, "z")]), path, key_cols=["k"],
        when_matched=[{"action": "delete"}],
    ) is None
    # insert clause whose condition matches nothing
    assert snapshot_merge_when(
        _df(spark, [(1, 1, "a")]), path, key_cols=["k"],
        when_not_matched=[{"action": "insert"}],
    ) is None
    assert snapshot_read(spark, path).count() == 1


def test_constraints_validate_stored_rows(spark, tmp_path):
    """CHECK constraints catch a violating UPDATE image and a violating
    INSERT; nothing commits on failure."""
    path = str(tmp_path / "mw_constraint")
    snapshot_write(_df(spark, [(1, 5, "a")]), path)
    snapshot_add_constraint(spark, path, "pos_seq", "seq > 0")
    with pytest.raises(ConstraintViolationError):
        snapshot_merge_when(
            _df(spark, [(1, 9, "x")]), path, key_cols=["k"],
            when_matched=[{"action": "update", "set": {"seq": "-1"}}],
        )
    with pytest.raises(ConstraintViolationError):
        snapshot_merge_when(
            _df(spark, [(2, -3, "bad")]), path, key_cols=["k"],
            when_not_matched=[{"action": "insert"}],
        )
    assert _state(spark, path) == {1: (5, "a")}


def test_cdf_sees_merge_when(spark, tmp_path):
    """The keyed change feed reads a multi-clause merge as ordinary file
    churn: update pre/post images, inserts, deletes — carried rows silent."""
    path = str(tmp_path / "mw_cdf")
    base = _df(spark, [(k, 1, f"base-{k}") for k in range(40)])
    v1 = snapshot_write(base.repartitionByRange(4, "k"), path,
                        stats_cols=["k"])
    v2 = snapshot_merge_when(
        _df(spark, [(0, 2, "upd"), (1, 0, "del"), (999, 1, "new")]),
        path, key_cols=["k"],
        when_matched=[
            {"condition": "s.payload = 'del'", "action": "delete"},
            {"action": "update", "set": {"seq": "s.seq",
                                         "payload": "s.payload"}},
        ],
        when_not_matched=[{"action": "insert"}],
    )
    got = {
        (r["k"], r["_change_type"]): (r["seq"], r["payload"])
        for r in snapshot_changes(spark, path, v1, v2,
                                  key_cols=["k"]).collect()
    }
    assert got == {
        (0, "update_preimage"): (1, "base-0"),
        (0, "update_postimage"): (2, "upd"),
        (1, "delete"): (1, "base-1"),
        (999, "insert"): (1, "new"),
    }


def test_merge_when_randomized_model(spark, tmp_path):
    """Seeded random waves of a parameterized clause family vs a pure-
    Python model: newer-wins update, flagged delete, conditional insert,
    and (on some waves) not-matched-by-source delete above a threshold."""
    rng = random.Random(1726)
    path = str(tmp_path / "mw_model")
    model = {k: (rng.randint(0, 9), f"p{k}") for k in range(30)}
    snapshot_write(
        _df(spark, [(k, s, p) for k, (s, p) in model.items()]), path
    )
    for wave in range(6):
        n = rng.randint(1, 12)
        keys = rng.sample(range(60), n)
        src = [(k, rng.randint(0, 14),
                "DEL" if rng.random() < 0.25 else f"w{wave}-{k}")
               for k in keys]
        use_nms = wave % 3 == 2
        nms_cut = rng.randint(0, 50)
        v = snapshot_merge_when(
            _df(spark, src), path, key_cols=["k"],
            when_matched=[
                {"condition": "s.payload = 'DEL'", "action": "delete"},
                {"condition": "s.seq > t.seq", "action": "update",
                 "set": {"seq": "s.seq", "payload": "s.payload"}},
            ],
            when_not_matched=[
                {"condition": "s.payload <> 'DEL'", "action": "insert"},
            ],
            when_not_matched_by_source=(
                [{"condition": f"t.k > {nms_cut}", "action": "delete"}]
                if use_nms else []
            ),
        )
        # apply the same wave to the Python model
        src_keys = set()
        for k, s, p in src:
            src_keys.add(k)
            if k in model:
                if p == "DEL":
                    del model[k]
                elif s > model[k][0]:
                    model[k] = (s, p)
            elif p != "DEL":
                model[k] = (s, p)
        if use_nms:
            for k in [k for k in model if k not in src_keys and k > nms_cut]:
                del model[k]
        assert _state(spark, path) == model, f"wave {wave} diverged (v={v})"
