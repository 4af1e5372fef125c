"""Generated columns (Delta ``GENERATED ALWAYS AS`` parity) on the
snapshot protocol: declare-time validation, write-path auto-fill and
smuggle rejection, MERGE tombstone exemption, UPDATE recompute from the
post-update image, direct-assignment rejection, schema-evolution guards,
rule stickiness across maintenance commits.

Reference tie: the derived columns the reference's PySpark jobs compute
by hand on every write (date parts, hashes in `process_historical_data
.py`) become a table-level rule the engine enforces and fills.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from music_recommendation_service_spark.sources.snapshots import (
    ConstraintViolationError,
    snapshot_compact,
    snapshot_drop_columns,
    snapshot_drop_generated,
    snapshot_merge,
    snapshot_merge_when,
    snapshot_read,
    snapshot_rename_columns,
    snapshot_set_generated,
    snapshot_update_where,
    snapshot_write,
    snapshot_append,
)


def _df(spark, rows, schema="k long, amount double, doubled double"):
    return spark.createDataFrame(rows, schema)


def _state(spark, path):
    return {
        r["k"]: (r["amount"], r["doubled"])
        for r in snapshot_read(spark, path).collect()
    }


def test_set_generated_validates_existing_data(spark, tmp_path):
    path = str(tmp_path / "gc_set")
    snapshot_write(_df(spark, [(1, 2.0, 4.0), (2, 3.0, 6.0)]), path)
    snapshot_set_generated(spark, path, "doubled", "amount * 2")
    # a second table with a disagreeing row rejects the rule
    bad = str(tmp_path / "gc_set_bad")
    snapshot_write(_df(spark, [(1, 2.0, 5.0)]), bad)
    with pytest.raises(ConstraintViolationError, match="GENERATED"):
        snapshot_set_generated(spark, bad, "doubled", "amount * 2")


def test_append_autofills_and_rejects_smuggle(spark, tmp_path):
    path = str(tmp_path / "gc_append")
    snapshot_write(_df(spark, [(1, 2.0, 4.0)]), path)
    snapshot_set_generated(spark, path, "doubled", "amount * 2")
    # absent column: auto-filled, lands in stored-schema position
    snapshot_append(
        spark.createDataFrame([(2, 5.0)], "k long, amount double"), path
    )
    assert _state(spark, path) == {1: (2.0, 4.0), 2: (5.0, 10.0)}
    # provided-and-wrong: rejected, nothing commits
    with pytest.raises(ConstraintViolationError, match="GENERATED"):
        snapshot_append(_df(spark, [(3, 1.0, 99.0)]), path)
    # provided-and-right: fine
    snapshot_append(_df(spark, [(3, 1.0, 2.0)]), path)
    assert _state(spark, path)[3] == (1.0, 2.0)


def test_merge_autofill_and_tombstone_exemption(spark, tmp_path):
    path = str(tmp_path / "gc_merge")
    snapshot_write(
        spark.createDataFrame(
            [(1, 2.0, 4.0, 1)], "k long, amount double, doubled double, seq long"
        ),
        path, stats_cols=["k"],
    )
    snapshot_set_generated(spark, path, "doubled", "amount * 2")
    # upsert without the generated column: auto-filled; tombstone payload
    # carries junk in the BASE column and must still be exempt
    snapshot_merge(
        spark.createDataFrame(
            [(1, None, 2, True), (5, 7.0, 2, False)],
            "k long, amount double, seq long, _del boolean",
        ),
        path, key_cols=["k"], seq_col="seq", delete_col="_del",
    )
    assert _state(spark, path) == {5: (7.0, 14.0)}
    # provided-and-wrong through merge: rejected
    with pytest.raises(ConstraintViolationError, match="GENERATED"):
        snapshot_merge(
            spark.createDataFrame(
                [(6, 1.0, 3.0, 3)],
                "k long, amount double, doubled double, seq long",
            ),
            path, key_cols=["k"], seq_col="seq",
        )


def test_update_where_recomputes_and_rejects_direct_assignment(spark, tmp_path):
    for mode in ("rewrite", "dv"):
        path = str(tmp_path / f"gc_upd_{mode}")
        snapshot_write(_df(spark, [(1, 2.0, 4.0), (2, 3.0, 6.0)]), path)
        snapshot_set_generated(spark, path, "doubled", "amount * 2")
        with pytest.raises(ValueError, match="GENERATED"):
            snapshot_update_where(
                spark, path, "k = 1", {"doubled": "99.0"}, mode=mode
            )
        # updating the base recomputes the generated column (post-image)
        snapshot_update_where(
            spark, path, "k = 1", {"amount": "amount + 10"}, mode=mode
        )
        assert _state(spark, path) == {1: (12.0, 24.0), 2: (3.0, 6.0)}, mode


def test_merge_when_recomputes_and_validates_generated(spark, tmp_path):
    """Delta MERGE parity: an update clause touching a base column without
    assigning the generated column RECOMPUTES it; an insert clause omitting
    it COMPUTES it; an explicit assignment that disagrees raises."""
    path = str(tmp_path / "gc_mw")
    snapshot_write(_df(spark, [(1, 2.0, 4.0)]), path)
    snapshot_set_generated(spark, path, "doubled", "amount * 2")
    # update not assigning the generated column -> recomputed, not rejected
    snapshot_merge_when(
        spark.createDataFrame([(1, 9.0)], "k long, amount double"),
        path, key_cols=["k"],
        when_matched=[{"action": "update", "set": {"amount": "s.amount"}}],
    )
    assert _state(spark, path) == {1: (9.0, 18.0)}
    # insert clause omitting the generated column -> auto-computed;
    # INSERT * may omit it from the source entirely
    snapshot_merge_when(
        spark.createDataFrame([(2, 5.0)], "k long, amount double"),
        path, key_cols=["k"],
        when_not_matched=[{"action": "insert"}],
    )
    assert _state(spark, path) == {1: (9.0, 18.0), 2: (5.0, 10.0)}
    snapshot_merge_when(
        spark.createDataFrame([(3, 7.0)], "k long, amount double"),
        path, key_cols=["k"],
        when_not_matched=[
            {"action": "insert", "values": {"k": "s.k", "amount": "s.amount"}}
        ],
    )
    assert _state(spark, path)[3] == (7.0, 14.0)
    # an EXPLICIT assignment that disagrees with the rule still raises
    with pytest.raises(ConstraintViolationError, match="GENERATED"):
        snapshot_merge_when(
            spark.createDataFrame([(1, 9.0)], "k long, amount double"),
            path, key_cols=["k"],
            when_matched=[{"action": "update",
                           "set": {"amount": "s.amount",
                                   "doubled": "s.amount * 3"}}],
        )
    # an explicit assignment that agrees lands (validation, not recompute)
    snapshot_merge_when(
        spark.createDataFrame([(1, 11.0)], "k long, amount double"),
        path, key_cols=["k"],
        when_matched=[{"action": "update",
                       "set": {"amount": "s.amount",
                               "doubled": "s.amount * 2"}}],
    )
    assert _state(spark, path)[1] == (11.0, 22.0)


def test_evolution_guards_and_drop_rule(spark, tmp_path):
    path = str(tmp_path / "gc_evo")
    snapshot_write(_df(spark, [(1, 2.0, 4.0)]), path)
    snapshot_set_generated(spark, path, "doubled", "amount * 2")
    with pytest.raises(ValueError, match="generated"):
        snapshot_rename_columns(path, {"amount": "amt"})
    with pytest.raises(ValueError, match="generated"):
        snapshot_drop_columns(path, ["doubled"])
    snapshot_drop_generated(path, "doubled")
    # rule gone: evolution proceeds and writes stop validating
    snapshot_rename_columns(path, {"amount": "amt"})
    assert "amt" in snapshot_read(spark, path).columns


def test_rule_sticky_across_maintenance_commits(spark, tmp_path):
    path = str(tmp_path / "gc_sticky")
    snapshot_write(
        _df(spark, [(k, float(k), float(2 * k)) for k in range(50)]), path
    )
    snapshot_set_generated(spark, path, "doubled", "amount * 2")
    snapshot_compact(spark, path)
    # the rule survived the compaction commit: smuggle still rejected
    with pytest.raises(ConstraintViolationError, match="GENERATED"):
        snapshot_append(_df(spark, [(99, 1.0, 3.0)]), path)
    assert snapshot_read(spark, path).count() == 50
