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


def test_sql_create_table_generated_partition_column(spark, tmp_path):
    """The q153 shape declared in ONE SQL statement: CREATE TABLE
    (g TYPE GENERATED ALWAYS AS (expr)) LOCATION ... PARTITIONED BY (g)
    AS SELECT — rule + layout ride the write commit; later INSERTs
    auto-fill; the ts-only scan prunes via the generated derivation."""
    import datetime as dt

    from music_recommendation_service_spark.engine import Engine
    from music_recommendation_service_spark.sources import snapshots as S

    e = Engine(str(tmp_path), spark=spark)
    spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1 + i % 10, 6), float(i)) for i in range(40)],
        "event_id int, ts timestamp, value double",
    ).createOrReplaceTempView("gen_src")
    p = str(tmp_path / "gen_sql")
    e.sql(
        "CREATE TABLE gtv (evt_day TIMESTAMP GENERATED ALWAYS AS "
        f"(date_trunc('day', ts))) LOCATION '{p}' "
        "PARTITIONED BY (evt_day) AS SELECT * FROM gen_src"
    )
    m = S._latest_manifest(p)
    assert m["partition_cols"] == ["evt_day"]
    assert m["generated"] == {"evt_day": "date_trunc('day', ts)"}
    assert S.snapshot_versions(p) == [1]  # rule rides the SAME commit

    # later INSERT auto-fills the generated column
    e.sql(
        "INSERT INTO gtv SELECT 100 AS event_id, "
        "TIMESTAMP '2024-01-03 09:00:00' AS ts, CAST(1.5 AS DOUBLE) AS value"
    )
    got = e.sql(
        "SELECT evt_day FROM gtv WHERE event_id = 100"
    ).collect()[0]["evt_day"]
    assert got == dt.datetime(2024, 1, 3)

    # ts-only predicate prunes via the generated derivation: the scan
    # opens a strict subset of files
    full = S._manifest_files(p, S._latest_manifest(p))
    pruned = S.snapshot_scan(
        spark, p, {"ts": (dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 3, 23))}
    )
    import re as _re

    opened = {
        _re.sub(r".*/(v=[^/]+/)", r"\1", f)
        for f in pruned.inputFiles()
    }
    assert 0 < len(opened) < len(full)
    assert pruned.count() == 8 + 1  # days 2,3 (4 each) + the insert


def test_sql_create_generated_refusals(spark, tmp_path):
    """Bad rules refuse at parse/analysis time, before any commit: unknown
    base column, bad type, name collision, non-generated column specs."""
    import pytest as _pytest

    from music_recommendation_service_spark.engine import Engine
    from music_recommendation_service_spark.sources import snapshots as S
    from music_recommendation_service_spark.sources.sqlfront import (
        SqlDispatchError,
    )

    e = Engine(str(tmp_path), spark=spark)
    spark.createDataFrame(
        [(1, 2.0)], "event_id int, value double"
    ).createOrReplaceTempView("gen_src2")
    p = str(tmp_path / "refuse")

    with _pytest.raises(SqlDispatchError, match="bad GENERATED ALWAYS AS"):
        e.sql(
            "CREATE TABLE r1 (d TIMESTAMP GENERATED ALWAYS AS "
            f"(date_trunc('day', nope_col))) LOCATION '{p}' "
            "AS SELECT * FROM gen_src2"
        )
    with _pytest.raises(SqlDispatchError, match="bad GENERATED ALWAYS AS"):
        e.sql(
            "CREATE TABLE r2 (d NOT_A_TYPE GENERATED ALWAYS AS "
            f"(event_id)) LOCATION '{p}' AS SELECT * FROM gen_src2"
        )
    with _pytest.raises(SqlDispatchError, match="collides"):
        e.sql(
            "CREATE TABLE r3 (value DOUBLE GENERATED ALWAYS AS "
            f"(value * 2)) LOCATION '{p}' AS SELECT * FROM gen_src2"
        )
    with _pytest.raises(SqlDispatchError, match="only declarations"):
        e.sql(
            f"CREATE TABLE r4 (plain_col INT) LOCATION '{p}' "
            "AS SELECT * FROM gen_src2"
        )
    # nothing committed by any refusal
    assert S.snapshot_versions(p) == []
