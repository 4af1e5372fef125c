"""format("snapshot") — the snapshot protocol as a Spark Python data source.

Contract under test (sources/datasource.py):
- batch reads are row-identical to ``snapshot_read`` across the protocol's
  whole op alphabet (append / merge / DV delete+update / schema evolution /
  column mapping / compact / zorder / time travel);
- pushed filters drive manifest stats + Bloom FILE skipping (pruning is
  observable on the reader object) while Spark re-applies them row-exactly;
- the streaming source replays the commit chain exactly-once through a
  checkpoint, does Delta-style initial snapshots, skips data_change=false
  commits, fails append-mode on rewrites unless skipChangeCommits, and in
  readChangeFeed mode emits the keyless CDF that ``snapshot_changes``
  defines;
- the batch writer is a two-phase distributed commit whose manifests carry
  the same per-file stats/Bloom discipline as the native write path, with
  append-race rebase and invisible-orphan crash semantics.
"""

import json
import os
import threading

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, In, IsNotNull

from music_recommendation_service_spark.sources import snapshots as sn
from music_recommendation_service_spark.sources.datasource import (
    SnapshotBatchReader,
    register_snapshot_datasource,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_snapshot_datasource(spark)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _scan_files(reader):
    """Files surviving the reader's pruning, across the size-binned input
    partitions (partitions() groups files per task; pruning is per-file)."""
    return [f for p in reader.partitions() for f in p.files]


def _assert_parity(spark, path, version=None):
    opts = {} if version is None else {"version": str(version)}
    got = spark.read.format("snapshot").options(**opts).load(path)
    want = sn.snapshot_read(spark, path, version=version)
    assert got.schema == want.schema
    assert _rows(got) == _rows(want)


# --------------------------------------------------------------------------
# batch read parity across the op alphabet
# --------------------------------------------------------------------------


def test_batch_parity_across_op_alphabet(spark, tmp_path):
    t = str(tmp_path / "tbl")
    base = spark.range(60).selectExpr(
        "id", "id % 5 as k", "cast(id as string) as s", "cast(id * 1.5 as double) as x"
    )
    sn.snapshot_write(base, t, stats_cols=["id"], bloom_cols=["s"])
    _assert_parity(spark, t)

    sn.snapshot_append(
        spark.range(60, 90).selectExpr(
            "id", "id % 5 as k", "cast(id as string) as s", "cast(id * 1.5 as double) as x"
        ),
        t, stats_cols=["id"], bloom_cols=["s"],
    )
    _assert_parity(spark, t)

    sn.snapshot_merge(
        spark.range(85, 100).selectExpr(
            "id", "id % 5 as k", "concat('m', id) as s", "cast(1e6 as double) as x"
        ),
        t, key_cols=["id"], seq_col="x",
    )
    _assert_parity(spark, t)

    sn.snapshot_delete_where(spark, t, "k = 2", mode="dv")
    _assert_parity(spark, t)

    sn.snapshot_update_where(spark, t, "k = 3", {"x": "x + 100"}, mode="dv")
    _assert_parity(spark, t)

    from pyspark.sql.types import IntegerType, StructField

    sn.snapshot_add_columns(t, [StructField("extra", IntegerType())])
    _assert_parity(spark, t)  # old files null-fill the new column

    sn.snapshot_rename_columns(t, {"s": "name"})
    _assert_parity(spark, t)  # physical names alias back to logical

    sn.snapshot_compact(spark, t, small_file_max_rows=10_000)
    _assert_parity(spark, t)

    sn.snapshot_zorder(spark, t, ["k", "id"])
    _assert_parity(spark, t)

    sn.snapshot_drop_columns(t, ["extra"])
    _assert_parity(spark, t)

    # time travel: every surviving version reads identically through both
    for v in sn.snapshot_versions(t)[::3]:
        _assert_parity(spark, t, version=v)


def test_timestamp_as_of(spark, tmp_path):
    t = str(tmp_path / "tbl")
    sn.snapshot_write(spark.range(3).selectExpr("id"), t)
    m1 = sn._read_manifest(t, 1)
    sn.snapshot_append(spark.range(3, 6).selectExpr("id"), t)
    m2 = sn._read_manifest(t, 2)
    mid = (m1["committed_at"] + m2["committed_at"]) / 2  # aim BETWEEN commits
    got = (
        spark.read.format("snapshot").option("timestampAsOf", str(mid)).load(t)
    )
    assert got.count() == 3


def test_timestamp_as_of_iso_string(spark, tmp_path):
    """Delta-style ISO timestamp strings parse too (naive = UTC), matching
    the SQL front's RESTORE ... TIMESTAMP AS OF."""
    import datetime as dt

    t = str(tmp_path / "tbl")
    sn.snapshot_write(spark.range(3).selectExpr("id"), t)
    m1 = sn._read_manifest(t, 1)
    sn.snapshot_append(spark.range(3, 6).selectExpr("id"), t)
    m2 = sn._read_manifest(t, 2)
    mid = (m1["committed_at"] + m2["committed_at"]) / 2
    iso = dt.datetime.fromtimestamp(mid, tz=dt.timezone.utc).replace(
        tzinfo=None
    ).isoformat(sep=" ")
    got = spark.read.format("snapshot").option("timestampAsOf", iso).load(t)
    assert got.count() == 3
    with pytest.raises(Exception, match="committed at or before"):
        spark.read.format("snapshot").option(
            "timestampAsOf", "1999-01-01 00:00:00"
        ).load(t).collect()


def test_batch_cdf_option_rejected(spark, tmp_path):
    t = str(tmp_path / "tbl")
    sn.snapshot_write(spark.range(3).selectExpr("id"), t)
    with pytest.raises(Exception, match="snapshot_changes"):
        spark.read.format("snapshot").option("readChangeFeed", "true").load(t).collect()


# --------------------------------------------------------------------------
# filter pushdown -> file skipping
# --------------------------------------------------------------------------


def _chunked_table(spark, t, n_chunks=6, rows=50):
    """n_chunks appends with DISJOINT id ranges and distinct string keys —
    min/max stats separate them on id; blooms separate them on s."""
    for c in range(n_chunks):
        df = spark.range(c * rows, (c + 1) * rows).selectExpr(
            "id", "concat('x', id) as s"
        )
        if c == 0:
            sn.snapshot_write(df, t, stats_cols=["id"], bloom_cols=["s"])
        else:
            sn.snapshot_append(df, t, stats_cols=["id"], bloom_cols=["s"])
    return sn._latest_manifest(t)


def test_pushdown_prunes_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    m = _chunked_table(spark, t)
    total = len(m["files"])
    assert total >= 6

    r = SnapshotBatchReader({"path": t}, schema=None)
    returned = r.pushFilters([EqualTo(("s",), "x123")])
    assert list(returned) == [EqualTo(("s",), "x123")]  # Spark re-applies all
    pruned = _scan_files(r)
    assert 0 < len(pruned) < total  # bloom point skip

    r2 = SnapshotBatchReader({"path": t}, schema=None)
    r2.pushFilters([GreaterThan(("id",), 249)])
    assert 0 < len(_scan_files(r2)) < total  # min/max range skip

    r3 = SnapshotBatchReader({"path": t}, schema=None)
    r3.pushFilters([In(("s",), ("x3", "x260"))])
    assert 0 < len(_scan_files(r3)) < total

    # and the E2E answers stay exact
    got = spark.read.format("snapshot").load(t).filter("s = 'x123'").collect()
    assert [r_["id"] for r_ in got] == [123]
    assert spark.read.format("snapshot").load(t).filter("id > 249").count() == 50


def test_scan_partitions_are_size_binned(spark, tmp_path):
    """Many small commit files pack into FEW input partitions (Spark's
    maxPartitionBytes + openCostInBytes algorithm) instead of one Python
    task per file; the options re-split them; answers are identical."""
    t = str(tmp_path / "tbl")
    m = _chunked_table(spark, t)
    total = len(m["files"])
    assert total >= 6

    r = SnapshotBatchReader({"path": t}, schema=None)
    bins = r.partitions()
    assert len(bins) < total  # tiny files share tasks under the default cap
    assert sum(len(p.files) for p in bins) == total

    # shrinking the cap re-splits down to one file per task
    r1 = SnapshotBatchReader(
        {"path": t, "maxpartitionbytes": "1", "opencostinbytes": "0"},
        schema=None,
    )
    assert len(r1.partitions()) == total

    got_default = _rows(spark.read.format("snapshot").load(t))
    got_split = _rows(
        spark.read.format("snapshot").option("maxPartitionBytes", "1").load(t)
    )
    assert got_default == got_split == _rows(sn.snapshot_read(spark, t))


def test_pushdown_never_loses_rows_on_statless_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    sn.snapshot_write(spark.range(10).selectExpr("id"), t)  # no stats at all
    r = SnapshotBatchReader({"path": t}, schema=None)
    r.pushFilters([EqualTo(("id",), 3), GreaterThan(("id",), 100)])
    assert len(_scan_files(r)) == len(sn._latest_manifest(t)["files"])


def test_isnotnull_skips_all_null_bloom_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    sn.snapshot_write(
        spark.range(5).selectExpr("id", "cast(null as string) as s"),
        t, bloom_cols=["s"],
    )
    sn.snapshot_append(
        spark.range(5, 10).selectExpr("id", "concat('v', id) as s"),
        t, bloom_cols=["s"],
    )
    r = SnapshotBatchReader({"path": t}, schema=None)
    r.pushFilters([IsNotNull(("s",))])
    kept = _scan_files(r)
    assert len(kept) < len(sn._latest_manifest(t)["files"])
    got = spark.read.format("snapshot").load(t).filter("s is not null")
    assert got.count() == 5


# --------------------------------------------------------------------------
# distributed two-phase writer
# --------------------------------------------------------------------------


def test_writer_creates_and_appends_with_native_discipline(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.range(100).selectExpr("id", "concat('k', id) as s")
    df.write.format("snapshot").mode("overwrite") \
        .option("statsCols", "id").option("bloomCols", "s").save(t)
    m = sn._latest_manifest(t)
    assert m["op"] == "datasource_overwrite"
    assert m["n_rows"] == 100
    for e in m["files"]:
        assert e["stats"] and "id" in e["stats"]
        assert e.get("bloom_ref")
    # native readers consume DS-written tables unchanged, stats and all
    assert sn.snapshot_read(spark, t).count() == 100
    assert _rows(sn.snapshot_scan(spark, t, {"id": (7, 7)})) == [(7, "k7")]

    # appends inherit the table's stats/bloom discipline without options
    spark.range(100, 130).selectExpr("id", "concat('k', id) as s") \
        .write.format("snapshot").mode("append").save(t)
    m2 = sn._latest_manifest(t)
    assert m2["op"] == "datasource_append" and m2["n_rows"] == 130
    new_files = [e for e in m2["files"] if e not in m["files"]]
    assert new_files and all(e["stats"] and e.get("bloom_ref") for e in new_files)
    # ...and the DS-written blooms actually skip on the DS READ path
    r = SnapshotBatchReader({"path": t}, schema=None)
    r.pushFilters([EqualTo(("s",), "k115")])
    assert len(_scan_files(r)) < len(m2["files"])


def test_writer_bloom_bitsets_match_native_write_path(spark, tmp_path):
    """Same data written by snapshot_write (JVM xxhash64 positions) and by
    the DataSource writer (pure-Python XXH64) must produce byte-identical
    bloom bitsets — the strongest form of the hash-parity claim."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df = spark.range(500).selectExpr("id", "concat('v', id) as s").coalesce(1)
    sn.snapshot_write(df, a, bloom_cols=["s"])
    df.write.format("snapshot").mode("overwrite").option("bloomCols", "s").save(b)

    def side(t):
        m = sn._latest_manifest(t)
        [e] = m["files"]
        ref = sn._dv_ref_path(t, e["bloom_ref"])
        return list(json.loads(sn._fs().read_text(ref)).values())

    [ba], [bb] = side(a), side(b)
    assert ba == bb


def test_writer_append_schema_mismatch(spark, tmp_path):
    t = str(tmp_path / "tbl")
    spark.range(5).selectExpr("id").write.format("snapshot").mode("overwrite").save(t)
    with pytest.raises(Exception, match="schema mismatch"):
        spark.range(5).selectExpr("id", "id as extra") \
            .write.format("snapshot").mode("append").save(t)


def test_writer_enforces_check_constraints_in_task(spark, tmp_path):
    """CHECK constraints validate executor-side (DuckDB over the Arrow
    batch): clean batches land, violating batches reject per-batch with
    snapshot_append's semantics (false OR null fails) and commit nothing."""
    t = str(tmp_path / "tbl")
    sn.snapshot_write(spark.range(5).selectExpr("id"), t)
    sn.snapshot_add_constraint(spark, t, "pos", "id >= 0")
    # clean append lands and the constraint survives in the manifest
    spark.range(5, 8).selectExpr("id").write.format("snapshot").mode(
        "append"
    ).save(t)
    assert sn.snapshot_read(spark, t).count() == 8
    assert "pos" in sn._latest_manifest(t)["constraints"]
    v_before = sn.snapshot_versions(t)[-1]
    # violating append rejects; same failure the native path raises
    with pytest.raises(Exception, match="violates CHECK constraint"):
        spark.range(3).selectExpr("id - 10 as id").write.format(
            "snapshot"
        ).mode("append").save(t)
    with pytest.raises(sn.ConstraintViolationError):
        sn.snapshot_append(spark.range(3).selectExpr("id - 10 as id"), t)
    # NULL fails the predicate too (Delta CHECK semantics)
    with pytest.raises(Exception, match="violates CHECK constraint"):
        spark.range(1).selectExpr("cast(null as long) as id").write.format(
            "snapshot"
        ).mode("append").save(t)
    assert sn.snapshot_versions(t)[-1] == v_before
    assert sn.snapshot_read(spark, t).count() == 8
    # DS overwrite validates too, and keeps the constraint sticky
    spark.range(2).selectExpr("id + 100 as id").write.format("snapshot").mode(
        "overwrite"
    ).save(t)
    assert "pos" in sn._latest_manifest(t)["constraints"]
    with pytest.raises(Exception, match="violates CHECK constraint"):
        spark.range(1).selectExpr("id - 99 as id").write.format(
            "snapshot"
        ).mode("overwrite").save(t)


def test_writer_rejects_unevaluable_constraint_fail_closed(spark, tmp_path):
    """A CHECK expression the task evaluator cannot run must reject the
    write loudly — never commit unvalidated rows."""
    t = str(tmp_path / "tbl")
    sn.snapshot_write(spark.range(5).selectExpr("id"), t)
    # xxhash64 is Spark-only; the native path validates fine...
    sn.snapshot_add_constraint(spark, t, "odd", "pmod(xxhash64(id), 2) >= 0")
    with pytest.raises(Exception, match="not executor-evaluable"):
        spark.range(5, 8).selectExpr("id").write.format("snapshot").mode(
            "append"
        ).save(t)
    # ...and the table is untouched
    assert sn.snapshot_read(spark, t).count() == 5


def test_writer_identity_autofill_and_supply_refusal(spark, tmp_path):
    """Identity through the DataSource writer (round-11 verdict order
    #7): a batch that OMITS the identity column gets task-reserved ids —
    unique, step-spaced, disjoint from existing; SUPPLYING the column
    refuses (GENERATED ALWAYS), and a wrong remaining schema refuses."""
    t = str(tmp_path / "tbl")
    sn.snapshot_write(spark.range(5).selectExpr("id", "id * 2 as val"), t)
    sn.snapshot_set_identity(spark, t, "id")
    next0 = sn._latest_manifest(t)["identity"]["next"]

    # auto-assign: omit id, matching remaining schema
    spark.range(5).selectExpr("id * 10 as val").write.format(
        "snapshot"
    ).mode("append").save(t)
    rows = sn.snapshot_read(spark, t).collect()
    assert len(rows) == 10
    ids = [r["id"] for r in rows]
    assert len(set(ids)) == 10  # all unique
    new_ids = sorted(i for i in ids if i >= next0)
    assert len(new_ids) == 5  # the batch drew from the reserved range
    assert sn._latest_manifest(t)["identity"]["next"] >= next0 + 5

    # supplying the identity column refuses (GENERATED ALWAYS)
    with pytest.raises(Exception, match="GENERATED ALWAYS AS IDENTITY"):
        spark.range(5).selectExpr("id", "id * 2 as val").write.format(
            "snapshot"
        ).mode("append").save(t)
    # wrong remaining schema refuses loudly
    with pytest.raises(Exception, match="auto-fill schema mismatch"):
        spark.range(5).selectExpr("cast(9.0 as double) as val").write.format(
            "snapshot"
        ).mode("append").save(t)


def test_writer_concurrent_appends_both_land(spark, tmp_path):
    t = str(tmp_path / "tbl")
    spark.range(10).selectExpr("id").write.format("snapshot").mode("overwrite").save(t)
    errs = []

    def go(lo):
        try:
            # Python data sources resolve through the JVM's active-session
            # thread-local, which a fresh py4j thread lacks — generic Spark
            # behavior for ANY Python DS, not a snapshot-protocol issue.
            spark._jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
                spark._jsparkSession
            )
            spark.range(lo, lo + 10).selectExpr("id") \
                .write.format("snapshot").mode("append").save(t)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th = [threading.Thread(target=go, args=(lo,)) for lo in (100, 200)]
    [x.start() for x in th]
    [x.join() for x in th]
    assert not errs
    assert sn.snapshot_read(spark, t).count() == 30
    assert sn.snapshot_versions(t) == [1, 2, 3]  # loser rebased, not lost


def test_writer_commit_race_rebase_deterministic(spark, tmp_path):
    """The two-phase commit race, interleaved DETERMINISTICALLY: two writer
    objects land their data dirs, then commit in sequence — the second
    build() sees the first's manifest as `latest` and stacks on it, the
    exact rebase rule snapshot_append uses."""
    import pyarrow as pa

    from music_recommendation_service_spark.sources.datasource import (
        SnapshotBatchWriter,
    )

    t = str(tmp_path / "tbl")
    spark.range(10).selectExpr("id").write.format("snapshot").mode("overwrite").save(t)
    schema = sn.snapshot_read(spark, t).schema
    w1 = SnapshotBatchWriter({"path": t}, schema, overwrite=False)
    w2 = SnapshotBatchWriter({"path": t}, schema, overwrite=False)
    b1 = pa.RecordBatch.from_pydict({"id": pa.array([100, 101], pa.int64())})
    b2 = pa.RecordBatch.from_pydict({"id": pa.array([200], pa.int64())})
    m1 = w1.write(iter([b1]))
    m2 = w2.write(iter([b2]))
    w1.commit([m1])
    w2.commit([m2])  # rebases on w1's commit
    assert sn.snapshot_read(spark, t).count() == 13
    assert sn._latest_manifest(t)["n_rows"] == 13


def test_orphan_data_dir_is_invisible(spark, tmp_path):
    """Crash between data land and manifest commit: readers never see the
    orphan (both native and DataSource paths trust only manifests)."""
    t = str(tmp_path / "tbl")
    sn.snapshot_write(spark.range(10).selectExpr("id"), t)
    rel, full = sn._new_data_dir(t)
    spark.range(1000, 1010).selectExpr("id").coalesce(1).write.parquet(full)
    assert spark.read.format("snapshot").load(t).count() == 10
    assert sn.snapshot_read(spark, t).count() == 10


def test_writer_to_renamed_table_uses_physical_names(spark, tmp_path):
    t = str(tmp_path / "tbl")
    sn.snapshot_write(spark.range(5).selectExpr("id", "concat('a', id) as s"), t)
    sn.snapshot_rename_columns(t, {"s": "name"})
    spark.range(5, 8).selectExpr("id", "concat('a', id) as name") \
        .write.format("snapshot").mode("append").save(t)
    _assert_parity(spark, t)
    assert sn.snapshot_read(spark, t).columns == ["id", "name"]


# --------------------------------------------------------------------------
# streaming source
# --------------------------------------------------------------------------


def _run_to_parquet(spark, t, out, cp, **opts):
    q = (
        spark.readStream.format("snapshot").options(**opts).load(t)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", cp).trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out)


def test_stream_initial_snapshot_then_incremental_exactly_once(spark, tmp_path):
    t, out, cp = (str(tmp_path / p) for p in ("tbl", "out", "cp"))
    sn.snapshot_write(spark.range(10).selectExpr("id"), t)
    sn.snapshot_append(spark.range(10, 20).selectExpr("id"), t)
    assert _run_to_parquet(spark, t, out, cp).count() == 20  # snapshot of v2
    sn.snapshot_append(spark.range(20, 25).selectExpr("id"), t)
    got = _run_to_parquet(spark, t, out, cp)
    assert got.count() == 25  # only the delta landed
    # replay with the same checkpoint is a no-op (exactly-once)
    assert _run_to_parquet(spark, t, out, cp).count() == 25
    assert _rows(got) == _rows(sn.snapshot_read(spark, t))


def test_stream_skips_data_change_false_commits(spark, tmp_path):
    t, out, cp = (str(tmp_path / p) for p in ("tbl", "out", "cp"))
    sn.snapshot_write(spark.range(20).selectExpr("id", "id % 3 as k"), t)
    assert _run_to_parquet(spark, t, out, cp).count() == 20
    sn.snapshot_zorder(spark, t, ["k"])  # rewrite, data_change=false
    sn.snapshot_append(spark.range(20, 22).selectExpr("id", "id % 3 as k"), t)
    assert _run_to_parquet(spark, t, out, cp).count() == 22


def test_stream_append_mode_fails_on_rewrite_unless_skipped(spark, tmp_path):
    t = str(tmp_path / "tbl")
    sn.snapshot_write(spark.range(10).selectExpr("id"), t)
    sn.snapshot_delete_where(spark, t, "id < 3", mode="dv")
    sn.snapshot_append(spark.range(10, 15).selectExpr("id"), t)
    with pytest.raises(Exception, match="skipChangeCommits"):
        _run_to_parquet(
            spark, t, str(tmp_path / "o1"), str(tmp_path / "c1"),
            startingVersion="earliest",
        )
    got = _run_to_parquet(
        spark, t, str(tmp_path / "o2"), str(tmp_path / "c2"),
        startingVersion="earliest", skipChangeCommits="true",
    )
    # v1 inserts + v3 inserts; the DV rewrite commit is skipped wholesale
    assert got.count() == 15


def test_stream_cdf_matches_native_keyless_feed(spark, tmp_path):
    t, out, cp = (str(tmp_path / p) for p in ("tbl", "out", "cp"))
    sn.snapshot_write(spark.range(10).selectExpr("id", "id % 3 as k"), t)
    sn.snapshot_append(spark.range(10, 16).selectExpr("id", "id % 3 as k"), t)
    sn.snapshot_delete_where(spark, t, "id in (1, 12)", mode="dv")
    sn.snapshot_merge(
        spark.range(14, 18).selectExpr("id", "cast(9 as bigint) as k"),
        t, key_cols=["id"], seq_col="k",
    )
    got = _run_to_parquet(
        spark, t, out, cp, startingVersion="2", readChangeFeed="true"
    )
    # The stream emits PER-COMMIT changes (Delta CDF streaming semantics);
    # the native batch walk additionally cancels a file added then removed
    # INSIDE the window. Both must NET to the same state transition:
    # state(v1) + Σchanges == state(latest).
    net = (
        got.groupBy("id", "k")
        .agg(
            F.sum(
                F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
            ).alias("n")
        )
        .filter("n != 0")
    )
    start = {tuple(r): 1 for r in sn.snapshot_read(spark, t, version=1).collect()}
    for r in net.collect():
        start[(r["id"], r["k"])] = start.get((r["id"], r["k"]), 0) + r["n"]
    reconstructed = sorted(k for k, v in start.items() if v == 1)
    assert not [k for k, v in start.items() if v not in (0, 1)]
    assert reconstructed == _rows(sn.snapshot_read(spark, t))
    # commit versions are stamped and monotone within the window
    vs = [r["_commit_version"] for r in got.select("_commit_version").collect()]
    assert set(vs) <= set(sn.snapshot_versions(t)[1:])
    # and a window holding a SINGLE change commit matches the native feed
    # row-for-row (no cross-commit cancellation in play)
    got3 = _run_to_parquet(
        spark, t, str(tmp_path / "o3"), str(tmp_path / "c3"),
        startingVersion="3", maxVersionsPerTrigger="1", readChangeFeed="true",
    )
    want3 = sn.snapshot_changes(spark, t, from_version=2, to_version=3)
    g3 = sorted(tuple(r) for r in got3.filter("_commit_version = 3")
                .select("id", "k", "_change_type").collect())
    w3 = sorted(tuple(r) for r in want3.select("id", "k", "_change_type").collect())
    assert g3 == w3


def test_stream_cdf_initial_snapshot(spark, tmp_path):
    t, out, cp = (str(tmp_path / p) for p in ("tbl", "out", "cp"))
    sn.snapshot_write(spark.range(7).selectExpr("id"), t)
    got = _run_to_parquet(spark, t, out, cp, readChangeFeed="true")
    assert got.count() == 7
    assert {r["_change_type"] for r in got.collect()} == {"insert"}


def test_stream_max_versions_per_trigger(spark, tmp_path):
    t, out, cp = (str(tmp_path / p) for p in ("tbl", "out", "cp"))
    sn.snapshot_write(spark.range(5).selectExpr("id"), t)
    for lo in (5, 10, 15):
        sn.snapshot_append(spark.range(lo, lo + 5).selectExpr("id"), t)
    q = (
        spark.readStream.format("snapshot")
        .option("startingVersion", "earliest")
        .option("maxVersionsPerTrigger", "1").load(t)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", cp).trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    # one version per micro-batch; availableNow drains all of them
    assert spark.read.parquet(out).count() == 20


def test_stream_schema_change_mid_stream_fails_then_restart_widens(spark, tmp_path):
    import time

    from pyspark.sql.types import IntegerType, StructField

    t, out, cp = (str(tmp_path / p) for p in ("tbl", "out", "cp"))
    sn.snapshot_write(spark.range(5).selectExpr("id"), t)
    q = (
        spark.readStream.format("snapshot").load(t)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .trigger(processingTime="500 milliseconds").start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not os.path.exists(out):
            time.sleep(0.2)
        sn.snapshot_add_columns(t, [StructField("extra", IntegerType())])
        sn.snapshot_append(
            spark.range(5, 8).selectExpr("id", "cast(1 as int) as extra"), t
        )
        # the live query must FAIL on the widened commit, not drop `extra`
        while time.time() < deadline and q.isActive:
            time.sleep(0.3)
        assert not q.isActive
        assert "changed" in str(q.exception())
    finally:
        if q.isActive:
            q.stop()
    # restart reads EVERYTHING under the widened schema: old rows null-fill
    got = _run_to_parquet(spark, t, str(tmp_path / "o2"), str(tmp_path / "c2"))
    assert got.count() == 8
    assert got.filter("extra is null").count() == 5


# --------------------------------------------------------------------------
# streaming sink
# --------------------------------------------------------------------------


def test_stream_sink_lake_to_lake_exactly_once(spark, tmp_path):
    """snapshot SOURCE -> transformation -> snapshot SINK: the full
    lake-to-lake streaming pipeline through format("snapshot") on both
    ends, exactly-once across restarts."""
    src, dst, cp = (str(tmp_path / p) for p in ("src", "dst", "cp"))
    sn.snapshot_write(spark.range(10).selectExpr("id", "id % 3 as k"), src)

    def run():
        q = (
            spark.readStream.format("snapshot").load(src)
            .selectExpr("id", "k", "id * 2 as doubled")
            .writeStream.format("snapshot")
            .option("txnAppId", "laketolake")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True).start(dst)
        )
        q.awaitTermination(120)

    run()
    assert sn.snapshot_read(spark, dst).count() == 10
    sn.snapshot_append(spark.range(10, 15).selectExpr("id", "id % 3 as k"), src)
    run()
    got = sn.snapshot_read(spark, dst)
    assert got.count() == 15
    run()  # no new source commits: content no-op
    assert sn.snapshot_read(spark, dst).count() == 15
    assert {r["doubled"] for r in got.collect()} == {2 * i for i in range(15)}
    # sink manifests carry the txn watermark and per-file stats discipline
    m = sn._latest_manifest(dst)
    assert m["stream_txn"]["laketolake"] >= 1
    assert m["op"] == "stream_append"


def test_stream_sink_replayed_batch_is_noop(spark, tmp_path):
    """Deterministic replay: committing the SAME batchId twice lands the
    rows once (Delta txnAppId idempotence)."""
    import pyarrow as pa

    from music_recommendation_service_spark.sources.datasource import (
        SnapshotStreamWriter,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    t = str(tmp_path / "t")
    schema = StructType([StructField("id", LongType())])
    w = SnapshotStreamWriter({"path": t, "txnappid": "app1"}, schema)
    b = lambda vals: pa.RecordBatch.from_pydict({"id": pa.array(vals, pa.int64())})
    m0 = w.write(iter([b([1, 2, 3])]))
    w.commit([m0], 0)
    assert sn.snapshot_read(spark, t).count() == 3
    m0b = w.write(iter([b([1, 2, 3])]))  # crash-replay writes fresh files...
    w.commit([m0b], 0)                   # ...but the commit is a no-op
    assert sn.snapshot_read(spark, t).count() == 3
    m1 = w.write(iter([b([4])]))
    w.commit([m1], 1)
    assert sorted(r["id"] for r in sn.snapshot_read(spark, t).collect()) == [1, 2, 3, 4]
    # a DIFFERENT app's batch 0 still lands (per-app watermarks)
    w2 = SnapshotStreamWriter({"path": t, "txnappid": "app2"}, schema)
    m2 = w2.write(iter([b([99])]))
    w2.commit([m2], 0)
    assert sn.snapshot_read(spark, t).count() == 5
    txn = sn._latest_manifest(t)["stream_txn"]
    assert txn == {"app1": 1, "app2": 0}


def test_stream_sink_no_txnappid_never_dedups(spark, tmp_path):
    """Without an explicit txnAppId there is NO txn dedup (Delta
    semantics): a second stream into the same table, or a restart with a
    fresh checkpoint whose batchIds reset to 0, must still land its
    batches instead of silently dropping them as replays."""
    import pyarrow as pa

    from music_recommendation_service_spark.sources.datasource import (
        SnapshotStreamWriter,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    t = str(tmp_path / "t")
    schema = StructType([StructField("id", LongType())])
    b = lambda vals: pa.RecordBatch.from_pydict({"id": pa.array(vals, pa.int64())})
    w = SnapshotStreamWriter({"path": t}, schema)
    w.commit([w.write(iter([b([1, 2, 3])]))], 0)
    w.commit([w.write(iter([b([4, 5])]))], 1)
    assert sn.snapshot_read(spark, t).count() == 5
    # fresh checkpoint: a NEW writer instance starts over at batchId 0
    w2 = SnapshotStreamWriter({"path": t}, schema)
    w2.commit([w2.write(iter([b([6])]))], 0)
    assert sn.snapshot_read(spark, t).count() == 6
    assert "stream_txn" not in (sn._latest_manifest(t) or {})
    # ...and an explicit app id layered on top still dedups for ITSELF
    w3 = SnapshotStreamWriter({"path": t, "txnappid": "app"}, schema)
    w3.commit([w3.write(iter([b([7])]))], 0)
    w3.commit([w3.write(iter([b([7])]))], 0)  # replay: no-op
    assert sn.snapshot_read(spark, t).count() == 7
    assert sn._latest_manifest(t)["stream_txn"] == {"app": 0}


def test_stream_unpinned_start_rate_limited_no_duplicates(spark, tmp_path):
    """Un-pinned start + maxVersionsPerTrigger: the initial offset pins to
    the snapshotted version, so rate-limited later batches must NOT replay
    commits 1..S already contained in the initial snapshot."""
    t, out, cp = (str(tmp_path / p) for p in ("tbl", "out", "cp"))
    sn.snapshot_write(spark.range(5).selectExpr("id"), t)
    for lo in (5, 10, 15):
        sn.snapshot_append(spark.range(lo, lo + 5).selectExpr("id"), t)
    # table is at version 4 holding ids 0..19
    q = (
        spark.readStream.format("snapshot")
        .option("maxVersionsPerTrigger", "1").load(t)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", cp).trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert got == list(range(20))  # exactly once, no 1..S replays
    # appends AFTER the initial snapshot flow incrementally, still deduped
    sn.snapshot_append(spark.range(20, 25).selectExpr("id"), t)
    q2 = (
        spark.readStream.format("snapshot")
        .option("maxVersionsPerTrigger", "1").load(t)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", cp).trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    got = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert got == list(range(25))


def test_writer_overwrite_rechecks_constraints_at_commit(spark, tmp_path):
    """A CHECK constraint added BETWEEN writer construction and commit must
    fail the overwrite — the overwriting data was never validated."""
    import pyarrow as pa

    from music_recommendation_service_spark.sources.datasource import (
        SnapshotBatchWriter,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    t = str(tmp_path / "t")
    sn.snapshot_write(spark.range(3).selectExpr("id"), t)
    schema = StructType([StructField("id", LongType())])
    w = SnapshotBatchWriter({"path": t}, schema, overwrite=True)
    msg = w.write(iter([
        pa.RecordBatch.from_pydict({"id": pa.array([-1], pa.int64())})
    ]))
    sn.snapshot_add_constraint(spark, t, "pos", "id >= 0")
    with pytest.raises(sn.ConcurrentSnapshotError, match="constraints changed"):
        w.commit([msg])
    # table untouched: still the original 3 rows, constraint intact
    assert sn.snapshot_read(spark, t).count() == 3


def test_stream_sink_validates_check_constraints(spark, tmp_path):
    """The streaming sink enforces CHECK constraints per micro-batch in
    the task (same evaluator as the batch writer); generated/identity
    tables still reject up front."""
    import pyarrow as pa

    from music_recommendation_service_spark.sources.datasource import (
        SnapshotStreamWriter,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    t = str(tmp_path / "t")
    sn.snapshot_write(spark.range(3).selectExpr("id"), t)
    sn.snapshot_add_constraint(spark, t, "pos", "id >= 0")
    schema = StructType([StructField("id", LongType())])
    b = lambda vals: pa.RecordBatch.from_pydict({"id": pa.array(vals, pa.int64())})
    w = SnapshotStreamWriter({"path": t, "txnappid": "app"}, schema)
    w.commit([w.write(iter([b([7, 8])]))], 0)
    assert sn.snapshot_read(spark, t).count() == 5
    with pytest.raises(sn.ConstraintViolationError, match="violates CHECK"):
        w.write(iter([b([-1])]))
    assert sn.snapshot_read(spark, t).count() == 5
    # identity tables stay driver-coordinated
    t2 = str(tmp_path / "t2")
    sn.snapshot_write(spark.range(3).selectExpr("id", "id * 2 as val"), t2)
    sn.snapshot_set_identity(spark, t2, "id")
    with pytest.raises(Exception, match="GENERATED ALWAYS AS IDENTITY"):
        SnapshotStreamWriter({"path": t2}, sn.snapshot_read(spark, t2).schema)


def test_vacuum_reclaims_crashed_write_orphan_dir(spark, tmp_path):
    """Crash injection: task files land, the driver dies BEFORE commit.
    The orphan dir is invisible to readers, reclaimed by VACUUM once past
    the safety horizon — and an in-flight write INSIDE the horizon is
    never touched."""
    import pyarrow as pa

    from music_recommendation_service_spark.sources.datasource import (
        SnapshotBatchWriter,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    t = str(tmp_path / "t")
    sn.snapshot_write(spark.range(5).selectExpr("id"), t)
    schema = StructType([StructField("id", LongType())])
    w = SnapshotBatchWriter({"path": t}, schema, overwrite=False)
    w.write(iter([pa.RecordBatch.from_pydict({"id": pa.array([9], pa.int64())})]))
    # no commit: simulated driver crash. Data dir exists, readers blind.
    orphans = [
        d for d in os.listdir(t)
        if d.startswith("v=") and d == w._rel_dir
    ]
    assert orphans
    assert sn.snapshot_read(spark, t).count() == 5
    # within the horizon: an identical concurrent in-flight write survives
    assert sn.snapshot_vacuum(t, keep_last=2) == []
    assert os.path.isdir(os.path.join(t, w._rel_dir))
    # past the horizon: reclaimed
    removed = sn.snapshot_vacuum(t, keep_last=2, orphan_min_age_sec=0.0)
    assert w._rel_dir in removed
    assert not os.path.isdir(os.path.join(t, w._rel_dir))
    assert sn.snapshot_read(spark, t).count() == 5


def test_vacuum_reclaims_replayed_stream_batch_files(spark, tmp_path):
    """A replayed micro-batch's files sit unreferenced inside the query's
    LIVE data dir; file-level vacuum reclaims them (past the horizon)
    without touching the committed siblings."""
    import pyarrow as pa

    from music_recommendation_service_spark.sources.datasource import (
        SnapshotStreamWriter,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    t = str(tmp_path / "t")
    schema = StructType([StructField("id", LongType())])
    b = lambda vals: pa.RecordBatch.from_pydict({"id": pa.array(vals, pa.int64())})
    w = SnapshotStreamWriter({"path": t, "txnappid": "app"}, schema)
    w.commit([w.write(iter([b([1, 2, 3])]))], 0)
    m_replay = w.write(iter([b([1, 2, 3])]))  # crash-replay lands files...
    w.commit([m_replay], 0)                    # ...commit is a no-op
    w.commit([w.write(iter([b([4])]))], 1)
    dup = os.path.join(t, m_replay.rel_dir, m_replay.name)
    assert os.path.isfile(dup)
    # within the horizon: protected (could be an in-flight batch)
    sn.snapshot_vacuum(t, keep_last=10)
    assert os.path.isfile(dup)
    removed = sn.snapshot_vacuum(t, keep_last=10, orphan_min_age_sec=0.0)
    assert f"{m_replay.rel_dir}/{m_replay.name}" in removed
    assert not os.path.isfile(dup)
    # committed rows intact, time travel across retained versions intact
    assert sorted(r["id"] for r in sn.snapshot_read(spark, t).collect()) == [1, 2, 3, 4]
    assert sn.snapshot_read(spark, t, version=1).count() == 3


def test_vacuum_file_sweep_never_touches_dv_position_dirs(spark, tmp_path):
    """DV position parquet is referenced at DIR granularity; the orphan
    file sweep must not mistake it for unreferenced data files."""
    t = str(tmp_path / "t")
    sn.snapshot_write(spark.range(10).selectExpr("id"), t)
    sn.snapshot_delete_where(spark, t, "id >= 7", mode="dv")
    before = sn.snapshot_read(spark, t)
    assert before.count() == 7
    sn.snapshot_vacuum(t, keep_last=1, orphan_min_age_sec=0.0)
    got = sn.snapshot_read(spark, t)
    assert sorted(r["id"] for r in got.collect()) == list(range(7))


def test_fully_pruned_scan_returns_empty(spark, tmp_path):
    """A filter that skips EVERY file must yield an empty result, not a
    crash — Spark schedules one task with a None partition when
    partitions() returns []."""
    t = str(tmp_path / "t")
    sn.snapshot_write(
        spark.range(100).selectExpr("id", "concat('k', id) as s"),
        t, stats_cols=["id"], bloom_cols=["s"],
    )
    assert spark.read.format("snapshot").load(t).filter("s = 'nope'").count() == 0
    assert spark.read.format("snapshot").load(t).filter("id > 10000").count() == 0
    r = SnapshotBatchReader({"path": t}, schema=None)
    r.pushFilters([GreaterThan(("id",), 10_000)])
    assert r.partitions() == []


def test_writer_validates_generated_columns_in_task(spark, tmp_path):
    """GENERATED ALWAYS AS tables accept DataSource writes when the batch
    PROVIDES the generated values (validated in-task via the pseudo-
    constraint col IS NOT DISTINCT FROM (expr) — Delta's explicit-
    assignment rule); a wrong value fails the write; omitting the column
    auto-fills IN THE TASK (round-11 verdict order #7)."""
    t = str(tmp_path / "gen_tbl")
    sn.snapshot_write(
        spark.range(3).selectExpr("id", "id * 2 as dbl"), t, stats_cols=["id"]
    )
    sn.snapshot_set_generated(spark, t, "dbl", "id * 2")

    ok = spark.range(10, 13).selectExpr("id", "id * 2 as dbl")
    ok.write.format("snapshot").mode("append").save(t)
    got = {(r["id"], r["dbl"]) for r in sn.snapshot_read(spark, t).collect()}
    assert got == {(i, i * 2) for i in list(range(3)) + [10, 11, 12]}

    bad = spark.range(20, 21).selectExpr("id", "id * 3 as dbl")
    with pytest.raises(Exception, match="__generated_dbl"):
        bad.write.format("snapshot").mode("append").save(t)
    assert sn.snapshot_read(spark, t).count() == 6  # nothing landed

    # omission: the task COMPUTES the value (DuckDB over the Arrow batch)
    spark.range(30, 31).selectExpr("id").write.format("snapshot").mode(
        "append"
    ).save(t)
    got = {(r["id"], r["dbl"]) for r in sn.snapshot_read(spark, t).collect()}
    assert (30, 60) in got and len(got) == 7

    # stream sink: same validation per micro-batch
    import pyarrow as pa

    from music_recommendation_service_spark.sources.datasource import (
        SnapshotStreamWriter,
    )

    w = SnapshotStreamWriter(
        {"path": t, "txnappid": "gens"}, sn.snapshot_read(spark, t).schema
    )
    w.commit(
        [w.write(iter([pa.RecordBatch.from_pydict(
            {"id": pa.array([40], pa.int64()), "dbl": pa.array([80], pa.int64())}
        )]))],
        0,
    )
    assert (40, 80) in {
        (r["id"], r["dbl"]) for r in sn.snapshot_read(spark, t).collect()
    }
    with pytest.raises(sn.ConstraintViolationError, match="__generated_dbl"):
        w.write(iter([pa.RecordBatch.from_pydict(
            {"id": pa.array([50], pa.int64()), "dbl": pa.array([99], pa.int64())}
        )]))


def test_writer_merge_schema_option(spark, tmp_path):
    """option('mergeSchema','true') on format('snapshot') writes: new
    columns widen the table in the same commit (old files null-fill);
    without the option the append schema gate still fires."""
    t = str(tmp_path / "msch_ds")
    spark.range(3).selectExpr("id").write.format("snapshot").mode(
        "overwrite"
    ).option("statsCols", "id").save(t)

    wide = spark.range(3, 6).selectExpr("id", "concat('v', id) as tag")
    with pytest.raises(Exception, match="mergeSchema"):
        wide.write.format("snapshot").mode("append").save(t)
    wide.write.format("snapshot").mode("append").option(
        "mergeSchema", "true"
    ).save(t)
    got = {(r["id"], r["tag"]) for r in sn.snapshot_read(spark, t).collect()}
    assert got == {(0, None), (1, None), (2, None), (3, "v3"), (4, "v4"), (5, "v5")}
    # native and DS reads agree on the evolved schema
    _assert_parity(spark, t)
