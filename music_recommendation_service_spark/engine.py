"""Engine facade: the one object a reference user switches to.

Bundles the session factory, the table catalog over a lake directory, the
named query catalog (SURVEY §2 operators as executable queries), and the
SQL surface (the Thrift-equivalent entry point, SURVEY §3.3b).

    from music_recommendation_service_spark.engine import Engine

    eng = Engine("/root/testdata/sf0.01")
    eng.sql("SELECT count(*) FROM lineitem").show()
    eng.query("q05_hybrid_recommendations").show()
    eng.table("orders").filter("o_orderstatus = 'O'").count()
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from music_recommendation_service_spark.sources.catalog import TABLES, Catalog


class Engine:
    def __init__(
        self,
        root: str,
        spark: SparkSession | None = None,
        catalog_path: str | None = None,
    ):
        import os

        from music_recommendation_service_spark.session import get_spark
        from music_recommendation_service_spark.sources.lakecatalog import (
            LakeCatalog,
        )

        self.spark = spark or get_spark()
        self.root = root
        self.catalog = Catalog(self.spark, root)
        self._views_registered = False
        self._snapshot_views: dict[str, str] = {}
        # Durable name->path catalog (sources/lakecatalog.py): a NEW session
        # resolves every registered table with zero re-registration — the
        # engine-side twin of the reference's long-lived DeltaCatalog
        # serving (docker-compose.yml:372-418, spark_utils.py:35-39).
        # Boot-load is one JSON read; registering the temp views is
        # manifest-only DataFrame construction, no Spark job.
        #
        # Write-through activates when a catalog_path is passed explicitly
        # OR a catalog already exists under the root — an Engine over a
        # read-only data root (the driver's testdata) must never try to
        # create one there, so registrations stay session-only until the
        # lake opts in (checked lazily: another process creating the
        # catalog enables this session's write-through too).
        self._catalog_explicit = catalog_path is not None
        self.lake_catalog = LakeCatalog(
            catalog_path or os.path.join(root.rstrip("/"), "_lake_catalog")
        )
        # names the boot could not resolve, with the reason — surfaced by a
        # warning here and queryable via boot_skipped (never a silent drop)
        self.boot_skipped: dict[str, str] = {}
        for name, ent in sorted(self.lake_catalog.tables().items()):
            fmt = ent.get("format", "snapshot")
            try:
                if fmt == "snapshot":
                    self.snapshot(ent["path"], view=name, persist=False)
                elif fmt == "parquet":
                    self.spark.read.parquet(
                        ent["path"]
                    ).createOrReplaceTempView(name)
                elif fmt == "csv":
                    self.spark.read.options(
                        header=True, inferSchema=True
                    ).csv(ent["path"]).createOrReplaceTempView(name)
                else:
                    self.boot_skipped[name] = f"unknown format {fmt!r}"
                    continue
            except Exception as e:  # noqa: BLE001 — boot must not brick
                # a registered table whose data is gone (or unreadable)
                # must not prevent every OTHER name from resolving; the
                # name stays visible in the durable map and in
                # boot_skipped so the gap is diagnosable
                self.boot_skipped[name] = f"{type(e).__name__}: {e}"
        if self.boot_skipped:
            import warnings

            warnings.warn(
                "lake catalog names skipped at Engine boot: "
                + ", ".join(
                    f"{n} ({r.splitlines()[0][:80]})"
                    for n, r in sorted(self.boot_skipped.items())
                ),
                stacklevel=2,
            )

    # -- tables ------------------------------------------------------------
    def table(self, name: str) -> DataFrame:
        return self.catalog.table(name)

    def tables(self) -> tuple[str, ...]:
        return TABLES

    def snapshot(
        self,
        path: str,
        version: int | None = None,
        as_of: float | None = None,
        view: str | None = None,
        persist: bool = True,
    ) -> DataFrame:
        """A versioned snapshot table (sources/snapshots.py protocol) as a
        DataFrame — latest, ``VERSION AS OF`` (``version``), or
        ``TIMESTAMP AS OF`` (``as_of``, unix seconds); optionally
        registered as a temp view so ``eng.sql`` can join it against
        catalog tables (the serving path of SURVEY §3.3 over
        engine-managed tables). Latest-tracking views also write through
        the durable lake catalog (unless ``persist=False``), so a FRESH
        Engine/session resolves the name with no re-registration."""
        from music_recommendation_service_spark.sources.snapshots import (
            snapshot_read,
        )

        df = snapshot_read(self.spark, path, version, as_of=as_of)
        if view is not None:
            df.createOrReplaceTempView(view)
            if version is None and as_of is None:
                # only latest-tracking views take DML through eng.sql
                self._snapshot_views[view] = path
                if persist:
                    self._persist(view, path)
        return df

    def register_external(
        self, name: str, path: str, fmt: str = "parquet", replace: bool = False
    ) -> DataFrame:
        """Register a non-snapshot location (plain parquet / csv) as a
        named view, durably when the lake catalog is enabled — the
        external-table registration every warehouse offers next to its
        managed tables. Returns the view's DataFrame."""
        if fmt == "parquet":
            df = self.spark.read.parquet(path)
        elif fmt == "csv":
            df = self.spark.read.options(header=True, inferSchema=True).csv(path)
        elif fmt == "snapshot":
            return self.snapshot(path, view=name)
        else:
            from music_recommendation_service_spark.sources.lakecatalog import (
                SUPPORTED_FORMATS,
            )

            raise ValueError(
                f"unsupported format {fmt!r} (supported: {sorted(SUPPORTED_FORMATS)})"
            )
        df.createOrReplaceTempView(name)
        if self._catalog_enabled():
            self.lake_catalog.register(name, path, fmt=fmt, replace=replace)
        return df

    # -- durable catalog write-through --------------------------------------
    def _catalog_enabled(self) -> bool:
        return self._catalog_explicit or self.lake_catalog.exists()

    def _persist(self, name: str, path: str) -> None:
        if self._catalog_enabled():
            self.lake_catalog.register(name, path, replace=True)

    def _unpersist(self, name: str) -> None:
        if self._catalog_enabled():
            self.lake_catalog.unregister(name, if_exists=True)

    # -- SQL surface -------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """The Thrift-equivalent SQL entry point, extended with the
        snapshot DML dialect (sources/sqlfront.py): MERGE INTO, UPDATE,
        DELETE FROM, INSERT INTO, VERSION/TIMESTAMP AS OF and DESCRIBE
        HISTORY work on views registered via :meth:`snapshot`; everything
        else runs as plain Spark SQL over the catalog + registered views.
        After a DML statement the touched view is re-registered at the new
        latest version, so a following SELECT sees the write."""
        if not self._views_registered:
            self.catalog.register_views()
            self._views_registered = True
        import re as _re

        tx = _re.match(
            r"\s*BEGIN\s+LAKE\s+TRANSACTION\s*;(.*);\s*COMMIT\s*;?\s*$",
            query, _re.IGNORECASE | _re.DOTALL,
        )
        if tx:
            stmts = [s for s in _split_semicolons(tx.group(1)) if s.strip()]
            results = self.sql_atomic(stmts)
            return results[-1] if results else self.spark.sql("SELECT 1 AS ok")
        return self._run_sql(query)[0]

    def _run_sql(
        self, query: str
    ) -> tuple[DataFrame, set[str], tuple[str, int] | None]:
        """Run ONE statement and report (result, touched view names, dml)
        where ``dml`` is ``(table_path, committed_version)`` when the
        statement's dispatch returned a commit result — the version is the
        COMMIT'S OWN return value, never a post-hoc listing a concurrent
        writer could race. sql_atomic uses the touched set to scope
        compensating rollback / lake pins to the transaction's OWN tables
        and the dml versions to attribute commits exactly. If the
        post-commit bookkeeping raises AFTER a table advanced, the
        exception carries ``_sql_touched`` so the transaction still knows
        what it committed."""
        from music_recommendation_service_spark.sources.sqlfront import (
            dispatch_sql,
        )

        before = dict(self._snapshot_views)
        out = dispatch_sql(self.spark, query, self._snapshot_views)
        if out is None:
            return self.spark.sql(query), set(), None
        df, touched = out
        dml: tuple[str, int] | None = None
        if touched is not None and touched in self._snapshot_views:
            ver = None
            try:
                if [f.name for f in df.schema.fields] == ["version"]:
                    rows = df.collect()  # one local row: the DML result
                    ver = rows[0]["version"] if rows else None
            except Exception:
                ver = None
            if ver is not None:
                dml = (self._snapshot_views[touched], int(ver))
        names: set[str] = set()
        if touched is not None and touched in self._snapshot_views:
            names.add(touched)
        try:
            # sync the durable catalog with dispatch-side registration
            # changes (CREATE TABLE adds, DROP TABLE removes)
            for name, p in self._snapshot_views.items():
                if before.get(name) != p:
                    self._persist(name, p)
                    names.add(name)
            for name in before:
                if name not in self._snapshot_views:
                    self._unpersist(name)
                    names.add(name)
            if touched is not None and touched in self._snapshot_views:
                path = self._snapshot_views[touched]
                for v, p in self._snapshot_views.items():
                    if p == path:
                        self.snapshot(p, view=v, persist=False)
        except Exception as exc:
            # the table may have COMMITTED before the bookkeeping failed:
            # ship the attribution so sql_atomic can still compensate
            for name, p in self._snapshot_views.items():
                if before.get(name) != p:
                    names.add(name)
            try:
                exc._sql_touched = (names, dml)  # type: ignore[attr-defined]
            except AttributeError:
                # __slots__-style exception rejects attribute assignment:
                # re-raise the ORIGINAL error unannotated rather than mask
                # it (sql_atomic's unattributed-advance sweep still
                # surfaces the half-applied table in its refusal list)
                pass
            raise
        return df, names, dml

    def transaction(self):
        """Python-side staged multi-table transaction — the
        context-manager twin of ``BEGIN LAKE TRANSACTION`` for code that
        calls the snapshot API directly (``snapshot_append`` /
        ``snapshot_merge`` / ``df.write`` paths that commit on this
        thread):

            with eng.transaction():
                snapshot_append(batch, store_path)
                snapshot_merge(index_delta, index_path, keys=["fp"])
            # one atomic publish: direct readers see both or neither

        Every commit inside the block lands STAGED (invisible); a normal
        exit publishes them all with ONE decision-file claim; an
        exception (or a crash) leaves every staged version invisible and
        decides 'aborted' so blocked writers release. Nesting is refused
        (the thread-local context is single-level by design)."""
        from contextlib import contextmanager

        from music_recommendation_service_spark.sources import snapshots as sn

        @contextmanager
        def _txn():
            txn = sn.begin_staged_txn(self.root)
            try:
                yield txn
            except BaseException:
                sn.end_staged_txn()
                try:
                    sn.txn_abort(txn)
                except Exception:
                    pass
                raise
            sn.end_staged_txn()
            sn.txn_publish(txn)

        return _txn()

    def sql_atomic(self, statements: list[str], publish: bool = True) -> list[DataFrame]:
        """Multi-statement LAKE TRANSACTION: run ``statements`` as one
        all-or-nothing unit across N snapshot tables (SQL spelling:
        ``BEGIN LAKE TRANSACTION; <stmt>; <stmt>; COMMIT``).

        Semantics — STAGED PUBLISH (snapshot protocol v4):

        - every statement's table commit lands as a STAGED version,
          invisible to ALL readers (direct ``snapshot_read``/temp-view
          readers included) until the transaction's single decision file
          is claimed "published"; inside the transaction, this thread
          reads its own staged versions (read-your-writes);
        - COMMIT is ONE ``create_exclusive`` on the decision file: every
          staged version becomes visible at the same instant — a direct
          reader can never observe table A's new version without table
          B's (the pre-v4 anomaly this design removes);
        - a FAILURE mid-transaction (or a process crash at ANY point
          before the decision) leaves every staged version invisible:
          both tables keep reading their old, mutually consistent
          content — no compensation commits, no rollback window. An
          explicit failure additionally decides "aborted" so blocked
          writers release immediately and vacuum reclaims the staged
          data;
        - a concurrent writer cannot commit past a PENDING staged version
          (that would be a lost update on publish): it backs off briefly,
          then raises ``ConcurrentSnapshotError``; a staged transaction
          whose writer crashed is decided "aborted" by the first blocked
          writer (or vacuum) after ``SNAPSHOT_TXN_TIMEOUT_SEC``;
        - on success, ONE lake-log entry (``lake_commit``) additionally
          pins the produced versions, so log-resolving readers
          (``lake_read``) get the same all-or-nothing view with lake-level
          time travel.
        """
        import os

        from music_recommendation_service_spark.sources import (
            multicommit as mc,
            snapshots as sn,
        )

        pre = {
            name: (path, (sn.snapshot_versions(path) or [None])[-1])
            for name, path in self._snapshot_views.items()
        }
        txn = sn.begin_staged_txn(self.root)
        results: list[DataFrame] = []
        touched: set[str] = set()
        # path -> version this transaction's OWN commit produced (the
        # commit's return value, never a post-hoc listing a concurrent
        # writer could race into)
        produced: dict[str, int] = {}

        def _reset_views() -> None:
            # created tables: unregister the name (their only versions are
            # staged-aborted — invisible; vacuum reclaims the data);
            # touched views: re-resolve to the visible (pre-txn) state
            for name in sorted(touched):
                if name not in pre:
                    if name in self._snapshot_views:
                        self.spark.catalog.dropTempView(name)
                        del self._snapshot_views[name]
                        self._unpersist(name)
                    continue
                try:
                    self.snapshot(pre[name][0], view=name, persist=False)
                except Exception:
                    pass

        try:
            for stmt in statements:
                try:
                    df, names, dml = self._run_sql(stmt)
                except Exception as exc:
                    info = getattr(exc, "_sql_touched", None)
                    if info is not None:
                        # the statement committed (staged), then its
                        # bookkeeping failed: keep the attribution so the
                        # view reset below covers the table
                        names2, dml2 = info
                        touched |= names2
                        if dml2 is not None:
                            produced[dml2[0]] = dml2[1]
                    raise
                results.append(df)
                touched |= names
                if dml is not None:
                    produced[dml[0]] = dml[1]
        except Exception:
            # decide 'aborted': every staged version is now permanently
            # invisible — direct readers never saw a torn state, and
            # nothing needs rolling back
            try:
                sn.txn_abort(txn)
                # tombstones only where staged versions may exist: the
                # tables this transaction actually touched
                sn.txn_backfill_tombstones(
                    txn,
                    {pre[n][0] for n in touched if n in pre}
                    | {
                        self._snapshot_views[n]
                        for n in touched
                        if n in self._snapshot_views
                    }
                    | set(produced),
                )
            finally:
                sn.end_staged_txn()
                _reset_views()
            raise
        sn.end_staged_txn()
        try:
            # ONE claim flips every staged version visible together
            sn.txn_publish(txn)
        except sn.TxnAbortedError:
            _reset_views()
            raise
        sn.txn_backfill_tombstones(txn, set(produced))
        # refresh touched views OUTSIDE the transaction context (resolves
        # the now-published versions through the normal visible path)
        for name in sorted(touched):
            if name in self._snapshot_views:
                try:
                    self.snapshot(
                        self._snapshot_views[name], view=name, persist=False
                    )
                except Exception:
                    pass
        if publish:
            pre_v = {path: v0 for path, v0 in pre.values()}
            pins = {
                os.path.relpath(path, self.root): v
                for path, v in produced.items()
                if pre_v.get(path) != v
            }
            if pins:
                mc.lake_commit(self.root, pins)
        return results

    # -- named query catalog ----------------------------------------------
    def query(self, name: str) -> DataFrame:
        from music_recommendation_service_spark.plans import registry

        reg = registry()
        if name not in reg:
            raise KeyError(
                f"unknown query {name!r}; available: {sorted(reg)}"
            )
        return reg[name].build(self.spark, self.root)

    def queries(self) -> list[str]:
        from music_recommendation_service_spark.plans import registry

        return sorted(registry())

    def audit(self, name_or_df) -> dict:
        """Plan-quality audit (shuffles, join strategies, Python stages,
        pushdown, smells) of a catalog query or any DataFrame — the
        check-the-plan-before-you-scale tool (plans/audit.py)."""
        from music_recommendation_service_spark.plans.audit import plan_audit

        df = (
            name_or_df
            if isinstance(name_or_df, DataFrame)
            else self.query(name_or_df)
        )
        return plan_audit(df)


def _split_semicolons(block: str) -> list[str]:
    """Split a statement block on semicolons OUTSIDE single-quoted
    literals (the dialect's only string form)."""
    out, cur, in_str = [], [], False
    for ch in block:
        if ch == "'":
            in_str = not in_str
            cur.append(ch)
        elif ch == ";" and not in_str:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out
