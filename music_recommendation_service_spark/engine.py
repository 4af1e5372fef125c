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

    def sql_atomic(self, statements: list[str], publish: bool = True) -> list[DataFrame]:
        """Multi-statement LAKE TRANSACTION: run ``statements`` as one
        all-or-nothing unit across N snapshot tables (SQL spelling:
        ``BEGIN LAKE TRANSACTION; <stmt>; <stmt>; COMMIT``).

        Semantics (the write-then-publish discipline of
        sources/multicommit.py, plus compensating rollback):

        - each statement commits its table normally (per-table atomicity
          is the protocol's);
        - a FAILURE mid-transaction rolls back ONLY the tables this
          transaction's statements touched (``snapshot_rollback`` to
          their pre-transaction version — a new RESTORE commit, history
          preserved) and drops views the transaction created, so direct
          readers see the old content of BOTH tables — no half-applied
          pair. Tables a CONCURRENT writer advanced during the window are
          never rolled back (that would be a lost update); if a concurrent
          writer advanced a table PAST this transaction's own commit,
          compensation refuses loudly rather than reverting the other
          writer's durable commit;
        - on success, ONE lake-log entry (``lake_commit``) pins exactly
          the versions this transaction produced, so readers resolving
          through the log (``lake_read``) observe the pair move together;
          a process crash before the publish leaves the previous, mutually
          consistent pin set in force.
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
        results: list[DataFrame] = []
        touched: set[str] = set()
        # path -> version this transaction's OWN commit produced (the
        # commit's return value, never a post-hoc listing a concurrent
        # writer could race into)
        produced: dict[str, int] = {}
        try:
            for stmt in statements:
                try:
                    df, names, dml = self._run_sql(stmt)
                except Exception as exc:
                    info = getattr(exc, "_sql_touched", None)
                    if info is not None:
                        # the statement committed, then its bookkeeping
                        # failed: keep the attribution for compensation
                        names2, dml2 = info
                        touched |= names2
                        if dml2 is not None:
                            produced[dml2[0]] = dml2[1]
                    raise
                results.append(df)
                touched |= names
                if dml is not None:
                    produced[dml[0]] = dml[1]
        except Exception as exc:
            refusals: list[str] = []
            for name in sorted(touched):
                if name not in pre:
                    # a table the failed transaction created: unregister
                    # the name (the orphan data dir is vacuum's to reclaim)
                    if name in self._snapshot_views:
                        self.spark.catalog.dropTempView(name)
                        del self._snapshot_views[name]
                        self._unpersist(name)
                    continue
                path, v0 = pre[name]
                vs = sn.snapshot_versions(path)
                if v0 is None or not vs or vs[-1] == v0:
                    continue
                if vs[-1] != produced.get(path):
                    # latest is NOT this transaction's own commit — either
                    # a concurrent writer advanced past it, or the advance
                    # cannot be attributed. Rolling back to v0 would revert
                    # a commit that is not ours: refuse THIS table, keep
                    # compensating the rest.
                    own = produced.get(path)
                    refusals.append(
                        f"{name!r} ({path}): latest v{vs[-1]}, transaction "
                        + (f"produced v{own}" if own is not None
                           else "has no attributable commit")
                        + f", pre-transaction v{v0}"
                    )
                    continue
                sn.snapshot_rollback(path, v0)
                self.snapshot(path, view=name, persist=False)
            # Sweep for UNATTRIBUTED advances: a statement whose
            # snapshot-layer call committed and then raised BEFORE
            # dispatch_sql returned leaves no _sql_touched attribution,
            # so its table is absent from `touched` — neither rolled back
            # nor refused above. Surface any pre-known table whose latest
            # version moved without attribution so the divergence is
            # never silent (it may equally be a concurrent writer's
            # commit, which is exactly why we surface rather than revert).
            touched_paths = {
                pre[n][0] for n in touched if n in pre
            } | {
                self._snapshot_views[n]
                for n in touched
                if n in self._snapshot_views
            } | set(produced)
            seen_paths: set[str] = set()
            unattributed: list[str] = []
            for name in sorted(pre):
                path, v0 = pre[name]
                if path in touched_paths or path in seen_paths:
                    continue
                seen_paths.add(path)
                if v0 is None:
                    continue
                try:
                    vs = sn.snapshot_versions(path)
                except Exception:
                    continue
                if vs and vs[-1] != v0:
                    unattributed.append(
                        f"{name!r} ({path}): advanced v{v0}->v{vs[-1]} "
                        "during the failed transaction without attribution"
                    )
            if refusals or unattributed:
                parts = []
                if refusals:
                    parts.append(
                        "lake transaction compensation refused for: "
                        + "; ".join(refusals)
                        + " — the latest version is not this transaction's "
                        "own commit, and rolling back would revert another "
                        "writer's durable commit."
                    )
                if unattributed:
                    parts.append(
                        "unattributed advances (possibly this "
                        "transaction's own commit whose statement failed "
                        "post-commit, or a concurrent writer's — NOT "
                        "rolled back): " + "; ".join(unattributed) + "."
                    )
                raise RuntimeError(
                    " ".join(parts)
                    + " Every other touched table was compensated. "
                    "Resolve manually (RESTORE or re-apply)."
                ) from exc
            raise
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
