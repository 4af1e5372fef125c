"""Persistent lake catalog: durable name -> {path, format} registration.

The reference serves named table access through a long-lived Thrift server
backed by a DeltaCatalog (``docker-compose.yml:372-418``,
``pyspark_jobs/spark_utils.py:35-39``), so its users never re-declare
tables. This engine's tables and views previously lived per-session:
``Engine.snapshot(path, view=...)`` and ``CREATE TABLE ... LOCATION``
registered names only in the running SparkSession, and a new session had
to re-register every name->path mapping by hand.

This module closes that session-lifecycle gap with a catalog that is
itself a snapshot table under the protocol of ``sources/snapshots.py`` —
a METADATA-ONLY one. Each mutation commits a manifest carrying the full
``tables`` map through the claim-once ``_commit`` primitive, which gives

- **atomic, linearizable registration**: concurrent ``CREATE TABLE`` from
  different processes race on the same O_EXCL manifest claim as data
  commits; a loser rebases on the winner's map (or errors on a true name
  conflict) — never a lost registration;
- **versioned history**: ``DESCRIBE HISTORY`` on the catalog dir shows
  every register/drop with its commit time;
- **O(1) boot**: loading the catalog is ONE JSON read (the latest
  manifest), no Spark job — an Engine boot must not spin the cluster.

Why a manifest map instead of parquet rows: a catalog is O(registered
tables), thousands at the very most, and every reader wants the WHOLE map
at boot. A full-map manifest makes reads one file and writes one rebase —
the parquet/merge machinery would add Spark jobs to every lookup for no
scale benefit. (A lake with millions of tables would shard the map by
name prefix; the commit protocol is unchanged.)

``DROP TABLE`` unregisters the name only — tables are EXTERNAL (data at a
caller-chosen LOCATION), matching Delta's external-table drop semantics.
"""

from __future__ import annotations

import time

from music_recommendation_service_spark.sources import snapshots as sn

# Manifest schema stamp for the catalog's "rows" (informational: lets
# generic snapshot tooling print what this table holds).
_CATALOG_SCHEMA = (
    '{"type":"struct","fields":['
    '{"name":"name","type":"string","nullable":false,"metadata":{}},'
    '{"name":"path","type":"string","nullable":false,"metadata":{}},'
    '{"name":"format","type":"string","nullable":false,"metadata":{}},'
    '{"name":"registered_at","type":"double","nullable":false,"metadata":{}}]}'
)


class TableExistsError(ValueError):
    """Registering a name that already maps to a DIFFERENT path."""


# formats Engine boot knows how to resolve into a view
SUPPORTED_FORMATS = frozenset({"snapshot", "parquet", "csv"})


class LakeCatalog:
    """Durable name -> {path, format, registered_at} map over one catalog
    directory, mutated through claim-once commits."""

    def __init__(self, path: str):
        self.path = path

    # -- reads ---------------------------------------------------------------

    def tables(self) -> dict[str, dict]:
        """The full registration map at the latest catalog version."""
        m = sn._latest_manifest(self.path)
        return dict((m or {}).get("tables") or {})

    def resolve(self, name: str) -> dict | None:
        return self.tables().get(name)

    def exists(self) -> bool:
        return bool(sn.snapshot_versions(self.path))

    # -- writes --------------------------------------------------------------

    def register(
        self,
        name: str,
        table_path: str,
        fmt: str = "snapshot",
        replace: bool = False,
    ) -> int:
        """Durably map ``name`` to ``table_path``. Re-registering the SAME
        path is an idempotent no-op (returns the current version);
        a different path requires ``replace`` or raises
        :class:`TableExistsError`. Concurrency-safe: the build re-reads
        the fresh map on every commit attempt."""
        if fmt not in SUPPORTED_FORMATS:
            # validate at WRITE time: a durable registration no boot can
            # resolve is a silent-vanish bug, not a feature
            raise ValueError(
                f"catalog {self.path}: unsupported format {fmt!r} for "
                f"{name!r} (supported: {sorted(SUPPORTED_FORMATS)})"
            )
        entry = {
            "path": table_path,
            "format": fmt,
            "registered_at": time.time(),
        }

        def build(latest: dict | None, version: int) -> dict:
            tables = dict((latest or {}).get("tables") or {})
            cur = tables.get(name)
            if cur is not None and cur["path"] == table_path:
                raise _NoopRegistration()  # idempotent: same mapping
            if cur is not None and not replace:
                raise TableExistsError(
                    f"catalog {self.path}: {name!r} already registered at "
                    f"{cur['path']} (pass replace=True / CREATE OR REPLACE)"
                )
            tables[name] = entry
            return self._manifest(tables)

        try:
            return sn._commit(self.path, build, op="catalog_register")
        except _NoopRegistration:
            return sn.snapshot_versions(self.path)[-1]

    def unregister(self, name: str, if_exists: bool = False) -> int | None:
        """DROP TABLE: remove the name (data stays — external tables)."""

        def build(latest: dict | None, version: int) -> dict:
            tables = dict((latest or {}).get("tables") or {})
            if name not in tables:
                if if_exists:
                    raise _NoopRegistration()
                raise KeyError(
                    f"catalog {self.path}: no table {name!r} "
                    f"(known: {sorted(tables)})"
                )
            del tables[name]
            return self._manifest(tables)

        try:
            return sn._commit(self.path, build, op="catalog_drop")
        except _NoopRegistration:
            return None

    @staticmethod
    def _manifest(tables: dict) -> dict:
        # data_change=False: catalog commits are metadata-only, so a
        # streaming reader pointed at the catalog dir skips them and
        # OPTIMIZE/VACUUM-style tooling sees no data files to touch.
        return {
            "tables": tables,
            "data_dirs": [],
            "files": [],
            "n_rows": len(tables),
            "schema": _CATALOG_SCHEMA,
            "data_change": False,
        }


class _NoopRegistration(Exception):
    """Internal: the map already holds exactly this state."""
