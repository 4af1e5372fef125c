"""Cross-table atomic commits: a lake-level commit log that pins exact
versions of N snapshot tables, so readers resolving through it can NEVER
observe fact/view skew — even when the writer crashes between per-table
commits.

Why: the medallion program (pipelines.py) advances bronze, silver, and
maintained views as SEPARATE snapshot transactions. Each is atomic and
replay-safe, but a crash between them leaves the lake transiently
inconsistent for direct readers (fact advanced, view stale — recoverable,
but observable). Delta Lake has the same gap (transactions are per-table);
the standard answer is exactly this pattern: a coordinator the readers
resolve through.

Protocol:
- The log lives at ``<root>/_lake_commits/<n>.json``. Each entry carries
  ``tables``: a mapping of table path (relative to root) -> pinned snapshot
  version. Entries are written with the SAME claim-once primitive as table
  manifests (``SnapshotFS.create_exclusive`` — O_EXCL locally, conditional
  PUT on an object store), so racing lake commits serialize exactly like
  racing table commits.
- ``lake_commit`` merges its pins over the previous entry's (tables not
  repinned carry forward), validates every pinned version still exists,
  and retries on a lost race after re-merging — the multi-table analogue
  of a rebase.
- Writers follow write-then-publish: advance each table with ordinary
  snapshot commits (invisible to log readers), then publish ONE log entry
  pinning the new versions. A crash before publish leaves the previous,
  mutually-consistent pin set in force; the orphaned table versions are
  still there for the re-run's exactly-once machinery (manifest-recorded
  applied versions), which converges and then publishes.
- Readers use ``lake_read(root, table)``: snapshot time travel to the
  pinned version. Time travel across the LAKE (``lake_read(...,
  commit=n)``) gives a consistent multi-table snapshot of any historical
  publish.

Retention contract: a pinned table version must survive that table's
vacuum. ``lake_pinned_versions`` reports the still-referenced versions per
table so a vacuum policy can keep them (the same discipline as Delta's
checkpoint-protected versions).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from music_recommendation_service_spark.sources.snapshots import (
    ConcurrentSnapshotError,
    _fs,
    snapshot_read,
    snapshot_versions,
)

_LOG_DIR = "_lake_commits"


def _log_dir(root: str) -> str:
    return os.path.join(root, _LOG_DIR)


def lake_versions(root: str) -> list[int]:
    """Committed lake-log entries, ascending (empty if no log yet)."""
    out = []
    for name in _fs().list_dir(_log_dir(root)):
        if name.endswith(".json"):
            stem = name[:-5]
            if stem.isdigit():
                out.append(int(stem))
    return sorted(out)


def _read_entry(root: str, v: int) -> dict:
    return json.loads(_fs().read_text(os.path.join(_log_dir(root), f"{v}.json")))


def lake_latest(root: str) -> dict | None:
    """The newest log entry ({'version', 'tables', 'committed_at', ...})."""
    vs = lake_versions(root)
    return _read_entry(root, vs[-1]) if vs else None


def lake_commit(
    root: str, pins: dict[str, int], extra: dict | None = None,
    retries: int = 10,
) -> int:
    """Publish one atomic multi-table commit: pin ``pins`` (table path
    relative to ``root`` -> snapshot version), carrying forward every
    previously-pinned table not mentioned. Returns the log version.

    Claim-once semantics: a racing publisher loses the create, re-reads,
    re-merges its pins over the winner's, and retries — pins over DISJOINT
    tables compose; racing pins of the SAME table keep the retrier's value
    (last-publisher-wins, the same rule as a table's seq_col)."""
    if not pins:
        raise ValueError("lake_commit: no pins given")
    for rel, v in pins.items():
        have = snapshot_versions(os.path.join(root, rel))
        if v not in have:
            raise ValueError(
                f"lake_commit: {rel} has no version {v} (found {have})"
            )
    _fs().mkdirs(_log_dir(root))
    for _ in range(retries):
        latest = lake_latest(root)
        merged = dict((latest or {}).get("tables") or {})
        merged.update(pins)
        next_v = ((latest or {}).get("version") or 0) + 1
        entry = {
            "version": next_v,
            "tables": merged,
            "committed_at": time.time(),
            **(extra or {}),
        }
        target = os.path.join(_log_dir(root), f"{next_v}.json")
        if _fs().create_exclusive(target, json.dumps(entry, sort_keys=True)):
            return next_v
    raise ConcurrentSnapshotError(
        f"lake_commit at {root}: lost {retries} publish races; giving up"
    )


def lake_pins(root: str, commit: int | None = None) -> dict[str, int]:
    """The pinned table->version mapping of a lake commit (default latest)."""
    if commit is None:
        latest = lake_latest(root)
        if latest is None:
            raise FileNotFoundError(f"no lake commits at {root}")
        return dict(latest["tables"])
    vs = lake_versions(root)
    if commit not in vs:
        raise ValueError(f"lake commit {commit} not in {vs}")
    return dict(_read_entry(root, commit)["tables"])


def lake_read(
    spark: SparkSession, root: str, table: str, commit: int | None = None
) -> DataFrame:
    """Read ``table`` (path relative to ``root``) AT the version pinned by
    the lake commit — the skew-free read path. Two lake_read calls against
    the same ``commit`` (or within one resolved pin set via
    :func:`lake_pins`) are guaranteed mutually consistent regardless of
    concurrent writers."""
    pins = lake_pins(root, commit)
    if table not in pins:
        raise KeyError(
            f"{table!r} is not pinned by lake commit "
            f"{commit if commit is not None else 'latest'} (pinned: "
            f"{sorted(pins)})"
        )
    return snapshot_read(spark, os.path.join(root, table), pins[table])


def lake_pinned_versions(root: str) -> dict[str, set]:
    """Every (table -> versions) still referenced by ANY surviving log
    entry — the set a table vacuum must preserve."""
    out: dict[str, set] = {}
    for v in lake_versions(root):
        for rel, tv in _read_entry(root, v)["tables"].items():
            out.setdefault(rel, set()).add(tv)
    return out
