"""Versioned snapshot tables: Delta-log semantics on plain parquet.

The reference ships a ~145-LoC C# reader that replays a Delta table's
``_delta_log`` (JSON actions + checkpoint parquet) into an active-file list
(SURVEY.md §2.1 S13, ``MusicRecommendationService/Services/MinioService.cs:71-216``).
With delta-spark on the classpath none of this is needed; this module is the
engine's OWN minimal realization of the same protocol for environments
without it — giving atomic overwrite, time travel, and rollback on any
filesystem Spark can write:

    layout:  <path>/v=<N>/*.parquet     immutable data per version
             <path>/_snapshots/<N>.json manifest: data dir + row count + schema

Commit protocol (mirrors Delta's optimistic log append):
- data lands FIRST under a new ``v=<N>`` dir (invisible to readers — they
  only trust manifests);
- the manifest is created with O_EXCL (``open(..., "x")``): two concurrent
  writers racing to version N cannot both win — the loser retries at N+1.
  Readers always see the highest fully-written manifest: a crash between
  data and manifest leaves only an orphaned data dir (vacuumable), never a
  torn table.

At 100 TB the same protocol holds — manifests are O(1) metadata; the data
dirs are whatever Spark wrote in parallel. (Delta/Iceberg add file-level
add/remove actions so appends need not rewrite; ``snapshot_append`` here
keeps manifests self-contained by listing BOTH old and new data dirs —
append is metadata-only, no data rewrite.)
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_snapshots")


def snapshot_versions(path: str) -> list[int]:
    """All committed versions, ascending."""
    d = _manifest_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.endswith(".json"):
            try:
                out.append(int(f[:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(path: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(path), f"{version}.json")) as f:
        return json.load(f)


def _commit(path: str, data_dirs: list[str], n_rows: int, schema_json: str) -> int:
    """Atomically claim the next version; retry on contention."""
    os.makedirs(_manifest_dir(path), exist_ok=True)
    while True:
        version = (snapshot_versions(path) or [0])[-1] + 1
        manifest = {
            "version": version,
            "data_dirs": data_dirs,
            "n_rows": n_rows,
            "schema": schema_json,
            "committed_at": time.time(),
        }
        target = os.path.join(_manifest_dir(path), f"{version}.json")
        try:
            with open(target, "x") as f:  # O_EXCL: loser of a race retries
                json.dump(manifest, f)
            return version
        except FileExistsError:
            continue


def snapshot_write(df: DataFrame, path: str) -> int:
    """Overwrite: land a new immutable data dir, then commit. Returns the
    new version. Readers of older versions are unaffected (their files are
    never touched)."""
    versions = snapshot_versions(path)
    next_hint = (versions[-1] if versions else 0) + 1
    data_dir = f"v={next_hint}-{os.getpid()}-{int(time.time() * 1000)}"
    full = os.path.join(path, data_dir)
    df.write.mode("error").parquet(full)
    n = df.sparkSession.read.parquet(full).count()
    return _commit(path, [data_dir], n, df.schema.json())


def snapshot_append(df: DataFrame, path: str) -> int:
    """Append as a NEW version: new data dir + manifest listing old dirs
    too — metadata-only append, no rewrite of existing data. Schema must
    match the current version exactly (S6 strict-append contract)."""
    versions = snapshot_versions(path)
    if not versions:
        return snapshot_write(df, path)
    cur = _read_manifest(path, versions[-1])
    if df.schema.json() != cur["schema"]:
        raise ValueError(
            f"append schema mismatch at {path}: manifest={cur['schema']} "
            f"incoming={df.schema.json()}"
        )
    data_dir = f"v={versions[-1] + 1}-{os.getpid()}-{int(time.time() * 1000)}"
    full = os.path.join(path, data_dir)
    df.write.mode("error").parquet(full)
    n = df.sparkSession.read.parquet(full).count()
    return _commit(
        path, cur["data_dirs"] + [data_dir], cur["n_rows"] + n, cur["schema"]
    )


def snapshot_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the latest (or a specific historical) version — time travel."""
    versions = snapshot_versions(path)
    if not versions:
        raise FileNotFoundError(f"no snapshots at {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in {versions}")
    m = _read_manifest(path, v)
    return spark.read.parquet(*[os.path.join(path, d) for d in m["data_dirs"]])


def snapshot_rollback(path: str, version: int) -> int:
    """RESTORE: commit a NEW version whose manifest points at an old
    version's files (history is preserved — same as Delta RESTORE)."""
    m = _read_manifest(path, version)
    return _commit(path, m["data_dirs"], m["n_rows"], m["schema"])


def snapshot_vacuum(path: str, keep_last: int = 2) -> list[str]:
    """Drop data dirs referenced ONLY by manifests older than the last
    ``keep_last`` versions (and those manifests). Returns removed dirs.
    Like Delta VACUUM this breaks time travel past the horizon."""
    import shutil

    versions = snapshot_versions(path)
    keep, drop = versions[-keep_last:], versions[:-keep_last]
    live = {d for v in keep for d in _read_manifest(path, v)["data_dirs"]}
    removed = []
    for v in drop:
        for d in _read_manifest(path, v)["data_dirs"]:
            if d not in live and os.path.isdir(os.path.join(path, d)):
                shutil.rmtree(os.path.join(path, d))
                removed.append(d)
        os.remove(os.path.join(_manifest_dir(path), f"{v}.json"))
    # Orphans from crashed writes (data dir, no surviving manifest) are dead.
    for entry in os.listdir(path):
        if entry.startswith("v=") and entry not in live:
            full = os.path.join(path, entry)
            if os.path.isdir(full):
                shutil.rmtree(full)
                removed.append(entry)
    return removed
