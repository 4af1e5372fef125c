"""Measure format("snapshot") against the native snapshot read/write paths.

Three questions, each with a number the README carries:
1. POINT LOOKUP: does pushed-filter file skipping in the Python DataSource
   actually avoid opening files (vs a full DS scan), and how does it
   compare to the native snapshot_scan pruning?
2. FULL SCAN: what does the Python-worker Arrow hop cost vs the JVM
   parquet scan (the honest overhead of the integration surface)?
3. DISTRIBUTED WRITE: the DS writer computes per-file stats/blooms
   in-task (one pass); snapshot_write runs a second Spark aggregate over
   the landed files. Same manifests out — which is faster, at what size?

Run:  python scripts/bench_datasource.py [--rows 2000000] [--files 32]
Emits one JSON line per measurement plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from music_recommendation_service_spark.session import get_spark  # noqa: E402
from music_recommendation_service_spark.sources import snapshots as sn  # noqa: E402
from music_recommendation_service_spark.sources.datasource import (  # noqa: E402
    SnapshotBatchReader,
)
from pyspark.sql.datasource import EqualTo  # noqa: E402


def timed(fn, warm=1, reps=3):
    for _ in range(warm):
        fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    # files sized so per-file distinct counts fit the 16 KiB bloom budget
    # (~8k values at 16 bits/value) — the same saturation rule as the
    # native write path; a 62k-distinct file gets NO bloom in either.
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--files", type=int, default=256)
    args = ap.parse_args()

    spark = get_spark("bench-datasource")
    root = tempfile.mkdtemp(prefix="bench_ds_")
    t = os.path.join(root, "tbl")
    out = {}

    df = (
        spark.range(args.rows)
        .repartition(args.files)
        .selectExpr(
            "id",
            "concat('key-', id) as s",
            "id % 1000 as g",
            "cast(id % 97 as double) as v",
        )
    )

    # --- write paths --------------------------------------------------------
    t_native = os.path.join(root, "native")
    out["write_native_s"] = timed(
        lambda: (shutil.rmtree(t_native, ignore_errors=True),
                 sn.snapshot_write(df, t_native, stats_cols=["id"], bloom_cols=["s"]))[-1]
        and None, warm=1, reps=2,
    )
    t_ds = os.path.join(root, "ds")

    def ds_write():
        shutil.rmtree(t_ds, ignore_errors=True)
        (df.write.format("snapshot").mode("overwrite")
           .option("statsCols", "id").option("bloomCols", "s").save(t_ds))

    out["write_datasource_s"] = timed(ds_write, warm=1, reps=2)

    # both write paths must land the same metadata discipline
    m = sn._latest_manifest(t_ds)
    assert all(e["stats"] and e.get("bloom_ref") for e in m["files"])
    out["files"] = len(m["files"])

    # --- point lookup -------------------------------------------------------
    needle = f"key-{args.rows // 2}"
    r = SnapshotBatchReader({"path": t_ds}, schema=None)
    r.pushFilters([EqualTo(("s",), needle)])
    out["files_scanned_pushdown"] = len(r.partitions())

    out["point_ds_pushdown_s"] = timed(
        lambda: spark.read.format("snapshot").load(t_ds)
        .filter(f"s = '{needle}'").collect()
    )
    out["point_native_scan_s"] = timed(
        lambda: sn.snapshot_scan(spark, t_ds, {"s": (needle, needle)}).collect()
    )
    out["point_jvm_full_s"] = timed(
        lambda: sn.snapshot_read(spark, t_ds).filter(f"s = '{needle}'").collect()
    )

    # --- full scan (aggregate over every row) --------------------------------
    out["scan_ds_s"] = timed(
        lambda: spark.read.format("snapshot").load(t_ds)
        .groupBy("g").sum("v").count()
    )
    out["scan_native_s"] = timed(
        lambda: sn.snapshot_read(spark, t_ds).groupBy("g").sum("v").count()
    )

    print(json.dumps({"rows": args.rows, **out}))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
