"""One-shot, judge-ordered repair of the sf0.01 ``events`` fixture.

Round-11 incident context: the driver's read-only ``/root/testdata/sf0.01``
corpus was overwritten and rebuilt from sf0.1 slices. The rebuilt ``events``
table took the FIRST 10k rows (event_id < 10000), whose timestamps span only
Jan 1-4, where the driver-generated profile spans the full 30 days of
January 2024 (sf0.001 and sf0.1 both do). That near-emptied the driver
gate's time-series rows (q133 passed on 0 rows). The round-11 VERDICT
orders: "re-slice `events` preserving the full 30-day span (filter
`user_id % 150` across all 100k sf0.1 rows, then deterministic per-user
downsample to ~10k)".

This script rebuilds ``events`` deterministically (no RNG, no clock):

1. slice sf0.1 to ``user_id < 150`` — 150 users, matching the original
   user range 0..149; the slice spans Jan 1 - Jan 30 and has 10,014 rows;
2. per-user downsample to EXACTLY 10,000: rank users by (event count
   DESC, user_id ASC); for the first 14 users in that order, drop their
   single latest event (max ts, tiebreak max event_id) — span preserved
   (no user's latest event is the global max twice over: verified below);
3. re-densify ``event_id`` to 0..9999 in (ts, old event_id) order,
   preserving the generator's near-perfect event_id/ts correlation;
4. byte-preserve the physical schema (timestamp[us], int64 keys, snappy,
   one row group, pandas metadata — same pyarrow 16.x writer profile as
   every other corpus file).

Safety: refuses to run without BOTH the CLI flag
``--i-am-repairing-driver-testdata`` and
``SPARK_GRAFT_ALLOW_TESTDATA_REPAIR=1`` in the environment; writes to a
temp file in the SAME directory, verifies the full post-conditions, backs
up the current file to /tmp, then atomically renames into place.
"""
from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1/events.parquet"
DST = "/root/testdata/sf0.01/events.parquet"
REF = "/root/testdata/sf0.001/events.parquet"  # untouched profile witness


def build() -> "pandas.DataFrame":  # noqa: F821
    import pyarrow.parquet as pq

    df = pq.read_table(SRC).to_pandas()
    sl = df[df["user_id"] < 150].copy()
    assert len(sl) == 10014, len(sl)
    # deterministic per-user downsample: the 14 most-evented users each
    # lose their single latest event
    counts = (
        sl.groupby("user_id").size().rename("c").reset_index()
        .sort_values(["c", "user_id"], ascending=[False, True])
    )
    drop_users = counts["user_id"].head(len(sl) - 10000).tolist()
    drop_idx = []
    for u in drop_users:
        g = sl[sl["user_id"] == u]
        drop_idx.append(
            g.sort_values(["ts", "event_id"]).index[-1]
        )
    sl = sl.drop(index=drop_idx)
    assert len(sl) == 10000, len(sl)
    # re-densify event_id in ts order (generator profile: ids near-monotone
    # in ts)
    sl = sl.sort_values(["ts", "event_id"]).reset_index(drop=True)
    sl["event_id"] = sl.index.astype("int64")
    return sl[["event_id", "ts", "user_id", "event_type", "value", "props"]]


def verify(path: str) -> None:
    import duckdb
    import pyarrow.parquet as pq

    n, mn, mx, u, emn, emx = duckdb.sql(
        f"SELECT count(*), min(ts), max(ts), count(DISTINCT user_id), "
        f"min(event_id), max(event_id) FROM read_parquet('{path}')"
    ).fetchall()[0]
    assert n == 10000, n
    assert u == 150, u
    assert (emn, emx) == (0, 9999), (emn, emx)
    assert mn.month == 1 and mn.day == 1, mn
    assert mx.month == 1 and mx.day == 30, mx  # full 30-day span restored
    # physical schema identical to the untouched sf0.001 witness
    got = pq.ParquetFile(path).schema_arrow
    want = pq.ParquetFile(REF).schema_arrow
    for g, w in zip(got, want):
        assert g.name == w.name and g.type == w.type, (g, w)
    assert pq.ParquetFile(path).metadata.num_row_groups == 1
    # every user keeps a multi-day history (q105-style cohorts non-vacuous)
    days = duckdb.sql(
        f"SELECT min(cnt) FROM (SELECT user_id, "
        f"count(DISTINCT CAST(ts AS DATE)) cnt FROM read_parquet('{path}') GROUP BY 1)"
    ).fetchall()[0][0]
    assert days >= 10, days


def main() -> None:
    if "--i-am-repairing-driver-testdata" not in sys.argv:
        raise SystemExit(
            "this script REWRITES /root/testdata/sf0.01/events.parquet "
            "(the judge-ordered round-12 fixture repair). Run with "
            "--i-am-repairing-driver-testdata and "
            "SPARK_GRAFT_ALLOW_TESTDATA_REPAIR=1 to proceed."
        )
    from scripts._guard import assert_not_testdata

    assert_not_testdata(DST, allow_repair=True)  # env token checked here

    out = build()
    tmp = DST + ".repair.tmp"
    out.to_parquet(tmp, engine="pyarrow", compression="snappy", index=False)
    verify(tmp)
    backup = "/tmp/events_sf001_pre_repair.parquet"
    shutil.copy2(DST, backup)
    os.replace(tmp, DST)
    verify(DST)
    print(f"repaired {DST}; pre-repair file backed up at {backup}")


if __name__ == "__main__":
    main()
