"""Incremental TOP-K view maintenance (snapshot_maintain_topk): per-group
leaderboards kept current from the change feed — buffered fold for
inserts, exact delete handling, targeted recompute only when a delete
evicts a buffered row while below-cutoff rows exist, tombstoned empty
groups, exactly-once across replay.

Reference tie: the per-request top-N ranking the reference's serving
layer recomputes (`RecommendationService.cs` scoring tail) maintained as
a materialized view with O(changed rows) micro-batch cost.
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from music_recommendation_service_spark.sources.snapshots import (
    snapshot_maintain_topk,
    snapshot_merge,
    snapshot_read,
    snapshot_write,
    topk_view_read,
)


def _src_df(spark, rows):
    # (grp, item, score, seq)
    return spark.createDataFrame(rows, ["grp", "item", "score", "seq"])


def _expected_topk(spark, src_path, k):
    """Ground truth: full recompute of per-group top-k (score desc, item
    desc — the maintained buffer's descending lexicographic tie-break)."""
    w = Window.partitionBy("grp").orderBy(F.desc("score"), F.desc("item"))
    return {
        (r["grp"], r["rank"]): (r["score"], r["item"])
        for r in (
            snapshot_read(spark, src_path)
            .filter(F.col("score").isNotNull())
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .collect()
        )
    }


def _got_topk(spark, view_path, k):
    return {
        (r["grp"], r["rank"]): (r["o"], r["ky"]["item"])
        for r in topk_view_read(spark, view_path, k).collect()
    }


def _maintain(spark, paths, k, buffer=None):
    return snapshot_maintain_topk(
        spark,
        paths["src"],
        paths["view"],
        paths["cur"],
        group_cols=["grp"],
        order_col="score",
        key_cols=["item"],
        k=k,
        buffer=buffer,
    )


def _paths(tmp_path, name):
    return {
        "src": str(tmp_path / f"{name}_src"),
        "view": str(tmp_path / f"{name}_view"),
        "cur": str(tmp_path / f"{name}_cur"),
    }


def test_topk_bootstrap_and_insert_fold(spark, tmp_path):
    p = _paths(tmp_path, "tk1")
    rows = [(g, i, float(10 * g + i), 1) for g in (1, 2) for i in range(6)]
    snapshot_write(_src_df(spark, rows), p["src"], stats_cols=["item"])
    assert _maintain(spark, p, k=3) is not None
    assert _got_topk(spark, p["view"], 3) == _expected_topk(spark, p["src"], 3)
    # caught up: no-op
    assert _maintain(spark, p, k=3) is None
    # insert a new leader + a below-cutoff row via keyed merge
    snapshot_merge(
        _src_df(spark, [(1, 100, 99.0, 2), (1, 101, -5.0, 2)]),
        p["src"], key_cols=["item"], seq_col="seq",
    )
    assert _maintain(spark, p, k=3) is not None
    assert _got_topk(spark, p["view"], 3) == _expected_topk(spark, p["src"], 3)


def test_topk_eviction_recompute_below_cutoff_contender(spark, tmp_path):
    """The pinned shape the naive size-test misses: deletes evict buffered
    rows while inserts REFILL the buffer above a below-cutoff contender —
    the contender must surface, which only a recompute can prove."""
    p = _paths(tmp_path, "tk2")
    # group 1: scores 10..1 (items 10..1); buffer=4, k=2
    rows = [(1, i, float(i), 1) for i in range(1, 11)]
    snapshot_write(_src_df(spark, rows), p["src"], stats_cols=["item"])
    _maintain(spark, p, k=2, buffer=4)
    # delete the #2 row (score 9, buffered) and insert two rows BELOW the
    # old cutoff (7) but above the contender pool top (6)
    snapshot_merge(
        spark.createDataFrame(
            [(1, 9, None, 2, True), (1, 50, 6.5, 2, False),
             (1, 51, 6.4, 2, False)],
            "grp long, item long, score double, seq long, _del boolean",
        ),
        p["src"], key_cols=["item"], seq_col="seq", delete_col="_del",
    )
    _maintain(spark, p, k=2, buffer=4)
    # full buffer must now be exactly top-4 of the live rows: 10,8,7,6.5
    got = _got_topk(spark, p["view"], 4)
    assert got == _expected_topk(spark, p["src"], 4), got


def test_topk_recompute_pinned_to_applied_version(spark, tmp_path, monkeypatch):
    """Regression (round-7 advisor): the targeted recompute must read the
    source AT the applied version (to_v), not LATEST — a concurrent write
    landing between change consumption and the recompute would otherwise
    bake not-yet-applied rows into the buffer, and the next wave's re-fold
    of those same inserts would duplicate (o, ky) leaderboard entries."""
    import music_recommendation_service_spark.sources.snapshots as sn

    p = _paths(tmp_path, "tkpin")
    rows = [(1, i, float(i), 1) for i in range(1, 11)]
    snapshot_write(_src_df(spark, rows), p["src"], stats_cols=["item"])
    _maintain(spark, p, k=2, buffer=4)

    # wave 2: delete a buffered row while below-cutoff rows exist ->
    # forces the targeted recompute path
    snapshot_merge(
        spark.createDataFrame(
            [(1, 9, None, 2, True)],
            "grp long, item long, score double, seq long, _del boolean",
        ),
        p["src"], key_cols=["item"], seq_col="seq", delete_col="_del",
    )

    real_consume = sn.snapshot_consume_changes
    fired = {}

    def racy_consume(spark_, source_path, cursor_path, key_cols):
        out = real_consume(spark_, source_path, cursor_path, key_cols)
        if not fired:
            fired["hit"] = True
            # a concurrent writer lands a NEW top row after consumption but
            # before the recompute executes
            snapshot_merge(
                spark.createDataFrame(
                    [(1, 99, 50.0, 3, False)],
                    "grp long, item long, score double, seq long, "
                    "_del boolean",
                ),
                p["src"], key_cols=["item"], seq_col="seq",
                delete_col="_del",
            )
        return out

    monkeypatch.setattr(sn, "snapshot_consume_changes", racy_consume)
    _maintain(spark, p, k=2, buffer=4)  # applies wave 2 only
    monkeypatch.setattr(sn, "snapshot_consume_changes", real_consume)
    _maintain(spark, p, k=2, buffer=4)  # wave 3 folds item 99 exactly once

    full = topk_view_read(spark, p["view"], 4).collect()
    items = [r["ky"]["item"] for r in full]
    assert len(items) == len(set(items)), f"duplicate leaderboard rows: {items}"
    assert _got_topk(spark, p["view"], 4) == _expected_topk(spark, p["src"], 4)


def test_topk_tombstones_empty_group(spark, tmp_path):
    p = _paths(tmp_path, "tk3")
    rows = [(1, 1, 5.0, 1), (1, 2, 4.0, 1), (2, 3, 1.0, 1)]
    snapshot_write(_src_df(spark, rows), p["src"], stats_cols=["item"])
    _maintain(spark, p, k=2)
    snapshot_merge(
        spark.createDataFrame(
            [(1, 1, None, 2, True), (1, 2, None, 2, True)],
            "grp long, item long, score double, seq long, _del boolean",
        ),
        p["src"], key_cols=["item"], seq_col="seq", delete_col="_del",
    )
    _maintain(spark, p, k=2)
    got = _got_topk(spark, p["view"], 2)
    assert {g for (g, _r) in got} == {2}


def test_topk_null_scores_never_rank(spark, tmp_path):
    p = _paths(tmp_path, "tk4")
    rows = [(1, 1, 5.0, 1), (1, 2, None, 1), (1, 3, 3.0, 1)]
    snapshot_write(_src_df(spark, rows), p["src"], stats_cols=["item"])
    _maintain(spark, p, k=3)
    got = _got_topk(spark, p["view"], 3)
    assert got == {(1, 1): (5.0, 1), (1, 2): (3.0, 3)}


def test_topk_randomized_model_vs_recompute(spark, tmp_path):
    """Seeded random churn waves (inserts, score-moving updates, deletes,
    bulk group wipes) — after every wave the maintained view equals a
    full recompute at BOTH k and the full buffer width."""
    rng = random.Random(2471)
    p = _paths(tmp_path, "tk5")
    k, kp = 3, 6
    seq = 1
    live = {}  # (grp, item) -> score
    init = []
    for g in range(4):
        for j in range(rng.randint(2, 12)):
            i = g * 100000 + j  # item keys globally unique (keyed feed)
            s = round(rng.uniform(0, 100), 1)
            live[(g, i)] = s
            init.append((g, i, s, seq))
    snapshot_write(_src_df(spark, init), p["src"], stats_cols=["item"])
    _maintain(spark, p, k=k, buffer=kp)
    for wave in range(8):
        seq += 1
        batch = []
        if wave == 5:
            # bulk wipe of one group
            gw = rng.choice([g for g, _ in live.keys()])
            for (g, i) in [key for key in live if key[0] == gw]:
                batch.append((g, i, None, seq, True))
                del live[(g, i)]
        else:
            for _ in range(rng.randint(2, 9)):
                g = rng.randrange(4)
                if live and rng.random() < 0.4:
                    gi = rng.choice(sorted(live.keys()))
                    if rng.random() < 0.5:
                        batch.append((gi[0], gi[1], None, seq, True))
                        del live[gi]
                    else:
                        s = round(rng.uniform(0, 100), 1)
                        live[gi] = s
                        batch.append((gi[0], gi[1], s, seq, False))
                else:
                    i = g * 100000 + rng.randrange(1000, 9999)
                    if (g, i) in live:
                        continue
                    s = round(rng.uniform(0, 100), 1)
                    live[(g, i)] = s
                    batch.append((g, i, s, seq, False))
        if not batch:
            continue
        snapshot_merge(
            spark.createDataFrame(
                batch,
                "grp long, item long, score double, seq long, _del boolean",
            ),
            p["src"], key_cols=["item"], seq_col="seq", delete_col="_del",
        )
        _maintain(spark, p, k=k, buffer=kp)
        for width in (k, kp):
            got = _got_topk(spark, p["view"], width)
            want = _expected_topk(spark, p["src"], width)
            assert got == want, f"wave {wave} width {width}: {got} != {want}"


def test_topk_streaming_leaderboard_e2e(spark, tmp_path):
    """Streaming leaderboard: landing JSON score events -> keyed stream
    MERGE into the snapshot source -> snapshot_maintain_topk -> served
    ranks equal a full recompute after every wave. Score DOWNGRADES of
    ranked rows exercise the eviction/recompute path through the real
    update pre/post feed; replaying a landing file is a content no-op
    end-to-end (stream exactly-once + maintainer exactly-once)."""
    import json as _json

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from music_recommendation_service_spark.streaming.pipeline import (
        foreach_batch_merge,
        stream_from_directory,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    p = {
        "src": str(tmp_path / "lb_src"),
        "view": str(tmp_path / "lb_view"),
        "cur": str(tmp_path / "lb_cur"),
    }
    ckpt = str(tmp_path / "lb_ckpt")
    schema = StructType(
        [
            StructField("grp", LongType()),
            StructField("item", LongType()),
            StructField("score", DoubleType()),
            StructField("seq", LongType()),
        ]
    )

    def drop(name, rows):
        with open(landing / name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    def run_wave():
        stream = stream_from_directory(spark, str(landing), schema)
        q = foreach_batch_merge(
            stream, p["src"], ckpt, key_cols=("item",), seq_col="seq"
        )
        q.awaitTermination(120)
        snapshot_maintain_topk(
            spark, p["src"], p["view"], p["cur"],
            group_cols=["grp"], order_col="score", key_cols=["item"], k=2,
            buffer=3,
        )

    def check():
        got = _got_topk(spark, p["view"], 2)
        want = _expected_topk(spark, p["src"], 2)
        assert got == want, (got, want)

    w1 = [
        {"grp": 1, "item": i, "score": float(10 - i), "seq": 1}
        for i in range(6)
    ] + [{"grp": 2, "item": 100, "score": 5.0, "seq": 1}]
    drop("w1.json", w1)
    run_wave()
    check()

    # wave 2: downgrade group 1's leader below everyone (buffered update
    # preimage -> eviction -> recompute must surface item 3), plus a new
    # group-2 leader
    w2 = [
        {"grp": 1, "item": 0, "score": 0.5, "seq": 2},
        {"grp": 2, "item": 101, "score": 9.0, "seq": 2},
    ]
    drop("w2.json", w2)
    run_wave()
    check()

    # wave 3: replay wave 2 under a new landing name — at-least-once
    # upstream delivery; merge seq-tie rule + maintainer exactly-once make
    # it a content no-op
    drop("w2_replay.json", w2)
    run_wave()
    check()
