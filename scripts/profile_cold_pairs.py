"""Decompose the COLD cost of the pair-table family (q02/q03/q05/q123).

Runs each probe in a FRESH JVM (one subprocess per mode) so the scratch
cache and codegen are genuinely cold, and times the pieces:

  mode=q02            cold q02 exactly as the bench runs it (noop sink)
  mode=q03            cold q03
  mode=q05            cold q05
  mode=q123           cold q123
  mode=baskets        just the baskets distinct materialize (write+readback)
  mode=likes          just the likes materialize
  mode=sim_inline     the q02 pair plan consumed inline, NO scratch write
  mode=cf_inline      the q03 pair plan consumed inline (likes materialized
                      first, timed separately)

Usage: python scripts/profile_cold_pairs.py            # run all modes
       python scripts/profile_cold_pairs.py q02        # one mode
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

MODES = [
    "q02",
    "q03",
    "q05",
    "q123",
    "baskets",
    "likes",
    "sim_inline",
    "cf_inline",
]


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def run_mode(mode: str) -> None:
    # Fresh, UNIQUE scratch root per invocation => genuinely cold cache.
    import tempfile

    scratch = tempfile.mkdtemp(prefix=f"coldprof_{mode}_")
    os.environ["SPARK_GRAFT_SCRATCH"] = scratch
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    try:
        _run_mode_body(mode, scratch)
    finally:  # round-12 advice: a crash after mkdtemp must not leak scratch
        import shutil

        shutil.rmtree(scratch, ignore_errors=True)


def _run_mode_body(mode: str, scratch: str) -> None:

    from music_recommendation_service_spark.plans import registry
    from music_recommendation_service_spark.session import get_spark

    spark = get_spark(f"coldprof-{mode}")
    reg = registry()
    # JIT/codegen warm on the smallest SF (same as bench.py) so the probe
    # measures the plan, not first-run JVM warmup.
    reg["q01_weekly_trending"].build(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict[str, float] = {}
    if mode in ("q02", "q03", "q05", "q123"):
        name = {
            "q02": "q02_song_similarity",
            "q03": "q03_collaborative_filtering",
            "q05": "q05_hybrid_recommendations",
            "q123": "q123_basket_rules",
        }[mode]
        # time build+consume together: build() runs any blocking scratch
        # materialization, exactly like bench.py's timed region
        t0 = time.perf_counter()
        reg[name].build(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        out[f"{mode}_cold"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        reg[name].build(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        out[f"{mode}_warm"] = round(time.perf_counter() - t0, 3)
    elif mode == "baskets":
        from music_recommendation_service_spark.sources.catalog import load_table
        from music_recommendation_service_spark.sources.writers import (
            scratch_materialize,
        )

        li = load_table(spark, SF_DIR, "lineitem")
        t0 = time.perf_counter()
        b = scratch_materialize(
            li.select("l_orderkey", "l_partkey").distinct(), "prof_baskets"
        )
        out["baskets_materialize"] = round(time.perf_counter() - t0, 3)
        out["baskets_consume"] = _noop(b)
    elif mode == "likes":
        from music_recommendation_service_spark.plans.reference_parity import _likes_m

        t0 = time.perf_counter()
        lk = _likes_m(spark, SF_DIR)
        out["likes_materialize"] = round(time.perf_counter() - t0, 3)
        out["likes_consume"] = _noop(lk)
    elif mode == "sim_inline":
        from music_recommendation_service_spark.operators.pairs import (
            PairConfig,
            cooccurrence_pairs,
        )
        from music_recommendation_service_spark.sources.catalog import load_table

        li = load_table(spark, SF_DIR, "lineitem")
        plan = cooccurrence_pairs(
            li, "l_orderkey", "l_partkey", config=PairConfig.from_env()
        )
        out["sim_inline_consume"] = _noop(plan)
    elif mode == "cf_inline":
        from music_recommendation_service_spark.operators.pairs import (
            PairConfig,
            cooccurrence_pairs,
        )
        from music_recommendation_service_spark.plans.reference_parity import _likes_m

        t0 = time.perf_counter()
        likes = _likes_m(spark, SF_DIR)
        out["likes_materialize"] = round(time.perf_counter() - t0, 3)
        plan = cooccurrence_pairs(
            likes, "user_id", "item_id", config=PairConfig.from_env()
        )
        out["cf_inline_consume"] = _noop(plan)

    print("RESULT " + json.dumps({"mode": mode, "sf_dir": SF_DIR, **out}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] != "all":
        if sys.argv[1] == "--child":
            run_mode(sys.argv[2])
            sys.exit(0)
        modes = sys.argv[1:]
    else:
        modes = MODES
    for m in modes:
        try:
            # round-12 advice: one wedged child JVM must not hang the sweep
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", m],
                capture_output=True,
                text=True,
                timeout=1800,
            )
        except subprocess.TimeoutExpired:
            print(json.dumps({"mode": m, "error": "child timed out (1800s)"}))
            continue
        for line in r.stdout.splitlines():
            if line.startswith("RESULT "):
                print(line[len("RESULT "):])
                break
        else:
            print(json.dumps({"mode": m, "error": r.stderr[-500:]}))
