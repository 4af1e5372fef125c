"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute); results are drained with
``df.write.format("noop")`` so the full plan executes without driver-side
materialization cost dominating.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from music_recommendation_service_spark.plans import registry
    from music_recommendation_service_spark.session import get_spark

    spark = get_spark("bench")
    reg = registry()
    bench_queries = {n: q for n, q in sorted(reg.items()) if q.bench}

    # Warm the JVM/codegen path once on the smallest SF so per-query timings
    # measure the plan, not first-run JIT.
    warm = next(iter(bench_queries.values()))
    warm.build(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()

    # Best-of-2 per query: the host shows occasional multi-second noise
    # spikes from co-tenants; the min of two runs measures the PLAN, which
    # is what this harness exists to grade.
    timings: dict[str, float] = {}
    for name, q in bench_queries.items():
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            q.build(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "catalog_headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
