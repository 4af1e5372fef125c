"""Hot-key skew benchmark for the flagship pair self-join (q02 shape).

SURVEY.md §4.2 names self-join pair explosion as THE scale hazard of J2/J3
(``process_song_similarity.py:30-34``). This harness injects one
pathological basket — HOT_ITEMS distinct items under a single order key —
into the sf0.1 lineitem table and times the q02-shaped pair build:

- ``uncapped``      — the default plan (exact; AQE skew-join is the only guard)
- ``salted``        — PairConfig(salt_buckets=B): exact rewrite, hot group's
                      join work split across B partitions
- ``capped``        — PairConfig(cap_group_size=C): bounded output
                      (changes results; the 100 TB circuit-breaker)

Also times the clean (no hot key) baseline for reference. Prints ONE JSON
line. Run: ``python bench_skew.py`` (env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_SKEW_HOT_ITEMS, SPARK_GRAFT_SKEW_SALT, SPARK_GRAFT_SKEW_CAP).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HOT_ITEMS = int(os.environ.get("SPARK_GRAFT_SKEW_HOT_ITEMS", "10000"))
SALT = int(os.environ.get("SPARK_GRAFT_SKEW_SALT", "16"))
CAP = int(os.environ.get("SPARK_GRAFT_SKEW_CAP", "100"))


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from music_recommendation_service_spark.operators.pairs import (
        PairConfig,
        cooccurrence_pairs,
    )
    from music_recommendation_service_spark.session import get_spark
    from music_recommendation_service_spark.sources.catalog import load_table

    spark = get_spark("bench_skew")
    clean = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    hot = spark.range(HOT_ITEMS).select(
        F.lit(-1).cast("long").alias("l_orderkey"),
        (F.col("id") + 1).cast("long").alias("l_partkey"),
    )
    skewed = clean.unionByName(hot)

    def run(df, cfg: PairConfig, label: str) -> tuple[float, int]:
        t0 = time.perf_counter()
        out = cooccurrence_pairs(df, "l_orderkey", "l_partkey", config=cfg)
        n = out.count()
        return round(time.perf_counter() - t0, 2), n

    results: dict[str, dict] = {}
    t, n = run(clean, PairConfig(), "clean_baseline")
    results["clean_baseline"] = {"sec": t, "pairs": n}
    t, n = run(skewed, PairConfig(), "skewed_uncapped")
    results["skewed_uncapped"] = {"sec": t, "pairs": n}
    t, n = run(skewed, PairConfig(salt_buckets=SALT), "skewed_salted")
    results["skewed_salted"] = {"sec": t, "pairs": n, "salt_buckets": SALT}
    t, n = run(skewed, PairConfig(cap_group_size=CAP), "skewed_capped")
    results["skewed_capped"] = {"sec": t, "pairs": n, "cap_group_size": CAP}

    print(
        json.dumps(
            {
                "metric": "pair_selfjoin_hot_key",
                "hot_items": HOT_ITEMS,
                "sf_dir": SF_DIR,
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
