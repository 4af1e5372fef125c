"""q102 SemDeDup cell-size audit (round-13 verdict order #8).

Computes the members relation's cell-size distribution at a given SF and
reports the intra-cell quadratic budget: sum(n*(n-1)/2) pair evaluations,
max/median cell size, and the verdict threshold check (any cell > ~1e4
members would warrant splitting hot cells with a secondary band behind
the SEMDEDUP_BITS contract).

    python scripts/audit_q102_cells.py [--sf-dir /tmp/spark_graft_sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/spark_graft_sf1")
    args = ap.parse_args()

    from music_recommendation_service_spark.functions.dialect import SPARK
    from music_recommendation_service_spark.plans.corpus_ops import (
        SEMDEDUP_BITS,
        _q102_members_body,
    )
    from music_recommendation_service_spark.session import get_spark
    from music_recommendation_service_spark.sources.catalog import load_table

    spark = get_spark("audit_q102_cells")
    load_table(spark, args.sf_dir, "embeddings").createOrReplaceTempView(
        "embeddings"
    )
    rows = spark.sql(
        f"WITH {_q102_members_body(SPARK)},\n"
        "    per_cell AS (\n"
        "        SELECT cell, count(*) AS n FROM members GROUP BY cell\n"
        "    )\n"
        "    SELECT count(*) AS n_cells,\n"
        "           sum(n) AS n_vectors,\n"
        "           max(n) AS max_cell,\n"
        "           percentile(n, 0.5) AS median_cell,\n"
        "           percentile(n, 0.99) AS p99_cell,\n"
        "           sum(n * (n - 1) / 2) AS pair_evals\n"
        "    FROM per_cell"
    ).collect()[0]
    out = {
        "sf_dir": args.sf_dir,
        "semdedup_bits": SEMDEDUP_BITS,
        "n_cells": rows["n_cells"],
        "n_vectors": int(rows["n_vectors"]),
        "max_cell": int(rows["max_cell"]),
        "median_cell": rows["median_cell"],
        "p99_cell": rows["p99_cell"],
        "pair_evals": int(rows["pair_evals"]),
        "hot_cell_threshold": 10_000,
        "needs_split": int(rows["max_cell"]) > 10_000,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
