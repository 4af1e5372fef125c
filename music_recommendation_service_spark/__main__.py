"""CLI entry point — the spark-submit surface of the engine.

The reference runs each pipeline as its own spark-submitted script wired
through Airflow (SURVEY.md §3.1: ``SparkSubmitOperator`` per job); here one
module serves every catalog query and the SQL surface, so an orchestrator
(Airflow, cron, anything that can run a command) schedules jobs as:

    spark-submit -m music_recommendation_service_spark ...   # on a cluster
    python -m music_recommendation_service_spark list
    python -m music_recommendation_service_spark query q01_weekly_trending \
        --root /root/testdata/sf0.001 --limit 10
    python -m music_recommendation_service_spark sql \
        "SELECT count(*) AS n FROM lineitem" --root /root/testdata/sf0.001
    python -m music_recommendation_service_spark query q05_hybrid_recommendations \
        --root /root/testdata/sf0.001 --out /tmp/gold/recos  # lake write

With ``--out`` the result lands on the lake (overwrite, S4 semantics)
instead of stdout — the silver/gold materialization path.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="music_recommendation_service_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list catalog queries")
    p_list.add_argument("--tag", default=None, help="filter by tag substring")

    p_query = sub.add_parser("query", help="run a named catalog query")
    p_query.add_argument("name")
    p_query.add_argument("--root", required=True, help="lake directory")
    p_query.add_argument("--limit", type=int, default=20)
    p_query.add_argument("--out", default=None, help="write result here instead")
    p_query.add_argument("--explain", action="store_true")

    p_sql = sub.add_parser("sql", help="run SQL over the lake tables")
    p_sql.add_argument("text")
    p_sql.add_argument("--root", required=True)
    p_sql.add_argument("--limit", type=int, default=20)
    p_sql.add_argument("--out", default=None)

    p_exp = sub.add_parser(
        "explain", help="plan-quality audit + formatted plan for a query"
    )
    p_exp.add_argument("name")
    p_exp.add_argument("--root", required=True)
    p_exp.add_argument("--full", action="store_true", help="also print the plan")

    p_pipe = sub.add_parser(
        "pipeline", help="run the full bronze->silver->gold medallion pipeline"
    )
    p_pipe.add_argument("--source", required=True, help="source tables directory")
    p_pipe.add_argument("--lake", required=True, help="output lake directory")
    p_pipe.add_argument("--anchor", required=True, help="trending window anchor date")
    p_pipe.add_argument("--k", type=int, default=5)

    args = ap.parse_args(argv)

    if args.cmd == "pipeline":
        from music_recommendation_service_spark.pipelines import run_full_pipeline
        from music_recommendation_service_spark.session import get_spark

        paths = run_full_pipeline(
            get_spark("pipeline"), args.source, args.lake, args.anchor, k=args.k
        )
        for name, path in paths.items():
            print(f"{name}\t{path}")
        return 0

    from music_recommendation_service_spark.plans import registry

    if args.cmd == "list":
        for name, q in sorted(registry().items()):
            if args.tag and not any(args.tag in t for t in q.tags):
                continue
            oracle = "oracle" if q.oracle else "rows-only"
            first_line = ((q.doc or "").strip().splitlines() or [""])[0]
            print(f"{name}\t[{oracle}]\t{first_line[:80]}")
        return 0

    from music_recommendation_service_spark.engine import Engine

    eng = Engine(args.root)
    if args.cmd == "explain":
        from music_recommendation_service_spark.plans.audit import format_audit

        reg = registry()
        if args.name not in reg:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        df = reg[args.name].build(eng.spark, args.root)
        print(format_audit(eng.audit(df)))
        if args.full:
            df.explain("formatted")
        return 0
    if args.cmd == "query":
        reg = registry()
        if args.name not in reg:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        df = reg[args.name].build(eng.spark, args.root)
    else:
        df = eng.sql(args.text)

    if getattr(args, "explain", False):
        df.explain("formatted")
    if args.out:
        from music_recommendation_service_spark.sources.writers import write_table

        write_table(df, args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
