"""Plan-quality audit: the "is this the plan you'd want at 100 TB" check,
as data instead of eyeballing ``explain`` output.

The test suite enforces these properties registry-wide (no accidental
cartesians, no row-at-a-time Python, broadcasts where provable —
tests/test_plans.py); this module exposes the same signals to users and
CI: ``python -m music_recommendation_service_spark explain q05_... --root DIR``
prints the audit, and ``Engine.audit(name)`` returns it programmatically.

Everything is derived from the pre-execution physical plan string (AQE may
still improve it at runtime — plan-level smells are still smells).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# Python-side execution operators, from worst to acceptable:
# BatchEvalPython = row-at-a-time UDF (the hot-path killer);
# ArrowEval/MapInPandas/FlatMapGroupsInPandas = Arrow-batched (declared
# slow paths, acceptable where built-ins can't express the op).
_PY_ROW_AT_A_TIME = ("BatchEvalPython",)
_PY_ARROW = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")


def plan_audit(df: DataFrame) -> dict:
    """Summarize scale-relevant plan properties of a DataFrame."""
    jdf = df._jdf  # noqa: SLF001
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString  # noqa: SLF001
    formatted = jdf.queryExecution().explainString(mode("formatted"))

    def op(name: str) -> int:
        """Count operator nodes by their numbered detail headers —
        ``(81) Exchange`` — which are unambiguous tokens in formatted mode
        (``Exchange`` as a word never collides with BroadcastExchange)."""
        return len(re.findall(rf"\(\d+\) {name}\b", formatted))

    audit = {
        "shuffle_exchanges": op("Exchange"),
        "broadcast_exchanges": op("BroadcastExchange"),
        "reused_exchanges": op("ReusedExchange"),
        "joins": {
            "broadcast_hash": op("BroadcastHashJoin"),
            "sort_merge": op("SortMergeJoin"),
            "shuffled_hash": op("ShuffledHashJoin"),
            "broadcast_nested_loop": op("BroadcastNestedLoopJoin"),
            "cartesian": op("CartesianProduct"),
        },
        "aggregates": op("HashAggregate") + op("SortAggregate")
        + op("ObjectHashAggregate"),
        "windows": op("Window"),
        "window_group_limits": op("WindowGroupLimit"),
        "python_row_at_a_time": sum(op(p) for p in _PY_ROW_AT_A_TIME),
        "python_arrow_batched": sum(op(p) for p in _PY_ARROW),
        "scans": op("Scan parquet") + op("Scan csv") + op("Scan json"),
        "pushed_filters": len(
            [
                m
                for m in re.findall(r"PushedFilters: \[([^\]]*)\]", formatted)
                if m.strip()
            ]
        ),
        "whole_stage_codegen_spans": len(
            set(re.findall(r"\[codegen id : (\d+)\]", formatted))
        ),
    }
    audit["smells"] = _smells(audit)
    return audit


def _smells(a: dict) -> list[str]:
    out = []
    if a["joins"]["cartesian"]:
        out.append("CartesianProduct: unbounded row explosion")
    if a["python_row_at_a_time"]:
        out.append(
            "BatchEvalPython: row-at-a-time Python UDF in the plan "
            "(use built-ins or a pandas UDF)"
        )
    if a["joins"]["broadcast_nested_loop"] > 2:
        out.append(
            "many BroadcastNestedLoopJoins: fine for 1-row/tiny frames, "
            "quadratic otherwise"
        )
    if a["shuffle_exchanges"] > 8:
        out.append(
            f"{a['shuffle_exchanges']} shuffles: check whether stages can "
            "share a partitioning (repartition once, aggregate+window on it)"
        )
    return out


def format_audit(audit: dict) -> str:
    lines = [
        f"shuffles={audit['shuffle_exchanges']}  "
        f"broadcasts={audit['broadcast_exchanges']}  "
        f"reused={audit['reused_exchanges']}  "
        f"codegen_spans={audit['whole_stage_codegen_spans']}",
        "joins: "
        + "  ".join(f"{k}={v}" for k, v in audit["joins"].items() if v),
        f"aggregates={audit['aggregates']}  "
        f"window_group_limits={audit['window_group_limits']}",
        f"python: row_at_a_time={audit['python_row_at_a_time']} "
        f"arrow_batched={audit['python_arrow_batched']}",
        f"scans={audit['scans']}  with_pushed_filters={audit['pushed_filters']}",
    ]
    if audit["smells"]:
        lines.append("SMELLS:")
        lines.extend(f"  - {s}" for s in audit["smells"])
    else:
        lines.append("no plan smells detected")
    return "\n".join(lines)
