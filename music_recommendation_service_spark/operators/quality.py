"""Data-quality gate: the reference's Great Expectations checks (SURVEY.md
§2.11 — ordered column-list match, not-null columns, value-in-set, fail the
job on violation, ``great_expectations_utils.py:30-35``) as DataFrame
assertions, derived from the *actual* schema (the reference's own suite had
drifted from it).

Scale design: all row-level checks collapse into ONE aggregate pass —
``sum(CASE WHEN violation)`` per check in a single ``agg`` — so a 100 TB
gate costs one scan, not one scan per expectation. Column checks are
metadata-only (no job at all).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class QualityGateError(AssertionError):
    """Raised when any expectation fails; carries all failures, not just the
    first (the reference aborts on first failure — batching is strictly more
    informative for the same scan)."""

    def __init__(self, failures: list[str]):
        self.failures = failures
        super().__init__("; ".join(failures))


@dataclass
class QualityGate:
    """Declarative expectation suite over one DataFrame."""

    expect_columns: list[str] | None = None  # ordered column-list match
    not_null: tuple[str, ...] = ()
    value_in_set: dict[str, tuple] = field(default_factory=dict)
    unique: tuple[str, ...] = ()

    def run(self, df: DataFrame) -> DataFrame:
        """Validate; returns ``df`` unchanged for pipeline chaining, raises
        :class:`QualityGateError` listing every violated expectation."""
        failures: list[str] = []

        if self.expect_columns is not None and df.columns != self.expect_columns:
            failures.append(
                f"columns {df.columns} != expected {self.expect_columns}"
            )

        aggs = []
        labels = []
        for c in self.not_null:
            aggs.append(F.sum(F.col(c).isNull().cast("long")))
            labels.append(f"not_null({c})")
        for c, allowed in self.value_in_set.items():
            bad = ~F.col(c).isin(*allowed) | F.col(c).isNull()
            aggs.append(F.sum(bad.cast("long")))
            labels.append(f"value_in_set({c}, {allowed})")
        for c in self.unique:
            aggs.append(F.count(c) - F.countDistinct(c))
            labels.append(f"unique({c})")

        if aggs:
            counts = df.agg(*aggs).collect()[0]
            for label, n in zip(labels, counts):
                if n and n > 0:
                    failures.append(f"{label}: {n} violations")

        if failures:
            raise QualityGateError(failures)
        return df
