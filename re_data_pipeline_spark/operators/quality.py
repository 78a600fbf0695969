"""Data-quality expectation gates — declarative row-level rules evaluated
in one pass, with a violation report per rule.

The reference validates ad-hoc inside each task (key-presence checks,
try/except casts, invalid-coordinate drops).  This operator centralizes the
pattern: rules are named boolean Column expressions; one aggregate pass
computes violation counts (no per-rule scans), and callers choose gate
semantics (fail the job, quarantine rows, or just report).

Scale shape: the report is ``len(rules)`` columns of conditional counts in a
single partial-aggregating pass over the table — at 100 TB the report costs
one scan; the row split is a filter on the same cached pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One-pass violation report: ``rule | n_rows | n_violations | rate``.

    A rule PASSES for a row when its Column is true; nulls count as
    violations (null-hostile by design — an unknown is not a pass).
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        # coalesce: SUM over an EMPTY table is NULL, and an empty table is
        # vacuously clean (0 violations), not a crash
        F.coalesce(
            F.sum(F.when(cond.isNull() | ~cond, 1).otherwise(0)), F.lit(0)
        ).alias(f"__v_{name}")
        for name, cond in rules.items()
    ]
    row = df.agg(*aggs)
    reports = []
    for name in rules:
        reports.append(
            row.select(
                F.lit(name).alias("rule"),
                F.col("n_rows"),
                F.col(f"__v_{name}").cast("bigint").alias("n_violations"),
                F.when(
                    F.col("n_rows") > 0,
                    F.round(F.col(f"__v_{name}") / F.col("n_rows"), 6),
                ).otherwise(F.lit(0.0)).alias("violation_rate"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def enforce(
    df: DataFrame, rules: dict[str, Column], max_violation_rate: float = 0.0
) -> DataFrame:
    """Gate: raise if any rule's violation rate exceeds the budget.

    Returns ``df`` unchanged on success so the gate composes inside a
    pipeline (`... |> enforce |> write`).
    """
    report = check(df, rules).collect()
    # compare raw counts: the report's rate is rounded for display, and a
    # zero-tolerance gate must not pass 1-in-10M violations that round to 0.0
    bad = [
        r
        for r in report
        if r["n_violations"] > r["n_rows"] * max_violation_rate
    ]
    if bad:
        detail = ", ".join(f"{r['rule']}={r['n_violations']}/{r['n_rows']}" for r in bad)
        raise ValueError(f"quality gate failed: {detail}")
    return df


def split_valid(df: DataFrame, rules: dict[str, Column]) -> tuple[DataFrame, DataFrame]:
    """Quarantine split: (rows passing ALL rules, rows failing any)."""
    all_pass = F.lit(True)
    for cond in rules.values():
        all_pass = all_pass & F.coalesce(cond, F.lit(False))
    return df.where(all_pass), df.where(~all_pass)
