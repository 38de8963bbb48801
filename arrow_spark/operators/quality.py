"""Row-level data-quality gate: rule evaluation + quarantine split.

The expectation-check pattern every ingestion pipeline needs (Deequ /
dbt-test shape, re-expressed as one projection): evaluate a named set
of boolean rules per row, route clean rows onward and quarantine
violating rows WITH the list of rules they broke — so bad data is
debuggable, not silently dropped.

Scale: rules are plain Catalyst boolean Columns evaluated in ONE
whole-stage-codegen projection (no per-rule passes, no UDFs); the
split is two filters over the same projection — each half alone costs
one scan, and consuming both halves of a cached/checkpointed frame
evaluates the rules once. Rule summaries aggregate map-side.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VIOLATIONS_COL = "violations"


def check_rules(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Attach a ``violations`` array column: the (sorted) names of every
    rule the row breaks. A rule PASSES when its Column is true; NULL
    counts as a violation (unknown data is not clean data)."""
    if not rules:
        raise ValueError("need at least one rule")
    viols = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
                for name, cond in sorted(rules.items())
            ]
        )
    )
    return df.withColumn(VIOLATIONS_COL, viols)


def quarantine_split(
    df: DataFrame, rules: Mapping[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): clean rows lose the violations column,
    quarantined rows keep it for triage."""
    checked = check_rules(df, rules)
    clean = checked.where(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    bad = checked.where(F.size(VIOLATIONS_COL) > 0)
    return clean, bad


def rule_summary(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Per-rule violation counts + total rows — the data-quality report
    (one aggregation pass; every counter is a conditional sum inside a
    single map-side-combined aggregate)."""
    aggs = [
        F.sum(
            F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)
        ).alias(name)
        for name, cond in sorted(rules.items())
    ]
    return df.agg(F.count(F.lit(1)).alias("total_rows"), *aggs)
