"""Keyed table reconciliation: diff two snapshots into a row-status
report.

The migration-validation primitive (did the rewrite/backfill/copy
produce the same table?): full-outer-join two frames on their key
columns and classify every key as added / removed / changed /
unchanged, with the list of columns whose values differ — so a
reconciliation isn't a boolean, it's a triage-able report.

Scale: ONE full outer hash join on the keys plus a codegen'd
per-column null-safe comparison projection; the changed-columns array
is built from literals, no per-column passes. Summaries aggregate
map-side. This pairs with the engine's oracle posture: the same
machinery that verifies this repo against DuckDB, offered to users as
an operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-status diff of ``right`` (new) vs ``left`` (old) on ``keys``.

    Returns (keys…, row_status, changed_cols): status ``added`` (key
    only in right), ``removed`` (only in left), ``changed`` (both, some
    compared column differs — NULL-safely), else ``unchanged``.
    ``compare_cols`` defaults to the shared non-key columns.
    """
    keys = list(keys)
    if compare_cols is None:
        compare_cols = [
            c for c in left.columns if c in set(right.columns) and c not in keys
        ]
    compare_cols = list(compare_cols)
    l = left.select(
        *[F.col(k).alias(f"__lk_{k}") for k in keys],
        *[F.col(c).alias(f"__l_{c}") for c in compare_cols],
        F.lit(True).alias("__in_l"),
    )
    r = right.select(
        *[F.col(k).alias(f"__rk_{k}") for k in keys],
        *[F.col(c).alias(f"__r_{c}") for c in compare_cols],
        F.lit(True).alias("__in_r"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"__lk_{k}").eqNullSafe(F.col(f"__rk_{k}"))
        cond = eq if cond is None else (cond & eq)
    j = l.join(r, cond, "full_outer")
    changed = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}")), F.lit(c)
                )
                for c in sorted(compare_cols)
            ]
        )
    )
    status = (
        F.when(F.col("__in_l").isNull(), F.lit("added"))
        .when(F.col("__in_r").isNull(), F.lit("removed"))
        .when(F.size(changed) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *[
            F.coalesce(F.col(f"__rk_{k}"), F.col(f"__lk_{k}")).alias(k)
            for k in keys
        ],
        status.alias("row_status"),
        F.when(
            F.col("__in_l").isNotNull() & F.col("__in_r").isNotNull(), changed
        ).otherwise(F.array().cast("array<string>")).alias("changed_cols"),
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """Counts per row_status — the one-line reconciliation verdict."""
    return diff.groupBy("row_status").agg(F.count(F.lit(1)).alias("n"))
