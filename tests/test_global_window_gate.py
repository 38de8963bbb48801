"""Regression gate for SINGLE-PARTITION global windows — the r13 audit
companion to the broadcast gate.

A Window with no PARTITION BY plans as `Exchange SinglePartition` →
WindowExec: every input row moves to ONE task. Harmless when the input
is bounded by construction (a 256-bucket cumulative sum, a day lattice,
one row per hypothesis test); a straggler-then-OOM at 100 TB when the
input is entity- or corpus-scale. Spark even warns at runtime ("No
Partition Defined for Window operation") — but a runtime warning on a
passing test is exactly the kind of signal nobody reads, so this gate
pins the CLASS at plan level: every registered query's single-partition
window count must match the classified allowlist below; a new or
re-planned query that introduces one fails until a human writes down
why its window input is bounded (or re-plans).

The r13 audit over all 322 plans found 9 queries, all bounded:
bucket-lattice cumulatives (the 256-bucket histogram pattern), time
lattices, and per-test frames — plus one acknowledged entity-scale
ntile (stats_decile_lift) whose operator docstring already names the
at-scale replacement (quantile-boundary bucket assignment).
"""

from __future__ import annotations

import pytest

from arrow_spark.queries import load_all
from arrow_spark.testing.planfp import cached_plan_text

QUERIES = load_all()

#: query -> (expected count, why-bounded). Counts are of Window
#: operators whose nearby child exchange is SinglePartition.
ALLOWED: dict[str, tuple[int, str]] = {
    "analytics_abc_classification": (
        1,
        "cumulative share over the 256-bucket value histogram — bucket-lattice input",
    ),
    "analytics_pareto_cumshare": (
        1,
        "cumulative share over the 256-bucket value histogram — bucket-lattice input",
    ),
    "exact_quantiles_weighted": (
        2,
        "cumulative weights over the 256-bucket weighted histograms "
        "(boundary + interpolation passes) — bucket-lattice input",
    ),
    "stats_decile_lift": (
        2,
        "ntile over the scored-ENTITY frame (one row per customer) — "
        "aggregate-sized vs the fact table; operators/stats_tests.py "
        "names the at-scale replacement (quantile-boundary buckets), "
        "plus the cumulative-gain window over the 10-row tile frame. "
        "The one acknowledged entity-scale window in the registry.",
    ),
    "stats_fdr_bh_adjust": (
        2,
        "rank + running-min windows over one row per HYPOTHESIS TEST — query-sized",
    ),
    "stats_ks_two_sample": (
        2,
        "two cumulative ECDFs (one per sample) over the shared 256-bucket lattice",
    ),
    "stats_mann_whitney_u": (
        1,
        "cumulative rank over the 256-bucket tie lattice",
    ),
    "stats_runs_test": (
        1,
        "lag over the DAY lattice (grows with time span, not volume)",
    ),
    "timeseries_rolling_corr": (
        1,
        "rolling frame over time buckets — time-lattice input",
    ),
}


def _single_partition_windows(plan: str) -> int:
    lines = plan.splitlines()
    n = 0
    for i, ln in enumerate(lines):
        if "Window" not in ln or "windowspecdefinition" not in ln:
            continue
        # the global shape: the window's immediate input subtree carries
        # an Exchange SinglePartition within the next few plan lines
        if any("Exchange SinglePartition" in nxt for nxt in lines[i + 1 : i + 6]):
            n += 1
    return n


def test_allowlist_covers_only_registered_queries():
    stale = sorted(set(ALLOWED) - set(QUERIES))
    assert not stale, f"allowlist names retired queries: {stale}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_unclassified_global_window(spark, sf_dir, name):
    got = _single_partition_windows(
        cached_plan_text(name, QUERIES[name].fn, spark, sf_dir)
    )
    allowed = ALLOWED.get(name, (0, ""))[0]
    assert got <= allowed, (
        f"{name}: {got} single-partition global window(s), {allowed} classified. "
        "A Window with no PARTITION BY moves every input row to one task — "
        "bounded inputs only (bucket/time lattices, per-test frames). Classify "
        "it in tests/test_global_window_gate.py::ALLOWED with a why, or "
        "re-plan with a partitioned window / quantile-boundary buckets."
    )
    assert got >= allowed, (
        f"{name}: allowlist is stale ({allowed} classified, {got} present) — "
        "update tests/test_global_window_gate.py::ALLOWED"
    )


def test_gate_fires_on_global_window(spark):
    # synthetic negative: a global row_number over a row-scale frame
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from arrow_spark.testing.planfp import plan_text

    df = spark.range(1000).withColumn(
        "rn", F.row_number().over(W.orderBy(F.col("id").desc()))
    )
    assert _single_partition_windows(plan_text(df)) >= 1
