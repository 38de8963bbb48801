"""Physical-plan fingerprints: a mechanical regression net for plan
shape.

Every round's verdict asks the same question — "did any query's plan
regress?" — and answering it by eyeballing `.explain()` does not scale
to 200+ queries. A fingerprint reduces an executed-plan string to the
counts of the operators that matter for scale (exchanges, join
strategies, window/aggregate/sort nodes, Python boundaries, scans), so
`tests/test_plan_fingerprints.py` can diff every registered query's
CURRENT plan shape against the checked-in baseline
(`tests/data/plan_fingerprints.json`) in one parametrized run.

A changed fingerprint is not automatically wrong — an intentional
rewrite (e.g. the r4 q1 exact-sum change) legitimately alters counts;
regenerate the baseline with `python scripts/gen_plan_fp.py` and review
the diff in the commit. What the net catches is the UNINTENTIONAL kind:
a refactor that silently turns a broadcast join into a sort-merge join,
adds an Exchange, or drops a pushed filter.

Counting is purely lexical on the plan string — stable across runs
because the session (tests' get_spark) and the fixture scale (sf0.001)
are pinned; plan node ids and codegen stage numbers are not counted.
"""

from __future__ import annotations

import json
import os

#: Substrings counted in the executed-plan string. Order matters for
#: subsumption: a line counts toward the FIRST key it contains, so
#: "BroadcastExchange" does not also count as "Exchange".
PLAN_OPS = (
    "BroadcastExchange",
    "Exchange rangepartitioning",
    "Exchange hashpartitioning",
    "Exchange SinglePartition",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "CartesianProduct",
    "TakeOrderedAndProject",
    "WindowGroupLimit",
    "Window",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Sort ",
    "Generate",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInPandas",
    "PythonMapInArrow",
    "Scan parquet",
    "LocalTableScan",
    "Scan ExistingRDD",
)


def plan_text(df) -> str:
    """Executed-plan string of a frame (pre-AQE shape)."""
    return df._jdf.queryExecution().executedPlan().toString()


#: name@sf_dir → executed-plan string. Building a query's physical plan
#: is the expensive part of both the fingerprint test and the broadcast
#: gate; caching lets the two parametrized test files share one build
#: per registered query within a pytest session.
_PLAN_TEXT_CACHE: dict[str, str] = {}


def cached_plan_text(name: str, fn, spark, sf_dir: str) -> str:
    key = f"{name}@{sf_dir}"
    if key not in _PLAN_TEXT_CACHE:
        _PLAN_TEXT_CACHE[key] = plan_text(fn(spark, sf_dir))
    return _PLAN_TEXT_CACHE[key]


def fingerprint_text(text: str) -> dict[str, int]:
    """Operator counts of an executed-plan string."""
    counts: dict[str, int] = {}
    for line in text.splitlines():
        for op in PLAN_OPS:
            if op in line:
                counts[op] = counts.get(op, 0) + 1
                break
    return counts


def fingerprint(df) -> dict[str, int]:
    """Operator counts of the frame's executed plan (pre-AQE shape)."""
    return fingerprint_text(plan_text(df))


def baseline_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "tests", "data", "plan_fingerprints.json")


def load_baseline() -> dict[str, dict[str, int]]:
    with open(baseline_path()) as f:
        return json.load(f)
