"""Zero-tolerance plan hazards: CartesianProduct and BatchEvalPython.

The fingerprint net (test_plan_fingerprints.py) pins every registered
query's operator counts against tests/data/plan_fingerprints.json — but
its remedy for an intentional change is "regenerate the baseline", so a
hazard introduced together with a regeneration sails through review as
one more diff hunk. These two operator classes get a harder line:

- CartesianProduct / row-scale nested-loop joins over two corpus-scale
  inputs are O(n·m) work no cluster size rescues; every candidate
  generator in the repo is bucketed precisely to avoid them.
- BatchEvalPython is the row-at-a-time Python UDF boundary — the
  10-100x-slower path the whole engine is designed around (Arrow
  batches via mapInPandas/mapInArrow where Python is unavoidable).

This test asserts the CHECKED-IN BASELINE ITSELF carries zero of each,
for every query, so `python scripts/gen_plan_fp.py` cannot launder one
in: landing a cartesian or a row-wise Python eval requires editing this
file, i.e. a human writing down why.

(BroadcastNestedLoopJoin is deliberately NOT zero-gated here: Spark
plans every scalar-aggregate attach — joining a 1-row corpus-total
frame onto a corpus — as a BNLJ with a 1-row broadcast side, which is
the cheapest correct shape. Boundedness of broadcast BUILDS is the
broadcast gate's job (test_broadcast_gate.py); count drift is the
fingerprint net's.)
"""

from __future__ import annotations

from arrow_spark.queries import load_all
from arrow_spark.testing.planfp import load_baseline

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")

#: query -> (op, count, why) — empty today; a future entry needs a
#: written justification for why O(n·m) work or a row-wise Python
#: boundary is acceptable for that query at 100 TB.
ALLOWED: dict[str, tuple[str, int, str]] = {}


def test_baseline_has_zero_plan_hazards():
    baseline = load_baseline()
    bad = {
        name: {op: n for op, n in counts.items() if op in FORBIDDEN and n}
        for name, counts in baseline.items()
    }
    bad = {k: v for k, v in bad.items() if v and k not in ALLOWED}
    assert not bad, (
        f"hazard operators in the committed fingerprint baseline: {bad}. "
        "CartesianProduct = O(n*m) work at any cluster size; BatchEvalPython "
        "= row-at-a-time Python. Re-plan (bucketed candidates / Arrow-batched "
        "boundary), or classify in tests/test_plan_hazard_zero.py::ALLOWED "
        "with a written why."
    )


def test_hazard_allowlist_names_registered_queries():
    stale = sorted(set(ALLOWED) - set(load_all()))
    assert not stale, f"hazard allowlist names retired queries: {stale}"
