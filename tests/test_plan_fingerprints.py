"""Every registered query's physical-plan shape vs the checked-in
baseline — the mechanical "did any plan regress" net (see
arrow_spark/testing/planfp.py). After an INTENTIONAL plan change:
`python scripts/gen_plan_fp.py <name>` and review the JSON diff."""

from __future__ import annotations

import pytest

from arrow_spark.queries import load_all
from arrow_spark.testing.planfp import cached_plan_text, fingerprint_text, load_baseline

QUERIES = load_all()
BASELINE = load_baseline()


def test_baseline_covers_registry():
    missing = sorted(set(QUERIES) - set(BASELINE))
    assert not missing, f"regenerate fingerprints for: {missing}"


@pytest.mark.parametrize("name", sorted(BASELINE))
def test_plan_shape_unchanged(spark, sf_dir, name):
    if name not in QUERIES:
        pytest.skip("query retired; regenerate baseline")
    got = fingerprint_text(cached_plan_text(name, QUERIES[name].fn, spark, sf_dir))
    assert got == BASELINE[name], (
        f"{name}: plan shape changed vs baseline.\n"
        f"  baseline: {BASELINE[name]}\n"
        f"  current:  {got}\n"
        "If intentional: python scripts/gen_plan_fp.py " + name
    )
