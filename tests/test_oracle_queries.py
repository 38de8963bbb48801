"""Every registered query runs against its DuckDB oracle at sf0.001 —
the same comparison the driver applies at sf0.01 (reference model:
Arrow's randomized tests against a naive implementation,
hash_join_node_test.cc:252-506)."""

from __future__ import annotations

import pytest

from arrow_spark.queries import load_all
from arrow_spark.testing.oracle import run_compare

QUERIES = load_all()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    qd = QUERIES[name]
    res = run_compare(spark, name, qd.fn, qd.oracle, sf_dir)
    assert res.ok, f"{name}: {res.errors[:5]}"
    if qd.oracle is not None:
        assert res.row_count_spark == res.row_count_oracle
