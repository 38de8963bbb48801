"""similarity_eval_ann_quality invariants."""

from __future__ import annotations

from arrow_spark.queries import load_all
from arrow_spark.queries.base import REGISTRY

load_all()


def test_ann_quality_metric_bounds_and_consistency(spark, sf_dir):
    rows = REGISTRY["similarity_eval_ann_quality"].fn(spark, str(sf_dir)).collect()
    assert len(rows) == 3  # one row per probe query
    for r in rows:
        assert 0 <= r["n_hits"] <= 5
        assert r["recall_at_k"] == r["n_hits"] / 5
        if r["n_hits"] == 0:
            assert r["mrr"] is None
        else:
            # MRR is 1/best-rank with rank in [1, 5]
            assert r["mrr"] is not None and 0.2 <= r["mrr"] <= 1.0
    # the probe vectors are corpus members: the query itself is rank 1
    # in both rankings, so every query has at least one hit and MRR 1
    assert all(r["n_hits"] >= 1 and r["mrr"] == 1.0 for r in rows)
