"""SemDeDup (dedup_semantic_prune) invariants + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_spark.queries.base import REGISTRY
from arrow_spark.queries import load_all

load_all()


def test_semdedup_invariants(spark, sf_dir):
    out = REGISTRY["dedup_semantic_prune"].fn(spark, str(sf_dir)).collect()
    n = len(out)
    assert n > 0
    by_id = {r["vec_id"]: r for r in out}
    for r in out:
        if r["keep"]:
            assert r["dup_of"] is None
        else:
            # dropped vectors point at a strictly lower id...
            assert r["dup_of"] is not None and r["dup_of"] < r["vec_id"]
            # ...in the same cluster (candidates are within-cluster only)
            assert by_id[r["dup_of"]]["cid"] == r["cid"]
    # the lowest id of every cluster can never be dropped
    lowest = {}
    for r in out:
        if r["cid"] not in lowest or r["vec_id"] < lowest[r["cid"]]["vec_id"]:
            lowest[r["cid"]] = r
    assert all(r["keep"] for r in lowest.values())


def test_semdedup_plan_no_cartesian_no_python(spark, sf_dir):
    plan = (
        REGISTRY["dedup_semantic_prune"].fn(spark, str(sf_dir))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_semdedup_threshold_one_drops_nothing_but_exact_twins(spark, sf_dir):
    # sanity on the rule itself: at threshold > 1 no cosine qualifies,
    # so re-running the prune with an impossible threshold keeps all
    from arrow_spark.queries.similarity import pinned_lloyd
    from arrow_spark.catalog import table

    emb = (
        table(spark, str(sf_dir), "embeddings")
        .select(
            "vec_id",
            F.transform(
                "embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")
            ).alias("e"),
        )
        .limit(50)
        .localCheckpoint()
    )
    assign, _ = pinned_lloyd(emb, k=4, iters=1)
    assert assign.where(F.col("cid").isNull()).count() == 0
    assert assign.count() == 50


def test_prefix_filter_plan_no_cartesian(spark, sf_dir):
    plan = (
        REGISTRY["dedup_prefix_filter_pairs"].fn(spark, str(sf_dir))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


def test_prefix_filter_equals_length_blocked_exact(spark, sf_dir):
    # two independent candidate plans, same exact result set
    from arrow_spark.catalog import table
    from arrow_spark.llm.dedup import (
        jaccard_near_dup_pairs,
        prefix_filter_jaccard_pairs,
    )

    docs = table(spark, str(sf_dir), "documents").where("doc_id < 120")
    a = sorted(
        map(tuple, jaccard_near_dup_pairs(docs, 0.5, block_cols=("lang",)).collect())
    )
    b = sorted(
        map(tuple, prefix_filter_jaccard_pairs(docs, 0.5, block_cols=("lang",)).collect())
    )
    assert a == b and len(a) > 0


def test_skyline_extension_rel_round_trip(spark):
    # builder → consumer → operator: the third shipped extension rel
    import arrow_spark.plans.substrait_builder as B
    from arrow_spark.plans.extensions import engine_extension_handler, skyline_rel
    from arrow_spark.plans.substrait import run_substrait

    # consumer positionalizes read columns to _f0.._f2
    read = B.read_named(["t"], ["g", "x", "y"], ["string", "i64", "i64"])
    plan = B.plan(
        skyline_rel(read, groups=["_f0"], minimize="_f1", maximize="_f2"),
        ["g", "x", "y"],
    )
    src = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 5), ("a", 3, 20)], "g string, x long, y long"
    )
    out = run_substrait(
        spark, plan, lambda names: src, extension_handler=engine_extension_handler
    )
    assert sorted((r["x"], r["y"]) for r in out.collect()) == [(1, 10), (3, 20)]


def test_semantic_dedup_production_path(spark, sf_dir):
    from arrow_spark.catalog import table
    from arrow_spark.llm.dedup import semantic_dedup

    emb = table(spark, str(sf_dir), "embeddings")
    out = semantic_dedup(emb, threshold=0.95, n_clusters=8, n_iters=2).collect()
    assert len(out) == emb.count()
    by_id = {r["id"]: r for r in out}
    for r in out:
        if not r["keep"]:
            assert r["dup_of"] < r["id"]
            assert by_id[r["dup_of"]]["cid"] == r["cid"]
    # determinism
    again = semantic_dedup(emb, threshold=0.95, n_clusters=8, n_iters=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
