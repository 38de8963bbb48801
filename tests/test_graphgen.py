"""Pins for the scale-graph generators.

The r13 find: scalegen's events used a LINEAR ``k = 31*i mod 100``;
each user's event_ids sit in arithmetic progression with stride = the
user count, so the per-user k sequence was an AP mod 100 — at most ONE
distinct (k, k+Δ) transition shape per corpus, and Δ = 0 (self-loops
only, an EMPTY click graph) whenever the user count was a multiple of
100, which held at sf ∈ {0.1, 1, 3, 10}. Every event-transition-graph
scale measurement before the fix ran on that degenerate graph. These
tests fail on any regression to a linear scheme.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _transition_edges(ev):
    trans = ev.select(
        F.col("k"),
        F.lag("k").over(W.partitionBy("user_id").orderBy("event_id")).alias("pk"),
    )
    return (
        trans.where(F.col("pk").isNotNull() & (F.col("pk") != F.col("k")))
        .select(F.least("pk", "k").alias("lo"), F.greatest("pk", "k").alias("hi"))
        .distinct()
    )


def test_events_transition_graph_dense_at_multiple_of_100_users(spark):
    # sf=1 → 15,000 users ≡ 0 (mod 100): the regime where the linear
    # scheme produced ONLY self-loops. The fixture's graph is dense
    # (~6.3k distinct undirected pairs at sf0.01); require a large
    # fraction of the 4,950 possible pairs.
    from arrow_spark.sources.scalegen import events

    ev = events(spark, 0.1).select(
        "user_id",
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    n_pairs = _transition_edges(ev).count()
    assert n_pairs > 3000, f"transition graph degenerate: {n_pairs} pairs"


def test_events_k_uniform_ish(spark):
    from arrow_spark.sources.scalegen import events

    ev = events(spark, 0.1).select(
        F.get_json_object("props", "$.k").cast("int").alias("k")
    )
    counts = {r["k"]: r["n"] for r in ev.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert len(counts) == 100
    lo, hi = min(counts.values()), max(counts.values())
    assert hi < 2 * lo, f"k skew too large: min={lo} max={hi}"


def test_uniform_edges_shape(spark):
    from arrow_spark.sources.graphgen import uniform_edges

    e = uniform_edges(spark, 100_000)
    stats = e.agg(
        F.count("*").alias("n"),
        F.sum("w").alias("draws"),
        F.countDistinct("src").alias("srcs"),
    ).collect()[0]
    # ≈ n_edges simple edges (collision + self-loop loss is small), and
    # deterministic: a second build is identical
    assert 95_000 < stats["n"] <= 100_000
    assert stats["draws"] <= 100_000
    assert stats["srcs"] > 9_000  # ~10k nodes at default degree
    again = uniform_edges(spark, 100_000)
    assert e.exceptAll(again).count() == 0
    assert again.exceptAll(e).count() == 0
    assert e.where(F.col("src") == F.col("dst")).count() == 0
