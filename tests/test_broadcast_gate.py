"""Regression gate for the round-11 corpus-scale broadcast bug class.

Every registered query's executed plan is audited for BroadcastExchange
nodes whose build subtree contains a Generate (explode) or an aggregate
— the estimate-blind shapes where Catalyst's size estimate does not
track the data, so the broadcast never auto-disables as the corpus
grows (the dedup_excise_spans 6.8 GiB-at-sf3 / driver-OOM-at-sf10 bug,
fixed repo-wide in round 11 and documented as a rubric in SCALE.md).

Plan fingerprints pin whole plans; this gate pins the HAZARD CLASS —
any new query, rewrite, or Spark-version bump that introduces an
unclassified estimate-blind broadcast fails here even if its
fingerprint was legitimately regenerated. The allowlist
(tests/data/broadcast_allowlist.json) holds the human-classified
bounded flags (query-side frames, constant-fan-out explodes, k-bounded
candidates, sketch constants...); regenerate with
`python scripts/gen_broadcast_allowlist.py` and classify every new
UNCLASSIFIED entry before committing.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from arrow_spark.queries import load_all
from arrow_spark.testing.broadcast_audit import (
    audit_plan_text,
    load_allowlist,
    signatures,
)
from arrow_spark.testing.planfp import cached_plan_text, plan_text

QUERIES = load_all()
ALLOW = load_allowlist()


def test_allowlist_fully_classified():
    bad = [
        (q, e["sig"])
        for q, entries in ALLOW.items()
        for e in entries
        if e.get("why", "UNCLASSIFIED") == "UNCLASSIFIED"
    ]
    assert not bad, f"allowlist entries need a bounded-side justification: {bad}"


def test_allowlist_covers_only_registered_queries():
    stale = sorted(set(ALLOW) - set(QUERIES))
    assert not stale, f"allowlist names retired queries, regenerate: {stale}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_unclassified_hazardous_broadcast(spark, sf_dir, name):
    got = Counter(signatures(cached_plan_text(name, QUERIES[name].fn, spark, sf_dir)))
    allowed = Counter({e["sig"]: e["count"] for e in ALLOW.get(name, [])})
    new = got - allowed
    assert not new, (
        f"{name}: UNCLASSIFIED estimate-blind broadcast(s) {dict(new)} — "
        "an aggregate- or explode-derived frame is a static broadcast "
        "build side (SCALE.md round-11 rubric). Either re-plan with a "
        "merge hint or classify it as bounded: "
        "python scripts/gen_broadcast_allowlist.py " + name
    )
    gone = allowed - got
    assert not gone, (
        f"{name}: allowlist is stale — classified flags {dict(gone)} no "
        "longer appear in the plan. Regenerate: "
        "python scripts/gen_broadcast_allowlist.py " + name
    )


def test_gate_fires_on_aggregate_broadcast(spark):
    # synthetic negative: collect_list postings forced broadcast — the
    # exact shape of the r11 bm25/postings bug
    base = spark.range(1000).withColumn("g", F.col("id") % 7)
    postings = base.groupBy("g").agg(F.collect_list("id").alias("xs"))
    j = base.join(F.broadcast(postings), "g")
    flags = audit_plan_text(plan_text(j))
    assert any("agg" in f["kinds"] for f in flags), flags


def test_gate_fires_on_explode_broadcast(spark):
    # synthetic negative: data-dependent explode (sequence over a value)
    # forced broadcast — the dedup_excise_spans OOM shape
    base = spark.range(1000).withColumn("g", F.col("id") % 7)
    ex = base.select(
        "g", F.explode(F.sequence(F.lit(0), F.col("id") % 5)).alias("v")
    )
    j = base.join(F.broadcast(ex.groupBy("g", "v").count()), "g")
    flags = audit_plan_text(plan_text(j))
    assert any("explode" in f["kinds"] or "agg" in f["kinds"] for f in flags), flags


def test_clean_broadcast_not_flagged(spark, sf_dir):
    # a scan-derived dimension broadcast is the SAFE shape — no flag
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    j = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    assert audit_plan_text(plan_text(j)) == []


def test_gate_fires_on_checkpointed_broadcast(spark):
    # synthetic negative (r13): a localCheckpoint hides the aggregate
    # origin of a frame from the subtree walk (the build side becomes a
    # bare Scan ExistingRDD), which is exactly how dedup_semantic_prune's
    # corpus-scale broadcast sailed through the r12 gate. The "ckpt"
    # kind must flag it.
    base = spark.range(1000).withColumn("g", F.col("id") % 7)
    agg_ckpt = base.groupBy("g").count().localCheckpoint(eager=True)
    j = base.join(F.broadcast(agg_ckpt), "g")
    flags = audit_plan_text(plan_text(j))
    assert any("ckpt" in f["kinds"] for f in flags), flags


def test_ckpt_kind_defers_to_visible_agg(spark):
    # when the aggregate IS visible in the build subtree (no checkpoint
    # in between), the signature must stay the pre-r13 "agg" form so the
    # existing human classifications remain valid
    base = spark.range(1000).withColumn("g", F.col("id") % 7)
    j = base.join(F.broadcast(base.groupBy("g").count()), "g")
    flags = audit_plan_text(plan_text(j))
    assert flags and all("ckpt" not in f["kinds"] for f in flags), flags
