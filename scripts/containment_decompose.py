"""Decompose containment_pairs' scale behavior: candidate-bound vs
output-bound (VERDICT r12 ask #2's "done" evidence).

For each scale dir, counts the three populations that tell the story:
  raw_cand   — (id_a, id_b) pairs sharing ≥1 prefix token (the r12
               verify-stage input: what the quadratic wall scored)
  kept_cand  — pairs surviving the r13 lossless positional filter
               (what the verify stage scores now)
  out_rows   — qualifying pairs (the relation itself — the floor no
               candidate plan can beat)
and times the full shipped query (min of 2, noop sink — the
scale_sweep convention).

Usage: python scripts/containment_decompose.py [out_json] [dirs...]
(default dirs: .scale/gen-sf0.1 .scale/gen-sf1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench  # noqa: F401  (host calibration)
from arrow_spark import get_spark
from arrow_spark.catalog import table
from arrow_spark.llm.dedup import containment_pairs, tokens


def candidate_counts(spark, sf_dir: str, threshold: float = 0.8) -> dict:
    """Re-derive the candidate stage (same algebra as containment_pairs)
    and count raw vs positionally-filtered candidates."""
    num, den = int(round(threshold * 1000)), 1000
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        F.col("doc_id").alias("id"),
        F.array_distinct(tokens(F.col("text"))).alias("toks"),
    ).where(F.size("toks") >= 1)
    tok = d.select("id", F.explode("toks").alias("tok"))
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    ordered = (
        tok.join(freq.hint("merge"), "tok")
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("f", "tok"))),
                lambda s: s["tok"],
            ).alias("otoks")
        )
    )
    size = F.size("otoks")
    ceil_tn = F.floor((size * num + den - 1) / den)
    plen = (size - ceil_tn + 1).cast("int")
    pref_a = ordered.select(
        F.col("id").alias("id_a"),
        size.alias("sz_a"),
        F.explode(F.slice("otoks", 1, plen)).alias("ptok"),
    )
    post_b = ordered.select(
        F.col("id").alias("id_b"),
        F.size("otoks").alias("sz_b"),
        F.posexplode("otoks").alias("pb", "__b_tok"),
    )
    matched = pref_a.join(
        post_b.hint("merge"),
        (F.col("ptok") == F.col("__b_tok")) & (F.col("id_a") != F.col("id_b")),
    )
    agg = matched.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("m"),
        F.max("pb").alias("max_pb"),
        F.first("sz_a").alias("sz_a"),
        F.first("sz_b").alias("sz_b"),
    )
    raw = agg.count()
    ceil_a = F.floor((F.col("sz_a") * num + den - 1) / den)
    kept = agg.where(
        F.col("m") + F.least(ceil_a - 1, F.col("sz_b") - F.col("max_pb") - 1)
        >= ceil_a
    ).count()
    return {"raw_cand": raw, "kept_cand": kept}


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        root, "containment_decompose.json"
    )
    dirs = sys.argv[2:] or [".scale/gen-sf0.1", ".scale/gen-sf1"]
    spark = get_spark("containment-decompose")
    out: dict = {"calibration": bench._host_calibration(spark), "dirs": {}}
    for rel in dirs:
        sf_dir = rel if os.path.isabs(rel) else os.path.join(root, rel)
        row = candidate_counts(spark, sf_dir)
        docs = table(spark, sf_dir, "documents")
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            containment_pairs(docs, threshold=0.8).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        row["t_full"] = round(best, 3)
        row["out_rows"] = containment_pairs(docs, threshold=0.8).count()
        out["dirs"][rel] = row
        print(rel, row, flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
