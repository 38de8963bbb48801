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
    """Re-derive the candidate stage (same algebra as containment_pairs,
    INCLUDING the registered query's lang blocking) and count raw vs
    positionally-filtered candidates."""
    num, den = int(round(threshold * 1000)), 1000
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        F.col("doc_id").alias("id"),
        F.array_distinct(tokens(F.col("text"))).alias("toks"),
        F.col("lang"),
    ).where(F.size("toks") >= 1)
    tok = d.select("id", "lang", F.explode("toks").alias("tok"))
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    ordered = (
        tok.join(freq.hint("merge"), "tok")
        .groupBy("id", "lang")
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
        F.col("lang"),
        size.alias("sz_a"),
        F.explode(F.slice("otoks", 1, plen)).alias("ptok"),
    )
    post_b = ordered.select(
        F.col("id").alias("id_b"),
        F.col("lang").alias("__b_lang"),
        F.size("otoks").alias("sz_b"),
        F.posexplode("otoks").alias("pb", "__b_tok"),
    )
    matched = pref_a.join(
        post_b.hint("merge"),
        (F.col("ptok") == F.col("__b_tok"))
        & (F.col("id_a") != F.col("id_b"))
        & (F.col("lang") == F.col("__b_lang")),
    )
    agg = matched.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("m"),
        F.max("pb").alias("max_pb"),
        F.first("sz_a").alias("sz_a"),
        F.first("sz_b").alias("sz_b"),
    )
    ceil_a = F.floor((F.col("sz_a") * num + den - 1) / den)
    keep = (
        F.col("m") + F.least(ceil_a - 1, F.col("sz_b") - F.col("max_pb") - 1)
        >= ceil_a
    )
    # one pass for both counts — at gen-sf1 the candidate stage is the
    # expensive part, don't run it twice
    row = agg.select(
        F.count(F.lit(1)).alias("raw"),
        F.sum(keep.cast("long")).alias("kept"),
    ).first()
    return {"raw_cand": row["raw"], "kept_cand": int(row["kept"])}


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
        # single timed run (not min-of-2): at gen-sf1 the query is
        # hundreds of seconds — one warm-session run is the honest
        # affordable instrument, noted in the artifact
        t0 = time.perf_counter()
        containment_pairs(docs, threshold=0.8, block_cols=("lang",)).write.format(
            "noop"
        ).mode("overwrite").save()
        row["t_full"] = round(time.perf_counter() - t0, 3)
        row["timing"] = "single-run"
        row["out_rows"] = containment_pairs(
            docs, threshold=0.8, block_cols=("lang",)
        ).count()
        out["dirs"][rel] = row
        print(rel, row, flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
