"""Fuzzy (approximate-string) join between two tables: token-set
Jaccard ≥ threshold, as an equi-join — the entity-matching primitive
(probe titles/names/descriptions against a reference table).

Same lossless length-bucket blocking as llm.dedup.jaccard_near_dup_pairs
(J(A,B) ≤ min/max of the set sizes ⇒ matching pairs sit within one
log_{1/t} bucket): the right side joins on its own bucket, the left
explodes {k−1,k,k+1}, so candidates meet on a plain hash-shuffled
equi-join key and each qualifying pair meets exactly once. The exact
Jaccard filter then makes blocking result-invariant — the oracle query
compares against the unblocked form.

Scale: per-key work is bounded by bucket population (optionally × any
exact `by` keys, which tighten blocks further), never |L|·|R|. At
100 TB block additionally on a cheap exact key (language, category,
first-token) or swap candidate generation to minhash_lsh_candidates and
keep this as the verifier — identical to the dedup guidance.

Join sides that scale with the corpus (gram postings, shingle frames,
the right table) carry explicit merge hints: Catalyst's size estimates
after explode are blind, and a mis-chosen broadcast of a corpus-scale
frame is the 6.8 GiB-at-sf3 failure mode fixed in excise_duplicate_spans.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from arrow_spark.llm.dedup import tokens


def _length_bucket(toks_col, threshold: float):
    log_inv_t = math.log(1.0 / threshold)
    raw = F.log(F.size(toks_col).cast("double")) / F.lit(log_inv_t)
    # snap-floor near-integers (same boundary guard as dedup.py — keeps
    # the ±1-bucket guarantee exact at power-of-1/t sizes)
    return F.when(
        F.abs(raw - F.round(raw, 0)) < 1e-9, F.round(raw, 0).cast("long")
    ).otherwise(F.floor(raw))


def fuzzy_join_lsh(
    left: DataFrame,
    right: DataFrame,
    l_id: str,
    l_text: str,
    r_id: str,
    r_text: str,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """The 100 TB path for fuzzy_join: MinHash-banded candidates instead
    of length blocks. Both sides' token sets union into one tagged frame
    that feeds the SAME signature pipeline as dedup's minhash
    (llm.dedup._lsh_candidates_from_sets — two shuffles total); only
    cross-side candidate pairs are kept and exact-verified.

    Approximate by design (banded-LSH recall < 1 below J=1; identical
    texts are always caught — identical signatures share every bucket),
    so there is no equality oracle: the exact `fuzzy_join` is the
    verifier at test scale, this is the production plan. Returns
    (l_id, r_id, jaccard) with the id columns as strings.
    """
    from arrow_spark.llm.dedup import _lsh_candidates_from_sets

    def _tagged(df, id_col, text_col, tag):
        return df.select(
            F.concat(F.lit(tag), F.col(id_col).cast("string")).alias("id"),
            F.array_distinct(tokens(F.col(text_col))).alias("sh"),
        )

    d = _tagged(left, l_id, l_text, "L:").unionByName(
        _tagged(right, r_id, r_text, "R:")
    ).repartition("id")
    cands = _lsh_candidates_from_sets(d, num_hashes, bands, hash_family)
    # keep cross-side pairs only; "L:" < "R:" lexically, and the candidate
    # generator emits id_a < id_b, so id_a is always the left row
    cross = cands.where(
        F.col("id_a").startswith("L:") & F.col("id_b").startswith("R:")
    )
    a = d.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = d.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    j = cross.join(a.hint("merge"), "id_a").join(b.hint("merge"), "id_b")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        j.select(
            F.col("id_a").substr(F.lit(3), F.lit(1 << 30)).alias(l_id),
            F.col("id_b").substr(F.lit(3), F.lit(1 << 30)).alias(r_id),
            (F.floor(inter * 1.0 / union * 1e6 + F.lit(0.5)) / 1e6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    l_text: str,
    r_text: str,
    threshold: float = 0.5,
    by: Sequence[str] = (),
) -> DataFrame:
    """Inner join of rows whose whitespace token sets have Jaccard ≥
    ``threshold`` (0 < t < 1), optionally within exact ``by`` keys.
    Returns all columns of both sides plus ``jaccard`` — column-name
    collisions outside ``by`` must be resolved by the caller."""
    if not (0.0 < threshold < 1.0):
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    lt = F.array_distinct(tokens(F.col(l_text)))
    rt = F.array_distinct(tokens(F.col(r_text)))
    bucket_l = _length_bucket(F.col("__lt__"), threshold)
    a = left.withColumn("__lt__", lt).withColumn(
        "__lb__", F.explode(F.array(bucket_l - 1, bucket_l, bucket_l + 1))
    )
    b = right.withColumn("__rt__", rt).withColumn(
        "__lb__", _length_bucket(F.col("__rt__"), threshold)
    )
    inter = F.size(F.array_intersect(F.col("__lt__"), F.col("__rt__")))
    union = F.size("__lt__") + F.size("__rt__") - inter
    jac = inter * 1.0 / union
    sz_a, sz_b = F.size("__lt__"), F.size("__rt__")
    ratio_ok = F.least(sz_a, sz_b) >= F.greatest(sz_a, sz_b) * F.lit(threshold) - 1e-9
    return (
        a.join(b.hint("merge"), [*by, "__lb__"])
        .where(ratio_ok)
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .drop("__lt__", "__rt__", "__lb__")
    )


def fuzzy_join_edit_distance(
    probe: DataFrame,
    corpus: DataFrame,
    probe_id: str,
    probe_text: str,
    corpus_id: str,
    corpus_text: str,
    max_dist: int = 2,
    q: int = 3,
    top_k_per_probe: int | None = None,
    broadcast_probe: bool | None = None,
    probe_gram_budget: int = 4_000_000,
) -> DataFrame:
    """Edit-distance join: (probe_id, corpus_id, dist) for all pairs
    with levenshtein ≤ ``max_dist`` — via LOSSLESS q-gram count
    filtering (Gravano et al., "Approximate string joins in a
    database", VLDB 2001).

    Candidate rule: strings within edit distance d share at least
        max(|x|, |y|) − q + 1 − q·d
    positional-free q-grams (each edit destroys ≤ q grams). Candidates
    come from ONE gram equi-join + a per-pair gram count filtered
    against that bound; exact levenshtein verifies survivors. When the
    bound is ≤ 0 the filter admits everything sharing one gram — keep
    d small relative to string length (the algorithm's documented
    regime), or the prefilter degenerates (still correct, just
    unselective).

    Scale: gram join cost ∝ Σ matched gram postings (zipf-bounded with
    a stopgram cap upstream if needed); the expensive O(|x|·|y|) DP
    runs only on count-qualified candidates. No cross join anywhere;
    the oracle twin runs the UNBLOCKED all-pairs distance so the hash
    match proves the bound loses nothing.

    EMISSION GUARD: on a near-dup-dense corpus the qualifying pair set
    itself grows ~quadratically (measured exp +1.35 at sf1 —
    output-bound, not plan-bound). ``top_k_per_probe`` keeps only each
    probe's k closest matches (dist ASC, corpus id ASC —
    deterministic), bounding output at k·|probe| rows; default off so
    the full relation stays oracle-provable.

    CONTRACT — ids must be unique: the gram stage carries ids only and
    aggregates shared-gram counts by (probe_id, corpus_id), then
    re-attaches texts by id. A duplicated id with DIFFERENT texts would
    merge gram counts across the duplicates and fan the re-attach out —
    silently wrong counts. Deduplicate on id upstream if your table can
    violate this (the old texts-in-the-gram-join shape tolerated
    duplicates, at corpus-broadcast cost).

    BROADCAST GUARD: the exploded probe gram frame is broadcast ONLY
    when the probe is provably small. ``broadcast_probe=None`` (default)
    runs one cheap aggregate over the probe — estimated gram rows
    (Σ max(len−q+1, 1)) must be ≤ ``probe_gram_budget`` (default 4M
    rows ≈ low hundreds of MB serialized) — because ``F.broadcast``
    bypasses autoBroadcastJoinThreshold and a forced broadcast of an
    unbounded probe is exactly the estimate-blind failure class the
    round-11 audit removed elsewhere. Pass True/False to skip the
    estimate when the caller already knows; the fallback is a
    merge-hinted shuffle join on the gram key (spillable at any
    scale).

    LAZINESS CAVEAT (ADVICE r12): with ``broadcast_probe=None`` the
    estimate is an EAGER Spark job at DataFrame-construction time, and
    the probe lineage is recomputed once more at execution — callers
    building plans without executing them (fingerprint/audit tooling)
    should pass an explicit True/False or rely on cached_plan_text to
    amortize; pipelines with an expensive probe derivation should
    checkpoint the probe before calling."""
    p = probe.select(
        F.col(probe_id).alias("pid"), F.col(probe_text).alias("ptxt")
    )
    c = corpus.select(
        F.col(corpus_id).alias("cid"), F.col(corpus_text).alias("ctxt")
    )

    def grams(col):
        # ALL positional q-grams, duplicates kept: the count bound is a
        # multiset statement, and the equi-join count Σ m_p(g)·m_c(g)
        # over-approximates the multiset intersection — conservative,
        # so the filter stays LOSSLESS even for strings with repeated
        # grams (a distinct-set join could undercount and drop a true
        # pair)
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(col) - (q - 1), F.lit(1))),
            lambda i: col.substr(i, F.lit(q)),
        )

    # Gram join carries IDS ONLY — text payloads never enter the
    # gram-keyed stage. The PROBE gram frame is the broadcast side:
    # it is bounded by the probe set (the query, like bm25's qterms),
    # while the corpus gram stream stays map-side — no corpus-scale
    # broadcast and no corpus-gram shuffle. Texts re-attach AFTER the
    # per-pair count: probe texts broadcast (probe-scale), corpus
    # texts via a merge join (corpus-scale side, spillable). Measured
    # at gen-sf1 vs the old texts-in-the-gram-join plan: same 22.2 M
    # output rows; the old plan's corpus-side broadcast is the
    # 100 TB killer this shape removes.
    if broadcast_probe is None:
        est_grams = p.select(
            F.coalesce(
                F.sum(F.greatest(F.length("ptxt") - (q - 1), F.lit(1))), F.lit(0)
            ).alias("n")
        ).first()["n"]
        broadcast_probe = int(est_grams) <= int(probe_gram_budget)
    pg = p.select("pid", F.explode(grams(F.col("ptxt"))).alias("g"))
    cg = c.select("cid", F.explode(grams(F.col("ctxt"))).alias("g"))
    if broadcast_probe:
        gram_join = cg.join(F.broadcast(pg), "g")
        p_side = F.broadcast(p)
    else:
        gram_join = cg.hint("merge").join(pg.hint("merge"), "g")
        p_side = p.hint("merge")
    shared = gram_join.groupBy("pid", "cid").agg(
        F.count(F.lit(1)).cast("long").alias("common")
    )
    cand = shared.join(p_side, "pid").join(c.hint("merge"), "cid")
    bound = (
        F.greatest(F.length("ptxt"), F.length("ctxt"))
        - F.lit(q - 1)
        - F.lit(q * max_dist)
    )
    cand = cand.where(F.col("common") >= F.greatest(bound, F.lit(1)))
    # Bounded verify: the 3-arg levenshtein (Spark 3.5+) runs a banded
    # O(max_dist · min(|x|,|y|)) DP with early abort and returns -1 past
    # the threshold — vs the full O(|x|·|y|) matrix of the 2-arg form.
    # Returned distances ≤ threshold are exact, so emitted rows are
    # byte-identical to the unbounded verify (oracle-provable).
    dist = F.levenshtein(F.col("ptxt"), F.col("ctxt"), threshold=int(max_dist))
    out = (
        cand.withColumn("dist", dist.cast("long"))
        .where((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("pid", "cid", "dist")
    )
    if top_k_per_probe is not None:
        wk = W.partitionBy("pid").orderBy(F.col("dist"), F.col("cid"))
        out = (
            out.withColumn("__rk", F.row_number().over(wk))
            .where(F.col("__rk") <= int(top_k_per_probe))
            .drop("__rk")
        )
    return out
