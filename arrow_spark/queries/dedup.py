"""Deduplication oracle queries over documents + embeddings.

Engine path: arrow_spark.llm.dedup. Every oracle reproduces the exact
same math in DuckDB SQL — including the MinHash/SimHash paths, which
run here on the PORTABLE md5-derived hash family
(functions/portable_hash.py) so DuckDB replays signatures, band bucket
keys, and candidate joins hash-for-hash (xxhash64 remains each
operator's throughput default outside the registry queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.llm.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    jaccard_near_dup_pairs,
    minhash_near_dups,
    near_dup_clusters,
    simhash_signatures,
)
from arrow_spark.queries.base import query

EXACT_DEDUP_ORACLE = """
SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
       min(doc_id) AS keeper,
       count(*)    AS n_copies
FROM documents
GROUP BY 1
"""


@query("dedup_exact", oracle=EXACT_DEDUP_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exact dedup on normalized content hash (keep min doc_id)."""
    return exact_dedup(table(spark, sf_dir, "documents"))


JACCARD_ORACLE = """
WITH d AS (
  SELECT doc_id AS id, lang,
         list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS toks
  FROM documents
)
SELECT a.id AS id_a, b.id AS id_b,
       floor((len(list_intersect(a.toks, b.toks)) * 1.0
              / len(list_distinct(list_concat(a.toks, b.toks)))) * 1e6 + 0.5) / 1e6 AS jaccard
FROM d a JOIN d b ON a.lang = b.lang AND a.id < b.id
WHERE (len(list_intersect(a.toks, b.toks)) * 1.0
       / len(list_distinct(list_concat(a.toks, b.toks)))) >= 0.5
"""


@query("dedup_jaccard_pairs", oracle=JACCARD_ORACLE)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token-set Jaccard near-dup pairs, blocked by language."""
    return jaccard_near_dup_pairs(
        table(spark, sf_dir, "documents"), threshold=0.5, block_cols=("lang",)
    )


def _minhash_band_ctes(num_hashes: int, bands: int) -> str:
    """DuckDB CTE block replaying llm.dedup._band_signatures with the
    PORTABLE hash family hash-for-hash: shingle sets (`sh`) → seeded
    60-bit base hash → affine mixes mod MINHASH_PRIME → per-doc mins
    (the signature) → per-band md5 bucket keys (`bands`). Expects a CTE
    named ``sh`` (id, sh) upstream; emits CTEs ``hashed``, ``sig``,
    ``bands``."""
    from arrow_spark.llm.dedup import MINHASH_PRIME, _minhash_constants

    a, b = _minhash_constants(num_hashes)
    r = num_hashes // bands
    hcols = ",\n         ".join(
        f"min(({a[i]} * base + {b[i]}) % {MINHASH_PRIME}) AS h{i}"
        for i in range(num_hashes)
    )
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT id, {bi} AS band, md5(concat_ws('_', "
        + ", ".join(f"h{bi * r + j}" for j in range(r))
        + ")) AS bsig FROM sig"
        for bi in range(bands)
    )
    return f"""hashed AS (
  SELECT id, ('0x' || substr(md5('0:' || s), 1, 15))::BIGINT % {1 << 31} AS base
  FROM (SELECT id, unnest(sh) AS s FROM sh)
), sig AS (
  SELECT id,
         {hcols}
  FROM hashed GROUP BY id
), bands AS (
  {band_rows}
)"""


#: shingle-set CTE shared by the minhash oracles (identical arithmetic
#: to llm.dedup.shingles: word 3-grams, whole text when < 3 tokens).
_SHINGLE_CTE = """d AS (
  SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
), sh AS (
  SELECT id,
         CASE WHEN len(toks) >= 3 THEN
           list_distinct(list_transform(range(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
         ELSE [list_aggregate(toks, 'string_agg', ' ')] END AS sh
  FROM d
)"""


def _minhash_lsh_oracle(num_hashes: int = 16, bands: int = 4) -> str:
    return f"""
WITH {_SHINGLE_CTE}, {_minhash_band_ctes(num_hashes, bands)},
cands AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig AND a.id < b.id
), scored AS (
  SELECT id_a, id_b,
         floor((len(list_intersect(sa.sh, sb.sh)) * 1.0
                / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))))
               * 1e6 + 0.5) / 1e6 AS jaccard
  FROM cands JOIN sh sa ON id_a = sa.id JOIN sh sb ON id_b = sb.id
)
SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.5
"""


@query("dedup_minhash_lsh", oracle=_minhash_lsh_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs verified by shingle Jaccard, with the
    PORTABLE hash family: the DuckDB oracle replays the ENTIRE pipeline
    — base hash, affine signature mixes mod the Mersenne prime, band
    md5 bucket keys, candidate equi-join, exact verify — so both the
    candidate set and the scores are hash-checked (xxhash64 stays the
    throughput default; recall vs exact Jaccard is also unit-tested)."""
    return minhash_near_dups(
        table(spark, sf_dir, "documents"), threshold=0.5, num_hashes=16, bands=4,
        hash_family="portable",
    )


def _simhash_oracle(bits: int = 48) -> str:
    votes = ",\n         ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(bits)
    )
    chars = ", ".join(
        f"CASE WHEN b{i} > 0 THEN '1' ELSE '0' END" for i in range(bits)
    )
    return f"""
WITH t AS (
  SELECT doc_id AS id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents
), h AS (
  SELECT id, ('0x' || substr(md5('0:' || tok), 1, 15))::BIGINT AS h FROM t
), v AS (
  SELECT id,
         {votes}
  FROM h GROUP BY id
)
SELECT id, concat({chars}) AS simhash FROM v
"""


@query("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """48-bit SimHash fingerprints per document from the PORTABLE hash:
    the oracle replays every per-token bit vote, so the exact
    fingerprint string is hash-checked (the 64-bit xxhash64 family stays
    the throughput default; hamming-distance properties unit-tested)."""
    return simhash_signatures(
        table(spark, sf_dir, "documents"), bits=48, hash_family="portable"
    )


# Transitive closure of the (already-oracle-checked) Jaccard pair set:
# DuckDB's recursive CTE plays the naive-reference role for the
# distributed iterative min-label algorithm — a genuinely different
# formulation, so the hash match also cross-checks the iteration.
CLUSTERS_ORACLE = """
WITH RECURSIVE d AS (
  SELECT doc_id AS id, lang,
         list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS toks
  FROM documents
), pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM d a JOIN d b ON a.lang = b.lang AND a.id < b.id
  WHERE (len(list_intersect(a.toks, b.toks)) * 1.0
         / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))) >= 0.5
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), reach(v, r) AS (
  SELECT a, b FROM edges
  UNION
  SELECT reach.v, edges.b FROM reach JOIN edges ON reach.r = edges.a
)
SELECT doc_id,
       coalesce(comp.c, doc_id)            AS cluster_id,
       coalesce(comp.c, doc_id) = doc_id   AS is_keeper
FROM documents
LEFT JOIN (SELECT v, least(min(r), v) AS c FROM reach GROUP BY v) comp
  ON doc_id = comp.v
"""


@query("dedup_clusters", oracle=CLUSTERS_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clustering: connected components over the
    lang-blocked exact-Jaccard pair graph; every doc assigned a cluster,
    keeper = min doc_id (the row to retain in the deduplicated corpus).
    pair_source='exact' — this is the oracle verifier for the LSH-fed
    default (dedup_clusters_lsh), which is the 100 TB entry point."""
    return near_dup_clusters(
        table(spark, sf_dir, "documents"),
        threshold=0.5,
        block_cols=("lang",),
        pair_source="exact",
    )


EMB_NEAR_DUP_ORACLE = """
WITH d AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.id AS id_a, b.id AS id_b,
       floor(list_cosine_similarity(a.v, b.v) * 1e6 + 0.5) / 1e6 AS cos
FROM d a JOIN d b ON a.id < b.id
WHERE floor(list_cosine_similarity(a.v, b.v) * 1e6 + 0.5) / 1e6 >= 0.95
"""


@query("dedup_embedding_cosine", oracle=EMB_NEAR_DUP_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embedding-cosine near-dup pairs above 0.95, LSH-blocked: the
    oracle is the all-pairs SQL, so the hash match proves the seeded
    multi-table hyperplane blocking loses no qualifying pair on the
    fixture (equality with the exact form also unit-tested on planted
    near-dups; no-CartesianProduct plan-pinned)."""
    return embedding_near_dup_pairs(table(spark, sf_dir, "embeddings"), threshold=0.95)


EMB_TOPK_ORACLE = """
WITH d AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         floor(list_cosine_similarity(a.v, b.v) * 1e6 + 0.5) / 1e6 AS cos
  FROM d a JOIN d b ON a.id < b.id
  WHERE floor(list_cosine_similarity(a.v, b.v) * 1e6 + 0.5) / 1e6 >= 0.95
)
SELECT id_a, id_b, cos
FROM pairs
QUALIFY row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) <= 3
"""


@query("dedup_embedding_topk", oracle=EMB_TOPK_ORACLE)
def dedup_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The emission-GUARDED embedding near-dup relation a 100 TB
    pipeline should run: same LSH-blocked plan as
    dedup_embedding_cosine, plus top_k_per_id=3 — each id_a keeps its 3
    most-similar partners (rounded cos DESC, id_b ASC, deterministic),
    bounding output at 3n rows on a near-dup-dense corpus where the
    full qualifying relation is quadratic (measured rows exp +2.00
    sf1→sf3, SCALE.md second-decade sweep). The oracle expresses the
    cap as the identical rank cut (QUALIFY row_number) over the
    unblocked all-pairs relation — the hash match proves hyperplane
    blocking losslessness AND the guard semantics together, mirroring
    dedup_containment_capped / fuzzy_join_topk."""
    return embedding_near_dup_pairs(
        table(spark, sf_dir, "embeddings"), threshold=0.95, top_k_per_id=3
    )


EMB_TOPK_DENSE_ORACLE = """
WITH d AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         floor(list_cosine_similarity(a.v, b.v) * 1e6 + 0.5) / 1e6 AS cos
  FROM d a JOIN d b ON a.id < b.id
  WHERE floor(list_cosine_similarity(a.v, b.v) * 1e6 + 0.5) / 1e6 >= 0.40
)
SELECT id_a, id_b, cos
FROM pairs
QUALIFY row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) <= 3
"""


@query("dedup_embedding_topk_dense", oracle=EMB_TOPK_DENSE_ORACLE)
def dedup_embedding_topk_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NON-VACUOUS twin of dedup_embedding_topk (VERDICT r12 "what's
    wrong #3"): the sf0.01 fixture's max pairwise cosine is 0.513, so
    both 0.95-threshold driver greens are 0 = 0 rows — true, but silent
    on LSH losslessness and guard semantics. This twin runs the SAME
    plan (multi-table hyperplane LSH blocking + top_k_per_id rank cut)
    at threshold 0.40, which the fixture's cosine distribution makes
    NON-EMPTY at every driver-checked scale, against the identical
    unblocked all-pairs QUALIFY oracle — the hash match now actually
    exercises blocking recall and the deterministic (cos DESC, id_b)
    tie-break on real rows. Registering it immediately caught a real
    hole: at t=0.40 the per-plane collision probability is 0.631, so
    the production (12 tables, 8 planes) defaults capture only 17/59
    qualifying pairs — hence n_planes=2 + target_miss=1e-6, the
    threshold-aware table solve (T = ceil(ln 1e-6 / ln(1−0.631²)) = 28
    tables, per-pair miss bound 2.4e-7; planes are SEEDED, so capture
    on the fixed fixture is deterministic, not flaky). The 0.95
    production queries stay registered as the thresholds a pipeline
    would run; this one keeps their mechanism honestly verified."""
    return embedding_near_dup_pairs(
        table(spark, sf_dir, "embeddings"),
        threshold=0.40,
        top_k_per_id=3,
        n_planes=2,
        target_miss=1e-6,
    )


def _clusters_lsh_oracle(num_hashes: int = 16, bands: int = 4) -> str:
    return f"""
WITH RECURSIVE {_SHINGLE_CTE}, {_minhash_band_ctes(num_hashes, bands)},
cands AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig AND a.id < b.id
), pairs AS (
  SELECT id_a, id_b
  FROM cands JOIN sh sa ON id_a = sa.id JOIN sh sb ON id_b = sb.id
  WHERE floor((len(list_intersect(sa.sh, sb.sh)) * 1.0
               / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))))
              * 1e6 + 0.5) / 1e6 >= 0.5
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), reach(v, r) AS (
  SELECT a, b FROM edges
  UNION
  SELECT reach.v, edges.b FROM reach JOIN edges ON reach.r = edges.a
)
SELECT doc_id,
       coalesce(comp.c, doc_id)            AS cluster_id,
       coalesce(comp.c, doc_id) = doc_id   AS is_keeper
FROM documents
LEFT JOIN (SELECT v, least(min(r), v) AS c FROM reach GROUP BY v) comp
  ON doc_id = comp.v
"""


@query("dedup_clusters_lsh", oracle=_clusters_lsh_oracle())
def dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB clustering path — near_dup_clusters' DEFAULT entry point:
    connected components over minhash-LSH verified candidate pairs
    (candidate generation is an equi-join, never all-pairs). With the
    PORTABLE hash family the oracle replays signature → bands →
    candidates → verify in SQL and closes the pair graph with a
    recursive CTE — the distributed min-label iteration is hash-checked
    end to end against a genuinely different formulation."""
    return near_dup_clusters(
        table(spark, sf_dir, "documents"), threshold=0.5, hash_family="portable"
    )


FUZZY_JOIN_ORACLE = """
WITH t AS (
  SELECT doc_id,
         string_split_regex(trim(lower(text)), '\\s+') AS raw
  FROM documents
), corpus AS (
  SELECT doc_id, list_distinct(raw) AS toks FROM t
), probe AS (
  SELECT doc_id AS probe_id,
         list_distinct(list_slice(raw, 1, greatest(len(raw) - 5, 1))) AS ptoks
  FROM t WHERE doc_id % 7 = 0
), pairs AS (
  SELECT probe_id, doc_id,
         len(list_intersect(ptoks, toks)) * 1.0
           / (len(ptoks) + len(toks) - len(list_intersect(ptoks, toks))) AS j
  FROM probe, corpus
)
SELECT probe_id, doc_id, floor(j * 1e6 + 0.5) / 1e6 AS jaccard
FROM pairs WHERE j >= 0.5
"""


@query("fuzzy_join_entity_match", oracle=FUZZY_JOIN_ORACLE)
def fuzzy_join_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cross-table entity matching: truncated probe texts (last 5 tokens
    dropped) fuzzy-joined back to the corpus at Jaccard ≥ 0.5. The
    engine path is the length-blocked equi-join
    (operators/fuzzyjoin.py); the oracle is the unblocked quadratic
    form, so the hash proves blocking is result-invariant."""
    from arrow_spark.operators.fuzzyjoin import fuzzy_join
    from arrow_spark.llm.dedup import tokens as _tokens

    d = table(spark, sf_dir, "documents")
    raw = _tokens(F.col("text"))
    probe = d.where(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("probe_id"),
        F.array_join(
            F.slice(raw, 1, F.greatest(F.size(raw) - 5, F.lit(1))), " "
        ).alias("probe_text"),
    )
    corpus = d.select("doc_id", "text")
    out = fuzzy_join(probe, corpus, "probe_text", "text", threshold=0.5)
    return out.select(
        "probe_id",
        "doc_id",
        (F.floor(F.col("jaccard") * 1e6 + F.lit(0.5)) / 1e6).alias("jaccard"),
    )


def _fuzzy_lsh_oracle(num_hashes: int = 16, bands: int = 4) -> str:
    # `sh` here is TOKEN sets (fuzzy_join_lsh signs whole token sets, not
    # shingles); both sides union into one tagged frame exactly as the
    # Spark pipeline does, then the same band CTEs replay the signatures
    return f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS raw
  FROM documents
), sh AS (
  SELECT 'L:' || doc_id::VARCHAR AS id,
         list_distinct(list_slice(raw, 1, greatest(len(raw) - 5, 1))) AS sh
  FROM t WHERE doc_id % 7 = 0
  UNION ALL
  SELECT 'R:' || doc_id::VARCHAR AS id, list_distinct(raw) AS sh FROM t
), {_minhash_band_ctes(num_hashes, bands)},
cands AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig AND a.id < b.id
  WHERE a.id LIKE 'L:%' AND b.id LIKE 'R:%'
), scored AS (
  SELECT substr(id_a, 3) AS probe_id, substr(id_b, 3) AS doc_id,
         floor((len(list_intersect(sa.sh, sb.sh)) * 1.0
                / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))))
               * 1e6 + 0.5) / 1e6 AS jaccard
  FROM cands JOIN sh sa ON id_a = sa.id JOIN sh sb ON id_b = sb.id
)
SELECT probe_id, doc_id, jaccard FROM scored WHERE jaccard >= 0.5
"""


@query("fuzzy_join_lsh_match", oracle=_fuzzy_lsh_oracle())
def fuzzy_join_lsh_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scale path of fuzzy_join_entity_match: the same truncated probes
    matched through MinHash-banded candidates (two shuffles, candidate
    volume bounded by band buckets — never bucket-quadratic like the
    length-blocked exact form, which remains the recall gate). With the
    PORTABLE hash family the oracle replays the tagged union-side
    signature pipeline and the cross-side candidate join exactly, so
    the approximate matcher's own output is hash-checked."""
    from arrow_spark.operators.fuzzyjoin import fuzzy_join_lsh
    from arrow_spark.llm.dedup import tokens as _tokens

    d = table(spark, sf_dir, "documents")
    raw = _tokens(F.col("text"))
    probe = d.where(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("probe_id"),
        F.array_join(
            F.slice(raw, 1, F.greatest(F.size(raw) - 5, F.lit(1))), " "
        ).alias("probe_text"),
    )
    corpus = d.select("doc_id", "text")
    return fuzzy_join_lsh(
        probe, corpus, "probe_id", "probe_text", "doc_id", "text", threshold=0.5,
        hash_family="portable",
    )


MATCH_ASSIGN_ORACLE = f"""
WITH scored AS ({FUZZY_JOIN_ORACLE})
SELECT probe_id, doc_id, jaccard FROM (
  SELECT probe_id, doc_id, jaccard,
         ROW_NUMBER() OVER (PARTITION BY probe_id
                            ORDER BY jaccard DESC, doc_id ASC) AS lr,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY jaccard DESC, probe_id ASC) AS rr
  FROM scored
) WHERE lr = 1 AND rr = 1
"""


@query("fuzzy_match_assignment", oracle=MATCH_ASSIGN_ORACLE)
def fuzzy_match_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """entity-resolution assignment: the many-to-many fuzzy-join pairs
    reduced to a 1:1 matching by mutual-best argmax (each side the
    other's top score; ties to the smallest partner id) — two window
    Exchanges over the candidate set (operators/linkage.py), never a
    corpus shuffle. Scores are snapped to 1e-6 BEFORE ranking so the
    ordering key is cross-engine identical and the whole assignment is
    hash-exact."""
    from arrow_spark.operators.fuzzyjoin import fuzzy_join
    from arrow_spark.operators.linkage import mutual_best_match
    from arrow_spark.llm.dedup import tokens as _tokens

    d = table(spark, sf_dir, "documents")
    raw = _tokens(F.col("text"))
    probe = d.where(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("probe_id"),
        F.array_join(
            F.slice(raw, 1, F.greatest(F.size(raw) - 5, F.lit(1))), " "
        ).alias("probe_text"),
    )
    corpus = d.select("doc_id", "text")
    pairs = fuzzy_join(probe, corpus, "probe_text", "text", threshold=0.5).select(
        "probe_id",
        "doc_id",
        (F.floor(F.col("jaccard") * 1e6 + F.lit(0.5)) / 1e6).alias("jaccard"),
    )
    return mutual_best_match(pairs, "probe_id", "doc_id", "jaccard")


INCREMENTAL_ORACLE = """
WITH d AS (
  SELECT doc_id AS id, lang,
         string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
), sh AS (
  SELECT id, lang,
         CASE WHEN len(toks) >= 3 THEN
           list_distinct(list_transform(range(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
         ELSE [list_aggregate(toks, 'string_agg', ' ')] END AS sh
  FROM d
), scored AS (
  SELECT a.id AS new_id, b.id AS dup_of,
         floor((len(list_intersect(a.sh, b.sh)) * 1.0
                / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))))
               * 1e6 + 0.5) / 1e6 AS jaccard
  FROM sh a JOIN sh b ON a.lang = b.lang
  WHERE a.id % 5 = 0 AND b.id % 5 != 0
)
SELECT new_id, dup_of, jaccard FROM scored WHERE jaccard >= 0.5
"""


@query("dedup_incremental", oracle=INCREMENTAL_ORACLE)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """incremental ingest dedup, oracle-gating path: documents with
    doc_id % 5 == 0 play the incoming batch, the rest the accepted
    corpus; candidates are all (new × corpus) pairs within lang
    (recall 1 by construction) exact-verified by shingle Jaccard, so
    DuckDB can replay the identical pair set. dedup_incremental_lsh_store
    is the scale path this gates — same verify arithmetic, candidates
    from the persisted band-signature store instead of blocked
    all-pairs."""
    from arrow_spark.llm.dedup import incremental_near_dups

    docs = table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    batch = docs.where(F.col("doc_id") % 5 == 0)
    return incremental_near_dups(
        batch,
        None,
        corpus,
        threshold=0.5,
        candidate_source="exact",
        block_cols=("lang",),
    )


def _incremental_lsh_oracle(num_hashes: int = 16, bands: int = 4) -> str:
    # band signatures are per-document, so building them over ALL
    # documents and splitting batch/corpus afterwards replays the
    # store-probe equi-join exactly
    return f"""
WITH {_SHINGLE_CTE}, {_minhash_band_ctes(num_hashes, bands)},
cands AS (
  SELECT DISTINCT n.id AS new_id, o.id AS dup_of
  FROM bands n JOIN bands o ON n.band = o.band AND n.bsig = o.bsig
  WHERE n.id % 5 = 0 AND o.id % 5 != 0
), scored AS (
  SELECT new_id, dup_of,
         floor((len(list_intersect(sa.sh, sb.sh)) * 1.0
                / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))))
               * 1e6 + 0.5) / 1e6 AS jaccard
  FROM cands JOIN sh sa ON new_id = sa.id JOIN sh sb ON dup_of = sb.id
)
SELECT new_id, dup_of, jaccard FROM scored WHERE jaccard >= 0.5
"""


@query("dedup_incremental_lsh_store", oracle=_incremental_lsh_oracle())
def dedup_incremental_lsh_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """incremental ingest dedup, scale path: the batch's band signatures
    probe the corpus's persisted signature store by (band, bsig)
    equi-join and candidates are exact-verified by shingle Jaccard. With
    the PORTABLE hash family the oracle replays the store build AND the
    probe join, so the scale path is hash-checked directly (previously
    only its containment in the exact all-pairs set was pinned in
    tests/test_llm_ops.py; dedup_incremental stays the exact-path
    gate)."""
    from arrow_spark.llm.dedup import band_signature_store, incremental_near_dups

    docs = table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    batch = docs.where(F.col("doc_id") % 5 == 0)
    store = band_signature_store(corpus, num_hashes=16, bands=4, hash_family="portable")
    return incremental_near_dups(
        batch, store, corpus, threshold=0.5, num_hashes=16, bands=4,
        hash_family="portable",
    )


CLUSTERS_QUALITY_ORACLE = """
WITH RECURSIVE d AS (
  SELECT doc_id AS id, lang,
         list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS toks
  FROM documents
), pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM d a JOIN d b ON a.lang = b.lang AND a.id < b.id
  WHERE (len(list_intersect(a.toks, b.toks)) * 1.0
         / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))) >= 0.5
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), reach(v, r) AS (
  SELECT a, b FROM edges
  UNION
  SELECT reach.v, edges.b FROM reach JOIN edges ON reach.r = edges.a
), assigned AS (
  SELECT doc_id, n_chars, coalesce(comp.c, doc_id) AS cluster_id
  FROM documents
  LEFT JOIN (SELECT v, least(min(r), v) AS c FROM reach GROUP BY v) comp
    ON doc_id = comp.v
), ranked AS (
  SELECT cluster_id, doc_id AS keeper,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM assigned
), best AS (
  SELECT cluster_id, keeper FROM ranked WHERE rn = 1
)
SELECT a.doc_id, a.cluster_id, a.doc_id = b.keeper AS is_keeper
FROM assigned a JOIN best b USING (cluster_id)
"""


@query("dedup_clusters_quality_keeper", oracle=CLUSTERS_QUALITY_ORACLE)
def dedup_clusters_quality_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality-aware keeper selection: within each transitive near-dup
    cluster, keep the LONGEST document (n_chars argmax, ties to min
    doc_id) instead of the min id — the 'retain the best copy' shape
    real pipelines use. One extra cluster-keyed max_by aggregate over
    the min-id variant; the oracle replays the same argmax in SQL."""
    return near_dup_clusters(
        table(spark, sf_dir, "documents"),
        threshold=0.5,
        block_cols=("lang",),
        pair_source="exact",
        keeper_by="n_chars",
    )


NGRAM_SPANS_ORACLE = """
WITH d AS (
  SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
), w AS (
  SELECT id, unnest(
    CASE WHEN len(toks) >= 20 THEN
      list_transform(range(1, len(toks) - 18),
        i -> list_aggregate(toks[i:i+19], 'string_agg', ' '))
    ELSE [list_aggregate(toks, 'string_agg', ' ')] END) AS gram
  FROM d
), g AS (
  SELECT id, gram, count(*) AS k FROM w GROUP BY 1, 2
), tot AS (
  SELECT gram, sum(k) AS tot FROM g GROUP BY 1
)
SELECT id AS doc_id,
       sum(k)::BIGINT AS n_windows,
       sum(CASE WHEN tot >= 2 THEN k ELSE 0 END)::BIGINT AS n_dup_windows,
       floor(sum(CASE WHEN tot >= 2 THEN k ELSE 0 END) * 1.0 / sum(k) * 1e6 + 0.5)
         / 1e6 AS dup_fraction
FROM g JOIN tot USING (gram)
GROUP BY id
"""


@query("dedup_ngram_spans", oracle=NGRAM_SPANS_ORACLE)
def dedup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exact-substring duplication profile (Lee et al. 2022 window
    dedup): fraction of each document's 20-token windows that occur ≥ 2
    times in the corpus. The engine aggregates on xxhash64(gram) (8-byte
    shuffle keys — the 100 TB path); the oracle groups by the gram
    STRING, so the hash match simultaneously proves the hashed plan is
    collision-free on this corpus."""
    from arrow_spark.llm.dedup import duplicate_ngram_spans

    return duplicate_ngram_spans(table(spark, sf_dir, "documents"), window=20)


EXCISE_SPANS_ORACLE = """
WITH d AS (
  SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
), w AS (
  SELECT id, len(toks) AS n_toks, gs.pos, gs.gram
  FROM d, LATERAL (
    SELECT unnest(range(0, CASE WHEN len(toks) >= 20
                                THEN len(toks) - 19 ELSE 1 END)) AS pos,
           unnest(CASE WHEN len(toks) >= 20 THEN
                    list_transform(range(1, len(toks) - 18),
                      i -> list_aggregate(toks[i:i+19], 'string_agg', ' '))
                  ELSE [list_aggregate(toks, 'string_agg', ' ')] END) AS gram
  ) gs
), ranked AS (
  SELECT id, n_toks, pos,
         row_number() OVER (PARTITION BY gram ORDER BY id, pos) AS rn
  FROM w
), dropped AS (
  SELECT DISTINCT id,
         unnest(range(pos, pos + CASE WHEN n_toks >= 20 THEN 20 ELSE n_toks END)) AS tp
  FROM ranked WHERE rn > 1
), tok_stream AS (
  SELECT id, gs.tp, gs.tok
  FROM d, LATERAL (
    SELECT unnest(range(0, len(toks))) AS tp, unnest(toks) AS tok
  ) gs
), kept AS (
  SELECT t.id, t.tp, t.tok
  FROM tok_stream t ANTI JOIN dropped USING (id, tp)
), rebuilt AS (
  SELECT id,
         list_aggregate(list_transform(
           list_sort(list({'tp': tp, 'tok': tok})), s -> s.tok),
           'string_agg', ' ') AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY id
)
SELECT d.id AS doc_id,
       coalesce(rebuilt.clean_text, '') AS clean_text,
       len(d.toks)::BIGINT AS n_tokens,
       (len(d.toks) - coalesce(rebuilt.n_kept, 0))::BIGINT AS n_dropped
FROM d LEFT JOIN rebuilt ON d.id = rebuilt.id
"""


@query("dedup_excise_spans", oracle=EXCISE_SPANS_ORACLE)
def dedup_excise_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window-dedup EXCISION (the other half of dedup_ngram_spans):
    every duplicated 20-token window keeps only its canonical first
    occurrence; covered tokens elsewhere are dropped and the cleaned
    text reassembled in order. The engine ranks occurrences per
    xxhash64(gram); the oracle ranks per gram STRING and rebuilds the
    text with the same ordered fold — hash-equal output proves both the
    hashed plan and the reassembly byte-exact."""
    from arrow_spark.llm.dedup import excise_duplicate_spans

    return excise_duplicate_spans(table(spark, sf_dir, "documents"), window=20)


_SHINGLE_EN_CTE = _SHINGLE_CTE.replace(
    "FROM documents", "FROM documents\n  WHERE lang = 'en'"
)


def _lsh_eval_oracle(num_hashes: int = 16, bands: int = 4) -> str:
    """Replay candidates AND exact truth, then the pair-set confusion
    counts — precision/recall of the band plan, hash-exact."""
    return f"""
WITH {_SHINGLE_EN_CTE}, {_minhash_band_ctes(num_hashes, bands)},
cands AS (
  SELECT DISTINCT a.id AS pa, b.id AS pb
  FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig AND a.id < b.id
), truth AS (
  SELECT a.id AS pa, b.id AS pb
  FROM sh a JOIN sh b ON a.id < b.id
  WHERE (len(list_intersect(a.sh, b.sh)) * 1.0
         / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))) >= 0.5
), j AS (
  SELECT coalesce(c.pa, t.pa) AS pa, coalesce(c.pb, t.pb) AS pb,
         c.pa IS NOT NULL AS in_p, t.pa IS NOT NULL AS in_t
  FROM cands c FULL OUTER JOIN truth t ON c.pa = t.pa AND c.pb = t.pb
), m AS (
  SELECT CAST(sum(CASE WHEN in_p AND in_t THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN in_p AND NOT in_t THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN NOT in_p AND in_t THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM j
)
SELECT tp, fp, fn,
       CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision,
       CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS recall,
       2.0 * CAST(tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) AS f1
FROM m
"""


@query("dedup_eval_lsh_recall", oracle=_lsh_eval_oracle())
def dedup_eval_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """the dedup-evaluation harness: precision/recall/F1 of the banded
    MinHash CANDIDATE set against exact shingle-Jaccard ≥ 0.5 truth
    (lang='en' slice; the truth side is the lossless length-blocked
    all-pairs — the oracle recomputes it unblocked, proving the blocking
    drops nothing). The numbers that justify a band plan before running
    it on 100 TB."""
    from arrow_spark.llm.dedup import (
        minhash_lsh_candidates,
        pair_set_metrics,
        shingle_sets,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("lang") == "en")
    pred = minhash_lsh_candidates(
        docs, num_hashes=16, bands=4, hash_family="portable"
    ).select(F.col("id_a"), F.col("id_b"))
    ss = shingle_sets(docs)
    a, b = ss.alias("a"), ss.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    truth = (
        a.join(
            b,
            (F.col("a.id") < F.col("b.id"))
            # lossless length blocking at t=0.5: J >= t needs the sizes
            # within a factor of 2 of each other
            & (F.size(F.col("a.sh")) * 2 >= F.size(F.col("b.sh")))
            & (F.size(F.col("b.sh")) * 2 >= F.size(F.col("a.sh"))),
        )
        .where((inter / union) >= 0.5)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    return pair_set_metrics(pred, truth)


def _semdedup_oracle(k: int = 16, iters: int = 2, thresh: str = "0.95") -> str:
    """SemDeDup replay: the pinned-Lloyd cluster CTEs (shared with the
    IVF replay) + within-cluster integer-cosine pairs + keep-lowest-id
    pruning — every centroid, assignment, cosine, and keep decision
    hash-checked."""
    from arrow_spark.queries.similarity import _DIMS, _lloyd_ctes

    d = _DIMS
    dot = (
        f"list_reduce(list_transform(range(1, {d} + 1), i -> va.e[i] * vb.e[i]),"
        " (x, y) -> x + y)"
    )
    na = (
        f"list_reduce(list_transform(range(1, {d} + 1), i -> va.e[i] * va.e[i]),"
        " (x, y) -> x + y)"
    )
    nb = (
        f"list_reduce(list_transform(range(1, {d} + 1), i -> vb.e[i] * vb.e[i]),"
        " (x, y) -> x + y)"
    )
    parts = _lloyd_ctes(k, iters)
    parts.append(f"""pcos AS (
  SELECT a.vec_id AS ida, b.vec_id AS idb,
         CAST({dot} AS DOUBLE)
           / (sqrt(CAST({na} AS DOUBLE)) * sqrt(CAST({nb} AS DOUBLE))) AS cos
  FROM a{iters} a JOIN a{iters} b
       ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN e va ON va.vec_id = a.vec_id
  JOIN e vb ON vb.vec_id = b.vec_id
), dups AS (
  SELECT idb AS vec_id, min(ida) AS dup_of
  FROM pcos WHERE cos >= {thresh} GROUP BY idb
)""")
    return "WITH " + ",\n".join(parts) + f"""
SELECT a.vec_id, a.cid, d.vec_id IS NULL AS keep, d.dup_of
FROM a{iters} a LEFT JOIN dups d USING (vec_id)
"""


@query("dedup_semantic_prune", oracle=_semdedup_oracle())
def dedup_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space, then
    within each cluster drop every vector that has a LOWER-id neighbor
    with cosine ≥ 0.95 — semantic near-duplicate pruning whose candidate
    set is the data-adaptive clustering rather than oblivious LSH
    hyperplanes (the failure mode dedup_embedding_cosine can miss).

    Exactness: milli-snapped embeddings through the pinned 2-iteration
    Lloyd assignment (the similarity_ivf_exact_replay machinery, k=16),
    integer dot/norm folds, one double division per pair — assignment,
    cosine, keep flag, and dup_of all hash-match the DuckDB replay.

    Scale: pair generation is within-cluster only (never corpus²) —
    with k ∝ corpus size the per-cluster population stays bounded, and
    clusters above a size cap would be re-clustered recursively (the
    SemDeDup paper's sharding); kept here at bench-verifiable k."""
    from arrow_spark.queries.similarity import pinned_lloyd

    emb = (
        table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.transform(
                "embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")
            ).alias("e"),
        )
        .localCheckpoint()
    )
    assign, _ = pinned_lloyd(emb, k=16, iters=2)
    a = assign.select(
        F.col("vec_id").alias("ida"), F.col("cid"), F.col("e").alias("ea")
    )
    b = assign.select(
        F.col("vec_id").alias("idb"), F.col("cid"), F.col("e").alias("eb")
    )
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )

    def _norm(col):
        return F.sqrt(
            F.aggregate(
                F.transform(col, lambda x: x * x),
                F.lit(0).cast("long"),
                lambda acc, t: acc + t,
            ).cast("double")
        )

    # SHUFFLE-HASH, not broadcast (r13 gate-hardening find): both join
    # sides are the FULL corpus assignment, but the localCheckpoint leaf
    # hides the corpus lineage from Catalyst AND from the broadcast
    # audit (the build subtree is just Scan ExistingRDD), so the
    # preserved fixture-scale estimate elected a corpus-scale broadcast
    # — the r11 excise-OOM class, invisible to the r12 gate. The hint
    # keeps the within-cluster pair join shuffled on cid: build side =
    # per-partition cluster slice, bounded by corpus/partitions,
    # spillable — and array-carrying rows are never sort-buffered (the
    # r12 containment SMJ lesson).
    pairs = a.join(b.hint("shuffle_hash"), ["cid"]).where(F.col("ida") < F.col("idb"))
    pcos = pairs.select(
        "ida", "idb",
        (dot.cast("double") / (_norm(F.col("ea")) * _norm(F.col("eb")))).alias("cos"),
    )
    dups = (
        pcos.where(F.col("cos") >= 0.95)
        .groupBy(F.col("idb").alias("vec_id"))
        .agg(F.min("ida").alias("dup_of"))
    )
    return (
        assign.select("vec_id", "cid")
        .join(dups, "vec_id", "left")
        .select(
            "vec_id", "cid", F.col("dup_of").isNull().alias("keep"), "dup_of"
        )
    )


PREFIX_FILTER_ORACLE = """
WITH d AS (
  SELECT doc_id AS id, lang,
         list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS toks
  FROM documents
)
SELECT a.id AS id_a, b.id AS id_b,
       floor((len(list_intersect(a.toks, b.toks)) * 1.0
              / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))))
             * 1e6 + 0.5) / 1e6 AS jaccard
FROM d a JOIN d b ON a.lang = b.lang AND a.id < b.id
WHERE len(list_intersect(a.toks, b.toks)) * 1000
      >= 500 * (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
"""


@query("dedup_prefix_filter_pairs", oracle=PREFIX_FILTER_ORACLE)
def dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard ≥ 0.5 pairs via PPJoin prefix filtering (candidates =
    equi-join on each record's rarest-token prefix, never corpus² and
    immune to the frequent-token blowup of naive token joins). The
    oracle is the UNBLOCKED all-pairs Jaccard with the same integer
    cross-multiplied threshold — the hash match is the losslessness
    proof for the prefix plan (the dedup_jaccard_pairs pattern with a
    sharper candidate generator)."""
    from arrow_spark.llm.dedup import prefix_filter_jaccard_pairs

    return prefix_filter_jaccard_pairs(
        table(spark, sf_dir, "documents"), threshold=0.5, block_cols=("lang",)
    )


EDIT_JOIN_ORACLE = """
WITH probes AS (
  SELECT p_partkey AS pid,
         substr(p_name, 1, 3) || '#' || substr(p_name, 5) AS ptxt
  FROM part WHERE p_partkey % 50 = 0
)
SELECT probes.pid, p.p_partkey AS cid,
       CAST(levenshtein(probes.ptxt, p.p_name) AS BIGINT) AS dist
FROM probes, part p
WHERE levenshtein(probes.ptxt, p.p_name) <= 2
"""


@query("fuzzy_join_edit_distance", oracle=EDIT_JOIN_ORACLE)
def fuzzy_join_edit_distance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """edit-distance ≤2 matching of corrupted part names (one character
    substituted) against the part table — LOSSLESS q-gram count
    prefiltering (Gravano 2001: d edits destroy ≤ q·d grams, so true
    pairs share ≥ maxlen−q+1−q·d grams) feeds exact levenshtein only on
    count-qualified candidates (operators/fuzzyjoin.py::
    fuzzy_join_edit_distance). Oracle = the UNBLOCKED all-pairs
    distance join — the hash match proves the bound loses nothing.
    Both engines' levenshtein kernels agree integer-for-integer."""
    from arrow_spark.operators.fuzzyjoin import fuzzy_join_edit_distance

    part = table(spark, sf_dir, "part")
    probes = part.where(F.col("p_partkey") % 50 == 0).select(
        F.col("p_partkey").alias("pid"),
        F.concat(
            F.substring("p_name", 1, 3),
            F.lit("#"),
            F.expr("substring(p_name, 5)"),
        ).alias("ptxt"),
    )
    corpus = part.select("p_partkey", "p_name")
    out = fuzzy_join_edit_distance(
        probes, corpus, "pid", "ptxt", "p_partkey", "p_name",
        max_dist=2, q=3,
    )
    return out.select(F.col("pid"), F.col("cid"), F.col("dist"))


FUZZY_TOPK_ORACLE = """
WITH probes AS (
  SELECT p_partkey AS pid,
         substr(p_name, 1, 3) || '#' || substr(p_name, 5) AS ptxt
  FROM part WHERE p_partkey % 50 = 0
), pairs AS (
  SELECT probes.pid, p.p_partkey AS cid,
         CAST(levenshtein(probes.ptxt, p.p_name) AS BIGINT) AS dist
  FROM probes, part p
  WHERE levenshtein(probes.ptxt, p.p_name) <= 2
)
SELECT pid, cid, dist FROM pairs
QUALIFY row_number() OVER (PARTITION BY pid ORDER BY dist, cid) <= 2
"""


@query("fuzzy_join_topk", oracle=FUZZY_TOPK_ORACLE)
def fuzzy_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The emission-GUARDED fuzzy join (same q-gram-blocked lossless
    plan as fuzzy_join_edit_distance, plus top_k_per_probe=2: each
    probe keeps its 2 closest matches by (dist ASC, cid ASC), bounding
    output at 2·|probe| rows on a near-dup-dense corpus where the full
    relation is ~quadratic — measured exp +1.35 at sf1). The oracle is
    the identical rank cut over the UNBLOCKED all-pairs distance join,
    so the hash match proves blocking losslessness and cap semantics
    together."""
    from arrow_spark.operators.fuzzyjoin import fuzzy_join_edit_distance

    part = table(spark, sf_dir, "part")
    probes = part.where(F.col("p_partkey") % 50 == 0).select(
        F.col("p_partkey").alias("pid"),
        F.concat(
            F.substring("p_name", 1, 3),
            F.lit("#"),
            F.expr("substring(p_name, 5)"),
        ).alias("ptxt"),
    )
    corpus = part.select("p_partkey", "p_name")
    return fuzzy_join_edit_distance(
        probes, corpus, "pid", "ptxt", "p_partkey", "p_name",
        max_dist=2, q=3, top_k_per_probe=2,
    )


CONTAINMENT_ORACLE = """
WITH d AS (
  SELECT doc_id AS id, lang,
         list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS toks
  FROM documents
  WHERE len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) >= 1
)
SELECT a.id AS id_a, b.id AS id_b,
       floor((len(list_intersect(a.toks, b.toks)) * 1.0 / len(a.toks))
             * 1e6 + 0.5) / 1e6 AS containment
FROM d a JOIN d b ON a.lang = b.lang AND a.id <> b.id
WHERE len(list_intersect(a.toks, b.toks)) * 1000 >= 800 * len(a.toks)
"""


@query("dedup_containment_pairs", oracle=CONTAINMENT_ORACLE)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed token-set containment pairs C(A->B) = |A∩B|/|A| ≥ 0.8,
    blocked by language (llm/dedup.py::containment_pairs): the
    asymmetric near-dup relation Jaccard misses — contained
    boilerplate/quote docs. Candidates are lossless prefix-filtered on
    the contained side against full token postings; the oracle is the
    UNBLOCKED directed all-pairs scoring, so its hash match proves the
    prefix plan drops nothing on this corpus."""
    from arrow_spark.llm.dedup import containment_pairs

    return containment_pairs(
        table(spark, sf_dir, "documents"), threshold=0.8, block_cols=("lang",)
    )


CONTAINMENT_CAPPED_ORACLE = """
WITH d AS (
  SELECT doc_id AS id, lang,
         list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS toks
  FROM documents
  WHERE len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) >= 1
), pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         floor((len(list_intersect(a.toks, b.toks)) * 1.0 / len(a.toks))
               * 1e6 + 0.5) / 1e6 AS containment
  FROM d a JOIN d b ON a.lang = b.lang AND a.id <> b.id
  WHERE len(a.toks) >= 12
    AND len(list_intersect(a.toks, b.toks)) * 1000 >= 800 * len(a.toks)
)
SELECT id_a, id_b, containment
FROM pairs
QUALIFY row_number() OVER (PARTITION BY id_a
                           ORDER BY containment DESC, id_b) <= 3
"""


@query("dedup_containment_capped", oracle=CONTAINMENT_CAPPED_ORACLE)
def dedup_containment_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The emission-GUARDED containment relation a 100 TB pipeline
    should run: same lossless prefix-filter plan as
    dedup_containment_pairs, plus min_tokens=12 (tiny boilerplate docs
    — the quadratic source — never enter the contained side) and
    top_k_per_doc=3 (each contained doc keeps its 3 strongest
    containers: containment DESC, id_b ASC, so output is ≤ 3n rows no
    matter how boilerplate-dense the corpus). The oracle expresses the
    cap as the identical rank cut (QUALIFY row_number) over the
    unblocked all-pairs relation — the hash match proves both the
    prefix filter AND the guard semantics."""
    from arrow_spark.llm.dedup import containment_pairs

    return containment_pairs(
        table(spark, sf_dir, "documents"),
        threshold=0.8,
        block_cols=("lang",),
        min_tokens=12,
        top_k_per_doc=3,
    )
