"""Deduplication oracle queries over documents + embeddings.

Engine path: arrow_spark.llm.dedup. Oracles reproduce the exact same
math in DuckDB SQL where expressible; the MinHash/SimHash paths hash
with Spark's xxhash64 (not available in DuckDB) so they get rows-only
checks plus unit-test verification against the exact Jaccard results.
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


@query("dedup_minhash_lsh", oracle=None)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs verified by shingle Jaccard
    (rows-only: xxhash64 seeds aren't reproducible in the oracle;
    recall vs exact Jaccard asserted in unit tests)."""
    return minhash_near_dups(
        table(spark, sf_dir, "documents"), threshold=0.5, num_hashes=16, bands=4
    )


@query("dedup_simhash", oracle=None)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signatures per document (rows-only check)."""
    return simhash_signatures(table(spark, sf_dir, "documents"))


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


@query("dedup_clusters_lsh", oracle=None)
def dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB clustering path — near_dup_clusters' DEFAULT entry point:
    connected components over minhash-LSH verified candidate pairs
    (candidate generation is an equi-join, never all-pairs). Rows-only
    check — the seeded xxhash64 signatures aren't reproducible in SQL;
    the exact-pairs variant `dedup_clusters` is the oracle-checked twin,
    and LSH recall vs exact Jaccard is unit-tested."""
    return near_dup_clusters(table(spark, sf_dir, "documents"), threshold=0.5)


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


@query("fuzzy_join_lsh_match", oracle=None)
def fuzzy_join_lsh_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scale path of fuzzy_join_entity_match: the same truncated probes
    matched through MinHash-banded candidates (two shuffles, candidate
    volume bounded by band buckets — never bucket-quadratic like the
    length-blocked exact form, which stays the oracle-gated verifier).
    Rows-only: banded LSH recall < 1 below J=1 by construction; the
    identical-pair catch guarantee and recall floor are unit-tested."""
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
        probe, corpus, "probe_id", "probe_text", "doc_id", "text", threshold=0.5
    )


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


@query("dedup_incremental_lsh_store", oracle=None)
def dedup_incremental_lsh_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """incremental ingest dedup, scale path: the batch's band signatures
    probe the corpus's persisted signature store by (band, bsig)
    equi-join and candidates are exact-verified by shingle Jaccard
    (rows-only: xxhash64 band signatures aren't reproducible in DuckDB;
    containment in the unblocked exact all-pairs set — and jaccard
    agreement on every shared pair — is pinned in
    tests/test_llm_ops.py)."""
    from arrow_spark.llm.dedup import band_signature_store, incremental_near_dups

    docs = table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    batch = docs.where(F.col("doc_id") % 5 == 0)
    store = band_signature_store(corpus, num_hashes=16, bands=4)
    return incremental_near_dups(
        batch, store, corpus, threshold=0.5, num_hashes=16, bands=4
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
