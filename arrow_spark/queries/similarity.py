"""Similarity-search oracle queries over the embeddings fixture.

Engine path: arrow_spark.llm.similarity (broadcast cross join + JVM fold
cosine + per-query top-k window; LSH-bucketed variant for the scale
path). Oracle: DuckDB list_cosine_similarity over the same pairs, both
sides computing in float64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.llm.similarity import (
    brute_force_topk,
    deterministic_planes,
    lsh_bucketed_topk,
)
from arrow_spark.queries.base import query

TOPK_COS_ORACLE = """
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id % 100 = 0
),
pairs AS (
  SELECT q.qid, e.vec_id AS nid,
         list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS cos
  FROM q, embeddings e
  WHERE e.vec_id <> q.qid
),
ranked AS (
  SELECT qid, nid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
  FROM pairs
)
SELECT qid, nid, round(cos, 6) AS cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10
"""


@query("similarity_topk_cosine", oracle=TOPK_COS_ORACLE)
def similarity_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exact brute-force cosine top-10 for sampled query vectors."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    out = brute_force_topk(emb, queries, k=10)
    return out.select(
        "qid", "nid", F.round("cos", 6).alias("cos_sim"), "rank"
    )


def _lsh_topk_oracle(planes: list[list[float]]) -> str:
    """Exact SQL replay of the hyperplane bucketing: Spark's signature
    is a SEQUENTIAL JVM fold from a 0.0 accumulator, and DuckDB's
    list_reduce over a 0.0-prepended product list performs the identical
    left-to-right IEEE additions on the identical doubles (plane
    constants round-trip through repr; float embeddings cast to double
    the same way) — verified sign-for-sign on the full fixture. Bucket
    membership therefore replays exactly; scoring reuses the
    list_cosine_similarity formulation the brute-force oracle proved
    agrees at 6 decimals."""
    dim = len(planes[0])
    bits = ",\n    ".join(
        "CASE WHEN list_reduce(list_prepend(0.0, list_transform(range(1, "
        f"{dim + 1}), i -> v[i] * ([{','.join(repr(x) for x in p)}])[i])), "
        "(a, b) -> a + b) >= 0 THEN '1' ELSE '0' END"
        for p in planes
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), sig AS (
  SELECT vec_id, v, concat({bits}) AS sig FROM e
), q AS (
  SELECT vec_id AS qid, v AS qv, sig FROM sig WHERE vec_id % 100 = 0
), pairs AS (
  SELECT q.qid, s.vec_id AS nid, list_cosine_similarity(q.qv, s.v) AS cos
  FROM q JOIN sig s USING (sig) WHERE s.vec_id <> q.qid
), ranked AS (
  SELECT qid, nid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
  FROM pairs
)
SELECT qid, nid, round(cos, 6) AS cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10
"""


@query("similarity_lsh_topk", oracle=_lsh_topk_oracle(deterministic_planes(6, 64, seed=42)))
def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (scale path). EXACT oracle since
    r4: the seeded hyperplanes inline into the SQL and both engines
    compute the sign folds with identical sequential IEEE additions, so
    the bucket assignment — the part that DEFINES this approximate
    result — is hash-checked, not just recall-tested."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    planes = deterministic_planes(6, 64, seed=42)
    out = lsh_bucketed_topk(emb, queries, planes, k=10)
    return out.select("qid", "nid", F.round("cos", 6).alias("cos_sim"), "rank")


@query("similarity_ivf_topk", oracle=None)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k (data-adaptive scale path beside
    the oblivious LSH variant; rows-only check — 5 unrolled k-means
    iterations aren't reasonably SQL-expressible). Determinism of the
    whole train/assign/probe pipeline and recall vs the exact path are
    asserted in unit tests."""
    from arrow_spark.llm.similarity import ivf_topk

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    out = ivf_topk(emb, queries, k=10, n_clusters=16, n_probe=4, n_iters=3)
    return out.select("qid", "nid", F.round("cos", 6).alias("cos_sim"), "rank")


@query("similarity_pq_topk", oracle=None)
def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-k (FAISS-style composition: inverted-file
    pruning → compressed-domain ADC scoring via JVM zip_with table
    lookups → exact cosine re-rank). Rows-only check — k-means codebooks
    and float matmuls aren't SQL-expressible; codebook determinism,
    code ranges, serve-from-index equivalence, and recall ≥0.9 vs brute
    force are asserted in tests/test_pq.py."""
    from arrow_spark.llm.similarity import ivf_pq_topk

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    out = ivf_pq_topk(
        emb, queries, k=10, n_clusters=16, n_probe=4, m=8, n_codes=16,
        n_iters=3, refine_factor=3, sample_every=2,
    )
    return out.select("qid", "nid", F.round("cos", 6).alias("cos_sim"), "rank")


QUANTIZE_ORACLE = """
WITH x AS (
  SELECT vec_id,
         CAST(unnest(embedding) AS DOUBLE) AS v,
         CAST(unnest(range(len(embedding))) AS INT) AS dim
  FROM embeddings
), p AS (
  SELECT dim, min(v) AS mn, max(v) AS mx FROM x GROUP BY dim
)
SELECT x.vec_id, x.dim,
       CAST(CASE WHEN mx = mn THEN 0
                 ELSE floor((v - mn) / (mx - mn) * 254 + 0.5) - 127 END AS INT)
         AS code
FROM x JOIN p USING (dim)
"""


@query("embedding_quantize", oracle=QUANTIZE_ORACLE)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """affine int8 quantization of the embedding corpus (per-dim min/max
    codebook → codes in [-127, 127]), emitted in long form so the oracle
    hash checks every code. The codebook is dim-row metadata; the
    quantization itself is a UDF-free projection."""
    from arrow_spark.llm.similarity import quantization_params, quantize_embeddings

    emb = table(spark, sf_dir, "embeddings")
    params = quantization_params(emb)
    codes = quantize_embeddings(emb, params)
    return codes.select(
        "vec_id", F.posexplode("codes").alias("dim", "code")
    )
