"""Oracle-checked queries for the inverted-index retrieval operators
(`arrow_spark/llm/retrieval.py`): BM25 top-k search and TF-IDF document
keywords over the `documents` table.

Cross-engine determinism: every per-term score is snapped to integer
micros before summation (see the module docstring of `retrieval.py`),
and both engines spell the scoring expression with the same literal
parenthesization, so the IEEE doubles — and therefore the value hashes —
match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.queries.base import query

# The three probe queries cover: a 2-term query, a 3-term query with a
# rarer term mix, and a 4-term query — enough to exercise term-set
# union, tie-breaking, and per-query ranking isolation.
_PROBES = [
    (0, "hash join"),
    (1, "fast scan filter"),
    (2, "customer order data window"),
]

_PROBES_SQL = ", ".join(f"({i}, '{t}')" for i, t in _PROBES)

# Shared WITH-body through `ranked` — reused by the RRF fusion oracle.
_BM25_CTES = f"""
WITH q(query_id, qtext) AS (VALUES {_PROBES_SQL}),
tok AS (
  SELECT doc_id AS id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
  FROM documents
),
postings AS (SELECT token, id, count(*) AS tf FROM tok GROUP BY token, id),
doclen AS (
  SELECT doc_id AS id,
         len(string_split_regex(trim(lower(text)), '\\s+')) AS dl
  FROM documents
),
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM doclen
),
dfb AS (SELECT token, count(*) AS df FROM postings GROUP BY token),
qterms AS (
  SELECT DISTINCT qid, token FROM (
    SELECT query_id AS qid,
           unnest(string_split_regex(trim(lower(qtext)), '\\s+')) AS token
    FROM q
  )
),
term AS (
  SELECT qt.qid, p.id,
         CAST(floor(
           ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * ((p.tf * (1.2 + 1))
              / (p.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl)))
           * 1e6 + 0.5) AS BIGINT) AS sm
  FROM postings p
  JOIN qterms qt USING (token)
  JOIN dfb d USING (token)
  JOIN doclen l ON p.id = l.id, stats s
),
scored AS (SELECT qid, id, sum(sm) AS ssum FROM term GROUP BY qid, id),
ranked AS (
  SELECT qid, id, ssum,
         row_number() OVER (PARTITION BY qid ORDER BY ssum DESC, id ASC) AS rank
  FROM scored
)"""

BM25_ORACLE = _BM25_CTES + """
SELECT qid AS query_id, id AS doc_id, rank, ssum / 1e6 AS score
FROM ranked WHERE rank <= 10
"""


@query("retrieval_bm25_topk", oracle=BM25_ORACLE)
def retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for three keyword probes via an inverted
    index (postings ⋈ broadcast query terms — cost ∝ matched postings,
    never query×corpus). Scores are micro-snapped per term so the
    cross-engine hash is exact."""
    from arrow_spark.llm.retrieval import bm25_topk

    d = table(spark, sf_dir, "documents")
    queries_df = spark.createDataFrame(_PROBES, "query_id long, qtext string")
    return bm25_topk(d, queries_df, k=10)


TFIDF_ORACLE = """
WITH tok AS (
  SELECT doc_id AS id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
  FROM documents
),
postings AS (SELECT token, id, count(*) AS tf FROM tok GROUP BY token, id),
doclen AS (
  SELECT doc_id AS id,
         len(string_split_regex(trim(lower(text)), '\\s+')) AS dl
  FROM documents
),
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM doclen
),
dfb AS (SELECT token, count(*) AS df FROM postings GROUP BY token),
term AS (
  SELECT p.id, p.token,
         CAST(floor(
           p.tf * ln((1 + s.n_docs) / (1 + d.df)) * 1e6 + 0.5) AS BIGINT) AS sm
  FROM postings p JOIN dfb d USING (token), stats s
),
ranked AS (
  SELECT id, token, sm,
         row_number() OVER (PARTITION BY id ORDER BY sm DESC, token ASC) AS rank
  FROM term
)
SELECT id AS doc_id, token AS term, rank, sm / 1e6 AS tfidf
FROM ranked WHERE rank <= 3
"""


@query("corpus_tfidf_top_terms", oracle=TFIDF_ORACLE)
def corpus_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by smoothed TF-IDF — the
    keyword/topic-tagging primitive. One postings shuffle + a per-doc
    window; df is a broadcast-size second aggregate."""
    from arrow_spark.llm.retrieval import tfidf_top_terms

    d = table(spark, sf_dir, "documents")
    return tfidf_top_terms(d, k=3)


def _phrase_oracle_branch(phrase: str) -> str:
    terms = phrase.split()
    conds = " AND ".join(f"t[i+{j}] = '{w}'" for j, w in enumerate(terms))
    return f"""
  SELECT '{phrase}' AS phrase, doc_id,
         len(list_filter(range(1, len(t) + 1), i -> {conds}))::BIGINT AS n_matches
  FROM d
  WHERE len(list_filter(range(1, len(t) + 1), i -> {conds})) > 0"""


PHRASE_ORACLE = f"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
)
{_phrase_oracle_branch('fast spark')}
UNION ALL
{_phrase_oracle_branch('value table part')}
"""


@query("retrieval_phrase_match", oracle=PHRASE_ORACLE)
def retrieval_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exact phrase search over the POSITIONAL inverted index: each
    query token's postings join on the document and offset-shifted
    position lists intersect — cost ∝ the queried tokens' postings, the
    document text is never re-scanned. The oracle counts phrase
    occurrences by direct text-level token scanning (genuinely
    different algebra), so the positional-index adjacency intersection
    is hash-checked, for a 2-token and a 3-token phrase."""
    from arrow_spark.llm.retrieval import build_positional_postings, phrase_match

    docs = table(spark, sf_dir, "documents")
    idx = build_positional_postings(docs)
    out = []
    for ph in ("fast spark", "value table part"):
        out.append(
            phrase_match(idx, ph).select(
                F.lit(ph).alias("phrase"), "doc_id", "n_matches"
            )
        )
    return out[0].unionByName(out[1])


PROXIMITY_ORACLE = """
WITH d AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
), c AS (
  SELECT doc_id,
         list_filter(range(1, len(t) + 1), i -> t[i] = 'spark')  AS p0,
         list_filter(range(1, len(t) + 1), i -> t[i] = 'vector') AS p1
  FROM d
  WHERE len(list_filter(range(1, len(t) + 1), i -> t[i] = 'spark')) > 0
    AND len(list_filter(range(1, len(t) + 1), i -> t[i] = 'vector')) > 0
), spans AS (
  SELECT doc_id,
         list_min(flatten(list_transform(p0,
           a -> list_transform(p1,
             b -> greatest(a, b) - least(a, b) + 1)))) AS min_span
  FROM c
)
SELECT doc_id, CAST(min_span AS INT) AS min_span
FROM spans WHERE min_span <= 6
"""


@query("retrieval_proximity_match", oracle=PROXIMITY_ORACLE)
def retrieval_proximity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """proximity search over the positional index: documents where
    'spark' and 'vector' occur within a 6-token span (any order), with
    the minimal span — candidate docs from postings joins, the span
    minimum computed IN-ROW over position arrays (nested transform →
    flatten → array_min; positions are tf-sized, nothing explodes into
    rows). Oracle recomputes spans by direct text-position scanning."""
    from arrow_spark.llm.retrieval import build_positional_postings, proximity_match

    docs = table(spark, sf_dir, "documents")
    idx = build_positional_postings(docs)
    out = proximity_match(idx, ["spark", "vector"], window=6)
    return out.select("doc_id", F.col("min_span").cast("int").alias("min_span"))


# Hybrid fusion: BM25 CTEs (shared, rank<=20) + token-Jaccard ranker +
# reciprocal-rank fusion. Only integer RANKS cross the fusion boundary,
# so the two 1/(k+rank) divisions and their single fixed-order addition
# replay bit-for-bit.
RRF_ORACLE = _BM25_CTES + """
, bm AS (SELECT qid, id, rank FROM ranked WHERE rank <= 20),
dtok AS (SELECT DISTINCT id, token FROM tok),
dlen AS (SELECT id, count(*) AS nd FROM dtok GROUP BY id),
qlen AS (SELECT qid, count(*) AS nq FROM qterms GROUP BY qid),
inter AS (
  SELECT qt.qid, dt.id, count(*) AS jn
  FROM qterms qt JOIN dtok dt USING (token) GROUP BY 1, 2
),
jscored AS (
  SELECT i.qid, i.id,
         CAST(jn AS DOUBLE) / CAST(nq + nd - jn AS DOUBLE) AS score
  FROM inter i JOIN dlen USING (id) JOIN qlen USING (qid)
),
jm AS (
  SELECT qid, id,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank
  FROM jscored QUALIFY rank <= 20
),
allp AS (SELECT qid, id FROM bm UNION SELECT qid, id FROM jm),
fused AS (
  SELECT a.qid, a.id,
         coalesce(CAST(1 AS DOUBLE) / (60 + b.rank), 0)
         + coalesce(CAST(1 AS DOUBLE) / (60 + j.rank), 0) AS rrf
  FROM allp a
  LEFT JOIN bm b ON a.qid = b.qid AND a.id = b.id
  LEFT JOIN jm j ON a.qid = j.qid AND a.id = j.id
)
SELECT qid AS query_id, id AS doc_id,
       row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, id) AS rank, rrf
FROM fused QUALIFY rank <= 10
"""


@query("retrieval_rrf_fusion", oracle=RRF_ORACLE)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: BM25 top-20 ⊕ token-Jaccard top-20 fused by
    reciprocal rank (k=60) into a final top-10 per probe — the
    calibration-free combiner for heterogeneous rankers. The fusion
    join touches 20 rows/query/side regardless of corpus size."""
    from arrow_spark.llm.retrieval import bm25_topk, jaccard_topk, rrf_fuse

    d = table(spark, sf_dir, "documents")
    q = spark.createDataFrame(_PROBES, "query_id long, qtext string")
    return rrf_fuse(bm25_topk(d, q, k=20), jaccard_topk(d, q, k=20))
