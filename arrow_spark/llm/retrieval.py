"""Inverted-index text retrieval: TF-IDF keywords and BM25 top-k search.

The training-data-pipeline counterpart of a search engine's core loop:
score every document against a set of keyword queries (quality probes,
topic filters, eval-set leakage hunts) without ever materializing a
query×document cross product. The reference exposes the same building
blocks as kernels (`count_substring`, `match_substring`, hash-group-by
counts — cpp/src/arrow/compute/kernels/scalar_string*.cc); here the
whole index→score→top-k pipeline is one declarative Spark plan.

Scale design (the part that matters at 100 TB):
- postings build is tokenize→explode→groupBy(token, doc) — ONE shuffle,
  map-side partial counts; document length is `size(split(...))`, a
  pure projection (no shuffle).
- document frequencies aggregate the (much smaller) postings, and the
  corpus stats (N, avgdl) are a single-row aggregate broadcast back.
- query terms are a broadcast equi-join on token: candidate generation
  touches exactly the postings of queried terms (index semantics), so
  cost is ∝ matched postings, never ∝ corpus.
- scoring sums per (query, doc) — a shuffle on candidates only — and
  top-k is a per-query window (partitioned by query_id, so a thousand
  concurrent queries spread over the cluster).

Float determinism (cross-engine oracle contract, same recipe as
`corpus.unigram_logprob_score`): each term's BM25/TF-IDF contribution is
snapped to integer micros (floor(x·1e6 + 0.5) as long) BEFORE summation,
so aggregation is exact integer arithmetic; the final score divides the
long by 1e6. Ties in top-k are broken by ascending doc id.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from arrow_spark.llm.dedup import tokens

__all__ = [
    "build_postings",
    "bm25_topk",
    "tfidf_top_terms",
    "build_positional_postings",
    "phrase_match",
    "proximity_match",
    "jaccard_topk",
    "rrf_fuse",
]


def _micro(col: Column) -> Column:
    """Snap a double to integer micros (floor(x*1e6 + 0.5), long)."""
    return F.floor(col * 1e6 + F.lit(0.5)).cast("long")


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the three relations of an inverted index.

    Returns ``(postings, doclen, stats)``:

    - ``postings``  — (token, id, tf): term frequency per document.
    - ``doclen``    — (id, dl): token count per document (projection
      only — computed from the split array size, no shuffle).
    - ``stats``     — single row (n_docs, avgdl): corpus size and mean
      document length, for broadcast into scoring expressions.

    Whitespace/lowercase tokenization matches the rest of the llm
    module (`dedup.tokens`), so index terms line up with the dedup and
    LM-score vocabularies.
    """
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    postings = toks.groupBy("token", "id").agg(F.count(F.lit(1)).alias("tf"))
    doclen = docs.select(
        F.col(id_col).alias("id"), F.size(tokens(F.col(text_col))).alias("dl")
    )
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    return postings, doclen, stats


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
) -> DataFrame:
    """BM25 top-k documents per query over an inverted index.

    ``queries`` is a (query_id, qtext) frame; each query is tokenized
    with the same tokenizer as the corpus and duplicate query terms are
    dropped (standard BM25 treats the query as a term set).

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))   (never negative)
    score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

    Returns (query_id, doc_id, rank, score) with rank 1..k per query,
    ordered by (score desc, doc_id asc) — score is deterministic to the
    micro because each term contribution is snapped before the sum.
    """
    postings, doclen, stats = build_postings(docs, id_col, text_col)
    qterms = queries.select(
        F.col(query_id_col).alias("qid"),
        F.explode(tokens(F.col(query_text_col))).alias("token"),
    ).distinct()

    idf = F.log(
        1
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    df_by_token = postings.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    qtok = qterms.select("token").distinct()
    # candidate generation: postings ⋈ (broadcast) query terms — cost is
    # ∝ postings of queried tokens, never ∝ corpus size; df rows are
    # likewise narrowed to queried tokens before they are broadcast.
    # The doclen join keys on doc id and carries two longs PER DOCUMENT —
    # corpus-cardinality, so it must never be the broadcast side (Catalyst
    # was statically broadcasting it: estimate-blind after the size()
    # projection). Merge keeps it shuffled-and-spillable at any corpus.
    cand = (
        postings.join(F.broadcast(qterms), "token")
        .join(F.broadcast(df_by_token.join(F.broadcast(qtok), "token")), "token")
        .join(doclen.hint("merge"), "id")
        .crossJoin(F.broadcast(stats))
    )
    tf_part = (F.col("tf") * (F.lit(k1) + 1)) / (
        F.col("tf")
        + F.lit(k1) * (1 - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        cand.withColumn("__s__", _micro(idf * tf_part))
        .groupBy("qid", "id")
        .agg(F.sum("__s__").alias("__sum__"))
    )
    w = W.partitionBy("qid").orderBy(F.col("__sum__").desc(), F.col("id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id_col),
            F.col("id").alias(id_col),
            "rank",
            (F.col("__sum__") / F.lit(1e6)).alias("score"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF.

    tfidf(t, d) = tf · ln((1 + N) / (1 + df))  — the "document keywords"
    primitive behind topic tagging and cluster labeling in a corpus
    pipeline.

    Returns (doc_id, term, rank, tfidf) with rank 1..k per document,
    ties broken by ascending term. Scale: postings shuffle + a window
    partitioned by document — both keyed on high-cardinality columns,
    no skew hazard; df is a second small aggregate of the postings.
    """
    postings, _doclen, stats = build_postings(docs, id_col, text_col)
    df_by_token = postings.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    tfidf = _micro(
        F.col("tf") * F.log((1 + F.col("n_docs")) / (1 + F.col("df")))
    )
    scored = (
        postings.join(df_by_token.hint("merge"), "token")
        .crossJoin(F.broadcast(stats))
        .withColumn("__s__", tfidf)
    )
    w = W.partitionBy("id").orderBy(F.col("__s__").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col),
            F.col("token").alias("term"),
            "rank",
            (F.col("__s__") / F.lit(1e6)).alias("tfidf"),
        )
    )


def build_positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional inverted index: (token, id, positions) with the sorted
    0-based token offsets of every occurrence — the structure phrase and
    proximity queries need on top of the tf-only postings.

    Same ONE-shuffle shape as build_postings (explode with position →
    groupBy(token, id) collecting offsets); positions per (token, doc)
    are bounded by term frequency, so posting rows stay small even for
    stopwords in long documents.
    """
    from arrow_spark.llm.dedup import tokens

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
    )
    return toks.groupBy("token", "id").agg(
        F.array_sort(F.collect_list("pos")).alias("positions")
    )


def phrase_match(
    postings_pos: DataFrame,
    phrase: str,
    id_col_out: str = "doc_id",
) -> DataFrame:
    """Exact phrase search over a positional index: documents containing
    the query tokens at CONSECUTIVE positions, with the match count.

    Relational adjacency intersection: for query tokens t0..tk, join
    each token's postings on the document, then count positions p of t0
    such that p+i is in positions(ti) for every i — expressed as
    array_intersect of offset-shifted position lists, never a re-scan
    of document text. Cost ∝ the postings of the queried tokens only
    (index semantics); the joins are doc-keyed equi-joins, broadcast
    when one side is small.

    Single-token phrases degenerate to the token's postings. Duplicate
    tokens in the phrase are handled naturally (each occurrence joins
    the same posting row with a different shift).
    """
    terms = phrase.strip().lower().split()
    if not terms:
        raise ValueError("empty phrase")
    base = postings_pos.where(F.col("token") == terms[0]).select(
        F.col("id"), F.col("positions").alias("p0")
    )
    acc = base
    for i, t in enumerate(terms[1:], start=1):
        nxt = postings_pos.where(F.col("token") == t).select(
            F.col("id"),
            F.transform("positions", lambda p: p - i).alias(f"p{i}"),
        )
        acc = acc.join(nxt.hint("merge"), "id").withColumn(
            "p0", F.array_intersect("p0", f"p{i}")
        ).drop(f"p{i}").where(F.size("p0") > 0)
    return acc.select(
        F.col("id").alias(id_col_out), F.size("p0").alias("n_matches")
    )


def proximity_match(
    postings_pos: DataFrame,
    terms: Sequence[str],
    window: int,
    id_col_out: str = "doc_id",
) -> DataFrame:
    """Proximity search: documents containing ALL ``terms`` (any order)
    within a span of ``window`` consecutive tokens, with the minimal
    such span.

    Candidate documents come from inner-joining each term's postings on
    the doc key (index semantics — cost ∝ the queried tokens' postings);
    the span test then runs IN-ROW over the position arrays: a nested
    array_transform cross-product of the k position lists → flatten →
    array_min of spans. Position lists are term-frequency sized, so the
    in-row combination count is tiny and nothing ever explodes into
    rows; the joins stay doc-keyed equi-joins.
    """
    terms = list(terms)
    if len(terms) < 2:
        raise ValueError("proximity needs at least two terms")
    acc = None
    for i, t in enumerate(terms):
        p = postings_pos.where(F.col("token") == t).select(
            F.col("id"), F.col("positions").alias(f"p{i}")
        )
        acc = p if acc is None else acc.join(p.hint("merge"), "id")

    def spans(vals: list) -> Column:
        # nested transforms accumulate one position per term, innermost
        # emits the span of the combination
        depth = len(vals)
        if depth == len(terms):
            return F.greatest(*vals) - F.least(*vals) + 1
        return F.transform(F.col(f"p{depth}"), lambda v: spans(vals + [v]))

    nested = spans([])
    for _ in range(len(terms) - 1):
        nested = F.flatten(nested)
    min_span = F.array_min(nested)
    return (
        acc.select(F.col("id").alias(id_col_out), min_span.alias("min_span"))
        .where(F.col("min_span") <= window)
    )


def jaccard_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
) -> DataFrame:
    """Token-set Jaccard top-k per query — the lexical-overlap ranker.

    J(q,d) = |q∩d| / (|q| + |d| − |q∩d|): all three operands are exact
    integers from posting intersections (candidates via the same
    broadcast query-term equi-join as bm25_topk — cost ∝ matched
    postings, never query×corpus), so the single double division is
    deterministic and rank order replays exactly cross-engine.
    """
    dtok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token"),
    )
    dlen = dtok.groupBy("id").agg(F.count(F.lit(1)).alias("nd"))
    qterms = queries.select(
        F.col(query_id_col).alias("qid"),
        F.explode(F.array_distinct(tokens(F.col(query_text_col)))).alias("token"),
    ).distinct()
    qlen = qterms.groupBy("qid").agg(F.count(F.lit(1)).alias("nq"))
    inter = (
        dtok.join(F.broadcast(qterms), "token")
        .groupBy("qid", "id")
        .agg(F.count(F.lit(1)).alias("jn"))
    )
    scored = (
        inter.join(dlen, "id")
        .join(F.broadcast(qlen), "qid")
        .withColumn(
            "score",
            F.col("jn").cast("double")
            / (F.col("nq") + F.col("nd") - F.col("jn")).cast("double"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("score").desc(), F.col("id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id_col),
            F.col("id").alias(id_col),
            "rank",
            "score",
        )
    )


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    k_const: int = 60,
    topk: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of two rankers (Cormack et al. 2009):
    rrf(d) = Σ_r 1/(k + rank_r(d)), absent list contributes 0.

    The hybrid-search combiner: fuse a lexical list (BM25) with a
    semantic list (ANN cosine) without score calibration — only RANKS
    cross the fusion boundary, so heterogeneous scorers compose. The
    join is (query, doc)-keyed over two top-k lists — k rows per query
    per side, metadata-sized at any corpus scale.

    Determinism: 1/(k+rank) is a single double division; the two-term
    sum is one IEEE addition in a fixed operand order — bit-stable and
    replayable in SQL.
    """
    ar = a.select(
        F.col(query_id_col).alias("qid"),
        F.col(id_col).alias("id"),
        F.col(rank_col).alias("__ra__"),
    )
    br = b.select(
        F.col(query_id_col).alias("qid"),
        F.col(id_col).alias("id"),
        F.col(rank_col).alias("__rb__"),
    )
    fused = ar.join(br, ["qid", "id"], "full_outer").withColumn(
        "rrf",
        F.coalesce(F.lit(1.0) / (F.lit(k_const) + F.col("__ra__")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(k_const) + F.col("__rb__")), F.lit(0.0)),
    )
    w = W.partitionBy("qid").orderBy(F.col("rrf").desc(), F.col("id").asc())
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select(
            F.col("qid").alias(query_id_col),
            F.col("id").alias(id_col),
            "rank",
            "rrf",
        )
    )
