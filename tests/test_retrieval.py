"""Inverted-index retrieval: BM25 against a hand-computed ground truth,
TF-IDF ranking invariants, and index-shape checks."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from arrow_spark.llm.retrieval import bm25_topk, build_postings, tfidf_top_terms

DOCS = [
    (0, "apple banana apple"),
    (1, "banana cherry"),
    (2, "cherry cherry cherry durian"),
    (3, "apple durian"),
]


def _bm25_ref(query_terms, k1=1.2, b=0.75):
    """Plain-Python BM25 over DOCS with the module's exact snapping."""
    toks = {i: t.split() for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for v in toks.values():
        for t in set(v):
            df[t] = df.get(t, 0) + 1
    scores = {}
    for i, v in toks.items():
        s = 0
        for t in set(query_terms):
            tf = v.count(t)
            if not tf:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            part = (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            s += math.floor(idf * part * 1e6 + 0.5)
        if s:
            scores[i] = s / 1e6
    return scores


def test_bm25_matches_hand_computation(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame([(7, "apple durian")], "query_id long, qtext string")
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs, queries, k=10).collect()
    }
    assert got == _bm25_ref(["apple", "durian"])


def test_bm25_rank_order_and_k_bound(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "cherry"), (1, "apple banana")], "query_id long, qtext string"
    )
    rows = bm25_topk(docs, queries, k=2).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        assert len(rs) <= 2
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        # scores non-increasing with rank
        assert all(a["score"] >= b["score"] for a, b in zip(rs, rs[1:]))


def test_bm25_unmatched_query_returns_nothing(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame([(0, "zucchini")], "query_id long, qtext string")
    assert bm25_topk(docs, queries).count() == 0


def test_postings_shapes(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings, doclen, stats = build_postings(docs)
    p = {(r["token"], r["id"]): r["tf"] for r in postings.collect()}
    assert p[("apple", 0)] == 2 and p[("cherry", 2)] == 3
    assert {r["id"]: r["dl"] for r in doclen.collect()} == {0: 3, 1: 2, 2: 4, 3: 2}
    st = stats.collect()[0]
    assert st["n_docs"] == 4 and st["avgdl"] == 11 / 4


def test_tfidf_rare_term_outranks_common(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    top = {
        (r["doc_id"], r["rank"]): r["term"]
        for r in tfidf_top_terms(docs, k=2).collect()
    }
    # doc 3 = "apple durian": both tf=1; durian (df=2) ties apple (df=2)
    # -> alphabetical tiebreak puts apple first
    assert top[(3, 1)] == "apple" and top[(3, 2)] == "durian"
    # doc 2: cherry tf=3 dominates
    assert top[(2, 1)] == "cherry"


def test_phrase_match_adjacency_and_duplicates(spark):
    from arrow_spark.llm.retrieval import build_positional_postings, phrase_match

    docs = spark.createDataFrame(
        [
            (1, "big data big data big"),     # "big data" twice; "data big" twice
            (2, "big query data"),            # tokens present, never adjacent
            (3, "data big"),                  # reversed order only
        ],
        "doc_id long, text string",
    )
    idx = build_positional_postings(docs)
    got = {r.doc_id: r.n_matches for r in phrase_match(idx, "big data").collect()}
    assert got == {1: 2}
    got = {r.doc_id: r.n_matches for r in phrase_match(idx, "data big").collect()}
    assert got == {1: 2, 3: 1}
    # duplicate token in the phrase: "big data big" occurs twice in doc 1
    got = {r.doc_id: r.n_matches for r in phrase_match(idx, "big data big").collect()}
    assert got == {1: 2}
    # single-token phrase degenerates to the token postings
    got = {r.doc_id: r.n_matches for r in phrase_match(idx, "big").collect()}
    assert got == {1: 3, 2: 1, 3: 1}


def test_proximity_match_window_and_three_terms(spark):
    from arrow_spark.llm.retrieval import build_positional_postings, proximity_match

    docs = spark.createDataFrame(
        [
            (1, "alpha x x x beta"),            # span 5
            (2, "beta alpha"),                  # span 2, reversed order
            (3, "alpha x x x x x x beta"),      # span 8 — outside window 5
            (4, "alpha only here"),             # missing beta
            (5, "x alpha beta x gamma"),        # 3-term span 4
        ],
        "doc_id long, text string",
    )
    idx = build_positional_postings(docs)
    got = {r.doc_id: r.min_span for r in proximity_match(idx, ["alpha", "beta"], 5).collect()}
    assert got == {1: 5, 2: 2, 5: 2}
    got3 = {
        r.doc_id: r.min_span
        for r in proximity_match(idx, ["alpha", "beta", "gamma"], 4).collect()
    }
    assert got3 == {5: 4}


def test_jaccard_topk_ground_truth(spark):
    from arrow_spark.llm.retrieval import jaccard_topk

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y"), (3, "z z z")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "a b")], "query_id long, qtext string")
    out = {r["doc_id"]: r for r in jaccard_topk(docs, q, k=10).collect()}
    assert out[1]["score"] == 2 / 4 and out[2]["score"] == 2 / 4
    assert 3 not in out            # no overlap -> no candidate row at all
    assert out[1]["rank"] == 1     # tie broken by doc_id


def test_rrf_fuse_hand_computed(spark):
    from arrow_spark.llm.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(0, 10, 1), (0, 20, 2)], "query_id long, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(0, 20, 1), (0, 30, 2)], "query_id long, doc_id long, rank int"
    )
    out = {r["doc_id"]: r for r in rrf_fuse(a, b, k_const=60, topk=10).collect()}
    assert out[20]["rrf"] == 1 / 62 + 1 / 61      # in both lists
    assert out[10]["rrf"] == 1 / 61               # only list a
    assert out[30]["rrf"] == 1 / 62               # only list b
    assert out[20]["rank"] == 1
