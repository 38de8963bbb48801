"""bigram_interp_score: ground truth, order sensitivity, unseen fallback."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from arrow_spark.llm.corpus import bigram_interp_score


def _micro(p: float) -> int:
    return math.floor(math.log(p) * 1e6 + 0.5)


def _nll(micros: list[int]) -> float:
    return math.floor(-sum(micros) / (len(micros) * 1e6) * 1e6 + 0.5) / 1e6


def test_bigram_ground_truth(spark):
    train = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["a b a b"]})
    )
    score = spark.createDataFrame(pd.DataFrame({"doc_id": [2], "text": ["a b"]}))
    (row,) = bigram_interp_score(score, train).collect()
    # bigrams: (a,b)x2, (b,a)x1 -> c(a,b)=2, c(a·)=2; unigrams a:2 b:2,
    # N=4 V=2 -> p1(b)=(2+1)/6=0.5; p(b|a)=0.75*2/2 + 0.25*0.5 = 0.875
    assert row["n_bigrams"] == 1 and row["n_unseen"] == 0
    assert row["nll"] == pytest.approx(_nll([_micro(0.875)]), abs=1e-9)


def test_unseen_context_falls_back_to_unigram(spark):
    train = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["a b a b"]})
    )
    score = spark.createDataFrame(pd.DataFrame({"doc_id": [2], "text": ["z a"]}))
    (row,) = bigram_interp_score(score, train).collect()
    # context z unseen -> bigram term 0; p = 0.25 * p1(a) = 0.25*(2+1)/6
    assert row["n_unseen"] == 1
    assert row["nll"] == pytest.approx(_nll([_micro(0.25 * 0.5)]), abs=1e-9)


def test_word_order_changes_score_where_unigram_cannot(spark):
    train = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["the cat sat on the mat " * 5]})
    )
    fluent = spark.createDataFrame(
        pd.DataFrame({"doc_id": [2], "text": ["the cat sat on the mat"]})
    )
    scrambled = spark.createDataFrame(
        pd.DataFrame({"doc_id": [3], "text": ["mat the on sat cat the"]})
    )
    (f,) = bigram_interp_score(fluent, train).collect()
    (s,) = bigram_interp_score(scrambled, train).collect()
    assert f["nll"] < s["nll"]  # same bag of words, different order


def test_short_docs_absent(spark):
    train = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["a b"]}))
    score = spark.createDataFrame(
        pd.DataFrame({"doc_id": [2, 3], "text": ["solo", "a b"]})
    )
    rows = bigram_interp_score(score, train).collect()
    assert [r["doc_id"] for r in rows] == [3]
