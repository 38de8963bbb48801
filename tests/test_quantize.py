"""int8 embedding quantization: codebook, range, round-trip bound,
ranking preservation; unigram-LM score ground truth."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from pyspark.sql import functions as F

from arrow_spark.llm.corpus import unigram_logprob_score
from arrow_spark.llm.similarity import (
    dequantize,
    quantization_params,
    quantize_embeddings,
)


@pytest.fixture(scope="module")
def emb(spark):
    rows = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3],
            "embedding": [
                [0.0, 1.0, 5.0],
                [1.0, 1.0, -5.0],
                [2.0, 1.0, 0.0],
                [4.0, 1.0, 2.5],
            ],
        }
    )
    return spark.createDataFrame(rows)


def test_params_are_per_dim_extrema(emb):
    assert quantization_params(emb) == [(0.0, 4.0), (1.0, 1.0), (-5.0, 5.0)]


def test_codes_in_int8_range_and_constant_dim_zero(emb):
    params = quantization_params(emb)
    out = quantize_embeddings(emb, params).collect()
    for r in out:
        assert all(-127 <= c <= 127 for c in r["codes"])
        assert r["codes"][1] == 0  # constant dimension
    by_id = {r["vec_id"]: r["codes"] for r in out}
    assert by_id[0][0] == -127 and by_id[3][0] == 127  # extrema hit the ends
    assert by_id[0][2] == 127 and by_id[1][2] == -127


def test_dequantize_error_bound(emb):
    params = quantization_params(emb)
    out = (
        quantize_embeddings(emb, params)
        .select("vec_id", "embedding", dequantize(F.col("codes"), params).alias("deq"))
        .collect()
    )
    for r in out:
        for v, d, (mn, mx) in zip(r["embedding"], r["deq"], params):
            bound = (mx - mn) / 254 / 2 + 1e-9
            assert abs(v - d) <= bound, (v, d, bound)


def test_quantized_dot_preserves_neighbor_order(spark):
    # two tight clusters: quantized similarity must still put same-cluster
    # vectors first
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.normal(0, 0.05, (10, 8)) + np.array([1.0] * 4 + [0.0] * 4)
    b = rng.normal(0, 0.05, (10, 8)) + np.array([0.0] * 4 + [1.0] * 4)
    rows = pd.DataFrame(
        {
            "vec_id": range(20),
            "embedding": [list(map(float, v)) for v in np.vstack([a, b])],
        }
    )
    df = spark.createDataFrame(rows)
    params = quantization_params(df)
    deq = quantize_embeddings(df, params).select(
        "vec_id", dequantize(F.col("codes"), params).alias("embedding")
    )
    got = {r["vec_id"]: r["embedding"] for r in deq.collect()}

    def cos(x, y):
        dot = sum(p * q for p, q in zip(x, y))
        return dot / math.sqrt(sum(p * p for p in x) * sum(q * q for q in y))

    for qid in (0, 10):
        sims = sorted(
            ((cos(got[qid], got[n]), n) for n in got if n != qid), reverse=True
        )
        top5 = [n for _, n in sims[:5]]
        same_cluster = set(range(10)) if qid < 10 else set(range(10, 20))
        assert all(n in same_cluster for n in top5)


def test_unigram_lm_ground_truth(spark):
    train = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["a a b"]})
    )
    score = spark.createDataFrame(pd.DataFrame({"doc_id": [2], "text": ["a c"]}))
    (row,) = unigram_logprob_score(score, train).collect()
    # vocab {a:2, b:1}, N=3, V=2 → p(a)=3/5, p(c)=1/5
    micro = lambda p: math.floor(math.log(p) * 1e6 + 0.5)  # noqa: E731
    want = math.floor(-(micro(0.6) + micro(0.2)) / (2 * 1e6) * 1e6 + 0.5) / 1e6
    assert row["n_tokens"] == 2 and row["n_oov"] == 1
    assert row["nll"] == pytest.approx(want, abs=1e-9)
