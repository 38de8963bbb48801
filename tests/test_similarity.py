"""embedding_covariance: hand truth + bad-row exclusion."""

import pytest



def test_embedding_covariance_hand_truth(spark):
    """3 vectors in dim 2 on the milli lattice: exact gram/sums/cov
    against numpy's own covariance (ddof=0)."""
    import numpy as np

    from arrow_spark.llm.similarity import embedding_covariance

    vecs = [[0.001, 0.002], [0.003, 0.005], [0.005, 0.011]]
    df = spark.createDataFrame([(v,) for v in vecs], "embedding array<float>")
    out = {
        (r["i"], r["j"]): r for r in embedding_covariance(df, dim=2).collect()
    }
    E = np.array([[1, 2], [3, 5], [5, 11]], dtype="int64")
    C = np.cov(E, rowvar=False, ddof=0)
    assert out[(0, 0)]["n"] == 3
    assert out[(0, 0)]["gram"] == float((E[:, 0] * E[:, 0]).sum())
    assert out[(0, 1)]["s_i"] == float(E[:, 0].sum())
    assert out[(0, 1)]["s_j"] == float(E[:, 1].sum())
    for (i, j), r in out.items():
        assert r["cov"] == pytest.approx(C[i, j]), (i, j)
    assert set(out) == {(0, 0), (0, 1), (1, 1)}  # upper triangle only


def test_embedding_covariance_skips_bad_rows(spark):
    from arrow_spark.llm.similarity import embedding_covariance

    rows = [([0.001, 0.002],), (None,), ([0.001],)]
    df = spark.createDataFrame(rows, "embedding array<float>")
    out = embedding_covariance(df, dim=2).collect()
    assert all(r["n"] == 1 for r in out) and len(out) == 3


def test_embedding_covariance_excludes_null_elements(spark):
    """Element-level nulls would become NaN in to_numpy and NaN→int64 is
    undefined (platform garbage) — such rows must be excluded, not
    silently folded into the 'exact' cells."""
    from arrow_spark.llm.similarity import embedding_covariance

    rows = [([0.001, 0.002],), ([0.003, None],), ([None, None],)]
    df = spark.createDataFrame(rows, "embedding array<float>")
    out = {(r["i"], r["j"]): r for r in embedding_covariance(df, dim=2).collect()}
    assert all(r["n"] == 1 for r in out.values())
    # only the clean row contributes: milli-snap [1, 2]
    assert out[(0, 0)]["gram"] == 1.0
    assert out[(0, 1)]["gram"] == 2.0
    assert out[(1, 1)]["gram"] == 4.0
