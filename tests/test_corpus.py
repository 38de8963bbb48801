"""Unit tests for corpus-pipeline operators (llm/corpus.py); the
oracle gate (corpus_* queries) covers the fixture-scale behavior."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from arrow_spark.llm.corpus import (
    mixture_weights,
    ngram_overlap,
    redact_pii,
    repetition_ratio,
    stratified_sample,
    vocabulary_topk,
)


def test_ngram_overlap_full_and_none(spark):
    probe = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b c d", "x y z w"]})
    )
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": [10], "text": ["a b c d e f"]})
    )
    got = {r.doc_id: (r.n_grams, r.n_shared, r.overlap) for r in
           ngram_overlap(probe, corpus, n=3).collect()}
    assert got[1] == (2, 2, 1.0)   # both trigrams of doc 1 appear in corpus
    assert got[2] == (2, 0, 0.0)   # nothing shared


def test_repetition_ratio_detects_loops(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["spam ham spam ham spam ham spam ham", "all words are unique here"],
            }
        )
    )
    got = {r.doc_id: r.repetition for r in repetition_ratio(df, n=3).collect()}
    assert got[1] > 0.6  # loop: only 2 distinct trigrams out of 6
    assert got[2] == 0.0


def test_redact_pii_counts_and_replaces(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1],
                "text": ["mail a.b@x.org or c@d.io, call 555-123-4567, host 192.168.0.1"],
            }
        )
    )
    r = redact_pii(df).collect()[0]
    assert (r.n_email, r.n_phone, r.n_ipv4) == (2, 1, 1)
    assert "[EMAIL]" in r.redacted and "[PHONE]" in r.redacted and "[IPV4]" in r.redacted
    assert "a.b@x.org" not in r.redacted and "555-123" not in r.redacted


def test_stratified_sample_is_deterministic_and_bounded(spark, sf_dir):
    from arrow_spark.catalog import table

    docs = table(spark, sf_dir, "documents")
    a = stratified_sample(docs, {"en": 20}, default_pct=60)
    b = stratified_sample(docs, {"en": 20}, default_pct=60)
    ids_a = {r.doc_id for r in a.select("doc_id").collect()}
    ids_b = {r.doc_id for r in b.select("doc_id").collect()}
    assert ids_a == ids_b  # re-run identical
    en_total = docs.where(F.col("lang") == "en").count()
    en_kept = a.where(F.col("lang") == "en").count()
    assert 0 < en_kept < en_total  # actually downsampled


def test_mixture_weights_sum_to_one_and_upweight_small(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(110), "source": ["big"] * 100 + ["small"] * 10})
    )
    rows = {r.source: (r.n_docs, r.share) for r in mixture_weights(df, alpha=0.5).collect()}
    assert abs(rows["big"][1] + rows["small"][1] - 1.0) < 1e-5
    # α=0.5: small source gets ~24% share despite 9% of docs
    assert rows["small"][1] > 0.2


def test_vocabulary_topk_deterministic_ties(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["b a b a c"]})
    )
    rows = [(r.token, r.n) for r in vocabulary_topk(df, k=2).collect()]
    assert rows == [("a", 2), ("b", 2)]  # tie broken by token asc


def test_pack_sequences_offsets_are_contiguous_per_shard(spark, sf_dir):
    from arrow_spark.catalog import table
    from arrow_spark.llm.corpus import pack_sequences

    out = pack_sequences(table(spark, sf_dir, "documents"), max_len=512, shards=4)
    rows = sorted(
        ((r.shard, r.start_tok, r.n_tokens) for r in out.collect())
    )
    by_shard = {}
    for shard, start, n in rows:
        by_shard.setdefault(shard, []).append((start, n))
    for shard, entries in by_shard.items():
        pos = 0
        for start, n in entries:  # doc_id order == start_tok order
            assert start == pos, (shard, start, pos)
            pos += n


def test_chunk_documents_boundaries(spark):
    from arrow_spark.llm.corpus import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a" * 10),          # shorter than window → 1 chunk
            (2, "b" * 512),         # exactly one window → 1 chunk
            (3, "x" * 513),         # one char over → 2 chunks
            (4, "".join(chr(97 + i % 26) for i in range(1500))),
        ],
        "doc_id: long, text: string",
    )
    rows = chunk_documents(docs, window=512, overlap=64).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk == "a" * 10
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_len == 512
    assert len(by_doc[3]) == 2
    # stride = 448: chunk 1 starts at 448, so it overlaps chunk 0 by 64
    c3 = sorted(by_doc[3], key=lambda r: r.chunk_index)
    assert c3[0].chunk_len == 512 and c3[1].chunk_len == 513 - 448
    # every character covered, in order, for the long doc
    text4 = "".join(chr(97 + i % 26) for i in range(1500))
    c4 = sorted(by_doc[4], key=lambda r: r.chunk_index)
    rebuilt = c4[0].chunk + "".join(c.chunk[64:] for c in c4[1:])
    assert rebuilt == text4

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, window=64, overlap=64)


def test_tv_drift_identical_groups_zero(spark):
    # every source has the same word distribution ⇒ each equals the
    # pool ⇒ TV = 0 exactly
    docs = spark.createDataFrame(
        [("a", "x y"), ("b", "x y")], "source string, text string"
    )
    from arrow_spark.llm.corpus import tv_drift

    rows = {r["source"]: r for r in tv_drift(docs).collect()}
    assert rows["a"]["tv_distance"] == 0.0
    assert rows["b"]["tv_distance"] == 0.0
    assert rows["a"]["n_tokens"] == 2


def test_tv_drift_disjoint_equal_halves(spark):
    # A is all "x", B all "y", equal sizes: pool = (1/2, 1/2);
    # TV(A, pool) = 1/2(|1 - 1/2| + |0 - 1/2|) = 1/2
    docs = spark.createDataFrame(
        [("a", "x x"), ("b", "y y")], "source string, text string"
    )
    from arrow_spark.llm.corpus import tv_drift

    rows = {r["source"]: r for r in tv_drift(docs).collect()}
    assert rows["a"]["tv_distance"] == 0.5
    assert rows["b"]["tv_distance"] == 0.5


def test_tv_drift_absent_key_mass_counted(spark):
    # A = {x:1}, B = {x:1, y:1}. pool = {x:2/3, y:1/3}.
    # TV(A) = 1/2(|1-2/3| + |0-1/3|) = 1/3 — the y term exists only
    # through the algebraic absent-key recovery
    docs = spark.createDataFrame(
        [("a", "x"), ("b", "x y")], "source string, text string"
    )
    from arrow_spark.llm.corpus import tv_drift

    rows = {r["source"]: r for r in tv_drift(docs).collect()}
    assert abs(rows["a"]["tv_distance"] - 1 / 3) < 1e-15


def test_negative_samples_contracts(spark):
    from arrow_spark.llm.corpus import negative_samples

    docs = spark.createDataFrame(
        [(i, "s" + str(i % 3), "t") for i in range(30)],
        "doc_id long, source string, text string",
    )
    out = negative_samples(docs, "doc_id", "source", k=4).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
        assert r["neg_id"] != r["id"]
    rows = {(r["id"], r["slot"]): r["neg_id"] for r in out}
    # ≤ k per id, deterministic across runs
    assert all(len(v) <= 4 for v in by_id.values())
    again = {
        (r["id"], r["slot"]): r["neg_id"]
        for r in negative_samples(docs, "doc_id", "source", k=4).collect()
    }
    assert rows == again
    # same-group negatives are excluded
    grp = {i: "s" + str(i % 3) for i in range(30)}
    for r in out:
        assert grp[r["neg_id"]] != grp[r["id"]]
        assert r["neg_group"] == grp[r["neg_id"]]


def test_negative_samples_different_seed_differs(spark):
    from arrow_spark.llm.corpus import negative_samples

    docs = spark.createDataFrame(
        [(i, "s" + str(i % 2), "t") for i in range(40)],
        "doc_id long, source string, text string",
    )
    a = {(r["id"], r["slot"]): r["neg_id"]
         for r in negative_samples(docs, k=4, seed=0).collect()}
    b = {(r["id"], r["slot"]): r["neg_id"]
         for r in negative_samples(docs, k=4, seed=1).collect()}
    assert a != b
