"""Deterministic scale fixtures for the non-TPC-H tables.

``tpchgen.generate_tables`` covers the 8 relational tables (the
reference generates TPC-H natively inside the engine —
cpp/src/arrow/acero/tpch_node.cc); the driver's other three fixtures
(``events``, ``documents``, ``embeddings`` — TESTDATA.md / FIXTURES.md)
have no public generator, so scale runs beyond the shipped sf0.1 need
one. This module mirrors the fixtures' SHAPE — schema, cardinality
ratios, value domains, and the structural properties queries rely on
(non-decreasing-ish event time over a 30-day window, JSON props with an
integer ``k``, exact + near duplicate documents, clusterable labeled
embeddings) — without claiming the driver's seed-42 bytes: correctness
at scale is still Spark-vs-DuckDB on the SAME generated files, so only
the shape matters.

Everything is a ``spark.range`` projection with pure integer hashing:
linear, shuffle-free, deterministic (same sf ⇒ bit-identical), and
reproducible by any engine.

Cardinalities (×sf, matching the fixture ratios at sf0.1):
events 1_000_000, users 15_000, documents 50_000, embeddings 20_000.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
_LANGS = ["en", "en", "en", "en", "en", "de", "de", "zh", "zh", "fr", "fr", "es"]
_VOCAB = [
    "spark", "table", "query", "join", "filter", "scan", "sort", "agg",
    "group", "order", "line", "column", "value", "hash", "merge", "batch",
    "stream", "vector", "part", "customer", "key", "fast", "slow", "big",
    "small", "the", "a", "row", "cache", "shuffle",
]
_30_DAYS_US = 30 * 86_400 * 1_000_000


def events(spark: SparkSession, sf: float) -> DataFrame:
    """events(event_id, ts, user_id, event_type, value, props): a
    30-day window starting 2024-01-01, event time non-decreasing-ish in
    event_id (uniform stride + bounded jitter, like the fixture), JSON
    props carrying an integer k in [0, 100).

    k MUST be hash-derived, not linear in event_id: a user's events sit
    at event_ids in arithmetic progression (stride = the user count, by
    construction of user_id), so any linear ``k = m*i mod 100`` makes
    each user's k sequence an AP mod 100 — the per-user transition
    graph collapses to at most one (k, k+Δ) edge shape, and when the
    user count is a multiple of 100 (sf ∈ {0.1, 1, 3, 10}) Δ = 0:
    every transition is a self-loop and the click graph is EMPTY. The
    fixture's graph is dense (~6.3k distinct edges at sf0.01); the
    seeded portable hash reproduces that shape at every scale. Found
    r13 via a vacuous graph_ktruss scale row — see SCALE.md."""
    from arrow_spark.functions.portable_hash import portable_hash64

    n = max(int(1_000_000 * sf), 100)
    n_users = max(int(15_000 * sf), 10)
    i = F.col("id")
    stride_us = _30_DAYS_US // n
    jitter = F.pmod(i * 2_654_435_761, F.lit(max(stride_us * 3, 1)))
    ts_us = i * F.lit(stride_us) + jitter
    return spark.range(n).select(
        i.alias("event_id"),
        F.timestamp_micros(
            (F.lit(1_704_067_200_000_000) + ts_us).cast("long")
        ).alias("ts"),
        F.pmod(i * 7919 + 1, F.lit(n_users)).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in _EVENT_TYPES]),
            (F.pmod(i * 13 + 7, F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(i * 48_271, F.lit(56_022)) / F.lit(100.0)).alias("value"),
        F.concat(
            F.lit('{"k": '),
            F.pmod(portable_hash64(i.cast("string"), seed=31), F.lit(100)).cast(
                "string"
            ),
            F.lit("}"),
        ).alias("props"),
    )


def documents(spark: SparkSession, sf: float) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars): 8–88-word texts
    over a 30-word vocabulary with the fixture's duplicate structure —
    in each 20-id block, the doc at id%20==18 is an EXACT copy of the
    block's id%20==2 doc (base id−16) and the doc at id%20==19 is a
    NEAR duplicate of the same base (id−17, one word substituted) — so
    exact/minhash/containment dedup finds real pairs at every scale."""
    n = max(int(50_000 * sf), 50)
    i = F.col("id")
    # dup slots are the LAST two ids of each 20-block, copying the
    # block's own r==2 doc (an original — never itself a copy, so dup
    # pairs are real doc-to-doc duplicates, not copies of unused
    # formulas): r==18 exact, r==19 near (one word substituted)
    r = i % 20
    base_id = F.when(r == 18, i - 16).when(r == 19, i - 17).otherwise(i)
    near = r == 19
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    base = spark.range(n).select(
        i.alias("doc_id"),
        base_id.alias("b"),
        near.alias("near"),
        (F.pmod(base_id * 17 + 5, F.lit(81)) + 8).cast("int").alias("n_words"),
    )
    # pure in-row assembly (transform + array_join): word order is the
    # sequence order by construction, so an exact dup really is exact
    # QUADRATIC mix of the (doc, position) pair before the mod-30 fold.
    # Anything affine in j collapses: (h mod P) mod 30 of an arithmetic
    # progression is itself a short cycle, so every doc became a
    # phase-shifted copy of the same 10-word loop and 2/3 of ALL pairs
    # were accidental shingle near-dups. h*h+h breaks the progression;
    # measured accidental 3-gram-Jaccard≥0.3 rate: ~0.05% of pairs.
    # (b up to 5e6 × 2654435761 < 2^63; h < 1e6 so h*h+h < 2^63: no
    # overflow anywhere.)
    P = 1_000_003
    def word(jj):
        h = F.pmod(F.col("b") * 2_654_435_761 + jj * 40_503 + 13, F.lit(P))
        return F.element_at(
            vocab,
            (F.pmod(h * h + h, F.lit(P)) % len(_VOCAB) + 1).cast("int"),
        )
    texts = base.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.col("n_words") - 1),
                lambda jj: F.when(F.col("near") & (jj == 1), F.lit("variant"))
                .otherwise(word(jj)),
            ),
            " ",
        ).alias("text"),
    )
    d = F.col("doc_id")
    return texts.select(
        "doc_id",
        "text",
        F.element_at(
            F.array(*[F.lit(lg) for lg in _LANGS]),
            (F.pmod(d * 7 + 3, F.lit(len(_LANGS))) + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("src"), F.pmod(d, F.lit(20)).cast("string")).alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )


def embeddings(spark: SparkSession, sf: float, dim: int = 64) -> DataFrame:
    """embeddings(vec_id, embedding array<float>, label): 10 labeled
    clusters — per-dimension centroid offset by label plus bounded
    noise — so ANN recall gates and covariance/PCA inputs behave like
    the fixture's clusterable corpus."""
    n = max(int(20_000 * sf), 20)
    i = F.col("id")
    label = F.pmod(i * 7 + 2, F.lit(10)).cast("int")
    return (
        spark.range(n)
        .select(i.alias("vec_id"), label.alias("label"))
        .withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda jj: (
                    (
                        F.pmod(F.col("label").cast("long") * 37 + jj * 11, F.lit(7))
                        - 3
                    )
                    / F.lit(2.0)
                    + (F.pmod(F.col("vec_id") * 96_769 + jj * 7919 + 31, F.lit(2001)) - 1000)
                    / F.lit(1000.0)
                ).cast("float"),
            ),
        )
        .select("vec_id", "embedding", "label")
    )


def write_scale_dir(spark: SparkSession, sf: float, out_dir: str) -> None:
    """Materialize a full fixture-compatible directory at scale ``sf``:
    the 8 TPC-H tables (tpchgen) + events/documents/embeddings, each a
    parquet DIRECTORY (part files — the layout a real cluster writes;
    the oracle harness globs directories)."""
    from pyspark.sql import types as T

    from arrow_spark.sources.tpchgen import generate_tables

    # disk parity with the driver fixtures: int64 µs (not legacy INT96)
    # and tz-NAIVE (isAdjustedToUTC=false) — a TimestampType column would
    # be annotated UTC-adjusted and DuckDB would read it TIMESTAMPTZ,
    # diverging from every fixture-shaped oracle
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

    def _ntz(df):
        for f in df.schema.fields:
            if isinstance(f.dataType, T.TimestampType):
                df = df.withColumn(f.name, F.col(f.name).cast("timestamp_ntz"))
        return df

    tables = dict(generate_tables(spark, sf))
    tables["events"] = events(spark, sf)
    tables["documents"] = documents(spark, sf)
    tables["embeddings"] = embeddings(spark, sf)
    for name, df in tables.items():
        _ntz(df).write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
