"""Corpus-level operators for training-data pipelines: contamination
detection, repetition scoring, vocabulary statistics, deterministic
stratified sampling, mixture weighting, and PII redaction.

These extend the reference's text/dedup surface with the remaining ops a
100 TB pretraining-data pipeline runs between "raw crawl" and "tokenizer
input". Everything is built-in-function Spark (no Python in the hot
path except none at all — the regex/ngram/hash machinery is JVM) and
every op is expressible in ANSI-ish SQL, so each gate query carries a
DuckDB oracle.

Scale notes per op are on the functions; the common theme: candidate
and statistics generation are equi-joins / single-shuffle aggregations,
never all-pairs, and sampling/splitting is hash-based (shuffle-free,
growth-stable, no RNG state across executors).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from arrow_spark.llm.dedup import shingles, tokens


def _floor6(col: Column) -> Column:
    return F.floor(col * 1e6 + F.lit(0.5)) / 1e6


def ngram_overlap(
    probe_docs: DataFrame,
    corpus_docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-probe-document n-gram contamination against a corpus.

    The train/test-leakage check: for every probe (e.g. eval/test) doc,
    the fraction of its distinct word n-grams that appear anywhere in
    the corpus (e.g. train split). Returns (id, n_grams, n_shared,
    overlap) — overlap 1.0 ⇒ fully contained.

    Scale: one distinct-gram explode per side, then an equi-join on the
    gram string — shuffle-partitioned by gram, map-side distinct
    partials, no pairwise document comparison anywhere. At 100 TB the
    corpus gram set is the big side; Spark hashes both sides on gram so
    skewed grams (stopword n-grams) are the only hotspot — raise n or
    pre-filter stopword-only grams if that bites.
    """
    probe = probe_docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("g"),
    )
    corpus = (
        corpus_docs.select(
            F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("g")
        )
        .distinct()
        .withColumn("__hit__", F.lit(1))
    )
    return (
        probe.join(corpus.hint("merge"), "g", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit__"), F.lit(0))).alias("n_shared"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_grams",
            "n_shared",
            _floor6(F.col("n_shared") / F.col("n_grams")).alias("overlap"),
        )
    )


def repetition_ratio(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document repetition: 1 − distinct/total word n-grams
    (the Gopher-style duplicate-n-gram quality signal). Pure projection
    — no shuffle, pushdown-safe."""
    g = shingles(F.col(text_col), n)
    return docs.select(
        F.col(id_col),
        F.size(g).alias("n_grams"),
        _floor6(1 - F.size(F.array_distinct(g)) / F.size(g)).alias("repetition"),
    )


def vocabulary_topk(
    docs: DataFrame, k: int = 50, text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary head: top-k tokens by frequency, ties broken by
    token (deterministic cutoff). One explode + one count shuffle +
    TakeOrdered — the driver only ever sees k rows."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
    )


def stratified_sample(
    docs: DataFrame,
    rates_pct: dict[str, int],
    default_pct: int = 100,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a document iff its
    md5(id) percent-bucket falls below the stratum's rate (0-100).

    Hash-based like text_hash_split: membership never changes as the
    corpus grows, re-runs are byte-identical, and it's a pure map —
    no shuffle, no RNG coordination across 1000 executors. This is the
    dataset-mixing primitive (downweight crawl, keep all books, ...).
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10).cast(
            "int"
        )
        % 100
    )
    rate = F.lit(default_pct)
    for stratum, pct in rates_pct.items():
        rate = F.when(F.col(strata_col) == stratum, pct).otherwise(rate)
    return docs.where(bucket < rate)


def stratified_split(
    docs: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    train_tenths: int = 8,
    val_tenths: int = 1,
    n_buckets: int = 64,
) -> DataFrame:
    """EXACT-proportion stratified train/val/test split: within every
    stratum, precisely ⌊n·train/10⌋ rows land in train and ⌊n·(train+
    val)/10⌋−⌊n·train/10⌋ in val — unlike the pure hash split
    (text_hash_split), whose per-stratum proportions drift ∝ 1/√n and
    can starve rare strata entirely. Assignment is by rank in a
    deterministic hash order (md5 prefix, ties to the smaller id), so
    it is reproducible and stable under re-runs.

    Scale design — the naive form is a window over each stratum, and a
    dominant stratum (half the corpus in one language) would serialize
    into ONE window partition at 100 TB. Instead the rank is computed
    two-level, the distributed order-statistics decomposition:

      1. RANGE-bucket rows by the hash's high bits within the stratum
         (bucket order must agree with hash order — a modulo bucket
         would interleave the sort key and break the offsets);
      2. count per (stratum, bucket) — metadata-sized (strata ×
         n_buckets rows), cumulated into per-bucket rank offsets by a
         window over that TINY frame;
      3. row_number within (stratum, bucket) — every window partition
         is ~1/n_buckets of the stratum — plus the broadcast offset.

    All rule arithmetic is integer (rank·1 vs n·tenths div 10), so the
    split is bit-exact and the single-window SQL replay hash-matches —
    proving the decomposition, not just resembling it.
    """
    width = (1 << 32) // n_buckets  # h is a 32-bit md5 prefix
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    rows = docs.select(
        F.col(id_col).alias("id"),
        F.col(strata_col).alias("stratum"),
        h.alias("h"),
    ).withColumn("b", F.expr(f"h div {width}"))
    counts = rows.groupBy("stratum", "b").agg(F.count(F.lit(1)).alias("cnt"))
    cum = W.partitionBy("stratum").orderBy("b").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "stratum",
        "b",
        F.coalesce(F.sum("cnt").over(cum), F.lit(0)).alias("off"),
        F.sum("cnt").over(W.partitionBy("stratum")).alias("n"),
    )
    rn = F.row_number().over(
        W.partitionBy("stratum", "b").orderBy(F.col("h").asc(), F.col("id").asc())
    )
    ranked = rows.withColumn("__rn__", rn).join(
        F.broadcast(offsets), ["stratum", "b"]
    )
    rank = F.col("off") + F.col("__rn__")
    train_cut = F.expr(f"n * {train_tenths} div 10")
    val_cut = F.expr(f"n * {train_tenths + val_tenths} div 10")
    split = (
        F.when(rank <= train_cut, "train")
        .when(rank <= val_cut, "val")
        .otherwise("test")
    )
    return ranked.select(
        F.col("id").alias(id_col),
        F.col("stratum").alias(strata_col),
        split.alias("split"),
    )


def mixture_weights(
    docs: DataFrame, by: str = "source", alpha: float = 0.5
) -> DataFrame:
    """Temperature-scaled mixture weights per group: share_i ∝ n_i^α
    (α < 1 upweights small sources — the standard multi-source sampling
    temperature). One count shuffle; the grand total (one row)
    broadcasts back."""
    counts = docs.groupBy(by).agg(F.count(F.lit(1)).alias("n_docs"))
    w = F.pow(F.col("n_docs"), F.lit(alpha))
    weighted = counts.select(F.col(by), "n_docs", w.alias("__w__"))
    total = weighted.agg(F.sum("__w__").alias("__tot__"))
    return (
        weighted.crossJoin(F.broadcast(total))
        .select(by, "n_docs", _floor6(F.col("__w__") / F.col("__tot__")).alias("share"))
    )


def pack_sequences(
    docs: DataFrame,
    max_len: int = 2048,
    shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style concat-and-split packing manifest: documents are
    concatenated per shard (deterministic md5 shard assignment, doc_id
    order) and split at ``max_len`` token boundaries; each doc gets its
    (shard, start_tok, seq_first, seq_last) so a loader can materialize
    fixed-length training sequences without ever re-scanning text.

    Scale: token counts are a projection; the offset is a per-shard
    running sum (one shuffle on shard, no global window); shard count
    scales the packing parallelism and is growth-stable because shard
    membership is hashed, not round-robin.
    """
    n_tok = F.size(tokens(F.col(text_col)))
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10).cast(
            "int"
        )
        % shards
    )
    d = docs.select(F.col(id_col), shard.alias("shard"), n_tok.alias("n_tokens"))
    w = W.partitionBy("shard").orderBy(id_col)
    start = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
    )
    return d.select(
        id_col,
        "shard",
        "n_tokens",
        start.alias("start_tok"),
        F.floor(start / max_len).alias("seq_first"),
        F.floor((start + F.col("n_tokens") - 1) / max_len).alias("seq_last"),
    )


def weighted_sample(
    docs: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, derandomized
    (Efraimidis–Spirakis A-Res with hash-derived uniforms): each row
    draws u ∈ (0,1) from its md5 — u = (first-24-bits + 0.5)/2²⁴ — and
    the k rows with the largest priority ln(u)/w win (order-equivalent
    to u^(1/w); heavier rows draw priorities nearer 0).

    Deterministic and growth-stable like the md5 split: membership
    depends only on (id, weight, k), never on partitioning, executor
    count, or RNG state. One TakeOrdered (map-side partial top-k) — the
    driver sees k rows, nothing shuffles the corpus.
    """
    x = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10).cast(
        "long"
    )
    u = (x + F.lit(0.5)) / F.lit(float(1 << 24))
    priority = F.log(u) / F.col(weight_col)
    return (
        # non-positive weights can never win (their ES priority is -inf)
        # and w = 0 would hit Spark 4's ANSI DIVIDE_BY_ZERO: drop them
        # before the priority is computed
        docs.where(F.col(weight_col) > 0)
        .select(F.col(id_col), F.col(weight_col), priority.alias("__p__"))
        .orderBy(F.col("__p__").desc(), F.col(id_col).asc())
        .limit(k)
        .select(
            id_col,
            weight_col,
            (F.floor(F.col("__p__") * 1e6 + F.lit(0.5)) / 1e6).alias("priority"),
        )
    )


def unigram_logprob_score(
    score_docs: DataFrame,
    train_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram-LM quality score: per document, the mean negative
    log-likelihood of its tokens under an add-one-smoothed unigram model
    trained on ``train_docs`` (the classic cheap perplexity filter —
    boilerplate/gibberish scores high, fluent text low).

    Returns (id, n_tokens, n_oov, nll); OOV tokens take the smoothed
    zero-count probability 1/(N+V).

    Determinism: each token's log-prob is snapped to integer micros
    (floor(ln(p)·1e6 + 0.5) as a long) BEFORE the per-document sum, so
    the aggregation is exact integer arithmetic — no cross-engine float
    accumulation-order drift; only the final mean is floored back to 6
    decimals.

    Scale: the model is one count shuffle on token; scoring is a
    token-equi-join (the vocab side is zipfian-small — broadcastable —
    while the token stream stays partitioned) plus one groupBy(id).
    Nothing is all-pairs and no UDF is involved.
    """
    vocab = (
        train_docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = vocab.agg(
        F.sum("c").alias("__n__"), F.count(F.lit(1)).alias("__v__")
    )
    toks = score_docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    denom = F.col("__n__") + F.col("__v__")
    logp_micro = F.floor(
        F.log((F.coalesce(F.col("c"), F.lit(0)) + 1) / denom) * 1e6 + F.lit(0.5)
    ).cast("long")
    return (
        toks.join(vocab.hint("merge"), "token", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("c").isNull(), 1).otherwise(0)).alias("n_oov"),
            F.sum(logp_micro).alias("__lp__"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            "n_oov",
            _floor6(-F.col("__lp__") / (F.col("n_tokens") * F.lit(1e6))).alias("nll"),
        )
    )


def bigram_interp_score(
    score_docs: DataFrame,
    train_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Interpolated bigram-LM quality score (Jelinek-Mercer with a fixed
    dyadic λ=0.75): per document, the mean negative log-likelihood of its
    token bigrams under p(w|v) = 0.75·c(v,w)/c(v·) + 0.25·p₁(w), where
    p₁ is the add-one unigram model — the standard step up from the
    unigram filter that additionally penalizes scrambled word ORDER
    (bag-of-words-identical gibberish scores the same under unigrams).

    Returns (id, n_bigrams, n_unseen, nll); positions 2..n are scored,
    so documents with <2 tokens are absent. Unseen contexts fall back
    entirely to the unigram term (the bigram term coalesces to 0).

    Determinism: λ is a dyadic float, both model terms are single IEEE
    divisions of exact integer counts, and each bigram's log-prob snaps
    to integer micros before the per-document sum — the
    unigram_logprob_score contract extended to two terms.

    Scale: bigram extraction is a pure projection (arrays_zip of two
    slices — no window, no shuffle); the model is two count shuffles
    (bigrams, then contexts as a sum over the bigram table); scoring is
    equi-joins against zipfian-small count tables plus one groupBy(id).
    """

    def _pairs(df: DataFrame) -> DataFrame:
        t = tokens(F.col(text_col))
        n = F.size(t)
        z = F.arrays_zip(
            F.slice(t, 1, n - 1).alias("prev"), F.slice(t, 2, n - 1).alias("cur")
        )
        return df.select(
            F.col(id_col).alias("id"), F.explode(z).alias("__p__")
        ).select("id", F.col("__p__.prev").alias("prev"), F.col("__p__.cur").alias("cur"))

    train_pairs = _pairs(train_docs)
    bi = train_pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("cb"))
    ctx = bi.groupBy("prev").agg(F.sum("cb").alias("cp"))
    vocab = (
        train_docs.select(F.explode(tokens(F.col(text_col))).alias("cur"))
        .groupBy("cur")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = vocab.agg(
        F.sum("c").alias("__n__"), F.count(F.lit(1)).alias("__v__")
    )
    bterm = F.coalesce(
        F.lit(0.75) * F.coalesce(F.col("cb"), F.lit(0)) / F.col("cp"), F.lit(0.0)
    )
    uterm = (
        F.lit(0.25)
        * (F.coalesce(F.col("c"), F.lit(0)) + 1)
        / (F.col("__n__") + F.col("__v__"))
    )
    logp_micro = F.floor(F.log(bterm + uterm) * 1e6 + F.lit(0.5)).cast("long")
    return (
        _pairs(score_docs)
        .join(bi.hint("merge"), ["prev", "cur"], "left")
        .join(ctx.hint("merge"), "prev", "left")
        .join(vocab.hint("merge"), "cur", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.when(F.col("cb").isNull(), 1).otherwise(0)).alias("n_unseen"),
            F.sum(logp_micro).alias("__lp__"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_bigrams",
            "n_unseen",
            _floor6(-F.col("__lp__") / (F.col("n_bigrams") * F.lit(1e6))).alias("nll"),
        )
    )


# -- PII redaction -----------------------------------------------------------

PII_PATTERNS: dict[str, str] = {
    # order matters: emails first (their dots would otherwise feed ipv4)
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def redact_pii(
    docs: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Redact emails/phones/IPv4s with typed placeholders and count each
    match class (counted on the original text, then replaced in
    PII_PATTERNS order). Pure regexp projection — no shuffle, JVM regex,
    safe to run inline in any scan."""
    txt = F.col(text_col)
    out = docs
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(f"n_{name}", F.regexp_count(txt, F.lit(pat)))
    red = txt
    for name, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"[{name.upper()}]")
    return out.withColumn(out_col, red)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Fixed-window document chunking with overlap — the standard
    pre-tokenization split for long documents in a pretraining pipeline
    (each chunk keeps `overlap` trailing chars of its predecessor for
    context continuity).

    Chunk i covers [i·stride, i·stride + window) with
    stride = window − overlap; a document of length L yields
    max(1, ceil((L − overlap) / stride)) chunks, so every character
    lands in ≥1 chunk and only the last chunk may be short. Pure
    codegen: sequence → transform → posexplode — no UDF, no shuffle
    beyond the explode's partition-local fan-out; at 100 TB chunking is
    map-only and composes with downstream token counting/packing.

    Output: (id, chunk_index, chunk, chunk_len).
    """
    if overlap >= window:
        raise ValueError("overlap must be smaller than window")
    stride = window - overlap
    n_chunks = F.greatest(
        F.lit(1), F.ceil((F.length(F.col(text_col)) - overlap) / F.lit(stride))
    ).cast("int")
    pieces = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.col(text_col).substr(i * stride + 1, F.lit(window)),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(pieces).alias("chunk_index", "chunk"),
    ).withColumn("chunk_len", F.length("chunk"))


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "compression_ratio",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    classic repetition/boilerplate signal (Gopher-style filters drop
    documents that compress too well: templated spam sits far below
    natural prose, which lands ~0.4-0.7).

    Arrow-batched pandas UDF (DEFLATE has no relational form), map-only
    — no shuffle, scales embarrassingly. Fixed level ⇒ deterministic
    output bytes ⇒ reproducible scores.
    """
    import pandas as pd
    import zlib

    # explicit returnType form: `from __future__ import annotations`
    # stringifies hints, which the decorator's inference rejects
    def _ratio(texts):
        out = []
        for t in texts:
            if not t:
                out.append(None)
                continue
            raw = t.encode("utf-8")
            out.append(len(zlib.compress(raw, level)) / len(raw))
        return pd.Series(out, dtype="float64")

    ratio = F.pandas_udf(_ratio, "double")
    return docs.withColumn(out_col, ratio(F.col(text_col)))


def cap_per_group(
    docs: DataFrame,
    group_col: str = "source",
    cap: int = 100,
    order_by: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source/domain document caps — the web-corpus balancing op
    ("no domain contributes more than N pages"): keep the top ``cap``
    documents of each ``group_col`` value ranked by ``order_by``
    descending (ties broken by ascending id, so the result is
    deterministic).

    One window rank per group — Spark plans it as a single hash
    shuffle on the group key with rank computed sort-locally per
    partition; with AQE a skewed mega-domain splits across tasks at the
    shuffle and only the rank stage sees it whole. Returns the kept
    rows plus their ``group_rank``.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(
        F.col(order_by).desc(), F.col(id_col).asc()
    )
    return (
        docs.withColumn("group_rank", F.row_number().over(w))
        .where(F.col("group_rank") <= cap)
    )


def simpson_index(
    docs: DataFrame,
    group_cols: Sequence[str] = ("source",),
    text_col: str = "text",
) -> DataFrame:
    """Per-group lexical concentration: Simpson's index over the word
    distribution, Σ nᵢ(nᵢ−1) / (N(N−1)) — the probability two tokens
    drawn without replacement are the same word. The drift monitor for
    mixture pipelines: a source whose index climbs is collapsing onto
    template text (complements compression_ratio, which needs a decode
    pass; this is two integer aggregations).

    Returns (group, n_tokens, distinct_words, simpson_num, simpson) —
    the numerator stays an exact BIGINT so the double division is the
    only float op (deterministic; bounded < 2^53 for any realistic
    per-group token count).

    Scale: explode → two chained groupBy aggregations on (group, word)
    then (group) — map-side partials both, shuffle volume bounded by
    distinct words per group.
    """
    from arrow_spark.llm.tokenize import WORD_RE

    words = docs.select(
        *[F.col(c) for c in group_cols],
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)")
        ).alias("word"),
    )
    per_word = words.groupBy(*group_cols, "word").agg(
        F.count(F.lit(1)).alias("n_i")
    )
    return (
        per_word.groupBy(*group_cols)
        .agg(
            F.sum("n_i").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("distinct_words"),
            F.sum(F.col("n_i") * (F.col("n_i") - 1)).cast("long").alias("simpson_num"),
        )
        .withColumn(
            "simpson",
            F.col("simpson_num").cast("double")
            / (F.col("n_tokens") * (F.col("n_tokens") - 1)).cast("double"),
        )
    )


def keyness_terms(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Top-k discriminative terms per group: smoothed log-odds of the
    term in the group vs. the rest of the corpus (the corpus-comparison
    keyword extractor — "what does this source talk about that others
    don't", the complement of tfidf_top_terms' per-document view).

    keyness(w, s) = ln( (a+½)(d+½) / ((b+½)(c+½)) ) over the 2×2 token
    contingency table (a: w in s; b: w elsewhere; c: other tokens in s;
    d: other tokens elsewhere). Scores are micro-snapped so the ranking
    replays exactly cross-engine (same posture as BM25).

    Scale: one (group, word) aggregation, one word aggregation, two
    broadcast-size totals — all map-side-combined; the 2×2 algebra is a
    codegen projection and the top-k is a per-group window over the
    candidate (group, word) table.
    """
    from arrow_spark.llm.tokenize import WORD_RE

    words = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)")
        ).alias("word"),
    )
    a_tab = words.groupBy("grp", "word").agg(F.count(F.lit(1)).alias("a"))
    w_tot = a_tab.groupBy("word").agg(F.sum("a").alias("wt"))
    g_tot = a_tab.groupBy("grp").agg(F.sum("a").alias("ns"))
    n_tot = a_tab.agg(F.sum("a").alias("n"))
    half = F.lit(0.5)
    scored = (
        a_tab.join(w_tot.hint("merge"), "word")
        .join(F.broadcast(g_tot), "grp")
        .crossJoin(F.broadcast(n_tot))
        .withColumn("b", F.col("wt") - F.col("a"))
        .withColumn("c", F.col("ns") - F.col("a"))
        .withColumn("d", F.col("n") - F.col("ns") - F.col("b"))
        .withColumn(
            "keyness_micro",
            F.floor(
                F.log(
                    ((F.col("a") + half) * (F.col("d") + half))
                    / ((F.col("b") + half) * (F.col("c") + half))
                )
                * 1e6
                + half
            ).cast("long"),
        )
    )
    w = W.partitionBy("grp").orderBy(F.col("keyness_micro").desc(), F.col("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("grp").alias(group_col),
            "rank",
            F.col("word").alias("term"),
            (F.col("keyness_micro") / 1e6).alias("keyness"),
        )
    )


def packing_efficiency(
    manifest: DataFrame, max_len: int = 2048
) -> DataFrame:
    """Packing-efficiency report from a pack_sequences manifest: per
    shard, document/token totals and the padding waste of the final
    partial sequence (concat-and-split wastes ONLY the tail of each
    shard — interior sequences are full by construction).

    One shard-keyed aggregation over the manifest (manifest rows are one
    per document — metadata-sized relative to the corpus). Exact integer
    cells + one deterministic division.
    """
    per_shard = manifest.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.max(F.col("seq_last")).cast("long").alias("last_seq"),
    )
    n_seqs = F.col("last_seq") + 1
    padding = n_seqs * max_len - F.col("n_tokens")
    return per_shard.select(
        "shard",
        "n_docs",
        "n_tokens",
        n_seqs.alias("n_seqs"),
        padding.alias("padding_tokens"),
        (F.col("n_tokens").cast("double") / (n_seqs * max_len).cast("double")).alias(
            "fill_ratio"
        ),
    )


def tv_drift(
    docs: DataFrame,
    group_cols: Sequence[str] = ("source",),
    text_col: str = "text",
) -> DataFrame:
    """Per-group total-variation distance between the group's word
    distribution and the POOLED corpus distribution — the mixture-drift
    monitor that, unlike KL/JS, needs NO logarithm: TV = ½·Σ|p − q| has
    an all-integer numerator under the common denominator

        Σ_k |c_gk·N − r_k·n_g|   over every key k in the pooled vocab,

    so the statistic is exact integers until ONE final division —
    hash-exact cross-engine with zero transcendentals (ln differs in
    the last ulp between engines; TV sidesteps the whole class).

    Keys absent from the group still carry mass |0·N − r_k·n_g|; they
    are NEVER materialized — their total is (N − Σ_{k∈group} r_k)·n_g,
    recovered from the group's own keys alone. Join cost is therefore
    ∝ per-group vocab, not groups × vocab.

    Returns (group…, n_tokens, tv_distance) with tv ∈ [0, 1]; 0 = the
    group's distribution equals the pool, 1 = disjoint support.

    Scale anatomy: explode → (group, word) cells (map-side combined) →
    vocab-keyed equi-join to the pooled counts (broadcast when the
    vocab is small) + broadcast group totals; numerator sums run in
    decimal(38,0) so c·N never overflows at corpus scale. The final
    decimal→double cast is exact below 2^53 — beyond that the TV value
    itself is still correct to double precision but no longer bit-
    replayable; snap upstream counts if that matters.
    """
    from arrow_spark.llm.tokenize import WORD_RE

    groups = [F.col(c) for c in group_cols]
    words = docs.select(
        *groups,
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)")
        ).alias("word"),
    )
    cells = words.groupBy(*group_cols, "word").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ref = cells.groupBy("word").agg(F.sum("c").cast("long").alias("r"))
    gt = cells.groupBy(*group_cols).agg(F.sum("c").cast("long").alias("ng"))
    nt = cells.agg(F.sum("c").cast("long").alias("n"))
    d = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    joined = (
        cells.join(ref.hint("merge"), "word")
        .join(F.broadcast(gt), list(group_cols))
        .crossJoin(F.broadcast(nt))
    )
    agg = joined.groupBy(*group_cols, "ng", "n").agg(
        F.sum(F.abs(d(F.col("c")) * d(F.col("n")) - d(F.col("r")) * d(F.col("ng"))))
        .alias("present_num"),
        F.sum("r").cast("long").alias("r_present"),
    )
    tv_num = F.col("present_num") + d(F.col("n") - F.col("r_present")) * d(
        F.col("ng")
    )
    return agg.select(
        *group_cols,
        F.col("ng").alias("n_tokens"),
        (
            tv_num.cast("double")
            / (d(F.lit(2)) * d(F.col("ng")) * d(F.col("n"))).cast("double")
        ).alias("tv_distance"),
    )


def negative_samples(
    docs: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
    k: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    each document, up to ``k`` pseudo-random OTHER-group documents —
    (id, slot, neg_id, neg_group). The training-data op behind
    contrastive embedding objectives and hard-negative mining seeds.

    Candidates are drawn by the PORTABLE hash (md5, bit-identical in
    DuckDB) modulo the corpus size, so the sample is reproducible,
    shardable, and value-hash verifiable — no RNG state anywhere. The
    contract assumes DENSE ids 0..N−1 (the packed-corpus layout;
    re-index upstream otherwise — stratified_split's rank machinery
    does exactly that). Self-hits and same-``group_col`` collisions are
    FILTERED, so a document may receive fewer than k negatives (count
    per id downstream if exactness matters — resampling-to-exactly-k
    is a rejection loop, deliberately out of scope for a one-pass op).

    Shape: a k-way in-row explode, ONE equi-join on the candidate id
    to fetch the negative's group (dense ids make it a plain key join —
    broadcastable when the id→group map is dim-sized), one filter. Cost
    ∝ N·k at any scale.
    """
    from arrow_spark.functions.portable_hash import portable_hash64

    ids = docs.select(
        F.col(id_col).alias("id"), F.col(group_col).alias("grp")
    )
    total = ids.agg(F.count(F.lit(1)).alias("n_total"))
    cand = (
        ids.crossJoin(F.broadcast(total))
        .withColumn("slot", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .withColumn(
            "neg_id",
            portable_hash64(
                F.concat(
                    F.col("id").cast("string"),
                    F.lit(":"),
                    F.col("slot").cast("string"),
                ),
                seed,
            )
            % F.col("n_total"),
        )
    )
    neg = ids.select(
        F.col("id").alias("neg_id"), F.col("grp").alias("neg_group")
    )
    return (
        cand.join(neg, "neg_id")
        .where(
            (F.col("neg_id") != F.col("id"))
            & (F.col("neg_group") != F.col("grp"))
        )
        .select("id", "slot", "neg_id", "neg_group")
    )
