"""Corpus-pipeline oracle queries: contamination, repetition,
vocabulary, stratified sampling, mixture weights, PII redaction
(arrow_spark.llm.corpus). Each oracle rebuilds the op in DuckDB SQL —
including the word-n-gram construction and the md5 bucket arithmetic —
so the value hash checks the whole pipeline, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.llm.corpus import (
    mixture_weights,
    ngram_overlap,
    redact_pii,
    repetition_ratio,
    stratified_sample,
    vocabulary_topk,
)
from arrow_spark.queries.base import query

# word-trigram list per document, shared by two oracles; mirrors
# llm.dedup.shingles (zip_with construction) exactly, short-doc case
# included
_GRAMS = """
  CASE WHEN len(toks) >= 3
       THEN list_transform(generate_series(1, len(toks) - 2),
                           i -> array_to_string(list_slice(toks, i, i + 2), ' '))
       ELSE [array_to_string(toks, ' ')] END
"""

CONTAMINATION_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 10
           AS bucket,
         string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
), g AS (
  SELECT doc_id, bucket, unnest(list_distinct({_GRAMS})) AS g FROM t
), train_g AS (
  SELECT DISTINCT g FROM g WHERE bucket < 8
), probe AS (
  SELECT g.doc_id, g.g, CASE WHEN train_g.g IS NULL THEN 0 ELSE 1 END AS hit
  FROM g LEFT JOIN train_g USING (g)
  WHERE g.bucket = 9
)
SELECT doc_id, count(*) AS n_grams, CAST(sum(hit) AS BIGINT) AS n_shared,
       floor(sum(hit) * 1.0 / count(*) * 1e6 + 0.5) / 1e6 AS overlap
FROM probe
GROUP BY doc_id
"""


@query("corpus_contamination", oracle=CONTAMINATION_ORACLE)
def corpus_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """train/test leakage check: per test-split doc, the fraction of its
    distinct word trigrams found anywhere in the train split (split =
    the deterministic md5 buckets of text_hash_split; candidate
    generation is a gram equi-join, never doc×doc)."""
    d = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
            "int"
        )
        % 10
    )
    d = d.withColumn("__b__", bucket)
    return ngram_overlap(
        d.where(F.col("__b__") == 9), d.where(F.col("__b__") < 8), n=3
    )


REPETITION_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents
), g AS (
  SELECT doc_id, {_GRAMS} AS grams FROM t
)
SELECT doc_id, len(grams) AS n_grams,
       floor((1 - len(list_distinct(grams)) * 1.0 / len(grams)) * 1e6 + 0.5) / 1e6
         AS repetition
FROM g
"""


@query("corpus_repetition", oracle=REPETITION_ORACLE)
def corpus_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """within-doc duplicate-trigram ratio (Gopher-style repetition
    quality signal) — pure projection, no shuffle."""
    return repetition_ratio(table(spark, sf_dir, "documents"), n=3)


VOCAB_ORACLE = """
SELECT tok AS token, count(*) AS n
FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents)
GROUP BY tok
ORDER BY n DESC, tok
LIMIT 50
"""


@query("corpus_vocabulary_topk", oracle=VOCAB_ORACLE)
def corpus_vocabulary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """top-50 corpus tokens by frequency, token-tiebroken (deterministic
    cutoff; TakeOrderedAndProject keeps the driver at k rows)."""
    return vocabulary_topk(table(spark, sf_dir, "documents"), k=50)


SAMPLE_ORACLE = """
SELECT doc_id, lang, source
FROM (SELECT doc_id, lang, source,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100
               AS b
      FROM documents)
WHERE b < (CASE WHEN lang = 'en' THEN 20 ELSE 60 END)
"""


@query("corpus_stratified_sample", oracle=SAMPLE_ORACLE)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deterministic per-language downsampling (keep 20% of en, 60%
    otherwise) via md5 percent-buckets — membership growth-stable,
    shuffle-free; the per-row assignment is what the oracle hashes."""
    return stratified_sample(
        table(spark, sf_dir, "documents"),
        rates_pct={"en": 20},
        default_pct=60,
    ).select("doc_id", "lang", "source")


MIXTURE_ORACLE = """
WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
t AS (SELECT sum(pow(n_docs, 0.5)) AS tot FROM c)
SELECT source, n_docs,
       floor(pow(n_docs, 0.5) / tot * 1e6 + 0.5) / 1e6 AS share
FROM c, t
"""


@query("corpus_mixture_weights", oracle=MIXTURE_ORACLE)
def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """temperature-scaled (α=0.5) source mixture weights — the
    multi-source sampling table a data loader consumes."""
    return mixture_weights(table(spark, sf_dir, "documents"), by="source", alpha=0.5)


# PII is synthesized deterministically from doc_id in BOTH engines so the
# redaction counts are non-zero and the whole redact pipeline is
# value-hash-checked (the fixture text itself contains no PII).
PII_ORACLE = r"""
WITH d AS (
  SELECT doc_id,
         text || ' contact doc' || doc_id || '@corp.example call 555-123-4567 at 10.0.0.'
              || (doc_id % 255) AS text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
         AS n_email,
       len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phone,
       len(regexp_extract_all(text, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS n_ipv4,
       regexp_replace(
         regexp_replace(
           regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
           '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g'),
         '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IPV4]', 'g') AS redacted
FROM d
"""


@query("corpus_pii_redact", oracle=PII_ORACLE)
def corpus_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """typed PII redaction (email/phone/IPv4) with per-class counts;
    the PII is planted deterministically from doc_id on both engines so
    counts and redacted text are non-trivially oracle-checked."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact doc"),
            F.col("doc_id").cast("string"),
            F.lit("@corp.example call 555-123-4567 at 10.0.0."),
            (F.col("doc_id") % 255).cast("string"),
        ).alias("text"),
    )
    out = redact_pii(d)
    return out.select("doc_id", "n_email", "n_phone", "n_ipv4", "redacted")


PACK_ORACLE = """
WITH d AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 8
           AS shard,
         len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens
  FROM documents
), offs AS (
  SELECT doc_id, shard, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS start_tok
  FROM d
)
SELECT doc_id, shard, n_tokens, start_tok,
       CAST(floor(start_tok / 512) AS BIGINT) AS seq_first,
       CAST(floor((start_tok + n_tokens - 1) / 512) AS BIGINT) AS seq_last
FROM offs
"""


@query("corpus_pack_sequences", oracle=PACK_ORACLE)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat-and-split packing manifest (max_len=512, 8 hash shards):
    per-doc start offset and covered sequence range from a per-shard
    running token sum — the exact table a training loader consumes; every
    offset oracle-checked."""
    from arrow_spark.llm.corpus import pack_sequences

    return pack_sequences(table(spark, sf_dir, "documents"), max_len=512, shards=8)


# the whole training-data pipeline as ONE relational plan: quality
# filter → exact-dedup keepers → stratified sample → packing manifest.
PIPELINE_ORACLE = """
WITH scored AS (
  SELECT doc_id, lang, text,
         len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens
  FROM documents
), quality AS (
  SELECT * FROM scored WHERE n_tokens BETWEEN 20 AND 120
), keepers AS (
  SELECT min(doc_id) AS doc_id
  FROM quality
  GROUP BY md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
), kept AS (
  SELECT q.doc_id, q.lang, q.n_tokens
  FROM quality q JOIN keepers USING (doc_id)
), sampled AS (
  SELECT * FROM kept
  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100
        < (CASE WHEN lang = 'en' THEN 50 ELSE 100 END)
), sharded AS (
  SELECT doc_id, lang, n_tokens,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 4
           AS shard
  FROM sampled
)
SELECT doc_id, lang, shard, n_tokens,
       CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS BIGINT) AS start_tok
FROM sharded
"""


@query("corpus_pipeline_end_to_end", oracle=PIPELINE_ORACLE)
def corpus_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """the full pretraining-data pipeline as one Catalyst plan: token
    quality gate → exact-dedup keepers (min doc_id per normalized
    fingerprint) → per-language hash downsampling → sharded packing
    offsets. Every stage composes relationally — filters push into the
    scan, the dedup is one fingerprint shuffle, sampling is a map, the
    manifest is a per-shard window — and the single DuckDB oracle
    hash-checks the composition end to end."""
    from arrow_spark.llm.dedup import normalize_text

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text",
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("n_tokens"),
    )
    quality = d.where(F.col("n_tokens").between(20, 120))
    keepers = (
        quality.groupBy(F.md5(normalize_text(F.col("text"))).alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = quality.join(keepers, "doc_id").select("doc_id", "lang", "n_tokens")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast("int")
    )
    sampled = kept.where(
        (bucket % 100) < F.when(F.col("lang") == "en", 50).otherwise(100)
    )
    sharded = sampled.withColumn("shard", bucket % 4)
    from pyspark.sql import Window as W

    w = W.partitionBy("shard").orderBy("doc_id")
    start = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
    )
    return sharded.select("doc_id", "lang", "shard", "n_tokens", start.alias("start_tok"))


LM_SCORE_ORACLE = """
WITH t AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 10
           AS bucket,
         string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
), tok AS (
  SELECT doc_id, bucket, unnest(toks) AS token FROM t
), vocab AS (
  SELECT token, count(*) AS c FROM tok WHERE bucket < 8 GROUP BY token
), tot AS (
  SELECT sum(c) AS n, count(*) AS v FROM vocab
), scored AS (
  SELECT tok.doc_id, vocab.c FROM tok LEFT JOIN vocab USING (token)
  WHERE tok.bucket = 9
)
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       floor((-sum(CAST(floor(ln((coalesce(c, 0) + 1) / (n + v)) * 1e6 + 0.5)
                        AS BIGINT))
              / (count(*) * 1e6)) * 1e6 + 0.5) / 1e6 AS nll
FROM scored, tot
GROUP BY doc_id
"""


@query("corpus_lm_score", oracle=LM_SCORE_ORACLE)
def corpus_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unigram-LM perplexity filter: add-one-smoothed model trained on
    the md5 train split (buckets < 8), mean negative log-likelihood +
    OOV count per test-split doc (bucket 9). Token log-probs snap to
    integer micros before the sum, so cross-engine float accumulation
    order cannot move the hash."""
    from arrow_spark.llm.corpus import unigram_logprob_score

    d = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
            "int"
        )
        % 10
    )
    d = d.withColumn("__b__", bucket)
    return unigram_logprob_score(
        d.where(F.col("__b__") == 9), d.where(F.col("__b__") < 8)
    )


STRATIFIED_SPLIT_ORACLE = """
WITH d AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
  FROM documents
), r AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk,
         count(*) OVER (PARTITION BY lang) AS n
  FROM d
)
SELECT doc_id, lang,
       CASE WHEN rk <= n * 8 // 10 THEN 'train'
            WHEN rk <= n * 9 // 10 THEN 'val'
            ELSE 'test' END AS split
FROM r
"""


@query("corpus_stratified_split", oracle=STRATIFIED_SPLIT_ORACLE)
def corpus_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-proportion stratified 80/10/10 split per language: rank in
    deterministic md5-hash order within each stratum, integer cutoffs —
    unlike the pure hash split, rare strata get precisely their share.
    The engine computes the rank TWO-LEVEL (per-bucket row_number +
    metadata-frame offsets, so no window partition ever holds a whole
    stratum at 100 TB); the oracle is the naive single-window rank —
    the hash match proves the decomposition exact."""
    from arrow_spark.llm.corpus import stratified_split

    return stratified_split(table(spark, sf_dir, "documents"))


BIGRAM_SCORE_ORACLE = """
WITH t AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 10
           AS bucket,
         string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
), pairs AS (
  SELECT doc_id, bucket, toks[pos - 1] AS prev, toks[pos] AS cur
  FROM (SELECT doc_id, bucket, toks,
               unnest(generate_series(2, len(toks))) AS pos
        FROM t)
), bi AS (
  SELECT prev, cur, count(*) AS cb FROM pairs WHERE bucket < 8 GROUP BY 1, 2
), ctx AS (
  SELECT prev, CAST(sum(cb) AS BIGINT) AS cp FROM bi GROUP BY 1
), tok AS (
  SELECT unnest(toks) AS cur FROM t WHERE bucket < 8
), vocab AS (
  SELECT cur, count(*) AS c FROM tok GROUP BY cur
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM vocab
), scored AS (
  SELECT p.doc_id,
         floor(ln(coalesce(0.75 * coalesce(bi.cb, 0) / ctx.cp, 0)
                  + 0.25 * (coalesce(vocab.c, 0) + 1) / (tot.n + tot.v))
               * 1e6 + 0.5) AS lp,
         CASE WHEN bi.cb IS NULL THEN 1 ELSE 0 END AS unseen
  FROM pairs p
  LEFT JOIN bi ON p.prev = bi.prev AND p.cur = bi.cur
  LEFT JOIN ctx ON p.prev = ctx.prev
  LEFT JOIN vocab ON p.cur = vocab.cur
  CROSS JOIN tot
  WHERE p.bucket = 9
)
SELECT doc_id,
       count(*) AS n_bigrams,
       CAST(sum(unseen) AS BIGINT) AS n_unseen,
       floor((-sum(CAST(lp AS BIGINT)) / (count(*) * 1e6)) * 1e6 + 0.5) / 1e6
         AS nll
FROM scored
GROUP BY doc_id
"""


@query("corpus_bigram_lm_score", oracle=BIGRAM_SCORE_ORACLE)
def corpus_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """interpolated bigram-LM perplexity filter (Jelinek-Mercer, dyadic
    λ=0.75 over an add-one unigram backoff): trained on the md5 train
    split, scored on bucket 9 — the word-ORDER-sensitive upgrade of
    corpus_lm_score. Bigram extraction is a pure projection (arrays_zip
    of two slices), per-bigram log-probs snap to integer micros before
    the sum, so the whole score is hash-exact."""
    from arrow_spark.llm.corpus import bigram_interp_score

    d = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
            "int"
        )
        % 10
    )
    d = d.withColumn("__b__", bucket)
    return bigram_interp_score(
        d.where(F.col("__b__") == 9), d.where(F.col("__b__") < 8)
    )


WEIGHTED_SAMPLE_ORACLE = """
WITH d AS (
  SELECT doc_id, n_chars,
         ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
             + 0.5) / 16777216.0) / n_chars AS p
  FROM documents
)
SELECT doc_id, n_chars, floor(p * 1e6 + 0.5) / 1e6 AS priority
FROM d
ORDER BY p DESC, doc_id ASC
LIMIT 50
"""


@query("corpus_weighted_sample", oracle=WEIGHTED_SAMPLE_ORACLE)
def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """derandomized Efraimidis–Spirakis weighted sampling without
    replacement: 50 docs drawn by length-weighted priority ln(u)/w with
    md5-derived uniforms — per-row membership is oracle-checked, so the
    hash proves the sample is the exact deterministic winner set."""
    from arrow_spark.llm.corpus import weighted_sample

    return weighted_sample(table(spark, sf_dir, "documents"), "n_chars", 50)


CHUNK_ORACLE = """
WITH n AS (
  SELECT doc_id, text,
         GREATEST(1, CAST(CEIL((LENGTH(text) - 64) / 448.0) AS INT)) AS k
  FROM documents
), e AS (
  SELECT doc_id, text,
         unnest(generate_series(0, k - 1)) AS chunk_index
  FROM n
)
SELECT doc_id, CAST(chunk_index AS INT) AS chunk_index,
       substr(text, chunk_index * 448 + 1, 512) AS chunk,
       CAST(LENGTH(substr(text, chunk_index * 448 + 1, 512)) AS INT) AS chunk_len
FROM e
"""


@query("corpus_chunk_documents", oracle=CHUNK_ORACLE)
def corpus_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fixed-window document chunking with 64-char overlap (window 512,
    stride 448) — the pre-tokenization split for long documents. Pure
    codegen sequence→transform→posexplode, map-only at any scale; every
    chunk boundary is oracle-checked."""
    from arrow_spark.llm.corpus import chunk_documents

    out = chunk_documents(
        table(spark, sf_dir, "documents"), window=512, overlap=64
    )
    return out.select(
        "doc_id",
        F.col("chunk_index").cast("int").alias("chunk_index"),
        "chunk",
        F.col("chunk_len").cast("int").alias("chunk_len"),
    )


SOURCE_CAPS_ORACLE = """
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS group_rank
  FROM documents
)
SELECT doc_id, source, n_chars, CAST(group_rank AS INT) AS group_rank
FROM ranked WHERE group_rank <= 15
"""


@query("corpus_source_caps", oracle=SOURCE_CAPS_ORACLE)
def corpus_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """per-source document caps — the web-corpus balancing op ("no
    domain contributes more than N pages"): keep the 15 longest
    documents per source, ties to the smaller doc_id (cap binds: 25 docs/source in the fixture). One window rank
    per group key; the oracle replays the identical ranking."""
    from arrow_spark.llm.corpus import cap_per_group

    out = cap_per_group(
        table(spark, sf_dir, "documents"), group_col="source", cap=15,
        order_by="n_chars",
    )
    return out.select("doc_id", "source", "n_chars", "group_rank")


SIMPSON_ORACLE = """
WITH words AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents
), pw AS (
  SELECT source, word, count(*) AS n_i FROM words GROUP BY 1, 2
), agg AS (
  SELECT source,
         CAST(sum(n_i) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS distinct_words,
         CAST(sum(n_i * (n_i - 1)) AS BIGINT) AS simpson_num
  FROM pw GROUP BY source
)
SELECT source, n_tokens, distinct_words, simpson_num,
       CAST(simpson_num AS DOUBLE) / CAST(n_tokens * (n_tokens - 1) AS DOUBLE)
         AS simpson
FROM agg
"""


@query("corpus_source_diversity", oracle=SIMPSON_ORACLE)
def corpus_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Simpson concentration over the word distribution — the
    mixture-drift monitor. Integer numerator/denominator keep the single
    float division deterministic, so the index is hash-exact."""
    from arrow_spark.llm.corpus import simpson_index

    return simpson_index(table(spark, sf_dir, "documents"))


KEYNESS_ORACLE = """
WITH words AS (
  SELECT source AS grp, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents
), a_tab AS (
  SELECT grp, word, count(*) AS a FROM words GROUP BY 1, 2
), wt AS (SELECT word, sum(a) AS wt FROM a_tab GROUP BY 1),
gt AS (SELECT grp, sum(a) AS ns FROM a_tab GROUP BY 1),
nt AS (SELECT sum(a) AS n FROM a_tab),
sc AS (
  SELECT grp, word,
         CAST(floor(ln(((a + 0.5) * ((n - ns - (wt - a)) + 0.5))
                       / (((wt - a) + 0.5) * ((ns - a) + 0.5))) * 1e6 + 0.5)
              AS BIGINT) AS km
  FROM a_tab JOIN wt USING (word) JOIN gt USING (grp), nt
), r AS (
  SELECT grp, word, km,
         row_number() OVER (PARTITION BY grp ORDER BY km DESC, word) AS rank
  FROM sc
)
SELECT grp AS source, rank, word AS term, km / 1e6 AS keyness
FROM r WHERE rank <= 10
"""


@query("corpus_keyness_terms", oracle=KEYNESS_ORACLE)
def corpus_keyness_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 discriminative terms per source by smoothed log-odds vs
    the rest of the corpus — the corpus-comparison keyword extractor.
    Contingency cells are exact integers; the score is micro-snapped, so
    ranks and values replay hash-exact."""
    from arrow_spark.llm.corpus import keyness_terms

    return keyness_terms(table(spark, sf_dir, "documents"))


PACKING_EFF_ORACLE = """
WITH m AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 8
              AS BIGINT) AS shard,
         len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens
  FROM documents
), w AS (
  SELECT shard, doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
  FROM m
), per AS (
  SELECT shard,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         CAST(max((start_tok + n_tokens - 1) // 2048) AS BIGINT) + 1 AS n_seqs
  FROM w GROUP BY shard
)
SELECT shard, n_docs, n_tokens, n_seqs,
       n_seqs * 2048 - n_tokens AS padding_tokens,
       CAST(n_tokens AS DOUBLE) / CAST(n_seqs * 2048 AS DOUBLE) AS fill_ratio
FROM per
"""


@query("corpus_packing_efficiency", oracle=PACKING_EFF_ORACLE)
def corpus_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """packing-efficiency report over the pack_sequences manifest: per
    shard, docs/tokens/sequences and the tail padding waste — the
    loader-utilization number a packing config is judged by. Exact
    integer cells + one deterministic division."""
    from arrow_spark.llm.corpus import pack_sequences, packing_efficiency

    manifest = pack_sequences(table(spark, sf_dir, "documents"))
    return packing_efficiency(manifest, max_len=2048).select(
        F.col("shard").cast("long").alias("shard"),
        "n_docs", "n_tokens", "n_seqs", "padding_tokens", "fill_ratio",
    )


TV_DRIFT_ORACLE = """
WITH words AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents
), cells AS (
  SELECT source, word, CAST(count(*) AS BIGINT) AS c FROM words GROUP BY 1, 2
), ref AS (
  SELECT word, CAST(sum(c) AS BIGINT) AS r FROM cells GROUP BY 1
), gt AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS ng FROM cells GROUP BY 1
), nt AS (
  SELECT CAST(sum(c) AS BIGINT) AS n FROM cells
), agg AS (
  SELECT cells.source, gt.ng, nt.n,
         sum(abs(c * n - r * ng)) AS present_num,
         CAST(sum(r) AS BIGINT) AS r_present
  FROM cells
  JOIN ref USING (word)
  JOIN gt USING (source), nt
  GROUP BY cells.source, gt.ng, nt.n
)
SELECT source, ng AS n_tokens,
       CAST(present_num + (n - r_present) * ng AS DOUBLE)
         / CAST(2 * ng * n AS DOUBLE) AS tv_distance
FROM agg
"""


@query("corpus_distribution_drift", oracle=TV_DRIFT_ORACLE)
def corpus_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """per-source total-variation distance vs the pooled word
    distribution — the log-free mixture-drift monitor: the numerator is
    Σ|c_g·N − r·n_g| in exact integers (absent-key mass recovered
    algebraically, never materialized), so the single final division is
    hash-exact with zero transcendentals (llm/corpus.py::tv_drift).
    Complements corpus_source_diversity (within-group concentration)
    with a between-group distance."""
    from arrow_spark.llm.corpus import tv_drift

    return tv_drift(table(spark, sf_dir, "documents"))


ZIPF_ORACLE = """
WITH words AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents
), cells AS (
  SELECT source, word, CAST(count(*) AS BIGINT) AS c FROM words GROUP BY 1, 2
), ranked AS (
  SELECT source,
         CAST(floor(ln(row_number() OVER (PARTITION BY source
                        ORDER BY c DESC, word)) * 1e6 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(c) * 1e6 + 0.5) AS BIGINT) AS y
  FROM cells
), m AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM ranked GROUP BY source
), fit AS (
  SELECT source, n,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
         CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
           / (CAST(n * sxx - sx * sx AS DOUBLE)
              * CAST(n * syy - sy * sy AS DOUBLE)) AS r2
  FROM m
)
SELECT source, n AS n_points,
       floor(slope * 1e6 + 0.5) / 1e6 AS zipf_slope,
       floor(least(greatest(r2, 0.0), 1.0) * 1e6 + 0.5) / 1e6 AS r2
FROM fit
"""


@query("corpus_zipf_slope", oracle=ZIPF_ORACLE)
def corpus_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """per-source Zipf-law fit: OLS slope of ln(freq) on ln(rank) over
    the word-frequency table (natural text ≈ −1; templated/synthetic
    sources drift toward 0 — a corpus-quality fingerprint). Log values
    micro-snap to integers BEFORE the moment sums (the keyness ln
    discipline), so the five sums are exact and the closed form is two
    deterministic divisions — hash-exact. Rank window runs over the
    per-source vocab, never rows."""
    from pyspark.sql import Window as W

    from arrow_spark.llm.tokenize import WORD_RE

    d = table(spark, sf_dir, "documents")
    words = d.select(
        "source",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{WORD_RE}', 0)")
        ).alias("word"),
    )
    cells = words.groupBy("source", "word").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    rn = F.row_number().over(
        W.partitionBy("source").orderBy(F.col("c").desc(), F.col("word"))
    )
    ranked = cells.select(
        "source",
        F.floor(F.log(rn.cast("double")) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("c").cast("double")) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    m = ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    n = F.col("n")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    det = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ssy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = num / det
    r2 = F.least(F.greatest(num * num / (det * ssy), F.lit(0.0)), F.lit(1.0))
    return m.select(
        "source",
        F.col("n").alias("n_points"),
        (F.floor(slope * 1e6 + F.lit(0.5)) / 1e6).alias("zipf_slope"),
        (F.floor(r2 * 1e6 + F.lit(0.5)) / 1e6).alias("r2"),
    )


HEAVY_HITTERS_ORACLE = """
WITH w AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS item
  FROM documents
), c AS (
  SELECT item, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY 1
), n AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c
)
SELECT item, cnt, CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE) AS share
FROM c, n WHERE cnt * 30 > n
"""


@query("corpus_heavy_hitters", oracle=HEAVY_HITTERS_ORACLE)
def corpus_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exact words with share > 1/30 of the corpus by the two-pass
    candidate-then-recount scheme (operators/sketches.py::
    heavy_hitters): per-PHYSICAL-partition counts pigeonhole-guarantee
    no true hitter is missed, exact recount + strict integer
    cross-multiplied threshold make the result deterministic even
    though the candidate set isn't. The oracle is the naive full
    GROUP BY + HAVING — different algebra; the hash match proves the
    two-pass scheme loses nothing."""
    from arrow_spark.operators.sketches import heavy_hitters

    from arrow_spark.llm.tokenize import WORD_RE

    d = table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{WORD_RE}', 0)")
        ).alias("word")
    )
    return heavy_hitters(words, "word", k=30)


NEG_SAMPLES_ORACLE = """
WITH ids AS (
  SELECT doc_id AS id, source AS grp FROM documents
), total AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM ids
), cand AS (
  SELECT ids.id, ids.grp, s.slot,
         ('0x' || substr(md5('0:' || CAST(ids.id AS VARCHAR) || ':'
                              || CAST(s.slot AS VARCHAR)), 1, 15))::BIGINT
           % total.n AS neg_id
  FROM ids CROSS JOIN (SELECT unnest(range(0, 4)) AS slot) s, total
)
SELECT cand.id, CAST(cand.slot AS INT) AS slot, cand.neg_id,
       neg.grp AS neg_group
FROM cand JOIN ids neg ON cand.neg_id = neg.id
WHERE cand.neg_id <> cand.id AND neg.grp <> cand.grp
"""


@query("corpus_negative_samples", oracle=NEG_SAMPLES_ORACLE)
def corpus_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """contrastive-training negative sampling: up to 4 other-source
    negatives per document drawn by the portable hash mod corpus size —
    reproducible, shardable, value-hash verifiable, no RNG state
    (llm/corpus.py::negative_samples); one k-way explode + one dense-id
    equi-join + a self/same-group filter."""
    from arrow_spark.llm.corpus import negative_samples

    return negative_samples(
        table(spark, sf_dir, "documents"), "doc_id", "source", k=4
    )
