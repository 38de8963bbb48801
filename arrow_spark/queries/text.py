"""String kernel family (Arrow scalar_string_ascii.cc /
scalar_string_utf8.cc, SURVEY §2.2.4) + the LLM-pipeline text-analysis
extensions (token counting, quality scoring, language ID,
fingerprinting) over the documents fixture.

Arrow pairs ascii_*/utf8_* fast paths; Spark strings are always unicode
so one function covers both. Regex patterns are kept to the syntax
subset shared by Java regex (Spark) and RE2 (DuckDB) so oracles compare
semantics, not dialects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.queries.base import query

STRING_BASIC_ORACLE = """
SELECT
  doc_id,
  upper(text)                             AS upper_v,
  lower(source)                           AS lower_v,
  length(text)                            AS len_v,
  strlen(text)                            AS bytes_v,
  reverse(lang)                           AS rev_v,
  substr(text, 5, 12)                     AS slice_v,
  trim(concat(' ', lang, ' '))            AS trim_v,
  ltrim(concat('xx', lang), 'x')          AS ltrim_v,
  lpad(lang, 6, '_')                      AS lpad_v,
  rpad(lang, 6, '_')                      AS rpad_v,
  concat(lang, '-', source)               AS concat_v,
  concat_ws('|', lang, source)            AS concat_ws_v,
  repeat(lang, 3)                         AS repeat_v,
  starts_with(text, 'key')                AS starts_v,
  text LIKE '%table%'                     AS contains_v,
  position('row' IN text)                 AS find_v
FROM documents WHERE doc_id % 7 = 0
"""


@query("string_basic", oracle=STRING_BASIC_ORACLE)
def string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/length/byte-length/reverse/slice/trim/pad/concat/
    repeat/starts_with/match/find — the ascii+utf8 core."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0)
    txt, lang, src = F.col("text"), F.col("lang"), F.col("source")
    return d.select(
        "doc_id",
        F.upper(txt).alias("upper_v"),
        F.lower(src).alias("lower_v"),
        F.length(txt).alias("len_v"),
        F.octet_length(txt).cast("long").alias("bytes_v"),
        F.reverse(lang).alias("rev_v"),
        F.substring(txt, 5, 12).alias("slice_v"),
        F.trim(F.concat(F.lit(" "), lang, F.lit(" "))).alias("trim_v"),
        F.ltrim(F.concat(F.lit("xx"), lang), F.lit("x")).alias("ltrim_v"),
        F.lpad(lang, 6, "_").alias("lpad_v"),
        F.rpad(lang, 6, "_").alias("rpad_v"),
        F.concat(lang, F.lit("-"), src).alias("concat_v"),
        F.concat_ws("|", lang, src).alias("concat_ws_v"),
        F.repeat(lang, 3).alias("repeat_v"),
        txt.startswith("key").alias("starts_v"),
        txt.contains("table").alias("contains_v"),
        F.locate("row", txt).cast("long").alias("find_v"),
    )


STRING_REGEX_ORACLE = """
SELECT
  doc_id,
  regexp_matches(text, 'scan|batch')                    AS match_re,
  regexp_extract(text, '([a-z]+) (join|merge)', 1)      AS extract_re,
  regexp_replace(text, 'row', 'ROW', 'g')               AS replace_re,
  len(regexp_extract_all(text, 'value'))                AS count_re,
  len(string_split_regex(text, '\\s+'))                 AS split_n,
  string_split_regex(text, '\\s+')[2]                   AS second_token,
  replace(lang, 'e', 'E')                               AS replace_sub
FROM documents WHERE doc_id % 9 = 0
"""


@query("string_regex", oracle=STRING_REGEX_ORACLE)
def string_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """match_substring_regex / extract_regex / replace_substring_regex /
    count_substring_regex / split_pattern_regex."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") % 9 == 0)
    txt = F.col("text")
    toks = F.split(txt, r"\s+")
    return d.select(
        "doc_id",
        txt.rlike("scan|batch").alias("match_re"),
        F.regexp_extract(txt, r"([a-z]+) (join|merge)", 1).alias("extract_re"),
        F.regexp_replace(txt, "row", "ROW").alias("replace_re"),
        F.size(F.regexp_extract_all(txt, F.lit("(value)"))).cast("long").alias("count_re"),
        F.size(toks).cast("long").alias("split_n"),
        # try_ variant: a one-token document yields NULL (= DuckDB's
        # list[2]) instead of an ANSI INVALID_ARRAY_INDEX error
        F.try_element_at(toks, F.lit(2)).alias("second_token"),
        F.replace(F.col("lang"), F.lit("e"), F.lit("E")).alias("replace_sub"),
    )


STRING_CLASSIFY_ORACLE = """
SELECT
  doc_id, tok,
  tok ~ '^[0-9a-zA-Z]+$'          AS is_alnum,
  tok ~ '^[a-zA-Z]+$'             AS is_alpha,
  tok ~ '^[0-9]+$'                AS is_digit,
  tok = lower(tok)                AS is_lower,
  tok = upper(tok)                AS is_upper,
  tok ~ '^[ -~]*$'                AS is_ascii,
  upper(substr(tok, 1, 1)) || lower(substr(tok, 2)) AS capitalized
FROM (
  SELECT doc_id, string_split_regex(text, '\\s+')[1] AS tok
  FROM documents WHERE doc_id % 11 = 0
)
"""


@query("string_classify", oracle=STRING_CLASSIFY_ORACLE)
def string_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """utf8_is_alnum/alpha/digit/lower/upper, string_is_ascii,
    capitalize — expressed as codegen'd regex/case exprs."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") % 11 == 0)
    tok = F.element_at(F.split(F.col("text"), r"\s+"), 1).alias("tok")
    d = d.select("doc_id", tok)
    t = F.col("tok")
    return d.select(
        "doc_id",
        t,
        t.rlike("^[0-9a-zA-Z]+$").alias("is_alnum"),
        t.rlike("^[a-zA-Z]+$").alias("is_alpha"),
        t.rlike("^[0-9]+$").alias("is_digit"),
        (t == F.lower(t)).alias("is_lower"),
        (t == F.upper(t)).alias("is_upper"),
        t.rlike("^[ -~]*$").alias("is_ascii"),
        F.concat(F.upper(F.substring(t, 1, 1)), F.lower(F.substring(t, 2, 1000000))).alias(
            "capitalized"
        ),
    )


DISTANCE_ORACLE = """
WITH s AS (SELECT doc_id, substr(text, 1, 40) AS head, lang FROM documents WHERE doc_id % 50 = 0)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       levenshtein(a.head, b.head) AS edit_dist
FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
"""


@query("string_distance", oracle=DISTANCE_ORACLE)
def string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """levenshtein edit distance between document heads (near-dup
    scoring primitive; JVM builtin, lang-blocked pairs)."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") % 50 == 0)
    s = d.select("doc_id", F.substring("text", 1, 40).alias("head"), "lang")
    a = s.select(F.col("doc_id").alias("id_a"), F.col("head").alias("ha"), "lang")
    b = s.select(F.col("doc_id").alias("id_b"), F.col("head").alias("hb"), F.col("lang").alias("lang_b"))
    return (
        a.join(b, (F.col("lang") == F.col("lang_b")) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b", F.levenshtein("ha", "hb").alias("edit_dist"))
    )


# ---------------------------------------------------------------------------
# LLM-pipeline text analysis extensions (BASELINE.json north star).
# ---------------------------------------------------------------------------

TOKEN_COUNT_ORACLE = """
SELECT
  doc_id,
  len(string_split_regex(trim(text), '\\s+'))                   AS ws_tokens,
  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS bpe_ish_tokens,
  length(text)                                                  AS n_chars_actual,
  CAST(ceil(length(text) / 4.0) AS BIGINT)                      AS est_llm_tokens
FROM documents
"""


@query("text_token_count", oracle=TOKEN_COUNT_ORACLE)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token counting: whitespace tokens + BPE-ish regex pieces +
    chars/4 LLM-token estimate — all JVM regex, no UDF."""
    d = table(spark, sf_dir, "documents")
    txt = F.col("text")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(txt), r"\s+")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(txt, F.lit(r"([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s])")))
        .cast("long")
        .alias("bpe_ish_tokens"),
        F.length(txt).alias("n_chars_actual"),
        F.ceil(F.length(txt) / 4.0).alias("est_llm_tokens"),
    )


QUALITY_ORACLE = """
SELECT
  doc_id,
  length(text)                                                        AS n_chars,
  len(string_split_regex(trim(text), '\\s+'))                         AS n_words,
  floor((length(text) * 1.0 / len(string_split_regex(trim(text), '\\s+'))) * 1e6 + 0.5) / 1e6 AS avg_word_len,
  floor((len(regexp_extract_all(text, '[.!?,;:]')) * 1.0 / length(text)) * 1e6 + 0.5) / 1e6   AS punct_ratio,
  floor((len(regexp_extract_all(lower(text), '\\b(the|a|of|and|to|in|is|it)\\b')) * 1.0
         / len(string_split_regex(trim(text), '\\s+'))) * 1e6 + 0.5) / 1e6                     AS stopword_ratio,
  length(text) >= 100 AND len(string_split_regex(trim(text), '\\s+')) >= 20                    AS passes_length_gate
FROM documents
"""


@query("text_quality_score", oracle=QUALITY_ORACLE)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality scoring: length/punctuation/stopword ratios + gate — the
    classic pretraining-corpus filters, fully declarative."""
    d = table(spark, sf_dir, "documents")
    txt = F.col("text")
    n_chars = F.length(txt)
    n_words = F.size(F.split(F.trim(txt), r"\s+")).cast("long")
    punct = F.size(F.regexp_extract_all(txt, F.lit(r"([.!?,;:])"))).cast("long")
    stop = F.size(
        F.regexp_extract_all(F.lower(txt), F.lit(r"(\b(?:the|a|of|and|to|in|is|it)\b)"))
    ).cast("long")

    def r6(c):
        return F.floor(c * 1e6 + F.lit(0.5)) / 1e6

    return d.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        r6(n_chars * 1.0 / n_words).alias("avg_word_len"),
        r6(punct * 1.0 / n_chars).alias("punct_ratio"),
        r6(stop * 1.0 / n_words).alias("stopword_ratio"),
        ((n_chars >= 100) & (n_words >= 20)).alias("passes_length_gate"),
    )


LANG_ID_ORACLE = """
SELECT
  doc_id, lang AS lang_actual,
  CASE
    WHEN len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is)\\b')) >= 2 THEN 'en'
    WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]')                        THEN 'zh'
    WHEN len(regexp_extract_all(lower(text), '\\b(le|la|et|de|un)\\b')) >= 2  THEN 'fr'
    WHEN len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist)\\b')) >= 2 THEN 'de'
    ELSE 'unknown'
  END AS lang_pred
FROM documents WHERE doc_id % 3 = 0
"""


@query("text_lang_id", oracle=LANG_ID_ORACLE)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """language-ID heuristic via stopword/script n-gram evidence."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 0)
    low = F.lower(F.col("text"))

    def hits(pat):
        return F.size(F.regexp_extract_all(low, F.lit(pat)))

    pred = (
        F.when(hits(r"(\b(?:the|and|of|to|is)\b)") >= 2, "en")
        .when(F.col("text").rlike("[一-鿿]"), "zh")
        .when(hits(r"(\b(?:le|la|et|de|un)\b)") >= 2, "fr")
        .when(hits(r"(\b(?:der|die|und|das|ist)\b)") >= 2, "de")
        .otherwise("unknown")
    )
    return d.select("doc_id", F.col("lang").alias("lang_actual"), pred.alias("lang_pred"))


FINGERPRINT_ORACLE = """
SELECT
  doc_id,
  md5(text)                                          AS md5_fp,
  md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm_fp
FROM documents WHERE doc_id % 4 = 0
"""


@query("text_fingerprint", oracle=FINGERPRINT_ORACLE)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """document fingerprinting: exact + whitespace/case-normalized
    content hashes (dedup building block)."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") % 4 == 0)
    txt = F.col("text")
    return d.select(
        "doc_id",
        F.md5(txt).alias("md5_fp"),
        F.md5(F.lower(F.regexp_replace(txt, r"\s+", " "))).alias("norm_fp"),
    )


# ---------------------------------------------------------------------------
# Deterministic dataset splitting — the reproducible train/val/test
# assignment every training pipeline needs. Hash-based (not random): the
# split of a document never changes as the corpus grows, re-runs are
# byte-identical, and no coordination or RNG state is needed across
# 1000 executors. md5 is computed identically by Spark and DuckDB, so
# the assignment itself is oracle-checked, not just the counts.
# ---------------------------------------------------------------------------

HASH_SPLIT_ORACLE = """
WITH b AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 10
           AS bucket
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN bucket < 8 THEN 'train'
            WHEN bucket = 8 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


@query("text_hash_split", oracle=HASH_SPLIT_ORACLE)
def text_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment from md5(doc_id) buckets —
    deterministic, growth-stable, shuffle-free (pure map, pushdown-safe)."""
    d = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 10
    )
    split = (
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test")
    )
    return d.select("doc_id", "lang", split.alias("split"))


@query("text_compression_ratio", oracle=None)
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality signal per document (rows-only:
    DEFLATE output length has no SQL form; monotonicity and value-range
    invariants are unit-tested against known repetitive/diverse texts).
    Map-only Arrow-batched projection — the 100 TB cost is one corpus
    pass with zero exchange."""
    from arrow_spark.llm.corpus import compression_ratio

    d = table(spark, sf_dir, "documents")
    out = compression_ratio(d)
    return out.select(
        "doc_id",
        "n_chars",
        F.floor(F.col("compression_ratio") * 1e6 + F.lit(0.5)).alias("ratio_micros"),
    )


READABILITY_ORACLE = """
WITH counts AS (
  SELECT doc_id,
         CAST(greatest(len(regexp_extract_all(lower(text), '[a-z]+')), 1)
              AS BIGINT) AS words,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS sentences,
         CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
              AS BIGINT) AS syllables
  FROM documents WHERE doc_id % 5 = 0
)
SELECT doc_id, words, sentences, syllables,
       floor((206.835
              - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
              - 84.6 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE)))
             * 1e6 + 0.5) / 1e6 AS flesch
FROM counts
"""


@query("text_readability", oracle=READABILITY_ORACLE)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document from three regex counts (words,
    sentence terminators, vowel-group syllable proxy — the standard
    cheap approximation) — a pure codegen projection, map-only, no
    shuffle; the score is two divisions + a fixed-order linear combo,
    micro-snapped, so it replays hash-exact. The readability member of
    the text-quality gate family (length/punct/stopword ratios,
    compression ratio, LM perplexity)."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    low = F.lower(F.col("text"))
    words = F.greatest(
        F.size(F.regexp_extract_all(low, F.lit("([a-z]+)"))), F.lit(1)
    ).cast("long")
    sentences = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit("([.!?]+)"))),
        F.lit(1),
    ).cast("long")
    syllables = F.greatest(
        F.size(F.regexp_extract_all(low, F.lit("([aeiouy]+)"))), F.lit(1)
    ).cast("long")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sentences.cast("double"))
        - F.lit(84.6) * (syllables.cast("double") / words.cast("double"))
    )
    return d.select(
        "doc_id",
        words.alias("words"),
        sentences.alias("sentences"),
        syllables.alias("syllables"),
        (F.floor(flesch * 1e6 + F.lit(0.5)) / 1e6).alias("flesch"),
    )


TTR_ORACLE = """
WITH toks AS (
  SELECT lang, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
),
f AS (
  SELECT lang, tok, CAST(count(*) AS BIGINT) AS w
  FROM toks WHERE tok <> '' GROUP BY 1, 2
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS distinct_tokens,
       CAST(sum(w) AS BIGINT) AS total_tokens,
       CAST(count(*) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS ttr
FROM f GROUP BY lang
"""


@query("text_type_token_ratio", oracle=TTR_ORACLE)
def text_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity (type-token ratio) per language: distinct
    whitespace tokens over total tokens — the standard corpus-quality
    diversity screen (low TTR flags boilerplate/template floods a
    dedup pass missed).

    Tokenization mirrors the corpus-family convention exactly
    (string_split_regex(trim(lower(text)), '\\s+') — the
    llm.dedup.shingles prefix). Distinct counting is a (lang, tok)
    group-by — partially aggregated map-side, never a count(DISTINCT)
    over a global shuffle of raw rows — then a language-sized rollup.
    TTR is an exact-integer division, bit-identical cross-engine. At
    100 TB the one shuffle is token-keyed and combiner-compressed to
    the vocabulary size."""
    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = docs.select(
        "lang",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    f = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).cast("long").alias("w"))
    return f.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("distinct_tokens"),
        F.sum("w").cast("long").alias("total_tokens"),
        (F.count(F.lit(1)).cast("double") / F.sum("w").cast("double")).alias("ttr"),
    )
