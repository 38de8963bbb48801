"""Classifier-evaluation oracle queries over the embeddings fixture.

A deterministic integer "classifier" scores every vector (milli-snapped
embedding · fixed integer weight vector, coarsened by a floor-div so
scores TIE heavily — the tie-corrected rank algebra is what these
queries verify), labels binarize as label % 2, and rows split into
three "model" groups (vec_id % 3). Every statistic is exact integers
until one final IEEE division, so all three queries hash-exact.

Engine path: arrow_spark.operators.evaluation. Oracle: DuckDB replays
the score pipeline with list_transform/list_reduce and the identical
window algebra.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.operators.evaluation import calibration_bins, pr_curve, roc_auc
from arrow_spark.queries.base import query

#: Deterministic integer weights — small moduli make the coarsened dot
#: product land in a ~20-value range, so score ties are plentiful.
EVAL_WEIGHTS = [((i * 37) % 11) - 5 for i in range(64)]

_W_LIT = "[" + ",".join(str(w) for w in EVAL_WEIGHTS) + "]"

#: Shared oracle CTE: (model, y, score) per vector. The milli-snap and
#: the /1000 coarsening mirror the Spark expressions operation-for-
#: operation (double cast → *1000.0 → floor(+0.5) → BIGINT → weighted
#: integer sum → floor-div by 1000.0).
_SCORED_CTE = f"""
e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
), s AS (
  SELECT CAST(vec_id % 3 AS BIGINT) AS model,
         CAST(label % 2 AS BIGINT) AS y,
         CAST(floor(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, 65),
                i -> CAST(floor(v[i] * 1000.0 + 0.5) AS BIGINT) * ({_W_LIT})[i])),
              (a, b) -> a + b) / 1000.0) AS BIGINT) AS score
  FROM e
)"""

#: (model, score) cells with integer n / n_pos — the rank algebra's
#: input on both engines.
_CELLS_CTE = """
cells AS (
  SELECT model, score, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS n_pos
  FROM s GROUP BY model, score
)"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    weights = F.array(*[F.lit(w).cast("long") for w in EVAL_WEIGHTS])

    def term(x: Column, w: Column) -> Column:
        return F.floor(x.cast("double") * 1000.0 + F.lit(0.5)).cast("long") * w

    raw = F.aggregate(
        F.zip_with(F.col("embedding"), weights, term),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return emb.select(
        (F.col("vec_id") % 3).alias("model"),
        (F.col("label") % 2).alias("y"),
        F.floor(raw / F.lit(1000.0)).cast("long").alias("score"),
    )


ROC_AUC_ORACLE = f"""
WITH {_SCORED_CTE}, {_CELLS_CTE},
rk AS (
  SELECT model, n, n_pos,
         coalesce(sum(n) OVER (PARTITION BY model ORDER BY score
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS cum_below
  FROM cells
), tot AS (
  SELECT model,
         CAST(sum(n_pos * (2 * cum_below + n + 1)) AS BIGINT) AS r2,
         CAST(sum(n_pos) AS BIGINT) AS n_pos,
         CAST(sum(n) - sum(n_pos) AS BIGINT) AS n_neg
  FROM rk GROUP BY model
)
SELECT model, n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE)
           / CAST(2 * n_pos * n_neg AS DOUBLE)
       END AS auc
FROM tot
"""


@query("eval_roc_auc", oracle=ROC_AUC_ORACLE)
def eval_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tie-corrected Mann-Whitney ROC-AUC per model group, computed
    over (model, score) CELLS — the rank window sorts distinct scores,
    never rows, so the row-scale stage is one map-side-combined
    aggregation (operators/evaluation.py). Integer rank sums + one
    division ⇒ hash-exact."""
    return roc_auc(_scored(spark, sf_dir), "y", "score", ["model"])


PR_CURVE_ORACLE = f"""
WITH {_SCORED_CTE}, {_CELLS_CTE},
cum AS (
  SELECT model, score,
         CAST(sum(n_pos) OVER w AS BIGINT) AS tp,
         CAST(sum(n - n_pos) OVER w AS BIGINT) AS fp,
         CAST(sum(n_pos) OVER (PARTITION BY model) AS BIGINT) AS p_total
  FROM cells
  WINDOW w AS (PARTITION BY model ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT model, score AS threshold, tp, fp,
       p_total - tp AS fn,
       CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision,
       CASE WHEN p_total > 0 THEN CAST(tp AS DOUBLE) / CAST(p_total AS DOUBLE)
       END AS recall
FROM cum
"""


@query("eval_pr_curve", oracle=PR_CURVE_ORACLE)
def eval_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """precision/recall at every distinct threshold per model group —
    descending cumulative integer tp/fp over score cells, single
    divisions ⇒ hash-exact; result rows = distinct scores, not input
    rows."""
    return pr_curve(_scored(spark, sf_dir), "y", "score", ["model"])


CALIBRATION_ORACLE = f"""
WITH {_SCORED_CTE},
p AS (
  SELECT y,
         least(greatest((score + 16) * 31250, 0), 1000000) AS micros
  FROM s
), b AS (
  SELECT CAST(floor(micros * 10 / 1000000.0) AS INT) AS bin_raw, y, micros
  FROM p
)
SELECT CAST(least(bin_raw, 9) AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(y) AS BIGINT) AS n_pos,
       CAST(sum(micros) AS DOUBLE) / CAST(count(*) * 1000000 AS DOUBLE)
         AS mean_pred,
       CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS frac_pos
FROM b GROUP BY 1
"""


@query("eval_calibration_bins", oracle=CALIBRATION_ORACLE)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reliability-diagram deciles: the integer score maps to micro-
    probabilities by an exact linear rule ((s+16)·31250, clamped), so
    per-bin mean prediction is an integer sum + ONE division — never an
    order-dependent float mean (operators/evaluation.py). One
    aggregation, 10 output rows."""
    scored = _scored(spark, sf_dir)
    micros = F.least(
        F.greatest((F.col("score") + 16) * 31250, F.lit(0)), F.lit(1_000_000)
    )
    return calibration_bins(
        scored.select("y", micros.alias("micros")), "y", "micros", n_bins=10
    )


LANG_REPORT_ORACLE = """
WITH scored AS (
  SELECT
    lang AS truth,
    CASE
      WHEN len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is)\\b')) >= 2 THEN 'en'
      WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]')                        THEN 'zh'
      WHEN len(regexp_extract_all(lower(text), '\\b(le|la|et|de|un)\\b')) >= 2  THEN 'fr'
      WHEN len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist)\\b')) >= 2 THEN 'de'
      ELSE 'unknown'
    END AS pred
  FROM documents
), cells AS (
  SELECT truth, pred, CAST(count(*) AS BIGINT) AS n FROM scored GROUP BY 1, 2
), tp AS (
  SELECT truth AS cls, n AS tp FROM cells WHERE truth = pred
), pt AS (
  SELECT pred AS cls, CAST(sum(n) AS BIGINT) AS predicted FROM cells GROUP BY 1
), tt AS (
  SELECT truth AS cls, CAST(sum(n) AS BIGINT) AS support FROM cells GROUP BY 1
), classes AS (
  SELECT cls FROM tt UNION SELECT cls FROM pt
), j AS (
  SELECT classes.cls,
         coalesce(support, 0) AS support,
         coalesce(predicted, 0) AS predicted,
         coalesce(tp, 0) AS tp
  FROM classes
  LEFT JOIN tt USING (cls) LEFT JOIN pt USING (cls) LEFT JOIN tp USING (cls)
)
SELECT cls, support, tp,
       predicted - tp AS fp,
       support - tp AS fn,
       CASE WHEN predicted > 0
            THEN CAST(tp AS DOUBLE) / CAST(predicted AS DOUBLE) END AS precision,
       CASE WHEN support > 0
            THEN CAST(tp AS DOUBLE) / CAST(support AS DOUBLE) END AS recall,
       CASE WHEN 2 * tp + (predicted - tp) + (support - tp) > 0
            THEN CAST(2 * tp AS DOUBLE)
                 / CAST(2 * tp + (predicted - tp) + (support - tp) AS DOUBLE)
       END AS f1
FROM j
"""


@query("eval_lang_id_report", oracle=LANG_REPORT_ORACLE)
def eval_lang_id_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """per-class precision/recall/F1 of the lang-id heuristic against
    the fixture's true lang labels — the multi-class companion of the
    binary AUC family: confusion cells in ONE map-side-combined
    aggregation, class-table-sized broadcast joins, F1 in the
    single-division form 2tp/(2tp+fp+fn) so the whole report is
    hash-exact (operators/evaluation.py::classification_report)."""
    from arrow_spark.operators.evaluation import classification_report

    d = table(spark, sf_dir, "documents")
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
    scored = d.select(F.col("lang").alias("truth"), pred.alias("pred"))
    return classification_report(scored, "truth", "pred")
