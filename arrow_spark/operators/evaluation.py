"""Classification-evaluation operators: ROC-AUC, PR curve, calibration.

Every large-scale pipeline that trains a quality/toxicity/lang-id
classifier over the corpus needs to EVALUATE it at corpus scale —
ranking metrics over billions of scored rows. The textbook
implementations sort all rows by score (a single global sort); these
operators instead aggregate rows to (group, score) CELLS first, and
run the order-dependent part (cumulative ranks) over the distinct-score
table only:

- one shuffle compresses N rows to |distinct scores| cells with exact
  integer (n, n_pos) payloads — map-side combined, so the shuffle
  carries cells, not rows;
- the rank window then sorts CELLS. With scores snapped to a fixed
  grid (the house micro-snap discipline — callers of continuous
  scores snap first) the cell table is bounded by the grid, not by N,
  so the per-group sort is metadata-sized at any corpus size. For a
  genuinely unbounded score domain the two-level rank decomposition
  (llm/corpus.py::stratified_split) applies verbatim — not wired here
  because snapping is the practical contract.

Exactness: tie-corrected Mann-Whitney AUC is computed from INTEGER
rank sums (the ×2 trick keeps half-ranks integral) with ONE IEEE
division at the end, so results are bit-identical cross-engine —
value-hash verifiable, not tolerance-tested.

Reference anchor: the reference's compute layer (cpp/src/arrow/compute)
ships rank/sort kernels but no evaluation metrics; its users compose
exactly this rank algebra downstream. Here it is first-class.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = [
    "roc_auc",
    "pr_curve",
    "calibration_bins",
    "confusion_matrix",
    "classification_report",
]


def _cells(
    df: DataFrame, label_col: str, score_col: str, group_cols: Sequence[str]
) -> DataFrame:
    """(groups…, score) cells with exact integer n / n_pos payloads.

    ``label_col`` must be 0/1 integers; rows with NULL score or label
    are excluded (neither engine can rank them meaningfully, and Spark
    and DuckDB disagree on NULL sort placement)."""
    return (
        df.where(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
        .groupBy(*group_cols, F.col(score_col).alias("score"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(label_col).cast("long")).alias("n_pos"),
        )
    )


def roc_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Tie-corrected Mann-Whitney ROC-AUC per group.

    Returns (groups…, n_pos, n_neg, auc). AUC is the probability a
    random positive outscores a random negative, ties counted half —
    computed from average ranks: for a tied cell at score s with n(s)
    rows of which n_pos(s) positive, every row's average rank is
    cum_below(s) + (n(s)+1)/2. Doubling keeps the sum integral:

        R2      = Σ_s n_pos(s) · (2·cum_below(s) + n(s) + 1)
        AUC     = (R2 − P·(P+1)) / (2·P·N)

    with P/N the positive/negative totals — all integers until the one
    final division, so the statistic is bit-exact. Groups with P = 0 or
    N = 0 have no defined ranking: auc is NULL (never NaN — Spark sorts
    NaN above every number, which would read as a perfect classifier).
    """
    cells = _cells(df, label_col, score_col, group_cols)
    w = (
        W.partitionBy(*group_cols)
        .orderBy("score")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ranked = cells.withColumn(
        "cum_below", F.coalesce(F.sum("n").over(w), F.lit(0))
    ).withColumn(
        "r2", F.col("n_pos") * (2 * F.col("cum_below") + F.col("n") + 1)
    )
    totals = ranked.groupBy(*group_cols).agg(
        F.sum("r2").alias("r2"),
        F.sum("n_pos").alias("n_pos"),
        (F.sum("n") - F.sum("n_pos")).alias("n_neg"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        (F.col("r2") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("double")
        / (2 * F.col("n_pos") * F.col("n_neg")).cast("double"),
    )
    return totals.select(*group_cols, "n_pos", "n_neg", auc.alias("auc"))


def pr_curve(
    df: DataFrame,
    label_col: str,
    score_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Precision/recall at every distinct score threshold (predict
    positive iff score ≥ threshold), one row per (groups…, threshold).

    Returns (groups…, threshold, tp, fp, fn, precision, recall).
    tp/fp are descending cumulative integer sums over the score cells;
    precision and recall are single IEEE divisions of those exact
    integers — hash-exact. Same cell-compression scale shape as
    ``roc_auc``: the cumulative window runs over distinct scores, and
    the row count of the result is the distinct-score count (snap
    continuous scores first to bound it)."""
    cells = _cells(df, label_col, score_col, group_cols)
    w_desc = (
        W.partitionBy(*group_cols)
        .orderBy(F.col("score").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_all = W.partitionBy(*group_cols)
    out = (
        cells.withColumn("tp", F.sum("n_pos").over(w_desc))
        .withColumn("fp", F.sum(F.col("n") - F.col("n_pos")).over(w_desc))
        .withColumn("p_total", F.sum("n_pos").over(w_all))
    )
    return out.select(
        *group_cols,
        F.col("score").alias("threshold"),
        "tp",
        "fp",
        (F.col("p_total") - F.col("tp")).alias("fn"),
        (
            F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double")
        ).alias("precision"),
        F.when(
            F.col("p_total") > 0,
            F.col("tp").cast("double") / F.col("p_total").cast("double"),
        ).alias("recall"),
    )


def calibration_bins(
    df: DataFrame,
    label_col: str,
    prob_micros_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic classifier.

    ``prob_micros_col`` is the predicted probability snapped to integer
    MICROS (0..1_000_000) — the house snap discipline, which is what
    makes the per-bin mean prediction an exact integer sum followed by
    ONE division instead of an order-dependent float mean. Returns
    (bin, n, n_pos, mean_pred, frac_pos) where bin = the probability
    decile (floor(p·n_bins), top edge closed). One aggregation, map-side
    combined; output is n_bins rows."""
    p = F.col(prob_micros_col)
    bin_id = F.least(
        F.floor(p * n_bins / F.lit(1_000_000)).cast("int"), F.lit(n_bins - 1)
    )
    return (
        df.where(p.isNotNull() & F.col(label_col).isNotNull())
        .groupBy(bin_id.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(label_col).cast("long")).alias("n_pos"),
            F.sum(p.cast("long")).alias("sum_micros"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            (
                F.col("sum_micros").cast("double")
                / (F.col("n") * F.lit(1_000_000)).cast("double")
            ).alias("mean_pred"),
            (F.col("n_pos").cast("double") / F.col("n").cast("double")).alias(
                "frac_pos"
            ),
        )
    )


def confusion_matrix(
    df: DataFrame, truth_col: str, pred_col: str
) -> DataFrame:
    """(truth, pred, n) cells — one map-side-combined aggregation; the
    output is |classes|² rows at most, metadata-sized at any corpus
    size. NULL truth/pred rows are excluded (no class to attribute)."""
    return (
        df.where(F.col(truth_col).isNotNull() & F.col(pred_col).isNotNull())
        .groupBy(
            F.col(truth_col).alias("truth"), F.col(pred_col).alias("pred")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def classification_report(
    df: DataFrame, truth_col: str, pred_col: str
) -> DataFrame:
    """Per-class precision/recall/F1 from the confusion cells:
    (cls, support, tp, fp, fn, precision, recall, f1).

    Classes are the UNION of truth and prediction labels (a class the
    model invents shows up with support 0; one it never predicts shows
    up with precision NULL). All counts are exact integers; F1 uses the
    single-division form 2·tp/(2·tp+fp+fn) — no chained P·R float
    algebra — so the whole report is hash-exact. Degenerate
    denominators yield NULL, never NaN.

    Scale: one cells aggregation (the row-scale stage), then class-
    table-sized joins (broadcast)."""
    cells = confusion_matrix(df, truth_col, pred_col)
    tp = (
        cells.where(F.col("truth") == F.col("pred"))
        .select(F.col("truth").alias("cls"), F.col("n").alias("tp"))
    )
    pt = cells.groupBy(F.col("pred").alias("cls")).agg(
        F.sum("n").cast("long").alias("predicted")
    )
    tt = cells.groupBy(F.col("truth").alias("cls")).agg(
        F.sum("n").cast("long").alias("support")
    )
    classes = tt.select("cls").unionAll(pt.select("cls")).distinct()
    j = (
        classes.join(F.broadcast(tt), "cls", "left")
        .join(F.broadcast(pt), "cls", "left")
        .join(F.broadcast(tp), "cls", "left")
        .select(
            "cls",
            F.coalesce(F.col("support"), F.lit(0).cast("long")).alias("support"),
            F.coalesce(F.col("predicted"), F.lit(0).cast("long")).alias("predicted"),
            F.coalesce(F.col("tp"), F.lit(0).cast("long")).alias("tp"),
        )
    )
    fp = F.col("predicted") - F.col("tp")
    fn = F.col("support") - F.col("tp")
    precision = F.when(
        F.col("predicted") > 0,
        F.col("tp").cast("double") / F.col("predicted").cast("double"),
    )
    recall = F.when(
        F.col("support") > 0,
        F.col("tp").cast("double") / F.col("support").cast("double"),
    )
    f1_den = 2 * F.col("tp") + fp + fn
    f1 = F.when(
        f1_den > 0, (2 * F.col("tp")).cast("double") / f1_den.cast("double")
    )
    return j.select(
        "cls",
        "support",
        "tp",
        fp.alias("fp"),
        fn.alias("fn"),
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
    )
