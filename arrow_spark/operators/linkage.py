"""Record-linkage assignment: turn scored candidate pairs into a 1:1
match set (mutual-best marriage round).

Fuzzy joins (operators/fuzzyjoin.py) emit MANY-to-many scored pairs;
every real entity-resolution pipeline then needs an assignment step
that picks at most one partner per record. Full optimal bipartite
matching (Hungarian) is inherently sequential, but the standard
large-scale surrogate — keep a pair iff each side is the other's
argmax ("mutual best", the first round of greedy/stable matching) — is
embarrassingly parallel and is what production linkage systems run at
billion-row scale (each round of Gale-Shapley-style matching is exactly
this primitive).

Determinism contract: argmax orders by (score DESC, partner id ASC), so
equal scores resolve to the smallest partner id on both engines. Feed
SNAPPED scores (the fuzzy-join queries already snap to 1e-6) so the
ordering key is cross-engine identical.

Scale anatomy: two row_number windows — one partitioned by the left id,
one by the right id — i.e. two key Exchanges over the candidate-pair
table, no join, no iteration, state O(1) per window frame. Candidate
pairs are already blocked/LSH-bounded upstream, so at 100 TB this is
two shuffles of the (small) match-candidate set, never of the corpora.

Reference anchor: no assignment op exists in the reference
(cpp/src/arrow/acero has no such node); its users run this same
window-rank pattern downstream — here it is first-class and verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["mutual_best_match"]


def mutual_best_match(
    pairs: DataFrame,
    left_id: str,
    right_id: str,
    score: str,
) -> DataFrame:
    """Keep (left, right, score) rows where RIGHT is LEFT's best match
    AND LEFT is RIGHT's best match; ties broken to the smallest partner
    id. At most one row per left id and per right id survives (a
    matching, in the graph sense)."""
    by_left = W.partitionBy(left_id).orderBy(
        F.col(score).desc(), F.col(right_id).asc()
    )
    by_right = W.partitionBy(right_id).orderBy(
        F.col(score).desc(), F.col(left_id).asc()
    )
    return (
        pairs.withColumn("__lr__", F.row_number().over(by_left))
        .withColumn("__rr__", F.row_number().over(by_right))
        .where((F.col("__lr__") == 1) & (F.col("__rr__") == 1))
        .drop("__lr__", "__rr__")
    )
