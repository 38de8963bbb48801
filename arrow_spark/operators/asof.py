"""As-of join + sorted merge.

Arrow reference semantics (cpp/src/arrow/acero/asof_join_node.cc,
AsofJoinNodeOptions options.h:692-738): left rows match the single right
row with equal `by` keys whose `on` value is the closest in the allowed
window; signed tolerance `tol` admits right.on - left.on ∈
[min(0,tol), max(0,tol)] — i.e. negative ⇒ backward within |tol|,
positive ⇒ forward within tol. Exact `on` matches are always allowed.

Spark-first execution: the engine cogroups both sides by the `by` keys
(one hash shuffle each, identical partitioning, no sort ambiguity) and
runs a vectorized pandas.merge_asof per group — Arrow-batched, no
per-row Python. At 100 TB this parallelizes across by-key groups; a
skewed or absent by-key would serialize, so for the no-by case we fall
back to a range-join + window plan that stays fully declarative.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _signed_to_direction(tolerance) -> tuple[str, object | None]:
    """Map Arrow's signed tolerance to (direction, abs tolerance)."""
    if tolerance is None:
        return "backward", None
    if hasattr(tolerance, "total_seconds"):
        neg = tolerance.total_seconds() < 0
        return ("backward", -tolerance) if neg else ("forward", tolerance)
    return ("backward", -tolerance) if tolerance < 0 else ("forward", tolerance)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    tolerance=None,
    direction: str = "backward",
    suffix: str = "_r",
    right_tiebreak: Sequence[str] = (),
    strategy: str = "auto",
    left_cols: Sequence[str] | None = None,
    right_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Time-series as-of join (Arrow `asofjoin` node, re-expressed Spark-first).

    Two physical strategies, chosen like a planner would:

    - ``range``: equi-join on `by` + range condition on `on`, then a
      pick-nearest window per left row. All JVM/codegen, and the join
      output is bounded by the tolerance window — the fast path whenever
      ``tolerance`` is set (default under ``auto``).
    - ``merge``: cogrouped vectorized pandas.merge_asof per `by` group —
      linear per group, the right choice for unbounded as-of where a
      range join would be quadratic in group size.

    Parameters mirror AsofJoinNodeOptions: ``on`` is the ordered key
    (numeric or timestamp), ``by`` the equi keys, ``tolerance`` a
    nonnegative bound on |right.on - left.on| for the chosen
    ``direction`` ('backward' | 'forward' | 'nearest'). Pass a *signed*
    tolerance via :func:`asof_join_arrow` for Arrow's exact signature.

    Left rows always survive (left-outer semantics, as in Arrow); ties on
    right.on break deterministically toward the row that sorts last
    (backward) / first (forward) by (on, remaining columns order given by
    a stable mergesort on ``on``).

    ``left_cols`` / ``right_cols`` declare the value columns the caller
    actually needs; the operator prunes both sides to (by, on, requested)
    BEFORE execution, so the merge path never serializes unrequested
    columns through the Arrow cogroup exchange — at 100 TB shipping a
    wide fact table's full rows into Python workers is the dominant cost
    of an unpruned as-of. None keeps every column (small-data
    convenience).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"bad direction {direction!r}")
    if strategy not in ("auto", "range", "merge"):
        raise ValueError(f"bad strategy {strategy!r}")
    by = list(by)
    if left_cols is not None:
        left = left.select(*dict.fromkeys([*by, on, *left_cols]))
    if right_cols is not None:
        right = right.select(*dict.fromkeys([*by, on, *right_cols]))
    if strategy == "range" or (strategy == "auto" and (tolerance is not None or not by)):
        return _asof_join_range(
            left, right, on, by, tolerance, direction, suffix, right_tiebreak
        )
    if not by:  # merge strategy explicitly requested without by-keys
        return _asof_join_range(left, right, on, [], tolerance, direction, suffix, right_tiebreak)

    # Output schema: all left columns + right's non-by columns (suffixed on clash).
    left_names = set(left.columns)
    right_value_cols = [c for c in right.columns if c not in by]
    rename = {f"__r__{c}": (c + suffix if c in left_names else c) for c in right_value_cols}
    # Self-as-of hazard: when right shares lineage with left (the common
    # case — events vs events), Spark's cogroup resolves right's
    # attributes into left's and silently prunes every non-key column.
    # Column-level aliases mint fresh exprIds, which keeps the right side
    # intact regardless of lineage.
    right = right.select(
        *[F.col(c).alias(f"__rby__{i}") for i, c in enumerate(by)],
        *[F.col(c).alias(f"__r__{c}") for c in right_value_cols],
    )
    out_fields = list(left.schema.fields) + [
        T.StructField(rename[f.name], f.dataType, True)
        for f in right.schema.fields
        if f.name in rename
    ]
    out_schema = T.StructType(out_fields)
    if on not in right_value_cols:
        raise ValueError(f"right side must carry the on key {on!r} outside `by`")
    ron = rename[f"__r__{on}"]
    int_like = {
        rename[f.name]
        for f in right.schema.fields
        if f.name in rename
        and isinstance(f.dataType, (T.ByteType, T.ShortType, T.IntegerType, T.LongType))
    }
    bool_like = {
        rename[f.name]
        for f in right.schema.fields
        if f.name in rename and isinstance(f.dataType, T.BooleanType)
    }

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        out_names = [f.name for f in out_fields]
        if lpdf.empty:
            return pd.DataFrame(columns=out_names)
        lpdf = lpdf.sort_values(on, kind="mergesort")
        rpdf = rpdf.drop(
            columns=[c for c in rpdf.columns if c.startswith("__rby__")]
        ).rename(columns=rename)
        if ron in rpdf.columns:
            rsort = [ron] + [rename[f"__r__{c}"] for c in right_tiebreak]
            rpdf = rpdf.dropna(subset=[ron]).sort_values(rsort, kind="mergesort")
        else:  # left-only key: cogroup hands over a column-less empty frame
            rpdf = pd.DataFrame(columns=list(rename.values()))
        lvalid = lpdf[lpdf[on].notna()]
        lnull = lpdf[lpdf[on].isna()]
        if rpdf.empty or lvalid.empty:
            merged = lpdf.copy()
            for c in out_names:
                if c not in merged.columns:
                    merged[c] = None
        else:
            kwargs = {}
            if tolerance is not None:
                kwargs["tolerance"] = tolerance
            merged = pd.merge_asof(
                lvalid,
                rpdf,
                left_on=on,
                right_on=ron,
                direction=direction,
                suffixes=("", suffix),
                **kwargs,
            )
            if not lnull.empty:
                merged = pd.concat([merged, lnull], ignore_index=True)
        for c in int_like:
            merged[c] = merged[c].astype("Int64")
        for c in bool_like:
            merged[c] = merged[c].astype("boolean")
        return merged[out_names]

    cg = left.groupBy(*by).cogroup(
        right.groupBy(*[f"__rby__{i}" for i in range(len(by))])
    )
    return cg.applyInPandas(merge, schema=out_schema)


def _tolerance_delta(tolerance):
    """Normalize a tolerance into something Column arithmetic accepts."""
    if hasattr(tolerance, "total_seconds"):  # pd.Timedelta / datetime.timedelta
        return F.expr(f"INTERVAL {int(tolerance.total_seconds() * 1e6)} MICROSECOND")
    return F.lit(tolerance)


def _asof_join_range(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list,
    tolerance,
    direction: str,
    suffix: str,
    right_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Declarative plan: equi(by) + range(on) join, pick-nearest window.

    Join output is bounded by the tolerance window, the window shuffles
    on the (synthetic) left row id, and everything stays in codegen —
    at 100 TB this is a plain shuffled join AQE can rebalance.
    """
    left_names = set(left.columns)
    rename = {c: (c + suffix if c in left_names else c) for c in right.columns}
    r = right.select([F.col(c).alias(rename[c]) for c in right.columns])
    ron, lon = F.col(rename[on]), F.col(on)
    tie = [F.col(rename.get(c, c)) for c in right_tiebreak]
    conds = [F.col(rename.get(b, b)) == F.col(b) for b in by]
    delta = _tolerance_delta(tolerance) if tolerance is not None else None
    if direction == "backward":
        conds.append(ron <= lon)
        if delta is not None:
            conds.append(ron >= lon - delta)
        order = [ron.desc()] + [t.desc() for t in tie]
    elif direction == "forward":
        conds.append(ron >= lon)
        if delta is not None:
            conds.append(ron <= lon + delta)
        order = [ron.asc()] + [t.asc() for t in tie]
    else:  # nearest: |Δ| asc, backward wins ties (pandas convention)
        if delta is not None:
            conds.append(ron.between(lon - delta, lon + delta))
        order = [
            F.abs(ron.cast("double") - lon.cast("double")).asc(),
            ron.asc(),
        ] + [t.desc() for t in tie]
    # nearest with no by-keys and no tolerance has no join predicate at all:
    # every left row scans the whole right side (a deliberate full range
    # join — callers should pass a tolerance at scale).
    cond = conds[0] if conds else F.lit(True)
    for c in conds[1:]:
        cond = cond & c
    lid = "__asof_lid__"
    lft = left.withColumn(lid, F.monotonically_increasing_id())
    joined = lft.join(r, cond, "left")
    # drop the duplicated right by-key columns (left's values win, as in merge)
    for b in by:
        rb = rename.get(b, b)
        if rb != b:
            joined = joined.drop(rb)
    w = W.partitionBy(lid).orderBy(*order)
    return (
        joined.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .drop("__rn__", lid)
    )


def asof_join_arrow(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    tolerance=None,
    suffix: str = "_r",
    left_cols: Sequence[str] | None = None,
    right_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Arrow-exact signature: signed tolerance, backward when negative
    (AsofJoinNodeOptions options.h:711-724). ``left_cols``/``right_cols``
    prune each side to (by, on, requested) before execution so wide
    frames never ship unrequested columns through the cogroup exchange."""
    direction, tol = _signed_to_direction(tolerance)
    return asof_join(
        left, right, on, by=by, tolerance=tol, direction=direction, suffix=suffix,
        left_cols=left_cols, right_cols=right_cols,
    )


def sorted_merge(inputs: Sequence[DataFrame], on: str, ascending: bool = True) -> DataFrame:
    """Merge N sorted inputs into one totally-sorted stream
    (sorted_merge_node.cc). Spark-first: union then range-partitioned
    sort — Catalyst samples ranges so the merge is shuffle-balanced, the
    per-partition merge is Tungsten's sort on already-sorted runs."""
    if not inputs:
        raise ValueError("sorted_merge needs ≥1 input")
    out = inputs[0]
    for df in inputs[1:]:
        out = out.unionByName(df)
    return out.orderBy(F.col(on).asc() if ascending else F.col(on).desc())


def asof_join_multi(
    left: DataFrame,
    rights: Sequence[DataFrame],
    on: str,
    by: Sequence[str] = (),
    tolerance=None,
    direction: str = "backward",
    suffixes: Sequence[str] = (),
    right_tiebreaks: Sequence[Sequence[str]] = (),
    strategy: str = "auto",
) -> DataFrame:
    """Arrow asofjoin parity for N right tables (AsofJoinNodeOptions
    options.h:700 takes one left + a vector of rights, one shared
    tolerance): every right matches independently against the LEFT's
    `on` key; output = left columns ++ each right's value columns.

    Implemented as a fold of pairwise as-of joins. The left's (by, on)
    keys remain the join spine of every stage, so under the range
    strategy each stage shuffles on the same `by` hash — Catalyst reuses
    the exchange instead of re-partitioning between rights.
    """
    out = left
    for i, right in enumerate(rights):
        out = asof_join(
            out,
            right,
            on=on,
            by=by,
            tolerance=tolerance,
            direction=direction,
            suffix=suffixes[i] if i < len(suffixes) else f"_r{i + 1}",
            right_tiebreak=right_tiebreaks[i] if i < len(right_tiebreaks) else (),
            strategy=strategy,
        )
    return out
