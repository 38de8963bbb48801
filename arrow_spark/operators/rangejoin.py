"""Interval (range-overlap) join without a cross join.

Spark's native plan for ``l.start <= r.end AND r.start <= l.end`` is a
broadcast nested loop / cartesian filter — O(n·m) at scale. The binned
form turns it into an equi-join: each interval explodes to the
fixed-width bins it touches, candidates meet on (keys..., bin), and a
pair is emitted only in the bin that contains the later of the two
starts (the "owner" bin — both intervals provably touch it, so every
overlapping pair appears exactly once and no distinct/dedup shuffle is
needed).

Arrow has no range-join node (hashjoin is equi-only, SURVEY §2.1); this
is the composition-of-existing-ops path the build brief prescribes for
operators the engine lacks.

Scale: bin width trades explode factor against candidate selectivity —
set it near the typical interval length so each interval lands in O(1)
bins. The join shuffles on (keys, bin) like any equi-join; AQE handles
skewed bins. Nothing is all-pairs and nothing touches the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    by: Sequence[str] = (),
    bin_width: int = 3600,
) -> DataFrame:
    """Inner join of overlapping [start, end] intervals (closed ends,
    ``start <= end`` assumed; integer/long bounds — epoch seconds in the
    time case). ``by`` columns must exist on both sides and join
    equi-first. Returns all left columns plus the right columns; name
    collisions outside ``by`` must be resolved by the caller.
    """
    lbin = F.explode(
        F.sequence(
            F.floor(F.col(l_start) / bin_width).cast("long"),
            F.floor(F.col(l_end) / bin_width).cast("long"),
        )
    ).alias("__bin__")
    rbin = F.explode(
        F.sequence(
            F.floor(F.col(r_start) / bin_width).cast("long"),
            F.floor(F.col(r_end) / bin_width).cast("long"),
        )
    ).alias("__bin__")
    lb = left.select("*", lbin)
    rb = right.select("*", rbin)
    overlap = (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
    owner = F.floor(F.greatest(F.col(l_start), F.col(r_start)) / bin_width).cast(
        "long"
    ) == F.col("__bin__")
    return lb.join(rb.hint("merge"), [*by, "__bin__"]).where(overlap & owner).drop("__bin__")
