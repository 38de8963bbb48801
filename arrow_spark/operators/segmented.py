"""Segment-key aggregation (Acero SegmentedAggregate,
cpp/src/arrow/acero/options.h:304-313).

Arrow's aggregate node takes ``segment_keys`` — keys the input stream is
already ordered/segmented on — and emits results per segment without
holding the whole grouping hash table. The Spark-first equivalent of
"the input is already segmented" is "the input is already hash-
partitioned on the segment keys": Catalyst's HashPartitioning(segment)
satisfies ClusteredDistribution(segment ++ keys) (same segment value ⇒
same partition ⇒ every (segment, key) group is co-located), so the
aggregate plans with NO new Exchange — the claim the plan test pins.

At 100 TB this is the fan-out pattern: pay one shuffle to segment a
fact table, then run any number of per-segment aggregations (different
sub-keys, different measures) against the same exchange, each
shuffle-free. sortWithinPartitions on the segment keys additionally
gives Arrow's streaming emission order per partition when a sink wants
segment-contiguous output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def segmented_aggregate(
    df: DataFrame,
    segment_keys: Sequence[str],
    keys: Sequence[str | Column],
    aggs: Sequence[Column],
    assume_segmented: bool = False,
) -> DataFrame:
    """GroupBy (segment_keys ++ keys) exploiting segment partitioning.

    assume_segmented=True declares the input already hash-partitioned on
    ``segment_keys`` (e.g. by an upstream repartition/bucketed scan) —
    the aggregate then adds no Exchange. False installs the segment
    partitioning first (one shuffle, shared by every later segmented
    aggregate over the same frame).

    Result ≡ ``df.groupBy(*segment_keys, *keys).agg(*aggs)`` — the
    oracle gate checks equality against exactly that twin.
    """
    if not segment_keys:
        raise ValueError("segment_keys must be non-empty (use groupBy directly)")
    if not assume_segmented:
        df = df.repartition(*segment_keys)
    return df.groupBy(*segment_keys, *keys).agg(*aggs)
