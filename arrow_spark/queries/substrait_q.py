"""Substrait-plan-driven query: the serialized protobuf path end-to-end
over real testdata (SURVEY §3.3 — engine/substrait/serde.h:106 parity).

The plan bytes are hand-encoded by substrait_builder (validated against
pyarrow.substrait.run_query in tests/test_substrait.py), consumed by
run_substrait into a Catalyst plan, and oracle-checked like any other
query. Aggregates avoid order-dependent float accumulation (sum over
whole-number quantities, count, max) so the DuckDB value-hash matches
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from arrow_spark.catalog import table
from arrow_spark.plans import substrait_builder as B
from arrow_spark.plans.substrait import run_substrait
from arrow_spark.queries.base import query

SUBSTRAIT_AGG_ORACLE = """
SELECT l_returnflag,
       SUM(l_quantity) AS sum_qty,
       COUNT(l_quantity) AS cnt,
       MAX(l_extendedprice) AS max_price
FROM lineitem
WHERE l_quantity < 24
GROUP BY l_returnflag
"""


def _plan_bytes() -> bytes:
    read = B.read_named(
        ["lineitem"],
        ["l_returnflag", "l_quantity", "l_extendedprice"],
        ["string", "fp64", "fp64"],
    )
    lt = B.scalar_fn(1, [B.field_ref(1), B.lit_fp64(24.0)], output=B.typ("bool"))
    agg = B.aggregate_rel(
        B.filter_rel(read, lt),
        [B.field_ref(0)],
        [
            B.agg_fn(2, [B.field_ref(1)], B.typ("fp64")),
            B.agg_fn(3, [B.field_ref(1)], B.typ("i64")),
            B.agg_fn(4, [B.field_ref(2)], B.typ("fp64")),
        ],
    )
    return B.plan(
        agg,
        ["l_returnflag", "sum_qty", "cnt", "max_price"],
        functions={
            1: (B.URI_CMP, "lt"),
            2: (B.URI_ARITH, "sum"),
            3: (B.URI_AGG, "count"),
            4: (B.URI_ARITH, "max"),
        },
    )


@query("substrait_filter_agg", oracle=SUBSTRAIT_AGG_ORACLE)
def substrait_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter + grouped aggregate arriving as a serialized substrait.Plan,
    executed by the wire-format consumer (pyarrow run_query parity)."""
    return run_substrait(
        spark, _plan_bytes(), lambda names: table(spark, sf_dir, names[0])
    )
