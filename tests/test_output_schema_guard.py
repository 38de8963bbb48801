"""No oracle-compared query may emit a top-level Array/Map/Struct
output column.

The driver's pandas canonicalizer sorts output rows with
``sort_values`` before hashing; list-valued cells are unhashable and
crash it (``TypeError: unhashable type: 'list'`` — the r5 driver-reds
``quality_quarantine`` / ``table_diff_reconcile``). The LOCAL
comparator stringifies lists (testing/oracle.py::_cstr), so a local
green CANNOT catch this divergence — only a schema assertion can.
Queries that logically produce lists must ``array_join`` them to a
scalar string on both the Spark and oracle sides.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from arrow_spark.queries import load_all

QUERIES = load_all()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_complex_top_level_output_type(spark, sf_dir, name):
    qd = QUERIES[name]
    schema = qd.fn(spark, sf_dir).schema  # lazy: analysis only, no execution
    complex_fields = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_fields, (
        f"{name} emits driver-unhashable top-level column(s) "
        f"{complex_fields}; array_join/to_json them to scalars on both "
        f"the Spark and oracle sides (driver pandas sort_values cannot "
        f"factorize list values)"
    )
