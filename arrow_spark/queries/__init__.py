"""Query registry: every operator claimed in SURVEY.md §2 has a named
query here, each with a Spark callable ``(spark, sf_dir) -> DataFrame``
and (where SQL-expressible) a DuckDB oracle SQL string.

The driver compares both at sf0.01 (row count + schema + order-insensitive
value hash), so every computed column is aliased identically on both sides
and floating-point aggregates are rounded identically on both sides.
"""

from __future__ import annotations

import importlib

from arrow_spark.queries.base import REGISTRY, QueryDef, query  # noqa: F401

_MODULES = (
    "relational",
    "joins",
    "tpch",
    "tpch_ps",
    "windows",
    "functions_scalar",
    "temporal",
    "nested",
    "asof",
    "text",
    "similarity",
    "dedup",
    "corpus_q",
    "streaming_windows",
    "timeseries",
    "extras",
    "substrait_q",
)


def load_all() -> dict[str, QueryDef]:
    """Import every query module (side effect: fills REGISTRY)."""
    for mod in _MODULES:
        importlib.import_module(f"arrow_spark.queries.{mod}")
    return dict(REGISTRY)
