"""arrow_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Apache Arrow (Acero + compute kernels +
dataset layer), re-expressed Spark-first.

Architecture (SURVEY.md §7):
  L1 ``arrow_spark.functions``  — Arrow compute-function layer (§2.2) as
      Catalyst Column expressions (JVM-side, codegen'd).
  L2 ``arrow_spark.operators``  — relational + ordered operators (§2.1):
      joins, aggregation, sort/top-k/fetch, as-of join, sorted merge,
      cumulative/fill ops, pivot.
  L3 ``arrow_spark.sources``    — formats & datasets (§2.3): parquet/CSV/
      JSON/ORC native, Arrow IPC via a mapInArrow-backed reader/writer.
  L4 facade                     — pyarrow-like entry points backed by
      DataFrames (``arrow_spark.table``).
  L5 ``arrow_spark.llm``        — 100TB-pipeline extensions: dedup,
      similarity search, text analysis, multimodal plumbing.

Everything is declarative DataFrame/SQL so Catalyst/Tungsten/AQE pick the
physical strategy; Python UDFs only where built-ins cannot express the
semantics (and then Arrow-vectorized).
"""

__version__ = "0.1.0"

from arrow_spark.session import get_spark  # noqa: F401
from arrow_spark.catalog import TABLES, load_tables  # noqa: F401


def __getattr__(name):
    """Lazy top-level conveniences (kept lazy so `import arrow_spark`
    stays light — no plan/flight modules until first use)."""
    if name == "Table":
        from arrow_spark.table import Table

        return Table
    if name == "Declaration":
        from arrow_spark.plans import Declaration

        return Declaration
    if name == "run_substrait":
        from arrow_spark.plans.substrait import run_substrait

        return run_substrait
    raise AttributeError(f"module 'arrow_spark' has no attribute {name!r}")
