"""Custom relational operators Spark lacks as builtins.

Each operator is (a) a composition of DataFrame ops when semantics allow,
else (b) an Arrow-vectorized cogroup/applyInPandas plan — never a
driver-side loop, so everything here scales with partition count.
"""

from arrow_spark.operators.asof import asof_join, sorted_merge  # noqa: F401
