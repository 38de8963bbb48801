"""Custom relational operators Spark lacks as builtins.

Each operator is (a) a composition of DataFrame ops when semantics allow,
else (b) an Arrow-vectorized cogroup/applyInPandas plan — never a
driver-side loop, so everything here scales with partition count.
"""

from arrow_spark.operators.asof import asof_join, sorted_merge  # noqa: F401
from arrow_spark.operators.changepoint import cusum_changepoints  # noqa: F401
from arrow_spark.operators.cohorts import cohort_retention  # noqa: F401
from arrow_spark.operators.outliers import mad_outliers  # noqa: F401
from arrow_spark.operators.quantile_transform import quantile_transform  # noqa: F401
from arrow_spark.operators.smoothing import ewma  # noqa: F401
from arrow_spark.operators.abtest import welch_ttest  # noqa: F401
from arrow_spark.operators.ivm import incremental_join_refresh  # noqa: F401
from arrow_spark.operators.layout import hilbert_by, hilbert_value  # noqa: F401
from arrow_spark.operators.survival import kaplan_meier  # noqa: F401
