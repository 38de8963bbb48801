"""pyarrow.dataset object-API facade: Dataset / Scanner / Fragment.

The reference's user surface (python/pyarrow/dataset.py `dataset()`,
_dataset.pyx `Dataset.to_table/head/take/count_rows/get_fragments`,
`Scanner.from_dataset` with columns/filter/batch_size —
cpp/src/arrow/dataset/scanner.h:205 ScanNodeOptions) re-expressed on
Spark's datasource framework. The L4-facade trio is then complete:
Table (eager kernels), Declaration (Acero graphs), Dataset (lazy
scans).

Semantics choices that keep this honest on a distributed engine:

- ``filter`` is a SQL boolean expression string (or a Column) — the
  analog of pyarrow's Expression; it reaches the scan as a pushed
  filter / partition prune exactly like any Spark predicate.
- ``take(indices)`` / positional reads need a total order a distributed
  scan doesn't have; this facade defines dataset order as
  (file path, row position in file) using the parquet ``_metadata``
  row-index column — deterministic across runs and equal to pyarrow's
  file-sequential order for a single-directory dataset.
- ``Scanner.to_batches`` materializes through ``toArrow`` on the
  driver: a Scanner is the *collect* surface of the API (pyarrow
  scanners also deliver to the caller's process); distributed
  consumers should keep using ``to_df()``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_spark.sources.dataset import read_dataset

__all__ = ["Dataset", "Scanner", "Fragment", "dataset"]


def dataset(
    spark: SparkSession,
    path: str | list[str],
    fmt: str = "parquet",
    schema=None,
    partition_base_dir: str | None = None,
    **options,
) -> "Dataset":
    """Discover a dataset (pyarrow.dataset.dataset parity)."""
    return Dataset(spark, path, fmt, schema, partition_base_dir, **options)


class Dataset:
    """Lazy multi-file dataset handle (dataset/dataset.h:361)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str | list[str],
        fmt: str = "parquet",
        schema=None,
        partition_base_dir: str | None = None,
        **options,
    ):
        self._spark = spark
        self._path = path
        self._fmt = fmt
        self._options = dict(options)
        self._schema = schema
        self._base_dir = partition_base_dir
        self._df = read_dataset(
            spark, path, fmt, schema=schema,
            partition_base_dir=partition_base_dir, **options,
        )

    # -- metadata ----------------------------------------------------
    @property
    def schema(self):
        """Arrow schema of the dataset (unified across fragments)."""
        return self._df.limit(0).toArrow().schema

    @property
    def files(self) -> list[str]:
        """Data files backing the dataset (FileSystemDataset::files)."""
        return sorted(self._df.inputFiles())

    def get_fragments(self) -> list["Fragment"]:
        """One Fragment per data file (Dataset::GetFragments)."""
        return [Fragment(self, f) for f in self.files]

    # -- scanning ----------------------------------------------------
    def _projected(
        self, columns: Sequence[str] | None, filter: str | Column | None
    ) -> DataFrame:
        df = self._df
        if filter is not None:
            df = df.where(F.expr(filter) if isinstance(filter, str) else filter)
        if columns:
            df = df.select(*columns)
        return df

    def scanner(
        self,
        columns: Sequence[str] | None = None,
        filter: str | Column | None = None,
        batch_size: int | None = None,
    ) -> "Scanner":
        """Scanner with projection + predicate pushdown (scanner.h:205)."""
        return Scanner(self._projected(columns, filter), batch_size)

    def to_df(
        self,
        columns: Sequence[str] | None = None,
        filter: str | Column | None = None,
    ) -> DataFrame:
        """The distributed view — what a Spark-native consumer uses."""
        return self._projected(columns, filter)

    def to_table(self, columns=None, filter=None):
        return self.scanner(columns, filter).to_table()

    def head(self, num_rows: int, columns=None, filter=None):
        return self.scanner(columns, filter).head(num_rows)

    def count_rows(self, filter: str | Column | None = None) -> int:
        return self.scanner(filter=filter).count_rows()

    def take(self, indices: Sequence[int], columns: Sequence[str] | None = None):
        """Rows at positional ``indices`` under dataset order =
        (file path, row position in file); parquet only (uses the
        ``_metadata.row_index`` column)."""
        if self._fmt != "parquet":
            raise NotImplementedError("take() requires parquet fragments")
        from pyspark.sql import Window as W

        df = self._df.select(
            F.col("_metadata.file_path").alias("__f__"),
            F.col("_metadata.row_index").alias("__i__"),
            "*",
        )
        # global row_number = a total sort; take() is a driver-bound
        # surface (pyarrow's take also materializes caller-side), so the
        # single-partition window is the accepted cost here — the
        # distributed path is to_df() + an explicit order
        pos = F.row_number().over(W.orderBy("__f__", "__i__")) - 1
        out = (
            df.withColumn("__pos__", pos)
            .where(F.col("__pos__").isin(list(map(int, indices))))
            .orderBy("__pos__")
            .drop("__f__", "__i__", "__pos__")
        )
        if columns:
            out = out.select(*columns)
        return out.toArrow()


class Scanner:
    """Materialization surface (pyarrow Scanner parity): the plan is a
    Spark DataFrame until a to_* call pulls Arrow data to the caller."""

    def __init__(self, df: DataFrame, batch_size: int | None = None):
        self._df = df
        self._batch_size = batch_size

    @property
    def projected_schema(self):
        return self._df.limit(0).toArrow().schema

    def to_df(self) -> DataFrame:
        return self._df

    def to_table(self):
        return self._df.toArrow()

    def to_batches(self):
        """Iterator of RecordBatches; ``batch_size`` re-slices the
        collected table (Spark's Arrow collection batches by its own
        maxRecordsPerBatch)."""
        tbl = self.to_table()
        if self._batch_size:
            return iter(tbl.to_batches(max_chunksize=self._batch_size))
        return iter(tbl.to_batches())

    def head(self, num_rows: int):
        return self._df.limit(num_rows).toArrow()

    def count_rows(self) -> int:
        return self._df.count()


class Fragment:
    """A single data file of the dataset (dataset/dataset.h Fragment):
    reads re-scan just this file, filters still push down."""

    def __init__(self, ds: Dataset, path: str):
        self._ds = ds
        self.path = path

    def _df(self) -> DataFrame:
        return read_dataset(
            self._ds._spark, self.path, self._ds._fmt,
            schema=self._ds._schema,
            partition_base_dir=self._ds._base_dir
            or (self._ds._path if isinstance(self._ds._path, str) else None),
            **self._ds._options,
        )

    def to_table(self, columns=None, filter=None):
        df = self._df()
        if filter is not None:
            df = df.where(F.expr(filter) if isinstance(filter, str) else filter)
        if columns:
            df = df.select(*columns)
        return df.toArrow()

    def count_rows(self, filter: str | Column | None = None) -> int:
        df = self._df()
        if filter is not None:
            df = df.where(F.expr(filter) if isinstance(filter, str) else filter)
        return df.count()

    @property
    def physical_schema(self):
        return self._df().limit(0).toArrow().schema
