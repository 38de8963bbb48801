"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side by side on the same parquet
fixtures and compares: column set, row count, and order-insensitive
values (columns sorted by name, rows sorted by all columns). Mirrors the
reference's "naive reference implementation" test pattern
(cpp/src/arrow/acero/hash_join_node_test.cc randomized tests).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from arrow_spark.catalog import TABLES


def duck_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


@dataclass
class CompareResult:
    name: str
    ok: bool
    row_count_spark: int
    row_count_oracle: int
    errors: list[str] = field(default_factory=list)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize for order-insensitive comparison."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: None
                if v is None or (isinstance(v, float) and math.isnan(v))
                else (v if isinstance(v, (str, bytes)) else str(v))
            )
    sort_cols = [c for c in df.columns]
    key = df.astype(str)
    order = key.sort_values(by=sort_cols, kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a) if a is not None else math.nan, float(b) if b is not None else math.nan
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    res = CompareResult(
        name=name,
        ok=True,
        row_count_spark=len(spark_pdf),
        row_count_oracle=len(oracle_pdf),
    )
    sp_cols, or_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sp_cols != or_cols:
        res.ok = False
        res.errors.append(f"columns differ: spark={sp_cols} oracle={or_cols}")
        return res
    if len(spark_pdf) != len(oracle_pdf):
        res.ok = False
        res.errors.append(f"row counts differ: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return res
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        for i in range(len(av)):
            x = av[i] if not (isinstance(av[i], float) and np.isnan(av[i])) else None
            y = bv[i] if not (isinstance(bv[i], float) and np.isnan(bv[i])) else None
            x = None if x is pd.NaT or (x is np.nan) else x
            y = None if y is pd.NaT or (y is np.nan) else y
            if not _values_equal(x, y):
                res.ok = False
                res.errors.append(f"col {c} row {i}: spark={av[i]!r} oracle={bv[i]!r}")
                if len(res.errors) > 5:
                    return res
    return res


def run_compare(spark, name: str, fn, oracle: str | None, sf_dir: str) -> CompareResult:
    sdf = fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if oracle is None:
        return CompareResult(name, len(spark_pdf) >= 0, len(spark_pdf), -1)
    con = duck_connection(sf_dir)
    try:
        oracle_pdf = con.sql(oracle).df()
    finally:
        con.close()
    return compare_frames(name, spark_pdf, oracle_pdf)
