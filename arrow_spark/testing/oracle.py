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
    import os

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark-written tables are DIRECTORIES of part files (the
        # generated scale fixtures); driver fixtures are single files
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{src}'")
    return con


@dataclass
class CompareResult:
    name: str
    ok: bool
    row_count_spark: int
    row_count_oracle: int
    errors: list[str] = field(default_factory=list)


def _cstr(v) -> str:
    """Canonical DRIVER-GRADE string for one cell.

    The driver hashes stringified values with NO float tolerance, and a
    DuckDB HUGEINT/floor() lands in pandas as float64 ('3.0') while the
    Spark long is int64 ('3') — a silent hash mismatch (all 5 red rows
    of CORRECTNESS_r04 were exactly this). So: ints and floats stringify
    DIFFERENTLY here on purpose, and floats compare by exact repr (bit
    equality), never isclose.
    """
    import datetime
    from decimal import Decimal

    if v is None or v is pd.NaT:
        return "\x00NULL"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "\x00NULL" if math.isnan(f) else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return "True" if v else "False"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, pd.Timestamp):
        # µs-floor (pandas ns-resolution vs DuckDB µs) — driver tolerates
        return v.floor("us").isoformat(timespec="microseconds")
    if isinstance(v, datetime.datetime):
        return v.isoformat(timespec="microseconds")
    if isinstance(v, datetime.date):
        # a DATE equals the midnight timestamp (cast_matrix is driver-green
        # with Spark date vs DuckDB timestamp in one column)
        return datetime.datetime(v.year, v.month, v.day).isoformat(
            timespec="microseconds"
        )
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, np.ndarray):
        return "[" + ", ".join(_cstr(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_cstr(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{k}: {_cstr(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def _canon_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    df = df[sorted(df.columns)]
    cols = []
    for c in df.columns:
        s = df[c]
        # to_list() yields pd.Timestamp for datetime64 columns (to_numpy
        # would yield np.datetime64, whose str keeps ns digits and dodges
        # the µs normalization in _cstr)
        if pd.api.types.is_numeric_dtype(s) and s.dtype != object:
            cols.append(s.to_numpy())
        else:
            cols.append(s.to_list())
    rows = [tuple(_cstr(col[i]) for col in cols) for i in range(len(df))]
    rows.sort()
    return rows


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
    a, b = _canon_rows(spark_pdf), _canon_rows(oracle_pdf)
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            for c, xa, xb in zip(sp_cols, ra, rb):
                if xa != xb:
                    res.ok = False
                    res.errors.append(f"sorted row {i} col {c}: spark={xa!r} oracle={xb!r}")
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
