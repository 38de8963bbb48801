"""Events-fixture normalization: all physical ts encodings → TimestampType.

The driver's events.parquet has shipped with three physical encodings across
rounds: TIMESTAMP(NANOS) (read by Spark as raw int64 under nanosAsLong),
TIMESTAMP(MICROS, isAdjustedToUTC=true) (TimestampType), and
TIMESTAMP(MICROS, isAdjustedToUTC=false) (TimestampNTZType). The catalog must
normalize every variant to session-tz TimestampType so temporal casts,
range-frame windows, and streaming watermarks all work (Arrow reference:
cpp/src/arrow/type.h TIMESTAMP — tz-absent means wall-clock/NTZ).
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from arrow_spark import catalog

ROWS = [
    (1, dt.datetime(2024, 1, 1, 0, 0, 0), 10, "click", 1.5, "{}"),
    (2, dt.datetime(2024, 1, 1, 0, 0, 30), 11, "view", 2.5, "{}"),
    (3, dt.datetime(2024, 1, 2, 12, 30, 0), 10, "click", 3.5, "{}"),
]
COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _write_variant(tmpdir: str, ts_type: pa.DataType) -> str:
    arrays = {
        "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
        "ts": pa.array([r[1] for r in ROWS]).cast(ts_type),
        "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
        "event_type": pa.array([r[3] for r in ROWS], pa.string()),
        "value": pa.array([r[4] for r in ROWS], pa.float64()),
        "props": pa.array([r[5] for r in ROWS], pa.string()),
    }
    path = os.path.join(tmpdir, "events.parquet")
    pq.write_table(pa.table(arrays), path)
    return tmpdir


@pytest.mark.parametrize(
    "ts_type",
    [
        pa.timestamp("ns"),  # nanos → Spark long under nanosAsLong
        pa.timestamp("us", tz="UTC"),  # µs LTZ → TimestampType already
        pa.timestamp("us"),  # µs NTZ → TimestampNTZType (round-2 breaker)
    ],
    ids=["ns-long", "us-ltz", "us-ntz"],
)
def test_events_ts_normalized_to_timestamp(spark, tmp_path, ts_type):
    sf_dir = _write_variant(str(tmp_path), ts_type)
    df = catalog.table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = sorted(r["ts"] for r in df.select("ts").collect())
    want = sorted(r[1] for r in ROWS)
    assert got == want
    # The round-2 failure modes: double cast (temporal family) and
    # watermark eligibility (streaming family) both need TimestampType.
    df.selectExpr("cast(ts as double) secs").collect()
