"""Parquet modular encryption round-trip (reference:
cpp/src/parquet/encryption/crypto_factory.h, encryption.h).

The crypto factory instantiates the KMS client through the JVM app
classloader, so the compiled in-memory KMS must be on
driver/executor extraClassPath at JVM LAUNCH — these tests therefore
drive a fresh subprocess SparkSession (one JVM for all assertions)
and verify the on-disk artifacts from the parent process."""

from __future__ import annotations

import glob
import json
import os

import pytest

from arrow_spark.sources.encryption import (
    compile_inmemory_kms,
    run_encryption_subprocess,
)

_SCRIPT = r"""
import json, os
from pyspark.sql import SparkSession

classes = os.environ["ARROW_SPARK_KMS_CLASSES"]
base = os.environ["ARROW_SPARK_ENC_DIR"]
spark = (
    SparkSession.builder.master("local[4]")
    .appName("parquet-encryption-test")
    .config("spark.driver.extraClassPath", classes)
    .config("spark.executor.extraClassPath", classes)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from arrow_spark.sources.encryption import (
    read_encrypted_parquet,
    write_encrypted_parquet,
)

KEYS = {"kf": b"0123456789012345", "kc": b"abcdefghabcdefgh"}
df = spark.range(0, 1000).selectExpr(
    "id", "CAST(id * 7 AS STRING) AS ssn", "id % 13 AS bucket"
)
expected = sorted((r["id"], r["ssn"], r["bucket"]) for r in df.collect())
results = {}

# 1. encrypted write (footer key kf, ssn column under kc) + keyed read
enc_path = os.path.join(base, "enc")
write_encrypted_parquet(
    df, enc_path, KEYS, footer_key="kf", column_keys={"kc": ["ssn"]}
)
got = sorted(
    (r["id"], r["ssn"], r["bucket"])
    for r in read_encrypted_parquet(spark, enc_path, KEYS).collect()
)
results["roundtrip_equal"] = got == expected

# 2. read WITHOUT any keys must fail (footer is encrypted)
try:
    spark.read.parquet(enc_path).collect()
    results["no_key_read_fails"] = False
except Exception as e:
    results["no_key_read_fails"] = True
    results["no_key_error"] = str(e)[:200]

# 3. read with WRONG master key bytes must fail (AES-GCM tag mismatch).
# parquet-mr caches unwrapped KEKs per access token inside the JVM, so
# purge the KeyToolkit cache first or the wrong-key read would reuse
# step 1's unwrapped keys.
spark._jvm.org.apache.parquet.crypto.keytools.KeyToolkit.removeCacheEntriesForAllTokens()
try:
    read_encrypted_parquet(
        spark, enc_path, {"kf": b"XXXXXXXXXXXXXXXX", "kc": b"YYYYYYYYYYYYYYYY"}
    ).collect()
    results["wrong_key_read_fails"] = False
except Exception as e:
    results["wrong_key_read_fails"] = True
    results["wrong_key_error"] = str(e)[:200]

# 4. plaintext-footer mode: legacy readers see schema, data stays locked
pf_path = os.path.join(base, "enc_pf")
write_encrypted_parquet(
    df, pf_path, KEYS, footer_key="kf", column_keys={"kc": ["ssn"]},
    plaintext_footer=True,
)
got_pf = sorted(
    (r["id"], r["ssn"], r["bucket"])
    for r in read_encrypted_parquet(spark, pf_path, KEYS).collect()
)
results["plaintext_footer_roundtrip_equal"] = got_pf == expected
try:
    spark.read.parquet(pf_path).select("ssn").collect()
    results["plaintext_footer_column_locked"] = False
except Exception:
    results["plaintext_footer_column_locked"] = True
# schema IS visible to a key-less reader in plaintext-footer mode
results["plaintext_footer_schema_visible"] = set(
    spark.read.parquet(pf_path).columns
) == {"id", "ssn", "bucket"}

print("RESULTS:" + json.dumps(results))
"""


@pytest.fixture(scope="module")
def enc_run(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("parquet_enc"))
    classes = compile_inmemory_kms(base)
    os.environ["ARROW_SPARK_ENC_DIR"] = base
    out = run_encryption_subprocess(_SCRIPT, classes, timeout=300)
    line = [x for x in out.splitlines() if x.startswith("RESULTS:")][-1]
    return base, json.loads(line[len("RESULTS:"):])


def test_encrypted_roundtrip_equality(enc_run):
    _, res = enc_run
    assert res["roundtrip_equal"]


def test_read_without_key_fails(enc_run):
    _, res = enc_run
    assert res["no_key_read_fails"], "key-less read must not see encrypted data"


def test_read_with_wrong_key_fails(enc_run):
    _, res = enc_run
    assert res["wrong_key_read_fails"], "wrong master key must fail the GCM unwrap"


def test_encrypted_footer_magic_is_pare(enc_run):
    """Encrypted-footer files end with the PARE magic, not PAR1 — the
    format-level proof the footer (schema, stats, offsets) is actually
    ciphertext, interoperable with the reference's C++ reader."""
    base, _ = enc_run
    parts = glob.glob(os.path.join(base, "enc", "part-*.parquet"))
    assert parts
    for p in parts:
        with open(p, "rb") as f:
            f.seek(-4, os.SEEK_END)
            assert f.read() == b"PARE", p


def test_plaintext_footer_mode(enc_run):
    """Plaintext-footer mode (encryption.h kPlaintextFooter): PAR1
    magic, schema visible to key-less readers, data columns still
    locked, keyed round-trip exact."""
    base, res = enc_run
    assert res["plaintext_footer_roundtrip_equal"]
    assert res["plaintext_footer_schema_visible"]
    assert res["plaintext_footer_column_locked"]
    parts = glob.glob(os.path.join(base, "enc_pf", "part-*.parquet"))
    assert parts
    for p in parts:
        with open(p, "rb") as f:
            f.seek(-4, os.SEEK_END)
            assert f.read() == b"PAR1", p
