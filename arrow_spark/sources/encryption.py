"""Parquet modular encryption (footer + per-column keys, AES-GCM).

The reference implements modular encryption natively
(cpp/src/parquet/encryption/crypto_factory.h, encryption.h — footer
key, column keys, plaintext-footer mode, AAD). Spark exposes the SAME
format feature through parquet-mr's PropertiesDrivenCryptoFactory: the
write/read paths are configured entirely by ``parquet.*`` options, the
cipher work happens inside the parquet-mr writer/reader on the
executors, and the on-disk artifact is standard encrypted parquet
(footer magic ``PARE`` instead of ``PAR1``) interoperable with the
reference's C++ reader given the same keys.

What this module adds is the idiomatic-Spark wiring:

- :func:`encryption_options` builds the per-write / per-read option
  dict (factory class, KMS client class, key list, footer key, column
  key map). Options, NOT session-global Hadoop conf mutation — a
  concurrent writer on the same session must never inherit another
  write's keys (same discipline as write_dataset's
  partitionOverwriteMode).
- :func:`write_encrypted_parquet` / :func:`read_encrypted_parquet`
  apply them.
- :func:`compile_inmemory_kms` compiles the bundled in-memory KMS
  client (``sources/kms/InMemoryKms.java``) against the pyspark
  distribution's own parquet-hadoop jar. parquet-mr ships the
  KmsClient INTERFACE but no in-container implementation, and a mock
  KMS must live on the JVM classpath (`spark.driver.extraClassPath`),
  so tests compile it once and launch a subprocess session — see
  tests/test_parquet_encryption.py.

At 100 TB nothing here changes the plan shape: encryption is a
per-file writer/reader property; scans still prune columns and push
filters (stats of encrypted columns are encrypted with the same key,
so min/max pruning keeps working for readers holding the key).
"""

from __future__ import annotations

import base64
import os
import subprocess
import sys
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

FACTORY_CLASS = "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory"
KMS_CLIENT_CLASS = "arrowspark.kms.InMemoryKms"

_KMS_JAVA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "kms")


def compile_inmemory_kms(target_dir: str) -> str:
    """Compile InMemoryKms.java into ``target_dir`` (idempotent);
    returns the classes directory to put on the driver/executor
    classpath. Uses the pyspark distribution's own parquet-hadoop and
    hadoop-client-api jars, so the compiled class matches the runtime
    parquet-mr version exactly."""
    classes = os.path.join(target_dir, "kms-classes")
    marker = os.path.join(classes, "arrowspark", "kms", "InMemoryKms.class")
    if os.path.exists(marker):
        return classes
    import pyspark

    jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    cp = os.path.join(jars_dir, "*")  # javac classpath wildcard
    os.makedirs(classes, exist_ok=True)
    subprocess.run(
        [
            "javac",
            "-cp",
            cp,
            "-d",
            classes,
            os.path.join(_KMS_JAVA, "InMemoryKms.java"),
        ],
        check=True,
        capture_output=True,
    )
    return classes


def encryption_options(
    master_keys: Mapping[str, bytes],
    footer_key: str,
    column_keys: Mapping[str, Sequence[str]] | None = None,
    plaintext_footer: bool = False,
) -> dict[str, str]:
    """Option dict for DataFrameWriter/DataFrameReader:

    - ``master_keys``: key-id → 16/24/32-byte master key (base64'd into
      the key list the in-memory KMS resolves).
    - ``footer_key``: key id encrypting the footer (and any column not
      listed in ``column_keys``).
    - ``column_keys``: key-id → column names encrypted with that key
      (parquet-mr syntax ``keyId:colA,colB;keyId2:colC``).
    - ``plaintext_footer``: legacy-readable footer mode
      (encryption.h's kPlaintextFooter) — data stays encrypted.
    """
    for kid, key in master_keys.items():
        if len(key) not in (16, 24, 32):
            raise ValueError(f"master key {kid!r} must be 16/24/32 bytes AES")
    opts = {
        "parquet.crypto.factory.class": FACTORY_CLASS,
        "parquet.encryption.kms.client.class": KMS_CLIENT_CLASS,
        "parquet.encryption.key.list": ",".join(
            f"{kid}:{base64.b64encode(key).decode()}"
            for kid, key in master_keys.items()
        ),
        "parquet.encryption.footer.key": footer_key,
    }
    if column_keys:
        opts["parquet.encryption.column.keys"] = ";".join(
            f"{kid}:{','.join(cols)}" for kid, cols in column_keys.items()
        )
    if plaintext_footer:
        opts["parquet.encryption.plaintext.footer"] = "true"
    return opts


def write_encrypted_parquet(
    df: DataFrame,
    path: str,
    master_keys: Mapping[str, bytes],
    footer_key: str,
    column_keys: Mapping[str, Sequence[str]] | None = None,
    mode: str = "overwrite",
    plaintext_footer: bool = False,
) -> None:
    opts = encryption_options(master_keys, footer_key, column_keys, plaintext_footer)
    df.write.mode(mode).options(**opts).parquet(path)


def read_encrypted_parquet(
    spark: SparkSession, path: str, master_keys: Mapping[str, bytes]
) -> DataFrame:
    """Decrypting read: the reader only needs the factory, the KMS
    client, and the key list — footer/column key ids travel inside the
    file's key metadata."""
    opts = {
        "parquet.crypto.factory.class": FACTORY_CLASS,
        "parquet.encryption.kms.client.class": KMS_CLIENT_CLASS,
        "parquet.encryption.key.list": ",".join(
            f"{kid}:{base64.b64encode(key).decode()}"
            for kid, key in master_keys.items()
        ),
    }
    return spark.read.options(**opts).parquet(path)


def run_encryption_subprocess(script: str, classes_dir: str, timeout: int = 300) -> str:
    """Run ``script`` in a fresh python with a fresh JVM whose
    driver/executor classpath includes the compiled KMS client — the
    crypto factory instantiates the KMS via the JVM app classloader,
    so an already-running test JVM can't load it after the fact."""
    out = subprocess.run(
        [sys.executable, "-u", "-c", script],
        env={**os.environ, "ARROW_SPARK_KMS_CLASSES": classes_dir},
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    if out.returncode != 0:
        raise AssertionError(
            f"encryption subprocess failed:\n{out.stdout[-4000:]}\n{out.stderr[-4000:]}"
        )
    return out.stdout
