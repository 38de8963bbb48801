"""Materialize .scale/gen-sf1-hashsample: a deterministic hash-sampled
twin of gen-sf1 that makes the QUADRATIC oracles feasible (r9 ask #3 /
r10 ask #5 — shrink the sf1 oracle skip list).

Why sampling closes the gap: the 13 skipped queries are skipped because
their ORACLE is by-design quadratic/recursive (unblocked all-pairs or
transitive closure), not because the Spark plan can't run at sf1. Row
qualification in every pair oracle depends only on the two rows, so
restricting the INPUT tables to a deterministic subset restricts the
pair relation consistently on both engines — the comparison stays
hash-exact while shrinking the oracle's pair space by rate². Unlike
rerunning at gen-sf0.1, the sampled rows keep sf1's per-row
DISTRIBUTION (document lengths, id magnitudes, value domains), which is
what the fixed-scale gate can't see.

Sampling rule (documented, reproducible): keep rows where
  (id * 2654435761) % 2^32 % 100 < rate_pct
— Knuth's multiplicative hash on the table's primary id, computed by
DuckDB at materialization time. Both engines then read the SAME parquet,
so no cross-engine hash portability is needed at query time.

Sampled tables (only those the skipped queries touch):
  documents  doc_id   6%  (~3,000 rows — pair space ~36% of gen-sf0.1's)
  embeddings vec_id  10%  (~2,000)
  lineitem   l_orderkey 10%  (~600k — order structure kept intact)
  customer   c_custkey  10%  (~15k)
Everything else is byte-copied unchanged (events keeps its exact ts
encoding — no round-trip).
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

RATES = {
    "documents": ("doc_id", 6),
    "embeddings": ("vec_id", 10),
    "lineitem": ("l_orderkey", 10),
    "customer": ("c_custkey", 10),
}

KNUTH = 2654435761
M32 = 2**32


def main() -> int:
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale"
    )
    src = os.path.join(root, sys.argv[1] if len(sys.argv) > 1 else "gen-sf1")
    dst = src + "-hashsample"
    if not os.path.isdir(src):
        print(f"missing {src} — run scripts/gen_scale_data.py first")
        return 1
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for entry in sorted(os.listdir(src)):
        name = entry.replace(".parquet", "")
        sp = os.path.join(src, entry)
        dp = os.path.join(dst, entry)
        if name not in RATES:
            if os.path.isdir(sp):
                shutil.copytree(sp, dp, dirs_exist_ok=True)
            else:
                shutil.copy2(sp, dp)
            print(f"copy   {entry}")
            continue
        idc, rate = RATES[name]
        pat = sp + ("/*.parquet" if os.path.isdir(sp) else "")
        if os.path.isdir(dp):
            shutil.rmtree(dp)
        n = con.execute(
            f"""
            COPY (
              SELECT * FROM read_parquet('{pat}')
              WHERE ({idc} * {KNUTH}) % {M32} % 100 < {rate}
            ) TO '{dp}' (FORMAT PARQUET)
            """
        ).fetchone()[0]
        print(f"sample {entry}: {n:,} rows kept ({idc} hash < {rate}%)")
    print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
