#!/usr/bin/env python
"""Hostile-config audit of the NEXT driver correctness window.

Runs the first `--n` gates of the rotated queries() order (i.e. exactly
the gates the driver's next CORRECTNESS window will check) against their
DuckDB oracles at sf0.01 — but under a deliberately hostile Spark config
(non-UTC session timezone, odd shuffle-partition count, small local
parallelism) so any timezone/partitioning sensitivity surfaces HERE
rather than in the driver's official record.

Usage: python scripts/window_audit.py [--n 50] [--tz Pacific/Chatham]
Prints one line per gate (OK/FAIL) + a summary; exit 1 on any failure.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


# type-aware value serialization (r5): int and float serialize
# differently so HUGEINT/DECIMAL-class type divergence fails here the
# way it fails the driver's value hash — ONE shared definition with
# tests/test_entry_contract.py
from opensearch_spark.contract_hash import as_multiset  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--tz", default="Pacific/Chatham")  # +12:45, hostile
    ap.add_argument("--cores", default="5")
    ap.add_argument("--shuffle", default="7")
    args = ap.parse_args()

    import duckdb

    from opensearch_spark.session import get_spark

    spark = get_spark("window_audit", master=f"local[{args.cores}]")
    spark.conf.set("spark.sql.shuffle.partitions", args.shuffle)
    spark.conf.set("spark.sql.session.timeZone", args.tz)

    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    window = list(queries)[: args.n]
    fails = []
    for name in window:
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            if name not in oracles:
                status = f"OK (rows-only, {len(rows)} rows)"
            else:
                res = con.sql(oracles[name])
                ocols = list(res.columns)
                orows = res.fetchall()
                if sorted(cols) != sorted(ocols):
                    raise AssertionError(
                        f"schema {sorted(cols)} != {sorted(ocols)}")
                if len(rows) != len(orows):
                    raise AssertionError(f"rows {len(rows)} != {len(orows)}")
                got, want = as_multiset(cols, rows), as_multiset(ocols, orows)
                if got != want:
                    diff = [(g, w) for g, w in zip(got, want) if g != w][:3]
                    raise AssertionError(f"values: {diff}")
                status = f"OK ({len(rows)} rows)"
        except Exception as e:  # noqa: BLE001 — audit must keep going
            status = f"FAIL: {e}"
            fails.append(name)
        print(f"{name:45s} {status}  [{time.perf_counter() - t0:.1f}s]",
              flush=True)
    print(f"\n{len(window) - len(fails)}/{len(window)} green "
          f"(tz={args.tz}, local[{args.cores}], "
          f"shuffle.partitions={args.shuffle})")
    if fails:
        print("FAILED:", fails)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
