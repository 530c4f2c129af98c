"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row count, column names, and an order-insensitive value hash (columns
sorted by name, rows sorted, floats must match exactly — which is why
the queries round any FP aggregate in both engines).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from hive_lineage_spark.oracle import (
        duckdb_connection,
        duckdb_fingerprint,
        spark_fingerprint,
    )
    from hive_lineage_spark.session import get_spark

    spark = get_spark("check_oracle", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connection(sf_dir)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sfp = spark_fingerprint(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: rows-only check, {sfp[0]} rows ({time.time()-t0:.1f}s)")
            if sfp[0] == 0:
                failures.append(name)
                print(f"FAIL  {name}: 0 rows")
            continue
        try:
            dfp = duckdb_fingerprint(con, oracles[name])
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        ok = sfp == dfp
        print(f"{'OK  ' if ok else 'FAIL'}  {name}: spark={sfp[0]} duck={dfp[0]} ({time.time()-t0:.1f}s)")
        if not ok:
            failures.append(name)
            if sfp[1] != dfp[1]:
                print(f"      cols spark={sfp[1]} duck={dfp[1]}")
            else:
                print("      value-hash mismatch")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
