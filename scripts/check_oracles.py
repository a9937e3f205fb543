"""Local driver simulation: run every queries() entry and compare with its
DuckDB oracle (row count + column names + order-insensitive value set).

Usage: python scripts/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry_mod
from graphrag_mrkr_2_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        return round(v, 6)
    return v


def main(sf_dir: str) -> int:
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = 0
    oracles = entry_mod.oracle_sql()
    for name, fn in entry_mod.queries().items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows ({time.time() - t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: oracle error {e}")
            failures += 1
            continue

        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"[FAIL] {name}: columns spark={scols} oracle={ocols}")
            ok = False
        elif len(srows) != len(orows):
            print(f"[FAIL] {name}: rows spark={len(srows)} oracle={len(orows)}")
            ok = False
        else:
            order = sorted(scols)
            sset = sorted(
                (
                    tuple(norm_cell(row[c]) for c in order)
                    for row in (r.asDict() for r in srows)
                ),
                key=repr,  # total order even with NULLs / mixed types
            )
            oset = sorted(
                (
                    tuple(norm_cell(dict(zip(ocols, row))[c]) for c in order)
                    for row in orows
                ),
                key=repr,
            )
            if sset != oset:
                diff = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
                print(f"[FAIL] {name}: value mismatch, first diffs {diff}")
                ok = False
        if ok:
            print(f"[ OK ] {name}: {len(srows)} rows match ({time.time() - t0:.1f}s)")
        else:
            failures += 1

    print(f"\n{failures} failures")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
