"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark, runs the matching
``oracle_sql()`` on DuckDB over the same parquet, and compares
row count / column names / order-insensitive value hash.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from deepie_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        v += 0.0  # collapse -0.0 to 0.0 (signed-zero ULP disagreements)
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    spark = get_spark("oracle_check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"{name:24s} SPARK ERROR: {str(e)[:200]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"{name:24s} ORACLE ERROR: {e}")
            failures.append(name)
            continue
        ok_n = len(srows) == len(orows)
        ok_c = sorted(scols) == sorted(ocols)
        ok_v = ok_c and value_hash(srows, scols) == value_hash(orows, ocols)
        status = "OK" if (ok_n and ok_c and ok_v) else "MISMATCH"
        print(
            f"{name:24s} {status}  rows {len(srows)}/{len(orows)} "
            f"cols={'=' if ok_c else f'{scols} vs {ocols}'} "
            f"hash={'=' if ok_v else 'DIFF'} ({time.time()-t0:.1f}s)"
        )
        if status != "OK":
            failures.append(name)
            if ok_c and not ok_v:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = {tuple(norm_cell(r[i]) for i in order) for r in srows}
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                oset = {tuple(norm_cell(r[i]) for i in oorder) for r in orows}
                print("   spark-only:", list(sset - oset)[:3])
                print("   oracle-only:", list(oset - sset)[:3])
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(only=sys.argv[1:] or None))
