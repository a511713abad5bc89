"""Local stand-in for the driver's correctness gate.

Runs every queries() entry at sf0.01 against its oracle_sql() twin in
DuckDB and compares row count + (sorted-by-name) columns + values.

Usage: python tools/check_entry.py [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as E  # noqa: E402
from xapian_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )
    return out


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    spark = get_spark("check-entry")
    qs = E.queries()
    oracles = E.oracle_sql()
    only = set(sys.argv[1:])
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            srows = df.collect()
            scols = df.columns
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle)")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            orows = res.fetchall()
            ocols = [d[0] for d in res.description]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {ex}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns {sorted(scols)} != {sorted(ocols)}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(orows)}")
            n_fail += 1
            continue
        s = canon([tuple(r) for r in srows], scols)
        o = canon(orows, ocols)
        if s != o:
            diffs = [(a, b) for a, b in zip(s, o) if a != b][:3]
            print(f"FAIL  {name}: values differ, e.g. {diffs}")
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(srows)} rows")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
