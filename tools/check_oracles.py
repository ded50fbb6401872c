"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the
given sf dir, compare row count, column names, and order-insensitive
values. Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from lynxkite_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                row.append(round(v, 9))
            elif hasattr(v, "isoformat"):
                row.append(v.isoformat())
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                row.append(tuple(v))
            else:
                row.append(v)
        rows.append(tuple(row))
    return sorted(rows, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"pass* {name}: rows={len(sdf)} (no oracle, rows-only) [{time.time()-t0:.1f}s]")
            if len(sdf) == 0:
                failures.append(name)
                print(f"FAIL  {name}: empty result")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        ok = True
        if sorted(sdf.columns) != sorted(odf.columns):
            ok = False
            print(f"FAIL  {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif len(sdf) != len(odf):
            ok = False
            print(f"FAIL  {name}: rows {len(sdf)} vs {len(odf)}")
        else:
            a, b = normalize(sdf), normalize(odf)
            if a != b:
                ok = False
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL  {name}: values differ, e.g. {diff}")
        if ok:
            print(f"PASS  {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
