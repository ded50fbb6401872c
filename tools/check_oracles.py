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


_DUCK_CAT = {
    "TINYINT": "i8", "SMALLINT": "i16", "INTEGER": "i32", "INT": "i32",
    "BIGINT": "i64", "UBIGINT": "u64", "UINTEGER": "u32",
    "DOUBLE": "f64", "FLOAT": "f32", "REAL": "f32",
    "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date", "BLOB": "bytes",
}


def duck_type_cat(t: str) -> str:
    """Canonical category for a declared DuckDB type.  HUGEINT/DECIMAL
    map to a poison category: the driver's type-tagged hash treats them
    as distinct from Spark's bigint/double even when values are equal
    (found by the round-2 judge on sum(BIGINT) -> HUGEINT)."""
    t = t.upper()
    if t.startswith("DECIMAL") or "HUGEINT" in t:
        return f"POISON({t})"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t.endswith("[]"):
        return "list<" + duck_type_cat(t[:-2]) + ">"
    return _DUCK_CAT.get(t, t.lower())


_SPARK_CAT = {
    "tinyint": "i8", "smallint": "i16", "int": "i32", "bigint": "i64",
    "double": "f64", "float": "f32", "string": "str", "boolean": "bool",
    "date": "date", "timestamp": "ts", "timestamp_ntz": "ts",
    "binary": "bytes",
}


def spark_type_cat(t: str) -> str:
    if t.startswith("array<") and t.endswith(">"):
        return "list<" + spark_type_cat(t[6:-1]) + ">"
    return _SPARK_CAT.get(t, t)


def type_mismatches(spark_df, con, sql: str) -> list[str]:
    """Compare Spark's declared schema against DuckDB's declared result
    types the way the driver's type-tagged hash would."""
    duck = {
        r[0]: duck_type_cat(r[1])
        for r in con.execute(f"DESCRIBE {sql}").fetchall()
    }
    spark = {f.name: spark_type_cat(f.dataType.simpleString())
             for f in spark_df.schema.fields}
    probs = []
    for col, dt in sorted(duck.items()):
        if dt.startswith("POISON"):
            probs.append(f"{col}: oracle type {dt} (cast it in the SQL)")
        elif col in spark and spark[col] != dt:
            probs.append(f"{col}: spark {spark[col]} vs oracle {dt}")
    return probs


def run_checks(sf_dir: str, only: set | None = None, spark=None) -> list[str]:
    """Run the oracle comparison for the named queries (all when None);
    returns the list of failing query names.  Importable so pytest can
    keep the tail queries (past the external driver's 50-entry window)
    under continuous verification."""
    spark = spark or get_spark(app_name="oracle_check")
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
            spark_df = fn(spark, sf_dir)
            sdf = spark_df.toPandas()
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
        tprobs = type_mismatches(spark_df, con, oracles[name])
        if tprobs:
            ok = False
            print(f"FAIL  {name}: declared-type drift: {'; '.join(tprobs)}")
        elif sorted(sdf.columns) != sorted(odf.columns):
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
    return failures


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    failures = run_checks(sf_dir, only)
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
