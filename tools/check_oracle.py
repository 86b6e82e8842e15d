"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB, compare
row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df):
    """pandas DataFrame → canonical sorted list of row tuples with
    columns sorted by name and values stringified."""
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.6f}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return cols, sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import importlib

    entry_mod = importlib.import_module("__spark_entry__")
    from finlogic_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            spark_df = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spark_df)} rows")
            continue
        try:
            duck_df = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            continue
        sc, sv = normalize(spark_df)
        dc, dv = normalize(duck_df)
        if sc != dc:
            failures.append(name)
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
        elif len(sv) != len(dv):
            failures.append(name)
            print(f"FAIL {name}: rows spark={len(sv)} duck={len(dv)}")
        elif sv != dv:
            failures.append(name)
            diff = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {diff}")
        else:
            print(f"OK   {name}: {len(sv)} rows")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
