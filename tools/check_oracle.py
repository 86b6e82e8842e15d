"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB, compare
row count, column names, and order-insensitive values.

The driver's own gate caps at the first 50 registry queries; this
runs ALL of them. Each round commits the result as
CORRECTNESS_local_r{N}.json (--json PATH) so full-registry coverage
is auditable without re-running Spark.

Usage: python tools/check_oracle.py [--json out.json] [sf_dir] [query ...]
"""

from __future__ import annotations

import json
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
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import importlib

    entry_mod = importlib.import_module("__spark_entry__")
    from finlogic_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    from finlogic_spark import driver_queries as _dq

    # resolve data-dependent oracles against the dir actually checked
    oracles = _dq.resolve_oracles(sf_dir)
    failures = []
    results: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            spark_df = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            results[name] = {"status": "FAIL", "err": f"spark: {str(e)[:200]}"}
            print(f"FAIL {name}: spark error: {str(e)[:200]}")
            continue
        if name not in oracles:
            results[name] = {"status": "ROWS_ONLY", "rows": len(spark_df)}
            print(f"ROWS-ONLY {name}: {len(spark_df)} rows")
            continue
        try:
            duck_df = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            results[name] = {"status": "FAIL", "err": f"duckdb: {str(e)[:200]}"}
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            continue
        sc, sv = normalize(spark_df)
        dc, dv = normalize(duck_df)
        # Mirror the driver gate's full three-field contract per row
        # (rows/schema/hash judged INDEPENDENTLY, so a schema-
        # preserving row-count bug is NAMED, not folded into the hash):
        rec = {
            "rows_match": len(sv) == len(dv),
            "schema_match": sc == dc,
            "hash_match": sc == dc and sv == dv,
            "spark_rows": len(sv),
            "oracle_rows": len(dv),
            "err": None,
        }
        if sc != dc:
            rec["status"] = "FAIL"
            rec["err"] = f"columns spark={sc} duck={dc}"
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
        elif len(sv) != len(dv):
            rec["status"] = "FAIL"
            rec["err"] = f"rows spark={len(sv)} duck={len(dv)}"
            print(f"FAIL {name}: rows spark={len(sv)} duck={len(dv)}")
        elif sv != dv:
            diff = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
            rec["status"] = "FAIL"
            rec["err"] = f"values differ: {diff}"
            print(f"FAIL {name}: values differ; first diffs: {diff}")
        else:
            rec["status"] = "OK"
            rec["rows"] = len(sv)
            print(f"OK   {name}: {len(sv)} rows")
        if rec["status"] == "FAIL":
            failures.append(name)
        results[name] = rec
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(results),
                    "n_failures": len(failures),
                    "results": results,
                },
                f,
                indent=1,
            )
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
