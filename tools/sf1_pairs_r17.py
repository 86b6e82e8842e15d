"""Same-session sf1 pairing (the r16 amortization-evidence pattern):
run named queries on Spark (noop sink, warm + median of 3) and their
DuckDB oracles (median of 3) against testdata/sf1, in ONE session so
the pair is host-comparable. Usage:
python tools/sf1_pairs_r17.py out.json query [query ...]"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from finlogic_spark import driver_queries as dq
from finlogic_spark.session import get_spark

SF_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "testdata", "sf1",
)
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    out_path, names = sys.argv[1], sys.argv[2:]
    spark = get_spark("sf1-pairs-r17")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    res = {}
    for name in names:
        def run_spark():
            df = dq.QUERIES[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
        run_spark()  # warm
        s = []
        for _ in range(3):
            t0 = time.perf_counter(); run_spark()
            s.append(time.perf_counter() - t0)
        sql = dq.ORACLES.get(name) or dq.LAZY_ORACLES[name](SF_DIR)
        b = []
        for _ in range(3):
            t0 = time.perf_counter(); con.sql(sql).fetchall()
            b.append(time.perf_counter() - t0)
        res[name] = {
            "spark_s": round(statistics.median(s), 3),
            "duckdb_s": round(statistics.median(b), 3),
            "ratio": round(statistics.median(s) / statistics.median(b), 3),
        }
        print(name, res[name], flush=True)
    with open(out_path, "w") as fh:
        json.dump({"sf_dir": SF_DIR, "pairs": res}, fh, indent=1)


if __name__ == "__main__":
    main()
