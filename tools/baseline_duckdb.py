"""De-facto performance baseline: time the DuckDB oracle SQL for every
bench query on the same parquet files bench.py reads (BASELINE.md: the
reference publishes no numbers, so DuckDB-on-sf0.1 is the yardstick).

Methodology matches bench.py: warm each query once (plan/IO caches),
time the second run. Prints ONE JSON line mirroring bench.py's shape.

Usage: python tools/baseline_duckdb.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import BENCH_QUERIES
from finlogic_spark.driver_queries import ORACLES

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.cpu_count()}")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in ORACLES:
            continue  # rows-only query: no SQL-expressible oracle
        sql = ORACLES[name]
        con.sql(sql).fetchall()
        start = time.perf_counter()
        con.sql(sql).fetchall()
        timings[name] = round(time.perf_counter() - start, 3)

    print(
        json.dumps(
            {
                "metric": "duckdb_baseline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
