"""Layout-assisted TWAP at scale (VERDICT r10 item 2).

events_twap is sort-bound by design on a flat layout: the one lead()
window must hash-exchange and sort 100M rows at sf100 (25.1 s vs
DuckDB's 10.3 s in BENCH_r10_probes). The repo's storage answer is the
same one the bucketed TPC-H audit proved for joins/keep-last windows:
materialize events ONCE bucketed+sorted by (event_type, bkt_day, ts,
event_id) with the truncated timestamp as a stored column, and the
window's exchange AND sort ride the layout (plan pin:
tests/test_storage.py::test_bucketed_twap_no_exchange_no_sort).

This probe measures, in one session at a given SF:
- flat:      the registry events_twap against the parquet dir
- bucketed:  the same logical query via time_weighted_avg(...,
             bucket_col="bkt_day") on the bucketed table, with
             spark.sql.legacy.bucketedTableScan.outputOrdering=true
             (one-file-per-bucket writes make the sortBy order
             trustworthy; see the test's docstring)
- build_s:   the one-time layout cost (amortized across every
             window/agg/join keyed the same way)
- duckdb_s:  the oracle SQL on the same parquet (same warm+median
             discipline), for a same-run ratio

Bucket count defaults to 128 (the sf100 recipe: tasks-per-core > 1
hides stragglers). The plan audit runs first and the script exits
nonzero if the bucketed plan still carries an Exchange or Sort.

Usage: python tools/probe_twap_bucketed.py [--json out.json]
       [--runs N] [--buckets B] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import re


def bucketed_twap(spark):
    from pyspark.sql import functions as F

    from finlogic_spark.driver_queries import rN
    from finlogic_spark.operators.windows import time_weighted_avg

    eb = spark.table("events_twap_layout")
    out = time_weighted_avg(
        eb,
        ["event_type"],
        "ts",
        "value",
        tiebreak_cols=["event_id"],
        bucket_col="bkt_day",
    )
    return out.select(
        "event_type", "bucket_start", "n", rN(F.col("twap"), 6).alias("twap")
    )


def median_noop(df_fn, runs: int) -> float:
    df_fn().write.format("noop").mode("overwrite").save()  # warm
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df_fn().write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 2)


def main() -> int:
    argv = sys.argv[1:]
    json_out, runs, buckets = None, 3, 128
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if "--buckets" in argv:
        i = argv.index("--buckets")
        buckets = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/repo/testdata/sf100"

    from pyspark.sql import functions as F

    from finlogic_spark import plans
    from finlogic_spark.driver_queries import ORACLES, QUERIES
    from finlogic_spark.session import get_spark
    from finlogic_spark.sources import write_fact_layout

    spark = get_spark("probe-twap-bucketed")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")

    out: dict = {"sf_dir": sf_dir, "runs": runs, "buckets": buckets}

    # one-time layout build through the first-class API (the amortized
    # cost); registering it in TWAP_LAYOUTS makes the REGISTRY query
    # ride the layout, so bucketed_s measures exactly what the driver
    # would measure with the layout present.
    e = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    t0 = time.perf_counter()
    write_fact_layout(
        e,
        "events_twap_layout",
        ["event_type"],
        "ts",
        num_buckets=buckets,
        grain="day",
        tiebreak_cols=["event_id"],
    )
    out["build_s"] = round(time.perf_counter() - t0, 2)

    # plan audit before any timing: the probe is meaningless if the
    # layout didn't remove the exchange+sort
    plan = plans.formatted_plan(bucketed_twap(spark))
    n_ex = sum(
        1 for l in plan.splitlines() if re.match(r"^\(\d+\) Exchange", l.strip())
    )
    n_sort = sum(
        1 for l in plan.splitlines() if re.match(r"^\(\d+\) Sort\b", l.strip())
    )
    out["bucketed_exchanges"] = n_ex
    out["bucketed_sorts"] = n_sort
    if n_ex or n_sort:
        print(json.dumps(out))
        print("FAIL: bucketed plan still has exchange/sort", file=sys.stderr)
        return 1

    import finlogic_spark.driver_queries as dq

    out["flat_s"] = median_noop(
        lambda: QUERIES["events_twap"](spark, sf_dir), runs
    )
    dq.TWAP_LAYOUTS[sf_dir] = "events_twap_layout"
    out["bucketed_s"] = median_noop(
        lambda: QUERIES["events_twap"](spark, sf_dir), runs
    )
    dq.TWAP_LAYOUTS.pop(sf_dir, None)

    # same-run DuckDB baseline on the oracle SQL
    import duckdb

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.cpu_count()}")
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    sql = ORACLES["events_twap"]
    con.sql(sql).fetchall()  # warm
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        samples.append(time.perf_counter() - t0)
    out["duckdb_s"] = round(statistics.median(samples), 2)
    out["ratio_flat"] = round(out["flat_s"] / out["duckdb_s"], 2)
    out["ratio_bucketed"] = round(out["bucketed_s"] / out["duckdb_s"], 2)

    # sanity: both paths agree (cheap at any SF: ~|type x day| rows)
    flat_rows = (
        QUERIES["events_twap"](spark, sf_dir).orderBy("event_type", "bucket_start").collect()
    )
    buck_rows = bucketed_twap(spark).orderBy("event_type", "bucket_start").collect()
    out["results_match"] = [r.asDict() for r in flat_rows] == [
        r.asDict() for r in buck_rows
    ]

    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
    return 0 if out["results_match"] else 1


if __name__ == "__main__":
    sys.exit(main())
