"""Round-10 scale probes (VERDICT r9 items 1 & 6): publish sf10 —
and, for the events/orders-table ones, sf100 — measurements for the
six round-9 operators. Four of them (events_trend_slope, events_ewma,
orders_pareto_frontier, doc_source_divergence) were marked weak purely
for lack of a published number above sf0.1, where 30–90 ms DuckDB
baselines made their job-floor ratios meaningless; doc_dup_spans gets
its md5-cost measurement (item 6) and doc_containment_prefix is the
corpus-scale containment path.

Methodology matches bench.py: Spark side warms once (codegen) then
takes the median of N noop-sink runs; the DuckDB side runs the exact
oracle SQL with the same warm+median discipline under an interrupt
ceiling (a killed baseline records its ceiling as a LOWER bound, so
the Spark/DuckDB ratio printed for it is an UPPER bound).

Usage: python tools/probe_r10.py [--json out.json] [--runs N]
       [--timeout S] [sf10_dir] [sf100_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF10_QUERIES = [
    "events_trend_slope",
    "events_ewma",
    "orders_pareto_frontier",
    "doc_source_divergence",
    "doc_dup_spans",
    "doc_containment_prefix",
    "doc_jaccard_prefix",
]
SF100_QUERIES = [
    "events_trend_slope",
    "events_ewma",
    "orders_pareto_frontier",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _drop_persisted(spark) -> None:
    """Unpersist every cached/localCheckpointed RDD left behind by the
    previous query: without this, a shared probe JVM accumulates the
    doc operators' MEMORY_AND_DISK checkpoints and later queries
    measure GC pressure, not their own plan (observed: 27 s for the
    sf100 trend query clean vs 80 s polluted)."""
    spark.catalog.clearCache()
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        try:
            rdd.unpersist(True)
        except Exception:
            pass


def spark_time(spark, name: str, sf_dir: str, runs: int) -> dict:
    from finlogic_spark import driver_queries as dq

    dq.QUERIES[name](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()  # warmup: codegen + page cache
    samples = []
    for _ in range(runs):
        _drop_persisted(spark)
        t0 = time.perf_counter()
        dq.QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        samples.append(time.perf_counter() - t0)
    _drop_persisted(spark)
    return {"spark_s": round(statistics.median(samples), 2)}


def duckdb_time(name: str, sf_dir: str, runs: int, timeout: float) -> dict:
    import duckdb

    from finlogic_spark import driver_queries as dq

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.cpu_count()}")
    # fail fast instead of filling the disk: an oracle that needs more
    # spill than this is a DNF finding, not a hang (the pagerank
    # unrolled-CTE at sf10 spilled >70 GB before this cap existed)
    con.execute("SET max_temp_directory_size='30GiB'")
    for t in TABLES:
        # probe sf dirs are built per-table-subset (make_sf1.py 4th
        # arg); only register what exists — a probe only reads its own
        # query's tables
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sql = dq.ORACLES[name]

    def timed_run() -> float | None:
        timer = threading.Timer(timeout, con.interrupt)
        start = time.perf_counter()
        try:
            timer.start()
            con.sql(sql).fetchall()
            return time.perf_counter() - start
        except duckdb.InterruptException:
            return None
        except duckdb.Error:
            if time.perf_counter() - start >= timeout * 0.95:
                return None
            raise
        finally:
            timer.cancel()

    first = timed_run()
    if first is None:
        return {"duckdb_s": None, "duckdb_floor_s": timeout}
    if first > 60:
        # minutes-long baseline: one measurement is the honest budget
        # (the jitter median-of-N exists for is ms-scale floors)
        return {"duckdb_s": round(first, 2)}
    samples = [s for s in (timed_run() for _ in range(runs)) if s is not None]
    return {"duckdb_s": round(statistics.median(samples) if samples else first, 2)}


def main() -> int:
    argv = sys.argv[1:]
    json_out, runs, timeout = None, 3, 600.0
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if "--timeout" in argv:
        i = argv.index("--timeout")
        timeout = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    skip_baseline: set = set()
    if "--skip-baseline" in argv:
        # For baselines that are unrunnable rather than slow: the
        # uncapped all-pairs containment/jaccard SQL at sf10 was
        # kernel-OOM-killed at 103 GB RSS after ~70 min (5.9e9-row
        # hash-join intermediate) — con.interrupt() never fires
        # because the query dies of memory before any checkpoint.
        i = argv.index("--skip-baseline")
        skip_baseline = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    sf10_override = sf100_override = None
    if "--sf10" in argv:
        i = argv.index("--sf10")
        sf10_override = [q for q in argv[i + 1].split(",") if q]
        argv = argv[:i] + argv[i + 2:]
    if "--sf100" in argv:
        i = argv.index("--sf100")
        sf100_override = [q for q in argv[i + 1].split(",") if q]
        argv = argv[:i] + argv[i + 2:]
    sf10 = argv[0] if argv else "/root/repo/testdata/sf10"
    sf100 = argv[1] if len(argv) > 1 else "/root/repo/testdata/sf100"

    from finlogic_spark.session import get_spark

    spark = get_spark("probe-r10")
    out: dict = {"runs": runs, "timeout_s": timeout, "probes": {}}
    # "--sf10 none" / "--sf100 none" skips that scale entirely
    plan = [
        (sf10, "sf10", sf10_override or SF10_QUERIES, runs),
        (sf100, "sf100", sf100_override or SF100_QUERIES, 1),
    ]
    plan = [p for p in plan if p[2] != ["none"]]
    for sf_dir, label, names, n_runs in plan:
        for name in names:
            key = f"{label}:{name}"
            try:
                row = spark_time(spark, name, sf_dir, n_runs)
            except Exception as e:  # record, keep probing
                out["probes"][key] = {"err": str(e)[:300]}
                print(key, out["probes"][key], flush=True)
                continue
            if name in skip_baseline:
                row["duckdb_s"] = None
                row["baseline_note"] = (
                    "DNF: oracle SQL kernel-OOM-killed at 103 GB RSS "
                    "after ~70 min (uncapped all-pairs join)"
                )
                out["probes"][key] = row
                print(key, row, flush=True)
                continue
            row.update(duckdb_time(name, sf_dir, n_runs, timeout))
            if row.get("duckdb_s"):
                row["ratio"] = round(row["spark_s"] / row["duckdb_s"], 2)
            elif row.get("duckdb_floor_s"):
                # baseline killed at ceiling: ratio is an upper bound
                row["ratio_upper_bound"] = round(
                    row["spark_s"] / row["duckdb_floor_s"], 2
                )
            out["probes"][key] = row
            print(key, row, flush=True)
    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
