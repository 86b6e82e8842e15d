"""Round-12 scale probes (VERDICT r11 items 1, 2, 5, 6, 7).

The r11 weak set is five batch rows >2x vs DuckDB at sf100 with no
decomposition yet. Each gets the pareto treatment here — decompose
into (bare floor, full query) so the remainder is attributable, or
re-measure after this round's plan fix:

- join_bloom_pruned  — re-measure after a2f6af2 (auto-sized bit-set,
  localCheckpointed dim → one dim scan, O(n log n) densify).
- emb_scalar_quantize — re-measure after the Arrow/numpy report tier
  (bit-identical, pinned in test_quantize_parity.py).
- data_profile — decomposition vs the one-pass null-count floor (the
  same scan + agg shape minus the 5 COUNT(DISTINCT)s), plus an
  alternative union-of-single-distinct plan measured head-to-head
  (Expand multiplies rows x6 through the partial agg; five pruned
  single-column scans may beat it).
- events_histogram — decomposition vs a scan+groupBy floor reading
  the same two columns (the remainder is the bin expression + the
  (group, bin) key width + the 50-row sort).
- events_incremental_agg — the HONEST comparison (verdict item 2):
  fold-in of a 1% / 10% changeset into a PERSISTED snapshot vs full
  recompute of all events, both engines. The registry query rebuilds
  snapshot AND changeset from the raw table each run (so its oracle
  can be the recompute); production maintains the snapshot — this
  probe measures that maintenance path.

At-birth rows for the round-12 newcomers (nothing enters a weak set
for lack of a scale number): events_kll_rollup (sf100),
emb_lsh_append_topk (sf10 — its oracle is brute-force cosine; at
sf100 only the Spark side is probed), and events_twap riding a
write_fact_layout table registered in TWAP_LAYOUTS (verdict item 5:
the sf100 row must go through the storage API, not a tools script).

Usage: python tools/probe_r12.py [--json out.json] [--runs N]
       [--timeout S] [--which fixed|profile|histogram|incr|birth|all]
       [sf10_dir] [sf100_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from probe_r10 import _drop_persisted, duckdb_time, spark_time  # noqa: E402


def timed(fn, runs: int = 3) -> float:
    fn()  # warm: codegen + page cache
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 2)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def probe_fixed(spark, out, sf10, sf100, runs, timeout):
    """Re-measure the two rows whose plans changed this round."""
    for name in ("join_bloom_pruned", "emb_scalar_quantize"):
        for label, d in (("sf10", sf10), ("sf100", sf100)):
            row = spark_time(spark, name, d, runs)
            row.update(duckdb_time(name, d, runs, timeout))
            if row.get("duckdb_s"):
                row["ratio"] = round(row["spark_s"] / row["duckdb_s"], 2)
            out[f"{label}:{name}"] = row
            print(f"{label}:{name}", row, flush=True)


def profile_columns_union(df, cols):
    """Alternative exact plan for data_profile: one null-count pass +
    per-column single-distinct branches unioned (each branch's scan
    prunes to ONE column and its partial agg hashes 1x the rows,
    where the multi-distinct Expand hashes (len(cols)+1)x)."""
    from functools import reduce

    from pyspark.sql import functions as F

    nulls = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}")
            for c in cols
        ],
    )
    nd = reduce(
        lambda a, b: a.unionAll(b),
        [
            df.agg(F.count_distinct(F.col(c)).alias("n_distinct")).select(
                F.lit(c).alias("col_name"), "n_distinct"
            )
            for c in cols
        ],
    )
    long_nulls = nulls.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col("n_rows").cast("long").alias("n_rows"),
                        F.col(f"__nn_{c}").cast("long").alias("n_nulls"),
                        (
                            F.floor(
                                F.col(f"__nn_{c}") / F.col("n_rows") * 1e6
                                + F.lit(0.5)
                            )
                            / F.lit(1e6)
                        ).alias("frac_null"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.*")
    return long_nulls.join(nd, "col_name").select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "frac_null"
    )


def probe_profile(spark, out, sf100, runs, timeout):
    """data_profile decomposition at sf100: floor = the same scan +
    one-pass agg WITHOUT the distinct counts; expand = the shipped
    plan; union = the alternative. Adjudication: full - floor is the
    exact-COUNT(DISTINCT) cost, inherent to the contract."""
    from pyspark.sql import functions as F

    from finlogic_spark import driver_queries as dq
    from finlogic_spark.operators.profile import profile_columns

    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    c = spark.read.parquet(f"{sf100}/customer.parquet")

    def floor_nulls():
        noop(
            c.agg(
                F.count(F.lit(1)).alias("n_rows"),
                *[
                    F.sum(F.when(F.col(x).isNull(), 1).otherwise(0)).alias(
                        f"__nn_{x}"
                    )
                    for x in cols
                ],
            )
        )

    row = {
        "floor_nulls_only_s": timed(floor_nulls, runs),
        "full_expand_s": timed(
            lambda: noop(profile_columns(c, cols).orderBy("col_name")), runs
        ),
        "full_union_s": timed(
            lambda: noop(profile_columns_union(c, cols).orderBy("col_name")),
            runs,
        ),
    }
    row.update(duckdb_time("data_profile", sf100, runs, timeout))
    best = min(row["full_expand_s"], row["full_union_s"])
    if row.get("duckdb_s"):
        row["ratio_best"] = round(best / row["duckdb_s"], 2)
    row["distinct_cost_s"] = round(best - row["floor_nulls_only_s"], 2)
    row["note"] = (
        "floor is the identical scan+agg minus the 5 COUNT(DISTINCT)s; "
        "distinct_cost_s is what the exact-distinct contract itself "
        "costs on this engine"
    )
    out["sf100:data_profile_decomposition"] = row
    print("sf100:data_profile_decomposition", row, flush=True)


def probe_histogram(spark, out, sf100, runs, timeout):
    """events_histogram decomposition at sf100: floor = scan of the
    same 2 columns + a per-event_type agg (no bin math, no (group,
    bin) keys, no sort)."""
    from pyspark.sql import functions as F

    from finlogic_spark import driver_queries as dq

    e = spark.read.parquet(f"{sf100}/events.parquet")

    def floor_scan_agg():
        noop(
            e.select("event_type", "value")
            .groupBy("event_type")
            .agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("n"))
        )

    row = {
        "floor_scan_agg_s": timed(floor_scan_agg, runs),
        "full_s": spark_time(spark, "events_histogram", sf100, runs)[
            "spark_s"
        ],
    }
    row.update(duckdb_time("events_histogram", sf100, runs, timeout))
    if row.get("duckdb_s"):
        row["ratio"] = round(row["full_s"] / row["duckdb_s"], 2)
    row["bin_overhead_s"] = round(row["full_s"] - row["floor_scan_agg_s"], 2)
    row["note"] = (
        "floor reads the same (event_type, value) columns through one "
        "map-combining agg; bin_overhead_s covers the bin expression, "
        "the wider (group, bin) grouping key, and the 50-row sort"
    )
    out["sf100:events_histogram_decomposition"] = row
    print("sf100:events_histogram_decomposition", row, flush=True)


def probe_incremental(spark, out, sf100, runs, timeout):
    """Fold-in vs recompute at realistic changeset ratios (1%, 10%).

    Setup mirrors production: the snapshot is PERSISTED parquet (built
    once from the base partition), the changeset arrives as its own
    parquet. Measured: (a) Spark fold-in = read snapshot + aggregate
    changeset + full-outer merge; (b) Spark full recompute over all
    events; (c) DuckDB full recompute (the oracle SQL). The fold-in's
    work is O(|changeset| + |snapshot|), independent of the base
    table — the number that matters at 100 TB."""
    import duckdb
    from pyspark.sql import functions as F

    from finlogic_spark.operators.incremental import (
        aggregate_cents,
        incremental_apply,
    )

    e = spark.read.parquet(f"{sf100}/events.parquet")
    scratch = "/tmp/probe_r12_incr"
    shutil.rmtree(scratch, ignore_errors=True)

    def spark_recompute():
        noop(aggregate_cents(e, ["user_id"], ["value"], count_col="n_rows"))

    recompute_s = timed(spark_recompute, runs)

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.cpu_count()}")
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{sf100}/events.parquet'"
    )
    d0 = time.perf_counter()
    con.sql(
        """SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows,
                  CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                       AS BIGINT) AS value_cents
           FROM events GROUP BY user_id ORDER BY user_id"""
    ).fetchall()
    duck_recompute_s = round(time.perf_counter() - d0, 2)

    for pct in (1, 10):
        base = e.filter(F.col("event_id") % 100 >= pct)
        delta = e.filter(F.col("event_id") % 100 < pct)
        snap_path = f"{scratch}/snap_{pct}"
        delta_path = f"{scratch}/delta_{pct}"
        aggregate_cents(base, ["user_id"], ["value"], count_col="n_rows").write.mode(
            "overwrite"
        ).parquet(snap_path)
        delta.write.mode("overwrite").parquet(delta_path)

        def fold_in():
            snap = spark.read.parquet(snap_path)
            d = spark.read.parquet(delta_path)
            noop(
                incremental_apply(
                    snap, d, ["user_id"], ["value"], count_col="n_rows"
                )
            )

        row = {
            "changeset_pct": pct,
            "fold_in_s": timed(fold_in, runs),
            "spark_recompute_s": recompute_s,
            "duckdb_recompute_s": duck_recompute_s,
        }
        row["speedup_vs_spark_recompute"] = round(
            recompute_s / row["fold_in_s"], 2
        )
        row["ratio_vs_duckdb_recompute"] = round(
            row["fold_in_s"] / duck_recompute_s, 2
        )
        out[f"sf100:events_incremental_agg_{pct}pct"] = row
        print(f"sf100:events_incremental_agg_{pct}pct", row, flush=True)
    shutil.rmtree(scratch, ignore_errors=True)


def probe_bloom(spark, out, sf100, runs, timeout):
    """join_bloom_pruned adjudication at sf100.

    The registry query's dim (selective customer filter) is
    BROADCAST-SIZED, so Spark's plain broadcast-hash join already drops
    non-matching fact rows inside the scan stage — in that regime the
    bloom filter is pure added work, and the row measures Spark's
    scan+join floor plus that overhead, not a plan defect. Decompose:

    - plain_broadcast_s — the oracle's join shape in Spark, no bloom
      (floor: same scan, broadcast join, same agg)
    - full_s — the registry query (bloom build + probe + exact join)
    - the SHUFFLE regime the operator exists for: broadcast disabled
      (both planner and AQE thresholds), plain shuffle join vs
      bloom-pruned shuffle join — the bloom drops ~98% of fact rows
      before the exchange, which is the 100 TB story (a dim over the
      broadcast threshold still prunes the fact scan).
    """
    from pyspark.sql import functions as F

    from finlogic_spark import driver_queries as dq
    from finlogic_spark.operators.bloomjoin import bloom_pruned_join

    def dim():
        return (
            spark.read.parquet(f"{sf100}/customer.parquet")
            .filter(
                (F.col("c_mktsegment") == "MACHINERY")
                & (F.col("c_acctbal") > 9000.0)
            )
            .select("c_custkey", "c_nationkey")
        )

    def orders():
        return spark.read.parquet(f"{sf100}/orders.parquet").select(
            "o_custkey", "o_totalprice"
        )

    def agg(joined):
        return (
            joined.groupBy("c_nationkey")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                dq.dsum(F.col("o_totalprice"), "total_price"),
            )
            .orderBy("c_nationkey")
        )

    def plain():
        noop(
            agg(
                orders().join(
                    F.broadcast(dim()),
                    F.col("o_custkey") == F.col("c_custkey"),
                )
            )
        )

    row = {
        "plain_broadcast_s": timed(plain, runs),
        "full_s": spark_time(spark, "join_bloom_pruned", sf100, runs)[
            "spark_s"
        ],
    }
    row.update(duckdb_time("join_bloom_pruned", sf100, runs, timeout))
    row["bloom_overhead_s"] = round(row["full_s"] - row["plain_broadcast_s"], 2)
    if row.get("duckdb_s"):
        row["ratio_plain"] = round(
            row["plain_broadcast_s"] / row["duckdb_s"], 2
        )

    # shuffle regime: what the filter exists for
    no_bc = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in no_bc}
    for k, v in no_bc.items():
        spark.conf.set(k, v)
    try:
        def shuffle_plain():
            noop(
                agg(
                    orders().join(
                        dim(), F.col("o_custkey") == F.col("c_custkey")
                    )
                )
            )

        def shuffle_bloom():
            noop(
                agg(
                    bloom_pruned_join(
                        orders(), dim(), "o_custkey", "c_custkey"
                    )
                )
            )

        row["shuffle_plain_s"] = timed(shuffle_plain, runs)
        row["shuffle_bloom_s"] = timed(shuffle_bloom, runs)
        row["bloom_speedup_in_shuffle_regime"] = round(
            row["shuffle_plain_s"] / row["shuffle_bloom_s"], 2
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    row["note"] = (
        "registry dim is broadcast-sized, so the plain broadcast join "
        "already prunes in the scan stage and the bloom is overhead "
        "there; the shuffle rows show the regime the operator is for"
    )
    out["sf100:join_bloom_pruned_decomposition"] = row
    print("sf100:join_bloom_pruned_decomposition", row, flush=True)


def probe_birth(spark, out, sf10, sf100, runs, timeout):
    """At-birth scale rows for the round-12 registry newcomers."""
    # KLL rollup: sketch-table build + 30-day merge, rank-band oracle
    row = spark_time(spark, "events_kll_rollup", sf100, runs)
    row.update(duckdb_time("events_kll_rollup", sf100, runs, timeout))
    if row.get("duckdb_s"):
        row["ratio"] = round(row["spark_s"] / row["duckdb_s"], 2)
    out["sf100:events_kll_rollup"] = row
    print("sf100:events_kll_rollup", row, flush=True)

    # LSH append-serve: oracle is brute-force cosine — feasible at
    # sf10; at sf100 Spark-side only (the baseline's all-pairs scan is
    # the thing the index exists to avoid)
    row = spark_time(spark, "emb_lsh_append_topk", sf10, runs)
    row.update(duckdb_time("emb_lsh_append_topk", sf10, runs, timeout))
    if row.get("duckdb_s"):
        row["ratio"] = round(row["spark_s"] / row["duckdb_s"], 2)
    out["sf10:emb_lsh_append_topk"] = row
    print("sf10:emb_lsh_append_topk", row, flush=True)
    row = spark_time(spark, "emb_lsh_append_topk", sf100, runs)
    out["sf100:emb_lsh_append_topk"] = row
    print("sf100:emb_lsh_append_topk", row, flush=True)


def probe_rollup(spark, out, sf100, runs, timeout):
    """events_kll_rollup decomposition at sf100. The registry query
    deliberately packages THREE things the baseline's one-shot exact
    percentile does not: (a) building the persistable per-(day, type)
    sketch table, (b) the 30-day merge, (c) the exact-band validation
    (itself ~the whole batch-twin query). Decompose so the ~2x row is
    attributable — and measure the SERVING path the artifact exists
    for: percentiles of a window from an already-persisted daily
    table, zero raw rows re-read. At 100 TB the build amortizes
    (1/30th per day, incremental); every window query pays only the
    merge."""
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from finlogic_spark.operators.sketch import (
        kll_sketch_table,
        kll_table_quantiles,
    )

    e = spark.read.parquet(f"{sf100}/events.parquet")
    v = F.col("value")
    base = e.filter(v.isNotNull() & ~F.isnan(v)).select(
        F.to_date("ts").alias("day"), "event_type", "value"
    )

    def h_day():
        return base.groupBy("day", "event_type", "value").agg(
            F.count(F.lit(1)).alias("__c")
        )

    def build_daily():
        noop(kll_sketch_table(h_day(), ["day", "event_type"], "value",
                              weight_col="__c"))

    def validation_only():
        # the band report fed by exact values — the part of the query
        # that REPEATS the baseline's work for validation
        hist = h_day().groupBy("event_type", "value").agg(
            F.sum("__c").alias("__c")
        )
        noop(hist.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")))

    daily_path = tempfile.mkdtemp(prefix="kllrollup_") + "/daily"
    kll_sketch_table(
        h_day(), ["day", "event_type"], "value", weight_col="__c"
    ).write.mode("overwrite").parquet(daily_path)

    def serve_window():
        stored = spark.read.parquet(daily_path)
        noop(
            kll_table_quantiles(
                stored.drop("day"), ["event_type"], [0.5, 0.99]
            )
        )

    row = {
        "sketch_build_s": timed(build_daily, runs),
        "validation_histogram_s": timed(validation_only, runs),
        "serve_window_from_stored_s": timed(serve_window, runs),
        "full_s": spark_time(spark, "events_kll_rollup", sf100, runs)[
            "spark_s"
        ],
    }
    row.update(duckdb_time("events_kll_rollup", sf100, runs, timeout))
    if row.get("duckdb_s"):
        row["ratio_full"] = round(row["full_s"] / row["duckdb_s"], 2)
        row["ratio_serve"] = round(
            row["serve_window_from_stored_s"] / row["duckdb_s"], 2
        )
    row["note"] = (
        "full = daily-sketch-table build + merge + exact-band "
        "validation; the baseline computes the percentile once and "
        "persists nothing. serve_window_from_stored_s is the path the "
        "artifact exists for - any window's percentiles from stored "
        "sketch rows, zero raw rows re-read"
    )
    out["sf100:events_kll_rollup_decomposition"] = row
    print("sf100:events_kll_rollup_decomposition", row, flush=True)


def probe_twap_layout(spark, out, sf100, runs, timeout):
    """events_twap riding the first-class storage API at sf100: build
    the layout through sources.write_fact_layout (one-time, timed),
    register it in TWAP_LAYOUTS, and measure the REGISTRY query —
    the r11 verdict's item 5 asks for the sf100 row on the API path."""
    from finlogic_spark import driver_queries as dq
    from finlogic_spark.sources import write_fact_layout

    e = spark.read.parquet(f"{sf100}/events.parquet")
    t0 = time.perf_counter()
    write_fact_layout(
        e,
        "probe_r12_events_layout",
        keys=["event_type"],
        time_col="ts",
        num_buckets=128,
        grain="day",
        tiebreak_cols=["event_id"],
    )
    build_s = round(time.perf_counter() - t0, 2)
    dq.TWAP_LAYOUTS[sf100] = "probe_r12_events_layout"
    try:
        row = spark_time(spark, "events_twap", sf100, runs)
        row["layout_build_s"] = build_s
        row.update(duckdb_time("events_twap", sf100, runs, timeout))
        if row.get("duckdb_s"):
            row["ratio"] = round(row["spark_s"] / row["duckdb_s"], 2)
        row["note"] = (
            "registry query on a write_fact_layout table registered in "
            "TWAP_LAYOUTS — the API path, zero data-sized exchanges/"
            "sorts (plan pinned in test_storage.py); build cost "
            "amortizes across every downstream plan keyed the same way"
        )
        out["sf100:events_twap_layout_api"] = row
        print("sf100:events_twap_layout_api", row, flush=True)
    finally:
        dq.TWAP_LAYOUTS.pop(sf100, None)
        spark.sql("DROP TABLE IF EXISTS probe_r12_events_layout")


def main() -> int:
    argv = sys.argv[1:]

    def opt(flag, default, cast):
        if flag in argv:
            i = argv.index(flag)
            v = cast(argv[i + 1])
            del argv[i : i + 2]
            return v
        return default

    json_out = opt("--json", None, str)
    runs = opt("--runs", 3, int)
    timeout = opt("--timeout", 600.0, float)
    which = opt("--which", "all", str)
    sf10 = argv[0] if argv else "/root/repo/testdata/sf10"
    sf100 = argv[1] if len(argv) > 1 else "/root/repo/testdata/sf100"

    from finlogic_spark.session import get_spark

    spark = get_spark("probe-r12")
    out: dict = {"runs": runs, "sf10": sf10, "sf100": sf100}
    if which in ("fixed", "all"):
        probe_fixed(spark, out, sf10, sf100, runs, timeout)
    if which in ("bloom", "all"):
        probe_bloom(spark, out, sf100, runs, timeout)
    if which in ("profile", "all"):
        probe_profile(spark, out, sf100, runs, timeout)
    if which in ("histogram", "all"):
        probe_histogram(spark, out, sf100, runs, timeout)
    if which in ("incr", "all"):
        probe_incremental(spark, out, sf100, runs, timeout)
    if which in ("birth", "all"):
        probe_birth(spark, out, sf10, sf100, runs, timeout)
    if which in ("rollup", "all"):
        probe_rollup(spark, out, sf100, runs, timeout)
    if which in ("twap", "all"):
        probe_twap_layout(spark, out, sf100, runs, timeout)
    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
