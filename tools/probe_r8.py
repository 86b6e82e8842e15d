"""Round-8 sf100 probes (VERDICT r7 items 4 & 5).

Item 4 — doc_canonical_select's closure, CLEAN, algorithm showdown:
the r7 sf100 number (810 s) was measured under concurrent load with
the default auto (label-first) path. Here the LSH candidate pairs are
materialized ONCE to parquet, then connected_components runs on the
identical edge set under algorithm='auto' and algorithm='star',
single-run wall time + executed round counts — the measurement that
decides which order 'auto' should try at this shape.

Item 5 — sliding-distinct HLL tier at sf100: the sketch tier is the
claimed 100 TB path (state per bucket is 2^lgk registers, independent
of key cardinality) but BENCH_sf100.json only carried the exact tier
(45.6 s). Measure the sketch tier's sf100 wall time, and its error vs
the exact tier at sf10 (where running both is cheap).

Usage: python tools/probe_r8.py [sf100_dir] [sf10_dir] [--json out.json]
       python tools/probe_r8.py ... [cc|sliding]   (run a subset)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def probe_cc(spark, sf_dir: str) -> dict:
    from finlogic_spark.driver_queries import _t
    from finlogic_spark.operators.graph import connected_components
    from finlogic_spark.operators.text_dedup import minhash_lsh_pairs

    d = _t(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="fls_probe_pairs_")
    pairs_path = os.path.join(tmp, "pairs")
    t0 = time.perf_counter()
    minhash_lsh_pairs(d, "text", "doc_id", k=3, num_hashes=6, bands=2) \
        .write.mode("overwrite").parquet(pairs_path)
    build_s = round(time.perf_counter() - t0, 1)
    pairs = spark.read.parquet(pairs_path)
    n_edges = pairs.count()
    vertices = d.select("doc_id")

    out = {"lsh_pairs_build_s": build_s, "n_edges": n_edges, "runs": {}}
    for algo in ("auto", "star"):
        stats: dict = {}
        t0 = time.perf_counter()
        labels = connected_components(
            pairs, vertices, src="id_a", dst="id_b", id_col="doc_id",
            algorithm=algo, stats=stats,
        )
        n_clusters = labels.select("label").distinct().count()
        wall = round(time.perf_counter() - t0, 1)
        out["runs"][algo] = {
            "wall_s": wall,
            "n_clusters": n_clusters,
            "label_rounds": stats.get("label_rounds"),
            "star_rounds": stats.get("star_rounds"),
            "converged": stats.get("converged"),
        }
        print(f"cc[{algo}]: {wall}s, {n_clusters} clusters, {stats}",
              flush=True)
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def probe_sliding(spark, sf100_dir: str, sf10_dir: str) -> dict:
    from finlogic_spark.driver_queries import _events
    from finlogic_spark.operators.sliding import (
        sliding_distinct_exact,
        sliding_distinct_sketch,
    )

    out: dict = {}
    # sf100 sketch tier: the headline 100 TB-path number.
    e100 = _events(spark, sf100_dir)
    t0 = time.perf_counter()
    n = sliding_distinct_sketch(e100, "ts", "user_id", width=3).count()
    out["sf100_sketch"] = {
        "wall_s": round(time.perf_counter() - t0, 1), "rows": n,
    }
    print(f"sliding sketch sf100: {out['sf100_sketch']}", flush=True)
    # sf100 exact tier re-run in the same session for a like-for-like
    # ratio (BENCH_sf100.json's 45.6 s was a different session/day).
    t0 = time.perf_counter()
    n = sliding_distinct_exact(e100, "ts", "user_id", width=3).count()
    out["sf100_exact"] = {
        "wall_s": round(time.perf_counter() - t0, 1), "rows": n,
    }
    print(f"sliding exact sf100: {out['sf100_exact']}", flush=True)

    # sf10 error measurement: sketch vs exact per bucket.
    e10 = _events(spark, sf10_dir)
    exact = sliding_distinct_exact(e10, "ts", "user_id", width=3) \
        .withColumnRenamed("u_trailing", "u_exact")
    sketch = sliding_distinct_sketch(e10, "ts", "user_id", width=3) \
        .withColumnRenamed("u_trailing", "u_approx")
    err = (
        exact.join(sketch, "bucket_ts")
        .select(
            (F.abs(F.col("u_approx") - F.col("u_exact"))
             / F.col("u_exact")).alias("rel_err")
        )
        .agg(F.max("rel_err").alias("max"), F.avg("rel_err").alias("mean"))
        .first()
    )
    out["sf10_error_vs_exact"] = {
        "max_rel_err": round(float(err["max"]), 4),
        "mean_rel_err": round(float(err["mean"]), 4),
    }
    print(f"sliding sf10 error: {out['sf10_error_vs_exact']}", flush=True)
    return out


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    subsets = {a for a in argv if a in ("cc", "sliding")}
    argv = [a for a in argv if a not in subsets]
    sf100 = argv[0] if argv else "/root/repo/testdata/sf100"
    sf10 = argv[1] if len(argv) > 1 else "/root/repo/testdata/sf10"

    from finlogic_spark.session import get_spark

    spark = get_spark("probe-r8")
    out = {"sf100_dir": sf100, "sf10_dir": sf10}
    if not subsets or "cc" in subsets:
        out["canonical_closure"] = probe_cc(spark, sf100)
    if not subsets or "sliding" in subsets:
        out["sliding_distinct"] = probe_sliding(spark, sf100, sf10)
    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
