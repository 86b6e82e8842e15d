"""Recall-vs-cost frontier for the hyperplane-LSH ANN tier.

The shipped default (8 planes x 8 tables x Hamming-1 probes) measured
recall@5 = 0.80 at sf0.1 — a floor, not a target. This sweeps
{planes} x {tables} x {probe radius} on one corpus and reports, per
config:

- recall@5 against exact cosine over the registry's query set;
- scanned fraction: distinct (query, candidate) pairs actually scored
  divided by |queries| x |corpus| — the real cost driver at 100 TB
  (every candidate costs one dot product + its share of the bucket
  read);
- predicted scan fraction (num_tables * n_probes / 2^planes) next to
  the measured one, so the uniform-corpus model can be sanity-checked;
- serve wall time from a persisted index (build excluded — the
  production shape builds once).

Usage: python tools/lsh_frontier.py [sf_dir] [--json out.json]
Defaults to testdata/sf1 (50k vectors — big enough that bucket
collisions behave like a real corpus, small enough to sweep).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

PLANES = [6, 8, 10, 12]
TABLES = [4, 8, 16]
RADII = [0, 1, 2]
K = 5


def n_probes(planes: int, radius: int) -> int:
    return sum(math.comb(planes, r) for r in range(radius + 1))


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/repo/testdata/sf1"

    from finlogic_spark.operators.similarity import (
        cosine,
        cosine_topk,
        lsh_cosine_topk,
        lsh_index_multi,
    )
    from finlogic_spark.session import get_spark

    spark = get_spark("lsh-frontier")
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    corpus = e.select("vec_id", as_double.alias("embedding")).repartition(
        spark.sparkContext.defaultParallelism
    ).persist()
    n_corpus = corpus.count()
    queries = corpus.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    ).persist()
    n_q = queries.count()
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(corpus, queries, k=K).collect()
    }

    rows = []
    for planes in PLANES:
        for tables in TABLES:
            idx = lsh_index_multi(
                corpus, "embedding", 64, planes, tables
            ).persist()
            idx.count()
            for radius in RADII:
                probes = n_probes(planes, radius)
                pred = min(1.0, tables * probes / 2 ** planes)
                # measured scan: distinct scored candidate pairs
                from finlogic_spark.operators.similarity import probe_masks

                # reuse the serve path for timing; candidates measured
                # via the same join without top-k
                t0 = time.perf_counter()
                approx = {
                    (r["query_id"], r["vec_id"])
                    for r in lsh_cosine_topk(
                        idx, queries, k=K, dim=64, num_planes=planes,
                        num_tables=tables, probe_radius=radius,
                        corpus_bucketed=True,
                    ).collect()
                }
                serve_s = round(time.perf_counter() - t0, 2)
                # candidate count: same (tbl, bucket) equi-join, count
                # distinct (query, candidate)
                from finlogic_spark.operators.similarity import (
                    lsh_assign_buckets,
                )

                q_parts = [
                    lsh_assign_buckets(
                        queries, "query_vec", 64, planes, table=t
                    ).withColumn("__tbl", F.lit(t))
                    for t in range(tables)
                ]
                q = q_parts[0]
                for p in q_parts[1:]:
                    q = q.unionByName(p)
                masks = probe_masks(planes, radius)
                q = q.withColumn(
                    "__mask", F.explode(F.array(*[F.lit(m) for m in masks]))
                ).withColumn(
                    "__bucket", F.col("__bucket").bitwiseXOR(F.col("__mask"))
                )
                n_cand = (
                    idx.join(F.broadcast(q), ["__tbl", "__bucket"])
                    .select("query_id", "vec_id")
                    .distinct()
                    .count()
                )
                recall = round(len(exact & approx) / len(exact), 4)
                row = {
                    "planes": planes,
                    "tables": tables,
                    "radius": radius,
                    "recall_at_5": recall,
                    "scan_frac": round(n_cand / (n_q * n_corpus), 4),
                    "scan_frac_pred": round(pred, 4),
                    "serve_s": serve_s,
                }
                rows.append(row)
                print(json.dumps(row))
            idx.unpersist()
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "n_corpus": n_corpus, "k": K,
                 "configs": rows},
                f, indent=1,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
