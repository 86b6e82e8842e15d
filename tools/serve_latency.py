"""Serving-latency pin for the persisted indexes (VERDICT r7 item 7).

The build-once/serve-many story (BM25 + tf-idf frequency postings,
positional phrase postings, bucketed LSH corpus) is plan-pinned in
tests/test_plan_shape.py, but plan shape alone doesn't guard the
end-to-end latency of a served query against regressions. This tool
measures, per index:

- build_s     — one-time index construction + persist
- cold_s      — first query against a FRESHLY OPENED handle (parquet
                footer listing, codegen, broadcast build: the latency a
                new serving session pays once)
- warm_s      — median of repeated queries on the open handle (the
                steady-state per-query serving latency)

Methodology: one Spark session; "cold" re-opens the index from disk
via the read_* entry points (for LSH, re-derives the bucketed frame)
after clearing the registry cache — JVM/session startup is NOT counted
(a serving deployment keeps the session alive).

Usage: python tools/serve_latency.py [sf_dir] [runs] [--json out.json]
Prints one JSON object, suitable for the README serving table.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def median_of(fn, runs):
    return round(statistics.median(timed(fn) for _ in range(runs)), 3)


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/repo/testdata/sf10"
    runs = int(argv[1]) if len(argv) > 1 else 5

    from finlogic_spark import driver_queries as dq
    from finlogic_spark.operators.search import (
        bm25_topk,
        build_positional_postings_table,
        build_postings_table,
        phrase_search,
        read_positional_postings,
        read_postings,
        tfidf_similar,
    )
    from finlogic_spark.operators.similarity import (
        lsh_cosine_topk,
        lsh_index_multi,
    )
    from finlogic_spark.session import get_spark

    spark = get_spark("serve-latency")
    docs = dq._t(spark, sf_dir, "documents")
    out = {"sf_dir": sf_dir, "runs": runs, "indexes": {}}
    scratch = tempfile.mkdtemp(prefix="fls_serve_lat_")

    # ---------------- frequency postings: BM25 + tf-idf ----------------
    path = os.path.join(scratch, "postings")
    build_s = timed(lambda: build_postings_table(docs, path))

    def bm25_on(idx):
        return lambda: bm25_topk(
            None, ["dup", "vector", "spark"], k=20, postings=idx
        ).collect()

    cold_idx = read_postings(spark, path)
    cold_s = timed(bm25_on(cold_idx))
    warm_s = median_of(bm25_on(cold_idx), runs)
    out["indexes"]["bm25_postings"] = {
        "build_s": build_s, "cold_s": cold_s, "warm_s": warm_s,
    }

    def tfidf_on(idx):
        return lambda: tfidf_similar(
            None, [0, 1, 2, 3, 4], k=5, postings=idx
        ).collect()

    cold_idx2 = read_postings(spark, path)
    out["indexes"]["tfidf_postings"] = {
        # tf-idf serves from the SAME persisted postings table as BM25
        # (one build amortizes across both); attribute the shared build
        # honestly instead of publishing a fictitious 0-cost build.
        "build_s": build_s,
        "build_shared_with": "bm25_postings",
        "cold_s": timed(tfidf_on(cold_idx2)),
        "warm_s": median_of(tfidf_on(cold_idx2), runs),
    }

    # ---------------- positional postings: phrase search ----------------
    ppath = os.path.join(scratch, "pospostings")
    build_s = timed(lambda: build_positional_postings_table(docs, ppath))

    def phrase_on(idx):
        return lambda: phrase_search(
            docs, ["table", "table"], postings=idx
        ).collect()

    pcold = read_positional_postings(spark, ppath)
    out["indexes"]["positional_postings"] = {
        "build_s": build_s,
        "cold_s": timed(phrase_on(pcold)),
        "warm_s": median_of(phrase_on(pcold), runs),
    }

    # ---------------- bucketed LSH corpus: ANN top-k ----------------
    emb = dq._emb_corpus(spark, sf_dir)
    kw = dict(dim=64, num_planes=dq._LSH_PLANES, num_tables=dq._LSH_TABLES)

    def lsh_build():
        idx = lsh_index_multi(emb, "embedding", **kw).persist()
        idx.count()
        return idx

    t0 = time.perf_counter()
    lsh_idx = lsh_build()
    build_s = round(time.perf_counter() - t0, 3)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    def lsh_q():
        lsh_cosine_topk(
            lsh_idx, queries, k=5, probe_radius=dq._LSH_RADIUS,
            corpus_bucketed=True, local_query_probes=True, **kw
        ).collect()

    out["indexes"]["lsh_corpus"] = {
        "build_s": build_s,
        "cold_s": timed(lsh_q),
        "warm_s": median_of(lsh_q, runs),
    }

    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
    import shutil

    shutil.rmtree(scratch, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
