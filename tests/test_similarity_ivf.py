"""IVF similarity tier tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from finlogic_spark.operators.similarity import cosine_topk, ivf_topk


def _vectors(spark, n=60, dim=8):
    rows = [(i, [math.sin(i * 0.7 + j) for j in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_ivf_self_match_and_recall(spark):
    corpus = _vectors(spark)
    centroids = corpus.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    approx = ivf_topk(corpus, queries, centroids, k=3, n_probe=3)
    rows = approx.collect()
    top1 = {r["query_id"]: r["vec_id"] for r in rows if r["rk"] == 1}
    # A query vector shares its own cell → always finds itself.
    assert top1 == {i: i for i in range(5)}
    exact = {
        (r["query_id"], r["vec_id"]) for r in cosine_topk(corpus, queries, 3).collect()
    }
    got = {(r["query_id"], r["vec_id"]) for r in rows}
    assert len(exact & got) / len(exact) >= 0.5


def test_ivf_probe_widening_monotone(spark):
    corpus = _vectors(spark)
    centroids = corpus.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["vec_id"]) for r in cosine_topk(corpus, queries, 3).collect()
    }

    def recall(n_probe):
        got = {
            (r["query_id"], r["vec_id"])
            for r in ivf_topk(corpus, queries, centroids, k=3, n_probe=n_probe).collect()
        }
        return len(exact & got) / len(exact)

    # Probing every cell IS brute force → recall 1; more probes ≥ fewer.
    r1, r_all = recall(1), recall(6)
    assert r_all == 1.0
    assert r_all >= r1


def test_cosine_neardup_finds_duplicates(spark):
    from finlogic_spark.operators.similarity import cosine_neardup_pairs

    base = _vectors(spark, n=20)
    # Clone vectors 3 and 7 with tiny perturbations: near-dups by design.
    dup = base.filter(F.col("vec_id").isin(3, 7)).select(
        (F.col("vec_id") + 100).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.0001).alias("embedding"),
    )
    df = base.unionByName(dup)
    pairs = cosine_neardup_pairs(df, threshold=0.999, dim=8, num_planes=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # Scaled clones have cosine 1.0 and identical hyperplane signs, so
    # LSH bucketing can never separate them.
    assert (3, 103) in got and (7, 107) in got
    for a, b in got:
        assert b - a == 100 or abs(a - b) < 100  # no absurd pairs

    # Orientation + threshold invariants
    rows = pairs.collect()
    assert all(r["id_a"] < r["id_b"] for r in rows)
    assert all(r["cos_sim"] >= 0.999 for r in rows)
