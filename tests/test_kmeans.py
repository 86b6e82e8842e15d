"""k-means trainer tests: convergence on separable blobs and IVF
integration (trained centroids as the cell table)."""

from __future__ import annotations

from pyspark.sql import functions as F

from finlogic_spark.operators.kmeans import assign_clusters, centroids_df, kmeans_fit
from finlogic_spark.operators.similarity import cosine_topk, ivf_topk

DIM = 4


def _blobs(spark):
    # Three tight, well-separated blobs of 10 points each.
    centers = [[0.0] * DIM, [10.0] * DIM, [-10.0, 10.0, -10.0, 10.0]]
    rows = []
    for b, c in enumerate(centers):
        for j in range(10):
            jitter = [((i * 7 + j * 13) % 5 - 2) * 0.01 for i in range(DIM)]
            rows.append((b * 10 + j, [c[i] + jitter[i] for i in range(DIM)]))
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_kmeans_recovers_blobs(spark):
    df = _blobs(spark).cache()
    cents = kmeans_fit(df, k=3, dim=DIM, max_iters=10)
    assigned = assign_clusters(df, cents)
    # All members of a blob land in the same cluster; blobs get
    # distinct clusters.
    groups = (
        assigned.groupBy((F.col("vec_id") / 10).cast("int").alias("blob"))
        .agg(F.count_distinct("__cluster").alias("nc"), F.first("__cluster").alias("c"))
        .collect()
    )
    assert all(r["nc"] == 1 for r in groups)
    assert len({r["c"] for r in groups}) == 3
    df.unpersist()


def test_kmeans_centroids_power_ivf(spark):
    df = _blobs(spark).cache()
    cents = kmeans_fit(df, k=3, dim=DIM)
    cdf = centroids_df(spark, cents)
    queries = df.filter(F.col("vec_id").isin(0, 10, 20)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    approx = ivf_topk(df, queries, cdf, k=3, n_probe=1)
    exact = cosine_topk(df, queries, k=3)
    got = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    want = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    # With k-means cells matching the blobs, 1-probe IVF is exact here.
    assert got == want
    df.unpersist()


def test_assign_methods_agree(spark):
    df = _blobs(spark)
    cents = [[0.0] * DIM, [10.0] * DIM, [-10.0, 10.0, -10.0, 10.0]]
    by_expr = {
        r["vec_id"]: r["__cluster"]
        for r in assign_clusters(df, cents, method="expr").collect()
    }
    by_pandas = {
        r["vec_id"]: r["__cluster"]
        for r in assign_clusters(df, cents, method="pandas").collect()
    }
    assert by_expr == by_pandas


def test_assign_large_k_no_plan_blowup(spark):
    """k=512, dim=32 → 16384 literals would bloat a folded-literal plan;
    auto must route to the Arrow path and assign correctly."""
    import time

    k, dim = 512, 32
    cents = [[float((c * 31 + j * 7) % 97) for j in range(dim)] for c in range(k)]
    rows = [(i, list(cents[i % k])) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    t0 = time.time()
    assigned = assign_clusters(df, cents)  # auto → pandas
    got = assigned.collect()
    assert time.time() - t0 < 30
    # Every vector IS a centroid → must be assigned to it (or an exact
    # duplicate centroid with a lower index).
    import math

    for r in got:
        want_d = min(
            sum((a - b) ** 2 for a, b in zip(r["embedding"], c)) for c in cents
        )
        d = sum((a - b) ** 2 for a, b in zip(r["embedding"], cents[r["__cluster"]]))
        assert math.isclose(d, want_d, abs_tol=1e-9)
