"""Distributed Lloyd's k-means over an embedding column (engine-scope
addition): trains the centroid table that ``similarity.ivf_topk``
partitions by, turning IVF from seed-vector cells into data-adaptive
cells.

Shape per iteration (the canonical distributed k-means layout):
- assignment: broadcast the k×dim centroid table against the corpus —
  embarrassingly parallel, no shuffle;
- update: one partial-aggregated groupBy(cluster) computing per-dimension
  means (dim avg() columns — stays in whole-stage codegen, no UDF);
- the k×dim result is collected to the driver (centroids are driver-side
  state in every distributed k-means; k·dim ≪ data size).

Iterations are driver-side Python over lazy plans — each iteration is
one Spark job; the corpus should be cached by the caller for multi-pass
training.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from finlogic_spark.operators.similarity import dot


def sq_dist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Append a __cluster column: index of the nearest centroid
    (squared-L2, lowest index wins ties). Expression-only — the
    centroid list is folded into the plan as literals, so assignment is
    a narrow map over the corpus."""
    best_d, best_i = None, None
    for i, c in enumerate(centroids):
        lit_c = F.array(*[F.lit(float(v)) for v in c])
        d = sq_dist(F.col(vec_col), lit_c)
        if best_d is None:
            best_d, best_i = d, F.lit(0)
        else:
            closer = d < best_d
            best_i = F.when(closer, F.lit(i)).otherwise(best_i)
            best_d = F.when(closer, d).otherwise(best_d)
    return df.withColumn("__cluster", best_i)


def kmeans_fit(
    df: DataFrame,
    k: int,
    dim: int,
    max_iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tol: float = 1e-6,
) -> list[list[float]]:
    """Train k centroids; returns them as plain lists (driver-side by
    design — feed them to ``assign_clusters`` or build a (cid, cv)
    DataFrame for ``similarity.ivf_topk``). Initialization is the k
    lowest-id vectors (deterministic, no RNG state)."""
    init = (
        df.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    centroids = [list(map(float, r[vec_col])) for r in init]
    for _ in range(max_iters):
        assigned = assign_clusters(df, centroids, vec_col)
        new_rows = (
            assigned.groupBy("__cluster")
            .agg(
                *[
                    F.avg(F.element_at(F.col(vec_col), i + 1)).alias(f"c{i}")
                    for i in range(dim)
                ]
            )
            .collect()
        )
        new_centroids = list(centroids)  # empty clusters keep their seat
        shift = 0.0
        for r in new_rows:
            c = [float(r[f"c{i}"]) for i in range(dim)]
            old = centroids[r["__cluster"]]
            shift = max(shift, sum((x - y) ** 2 for x, y in zip(c, old)))
            new_centroids[r["__cluster"]] = c
        centroids = new_centroids
        if shift < tol:
            break
    return centroids


def centroids_df(
    spark, centroids: list[list[float]], id_name: str = "cid", vec_name: str = "cv"
) -> DataFrame:
    """Package trained centroids as the (cid, cv) table ivf_topk takes."""
    rows = [(i, c) for i, c in enumerate(centroids)]
    return spark.createDataFrame(rows, f"{id_name} int, {vec_name} array<double>")
