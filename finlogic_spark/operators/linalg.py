"""Distributed dense-vector statistics: the covariance matrix of an
embedding column (engine-scope addition — the preprocessing step for
PCA whitening, OPQ rotation before product quantization, and drift
detection between embedding snapshots).

Shape at 100 TB: covariance is a sum of per-row outer products — a
perfectly partial-aggregatable computation. Here each row explodes to
its d² (i, j, x_i·x_j) cells and one groupBy((i, j)) sums them: the
shuffle carries at most d² rows PER PARTITION (map-side combine over
4096 keys for d=64), so network cost is O(partitions·d²), independent
of row count. The explode costs d² expression evaluations per row —
inherent to covariance (it IS n·d² multiplies); a mapInPandas/numpy
variant would cut the constant factor but leave codegen, and the
expression form keeps the whole plan JVM-side.

Determinism: each product is quantized to integer micro-units
(floor(x·y·1e6 + 0.5)) BEFORE aggregation — integer sums commute
across any partitioning, so Spark and a serial engine produce the
same covariance to the quantization precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def covariance_matrix(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Sample-free covariance of a fixed-``dim`` vector column:
    (i, j, cov) for all d² cells, cov = E[x_i·x_j] − E[x_i]·E[x_j]
    (population normalization, divide by n). i/j are 0-based.

    Vectors are cast float→double before multiplying (exact), products
    quantized to micro-units, summed as integers, and the closed-form
    combination is a fixed sequence of double ops — engine-portable.
    """
    # Enforce the fixed-dim contract: a ragged or null vector would
    # silently drop cells, making each (i, j)'s n differ and the
    # combined covariance wrong. Excluding bad rows keeps every cell's
    # n identical (the formula's requirement).
    df = df.filter(F.size(F.col(vec_col)) == dim)
    v = F.col(vec_col)
    cells = F.explode(
        F.flatten(
            F.transform(
                v,
                lambda x, i: F.transform(
                    v,
                    lambda y, j: F.struct(
                        i.alias("i"),
                        j.alias("j"),
                        F.floor(
                            x.cast("double") * y.cast("double") * F.lit(1e6)
                            + F.lit(0.5)
                        ).cast("long").alias("p"),
                    ),
                ),
            )
        )
    ).alias("c")
    sums = (
        df.select(cells)
        .select("c.*")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("sp"), F.count(F.lit(1)).alias("n"))
    )
    means = (
        df.select(F.posexplode(v).alias("i", "x"))
        .groupBy("i")
        .agg(
            F.sum(
                F.floor(F.col("x").cast("double") * F.lit(1e6) + F.lit(0.5))
                .cast("long")
            ).alias("sx")
        )
    )
    mi = means.select(F.col("i").alias("i"), F.col("sx").alias("sx_i"))
    mj = means.select(F.col("i").alias("j"), F.col("sx").alias("sx_j"))
    exy = F.col("sp").cast("double") / F.lit(1e6) / F.col("n")
    m_i = F.col("sx_i").cast("double") / F.lit(1e6) / F.col("n")
    m_j = F.col("sx_j").cast("double") / F.lit(1e6) / F.col("n")
    return (
        sums.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select("i", "j", (exy - m_i * m_j).alias("cov"))
    )


def pca_project(
    df: DataFrame,
    vec_col: str,
    dim: int,
    k: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Project MEAN-CENTERED vectors onto their top-k principal
    components: (id, proj: array<double> length k), scores zero-mean
    per component as standard PCA defines them (projecting the raw
    vectors would shift every coordinate by the constant μ·V_c —
    harmless for distances, wrong for zero-thresholding or comparing
    projections across snapshots whose corpus means differ, e.g. drift
    detection). The d×d covariance reduces on the cluster (see
    covariance_matrix — shuffle is O(partitions·d²)); only the d²
    matrix + d-vector mean are collected for the eigendecomposition
    (64×64 = 32 KB here — bounded like the k-means centroid collect,
    NOT row-scaled), and components + mean return to the executors as
    literals, so the projection is a narrow zero-shuffle map.

    Component sign is normalized (largest-|loading| coordinate made
    positive) — eigenvectors are sign-ambiguous and numpy's choice is
    not a contract.
    """
    import numpy as np

    cov_rows = covariance_matrix(df, vec_col, dim).collect()
    C = np.zeros((dim, dim))
    for r in cov_rows:
        C[r.i, r.j] = r.cov
    mean_rows = (
        df.filter(F.size(F.col(vec_col)) == dim)
        .select(F.posexplode(F.col(vec_col)).alias("i", "x"))
        .groupBy("i")
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("x").cast("double") * F.lit(1e6) + F.lit(0.5)
                    ).cast("long")
                ).cast("double")
                / F.lit(1e6)
                / F.count(F.lit(1))
            ).alias("mu")
        )
        .collect()
    )
    mu = np.zeros(dim)
    for r in mean_rows:
        mu[r.i] = r.mu
    # symmetrize: quantization leaves |C - C.T| <= 1e-6 asymmetry
    C = (C + C.T) / 2.0
    vals, vecs = np.linalg.eigh(C)  # ascending eigenvalues
    comps = vecs[:, ::-1][:, :k]  # columns = top-k components
    for c in range(k):
        j = int(np.abs(comps[:, c]).argmax())
        if comps[j, c] < 0:
            comps[:, c] = -comps[:, c]
    comp_lits = [
        F.array(*[F.lit(float(comps[i, c])) for i in range(dim)])
        for c in range(k)
    ]
    mu_lit = F.array(*[F.lit(float(mu[i])) for i in range(dim)])
    v = F.col(vec_col)
    centered = F.zip_with(v, mu_lit, lambda x, m: x.cast("double") - m)
    proj = F.array(
        *[
            F.aggregate(
                F.zip_with(centered, comp_lits[c], lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in range(k)
        ]
    )
    return df.filter(F.size(v) == dim).select(
        F.col(id_col).alias("id"), proj.alias("proj")
    )
