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


def _cov_joined(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Shared plan for covariance_matrix / pca_project: the d²-row
    (i, j, cov, m_i, m_j) DataFrame. Exposing the per-coordinate means
    on every cell lets pca_project read covariance AND mean from ONE
    collect instead of running a second job over the source."""
    # Enforce the fixed-dim contract: a ragged or null vector would
    # silently drop cells, making each (i, j)'s n differ and the
    # combined covariance wrong. Excluding bad rows keeps every cell's
    # n identical (the formula's requirement).
    df = df.filter(F.size(F.col(vec_col)) == dim)
    # r16 (guide §4): the expression form exploded d² structs PER ROW
    # through codegen (n·d² = 163M struct builds at the bench shape)
    # and scanned the source TWICE (product sums + means). One Arrow
    # pass accumulates the d×d outer-product partial, the d-vector
    # mean partial and the row count per PARTITION with numpy — the
    # identical per-cell quantization floor(x·y·1e6 + 0.5) summed as
    # int64 (integer sums commute, so the totals are bit-identical;
    # the kernel is literally pca_components_numpy's, which was
    # already proven bit-identical to the expression path by the
    # emb_pca_project oracle). Shuffle stays O(partitions·d²); rows
    # crossing it are (i, j, v) partials: j = -1 carries the mean
    # lane, i = -1 the row count.
    from pyspark.sql import types as T

    part_schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("v", T.LongType()),
        ]
    )

    def _partials(batches):
        import numpy as np
        import pyarrow as pa

        sp = np.zeros((dim, dim), dtype=np.int64)
        sx = np.zeros(dim, dtype=np.int64)
        n = 0
        for b in batches:
            col = b.column(0)
            flat = col.flatten()
            X = flat.to_numpy(zero_copy_only=False).astype(
                np.float64, copy=False
            ).reshape(-1, dim)
            # ADVICE r16: zero NaN whether it came from a NULL element
            # (null_count > 0) or a literal NaN stored in the data —
            # astype(int64) on NaN is undefined (INT64_MIN) and would
            # silently corrupt every cell's sum. One isnan pass over
            # the n×d input decides; the d²-sized where() only runs
            # when bad values actually exist.
            has_bad = flat.null_count > 0 or bool(np.isnan(X).any())
            # chunked so the blk×d×d intermediate stays ~32 MB at d=64
            for lo in range(0, len(X), 1024):
                B = X[lo:lo + 1024]
                Q = np.floor(B[:, :, None] * B[:, None, :] * 1e6 + 0.5)
                if has_bad:
                    # null/NaN elements arrive as NaN; the expression
                    # form's SUM skipped the null product while COUNT
                    # still counted the row — contribute 0, keep row in n
                    Q = np.where(np.isnan(Q), 0.0, Q)
                sp += Q.astype(np.int64).sum(axis=0)
            M = np.floor(X * 1e6 + 0.5)
            if has_bad:
                M = np.where(np.isnan(M), 0.0, M)
            sx += M.astype(np.int64).sum(axis=0)
            n += len(X)
        if n == 0:
            return
        d_idx = np.arange(dim, dtype=np.int32)
        ii = np.concatenate(([np.int32(-1)], d_idx, np.repeat(d_idx, dim)))
        jj = np.concatenate(
            ([np.int32(-1)], np.full(dim, -1, np.int32), np.tile(d_idx, dim))
        )
        vv = np.concatenate(([np.int64(n)], sx, sp.ravel()))
        yield pa.record_batch(
            [
                pa.array(ii, type=pa.int32()),
                pa.array(jj, type=pa.int32()),
                pa.array(vv, type=pa.int64()),
            ],
            names=["i", "j", "v"],
        )

    tot = (
        df.select(F.col(vec_col))
        .mapInArrow(_partials, part_schema)
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
    )
    # ≤ d² + d + 1 rows — a lazy barrier so the three consumers below
    # (cells / mean lane / count) read ONE materialization instead of
    # re-running the source scan per filter branch.
    tot = tot.localCheckpoint(eager=False)
    sums = tot.filter(F.col("j") >= 0).select(
        "i", "j", F.col("v").alias("sp")
    )
    mi = tot.filter((F.col("j") == -1) & (F.col("i") >= 0)).select(
        "i", F.col("v").alias("sx_i")
    )
    mj = mi.select(F.col("i").alias("j"), F.col("sx_i").alias("sx_j"))
    nrow = tot.filter(F.col("i") == -1).select(F.col("v").alias("n"))
    exy = F.col("sp").cast("double") / F.lit(1e6) / F.col("n")
    m_i = F.col("sx_i").cast("double") / F.lit(1e6) / F.col("n")
    m_j = F.col("sx_j").cast("double") / F.lit(1e6) / F.col("n")
    return (
        sums.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .crossJoin(F.broadcast(nrow))
        .select(
            "i",
            "j",
            (exy - m_i * m_j).alias("cov"),
            m_i.alias("m_i"),
            m_j.alias("m_j"),
        )
    )


def covariance_matrix(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Sample-free covariance of a fixed-``dim`` vector column:
    (i, j, cov) for all d² cells, cov = E[x_i·x_j] − E[x_i]·E[x_j]
    (population normalization, divide by n). i/j are 0-based.

    Vectors are cast float→double before multiplying (exact), products
    quantized to micro-units, summed as integers, and the closed-form
    combination is a fixed sequence of double ops — engine-portable.
    """
    return _cov_joined(df, vec_col, dim).select("i", "j", "cov")


def _eigh_components(C, k: int):
    """Top-k eigenvectors of the (near-)symmetric matrix C as columns,
    sign-normalized (largest-|loading| coordinate made positive —
    eigenvectors are sign-ambiguous and numpy's choice is not a
    contract). Shared by the distributed pca_project and the serial
    numpy oracle so both apply the IDENTICAL deterministic pipeline to
    their (identical, micro-quantized) covariance inputs."""
    import numpy as np

    # symmetrize: quantization leaves |C - C.T| <= 1e-6 asymmetry
    C = (C + C.T) / 2.0
    vals, vecs = np.linalg.eigh(C)  # ascending eigenvalues
    comps = vecs[:, ::-1][:, :k]  # columns = top-k components
    for c in range(k):
        j = int(np.abs(comps[:, c]).argmax())
        if comps[j, c] < 0:
            comps[:, c] = -comps[:, c]
    return comps


def pca_components_numpy(parquet_path: str, vec_col: str, dim: int, k: int):
    """Serial ORACLE twin of pca_project's component derivation:
    (comps d×k, mu length-d) computed with pyarrow + numpy straight off
    the parquet file, replicating the distributed path's exact integer
    micro-quantization — p_ij = floor(x_i·x_j·1e6 + 0.5) summed as
    int64, E[x] from floor(x·1e6 + 0.5) sums, cov = E[xy] − E[x]E[y]
    with the same division order — so the covariance matrices are
    BIT-IDENTICAL (integer sums commute) and _eigh_components returns
    bit-identical components. Lets a DuckDB oracle check the whole PCA
    pipeline by hash: the generated SQL projects with these values as
    literals (see driver_queries.emb_pca_project)."""
    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, columns=[vec_col])
    rows = [
        v for v in tbl.column(vec_col).to_pylist()
        if v is not None and len(v) == dim
    ]
    # float32 storage -> float64, the same widening cast as Spark's
    X = np.asarray(rows, dtype=np.float32).astype(np.float64)
    n = X.shape[0]
    # per-cell integer micro-unit products, summed exactly; chunked so
    # the n×d×d intermediate stays bounded (~32 MB per 1024-row block
    # at d=64) whatever the corpus size
    sp = np.zeros((dim, dim), dtype=np.int64)
    for lo in range(0, n, 1024):
        B = X[lo:lo + 1024]
        sp += (
            np.floor(B[:, :, None] * B[:, None, :] * 1e6 + 0.5)
            .astype(np.int64)
            .sum(axis=0)
        )
    sx = np.floor(X * 1e6 + 0.5).astype(np.int64).sum(axis=0)
    exy = sp.astype(np.float64) / 1e6 / n
    m = sx.astype(np.float64) / 1e6 / n
    C = exy - np.outer(m, m)
    return _eigh_components(C, k), m


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

    # ONE job over the source: the covariance join already carries the
    # per-coordinate mean on every cell (m_i = sx_i/1e6/n — the exact
    # micro-quantized mean), so covariance AND mean come from a single
    # d²-row collect instead of two independent scans of the input.
    cov_rows = _cov_joined(df, vec_col, dim).collect()
    C = np.zeros((dim, dim))
    mu = np.zeros(dim)
    for r in cov_rows:
        C[r.i, r.j] = r.cov
        mu[r.i] = r.m_i
    comps = _eigh_components(C, k)
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
