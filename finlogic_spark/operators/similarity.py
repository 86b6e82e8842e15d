"""Similarity search over embedding columns (engine-scope addition;
SURVEY.md §7 phase 4 — the `embeddings` table, ArrayType(FloatType)).

Two tiers:
- ``cosine_topk``    — brute-force exact top-k: broadcast the (small)
  query set against the corpus; per-row dot products stay JVM-side via
  ``zip_with`` + ``aggregate``; per-query top-k via ranked window.
  Exact baseline; linear in corpus size per query.
- ``lsh_cosine_topk`` — random-hyperplane LSH: bucket corpus and queries
  by sign-pattern of H fixed hyperplanes, join on bucket, rank within.
  Sub-linear candidate set; the 100 TB path (hyperplanes are a literal
  broadcast array, seed-deterministic).

No Python UDFs: higher-order array functions compile to Catalyst
expressions and run inside whole-stage codegen.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector (all-zero embedding — they occur in
    # real corpora) yields null instead of an ANSI divide-by-zero error;
    # null similarity sorts last under the desc rank windows.
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Exact top-k nearest corpus rows per query row by cosine.

    Plan: BroadcastNestedLoopJoin (query side broadcast — it must be
    the small side) → codegen'd cosine → per-query rank window.
    Deterministic tiebreak on corpus id.
    """
    q = F.broadcast(queries.select(query_id, query_vec))
    scored = corpus.select(corpus_id, corpus_vec).crossJoin(q).select(
        F.col(query_id),
        F.col(corpus_id),
        cosine(F.col(corpus_vec), F.col(query_vec)).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id, corpus_id, "cos_sim", "rk")
    )


def _deterministic_planes(dim: int, num_planes: int) -> list[list[float]]:
    """Seeded pseudo-random hyperplanes from md5 bytes — reproducible
    across engines and runs without RNG state."""
    planes = []
    for p in range(num_planes):
        vals: list[float] = []
        counter = 0
        while len(vals) < dim:
            digest = hashlib.md5(f"plane{p}|{counter}".encode()).digest()
            for off in range(0, 16, 4):
                (u,) = struct.unpack(">I", digest[off : off + 4])
                vals.append((u / 2**31) - 1.0)  # uniform [-1, 1)
            counter += 1
        planes.append(vals[:dim])
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id: bit p set iff dot(vec, plane_p) >= 0."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(dot(vec, lit_plane) >= 0, F.lit(2**p)).otherwise(F.lit(0))
        bucket = bucket + bit.cast("long")
    return bucket


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    num_planes: int = 6,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket (expected corpus/2^num_planes rows per bucket). Equi-join on
    bucket id — a hash join Catalyst can broadcast or shuffle, never a
    cross join. Recall is tunable via num_planes (fewer planes = bigger
    buckets = higher recall, more compute)."""
    planes = _deterministic_planes(dim, num_planes)
    c = corpus.select(
        F.col(corpus_id),
        F.col(corpus_vec),
        lsh_bucket(F.col(corpus_vec), planes).alias("__bucket"),
    )
    q = queries.select(
        F.col(query_id),
        F.col(query_vec),
        lsh_bucket(F.col(query_vec), planes).alias("__bucket"),
    )
    scored = c.join(F.broadcast(q), "__bucket").select(
        F.col(query_id),
        F.col(corpus_id),
        cosine(F.col(corpus_vec), F.col(query_vec)).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id, corpus_id, "cos_sim", "rk")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float,
    dim: int,
    num_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= τ):
    the vector-space dedup tier (exact / n-gram / MinHash-LSH / SimHash
    / embedding-cosine).

    Candidates come from a self-equi-join on the sign-pattern LSH bucket
    (near-identical vectors agree on every hyperplane sign with high
    probability), then exact cosine confirms — sub-quadratic: only
    same-bucket pairs are ever scored, ~n²/2^planes instead of n².
    Recall/cost tunes via num_planes; raise it for tighter thresholds.
    """
    planes = _deterministic_planes(dim, num_planes)
    b = df.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_bucket(F.col(vec_col), planes).alias("__bucket"),
    )
    a_side = b.select(
        "__bucket", F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va")
    )
    b_side = b.select(
        "__bucket", F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb")
    )
    return (
        a_side.join(b_side, "__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int,
    n_probe: int = 2,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    centroid_id: str = "cid",
    centroid_vec: str = "cv",
) -> DataFrame:
    """IVF-style approximate top-k: assign every corpus vector to its
    nearest centroid ("cell") once, then each query scans only its
    ``n_probe`` nearest cells.

    Scale shape: the corpus-side assignment is a broadcast of the tiny
    centroid table + a rank window per vector (embarrassingly parallel,
    done once and cacheable / persistable as a cell-partitioned table);
    query time is an equi-join on cell id — candidates shrink by
    ~n_probe/n_list versus brute force. Centroids are caller-provided
    (seed vectors, k-means output, …) so the operator stays
    deterministic and engine-agnostic."""
    cent = F.broadcast(centroids.select(centroid_id, centroid_vec))

    def nearest_cells(df: DataFrame, id_col: str, vec_col: str, n: int) -> DataFrame:
        scored = df.crossJoin(cent).select(
            F.col(id_col),
            F.col(vec_col),
            F.col(centroid_id),
            cosine(F.col(vec_col), F.col(centroid_vec)).alias("__c_sim"),
        )
        w = Window.partitionBy(id_col).orderBy(
            F.col("__c_sim").desc(), F.col(centroid_id).asc()
        )
        return (
            scored.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= n)
            .select(id_col, vec_col, centroid_id)
        )

    cells = nearest_cells(corpus, corpus_id, corpus_vec, 1)
    probes = nearest_cells(queries, query_id, query_vec, n_probe)
    scored = cells.join(F.broadcast(probes), centroid_id).select(
        F.col(query_id),
        F.col(corpus_id),
        cosine(F.col(corpus_vec), F.col(query_vec)).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id, corpus_id, "cos_sim", "rk")
    )
