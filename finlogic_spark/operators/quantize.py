"""Embedding quantization (engine-scope addition): the storage/memory
lever for vector search at 100 TB.

- ``scalar_quantize``   — per-vector symmetric int8: 4 bytes/dim float32
  → 1 byte/dim + one float scale. A 100 TB float corpus becomes ~25 TB
  with bounded (<= scale/254) per-component error; dequantized cosine
  preserves ANN ranking to ~1e-2.
- ``scalar_dequantize`` — reconstruct doubles for exact re-scoring.
- ``pq_encode``         — product quantization: split each vector into
  ``m`` subspaces, store the nearest sub-centroid ID per subspace — m
  bytes/vector (64-dim float32 → 8 bytes at m=8, 32×). Codebooks come
  from the caller (per-subspace k-means over a sample); encoding is a
  shuffle-free expression argmin per subspace, same plan shape as
  ``similarity.ivf_assign``.
- ``pq_decode``         — reconstruct each subspace from its codebook
  row (the approximate-distance serving path scores against these
  reconstructions without ever touching the original floats).

Everything is built-in higher-order array functions — no Python UDFs,
no shuffles: quantization is a narrow map over the corpus, so it
parallelizes scan-shaped and composes with partitioned/bucketed
storage. All arithmetic is double-precision with explicit rounding so
DuckDB oracles reproduce values bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from finlogic_spark.operators.similarity import _sql_vec


def deterministic_codebooks(
    m: int, k: int, width: int, scale: float = 0.1, seed: str = "cb"
) -> list[list[list[float]]]:
    """Seeded pseudo-random PQ codebooks from md5 bytes (same scheme as
    ``similarity._deterministic_planes``): reproducible across engines
    and runs with no RNG state, so a DuckDB oracle can inline the exact
    same constants. Production would k-means each subspace over a
    corpus sample instead; the operator contract is identical."""
    import hashlib
    import struct as _struct

    books: list[list[list[float]]] = []
    for s in range(m):
        book: list[list[float]] = []
        for c in range(k):
            vals: list[float] = []
            counter = 0
            while len(vals) < width:
                d = hashlib.md5(f"{seed}{s}|{c}|{counter}".encode()).digest()
                for off in range(0, 16, 4):
                    (u,) = _struct.unpack(">I", d[off : off + 4])
                    vals.append(((u / 2**31) - 1.0) * scale)
                counter += 1
            book.append(vals[:width])
        books.append(book)
    return books


def scalar_quantize(
    df: DataFrame,
    vec_col: str = "embedding",
    code_col: str = "q_code",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Per-vector symmetric int8 quantization.

    scale = max(|x_i|); code_i = floor(x_i / scale * 127 + 0.5) in
    [-127, 127] — half-toward-+inf rounding, spelled as floor(x + 0.5)
    because that exact IEEE sequence reproduces in any engine (Spark's
    and DuckDB's round() disagree on some doubles; see driver rN). The
    all-zero vector gets scale 0 and all-zero codes (guarded divide).
    Per-vector (not global) scales make the operator embarrassingly
    parallel and robust to outlier vectors — no pre-pass over the corpus.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, F.abs))
    code = F.transform(
        v,
        lambda x: F.floor(F.try_divide(x * 127.0, F.col(scale_col)) + 0.5).cast(
            "tinyint"
        ),
    )
    out = df.withColumn(scale_col, scale).withColumn(code_col, code)
    # null codes only when scale = 0 → encode as 0 (exact reconstruction)
    return out.withColumn(
        code_col,
        F.transform(F.col(code_col), lambda c: F.coalesce(c, F.lit(0).cast("tinyint"))),
    )


def scalar_dequantize(
    code_col: str = "q_code", scale_col: str = "q_scale"
) -> Column:
    """array<double> reconstruction: x̂_i = code_i * scale / 127."""
    return F.transform(
        F.col(code_col),
        lambda c: c.cast("double") * F.col(scale_col) / F.lit(127.0),
    )


def _subspace_codebook_sql(codebook: Sequence[Sequence[float]]) -> str:
    """Literal array<struct<i int, cv array<double>>> for one subspace's
    codebook (i = centroid id)."""
    elems = ", ".join(
        f"named_struct('i', {i}, 'cv', {_sql_vec(c)})" for i, c in enumerate(codebook)
    )
    return f"array({elems})"


def pq_encode(
    df: DataFrame,
    codebooks: Sequence[Sequence[Sequence[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Product-quantization encode: per subspace s, the id of the
    nearest (squared-L2) codebook row to slice s of the vector.

    ``codebooks[s]`` is the list of centroid vectors for subspace s; all
    subspaces must share one width ``dim/m``. One Catalyst expression
    per subspace, single projection, zero exchanges — the codebooks live
    in the plan as literals (PQ codebooks are small by construction:
    m·k·(dim/m) floats, e.g. 8·16·8 = 1k doubles). Ties take the lowest
    centroid id, matching ``kmeans.assign_clusters``.
    """
    m = len(codebooks)
    width = len(codebooks[0][0])
    parts = []
    for s, cb in enumerate(codebooks):
        if any(len(c) != width for c in cb):
            raise ValueError("all codebook rows must share one subspace width")
        arr = _subspace_codebook_sql(cb)
        sl = f"slice(transform(`{vec_col}`, x -> cast(x as double)), {s * width + 1}, {width})"
        scored = (
            f"transform({arr}, c -> named_struct("
            f"'d', aggregate(zip_with({sl}, c.cv, (x, y) -> (x - y) * (x - y)), "
            f"0.0D, (acc, v) -> acc + v), 'i', c.i))"
        )
        parts.append(f"array_min({scored}).i")
    return df.withColumn(
        code_col, F.expr(f"array({', '.join(parts)})").cast("array<int>")
    )


def pq_decode(
    codebooks: Sequence[Sequence[Sequence[float]]],
    code_col: str = "pq_code",
) -> Column:
    """Concatenated reconstruction: subspace s contributes
    codebooks[s][code[s]]. Serving scores approximate distances against
    this without reading original vectors."""
    pieces = []
    for s, cb in enumerate(codebooks):
        arr = _subspace_codebook_sql(cb)
        # codebook rows are ordered by id, so decode is a direct index
        pieces.append(f"element_at({arr}, `{code_col}`[{s}] + 1).cv")
    return F.expr("concat(" + ", ".join(pieces) + ")")
