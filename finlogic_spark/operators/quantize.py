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
    # null code only when scale = 0 → encode as 0 (exact reconstruction);
    # the coalesce lives INSIDE the one transform — higher-order array
    # functions evaluate interpreted (outside whole-stage codegen), so
    # every extra array pass is a real per-element cost at corpus scale
    code = F.transform(
        v,
        lambda x: F.coalesce(
            F.floor(F.try_divide(x * 127.0, F.col(scale_col)) + 0.5).cast(
                "tinyint"
            ),
            F.lit(0).cast("tinyint"),
        ),
    )
    return df.withColumn(scale_col, scale).withColumn(code_col, code)


def scalar_dequantize(
    code_col: str = "q_code", scale_col: str = "q_scale"
) -> Column:
    """array<double> reconstruction: x̂_i = code_i * scale / 127."""
    return F.transform(
        F.col(code_col),
        lambda c: c.cast("double") * F.col(scale_col) / F.lit(127.0),
    )


def quantize_report(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Column | DataFrame:
    """Arrow-batched numpy tier of the encode→decode quality report:
    (id, q_scale, max_abs_err, cos_recon) — bit-identical to the
    expression path (``scalar_quantize`` + ``scalar_dequantize`` +
    ``similarity.cosine``), pinned in tests/test_quantize_parity.py.

    Why a Pandas path exists here at all: the expression formulation
    is ~10 higher-order array passes per row, and HOF lambdas evaluate
    INTERPRETED (outside whole-stage codegen) — at sf100 (2M × 64-dim)
    that measured 7.94 s / 4.05× DuckDB (BENCH_sf100.json r11). The
    same arithmetic vectorized over an Arrow batch is one numpy kernel
    per metric. Bit-identity holds because every IEEE operation and
    its order is reproduced exactly:

    - scale   = max(|x_i|)                       (elementwise abs, max)
    - code    = floor(x*127.0 / scale + 0.5)     (mul, div, add, floor —
      the try_divide(…)=NULL→0 guard becomes an explicit scale==0 mask)
    - rec     = code * scale / 127.0
    - err     = max(|x - rec|)
    - cosine  = dot/(|v||rec|) with all three folds accumulated
      left-to-right over dims (the numpy loop adds dim i's term for
      every row before dim i+1 — per row that IS the fold order of
      ``F.aggregate``), try_divide's zero-denominator NULL preserved
      via a nullable Float64 output (NaN would hash differently).

    Still a narrow map: zero shuffles, scan-shaped parallelism; the
    only new cost is the Arrow transfer of the vector column.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("q_scale", T.DoubleType()),
            T.StructField("max_abs_err", T.DoubleType()),
            T.StructField("cos_recon", T.DoubleType()),
        ]
    )

    def batches(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            n, d = V.shape
            scale = np.abs(V).max(axis=1)
            zero = scale == 0.0
            safe = np.where(zero, 1.0, scale)
            code = np.floor((V * 127.0) / safe[:, None] + 0.5)
            code[zero, :] = 0.0
            rec = code * scale[:, None] / 127.0
            err = np.abs(V - rec).max(axis=1)
            dot = np.zeros(n)
            na = np.zeros(n)
            nb = np.zeros(n)
            for i in range(d):
                dot += V[:, i] * rec[:, i]
                na += V[:, i] * V[:, i]
                nb += rec[:, i] * rec[:, i]
            denom = np.sqrt(na) * np.sqrt(nb)
            cos = pd.array(
                np.divide(
                    dot, denom, out=np.full(n, np.nan), where=denom != 0.0
                ),
                dtype="Float64",
            )
            cos[denom == 0.0] = pd.NA
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "q_scale": scale,
                    "max_abs_err": err,
                    "cos_recon": cos,
                }
            )

    return df.select(id_col, vec_col).mapInPandas(batches, out_schema)


def _codebooks_sql(codebooks: Sequence[Sequence[Sequence[float]]]) -> str:
    """ONE literal ``array<array<array<double>>>``: CB[s][c][j]. A single
    3-deep array literal keeps the expression tree small — the previous
    per-subspace unrolled formulation (one argmin expression per
    subspace, each inlining its own codebook) made plan construction +
    codegen dominate wall clock (2.85× DuckDB at sf0.1, flagged round 3)."""
    subs = ", ".join(
        "array(" + ", ".join(_sql_vec(c) for c in cb) + ")" for cb in codebooks
    )
    return f"array({subs})"


def _check_widths(codebooks: Sequence[Sequence[Sequence[float]]]) -> int:
    width = len(codebooks[0][0])
    for cb in codebooks:
        if any(len(c) != width for c in cb):
            raise ValueError("all codebook rows must share one subspace width")
    return width


def _sq_l2_sql(a_sql: str, b_sql: str) -> str:
    """Squared L2 as a left-to-right fold — the order DuckDB's
    list_sum(list_transform(...)) reproduces bit-for-bit."""
    return (
        f"aggregate(zip_with({a_sql}, {b_sql}, (x, y) -> (x - y) * (x - y)), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def pq_encode(
    df: DataFrame,
    codebooks: Sequence[Sequence[Sequence[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Product-quantization encode: per subspace s, the id of the
    nearest (squared-L2) codebook row to slice s of the vector.

    ``codebooks[s]`` is the list of centroid vectors for subspace s; all
    subspaces must share one width ``dim/m``. The codebooks fold into
    the plan as ONE 3-deep array literal (m·k·(dim/m) doubles, e.g.
    8·16·8 = 1k) and the per-subspace argmin is a generic indexed
    ``transform`` loop over it — a compact expression tree instead of m
    unrolled argmins, so codegen stays cheap as m·k grows. Single
    projection, zero exchanges. Ties take the lowest centroid id
    (struct-min over ('d', 'i')), matching ``kmeans.assign_clusters``.
    """
    m = len(codebooks)
    width = _check_widths(codebooks)
    cb = _codebooks_sql(codebooks)
    v = f"transform(`{vec_col}`, x -> cast(x as double))"
    dist = _sq_l2_sql(f"slice({v}, s * {width} + 1, {width})", "c")
    expr = (
        f"transform(sequence(0, {m - 1}), s -> "
        f"array_min(transform(element_at({cb}, s + 1), (c, ci) -> "
        f"named_struct('d', {dist}, 'i', ci))).i)"
    )
    return df.withColumn(code_col, F.expr(expr).cast("array<int>"))


def pq_decode(
    codebooks: Sequence[Sequence[Sequence[float]]],
    code_col: str = "pq_code",
) -> Column:
    """Concatenated reconstruction: subspace s contributes
    codebooks[s][code[s]]. Serving scores approximate distances against
    this without reading original vectors."""
    m = len(codebooks)
    cb = _codebooks_sql(codebooks)
    return F.expr(
        f"flatten(transform(sequence(0, {m - 1}), s -> "
        f"element_at(element_at({cb}, s + 1), element_at(`{code_col}`, s + 1) + 1)))"
    )


def pq_lut_expr(
    codebooks: Sequence[Sequence[Sequence[float]]],
    query_vec_col: str,
) -> Column:
    """Per-query ADC lookup table: ``array<array<double>>`` with
    LUT[s][c] = ||query_slice_s − codebooks[s][c]||² (squared L2).

    This is the query-side half of asymmetric distance computation
    (Jégou et al., "Product Quantization for Nearest Neighbor Search",
    TPAMI 2011): the approximate distance from a query to a PQ-coded
    corpus vector is ``Σ_s LUT[s][code[s]]`` — m table lookups + adds
    per candidate, never touching the original floats. Computing the
    LUT costs m·k subspace distances ONCE per query row; it amortizes
    over every candidate that query scores."""
    m = len(codebooks)
    width = _check_widths(codebooks)
    cb = _codebooks_sql(codebooks)
    v = f"transform(`{query_vec_col}`, x -> cast(x as double))"
    dist = _sq_l2_sql(f"slice({v}, s * {width} + 1, {width})", "c")
    return F.expr(
        f"transform(sequence(0, {m - 1}), s -> "
        f"transform(element_at({cb}, s + 1), c -> {dist}))"
    )


def pq_adist_expr(lut_col: str, code_col: str) -> Column:
    """Asymmetric PQ distance: left-to-right fold over subspaces of
    LUT[s][code[s]]. The fold order is pinned (s = 0..m−1) so a DuckDB
    oracle summing the same terms in s-order reproduces the double
    bit-for-bit — rank order must agree across engines."""
    return F.expr(
        f"aggregate(zip_with(`{lut_col}`, `{code_col}`, "
        f"(b, cd) -> element_at(b, cd + 1)), 0.0D, (acc, d) -> acc + d)"
    )
