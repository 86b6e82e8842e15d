"""Bit-identity pin for the Arrow/numpy quantize-report tier.

quantize_report is a performance tier only — its contract is EXACT
equality with the expression path (scalar_quantize + scalar_dequantize
+ cosine), including the rN 6-dp presentation rounding and the
try_divide NULL on a zero-norm vector. Any IEEE-order drift between
the numpy kernels and the interpreted HOF folds shows up here as a
row diff, not as a silent oracle-hash flake at some later scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finlogic_spark.operators.quantize import (
    quantize_report,
    scalar_dequantize,
    scalar_quantize,
)
from finlogic_spark.operators.similarity import cosine


def _expression_report(df, id_col="vec_id", vec_col="embedding"):
    sq = scalar_quantize(df, vec_col, "q_code", "q_scale")
    rec = scalar_dequantize("q_code", "q_scale")
    v = F.col(vec_col)
    return sq.withColumn("__rec", rec).select(
        id_col,
        F.col("q_scale").alias("q_scale"),
        F.array_max(
            F.zip_with(v, F.col("__rec"), lambda a, b: F.abs(a - b))
        ).alias("max_abs_err"),
        cosine(v, F.col("__rec")).alias("cos_recon"),
    )


def _rN(col, digits=6):
    scale = float(10**digits)
    return F.floor(col * scale + F.lit(0.5)) / F.lit(scale)


def _assert_identical(expr_df, fast_df):
    # exact-value comparison (raw doubles, no rounding): exceptAll both
    # ways is empty iff the multisets of rows are bit-identical
    assert expr_df.exceptAll(fast_df).count() == 0
    assert fast_df.exceptAll(expr_df).count() == 0


@pytest.mark.parametrize("rounded", [False, True])
def test_parity_on_edge_vectors(spark, rounded):
    rows = [
        (1, [0.5, -0.25, 0.125, 1.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # zero-norm: cos must be NULL
        (3, [-1e-9, 1e-9, -1.0, 1.0]),
        (4, [3.7, -3.7, 0.1, 0.2]),
        (5, [1e30, -1e-30, 5.0, -2.0]),
        (6, [0.1, 0.1, 0.1, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    expr = _expression_report(df)
    fast = quantize_report(df)
    if rounded:
        cols = ["q_scale", "max_abs_err", "cos_recon"]
        expr = expr.select("vec_id", *[_rN(F.col(c)).alias(c) for c in cols])
        fast = fast.select("vec_id", *[_rN(F.col(c)).alias(c) for c in cols])
    _assert_identical(expr, fast)
    # the zero vector's cosine is NULL (not NaN) in BOTH tiers
    for d in (expr, fast):
        row = d.filter(F.col("vec_id") == 2).collect()[0]
        assert row["cos_recon"] is None
        assert row["q_scale"] == 0.0 and row["max_abs_err"] == 0.0


def test_parity_on_real_corpus(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    _assert_identical(
        _expression_report(emb), quantize_report(emb)
    )


def test_registry_query_uses_fast_tier_and_matches(spark, sf_dir):
    # the registry emb_scalar_quantize output is identical whichever
    # tier computes it — guard against the registry drifting from the
    # pinned expression semantics
    from finlogic_spark import driver_queries as dq

    out = dq.QUERIES["emb_scalar_quantize"](spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    cols = ["q_scale", "max_abs_err", "cos_recon"]
    expr = _expression_report(emb).select(
        "vec_id", *[_rN(F.col(c)).alias(c) for c in cols]
    )
    _assert_identical(out.select("vec_id", *cols), expr)
