"""Quantization tests: int8 scalar round-trip bounds, degenerate
vectors, PQ encode/decode shape and tie-breaking, plan shape (no
exchanges — quantization must stay a narrow map)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finlogic_spark.operators.quantize import (
    deterministic_codebooks,
    pq_decode,
    pq_encode,
    scalar_dequantize,
    scalar_quantize,
)


def _vecs(spark):
    rows = [
        (0, [0.5, -1.0, 0.25, 0.125]),
        (1, [0.0, 0.0, 0.0, 0.0]),          # all-zero: scale 0, codes 0
        (2, [1e-8, -1e-8, 0.0, 1e-8]),       # tiny but nonzero scale
        (3, [3.0, 3.0, -3.0, 3.0]),          # |x| = scale everywhere
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_scalar_roundtrip_error_bounded(spark):
    sq = scalar_quantize(_vecs(spark)).withColumn("rec", scalar_dequantize())
    rows = {r["vec_id"]: r for r in sq.collect()}
    for vid, r in rows.items():
        assert len(r["q_code"]) == 4
        assert all(-127 <= c <= 127 for c in r["q_code"])
        for orig, rec in zip(r["embedding"], r["rec"]):
            # error bound: half a quantization step = scale/254
            assert abs(orig - rec) <= r["q_scale"] / 254.0 + 1e-12
    # all-zero vector reconstructs exactly
    assert rows[1]["q_scale"] == 0.0
    assert rows[1]["rec"] == [0.0, 0.0, 0.0, 0.0]
    # saturated components hit +/-127 exactly
    assert rows[3]["q_code"] == [127, 127, -127, 127]


def test_scalar_quantize_is_narrow_map(spark):
    plan = scalar_quantize(_vecs(spark)).withColumn(
        "rec", scalar_dequantize()
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pq_roundtrip_and_ties(spark):
    cbs = deterministic_codebooks(m=2, k=4, width=2)
    df = spark.createDataFrame(
        [(0, [0.1, -0.1, 0.05, 0.02]), (1, [-0.3, 0.2, -0.1, 0.4])],
        "vec_id int, embedding array<double>",
    )
    enc = pq_encode(df, cbs).withColumn("rec", pq_decode(cbs))
    for r in enc.collect():
        assert len(r["pq_code"]) == 2
        assert all(0 <= c < 4 for c in r["pq_code"])
        assert len(r["rec"]) == 4
        # decode really is the chosen codebook rows, concatenated
        want = cbs[0][r["pq_code"][0]] + cbs[1][r["pq_code"][1]]
        assert r["rec"] == pytest.approx(want)
    # equidistant centroids -> lowest id wins (duplicate codebook rows)
    tie_cb = [[[1.0, 1.0], [1.0, 1.0], [0.0, 0.0]]]
    tied = pq_encode(
        spark.createDataFrame([(0, [1.0, 1.0])], "vec_id int, embedding array<double>"),
        tie_cb,
    ).collect()[0]
    assert tied["pq_code"] == [0]


def test_pq_rejects_ragged_codebook(spark):
    df = spark.createDataFrame([(0, [0.1, 0.2])], "vec_id int, embedding array<double>")
    with pytest.raises(ValueError, match="subspace width"):
        pq_encode(df, [[[0.1, 0.2], [0.1]]])


def test_pq_encode_is_narrow_map(spark):
    cbs = deterministic_codebooks(m=2, k=4, width=2)
    df = spark.createDataFrame(
        [(0, [0.1, -0.1, 0.05, 0.02])], "vec_id int, embedding array<double>"
    )
    plan = pq_encode(df, cbs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
