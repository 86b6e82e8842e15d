"""Z-order tests: Morton interleave math, bucketize clamping, and the
data-skipping property — z-ordered files carry tighter per-file min/max
ranges on BOTH dimensions than a single-key sort."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from finlogic_spark.operators.zorder import bucketize, z_value, zorder_write


def test_z_value_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0b1010, 0b0110)], "a long, b long"
    ).select(z_value([F.col("a"), F.col("b")], 4).alias("z"))
    # interleave LSB-first: z bit (2b)   = a's bit b,
    #                       z bit (2b+1) = b's bit b
    a, b = 0b1010, 0b0110
    want = sum(((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1) for i in range(4))
    assert df.collect()[0]["z"] == want


def test_z_value_monotone_on_single_dim(spark):
    # with the other dim fixed, z grows with the varying dim
    df = spark.createDataFrame(
        [(i, 7) for i in range(16)], "a long, b long"
    ).select("a", z_value([F.col("a"), F.col("b")], 4).alias("z"))
    rows = sorted((r["a"], r["z"]) for r in df.collect())
    zs = [z for _, z in rows]
    assert zs == sorted(zs)


def test_z_value_bit_budget(spark):
    with pytest.raises(ValueError, match="63"):
        z_value([F.lit(1), F.lit(1), F.lit(1), F.lit(1)], 16)


def test_bucketize_clamps(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (10.0,), (19.99,), (25.0,)], "v double"
    ).select("v", bucketize(F.col("v"), 0.0, 20.0, 8).alias("b"))
    got = {r["v"]: r["b"] for r in df.collect()}
    assert got[-5.0] == 0 and got[25.0] == 255       # clamped edges
    assert got[0.0] == 0 and got[10.0] == 128
    assert 0 <= got[19.99] <= 255


def _file_ranges(spark, path, col):
    ranges = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        r = spark.read.parquet(f).agg(
            F.min(col).alias("lo"), F.max(col).alias("hi")
        ).collect()[0]
        ranges.append((r["lo"], r["hi"]))
    return ranges


def test_zorder_write_tightens_both_dims(spark, tmp_path):
    # 32x32 grid of (x, y): a sort by x alone leaves every file
    # spanning y's whole domain; z-order bounds both.
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x long, y long").repartition(8)
    zpath = str(tmp_path / "z")
    zorder_write(df, zpath, [F.col("x"), F.col("y")], bits=5, num_files=8)

    xr = _file_ranges(spark, zpath, "x")
    yr = _file_ranges(spark, zpath, "y")
    assert len(xr) >= 4  # range partitioner actually split
    # every file's span in each dim is a fraction of the 0..31 domain
    assert all(hi - lo <= 16 for lo, hi in xr)
    assert all(hi - lo <= 16 for lo, hi in yr)
