"""Time-series regularization: resample irregular events onto a fixed
grid and gap-fill (engine-scope addition — the hypertable /
`time_bucket_gapfill` operation of timeseries stores, re-expressed as
three Spark primitives: bucket-agg, sequence-explode grid, and a
running `last(ignorenulls)` window).

Shape at 100 TB: the bucket aggregate partial-combines map-side (one
row per (key, bucket) crosses the shuffle, not one per event); the
grid is generated per key from its own min/max bounds — sequence() +
explode, no driver loop, row count bounded by key_count × span/step;
the forward-fill is a window partitioned by series key, so state never
exceeds one key's grid and skew equals the longest single series, not
the table. No collect, no cross join, nothing global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Per-key fixed-step grid from that key's first to last bucket,
    with the bucket's mean value where events exist and the previous
    bucket's value carried forward across gaps.

    Returns (key, bucket_ts, val, is_gap): ``val`` is the
    deterministic bucket mean (exact integer cent-sum / count — stable
    under any partial-agg order) or the forward-filled previous value;
    rows before a key's first value keep val null. ``is_gap`` marks
    filled rows.
    """
    bucket = F.date_trunc("hour", F.col(ts_col)).alias("bucket_ts")
    if step != "1 hour":
        # sequence() below steps by the same interval; date_trunc only
        # supports calendar units, so non-hour steps would need a
        # window-start expression — out of scope until a caller needs it.
        raise ValueError("resample_ffill currently supports step='1 hour'")

    hourly = (
        events.select(F.col(key_col).alias("key"), bucket,
                      F.col(value_col).alias("v"))
        .groupBy("key", "bucket_ts")
        .agg(
            (
                (F.sum(F.floor(F.col("v") * 100.0 + F.lit(0.5))) / F.lit(100.0))
                / F.count(F.lit(1))
            ).alias("bucket_val")
        )
    )
    bounds = hourly.groupBy("key").agg(
        F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi")
    )
    grid = bounds.select(
        "key",
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL {step}"))
        ).alias("bucket_ts"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["key", "bucket_ts"], "left")
        .select(
            "key",
            "bucket_ts",
            F.last("bucket_val", ignorenulls=True).over(w).alias("val"),
            F.col("bucket_val").isNull().alias("is_gap"),
        )
    )
