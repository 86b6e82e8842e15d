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

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Fixed-duration units only: a month/year interval has no constant
# width, so the sequence() grid and the tumbling bucket would disagree
# on bucket edges. Validated EAGERLY (before any expression is built)
# so a bad step raises ValueError here, not an AnalysisException later.
_STEP_RE = re.compile(
    r"^\s*([1-9]\d*)\s+(second|minute|hour|day|week)s?\s*$", re.IGNORECASE
)


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

    ``step`` is any fixed-width interval ('15 minutes', '1 hour',
    '2 days', ...); buckets are epoch-aligned tumbling windows
    (``F.window(ts, step).start`` — for '1 hour' identical to
    ``date_trunc('hour')``). Variable-width units (month/year) raise.

    Returns (key, bucket_ts, val, is_gap): ``val`` is the
    deterministic bucket mean (exact integer cent-sum / count — stable
    under any partial-agg order) or the forward-filled previous value;
    rows before a key's first value keep val null. ``is_gap`` marks
    filled rows.
    """
    m = _STEP_RE.match(step)
    if not m:
        raise ValueError(
            f"resample_ffill step must be '<n> <second|minute|hour|day"
            f"|week>[s]' (fixed-width); got {step!r}"
        )
    bucket = F.window(F.col(ts_col), step)["start"].alias("bucket_ts")

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
