"""Lag-window smoothing operators.

Reference: trailing 2-period averages for ROA/ROE/ROIC denominators via
``shift(1).over(group)`` coalesced to current (src/finlogic/
indicators.py:47-54), and the quarterly lag-4-else-lag-1-else-current
fallback (src/finlogic/indicators.py:57-69). Polars used the frame's
physical row order inside each group; Spark windows state
``orderBy`` explicitly (SURVEY.md §2.6 hazard — the #1 silent-wrong-
answer source in a naive port).

Scale: all lags over one group share a single window spec → one shuffle
on the group keys, one in-partition sort, arbitrarily many lag columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_window(group_keys: Sequence[str], order_key: str):
    return Window.partitionBy(*group_keys).orderBy(F.col(order_key).asc())


def lag_smooth(
    col: str, group_keys: Sequence[str], order_key: str, lags: Sequence[int]
) -> Column:
    """``coalesce(lag(col, lags[0]), lag(col, lags[1]), ..., col)``.

    ``lags=[1]`` is the annual previous-period fallback (W1);
    ``lags=[4, 1]`` is the quarterly same-quarter-last-year-else-
    previous-quarter fallback (W2).
    """
    w = group_window(group_keys, order_key)
    candidates = [F.lag(F.col(col), n).over(w) for n in lags]
    return F.coalesce(*candidates, F.col(col))


def trailing_avg_2(
    col: str, group_keys: Sequence[str], order_key: str, lags: Sequence[int] = (1,)
) -> Column:
    """(current + best-available-previous) / 2 — the reference's
    ``avg_*`` denominator (src/finlogic/indicators.py:47-54)."""
    return (F.col(col) + lag_smooth(col, group_keys, order_key, lags)) / F.lit(2.0)


def ewma(
    col: str,
    group_keys: Sequence[str],
    order_keys: Sequence[str],
    alpha: float = 0.5,
    horizon: int = 4,
) -> Column:
    """Finite-horizon exponentially weighted moving average: over the
    current row and its ``horizon - 1`` predecessors in the group,
    weights α(1−α)^k, renormalized over the lags that exist (early rows
    in a group average over fewer points rather than leaking a bias
    toward zero).

    Truncating the classically-infinite EWMA at a fixed horizon is what
    makes it an ENGINE-friendly operator: every term is a lag() over
    one shared window spec (one shuffle on the group keys, one
    in-partition sort, ``horizon`` lag columns riding the same sorted
    run) instead of a sequential scan that can't parallelize across a
    partition. With α = 0.5 the dropped tail is < (1−α)^horizon ≈ 6% of
    the weight at the default, and the weights are exact binary
    doubles.

    Determinism: ``order_keys`` must be a TOTAL order within each group
    (include a unique id as tiebreak) — same hazard as every window op
    in this module. The weighted sum is a fixed left-to-right
    expression tree, so any engine evaluating the same tree gets the
    identical double.
    """
    w = Window.partitionBy(*group_keys).orderBy(
        *[F.col(k).asc() for k in order_keys]
    )
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k in range(horizon):
        wt = alpha * (1.0 - alpha) ** k
        xk = F.col(col) if k == 0 else F.lag(F.col(col), k).over(w)
        num = num + F.when(xk.isNotNull(), xk * F.lit(wt)).otherwise(F.lit(0.0))
        den = den + F.when(xk.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    return num / den


def time_weighted_avg(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak_cols: Sequence[str] = (),
    bucket: str = "day",
    bucket_col: str | None = None,
) -> DataFrame:
    """Step-function TWAP over irregularly sampled values: within each
    (keys..., bucket) the value holds from its own timestamp until the
    next sample (the last holds to bucket end), and the result is the
    time integral divided by covered duration — the standard metric for
    "average price/level while it was in effect" over samples that
    arrive whenever they arrive (a plain AVG overweights bursts of
    samples and underweights quiet stretches).

    Shape: ONE window (lead over the in-bucket order gives each
    sample's holding duration) + ONE partial-aggregatable groupBy — no
    joins, no second pass; the shuffle carries the group keys only.

    ``bucket_col``: the layout lever. By default the bucket is the
    derived expression date_trunc(bucket, ts) — opaque to the planner,
    so the window always pays one hash exchange + sort. A table
    materialized with the truncated timestamp as a STORED column and
    written bucketed+sorted by (keys..., bucket_col[, ts, tiebreaks])
    (sources.write_bucketed) lets the planner prove the scan already
    satisfies both the window's partitioning (bucket HashPartitioning
    on a subset of the partition keys) and its ordering (single-file
    buckets carry their sortBy order; reporting it needs
    spark.sql.legacy.bucketedTableScan.outputOrdering=true, off by
    default only because multi-file buckets would need a merge) — the
    ENTIRE plan runs exchange-free and sort-free off the layout
    (pinned in tests/test_storage.py). The caller promises bucket_col
    == date_trunc(bucket, ts_col); ``bucket`` still names the unit
    for the end-of-bucket duration of each group's last sample.

    Determinism: the integral is Σ value_cents·dur_seconds — both exact
    integers, so aggregation order can't perturb the sum (same
    discipline as trend_stats). The bound that makes it exact —
    |cents| < 2³¹ (values within ±$21M) — is ENFORCED, not assumed:
    products go through try_multiply (no opaque ANSI
    ARITHMETIC_OVERFLOW, no silent wrap with ANSI off) and max|cents|
    rides the aggregate; a violating group raises with the bound in
    the message. Under that bound no sum can wrap: durations are
    non-negative and Σdur per group ≤ the bucket length (≤ ~2.7M s
    even for month buckets), so |Σ cents·dur| < 2³¹·2²² < 2⁵³.
    ``tiebreak_cols`` must complete a total order for equal timestamps
    (a tied sample gets duration 0 — which sample that is must not
    depend on partitioning).

    Returns (keys..., bucket_start, n, twap).
    """
    v = F.col(value_col)
    # Explicit projection BEFORE the window: the shuffle+sort is the
    # whole cost of this operator, and it must carry (keys, ts,
    # tiebreak, value) — not every wide column the caller's frame
    # happens to have. Column pruning below a Window is not a rewrite
    # to gamble 5x shuffle bytes on.
    filtered = df.filter(v.isNotNull() & ~F.isnan(v))
    if bucket_col is None:
        base = filtered.select(
            *key_cols, ts_col, *tiebreak_cols, value_col
        ).withColumn("__bkt", F.date_trunc(bucket, F.col(ts_col)))
    else:
        # the stored column IS the attribute the table is bucketed on —
        # aliasing (not recomputing) preserves the planner's ability to
        # match it against the scan's output partitioning/ordering
        base = filtered.select(
            *key_cols,
            F.col(bucket_col).alias("__bkt"),
            ts_col,
            *tiebreak_cols,
            value_col,
        )
    w = Window.partitionBy(*key_cols, "__bkt").orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]
    )
    bucket_end = F.col("__bkt") + F.expr(f"INTERVAL 1 {bucket}")
    dur = F.unix_timestamp(
        F.coalesce(F.lead(F.col(ts_col)).over(w), bucket_end)
    ) - F.unix_timestamp(F.col(ts_col))
    vq = F.floor(v * F.lit(100.0) + F.lit(0.5)).cast("long")
    agg = (
        base.withColumn("__wv", F.try_multiply(vq, dur))
        .withColumn("__dur", dur)
        .withColumn("__avq", F.abs(vq))
        .groupBy(*key_cols, F.col("__bkt").alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__wv").alias("__sw"),
            F.sum("__dur").alias("__sd"),
            F.max("__avq").alias("__max_avq"),
        )
    )
    # |cents| >= 2^31 voids the exactness contract — raise with the fix
    # rather than return a wrapped (ANSI off) or opaquely failed (ANSI
    # on) integral; try_multiply above keeps the violating row itself
    # from throwing before this guard can name the bound.
    guarded_sw = F.when(
        F.col("__max_avq") >= F.lit(1 << 31).cast("long"),
        F.raise_error(
            F.lit(
                "time_weighted_avg exact-integral bound exceeded: "
                "quantized |value| cents >= 2^31 (values beyond "
                "+/-$21M); rescale the value column before the TWAP"
            )
        ).cast("long"),
    ).otherwise(F.col("__sw"))
    return agg.select(
        *key_cols,
        "bucket_start",
        "n",
        (guarded_sw / (F.lit(100.0) * F.col("__sd"))).alias("twap"),
    )
