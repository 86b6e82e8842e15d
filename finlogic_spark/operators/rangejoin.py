"""Interval (range) join (engine-scope addition — absent from the
reference, SURVEY.md §2.3): pair each left row with every right row of
the same key whose time/number lies in [left.on + lower, left.on +
upper]. The time-window sibling of the as-of join (operators/asof.py):
as-of keeps the latest prior right row, interval keeps ALL right rows
in a window.

Scale design — bucketized equi-join, never a theta join:
- A naive ``l.ts BETWEEN r.ts - w AND r.ts`` condition forces Spark
  into BroadcastNestedLoopJoin (O(n·m) per key) — unusable at scale.
- Instead both sides are bucketed by ``floor(key / width)`` where
  width = upper - lower. A right row can only match left rows whose
  window overlaps its bucket, and because the window span EQUALS the
  bucket width, each left row's window touches at most TWO buckets.
  The left side emits ≤2 bucket rows, the join is a plain hash
  equi-join on (by, bucket), and an exact range filter confirms.
- Candidates per left row are bounded by rows-per-bucket (data density
  × window width), independent of corpus size — the same guarantee the
  LSH tiers give the dedup pipeline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    lower: int,
    upper: int,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Inner interval join: rows (l, r) with equal ``by`` keys and
    ``l.on + lower <= r.on <= l.on + upper``.

    ``lower``/``upper`` are in the column's native numeric unit —
    MICROSECONDS for timestamp columns (timestamps are compared at
    Spark's native microsecond precision), the raw value otherwise.
    E.g. the last-30-minutes window is ``lower=-1800_000_000,
    upper=0``. Right-side columns keep their names, suffixed when they
    collide with left names; the right time column lands as
    ``{on}{suffix}``.
    """
    by = list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*by, on)]
    width = int(upper) - int(lower)
    if width <= 0:
        raise ValueError(f"upper ({upper}) must exceed lower ({lower})")

    def numeric(df: DataFrame):
        if dict(df.dtypes)[on].startswith("timestamp"):
            # cast handles TIMESTAMP_NTZ sources (unix_micros only
            # accepts TIMESTAMP); differences are tz-invariant.
            return F.unix_micros(F.col(on).cast("timestamp"))
        return F.col(on).cast("long")

    left_cols = left.columns
    lhs = left.withColumn("__lk", numeric(left)).withColumn(
        "__b",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((F.col("__lk") + F.lit(int(lower))) / width),
                    F.floor((F.col("__lk") + F.lit(int(upper))) / width),
                )
            )
        ),
    )
    out_names = {c: (f"{c}{suffix}" if c in left_cols else c) for c in right_cols}
    rhs = (
        right.withColumn("__rk", numeric(right))
        .withColumn("__b", F.floor(F.col("__rk") / width))
        .select(
            *by,
            "__rk",
            "__b",
            F.col(on).alias(f"{on}{suffix}"),
            *[F.col(c).alias(out_names[c]) for c in right_cols],
        )
    )
    return (
        lhs.join(rhs, [*by, "__b"])
        .filter(
            (F.col("__rk") >= F.col("__lk") + F.lit(int(lower)))
            & (F.col("__rk") <= F.col("__lk") + F.lit(int(upper)))
        )
        .select(
            *left_cols,
            *[F.col(out_names[c]) for c in right_cols],
            F.col(f"{on}{suffix}"),
        )
    )
