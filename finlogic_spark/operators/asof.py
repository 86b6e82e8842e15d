"""As-of join (engine-scope addition — absent from the reference,
SURVEY.md §2.3; needed for the `events` time-series surface).

For each left row, attach the latest right row whose time key is <= the
left's, within the same equi-key. Implemented as the union-merge idiom:
tag both sides, union on (key, time), and carry right-side values forward
with ``last(..., ignorenulls=True)`` over an ordered window.

Scale: ONE shuffle on the equi-key + in-partition sort — the same cost
as a sort-merge join, with no range-explosion. A naive
``left.ts >= right.ts`` theta-join would be O(n·m) per key; this is
O((n+m) log(n+m)) per key and streams through Tungsten sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__fls_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: ``left`` gains the most recent ``right_cols``
    at or before its ``on`` value, matched per ``by`` keys.

    Right-side time column lands as ``{on}{suffix}`` so callers can
    compute staleness. Left rows with no prior right row keep nulls.

    ``tiebreak`` names a right-side column that orders right rows
    sharing the same (by, on) value — without it the winner among
    exact-time ties is whichever row the sort left last (plan- and
    partitioning-dependent). With it, the HIGHEST tiebreak value wins
    deterministically.
    """
    by = list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*by, on)]
    carried = [*right_cols, on]

    left_cols = left.columns
    lhs = left.withColumn(_SIDE, F.lit(1))
    for c in carried:
        lhs = lhs.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))
    rhs_extra = []
    if tiebreak is not None:
        lhs = lhs.withColumn(
            "__tb", F.lit(None).cast(right.schema[tiebreak].dataType)
        )
        rhs_extra = [F.col(tiebreak).alias("__tb")]
    rhs = right.select(
        *by,
        F.col(on),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"__r_{c}") for c in carried],
        *rhs_extra,
    )
    for c in left_cols:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = lhs.unionByName(rhs.select(lhs.columns))
    # Right rows sort before left rows at equal timestamps (side 0 < 1),
    # so an exact-tie right row IS visible to the left row — "at or before".
    # Among tied right rows, __tb asc puts the highest tiebreak last →
    # last(ignorenulls) picks it. Left rows carry null __tb; they only
    # read window state, so their relative order is immaterial.
    order = [F.col(on).asc(), F.col(_SIDE).asc()]
    if tiebreak is not None:
        order.append(F.col("__tb").asc_nulls_first())
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in carried:
        out_name = f"{c}{suffix}" if c in left_cols else c
        unioned = unioned.withColumn(
            out_name, F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        )
    return unioned.filter(F.col(_SIDE) == 1).select(
        *left_cols,
        *[F.col(c if c not in left_cols else f"{c}{suffix}") for c in right_cols],
        F.col(f"{on}{suffix}"),
    )
