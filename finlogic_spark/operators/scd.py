"""Slowly-changing-dimension (type 2) build (engine-scope addition):
collapse a keyed change stream into validity intervals — the dimension
shape every warehouse join-to-history needs.

Spark-first: one window pass per key ordered by (ts, tiebreak) — lag
marks change points, a running count of change points numbers the
interval, and a grouped min/max + lead closes it. Change detection and
interval numbering shuffle ONCE on the key; everything else rides the
same partitioning (Catalyst reuses the exchange across same-keyed
windows and the grouped aggregation).

Scale notes: per-key state is a window frame, not a collected list —
this streams through a 100 TB change log partition by partition. Skewed
keys (one entity with millions of changes) are the same hot-key story
as keep-last: AQE skew-join handles read-side, salting the window key
handles extreme cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    changes: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Validity intervals per key from a change stream.

    Consecutive rows with the same ``state_col`` value merge into one
    interval; a row opens a new interval iff its state differs from the
    previous row's (per key, ordered by ``ts_col`` then ``tiebreak_col``).
    Returns (key, state, valid_from, valid_to, is_current): valid_to is
    the next interval's start (half-open [from, to)), null while current.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    carried = [key_col, state_col, ts_col] + (
        [tiebreak_col] if tiebreak_col is not None else []
    )
    marked = changes.select(*carried).withColumn(
        "__new",
        F.when(
            F.lag(F.col(state_col)).over(w).eqNullSafe(F.col(state_col)), 0
        ).otherwise(1),
    )
    numbered = marked.withColumn(
        "__iv",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    intervals = numbered.groupBy(key_col, "__iv").agg(
        F.first(state_col).alias(state_col),
        F.min(ts_col).alias("valid_from"),
    )
    w2 = Window.partitionBy(key_col).orderBy(F.col("__iv").asc())
    return (
        intervals.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(key_col, state_col, "valid_from", "valid_to", "is_current")
    )
