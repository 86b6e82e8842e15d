"""Top-k (reference: sort desc + head(n), src/finlogic/data.py:197-198).

``orderBy(...).limit(k)`` lets Catalyst plan ``TakeOrderedAndProject``:
each task keeps a k-row heap, the driver merges per-partition heaps —
no full sort, no full shuffle. This is the plan that survives 100 TB;
verify with ``.explain`` that TakeOrderedAndProject appears.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def top_k(
    df: DataFrame,
    order_by: str | Column | Sequence[Column],
    k: int,
    desc: bool = True,
) -> DataFrame:
    if isinstance(order_by, str):
        cols = [F.col(order_by).desc() if desc else F.col(order_by).asc()]
    elif isinstance(order_by, Column):
        cols = [order_by.desc() if desc else order_by.asc()]
    else:
        cols = list(order_by)
    return df.orderBy(*cols).limit(k)


def pareto_frontier_2d(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """2-D skyline (maxima frontier): the distinct (x, y) points not
    dominated by any other point — q dominates p when q.x ≥ p.x AND
    q.y ≥ p.y with at least one strict. The classic "best trade-off"
    query (freshest date at the highest price, cheapest at the fastest,
    ...), returned sorted by x ascending / y descending.

    Shape: dominance within one x is a plain partial-aggregatable
    ``max(y) GROUP BY x`` — that single shuffle is the only one that
    sees data-sized input, and it compacts the table to |distinct x|
    rows. Cross-x dominance over the compacted set is then one running
    max over x DESC (a point survives iff its y strictly exceeds every
    y at larger x). That window is single-partition, which is exactly
    right AFTER compaction: for date/bucket-grained x the compacted set
    is thousands of rows at any corpus size; for continuous x,
    pre-bucket x (the skyline of bucket maxima contains the true
    frontier's buckets) or accept the sort — the frontier itself is
    what's fundamentally sequential here.

    Null keys are excluded up front: under SQL three-valued comparison
    a null x or y neither dominates nor is dominated (a NOT-EXISTS
    formulation silently keeps such rows), while letting a null-x group
    sort last under ``x DESC`` would wrongly test real points against
    its running max. Dropping nulls makes the semantics explicit
    instead of sort-order-dependent.
    """
    from pyspark.sql import Window

    compact = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(F.col(x_col).alias("x"))
        .agg(F.max(F.col(y_col)).alias("y"))
    )
    w = (
        Window.orderBy(F.col("x").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        compact.withColumn("__cm", F.max("y").over(w))
        .filter(F.col("__cm").isNull() | (F.col("y") > F.col("__cm")))
        .select(F.col("x").alias(x_col), F.col("y").alias(y_col))
        .orderBy(x_col)
    )
