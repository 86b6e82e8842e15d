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
