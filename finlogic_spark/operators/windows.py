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
