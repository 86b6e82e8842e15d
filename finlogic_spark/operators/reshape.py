"""Pivot (long→wide) and unpivot (wide→long).

Reference sites: pivot on acc_code / period_end with ``first`` dupe
resolution + fill_null(0) (src/finlogic/indicators.py:40-44,228-230,
src/finlogic/company.py:323-336); unpivot to (indicator, value)
(src/finlogic/indicators.py:223-224).

Spark notes:
- ``groupBy().pivot(col)`` without an explicit value list runs an extra
  job to collect distinct pivot values. Pass ``values=[...]`` whenever
  the set is known (the 17 indicator codes are; reference
  src/finlogic/indicators.py:4-22) — at 100 TB that skipped job is a
  full extra scan.
- Spark's ``first()`` is order-nondeterministic; the reference makes it
  exact by deduping to one row per logical key *before* pivoting
  (src/finlogic/indicators.py:28-36). Callers must do the same
  (``dedup.keep_last``) — this module intentionally does not hide it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_wide(
    df: DataFrame,
    index: Sequence[str],
    on: str,
    values: str,
    pivot_values: Sequence[str] | None = None,
    agg: str = "first",
    fill: float | None = 0.0,
) -> DataFrame:
    """Long→wide: one output row per ``index``, one column per distinct
    ``on`` value, cells from ``values`` via ``agg``."""
    agg_col = getattr(F, agg)(F.col(values))
    grouped = df.groupBy(*index)
    pivoted = (
        grouped.pivot(on, list(pivot_values)) if pivot_values else grouped.pivot(on)
    ).agg(agg_col)
    if fill is not None:
        # withColumns + coalesce instead of na.fill: pivot values may
        # contain dots ("1.01"), which na.fill misparses as struct paths.
        pivoted = pivoted.withColumns(
            {
                c: F.coalesce(F.col(f"`{c}`"), F.lit(fill))
                for c in pivoted.columns
                if c not in index
            }
        )
    return pivoted


def unpivot_long(
    df: DataFrame,
    index: Sequence[str],
    value_cols: Sequence[str] | None = None,
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide→long via native ``DataFrame.unpivot`` (melt)."""
    if value_cols is None:
        value_cols = [c for c in df.columns if c not in index]
    return df.unpivot(list(index), list(value_cols), var_name, value_name)
