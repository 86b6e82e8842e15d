"""DISTINCT ON with an order-dependent tiebreak — the reference's
workhorse (``unique(subset, keep="last", maintain_order=True)``, used 5×:
reference src/finlogic/data.py:48-53,124-126,188-190,
src/finlogic/company.py:316-321, src/finlogic/indicators.py:28-36).

Polars keeps whatever physical row order established the tiebreak; Spark
has no physical row order, so the tiebreak MUST be an explicit window
``orderBy`` (SURVEY.md §2.6 hazard). One windowed primitive covers every
reference call site.

Scale note: ``row_number`` over ``Window.partitionBy(keys)`` is a single
hash-shuffle on the dedup keys with in-partition sort — the minimal plan
for order-aware dedup. AQE splits skewed key partitions at runtime.
``dropDuplicates`` would be cheaper (partial-agg, no sort) but keeps an
*arbitrary* row, which silently breaks keep-last semantics — never use it
where a tiebreak matters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__fls_rn"


def _one_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return df.withColumn(_RN, F.row_number().over(w)).filter(F.col(_RN) == 1).drop(_RN)


def keep_last(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """Latest row per ``keys`` under ascending ``order_by``.

    Covers reference sites D1 (latest trade per company), D3 (latest
    report row per company), D4 (latest account name per code), D5
    (one value per logical key before pivot), A8 (latest quarter).
    """
    return _one_per_group(df, keys, [F.col(c).desc() for c in order_by])


def keep_first(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """Earliest row per ``keys`` under ascending ``order_by`` (D2)."""
    return _one_per_group(df, keys, [F.col(c).asc() for c in order_by])


def distinct_on(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column] | None = None,
) -> DataFrame:
    """General DISTINCT ON: arbitrary Column tiebreaks, or plain
    ``distinct()`` when no tiebreak is given (reference D6,
    src/finlogic/company.py:98-108)."""
    if not order_by:
        return df.distinct()
    return _one_per_group(df, keys, list(order_by))
