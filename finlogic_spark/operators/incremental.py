"""Incremental aggregate maintenance (engine-scope addition): keep a
keyed aggregate snapshot current by folding in a changeset instead of
re-reading the 100 TB fact table.

The maintained aggregates are the self-decomposable ones (count, sum —
and anything derivable from them: mean, rate). The changeset may carry
a ``weight`` column: +1 inserts a row's contribution, -1 retracts it
(CDC delete/update-before images). Keys whose maintained count reaches
0 drop out of the snapshot entirely — a fully-retracted key is
indistinguishable from a never-seen one, exactly as a recompute would
have it.

Shape: aggregate the (small) changeset with a map-side partial agg,
full-outer merge with the snapshot on the keys, add. One shuffle of
changeset-aggregate size + one of snapshot size; at scale both sides
live bucketed on the keys and the merge is exchange-free. The
correctness contract — pinned by the driver oracle — is
``apply(agg(old), delta) == agg(old ∪ delta)``.

Sums use the exact-integer-cents trick (``floor(x*100+0.5)`` per row,
integer adds) so incremental and recomputed paths agree bit-for-bit
regardless of aggregation order — with plain double sums the two paths
would drift and the equivalence above would be approximate only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_cents(
    rows: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n_rows",
    weight_col: str | None = None,
) -> DataFrame:
    """Keyed count + exact-cents sums — the snapshot AND changeset
    aggregator (one code path so their arithmetic cannot diverge).
    ``sum_cols`` outputs are integral cents (divide by 100 at the
    presentation edge)."""
    keys = list(keys)
    w = (
        F.coalesce(F.col(weight_col), F.lit(1)).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    aggs = [F.sum(w).alias(count_col)]
    for c in sum_cols:
        cents = F.floor(F.col(c) * 100.0 + F.lit(0.5)).cast("long")
        aggs.append(F.sum(w * F.coalesce(cents, F.lit(0))).alias(f"{c}_cents"))
    return rows.groupBy(*keys).agg(*aggs)


def incremental_apply(
    snapshot: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n_rows",
    weight_col: str | None = None,
) -> DataFrame:
    """Fold raw changeset rows into an ``aggregate_cents`` snapshot.

    Returns the updated snapshot; keys with maintained count 0 are
    dropped (full retraction). Equivalent to re-aggregating the union
    of the snapshot's source rows and the changeset.
    """
    keys = list(keys)
    d = aggregate_cents(delta, keys, sum_cols, count_col, weight_col)
    cent_cols = [f"{c}_cents" for c in sum_cols]
    s = snapshot.select(
        *keys, *[F.col(c).alias(f"__s_{c}") for c in (count_col, *cent_cols)]
    )
    d = d.select(
        *keys, *[F.col(c).alias(f"__d_{c}") for c in (count_col, *cent_cols)]
    )
    merged = s.join(d, keys, "full_outer")
    out = merged.select(
        *keys,
        *[
            (
                F.coalesce(F.col(f"__s_{c}"), F.lit(0))
                + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
            ).alias(c)
            for c in (count_col, *cent_cols)
        ],
    )
    return out.filter(F.col(count_col) > 0)
