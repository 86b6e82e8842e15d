"""Snapshot/table diff (CDC derivation): classify every key as
insert / update / delete / unchanged between two versions of a keyed
table. The batch companion to the streaming MERGE upsert sink
(`finlogic_spark.streaming.run_upsert_sink`): diff two of its
snapshot versions and you have the changeset that replays one into
the other — the standard table-format "change data feed" shape
(engine-scope addition; no counterpart in the reference, whose tables
are single immutable downloads).

Scale: ONE full-outer shuffle join on the key columns. Both sides
shuffle-partition on identical keys, so with bucketed/pre-partitioned
snapshots (as the upsert sink writes them) the exchange is avoidable
entirely; there is no per-column pass — all compare columns ride the
same join row. Output cardinality = changed keys only, typically a
small fraction of either side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Rows that changed between ``old`` and ``new``.

    Returns key columns + ``change_type`` ('insert' | 'delete' |
    'update' [| 'unchanged']) + old_/new_ prefixed compare columns.
    Comparison is null-safe per column (NULL == NULL holds, NULL vs
    value is a change) — plain equality would silently classify
    NULL-bearing rows as updates forever.
    """
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = None
    for k in keys:
        c = F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}"))
        cond = c if cond is None else (cond & c)
    joined = o.join(n, cond, "full_outer")

    same = None
    for c in compare_cols:
        eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("update"))
    )
    out = joined.select(
        *[
            F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
            for k in keys
        ],
        change.alias("change_type"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out
