"""Merge / upsert (engine-scope addition): the batch MERGE INTO
primitive every incremental pipeline needs — apply a changeset to a
snapshot keyed by a business key.

Spark-first shape: MERGE is a full-outer join on the key plus
per-column coalesce — one shuffle on the merge key (or zero, if both
sides are bucketed/pre-partitioned on it), no driver-side row handling.
On a lakehouse table format (Delta/Iceberg/Hudi) the same call maps to
the native MERGE with file-level pruning; this operator is the
format-agnostic plan it would compile to.

Semantics (matched = key present in both):
- matched        -> updated columns from the changeset (per-column
  coalesce, so a null changeset column keeps the target value —
  partial updates are first-class)
- not matched    -> insert the changeset row
- target only    -> keep the target row; with ``delete_col`` set, a
  truthy flag on a matched changeset row deletes instead of updates.

The changeset must be unique per key (enforce upstream with
``operators.dedup.keep_last`` — CDC streams carry multiple versions).

Order-robust tier: with ``order_cols`` set, a matched change only wins
when its order tuple is >= the target's — an out-of-order (stale) CDC
row, including a stale delete, is a no-op instead of clobbering newer
state. This is what makes a MERGE sink safe under source reordering
(file mtime ties, replayed partitions) without any global ordering.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Full-outer merge of ``changes`` into ``target`` on ``keys``.

    Returns the merged snapshot with target's column order. Non-key
    columns present in only one side pass through from that side.
    With ``order_cols`` (columns present on BOTH sides), a matched
    change is applied only if its order tuple >= the target's — stale
    rows arriving late are ignored (updates AND deletes).
    """
    keys = list(keys)
    t_cols = [c for c in target.columns if c not in keys]
    c_cols = [c for c in changes.columns if c not in keys and c != delete_col]

    t = target.select(
        *[F.col(k).alias(f"__tk_{k}") for k in keys],
        *[F.col(c).alias(f"__t_{c}") for c in t_cols],
    )
    c = changes.select(
        *[F.col(k).alias(f"__ck_{k}") for k in keys],
        *[F.col(col).alias(f"__c_{col}") for col in c_cols],
        *(
            [F.coalesce(F.col(delete_col), F.lit(False)).alias("__del")]
            if delete_col
            else [F.lit(False).alias("__del")]
        ),
    )
    cond = None
    for k in keys:
        eq = F.col(f"__tk_{k}") == F.col(f"__ck_{k}")
        cond = eq if cond is None else cond & eq
    joined = t.join(c, cond, "full_outer")

    matched_change = F.col(f"__ck_{keys[0]}").isNotNull()
    if order_cols:
        # Change wins on an insert (no target row) or when its order
        # tuple is >= the target's; a stale matched change is a no-op.
        t_ord = F.struct(*[F.col(f"__t_{c}") for c in order_cols])
        c_ord = F.struct(*[F.col(f"__c_{c}") for c in order_cols])
        change_wins = matched_change & (
            F.col(f"__tk_{keys[0]}").isNull() | (c_ord >= t_ord)
        )
    else:
        change_wins = matched_change
    # delete: matched + flag (+ not stale) -> drop the row entirely
    joined = joined.filter(~(change_wins & F.col("__del")))

    out_cols = [
        F.coalesce(F.col(f"__tk_{k}"), F.col(f"__ck_{k}")).alias(k) for k in keys
    ]
    for col in dict.fromkeys([*t_cols, *c_cols]):
        has_t, has_c = col in t_cols, col in c_cols
        if has_t and has_c:
            # changeset wins where it has a value; null changeset cell
            # (or unmatched target row) keeps the target value
            out_cols.append(
                F.when(
                    change_wins,
                    F.coalesce(F.col(f"__c_{col}"), F.col(f"__t_{col}")),
                )
                .otherwise(F.col(f"__t_{col}"))
                .alias(col)
            )
        elif has_t:
            out_cols.append(F.col(f"__t_{col}").alias(col))
        else:
            out_cols.append(F.col(f"__c_{col}").alias(col))
    return joined.select(*out_cols)
