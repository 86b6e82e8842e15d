"""Z-order (Morton) clustering (engine-scope addition): multi-dimension
data skipping for scans that filter on more than one column.

Partitioning/sorting by a single key gives parquet min/max pruning on
that key only; interleaving the bits of several keys into one Morton
value and range-partitioning + sorting by it keeps files tight in
EVERY interleaved dimension at once — a filter on any subset of the
z-ordered columns skips most files/row-groups. This is the same layout
idea behind Delta's OPTIMIZE ZORDER BY, built here from plain
DataFrame ops: z_value (pure bit expressions, codegen-friendly) →
repartitionByRange → sortWithinPartitions → write.

Scale notes: the z-value is a narrow per-row map; the only exchange is
the range partitioner (which a rewrite job needs anyway). Column
domains must be mapped to fixed-width non-negative ints first —
``bucketize`` handles doubles/longs via clamped linear bucketing; for
skewed domains feed it a rank/percentile instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize(
    col: Column, lo: float, hi: float, bits: int = 16
) -> Column:
    """Clamped linear map of a numeric column onto [0, 2^bits): the
    fixed-width integer grid z-interleaving needs. Out-of-range values
    clamp to the edge buckets (they stay skippable: a file of clamped
    rows still carries tight min/max on the other dimensions)."""
    n = (1 << bits) - 1
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        / F.lit(float(hi) - float(lo))
        * F.lit(float(n + 1))
    )
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(n)).cast("long")


def z_value(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton interleave of ``len(cols)`` non-negative ints of
    ``bits`` bits each: output bit (b * n + i) = bit b of cols[i].
    Pure shift/mask arithmetic — whole-stage codegen, no UDF.
    n_cols * bits must fit a long (<= 63)."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a long's 63 value bits")
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            out = out + (
                F.shiftleft(
                    F.shiftright(c.cast("long"), b) % 2, b * n + i
                )
            )
    return out


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[Column],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Rewrite ``df`` z-ordered on ``cols``: range-partition by the
    Morton value (equal-size files via range sampling), sort within
    each file, drop the helper column on write. Readers filtering any
    z-ordered dimension then prune files/row-groups on parquet min/max
    stats."""
    z = df.withColumn("__z", z_value(cols, bits))
    parted = (
        z.repartitionByRange(num_files, "__z")
        if num_files
        else z.repartitionByRange("__z")
    )
    parted.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)
