"""Blocked fuzzy join (approximate string matching / entity
resolution): candidate pairs come from an EQUI-join on a cheap
blocking key, and the expensive edit-distance predicate runs only
inside blocks. This is the canonical record-linkage layout — the
all-pairs `levenshtein` cross join is O(n²) and never acceptable;
blocking makes the pair count proportional to the sum of squared
block sizes, which a sane blocking key keeps near-linear.

Scale: one shuffle on the blocking key (or zero if the blocker is
broadcastable / both sides are bucketed on it). Skewed blocks are the
failure mode — pick a blocking key with bounded selectivity, or
compose with `operators.skew.salted_join` for hot blocks.

`levenshtein` runs JVM-side (Catalyst built-in), so the filter stays
inside whole-stage codegen; no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_join_blocked(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: Column,
    max_dist: int = 2,
) -> DataFrame:
    """Self fuzzy-join: (id_a < id_b) pairs whose ``text_col`` values
    are within ``max_dist`` edits, considering only pairs that share
    ``block_col``. Returns (id_a, id_b, text_a, text_b, dist)."""
    base = df.select(
        F.col(id_col), F.col(text_col), block_col.alias("__blk")
    )
    a = base.select(
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("text_a"),
        F.col("__blk"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("text_b"),
        F.col("__blk"),
    )
    return (
        a.join(b, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("text_a", "text_b"))
        .filter(F.col("dist") <= max_dist)
        .drop("__blk")
    )
