"""Skew-mitigation joins (engine-scope addition; SURVEY.md §4.2 notes
hot keys — PETROBRAS-sized companies in `financials` — as the skew
hazard at 100 TB).

AQE's skew-join splitting (on by default in the session factory) handles
moderate skew at runtime by splitting oversized partitions. It cannot
help when a single KEY is hot — all rows for one key hash to one
partition no matter how it is split further. Salting fixes that case:

- fact side: append a random salt 0..S-1 to the join key, spreading one
  hot key over S partitions;
- dim side: replicate each row S times (one per salt value) so every
  fact row still finds its match.

Cost: dim side grows S× (keep it the SMALL side), fact side gets one
extra narrow projection. Correctness: inner/left equi-join results are
identical to the unsalted join — the salt is dropped after joining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to a hot fact-side key: salt the fact rows,
    replicate the dim rows per salt value, join on (keys + salt).

    ``dim`` must be the small side (it is replicated ``num_salts``×).
    ``how`` supports "inner" and "left" (fact-preserving joins; salting
    a right/full join would duplicate unmatched dim rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salted_fact = fact.withColumn(
        SALT_COL, (F.rand(seed=7) * num_salts).cast("int")
    )
    exploded_dim = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return salted_fact.join(exploded_dim, keys + [SALT_COL], how).drop(SALT_COL)
