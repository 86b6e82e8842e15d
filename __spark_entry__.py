"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in ``finlogic_spark.driver_queries`` —
one (Spark callable, DuckDB oracle) pair per SURVEY.md §2 operator
family plus the engine-scope additions (text dedup, similarity
search, events/time-series).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from finlogic_spark import driver_queries as dq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    rank() shape (SURVEY §3.2) — keep-last dedup → broadcast joins →
    filter → top-k → project."""
    return dq.QUERIES["rank_flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(dq.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each query — full coverage.
    Non-SQL-expressible internals are checked property-style:
    ``media_feature_extract`` compares decoded binary metadata against
    the generator formulas plus embedding invariants, and
    ``approx_distinct`` asserts the HLL estimate's error bound next to
    exactly-compared counts. Data-dependent oracles (emb_pca_project
    bakes numpy-derived component literals into its projection SQL) are
    resolved here against the driver's sf=0.01 gate directory."""
    return dq.resolve_oracles()
