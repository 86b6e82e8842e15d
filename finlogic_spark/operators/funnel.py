"""Ordered funnel analysis (engine-scope addition): how far does each
user get through a sequence of steps, where step i only counts if it
happens strictly AFTER the user's qualifying time for step i-1.

Spark-first shape: ONE groupBy(user) — the first step needs only a
conditional min; every later step collects that step's event times as a
sorted array and picks the first element after the previous step's
qualifying time with ``filter(...)[0]`` — sequential semantics without
sequential shuffles. Total cost: one hash shuffle of (user, per-step
time arrays), then pure array expressions.

Scale notes: per-user state is that user's per-step event times — the
same bound a sessionization or stateful-stream profile carries. For
pathological users (bots with millions of step events) cap the arrays
upstream with a per-(user, step) time window or ``slice`` after
sort; the funnel only ever needs times that could follow t_{i-1}.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per user: t1..tN, the qualifying time of each funnel step
    (null once the user falls out — later steps are then null too).

    t1 = min ts of step 1; t_i = first step-i ts strictly after t_{i-1}.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    first = steps[0]
    aggs = [
        F.min(F.when(F.col(type_col) == first, F.col(ts_col))).alias("t1")
    ]
    for i, step in enumerate(steps[1:], start=2):
        aggs.append(
            F.sort_array(
                F.collect_list(F.when(F.col(type_col) == step, F.col(ts_col)))
            ).alias(f"__l{i}")
        )
    g = events.groupBy(user_col).agg(*aggs)
    for i in range(2, len(steps) + 1):
        prev = F.col(f"t{i - 1}")
        g = g.withColumn(
            f"t{i}",
            F.when(
                prev.isNotNull(),
                # try_element_at: null (not an ANSI error) when no
                # step-i event follows t_{i-1}
                F.try_element_at(
                    F.filter(F.col(f"__l{i}"), lambda x: x > prev), F.lit(1)
                ),
            ),
        )
    return g.select(user_col, *[f"t{i}" for i in range(1, len(steps) + 1)])


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Funnel summary: one row per step with the user count that reached
    it (in order) and the conversion rate vs step 1, rounded to 6dp
    with the cross-engine floor trick."""
    t = funnel_times(events, steps, user_col, type_col, ts_col)
    aggs = [
        F.count(F.col(f"t{i}")).alias(f"__n{i}") for i in range(1, len(steps) + 1)
    ]
    wide = t.agg(*aggs)
    per_step = [
        wide.select(
            F.lit(i).alias("step"),
            F.lit(step).alias("step_name"),
            F.col(f"__n{i}").alias("n_users"),
            (
                F.floor(
                    F.col(f"__n{i}")
                    / F.greatest(F.col("__n1"), F.lit(1))
                    * 1000000.0
                    + F.lit(0.5)
                )
                / 1000000.0
            ).alias("conversion"),
        )
        for i, step in enumerate(steps, start=1)
    ]
    out = per_step[0]
    for p in per_step[1:]:
        out = out.unionByName(p)
    return out
