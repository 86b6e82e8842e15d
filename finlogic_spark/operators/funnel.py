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


def retention_cohorts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort retention matrix: (cohort_week, week_offset,
    n_active, cohort_size, retention) — the product-analytics staple
    (what fraction of each signup cohort is still active N weeks on).

    Shape: distinct (user, week) presence first (collapses event
    volume to at most users x weeks BEFORE anything heavier runs),
    cohort = min week per user, one user-keyed join back (both sides
    already partitioned by user from their aggregates), then a count-
    distinct over (cohort, offset) — every stage partial-aggregates.
    Nothing scales with raw event count past the first dedup.
    """
    wk = F.date_trunc("week", F.col(ts_col))
    ua = events.select(F.col(user_col).alias("u"), wk.alias("w")).distinct()
    cohort = ua.groupBy("u").agg(F.min("w").alias("c"))
    j = ua.join(cohort, "u")
    ret = (
        j.groupBy(
            F.col("c").alias("cohort_week"),
            (F.datediff(F.col("w"), F.col("c")) / 7).cast("int")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("u").alias("n_active"))
    )
    size = cohort.groupBy(F.col("c").alias("cohort_week")).agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return ret.join(F.broadcast(size), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        (
            F.floor(
                F.col("n_active") / F.col("cohort_size") * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("retention"),
    )


def transition_matrix(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    order_col: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: (from_state, to_state, n, p) with p = n / out-degree of
    from_state — behavioral-flow analysis (what users do next).

    One window pass (lead over the key partition, deterministic via
    the order_col tiebreak) + one count aggregate + a broadcast of the
    per-state totals. The window shuffle is on the sequence key; skew
    equals the busiest single key's history.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col), F.col(order_col)
    )
    pairs = (
        events.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_state").agg(F.sum("n").alias("total"))
    return pairs.join(F.broadcast(totals), "from_state").select(
        "from_state",
        "to_state",
        "n",
        (
            F.floor(F.col("n") / F.col("total") * F.lit(1e6) + F.lit(0.5))
            / F.lit(1e6)
        ).alias("p"),
    )
