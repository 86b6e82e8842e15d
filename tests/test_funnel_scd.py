"""Funnel and SCD2 tests: ordering semantics (out-of-order steps don't
count), fall-out propagation, interval merging, tiebreaks, plan shape
(one shuffle each)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from finlogic_spark.operators.funnel import funnel_counts, funnel_times
from finlogic_spark.operators.scd import scd2_build


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


def _events(spark):
    rows = [
        # u1 completes in order: view@1 click@2 purchase@3
        (1, 1, "view", _ts(1)), (2, 1, "click", _ts(2)), (3, 1, "purchase", _ts(3)),
        # u2 clicks BEFORE viewing: click@1 view@2 -> stops at view
        (4, 2, "click", _ts(1)), (5, 2, "view", _ts(2)),
        # u3 views only
        (6, 3, "view", _ts(5)),
        # u4 never views (purchase alone counts for nothing)
        (7, 4, "purchase", _ts(1)),
        # u5: view@1, click@0 ignored, click@4 counts, purchase@2 ignored
        (8, 5, "view", _ts(1)), (9, 5, "click", _ts(0)),
        (10, 5, "click", _ts(4)), (11, 5, "purchase", _ts(2)),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )


def test_funnel_ordering_semantics(spark):
    t = {
        r["user_id"]: r
        for r in funnel_times(_events(spark), ["view", "click", "purchase"]).collect()
    }
    assert t[1]["t1"] and t[1]["t2"] and t[1]["t3"]
    # u2's click precedes the view: not counted
    assert t[2]["t1"] == _ts(2) and t[2]["t2"] is None and t[2]["t3"] is None
    assert t[3]["t2"] is None
    # u4 never entered the funnel
    assert t[4]["t1"] is None and t[4]["t3"] is None
    # u5: click@0 < view@1 ignored; purchase@2 < click@4 ignored
    assert t[5]["t2"] == _ts(4) and t[5]["t3"] is None


def test_funnel_counts_and_conversion(spark):
    rows = {r["step_name"]: r for r in funnel_counts(
        _events(spark), ["view", "click", "purchase"]).collect()}
    assert rows["view"]["n_users"] == 4
    assert rows["click"]["n_users"] == 2
    assert rows["purchase"]["n_users"] == 1
    assert rows["view"]["conversion"] == 1.0
    assert rows["click"]["conversion"] == 0.5
    assert rows["purchase"]["conversion"] == 0.25


def test_funnel_requires_two_steps(spark):
    with pytest.raises(ValueError, match="2 steps"):
        funnel_times(_events(spark), ["view"])


def test_funnel_single_shuffle(spark):
    plan = (
        funnel_times(_events(spark), ["view", "click", "purchase"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one grouped aggregation -> at most one exchange
    assert plan.count("Exchange") <= 1


def _changes(spark):
    rows = [
        # u1: a a b a  -> [a,1-2)[b,3-4)[a,4-)
        (1, 1, "a", _ts(1)), (2, 1, "a", _ts(2)),
        (3, 1, "b", _ts(3)), (4, 1, "a", _ts(4)),
        # u2: constant -> one current interval
        (5, 2, "x", _ts(1)), (6, 2, "x", _ts(9)),
        # u3: null state then value; equal-ts rows tiebreak by event_id
        (7, 3, None, _ts(1)), (8, 3, "z", _ts(2)), (9, 3, "y", _ts(2)),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, state string, ts timestamp"
    )


def test_scd2_intervals(spark):
    out = scd2_build(_changes(spark), "user_id", "state", "ts", "event_id")
    by_user = {}
    for r in out.orderBy("user_id", "valid_from").collect():
        by_user.setdefault(r["user_id"], []).append(r)
    u1 = [(r["state"], r["valid_from"], r["valid_to"], r["is_current"]) for r in by_user[1]]
    assert u1 == [
        ("a", _ts(1), _ts(3), False),
        ("b", _ts(3), _ts(4), False),
        ("a", _ts(4), None, True),
    ]
    assert len(by_user[2]) == 1 and by_user[2][0]["is_current"]
    # u3: null state is its own interval; z@2 before y@2 via event_id
    u3 = [(r["state"], r["is_current"]) for r in by_user[3]]
    assert u3 == [(None, False), ("z", False), ("y", True)]


def test_scd2_single_key_shuffle(spark):
    plan = (
        scd2_build(_changes(spark), "user_id", "state", "ts", "event_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # lag window, running sum, grouped agg, and lead window all share
    # the user_id hash partitioning: exactly one exchange on the key
    # (plus possibly one for the local-relation scan)
    assert plan.count("hashpartitioning(user_id") <= 2
