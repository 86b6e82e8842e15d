"""Incremental aggregate maintenance: equivalence with recompute,
retractions, full-retraction key drop, new-key inserts."""

from __future__ import annotations

from pyspark.sql import functions as F

from finlogic_spark.operators.incremental import aggregate_cents, incremental_apply


def _rows(spark, data):
    return spark.createDataFrame(data, "k long, value double, weight int")


def test_apply_equals_recompute(spark):
    old = _rows(spark, [(1, 1.11, 1), (1, 2.22, 1), (2, 5.0, 1)])
    late = _rows(spark, [(1, 3.33, 1), (3, 7.77, 1)])
    snap = aggregate_cents(old, ["k"], ["value"])
    inc = incremental_apply(snap, late, ["k"], ["value"])
    full = aggregate_cents(old.unionByName(late), ["k"], ["value"])
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))


def test_retraction_and_key_drop(spark):
    old = _rows(spark, [(1, 1.5, 1), (2, 2.5, 1)])
    snap = aggregate_cents(old, ["k"], ["value"])
    # retract key 2 entirely; partially retract nothing else
    late = _rows(spark, [(2, 2.5, -1)])
    inc = {r["k"]: r for r in incremental_apply(
        snap, late, ["k"], ["value"], weight_col="weight").collect()}
    assert sorted(inc) == [1]
    assert inc[1]["n_rows"] == 1 and inc[1]["value_cents"] == 150


def test_weighted_update_in_place(spark):
    # CDC update = retract old image + insert new image, one changeset
    old = _rows(spark, [(1, 10.0, 1)])
    snap = aggregate_cents(old, ["k"], ["value"])
    late = _rows(spark, [(1, 10.0, -1), (1, 12.0, 1)])
    inc = incremental_apply(snap, late, ["k"], ["value"], weight_col="weight")
    r = inc.collect()[0]
    assert r["n_rows"] == 1 and r["value_cents"] == 1200


def test_null_values_count_but_add_zero(spark):
    old = _rows(spark, [(1, None, 1)])
    snap = aggregate_cents(old, ["k"], ["value"])
    r = snap.collect()[0]
    assert r["n_rows"] == 1 and r["value_cents"] == 0
