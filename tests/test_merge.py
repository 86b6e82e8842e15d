"""merge_upsert tests: update/insert/delete semantics, partial
updates, multi-key merge, pass-through columns."""

from __future__ import annotations

from pyspark.sql import functions as F

from finlogic_spark.operators.merge import merge_upsert


def _snap(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, status string, price double",
    )


def test_update_insert_delete(spark):
    changes = spark.createDataFrame(
        [
            (1, "a2", None, False),   # update status, keep price (null cell)
            (3, None, None, True),    # delete
            (9, "new", 90.0, False),  # insert
        ],
        "k int, status string, price double, is_deleted boolean",
    )
    out = {
        r["k"]: r
        for r in merge_upsert(_snap(spark), changes, ["k"], "is_deleted").collect()
    }
    assert sorted(out) == [1, 2, 9]
    assert out[1]["status"] == "a2" and out[1]["price"] == 10.0
    assert out[2]["status"] == "b" and out[2]["price"] == 20.0  # untouched
    assert out[9]["status"] == "new" and out[9]["price"] == 90.0


def test_no_delete_col_means_pure_upsert(spark):
    changes = spark.createDataFrame([(2, "B", 2.0)], "k int, status string, price double")
    out = {r["k"]: r for r in merge_upsert(_snap(spark), changes, ["k"]).collect()}
    assert sorted(out) == [1, 2, 3]
    assert out[2]["status"] == "B" and out[2]["price"] == 2.0


def test_multi_key_and_one_sided_columns(spark):
    target = spark.createDataFrame(
        [(1, "x", 5.0), (1, "y", 6.0)], "a int, b string, t_only double"
    )
    changes = spark.createDataFrame(
        [(1, "y", "note"), (2, "z", "ins")], "a int, b string, c_only string"
    )
    rows = {
        (r["a"], r["b"]): r
        for r in merge_upsert(target, changes, ["a", "b"]).collect()
    }
    assert sorted(rows) == [(1, "x"), (1, "y"), (2, "z")]
    assert rows[(1, "x")]["t_only"] == 5.0 and rows[(1, "x")]["c_only"] is None
    assert rows[(1, "y")]["t_only"] == 6.0 and rows[(1, "y")]["c_only"] == "note"
    assert rows[(2, "z")]["t_only"] is None and rows[(2, "z")]["c_only"] == "ins"


def test_single_shuffle_plan(spark):
    # MERGE compiles to one join: exactly one Exchange per side, no
    # extra repartition stages.
    out = merge_upsert(_snap(spark), _snap(spark), ["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2
