"""Structured Streaming tests: the streaming transforms must agree
with their batch twins (whose correctness the DuckDB oracle pins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finlogic_spark import streaming as st
from finlogic_spark.driver_queries import _events


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return _events(spark, sf_dir)


def _drain(spark, stream_df, name, mode="complete"):
    q = st.run_to_memory_sink(stream_df, name, output_mode=mode)
    out = spark.table(name)
    q.stop()
    return out


def test_tumbling_counts_match_batch(spark, sf_dir, events_batch):
    stream = st.read_events_stream(spark, sf_dir)
    got = _drain(spark, st.tumbling_counts(stream), "t_tumbling")
    batch = (
        events_batch.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
    )
    g = {(r["window_start"], r["event_type"]): r["n_events"] for r in got.collect()}
    b = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch.collect()}
    assert g == b


def test_session_counts_match_batch_session_window(spark, sf_dir, events_batch):
    stream = st.read_events_stream(spark, sf_dir)
    got = _drain(spark, st.session_counts(stream), "t_sessions")
    # Batch twin with the same native session_window operator.
    batch = (
        events_batch.groupBy(
            F.session_window("ts", st.SESSION_GAP).alias("s"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("s.start").alias("session_start"), "n_events")
    )
    g = {(r["user_id"], r["session_start"]): r["n_events"] for r in got.collect()}
    b = {(r["user_id"], r["session_start"]): r["n_events"] for r in batch.collect()}
    assert g == b
    # Session count per user must also match the lag-gap batch query.
    from finlogic_spark.driver_queries import QUERIES

    lag_based = {
        r["user_id"]: r["n_sessions"]
        for r in QUERIES["events_sessionize"](spark, str(sf_dir)).collect()
    }
    by_user = {}
    for (uid, _), _n in g.items():
        by_user[uid] = by_user.get(uid, 0) + 1
    assert by_user == lag_based


def test_sliding_window_covers_each_event_k_times(spark, sf_dir):
    stream = st.read_events_stream(spark, sf_dir)
    got = _drain(spark, st.sliding_value_avg(stream), "t_sliding")
    rows = got.collect()
    assert rows
    # 1h window sliding by 15min → every event lands in exactly 4 windows.
    total_events = _events(spark, sf_dir).count()
    assert sum(r["n_events"] for r in rows) == 4 * total_events


def test_dedup_stream_bounded_state(spark, sf_dir, events_batch):
    stream = st.read_events_stream(spark, sf_dir)
    got = _drain(spark, st.dedup_stream(stream), "t_dedup", mode="append")
    n_exact = events_batch.select("user_id", "event_type").distinct().count()
    # Within one watermark horizon the stream dedup equals exact dedup.
    assert got.select("user_id", "event_type").distinct().count() == n_exact
    assert got.count() == n_exact


def test_stateful_user_profile_matches_batch(spark, sf_dir, events_batch):
    from finlogic_spark.streaming.stateful import user_profile_stream

    stream = st.read_events_stream(spark, sf_dir)
    out = _drain(spark, user_profile_stream(stream), "user_profiles", mode="update")
    # One micro-batch (one file) → one update row per user, none expired.
    got = {r["user_id"]: r for r in out.collect()}
    exp = {
        r["user_id"]: r
        for r in st.with_event_time(events_batch)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            # The stateful op accumulates exact integer cents
            # (order-independent across batches); mirror that here.
            (F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5))) / 100.0).alias(
                "value_sum"
            ),
            F.count_distinct("event_type").alias("n_event_types"),
        )
        .collect()
    }
    assert set(got) == set(exp)
    for uid, e in exp.items():
        g = got[uid]
        assert g["n_events"] == e["n_events"]
        assert g["value_sum"] == e["value_sum"]
        assert g["n_event_types"] == e["n_event_types"]
        assert not g["expired"]


def test_stream_interval_join_matches_batch(spark, sf_dir, events_batch):
    from finlogic_spark.operators.rangejoin import interval_join

    clicks_s = st.read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "click"
    )
    purch_s = st.read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    got = _drain(
        spark,
        st.stream_interval_join(clicks_s, purch_s),
        "t_ss_join",
        mode="append",
    )
    batch_pairs = interval_join(
        events_batch.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        ),
        events_batch.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value"
        ),
        on="ts",
        by=["user_id"],
        lower=-1800 * 1_000_000,
        upper=0,
        right_cols=["value"],
    )
    g = {(r["event_id"], r["p_ts"]) for r in got.collect()}
    b = {(r["event_id"], r["ts_right"]) for r in batch_pairs.collect()}
    assert g == b


def test_foreach_batch_sink_idempotent_and_matches_batch(
    spark, sf_dir, events_batch, tmp_path
):
    out_dir = str(tmp_path / "out")
    st.run_to_parquet_sink(
        st.tumbling_counts(st.read_events_stream(spark, sf_dir)),
        out_dir,
        str(tmp_path / "ck"),
        output_mode="complete",
    )
    files = spark.read.option("basePath", out_dir).parquet(out_dir)
    last = files.agg(F.max("batch_id")).first()[0]
    got = files.filter(F.col("batch_id") == last)
    batch = events_batch.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(F.count("*").alias("n_events"))
    g = {(r["window_start"], r["event_type"]): r["n_events"] for r in got.collect()}
    b = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch.collect()}
    assert g == b
    # Replaying a batch id overwrites its directory instead of doubling
    # it. Materialize the replay rows first: a lazy DataFrame over the
    # target dir would be overwritten out from under its own read.
    writer = st.foreach_batch_idempotent_writer(out_dir)
    one = spark.createDataFrame(
        got.drop("batch_id").limit(7).collect()
    )
    writer(one, int(last))
    writer(one, int(last))
    replay = spark.read.option("basePath", out_dir).parquet(out_dir)
    assert replay.filter(F.col("batch_id") == last).count() == 7
