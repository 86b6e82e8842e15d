"""Tests for the round-6 additions: skew-salted join/agg
(operators/skew.py), text cleaning / PII redaction / chunking
(functions/text_clean.py), and upsert-snapshot time travel."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from finlogic_spark.functions.text_clean import (
    chunk_documents,
    normalize_text,
    pii_redact,
)
from finlogic_spark.operators.skew import salted_agg, salted_join


# ---------------------------------------------------------------- skew


def _fact(spark):
    # 3 keys, key 1 deliberately hot (80% of rows).
    rows = [Row(k=1 if i % 5 != 0 else i % 3 + 1, rid=i, v=float(i)) for i in range(200)]
    return spark.createDataFrame(rows)


def test_salted_join_equals_plain_join(spark):
    fact = _fact(spark)
    dim = spark.createDataFrame([Row(k=1, name="a"), Row(k=2, name="b"), Row(k=3, name="c")])
    plain = fact.join(dim, "k").select("k", "rid", "v", "name")
    salted = salted_join(fact, dim, on=["k"], salt_source="rid", salts=8).select(
        "k", "rid", "v", "name"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_is_deterministic(spark):
    fact = _fact(spark)
    dim = spark.createDataFrame([Row(k=1, name="a"), Row(k=2, name="b")])
    a = salted_join(fact, dim, ["k"], "rid", salts=4).collect()
    b = salted_join(fact, dim, ["k"], "rid", salts=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_salted_agg_equals_plain_agg(spark):
    fact = _fact(spark).withColumn("cents", (F.col("v") * 100).cast("bigint"))
    plain = {
        r["k"]: (r["t"], r["n"], r["mx"])
        for r in fact.groupBy("k")
        .agg(F.sum("cents").alias("t"), F.count("*").alias("n"), F.max("cents").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["t"], r["n"], r["mx"])
        for r in salted_agg(
            fact,
            keys=["k"],
            salt_source="rid",
            aggs={"t": ("sum", "cents"), "n": ("count", "*"), "mx": ("max", "cents")},
            salts=16,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_mergeable(spark):
    fact = _fact(spark)
    with pytest.raises(ValueError, match="unsupported aggregate"):
        salted_agg(fact, ["k"], "rid", {"bad": ("avg", "v")})


def test_salted_join_splits_hot_key_across_tasks(spark):
    # The point of the salt: one logical key lands on multiple salted
    # sub-keys, so no single reduce task owns the whole hot key.
    fact = _fact(spark)
    src = F.col("rid")
    salts = (
        fact.filter(F.col("k") == 1)
        .select(F.pmod(F.xxhash64(src), F.lit(8)).cast("int").alias("s"))
        .distinct()
        .count()
    )
    assert salts >= 4  # 160 hot rows hash across >=4 of 8 salt buckets


# ---------------------------------------------------------- text_clean


def test_pii_redact_masks_each_kind(spark):
    df = spark.createDataFrame(
        [Row(t="mail a.b+c@x-corp.co.uk web https://x.io/p?q=1 ip 10.0.0.255 tel +1 555-123-4567 end")]
    )
    out = df.select(pii_redact("t").alias("r")).first()["r"]
    assert "<EMAIL>" in out and "<URL>" in out and "<IP>" in out and "<PHONE>" in out
    assert "@" not in out and "10.0.0.255" not in out and "555" not in out


def test_pii_redact_leaves_clean_text_alone(spark):
    clean = "the quick brown fox jumped over 3 lazy dogs in 1997"
    df = spark.createDataFrame([Row(t=clean)])
    assert df.select(pii_redact("t").alias("r")).first()["r"] == clean


def test_normalize_text_collapses_and_strips(spark):
    df = spark.createDataFrame([Row(t="  Hello\t\tWORLD\x01\n  again  ")])
    assert df.select(normalize_text("t").alias("r")).first()["r"] == "hello world again"


def test_normalize_is_idempotent(spark):
    df = spark.createDataFrame([Row(t="  MiXeD   Case\n\ttext  ")])
    once = df.select(normalize_text("t").alias("r"))
    twice = once.select(normalize_text("r").alias("r"))
    assert once.first()["r"] == twice.first()["r"]


def test_chunk_documents_covers_text_exactly(spark):
    text = "".join(chr(97 + i % 26) for i in range(730))
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    chunks = [
        r["chunk"]
        for r in chunk_documents(df, size=200, overlap=50).orderBy("chunk_id").collect()
    ]
    # ceil((730-50)/150) = 5 chunks; stitching (drop the 50-char overlap
    # after the first) reconstructs the original text exactly.
    assert len(chunks) == 5
    assert chunks[0] + "".join(c[50:] for c in chunks[1:]) == text
    assert all(len(c) <= 200 for c in chunks)


def test_chunk_documents_short_doc_single_chunk(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="tiny")])
    rows = chunk_documents(df, size=200, overlap=50).collect()
    assert len(rows) == 1 and rows[0]["chunk"] == "tiny" and rows[0]["chunk_id"] == 0


def test_chunk_documents_validates_overlap():
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(None, size=100, overlap=100)


def test_chunk_plan_is_narrow(spark, sf_dir):
    from finlogic_spark import plans

    # Raw scan (not _t, whose CPU-heavy fan-out adds a repartition):
    # the operator itself must add zero exchanges.
    df = chunk_documents(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    # explode + substring only: no exchange before the explode.
    plan = plans.formatted_plan(df)
    assert "Generate" in plan  # the explode
    assert plans.count_shuffles(df) == 0


# ------------------------------------------------------- time travel


def test_upsert_snapshot_time_travel(spark, tmp_path):
    from finlogic_spark.streaming import (
        list_upsert_versions,
        read_upsert_snapshot,
        run_upsert_sink,
    )

    src = tmp_path / "src"
    for i, batch in enumerate(
        [
            [Row(k=1, ver=1, val="a"), Row(k=2, ver=1, val="b")],
            [Row(k=1, ver=2, val="a2"), Row(k=3, ver=1, val="c")],
        ]
    ):
        spark.createDataFrame(batch).coalesce(1).write.parquet(str(src / f"b{i}"))
    stream = (
        spark.readStream.schema("k bigint, ver bigint, val string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    run_upsert_sink(
        stream, str(tmp_path / "snap"), str(tmp_path / "ckpt"),
        keys=["k"], order_cols=["ver"],
    )
    versions = list_upsert_versions(spark, str(tmp_path / "snap"))
    assert len(versions) == 2
    v0 = read_upsert_snapshot(spark, str(tmp_path / "snap"), version=versions[0])
    latest = read_upsert_snapshot(spark, str(tmp_path / "snap"))
    assert v0.count() == 2  # first batch only
    got = {r["k"]: (r["ver"], r["val"]) for r in latest.collect()}
    assert got == {1: (2, "a2"), 2: (1, "b"), 3: (1, "c")}
    with pytest.raises(FileNotFoundError, match="absent"):
        read_upsert_snapshot(spark, str(tmp_path / "snap"), version=99)
