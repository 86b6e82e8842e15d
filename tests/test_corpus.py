"""Corpus-curation operators: repetition signals, hash-stratified
sampling, vocabulary pruning, label centroids."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from finlogic_spark.functions.text import repetition_signals
from finlogic_spark.operators.corpus import (
    build_vocab,
    label_centroids,
    prune_to_vocab,
    stratified_sample_hash,
)
from finlogic_spark.functions.text import tokens


def test_repetition_signals_edge_cases(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # one distinct token, one distinct bigram
            (2, "a b c d"),          # all distinct
            (3, "solo"),             # <2 tokens: bigram frac is null
            (4, None),               # null text: all null
            (5, "x y x y x y"),      # alternating: 'x y' dominates
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["s"].asDict()
        for r in df.select("doc_id", repetition_signals("text").alias("s")).collect()
    }
    assert got[1]["n_tokens"] == 4
    assert math.isclose(got[1]["distinct_ratio"], 0.25)
    assert math.isclose(got[1]["top_bigram_frac"], 1.0)
    assert math.isclose(got[2]["distinct_ratio"], 1.0)
    assert math.isclose(got[2]["top_bigram_frac"], 1.0 / 3.0)
    assert got[3]["n_tokens"] == 1
    assert got[3]["top_bigram_frac"] is None
    assert got[4]["n_tokens"] is None
    assert got[4]["distinct_ratio"] is None
    # 6 tokens → 5 bigrams: x y, y x, x y, y x, x y → top is 3/5
    assert math.isclose(got[5]["top_bigram_frac"], 3.0 / 5.0)


def test_stratified_sample_is_reshuffle_proof(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(500)],
        "doc_id long, lang string",
    )
    rates = {"en": "g0", "de": "80"}
    a = {
        r["doc_id"]
        for r in stratified_sample_hash(df, "lang", rates, "doc_id").collect()
    }
    b = {
        r["doc_id"]
        for r in stratified_sample_hash(
            df.repartition(13, "lang"), "lang", rates, "doc_id"
        ).collect()
    }
    assert a == b
    # 'g0' keeps every en row; 'de' keeps roughly half.
    assert sum(1 for i in a if i % 2 == 0) == 250
    n_de = sum(1 for i in a if i % 2 == 1)
    assert 75 < n_de < 175


def test_prune_to_vocab_replaces_oov(spark):
    df = spark.createDataFrame(
        [(1, "a b a rare"), (2, "b b b"), (3, None)],
        "doc_id long, text string",
    )
    vocab = build_vocab(df, tokens("text"), size=2)  # {a, b} by frequency
    got = {
        r["doc_id"]: r.asDict()
        for r in prune_to_vocab(df, tokens("text"), vocab, "doc_id").collect()
    }
    assert got[1]["text_pruned"] == "a b a <unk>"
    assert got[1]["n_oov"] == 1 and got[1]["n_tokens"] == 4
    assert got[2]["text_pruned"] == "b b b" and got[2]["n_oov"] == 0
    assert 3 not in got  # null text never explodes into the output


def test_label_centroids_exact_mean(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 6.0]), (1, [10.0, 0.0])],
        "label int, embedding array<float>",
    )
    got = {
        (r["label"], r["pos"]): (r["c"], r["n"])
        for r in label_centroids(df).collect()
    }
    assert got[(0, 0)] == (2.0, 2)
    assert got[(0, 1)] == (4.0, 2)
    assert got[(1, 0)] == (10.0, 1)
    assert got[(1, 1)] == (0.0, 1)


def test_repetition_signals_single_pass_plan(spark):
    # The tokenizer must appear ONCE in the optimized plan: signals are
    # lambda-bound, not re-inlined per reference.
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        df.select(repetition_signals("text").alias("s"))
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("split") == 1


def test_domain_mix_sample_thresholds_and_determinism(spark):
    """Mixture sampling: exact integer thresholds (a source whose
    desired take exceeds its supply keeps EVERYTHING; an unlisted
    source drops), and the keep decision is reshuffle-proof (same kept
    set at any partitioning — hash sampling, not RNG)."""
    from finlogic_spark.functions.text import token_count
    from finlogic_spark.operators.corpus import domain_mix_sample

    rows = []
    for i in range(300):
        src = ["big", "small", "unlisted"][i % 3]
        rows.append((i, src, "tok " * 10))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    targets = {"big": 100_000, "small": 900_000}  # 10% / 90%
    budget = 4_000  # tokens; each source holds 1000
    out = domain_mix_sample(
        df, "source", "doc_id", token_count("text"), targets, budget
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == 300  # audit rows for every doc
    by_src: dict = {}
    for r in got.values():
        by_src.setdefault(r["source"], []).append(r["kept"])
    assert not any(by_src["unlisted"])  # unlisted domain drops
    # small: desired 3600 tokens > 1000 available -> keep ALL
    assert all(by_src["small"])
    # big: desired 400 of 1000 tokens -> thr floor(400*256/1000)=102
    # of 256; kept fraction must be strictly partial
    kept_big = sum(by_src["big"])
    assert 0 < kept_big < len(by_src["big"])
    # reshuffle-proof: same kept set at a different partitioning
    got2 = {
        r["doc_id"]: r["kept"]
        for r in domain_mix_sample(
            df.repartition(7), "source", "doc_id",
            token_count("text"), targets, budget
        ).collect()
    }
    assert got2 == {i: r["kept"] for i, r in got.items()}
    import pytest

    with pytest.raises(ValueError, match="budget"):
        domain_mix_sample(
            df, "source", "doc_id", token_count("text"), targets, -1
        )
