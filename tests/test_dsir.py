"""DSIR importance resampling (operators/dsir.py).

Pins: (1) exact integer-micro-nat weight arithmetic against an
independent numpy reference, (2) ranking sanity on a hand-built
corpus, (3) Gumbel mode determinism-per-seed and variation across
seeds, (4) zero-token drop contract, (5) the registry query's
target-skew property on real test data.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from finlogic_spark.operators.dsir import dsir_log_weights, dsir_select


def _ref_weights(raw_docs, tgt_docs, alpha=0.5):
    """Independent reference: same estimator, plain python."""
    raw_toks = [d.lower().split() for d in raw_docs]
    tgt_toks = [d.lower().split() for d in tgt_docs]
    n_raw: dict[str, int] = {}
    n_tgt: dict[str, int] = {}
    for toks in raw_toks:
        for t in toks:
            n_raw[t] = n_raw.get(t, 0) + 1
    for toks in tgt_toks:
        for t in toks:
            n_tgt[t] = n_tgt.get(t, 0) + 1
    vocab = set(n_raw) | set(n_tgt)
    v = float(len(vocab))
    traw = float(sum(n_raw.values()))
    ttgt = float(sum(n_tgt.values()))
    lwq = {
        t: math.floor(math.log((n_tgt.get(t, 0) + alpha) / (ttgt + alpha * v)) * 1e6)
        - math.floor(math.log((n_raw.get(t, 0) + alpha) / (traw + alpha * v)) * 1e6)
        for t in vocab
    }
    out = {}
    for i, toks in enumerate(raw_toks):
        if toks:
            out[i] = (len(toks), sum(lwq[t] for t in toks))
    return out


def test_dsir_weights_match_reference(spark):
    rng = np.random.RandomState(23)
    words = [f"w{i}" for i in range(40)]
    raw_docs = [
        " ".join(rng.choice(words, rng.randint(3, 30)))
        for _ in range(60)
    ]
    tgt_docs = [
        " ".join(rng.choice(words[:12], rng.randint(3, 20)))
        for _ in range(10)
    ]
    raw = spark.createDataFrame(
        [(i, d) for i, d in enumerate(raw_docs)], "doc_id long, text string"
    )
    tgt = spark.createDataFrame(
        [(i, d) for i, d in enumerate(tgt_docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], round(r["log_weight"] * 1e6))
        for r in dsir_log_weights(raw, tgt).collect()
    }
    want = _ref_weights(raw_docs, tgt_docs)
    assert got == want


def test_dsir_ranking_prefers_target_like_docs(spark):
    raw = spark.createDataFrame(
        [
            (1, "alpha alpha alpha alpha"),
            (2, "alpha alpha beta beta"),
            (3, "beta beta beta beta"),
            (4, "gamma gamma gamma gamma"),
        ],
        "doc_id long, text string",
    )
    tgt = spark.createDataFrame(
        [(9, "alpha alpha alpha beta")], "doc_id long, text string"
    )
    top = dsir_select(raw, tgt, k=2).collect()
    assert [r["doc_id"] for r in top] == [1, 2]


def test_dsir_gumbel_seeded(spark):
    rng = np.random.RandomState(5)
    words = [f"w{i}" for i in range(30)]
    raw = spark.createDataFrame(
        [(i, " ".join(rng.choice(words, 12))) for i in range(80)],
        "doc_id long, text string",
    )
    tgt = spark.createDataFrame(
        [(0, " ".join(words[:8]))], "doc_id long, text string"
    )
    a1 = [r["doc_id"] for r in dsir_select(raw, tgt, k=10, gumbel_seed=1).collect()]
    a2 = [r["doc_id"] for r in dsir_select(raw, tgt, k=10, gumbel_seed=1).collect()]
    b = [r["doc_id"] for r in dsir_select(raw, tgt, k=10, gumbel_seed=2).collect()]
    assert a1 == a2  # deterministic per seed
    assert len(a1) == 10 == len(set(a1))
    assert set(a1) != set(b)  # different draw across seeds


def test_dsir_drops_zero_token_docs(spark):
    raw = spark.createDataFrame(
        [(1, "a b"), (2, "   "), (3, "")], "doc_id long, text string"
    )
    tgt = spark.createDataFrame([(9, "a")], "doc_id long, text string")
    got = {r["doc_id"] for r in dsir_log_weights(raw, tgt).collect()}
    assert got == {1}


def test_dsir_registry_query_skews_to_target_lang(spark, sf_dir):
    from finlogic_spark.driver_queries import QUERIES
    from finlogic_spark.operators.dsir import dsir_select

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    n_en = docs.filter(F.col("lang") == "en").count()
    k = 15
    sel = dsir_select(docs, docs.filter(F.col("lang") == "en"), k=k)
    sel_en = (
        sel.join(docs.select("doc_id", "lang"), "doc_id")
        .filter(F.col("lang") == "en")
        .count()
    )
    # selection must overrepresent the target language
    assert sel_en / k > n_en / n
    rows = QUERIES["doc_dsir_select"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 100
