"""Hermetic tests for the round-9 operators: containment pairs,
trend slope, EWMA, 2-D skyline, duplicated spans, JS divergence."""

import math

from pyspark.sql import functions as F


# ------------------------------------------------------- containment

def test_containment_is_asymmetric_where_jaccard_fails(spark):
    """A short doc quoted whole inside a long host: containment
    (short -> host) = 1.0 while Jaccard is diluted below any useful
    threshold — the case this operator exists for."""
    from finlogic_spark.operators.text_dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    host = short + " " + " ".join(f"filler{i} pad{i} word{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, short), (2, host), (3, "totally unrelated content here")],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(
            docs, "text", "doc_id", k=3, threshold=0.8
        ).collect()
    }
    assert (1, 2) in got and got[(1, 2)] == 1.0
    assert (2, 1) not in got  # host is NOT contained in the quote
    jac = ngram_jaccard_pairs(
        docs, "text", "doc_id", k=3, threshold=0.3, max_doc_freq=None
    ).collect()
    assert all(r.jaccard < 0.3 or {r.id_a, r.id_b} != {1, 2} for r in jac)


def test_containment_threshold_and_direction_counts(spark):
    """Two docs sharing half of A's shingles: containment(A->B) = the
    shared fraction w.r.t. A only."""
    from finlogic_spark.operators.text_dedup import containment_pairs

    # A: tokens a0..a5 -> 4 shingles; B contains A's first 4 tokens
    # (2 shared shingles) plus its own tail.
    a = "a0 a1 a2 a3 a4 a5"
    b = "a0 a1 a2 a3 b0 b1 b2 b3 b4 b5"
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    rows = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(
            docs, "text", "doc_id", k=3, threshold=0.1
        ).collect()
    }
    # A has 4 shingles, B has 8; shared = 2 ("a0 a1 a2", "a1 a2 a3")
    assert rows[(1, 2)] == 0.5
    assert rows[(2, 1)] == 0.25


# ------------------------------------------------------- trend slope

def test_trend_slope_exact_line(spark):
    """y = 2x + 1 sampled exactly -> slope 2, intercept 1, r2 1."""
    from finlogic_spark.operators.profile import trend_slope

    rows = [("k", x, 2.0 * x + 1.0) for x in range(10)]
    df = spark.createDataFrame(rows, "k string, x long, y double")
    out = trend_slope(df, ["k"], F.col("x"), F.col("y")).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 10
    assert abs(r.slope - 2.0) < 1e-9
    assert abs(r.intercept - 1.0) < 1e-9
    assert abs(r.r2 - 1.0) < 1e-9


def test_trend_slope_gates(spark):
    """n = 1 groups, vertical stacks (zero x-variance) are excluded;
    constant-y groups keep slope 0 with NULL r2 (0/0 by convention)."""
    from finlogic_spark.operators.profile import trend_slope

    rows = (
        [("single", 5, 1.0)]
        + [("vstack", 7, float(v)) for v in (1, 2, 3)]
        + [("flat", x, 4.25) for x in range(5)]
    )
    df = spark.createDataFrame(rows, "k string, x long, y double")
    out = {r.k: r for r in trend_slope(df, ["k"], F.col("x"), F.col("y")).collect()}
    assert "single" not in out and "vstack" not in out
    assert out["flat"].slope == 0.0
    assert out["flat"].r2 is None


# ------------------------------------------------------------- ewma

def test_ewma_renormalizes_over_available_lags(spark):
    from finlogic_spark.operators.windows import ewma

    rows = [("u", i, float(v)) for i, v in enumerate([10, 20, 30, 40, 50])]
    df = spark.createDataFrame(rows, "k string, seq long, v double")
    out = (
        df.withColumn("e", ewma("v", ["k"], ["seq"], alpha=0.5, horizon=4))
        .orderBy("seq")
        .collect()
    )
    # row 0: only itself -> exactly v
    assert out[0].e == 10.0
    # row 1: (0.5*20 + 0.25*10) / 0.75
    assert abs(out[1].e - (0.5 * 20 + 0.25 * 10) / 0.75) < 1e-12
    # row 4 (full horizon): weights 0.5,0.25,0.125,0.0625 over 50,40,30,20
    full = (0.5 * 50 + 0.25 * 40 + 0.125 * 30 + 0.0625 * 20) / 0.9375
    assert abs(out[4].e - full) < 1e-12


# ----------------------------------------------------------- skyline

def test_pareto_frontier_2d(spark):
    from finlogic_spark.operators.topk import pareto_frontier_2d

    pts = [
        (1, 9.0),  # frontier (nothing later beats 9)... see below
        (1, 4.0),  # dominated within x=1 by (1, 9)
        (2, 9.0),  # dominates (1, 9): same y, larger x
        (3, 5.0),  # frontier
        (4, 5.0),  # dominates (3, 5)
        (5, 2.0),  # frontier (latest x)
    ]
    df = spark.createDataFrame(pts, "x long, y double")
    got = [(r.x, r.y) for r in pareto_frontier_2d(df, "x", "y").collect()]
    assert got == [(2, 9.0), (4, 5.0), (5, 2.0)]


# --------------------------------------------------------- dup spans

def test_dup_spans_detects_shared_block(spark):
    from finlogic_spark.operators.text_dedup import dup_spans

    block = "SHARED LICENSE BOILERPLATE TEXT BLOCK %d " % 7 * 20  # ~800 chars
    docs = spark.createDataFrame(
        [
            (1, "unique preamble one two three " + block),
            (2, block + " completely different tail content here"),
            (3, "no overlap with anything else at all " * 12),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dup_spans(docs, "text", "doc_id").collect()}
    assert out[1].n_dup_spans > 0 and out[2].n_dup_spans > 0
    assert out[3].n_dup_spans == 0 and out[3].dup_ratio == 0.0
    for r in out.values():
        assert 0.0 <= r.dup_ratio <= 1.0 and r.n_dup_spans <= r.n_spans


def test_dup_spans_alignment_independent(spark):
    """Content-keyed selection keeps the SAME spans in every copy of a
    duplicated region no matter how the copies are aligned — the
    property a fixed-stride sample lacks (copies at offsets with
    different residues mod the stride never collide)."""
    from finlogic_spark.operators.text_dedup import dup_spans

    region = "the quick brown fox jumps over the lazy dog %03d " % 42 * 15
    # offsets 7 and 13 differ by 6 — a stride-10 sampler samples
    # disjoint region-relative positions for these two copies
    docs = spark.createDataFrame(
        [(1, "p" * 7 + region), (2, "q" * 13 + region)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dup_spans(docs, "text", "doc_id").collect()}
    assert out[1].n_dup_spans > 0 and out[2].n_dup_spans > 0
    # identical region -> identical kept spans -> equal dup counts
    assert out[1].n_dup_spans == out[2].n_dup_spans


# ----------------------------------------------------- js divergence

def test_js_divergence_zero_for_corpus_identical_group(spark):
    """Two groups with identical token distributions -> each matches
    the corpus exactly -> JS 0 (up to the micro-nat floor)."""
    from finlogic_spark.functions.text import tokens
    from finlogic_spark.operators.profile import js_divergence

    rows = [("g1", "a b c a"), ("g2", "a b c a")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r.source: r for r in js_divergence(df, "source", tokens("text")).collect()}
    for r in out.values():
        assert abs(r.js_nats) < 1e-5
        assert r.n_tokens == 4


def test_js_divergence_bounded_by_ln2(spark):
    """JS in nats is bounded by ln 2; a group disjoint from the rest of
    the corpus approaches (but cannot exceed) it."""
    from finlogic_spark.functions.text import tokens
    from finlogic_spark.operators.profile import js_divergence

    rows = [("g1", " ".join(f"a{i}" for i in range(50)))] + [
        ("g2", " ".join(f"b{i}" for i in range(50)))
    ] * 9
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r.source: r for r in js_divergence(df, "source", tokens("text")).collect()}
    for r in out.values():
        assert 0.0 <= r.js_nats <= math.log(2.0) + 1e-9
    # the 10%-of-corpus disjoint group diverges far more than the 90% one
    assert out["g1"].js_nats > out["g2"].js_nats > 0.0


# ----------------------------------------- containment prefix filter

def test_containment_prefix_identical_to_uncapped_plain(spark):
    """containment_prefix_pairs must be byte-identical to
    containment_pairs(max_doc_freq=None): the asymmetric prefix lemma
    is lossless, so only the candidate set shrinks."""
    from finlogic_spark.operators.text_dedup import (
        containment_pairs,
        containment_prefix_pairs,
    )

    rows = [
        (i, " ".join(f"t{(i * 7 + j * 3) % 41}" for j in range(30)))
        for i in range(40)
    ] + [
        # quote pairs: doc 100+i contains doc i's text verbatim
        (100 + i, " ".join(f"t{(i * 7 + j * 3) % 41}" for j in range(30))
         + " " + " ".join(f"x{i}y{j}" for j in range(40)))
        for i in range(5)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.5, 0.8):
        plain = sorted(
            map(
                tuple,
                containment_pairs(
                    docs, "text", "doc_id", k=3, threshold=t,
                    max_doc_freq=None,
                ).collect(),
            )
        )
        pref = sorted(
            map(
                tuple,
                containment_prefix_pairs(
                    docs, "text", "doc_id", k=3, threshold=t
                ).collect(),
            )
        )
        assert plain == pref and len(plain) > 0


def test_containment_prefix_dodges_boilerplate_fan(spark):
    """On a boilerplate-heavy corpus the packed-pairs formulation
    expands C(n_docs, 2) rows per shared shingle (the fan that ran
    sf10 out of shuffle disk); the prefix filter's candidate edges
    stay bounded because boilerplate shingles sort last and never
    enter a prefix."""
    from finlogic_spark.operators.text_dedup import (
        containment_prefix_pairs,
        shingles,
    )

    n_docs = 60
    header = "terms of service apply to all content on this site"
    rows = [
        (i, header + " " + " ".join(f"u{i}w{j}" for j in range(12)))
        for i in range(n_docs)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(shingles("text", 3))).alias("s")
    )
    plain_volume = (
        sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
        .select(F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("v"))
        .first()["v"]
    )
    assert plain_volume >= 8 * (60 * 59 / 2), plain_volume
    # every doc: 20 distinct shingles, 8 boilerplate (df=60, sort last)
    # + 12 unique; containment(a->b) = 8/20 = 0.4 < 0.8 for all pairs,
    # and prefixes (len 20 - 16 + 1 = 5) hold only unique shingles ->
    # zero candidates, zero output.
    out = containment_prefix_pairs(
        docs, "text", "doc_id", k=3, threshold=0.8
    )
    assert out.count() == 0
