"""Property-based tests for the round-7b operator contracts —
invariants over ARBITRARY inputs (empty, duplicate-heavy, single-key,
adversarial orderings), complementing the handpicked cases in
test_round7b_ops.py."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from finlogic_spark.operators.search import phrase_search
from finlogic_spark.operators.sliding import sliding_distinct_exact
from finlogic_spark.operators.text_dedup import sorted_neighborhood_pairs

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_T0 = datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 72)),  # (user, hour offset)
    max_size=40,
)


@given(rows=events_strategy)
@settings(**_SETTINGS)
def test_sliding_distinct_monotone_in_width_and_bounded(spark, rows):
    """For ANY event set: width=1 equals the per-bucket distinct
    count; counts are non-decreasing in width; every count is bounded
    by the global distinct key count; the emitted bucket set is
    exactly the event-bearing buckets."""
    data = [(u, _T0 + timedelta(hours=h, minutes=7)) for u, h in rows] or [
        (0, _T0)
    ]
    ev = spark.createDataFrame(data, "user_id long, ts timestamp")
    per_bucket = {
        r.b: r.n
        for r in ev.groupBy(F.date_trunc("hour", "ts").alias("b"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    w1 = {
        r.bucket_ts: r.u_trailing
        for r in sliding_distinct_exact(ev, "ts", "user_id", width=1).collect()
    }
    w3 = {
        r.bucket_ts: r.u_trailing
        for r in sliding_distinct_exact(ev, "ts", "user_id", width=3).collect()
    }
    total = ev.select("user_id").distinct().count()
    assert w1 == per_bucket
    assert w3.keys() == per_bucket.keys()
    for b in per_bucket:
        assert w1[b] <= w3[b] <= total


docs_strategy = st.lists(
    st.tuples(
        st.integers(0, 1),  # block
        st.text(alphabet="ab ", max_size=12),
    ),
    max_size=20,
)


@given(rows=docs_strategy, window=st.integers(1, 3))
@settings(**_SETTINGS)
def test_sorted_neighborhood_matches_rank_self_join(spark, rows, window):
    """SNM's linear lead()-window formulation must emit EXACTLY the
    pairs of the quadratic rank-difference self-join it replaces, for
    any blocks/keys/window (ties included — id tiebreak)."""
    data = [(i, blk, key) for i, (blk, key) in enumerate(rows)] or [
        (0, 0, "")
    ]
    df = spark.createDataFrame(data, "id long, blk int, key string")
    got = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            df.repartition(5), "id", F.col("key"), F.col("blk"),
            window=window,
        ).collect()
    }
    ordered = sorted(data, key=lambda t: (t[1], t[2], t[0]))
    want = {
        (a[0], b[0])
        for i, a in enumerate(ordered)
        for b in ordered[i + 1 : i + 1 + window]
        if a[1] == b[1]
    }
    assert got == want


phrase_docs = st.lists(st.text(alphabet="xy ", max_size=16), max_size=12)


@given(texts=phrase_docs)
@settings(**_SETTINGS)
def test_phrase_prefix_monotonicity(spark, texts):
    """Every occurrence of [t1 t2] is an occurrence of [t1]: per-doc
    match counts can only shrink as the phrase grows, and match sets
    are subsets."""
    docs = spark.createDataFrame(
        list(enumerate(texts)) or [(0, "")], "doc_id long, text string"
    )
    one = {
        r.doc_id: r.n_matches
        for r in phrase_search(docs, ["x"]).collect()
    }
    two = {
        r.doc_id: r.n_matches
        for r in phrase_search(docs, ["x", "y"]).collect()
    }
    assert set(two) <= set(one)
    for d, n in two.items():
        assert n <= one[d]


vec_strategy = st.lists(
    st.tuples(
        st.floats(0, 1, allow_nan=False, width=32),
        st.lists(st.floats(-1, 1, allow_nan=False, width=32),
                 min_size=3, max_size=3),
    ),
    min_size=1,
    max_size=10,
)


@given(cands=vec_strategy, lam=st.sampled_from([0.0, 0.3, 0.7, 1.0]))
@settings(**_SETTINGS)
def test_mmr_scores_non_increasing_and_permutation_stable(spark, cands, lam):
    """Greedy MMR contracts for ANY candidate set: scores from rank 2
    on are non-increasing (each step maximizes over a shrinking set
    against a growing max_sim; rank 1 is exempt — its score uses the
    empty-set similarity convention of 0, which a NEGATIVE max_sim at
    rank 2 can legitimately beat), the first pick is the relevance
    argmax (id tiebreak), and the result is identical under
    repartitioning."""
    from finlogic_spark.operators.similarity import mmr_rerank

    rows = [(1, i, rel, vec) for i, (rel, vec) in enumerate(cands)]
    df = spark.createDataFrame(
        rows,
        "query_id long, vec_id long, cos_sim double, embedding array<double>",
    )
    out = [
        (r.rk, r.vec_id, r.mmr_score)
        for r in mmr_rerank(df, k=5, lam=lam).orderBy("rk").collect()
    ]
    loop_scores = [s for _, _, s in out[1:]]
    assert all(
        a >= b - 1e-12 for a, b in zip(loop_scores, loop_scores[1:])
    )
    best = min(
        range(len(cands)), key=lambda i: (-cands[i][0], i)
    )
    assert out[0][1] == best
    out2 = [
        (r.rk, r.vec_id, r.mmr_score)
        for r in mmr_rerank(df.repartition(7), k=5, lam=lam)
        .orderBy("rk")
        .collect()
    ]
    assert out == out2
