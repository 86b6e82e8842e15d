"""Property-based tests for the round-14 operator contracts: RRF
fusion, domain-mixture thresholds, budget selection — the invariants
hold for ARBITRARY inputs, checked against independent pure-Python
references. Example counts stay small (each example runs Spark jobs);
the generators cover empty legs, single-source corpora, zero budgets,
and oversubscribed targets."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from finlogic_spark.operators.corpus import domain_mix_sample
from finlogic_spark.operators.search import rrf_fuse

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


ranked = st.lists(
    st.integers(min_value=0, max_value=30), unique=True, max_size=10
)


@given(a=ranked, b=ranked, k=st.integers(min_value=1, max_value=100))
@settings(**_SETTINGS)
def test_rrf_matches_python_reference(spark, a, b, k):
    """For ANY two ranked id lists and any k: rrf_fuse == the paper's
    formula computed serially (union semantics, absent leg -> 0)."""
    if not a and not b:
        return
    lex = spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(a)] or [(None, None)],
        "doc_id long, r_a int",
    )
    sem = spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(b)] or [(None, None)],
        "doc_id long, r_b int",
    )
    got = {
        r["doc_id"]: r["rrf_score"]
        for r in rrf_fuse([(lex, "r_a"), (sem, "r_b")], "doc_id", k=k).collect()
        if r["doc_id"] is not None
    }
    ra = {d: i + 1 for i, d in enumerate(a)}
    rb = {d: i + 1 for i, d in enumerate(b)}
    want = {
        d: (1.0 / (k + ra[d]) if d in ra else 0.0)
        + (1.0 / (k + rb[d]) if d in rb else 0.0)
        for d in set(ra) | set(rb)
    }
    assert got == want  # bit-exact: one IEEE division per leg


sources = st.lists(
    st.sampled_from(["a", "b", "c"]), min_size=1, max_size=30
)


@given(
    srcs=sources,
    wa=st.integers(min_value=0, max_value=1_000_000),
    wb=st.integers(min_value=0, max_value=1_000_000),
    budget=st.integers(min_value=0, max_value=10_000),
)
@settings(**_SETTINGS)
def test_domain_mix_matches_python_reference(spark, srcs, wa, wb, budget):
    """For ANY corpus/weights/budget: the kept set equals the serial
    reference (exact integer thresholds + md5 stratum compare); source
    'c' is never listed and must always drop entirely."""
    rows = [(i, s, "tok " * ((i % 5) + 1)) for i, s in enumerate(srcs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    targets = {"a": wa, "b": wb}
    from finlogic_spark.functions.text import token_count

    got = {
        r["doc_id"]: r["kept"]
        for r in domain_mix_sample(
            df, "source", "doc_id", token_count("text"), targets, budget
        ).collect()
    }
    totals: dict = {}
    for i, s in enumerate(srcs):
        totals[s] = totals.get(s, 0) + (i % 5) + 1
    thr = {}
    for s, total in totals.items():
        w = targets.get(s)
        if w is None or total <= 0:
            thr[s] = "00"
            continue
        byte = ((w * budget) // 1_000_000) * 256 // total
        thr[s] = "g0" if byte >= 256 else f"{byte:02x}"
    for i, s in enumerate(srcs):
        h2 = hashlib.md5(f"mix|{i}".encode()).hexdigest()[:2]
        assert got[i] == (h2 < thr[s]), (i, s, h2, thr[s])
    assert not any(got[i] for i, s in enumerate(srcs) if s == "c")
