"""Tests for text analysis, text dedup, and similarity operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from finlogic_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from finlogic_spark.operators.similarity import cosine_topk, lsh_cosine_topk
from finlogic_spark.operators.text_dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash_agg,
)


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "THE  quick   brown fox jumps over the lazy dog"),  # exact dup of 1
        (4, "completely different content about spark engines"),
        (5, "el gato y el perro en la casa es grande"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_exact_dedup_canonicalizes(spark):
    d = _docs(spark)
    kept = sorted(r["doc_id"] for r in exact_dedup(d, "text", "doc_id").collect())
    assert kept == [1, 2, 4, 5]  # 3 collapses into 1 (case/whitespace)


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta")], "id int, text string"
    )
    fps = [r["fp"] for r in df.select(fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_lang_id(spark):
    d = _docs(spark)
    got = {r["doc_id"]: r["lang"] for r in d.select("doc_id", lang_id("text").alias("lang")).collect()}
    assert got[1] == "en"
    assert got[5] == "es"


def test_token_count_and_quality_bounds(spark):
    d = _docs(spark)
    rows = d.select(
        token_count("text").alias("n"), quality_score("text").alias("q")
    ).collect()
    assert all(r["n"] > 0 for r in rows)
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_minhash_identical_docs_share_signature(spark):
    d = _docs(spark)
    sig = minhash_signature(d, "text", "doc_id", k=3, num_hashes=4)
    by_id = {r["doc_id"]: [r[f"minhash_{i}"] for i in range(4)] for r in sig.collect()}
    assert by_id[1] == by_id[3]  # canonically identical docs
    assert by_id[1] != by_id[4]


def test_lsh_finds_near_dups(spark):
    d = _docs(spark)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(d, "text", "doc_id", k=2, num_hashes=6, bands=3).collect()
    }
    assert (1, 3) in pairs  # identical docs always collide
    assert not any(4 in p for p in pairs)  # unrelated doc never pairs


def test_ngram_jaccard_scores(spark):
    d = _docs(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(d, "text", "doc_id", k=2, threshold=0.3).collect()
    }
    assert pairs[(1, 3)] == 1.0
    assert 0.3 <= pairs[(1, 2)] < 1.0


def test_jaccard_df_cap_prunes_stop_shingles(spark):
    rows = [(i, "common shingle text here plus unique" + str(i)) for i in range(10)]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    capped = ngram_jaccard_pairs(d, "text", "doc_id", k=2, threshold=0.0, max_doc_freq=5)
    uncapped = ngram_jaccard_pairs(d, "text", "doc_id", k=2, threshold=0.0, max_doc_freq=None)
    assert capped.count() < uncapped.count()


def test_simhash_near_dups_close(spark):
    d = _docs(spark)
    fp = {r["doc_id"]: r["simhash_fp"] for r in simhash_agg(d, "text", "doc_id").collect()}
    assert fp[1] == fp[3]
    hamming = bin(fp[1] ^ fp[2]).count("1")
    assert hamming <= 8  # near-dups differ in few bits
    far = bin(fp[1] ^ fp[4]).count("1")
    assert far > hamming


def test_simhash_agg_matches_per_row_fold(spark):
    """r16 packed-lane aggregate (two 32-bit ones-count lanes per
    accumulator) must stay bit-identical to the expression-fold
    ``simhash()`` reference on a corpus with repeated tokens, odd/even
    token counts, and single-token docs — every lane-extraction path
    (low lane, high lane, tie 2*ones == n) is exercised."""
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha alpha alpha beta"),  # heavy repetition
        (3, "zeta"),  # single token: every bit decided by one hash
        (4, "one two three four five six seven eight nine ten"),
        (5, "alpha beta gamma delta epsilon"),  # exact dup of 1
        (6, "x y"),  # 2 tokens: exact tie 2*ones == n cases
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    agg = {
        r["doc_id"]: r["simhash_fp"]
        for r in simhash_agg(d, "text", "doc_id").collect()
    }
    from finlogic_spark.operators.text_dedup import simhash

    ref = {
        r["doc_id"]: r["fp"]
        for r in d.select("doc_id", simhash("text").alias("fp")).collect()
    }
    assert agg == ref
    assert agg[1] == agg[5]


def _vectors(spark, n=50, dim=8):
    import math

    rows = []
    for i in range(n):
        vec = [math.sin(i * 0.7 + j) for j in range(dim)]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_cosine_topk_self_is_top1(spark):
    corpus = _vectors(spark)
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = cosine_topk(corpus, queries, k=3)
    top1 = {r["query_id"]: r["vec_id"] for r in out.filter(F.col("rk") == 1).collect()}
    assert top1 == {0: 0, 1: 1, 2: 2}  # each query's nearest neighbour is itself
    sims = [r["cos_sim"] for r in out.filter(F.col("rk") == 1).collect()]
    assert all(abs(s - 1.0) < 1e-9 for s in sims)


def test_lsh_topk_recall_against_bruteforce(spark):
    corpus = _vectors(spark)
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(corpus, queries, k=3).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in lsh_cosine_topk(corpus, queries, k=3, dim=8, num_planes=3).collect()
    }
    # Self-match always lands in the same bucket → recall ≥ 1/3 guaranteed;
    # with 3 planes on 8 dims recall is typically much higher.
    recall = len(exact & approx) / len(exact)
    assert recall >= 1 / 3


def test_lsh_local_query_probes_bit_identical(spark):
    """The driver-side query-bucket fast path must return EXACTLY the
    expression path's rows — same buckets (the left-to-right python
    fold is the same IEEE op sequence as the SQL chain), same
    candidates, same scores."""
    corpus = _vectors(spark)
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    kw = dict(k=3, dim=8, num_planes=4, num_tables=3, probe_radius=1)
    expr_path = sorted(
        map(tuple, lsh_cosine_topk(corpus, queries, **kw).collect())
    )
    local_path = sorted(
        map(
            tuple,
            lsh_cosine_topk(
                corpus, queries, local_query_probes=True, **kw
            ).collect(),
        )
    )
    assert expr_path == local_path


def test_lsh_local_probes_degenerate_and_string_ids(spark):
    """The driver-side probe path must mirror SQL null propagation
    (NULL / too-short / too-LONG query vectors -> bucket 0, never a
    crash) and must not assume long query ids (regression: crashed on
    the first two; the over-length case used to dot the first dim
    elements while zip_with null-pads the shorter PLANE and
    null-propagates to bucket 0 — len(v) != dim is degenerate)."""
    corpus = _vectors(spark)
    queries = spark.createDataFrame(
        [
            ("q_null", None),
            ("q_short", [1.0, 2.0]),
            ("q_long", [float(i % 5) - 2.0 for i in range(12)]),
            ("q_ok", [float(i % 3) - 1.0 for i in range(8)]),
        ],
        "query_id string, query_vec array<double>",
    )
    kw = dict(k=3, dim=8, num_planes=4, num_tables=2, probe_radius=1)
    expr_path = sorted(
        map(tuple, lsh_cosine_topk(corpus, queries, **kw).collect())
    )
    local_path = sorted(
        map(
            tuple,
            lsh_cosine_topk(
                corpus, queries, local_query_probes=True, **kw
            ).collect(),
        )
    )
    assert expr_path == local_path


def test_null_and_degenerate_text_handling(spark):
    """Nulls and empty docs must degrade gracefully, never crash or
    silently disappear from exact_dedup."""
    from finlogic_spark.functions.text import (
        fingerprint,
        lang_id,
        quality_score,
        token_count,
    )
    from finlogic_spark.operators.text_dedup import exact_dedup, simhash_agg

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, None),
            (3, ""),
            (4, "   "),
            (5, "the quick brown fox"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            token_count("text").alias("tc"),
            quality_score("text").alias("q"),
            lang_id("text").alias("lang"),
            fingerprint("text").alias("fp"),
        ).collect()
    }
    assert rows[2]["tc"] is None and rows[2]["fp"] is None
    assert rows[2]["lang"] == "und" and rows[3]["lang"] == "und"
    assert rows[3]["tc"] == 0 and rows[4]["tc"] == 0
    assert rows[1]["fp"] == rows[5]["fp"]

    # exact_dedup: 1≡5 dedupes, 3≡4 dedupe (both canonicalize to ""),
    # the null row passes through (no comparable content).
    kept = sorted(r["doc_id"] for r in exact_dedup(df, "text", "doc_id").collect())
    assert kept == [1, 2, 3]

    # simhash: token-less docs have no fingerprint (and don't crash).
    assert simhash_agg(df, "text", "doc_id").count() == 2
