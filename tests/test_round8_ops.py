"""Round-8 operators: SemDeDup-style semantic dedup (cluster-fenced
cosine dedup) and incremental append to the persisted positional
phrase index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finlogic_spark.operators.search import (
    append_positional_postings,
    build_positional_postings,
    build_positional_postings_table,
    phrase_search,
)
from finlogic_spark.operators.similarity import ivf_assign, semantic_dedup

# Two well-separated centroids on the first two axes.
CENTS = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]


def _emb(spark):
    rows = [
        # cell 0: 10 and 11 are near-identical (cos ~0.9999); 12 is a
        # distinct direction in the same cell (cos ~0.7 to 10).
        (10, [1.0, 0.05, 0.0]),
        (11, [1.0, 0.051, 0.001]),
        (12, [0.8, 0.3, 0.5]),
        # cell 1: 20 alone; 21 is IDENTICAL to 10 but lands in cell 1?
        # no — identical vectors assign identically, so use a cell-1
        # vector 21 identical to 22 to test in-cell dropping there too.
        (20, [0.0, 1.0, 0.2]),
        (21, [0.1, 1.0, 0.0]),
        (22, [0.1, 1.0, 0.0]),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_semantic_dedup_drops_higher_id_within_cell(spark):
    kept = semantic_dedup(_emb(spark), CENTS, threshold=0.99)
    ids = sorted(r.vec_id for r in kept.collect())
    # 11 duplicates 10 (same cell, cos>0.99) -> dropped; 22 duplicates
    # 21 -> dropped; everything else kept.
    assert ids == [10, 12, 20, 21]
    # the kept frame preserves the cell assignment
    cells = {r.vec_id: r.cell for r in kept.collect()}
    assert cells[10] == 0 and cells[21] == 1


def test_semantic_dedup_cell_fence_blocks_cross_cell_compare(spark):
    # Identical vectors in DIFFERENT cells are never compared: build a
    # frame with a pre-assigned cell column splitting two identical
    # vectors apart — both survive (the documented recall loss of the
    # cluster fence).
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 1)],
        "vec_id long, embedding array<double>, cell int",
    )
    kept = semantic_dedup(
        df, CENTS, threshold=0.5, corpus_assigned=True
    )
    assert sorted(r.vec_id for r in kept.collect()) == [1, 2]


def test_semantic_dedup_assigned_matches_unassigned(spark):
    emb = _emb(spark)
    direct = semantic_dedup(emb, CENTS, threshold=0.99)
    pre = ivf_assign(emb, CENTS, "embedding", "cell")
    served = semantic_dedup(
        pre, CENTS, threshold=0.99, corpus_assigned=True
    )
    assert sorted(map(tuple, direct.select("vec_id", "cell").collect())) == \
        sorted(map(tuple, served.select("vec_id", "cell").collect()))


def test_semantic_dedup_transitive_chain_keeps_min_only(spark):
    # a~b and b~c but a!~c: the greedy lower-id rule drops BOTH b and c
    # (b duplicates a; c duplicates b) — one survivor per chain, unlike
    # pair-graph connected components this never needs iteration.
    rows = [
        (1, [1.0, 0.00, 0.0]),
        (2, [1.0, 0.28, 0.0]),   # cos(1,2) ~ 0.963
        (3, [1.0, 0.56, 0.0]),   # cos(2,3) ~ 0.983, cos(1,3) ~ 0.873
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = semantic_dedup(df, CENTS, threshold=0.95)
    assert sorted(r.vec_id for r in kept.collect()) == [1]


# ---------------------------------------------------------------------------
# PPJoin prefix-filtered Jaccard
# ---------------------------------------------------------------------------

def test_jaccard_prefix_identical_to_full_join(spark):
    """The prefix filter must be LOSSLESS: byte-identical pairs and
    scores to the all-shared-shingle formulation, across thresholds,
    on a corpus with near-dups, partial overlaps, disjoint docs, and
    shared stop-shingles (the case the prefix exists to prune)."""
    from finlogic_spark.operators.text_dedup import (
        jaccard_prefix_pairs,
        ngram_jaccard_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base + " tonight"),                      # near-dup of 1
        (3, "the quick brown cat sleeps under the lazy dog at noon"),
        (4, "completely different words in this one document here now"),
        (5, "the the the the the the the the the the the the"),
        (6, base),                                   # exact dup of 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.3, 0.5, 0.8):
        full = sorted(
            map(
                tuple,
                ngram_jaccard_pairs(
                    docs, "text", "doc_id", k=3, threshold=t,
                    max_doc_freq=None,
                ).collect(),
            )
        )
        pref = sorted(
            map(
                tuple,
                jaccard_prefix_pairs(
                    docs, "text", "doc_id", k=3, threshold=t
                ).collect(),
            )
        )
        assert pref == full, (t, pref, full)
    # sanity: the t=0.3 run actually produced pairs (non-vacuous)
    assert len(full) >= 1


def test_jaccard_prefix_candidate_volume_on_skew(spark):
    """The deterministic pair-volume proof of the prefix filter's win
    case: on a boilerplate-heavy corpus (every doc shares a header),
    the plain all-shared-shingle join must expand C(n_docs, 2) pair
    rows PER boilerplate shingle, while the prefix filter's candidate
    pairs stay bounded — the boilerplate shingles have the highest df,
    sort LAST in the canonical order, and never enter a prefix. Counts
    are exact plan outputs, not wall times, so this pins the asymptotic
    claim reproducibly."""
    from finlogic_spark.operators.text_dedup import (
        jaccard_prefix_pairs,
        ngram_jaccard_pairs,
        shingles,
    )

    n_docs = 60
    # 10 boilerplate tokens (-> 8 shared 3-shingles, df=60 each) + 12
    # unique tokens per doc (-> 12 unique shingles): J between any two
    # docs = 8/(20+20-8) = 0.25 < 0.5, and each doc's rarest-first
    # prefix (length 20 - 10 + 1 = 11) holds only its unique shingles.
    header = "terms of service apply to all content on this site"
    rows = [
        (i, header + " " + " ".join(f"u{i}w{j}" for j in range(12)))
        for i in range(n_docs)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # plain join's pre-agg pair volume: sum over shingles of C(df, 2)
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(shingles("text", 3))).alias("s")
    )
    plain_volume = (
        sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
        .select(F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("v"))
        .first()["v"]
    )
    # 8 boilerplate shingles × C(60,2) each
    assert plain_volume >= 8 * (60 * 59 / 2), plain_volume

    # prefix candidates: no doc pair reaches J >= 0.5 (unique tails
    # dominate), and the rare-first prefixes are all unique -> zero
    # candidate pairs even though every doc shares the header.
    pref = jaccard_prefix_pairs(docs, "text", "doc_id", k=3, threshold=0.5)
    assert pref.count() == 0
    full = ngram_jaccard_pairs(
        docs, "text", "doc_id", k=3, threshold=0.5, max_doc_freq=None
    )
    assert full.count() == 0  # same (empty) answer, ~14k vs 0 pair rows


def test_jaccard_prefix_explodes_fewer_candidate_rows(spark):
    """The point of the prefix: strictly fewer candidate-generating
    shingle occurrences than the full explode on a stop-shingle-heavy
    corpus (each doc shares the 'x y' bridge shingles with all)."""
    from finlogic_spark.operators.text_dedup import jaccard_prefix_pairs

    rows = [
        (i, f"common bridge words here unique{i} tail{i} more{i}")
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = jaccard_prefix_pairs(docs, "text", "doc_id", k=3, threshold=0.5)
    # no pair reaches 0.5 (unique tails) — and none should be emitted
    assert out.count() == 0


# ---------------------------------------------------------------------------
# Incremental positional-index append
# ---------------------------------------------------------------------------

def _docs_a(spark):
    return spark.createDataFrame(
        [(1, "the cat sat"), (2, "a table and a table")],
        "doc_id long, text string",
    )


def _docs_b(spark):
    return spark.createDataFrame(
        [(3, "the cat sat on the cat"), (4, "table table table")],
        "doc_id long, text string",
    )


def test_append_positional_equals_rebuild_over_union(spark, tmp_path):
    path = str(tmp_path / "incr_idx")
    idx0 = build_positional_postings_table(_docs_a(spark), path, n_buckets=8)
    idx1 = append_positional_postings(_docs_b(spark), path)
    assert idx1.n_buckets == idx0.n_buckets == 8

    union = _docs_a(spark).unionByName(_docs_b(spark))
    fresh_rows = sorted(
        map(tuple, build_positional_postings(union).collect())
    )
    incr_rows = sorted(
        map(
            tuple,
            idx1.postings.select("token", "doc_id", "pos").collect(),
        )
    )
    assert incr_rows == fresh_rows

    # end-to-end: phrase served from the appended index == from-scratch
    served = {
        r.doc_id: r.n_matches
        for r in phrase_search(union, ["the", "cat"], postings=idx1).collect()
    }
    fresh = {
        r.doc_id: r.n_matches
        for r in phrase_search(union, ["the", "cat"]).collect()
    }
    assert served == fresh == {1: 1, 3: 2}
    # repeated-token phrase sanity on the appended data: doc 2's two
    # 'table's are NOT adjacent (no match); doc 4's three are (2
    # overlapping matches).
    served_t = {
        r.doc_id: r.n_matches
        for r in phrase_search(
            union, ["table", "table"], postings=idx1
        ).collect()
    }
    assert served_t == {4: 2}


def test_forward_index_serves_tfidf_pruned_and_falls_back(spark, tmp_path):
    """The frequency-postings table now ships a forward-index twin
    (_forward, partitioned by doc-id bucket): tf-idf's query-vector
    fetch must (a) produce cosines identical to from-scratch, (b)
    plan a PartitionFilters prune on __doc_bkt rather than a full scan
    of the token-partitioned table, and (c) degrade gracefully (same
    results, full scan) when opening a pre-forward-layout index."""
    import shutil

    from finlogic_spark.operators.search import (
        build_postings_table,
        read_postings,
        tfidf_similar,
    )

    docs = spark.createDataFrame(
        [
            (0, "spark engine for big data"),
            (1, "spark engine for bigger data"),
            (2, "cats and dogs"),
            (3, "dogs and cats and dogs"),
            (4, "completely unrelated text here"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "fwd_idx")
    idx = build_postings_table(docs, path, n_buckets=8)
    assert idx.forward is not None

    live = sorted(map(tuple, tfidf_similar(docs, [0, 2], k=3).collect()))
    served = sorted(
        map(
            tuple,
            tfidf_similar(None, [0, 2], k=3, postings=idx).collect(),
        )
    )
    assert served == live and len(served) > 0

    # (b) the forward fetch is partition-pruned on __doc_bkt: the
    # bucket predicate must appear as a PartitionFilter on the scan,
    # not as a post-scan data filter.
    from finlogic_spark.plans import formatted_plan

    plan = formatted_plan(
        idx.forward.filter(F.col("__doc_bkt").isin([1, 2]))
    )
    part_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ]
    assert part_lines and any("__doc_bkt" in ln for ln in part_lines), plan

    # (c) pre-forward layout: drop _forward, reopen, results identical
    shutil.rmtree(str(tmp_path / "fwd_idx" / "_forward"))
    old = read_postings(spark, path)
    assert old.forward is None
    served_old = sorted(
        map(
            tuple,
            tfidf_similar(None, [0, 2], k=3, postings=old).collect(),
        )
    )
    assert served_old == live


def test_append_uses_sidecar_bucket_count_not_caller(spark, tmp_path):
    # The append path must bucket new tokens with the BUILD-time count:
    # serve-time pruning would silently miss appended rows otherwise.
    path = str(tmp_path / "incr_idx2")
    build_positional_postings_table(_docs_a(spark), path, n_buckets=4)
    idx = append_positional_postings(_docs_b(spark), path)
    buckets = {
        r["__tok_bkt"]
        for r in idx.postings.select("__tok_bkt").distinct().collect()
    }
    assert buckets <= set(range(4)), buckets
    with pytest.raises(ValueError, match="contradicts"):
        phrase_search(
            _docs_a(spark), ["cat"], postings=idx, n_buckets=16
        )
