"""BPE subword tokenization (operators/bpe.py): deterministic learner,
greedy encoder, Arrow-batched corpus stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finlogic_spark.operators.bpe import (
    bpe_doc_stats,
    corpus_word_counts,
    encode_word,
    learn_bpe_merges,
)


def test_learner_classic_example():
    """The Sennrich paper's shape: 'l o w' variants — most frequent
    pair merges first, ties break lexicographically."""
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_bpe_merges(wc, 4)
    # 'es' appears 9x (newest+widest) — the unambiguous first merge;
    # then ('es','t') 9x.
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert len(merges) == 4


def test_learner_deterministic_tiebreak():
    # 'ab' and 'cd' both appear twice; lexicographically smallest wins
    merges = learn_bpe_merges([("ab", 2), ("cd", 2)], 1)
    assert merges == [("a", "b")]


def test_learner_stops_when_nothing_repeats():
    merges = learn_bpe_merges([("abc", 1), ("def", 1)], 50)
    assert merges == []  # every pair is a singleton — noise, not stats
    with pytest.raises(ValueError, match="num_merges"):
        learn_bpe_merges([("ab", 2)], 0)


def test_encode_word_applies_ranks_in_order():
    merges = learn_bpe_merges([("newest", 6), ("widest", 3)], 6)
    ranks = {p: i for i, p in enumerate(merges)}
    pieces = encode_word("newest", ranks)
    assert "".join(pieces) == "newest"
    assert len(pieces) < 6  # merges actually applied
    # unseen word still encodes (falls back toward characters)
    pieces = encode_word("zzz", ranks)
    assert "".join(pieces) == "zzz"
    assert encode_word("a", ranks) == ("a",)


def test_bpe_doc_stats_matches_serial(spark):
    """Distributed Arrow-batched stats == a serial Python recount over
    the same merges (piece counts AND distinct-piece counts)."""
    docs = [
        (1, "the newest tests are the widest tests"),
        (2, "LOWER lower low"),
        (3, None),
        (4, "   "),
        (5, "singleton"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(3)
    wc = corpus_word_counts(df, "text", top_words=100)
    # counts must reflect lowercasing: 'lower' appears 2x
    assert dict(wc)["lower"] == 2
    merges = learn_bpe_merges(wc, 20)
    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"], r["n_distinct_pieces"])
        for r in bpe_doc_stats(df, merges).collect()
    }
    assert set(got) == {1, 2, 5}  # null and whitespace-only drop
    ranks = {p: i for i, p in enumerate(merges)}
    for doc_id, text in docs:
        if text is None or not text.strip():
            continue
        words = text.lower().split()
        pieces = [p for w in words for p in encode_word(w, ranks)]
        assert got[doc_id] == (len(words), len(pieces), len(set(pieces)))


def test_bpe_registry_queries_run(spark, sf_dir):
    from finlogic_spark.driver_queries import QUERIES

    enc = QUERIES["doc_bpe_encode"](spark, sf_dir)
    assert enc.columns == ["doc_id", "n_words", "n_pieces",
                           "n_distinct_pieces"]
    rows = enc.limit(50).collect()
    assert rows and all(
        r["n_pieces"] >= r["n_words"] >= 1 and
        r["n_distinct_pieces"] <= r["n_pieces"]
        for r in rows
    )
    pack = QUERIES["doc_bpe_pack"](spark, sf_dir)
    assert pack.columns == ["doc_id", "shard", "n_pieces", "seq_id"]
    assert pack.filter(F.col("seq_id") < 0).count() == 0


def test_bpe_pieces_order_and_shingles(spark):
    """bpe_pieces preserves document order; array_shingles over pieces
    matches the serial shingle construction (incl. the <k collapse)."""
    from finlogic_spark.operators.text_dedup import array_shingles

    docs = [(1, "newest widest newest"), (2, "ab"), (3, None)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    wc = corpus_word_counts(df, "text", top_words=100)
    merges = learn_bpe_merges(wc, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: list(r["pieces"])
        for r in __import__("finlogic_spark.operators.bpe",
                            fromlist=["bpe_pieces"])
        .bpe_pieces(df, merges).collect()
    }
    for doc_id, text in docs:
        if text is None:
            assert doc_id not in got
            continue
        want = [p for w in text.lower().split() for p in encode_word(w, ranks)]
        assert got[doc_id] == want, doc_id
    # shingle parity incl. short-sequence collapse
    sdf = spark.createDataFrame(
        [(1, ["a", "b", "c", "d"]), (2, ["x", "y"])],
        "id long, arr array<string>",
    )
    sh = {
        r["id"]: list(r["s"])
        for r in sdf.select(
            "id", array_shingles(F.col("arr"), 3).alias("s")
        ).collect()
    }
    assert sh[1] == ["a b c", "b c d"]
    assert sh[2] == ["x y"]
