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


def test_pack_segments_invariants(spark):
    """Segment rows reconstruct the concatenation exactly: per doc the
    segment lengths sum to the doc length with contiguous offsets; per
    (shard, seq) the lengths sum to the budget for every sequence but
    the shard's last; zero-length docs emit nothing."""
    import numpy as np

    from finlogic_spark.operators.corpus import pack_segments

    rng = np.random.RandomState(2)
    rows = [
        (i, int(i % 3), int(l))
        for i, l in enumerate(rng.randint(0, 40, 200))
    ]
    df = spark.createDataFrame(rows, "doc_id long, shard int, n long")
    B = 16
    segs = pack_segments(df, "doc_id", "shard", "n", B).collect()
    by_doc: dict = {}
    by_seq: dict = {}
    for r in segs:
        assert 0 < r["seg_len"] <= B
        by_doc.setdefault(r["doc_id"], []).append(r)
        by_seq.setdefault((r["shard"], r["seq_id"]), 0)
        by_seq[(r["shard"], r["seq_id"])] += r["seg_len"]
    lens = dict((i, l) for i, _, l in rows)
    for doc_id, parts in by_doc.items():
        parts.sort(key=lambda r: r["seq_id"])
        assert sum(p["seg_len"] for p in parts) == lens[doc_id]
        assert parts[0]["doc_offset"] == 0
        for a, b in zip(parts, parts[1:]):
            assert b["doc_offset"] == a["doc_offset"] + a["seg_len"]
            assert b["seq_id"] == a["seq_id"] + 1
    for doc_id, l in lens.items():
        assert (doc_id in by_doc) == (l > 0)
    # every sequence except each shard's last is exactly full
    last_seq = {}
    for (shard, seq), _ in by_seq.items():
        last_seq[shard] = max(last_seq.get(shard, -1), seq)
    for (shard, seq), total in by_seq.items():
        if seq != last_seq[shard]:
            assert total == B, (shard, seq, total)
    with __import__("pytest").raises(ValueError, match="budget"):
        pack_segments(df, "doc_id", "shard", "n", 0)


def test_bpe_index_persist_append_equals_rebuild(spark, tmp_path):
    """Persisted BPE serving index (build_bpe_index): append of a new
    corpus batch under FROZEN merges must land exactly the word set a
    from-scratch word_pieces rebuild over the union would (encode_word
    is pure, so per-word pieces are identical by construction — the
    frozen-parameter ANN-append contract); reading back must refuse a
    version mismatch; and serving with the persisted lookup must be
    bit-identical to the unseeded encode path."""
    import pytest

    from finlogic_spark.operators.bpe import (
        BPE_INDEX_VERSION,
        append_bpe_index,
        bpe_doc_stats,
        build_bpe_index,
        load_pieces_lookup,
        read_bpe_index,
        _encode_words_df,
    )

    a = spark.createDataFrame(
        [(i, f"lower lowest slower slow low war newer new {i}")
         for i in range(40)],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(100 + i, f"widened widen wide wider unseen{i}") for i in range(10)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "bpe_idx")
    build_bpe_index(a, path, num_merges=30, top_words=1000)
    merges, wp_before = read_bpe_index(spark, path)
    n_before = wp_before.count()
    added = append_bpe_index(b, path)
    assert added > 0
    merges_after, wp_after = read_bpe_index(spark, path)
    assert merges_after == merges  # frozen model
    # append == rebuild-with-frozen-merges over the union vocabulary
    from pyspark.sql import functions as F
    from finlogic_spark.functions.text import tokens

    union_words = (
        a.unionByName(b)
        .select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rebuilt = {
        r["word"]: tuple(r["pieces"])
        for r in _encode_words_df(union_words, merges).collect()
    }
    appended = {
        r["word"]: tuple(r["pieces"]) for r in wp_after.collect()
    }
    assert appended == rebuilt
    assert wp_after.count() == n_before + added

    # served (seeded-cache) path == unseeded path, bit for bit
    lk = load_pieces_lookup(spark, path)
    got_served = sorted(
        map(tuple, bpe_doc_stats(b, merges, pieces_lookup=lk).collect())
    )
    got_plain = sorted(map(tuple, bpe_doc_stats(b, merges).collect()))
    assert got_served == got_plain

    # version guard
    stats = spark.read.parquet(f"{path}/_stats").collect()[0]
    spark.createDataFrame(
        [(BPE_INDEX_VERSION + 1, stats["num_merges"], stats["top_words"])],
        "version int, num_merges int, top_words int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_stats")
    with pytest.raises(ValueError, match="version"):
        read_bpe_index(spark, path)


def test_pieces_lookup_caps_to_frequency_head(spark, tmp_path):
    """The serving lookup is BOUNDED: max_words caps the collect to the
    most frequent words (count desc, word asc) — an uncapped vocabulary
    collect would be a driver hazard on a real corpus."""
    from finlogic_spark.operators.bpe import (
        build_bpe_index,
        load_pieces_lookup,
    )

    docs = spark.createDataFrame(
        [(0, "alpha alpha alpha beta beta gamma")], "doc_id long, text string"
    )
    path = str(tmp_path / "bpe_cap")
    build_bpe_index(docs, path, num_merges=5, top_words=100)
    lk = load_pieces_lookup(spark, path, max_words=2)
    assert set(lk) == {"alpha", "beta"}  # the frequency head, not gamma
