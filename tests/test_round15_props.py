"""Round-15 contract pins: the leakage-safe cluster split (no LSH
candidate pair may straddle train/val) and the deterministic epoch
ordering (repartition-invariant, seed-sensitive, dense per-shard
positions)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from finlogic_spark.operators.corpus import epoch_order


def _docs(spark, n=120, dups=True):
    """Tiny corpus with deliberate near-duplicate groups: ids i and
    i+1000 share identical text for every i % 5 == 0, so LSH must pair
    them and the cluster split must co-locate them."""
    rows = []
    for i in range(n):
        body = f"alpha beta gamma delta epsilon zeta eta theta doc {i}"
        rows.append((i, body))
        if dups and i % 5 == 0:
            rows.append((i + 1000, body))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cluster_split_never_straddles_lsh_pairs(spark):
    """The contamination invariant itself, end-to-end on the real
    operators: for EVERY LSH candidate pair, both docs land on the
    same side of the split (split is a function of the shared cluster
    label, but this pins the composition, not the algebra)."""
    from finlogic_spark.operators.graph import connected_components
    from finlogic_spark.operators.text_dedup import minhash_lsh_pairs

    d = _docs(spark)
    pairs = minhash_lsh_pairs(d, "text", "doc_id", k=3, num_hashes=6, bands=2)
    cc = connected_components(
        pairs, d.select("doc_id"), src="id_a", dst="id_b", id_col="doc_id"
    )
    split = {
        r["doc_id"]: (r["cluster"], r["split"])
        for r in cc.select(
            F.col("id").alias("doc_id"),
            F.col("label").alias("cluster"),
            F.when(
                F.substring(F.md5(F.col("label").cast("string")), 1, 2)
                < "e6",
                "train",
            )
            .otherwise("val")
            .alias("split"),
        ).collect()
    }
    got_pairs = pairs.collect()
    assert got_pairs, "fixture must produce LSH candidate pairs"
    for r in got_pairs:
        ca, sa = split[r["id_a"]]
        cb, sb = split[r["id_b"]]
        assert ca == cb and sa == sb, (r["id_a"], r["id_b"], sa, sb)
    # and the split actually matches the md5-threshold definition
    for doc, (cluster, s) in split.items():
        want = (
            "train"
            if hashlib.md5(str(cluster).encode()).hexdigest()[:2] < "e6"
            else "val"
        )
        assert s == want


def test_epoch_order_repartition_invariant_and_seeded(spark):
    """The doc_domain_mix precedent: the epoch permutation must be a
    pure function of (seed, id) — identical under any input
    partitioning — and a different seed must produce a different
    permutation. Positions are dense 1..n per shard."""
    d = spark.createDataFrame(
        [(i, i * 3) for i in range(300)], "doc_id long, payload long"
    )
    base = {
        r["doc_id"]: (r["shard"], r["position"])
        for r in epoch_order(d, "doc_id", seed=7, n_shards=4).collect()
    }
    re = {
        r["doc_id"]: (r["shard"], r["position"])
        for r in epoch_order(
            d.repartition(13, "payload"), "doc_id", seed=7, n_shards=4
        ).collect()
    }
    assert base == re
    other = {
        r["doc_id"]: (r["shard"], r["position"])
        for r in epoch_order(d, "doc_id", seed=8, n_shards=4).collect()
    }
    assert other != base
    # dense positions per shard, and the shard bucket matches md5 hex
    per_shard: dict = {}
    for doc, (shard, pos) in base.items():
        per_shard.setdefault(shard, []).append(pos)
        h = hashlib.md5(f"7:{doc}".encode()).hexdigest()
        assert shard == int(h[:4], 16) % 4
    for shard, ps in per_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def _excise_docs(spark):
    """Shared 400-char block embedded at different offsets inside
    otherwise-distinct documents, plus clean docs — the operator's
    target shape (regions, not whole-doc duplicates)."""
    import random

    rng = random.Random(99)
    words = ["w%03d" % i for i in range(500)]
    block = " ".join("common%02d" % (i % 40) for i in range(80))[:400]
    rows = []
    for i in range(6):
        pre = " ".join(rng.choice(words) for _ in range(30 + i * 7))
        post = " ".join(rng.choice(words) for _ in range(40 + i * 5))
        rows.append((i, f"{pre} {block} {post}"))
    for i in range(6, 12):
        rows.append((i, " ".join(rng.choice(words) for _ in range(90))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_excise_removes_shared_and_preserves_clean(spark):
    """The Lee-et-al invariant pair: (a) after excision NO sampled
    span is shared across documents (checked by re-running the
    operator on its own output — a fixpoint), (b) documents with no
    shared span come back byte-identical, (c) every block-carrying doc
    actually lost characters."""
    from finlogic_spark.operators.text_dedup import substring_excise

    d = _excise_docs(spark)
    out = substring_excise(d, "text", "doc_id", span_len=40, sel_nibbles=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    orig = {r["doc_id"]: r["text"] for r in d.collect()}
    for i in range(6):
        assert rows[i]["n_intervals"] >= 1, rows[i]
        assert rows[i]["excised_chars"] > 0
        assert len(rows[i]["new_text"]) == len(orig[i]) - rows[i][
            "excised_chars"
        ]
    for i in range(6, 12):
        assert rows[i]["n_intervals"] == 0
        assert rows[i]["new_text"] == orig[i]  # byte-identical
    # fixpoint: re-run on the rebuilt corpus -> zero shared spans
    again = substring_excise(
        out.select("doc_id", F.col("new_text").alias("text")),
        "text",
        "doc_id",
        span_len=40,
        sel_nibbles=1,
    )
    assert again.agg(F.sum("n_intervals")).collect()[0][0] == 0


def test_substring_excise_interval_merge_exact(spark):
    """Adjacent/overlapping sampled spans must coalesce into ONE
    interval whose arithmetic is exact: a doc whose entire text is the
    shared block excises to the empty string, not a crash or a
    partial."""
    from finlogic_spark.operators.text_dedup import substring_excise

    block = " ".join("zz%02d" % (i % 25) for i in range(100))
    d = spark.createDataFrame(
        [(1, block), (2, block), (3, "totally unrelated text here")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in substring_excise(
        d, "text", "doc_id", span_len=40, sel_nibbles=1
    ).collect()}
    # identical whole docs: every sampled span is shared; the merged
    # interval(s) cover nearly everything sampled
    assert rows[1]["excised_chars"] > 0
    assert rows[1]["new_text"] == rows[2]["new_text"]
    assert len(rows[1]["new_text"]) == len(block) - rows[1]["excised_chars"]
    assert rows[3]["new_text"] == "totally unrelated text here"


def test_epoch_order_rejects_bad_shards(spark):
    import pytest

    d = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="n_shards"):
        epoch_order(d, "doc_id", seed=1, n_shards=0)


def test_length_batches_invariants(spark):
    """The padded-batch loader contract: (a) every positive-length doc
    lands in exactly one batch; (b) within a batch all lengths share a
    bit length, so max/min <= 2; (c) batch positions are dense
    0..size-1 with only the LAST batch of a (shard, class) partial;
    (d) the assignment is repartition-invariant."""
    from finlogic_spark.operators.corpus import length_batches

    rows = [(i, (i * 37) % 500) for i in range(600)]  # lengths 0..499
    d = spark.createDataFrame(rows, "doc_id long, n long")
    out = length_batches(
        d, "doc_id", "n", seed=9, n_shards=4, batch_size=8
    ).collect()
    pos = [r for r in rows if r[1] > 0]
    assert len(out) == len(pos)  # zero-length docs excluded
    groups: dict = {}
    for r in out:
        assert r["len_class"] == r["n"].bit_length()
        groups.setdefault(
            (r["shard"], r["len_class"], r["batch_id"]), []
        ).append(r)
    for (shard, cls, bid), rs in groups.items():
        lens = [r["n"] for r in rs]
        assert max(lens) <= 2 * min(lens)
        positions = sorted(r["pos_in_batch"] for r in rs)
        assert positions == list(range(len(rs)))
        if len(rs) < 8:  # partial batch must be the last of its class
            last = max(
                b for (s, c, b) in groups if s == shard and c == cls
            )
            assert bid == last
    re = length_batches(
        d.repartition(17, "n"), "doc_id", "n", seed=9, n_shards=4,
        batch_size=8,
    ).collect()
    key = lambda r: (r["doc_id"], r["shard"], r["len_class"],
                     r["batch_id"], r["pos_in_batch"])
    assert sorted(map(key, out)) == sorted(map(key, re))


def test_sticky_split_assign_semantics(spark):
    """The four assignment rules, pinned on a hand-built graph:
    stored docs keep their side verbatim; a new doc whose component
    holds one stored side inherits it (even though the merge changed
    the canonical label); a new doc bridging components stored on BOTH
    sides quarantines; a fully-new component uses the cluster-hash
    rule. Plus the leakage invariant: no pair straddles train/val
    (quarantine excluded)."""
    import hashlib

    from finlogic_spark.operators.graph import sticky_split_assign

    # stored: 10 (train-ish side as stored), 20 (other side), 30 alone
    stored = spark.createDataFrame(
        [(10, "train"), (20, "val"), (30, "train")],
        "doc_id long, split string",
    )
    # pairs: new 5 joins 10's component (5 becomes the new min label);
    # new 15 bridges 10 and 20 (conflict); 40,41 are a new-only pair;
    # 50 is isolated-new
    pairs = spark.createDataFrame(
        [(5, 10), (15, 10), (15, 20), (40, 41)], "id_a long, id_b long"
    )
    ids = spark.createDataFrame(
        [(i,) for i in (5, 10, 15, 20, 30, 40, 41, 50)], "doc_id long"
    )
    out = {
        r["doc_id"]: (r["cluster"], r["split"])
        for r in sticky_split_assign(pairs, ids, stored).collect()
    }
    # the bridge merges {5,10,15,20} into one component labeled 5
    assert out[10] == (5, "train") and out[20] == (5, "val")  # sticky
    assert out[5][1] == "quarantine" and out[15][1] == "quarantine"
    assert out[30] == (30, "train")
    # new-only component: hash of canonical label (40)
    want = (
        "train"
        if hashlib.md5(b"40").hexdigest()[:2] < "e6"
        else "val"
    )
    assert out[40] == (40, want) and out[41] == (40, want)
    w50 = (
        "train"
        if hashlib.md5(b"50").hexdigest()[:2] < "e6"
        else "val"
    )
    assert out[50] == (50, w50)
    # leakage invariant: no pair with both ends in {train, val} differs
    for a, b in [(5, 10), (15, 10), (15, 20), (40, 41)]:
        sa, sb = out[a][1], out[b][1]
        if "quarantine" not in (sa, sb):
            assert sa == sb, (a, b, sa, sb)


def test_sticky_split_assign_inherit_single_side(spark):
    """No-conflict inherit: a new doc pairing with a stored doc takes
    the stored side even when the new doc's smaller id becomes the
    component's canonical label (the exact case where the hash rule
    would flip)."""
    from finlogic_spark.operators.graph import sticky_split_assign

    stored = spark.createDataFrame([(100, "val")], "doc_id long, split string")
    pairs = spark.createDataFrame([(1, 100)], "id_a long, id_b long")
    ids = spark.createDataFrame([(1,), (100,)], "doc_id long")
    out = {
        r["doc_id"]: (r["cluster"], r["split"])
        for r in sticky_split_assign(pairs, ids, stored).collect()
    }
    assert out[1] == (1, "val") and out[100] == (1, "val")


def test_length_batches_rejects_bad_params(spark):
    import pytest

    from finlogic_spark.operators.corpus import length_batches

    d = spark.createDataFrame([(1, 5)], "doc_id long, n long")
    with pytest.raises(ValueError, match="n_shards"):
        length_batches(d, "doc_id", "n", seed=1, n_shards=0, batch_size=8)
    with pytest.raises(ValueError, match="batch_size"):
        length_batches(d, "doc_id", "n", seed=1, n_shards=4, batch_size=0)
