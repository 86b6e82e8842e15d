"""Distinct-count sketches (operators/distinct_sketch.py), the exact
heavy-hitters screen (operators/freq.py), and the streaming HLL state
op (streaming/stateful.py hll_distinct_stream)."""

import glob as _glob
import shutil as _shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from finlogic_spark.operators.distinct_sketch import (
    PyHLL,
    hll_sketch_table,
    hll_table_estimate,
)
from finlogic_spark.operators.freq import frequency_screen, heavy_hitters


# ---------------------------------------------------------------------------
# PyHLL
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [1, 30, 150, 1500, 20_000, 100_000])
def test_pyhll_error_band(n):
    h = PyHLL(13)
    h.add_ints(np.arange(n, dtype=np.int64) * 7919 + 3)
    est = h.estimate()
    # registry band is 6%; pin tighter here (worst measured: 2.9% at
    # the linear-counting crossover ~2.5m)
    assert abs(est - n) / n <= 0.04, (n, est)


def test_pyhll_order_and_batching_invariant():
    """Register updates are max() — insert order, chunking, and
    duplicate re-insertion must not move the estimate AT ALL (this is
    the property that makes the streaming estimate equal the batch
    one)."""
    v = np.arange(5000, dtype=np.int64)
    a = PyHLL(13)
    a.add_ints(v)
    b = PyHLL(13)
    perm = np.random.default_rng(7).permutation(v)
    for chunk in np.array_split(perm, 11):
        b.add_ints(chunk)
        b.add_ints(chunk)  # at-least-once replay is a no-op
    assert a.estimate() == b.estimate()


def test_pyhll_merge_equals_union_build():
    lo = np.arange(0, 3000, dtype=np.int64)
    hi = np.arange(2000, 6000, dtype=np.int64)  # overlapping
    a = PyHLL(13)
    a.add_ints(lo)
    b = PyHLL(13)
    b.add_ints(hi)
    both = PyHLL(13)
    both.add_ints(np.concatenate([lo, hi]))
    assert a.merge(b).estimate() == both.estimate()


def test_pyhll_wire_roundtrip_and_guards():
    h = PyHLL(13)
    h.add_ints(np.arange(1234, dtype=np.int64))
    back = PyHLL.from_bytes(13, h.to_bytes())
    assert back.estimate() == h.estimate()
    with pytest.raises(ValueError, match="bytes"):
        PyHLL.from_bytes(12, h.to_bytes())  # wrong lgk for blob size
    with pytest.raises(ValueError, match="merge"):
        PyHLL(12).merge(PyHLL(13))
    assert PyHLL(13).estimate() == 0.0  # empty sketch is 0, not NaN


# ---------------------------------------------------------------------------
# JVM HLL sketch tables (Datasketches) + parquet round trip
# ---------------------------------------------------------------------------


def test_hll_sketch_table_rollup_roundtrip(spark, tmp_path):
    """Daily sketch rows written to parquet, read back, merged across
    days: the estimate over the union must land within the lgk=12 band
    of the exact distinct — certifying the binary survives the
    parquet round trip (a corrupted sketch misses by orders of
    magnitude, not percent)."""
    rng = np.random.RandomState(11)
    rows = [
        (int(day), "g" + str(int(g)), int(uid))
        for day, g, uid in zip(
            rng.randint(0, 7, 20_000),
            rng.randint(0, 3, 20_000),
            rng.randint(0, 4000, 20_000),
        )
    ]
    df = spark.createDataFrame(rows, "day int, grp string, uid long")
    daily = hll_sketch_table(df, ["day", "grp"], "uid", lgk=12)
    p = str(tmp_path / "hll")
    daily.write.parquet(p)
    est = {
        r["grp"]: r["approx"]
        for r in hll_table_estimate(
            spark.read.parquet(p), ["grp"], "approx"
        ).collect()
    }
    exact = {
        r["grp"]: r["x"]
        for r in df.groupBy("grp")
        .agg(F.count_distinct("uid").alias("x"))
        .collect()
    }
    assert set(est) == set(exact)
    for g in exact:
        assert abs(est[g] - exact[g]) / exact[g] <= 0.06, (g, est[g], exact[g])


# ---------------------------------------------------------------------------
# Heavy hitters
# ---------------------------------------------------------------------------


def _zipf_items(spark, n_rows=60_000, n_parts=8, seed=3):
    rng = np.random.RandomState(seed)
    # skewed discrete distribution: a few very heavy items + long tail
    items = np.where(
        rng.rand(n_rows) < 0.5,
        rng.randint(0, 12, n_rows),  # 12 heavy items share half the mass
        rng.zipf(1.5, n_rows) + 12,
    )
    return spark.createDataFrame(
        [("it" + str(int(i)),) for i in items], "item string"
    ).repartition(n_parts)


def test_heavy_hitters_exact_vs_groupby(spark):
    """The two-scan screen+verify result must equal the brute-force
    groupBy/HAVING answer exactly — same items, same counts."""
    df = _zipf_items(spark)
    phi = 0.01
    got = {
        r["item"]: r["cnt"]
        for r in heavy_hitters(df, "item", phi).collect()
    }
    n = df.count()
    want = {
        r["item"]: r["cnt"]
        for r in df.groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= phi * n)
        .collect()
    }
    assert got == want and len(want) > 0


def test_frequency_screen_is_superset_and_bounded(spark):
    """Screen guarantee: every true phi-heavy item appears among the
    candidates (no-miss), and the candidate volume per partition is
    bounded by 2/phi (the Misra-Gries k)."""
    df = _zipf_items(spark, n_parts=6, seed=9)
    phi = 0.02
    scr = frequency_screen(df, "item", phi).collect()
    cand = {r["item"] for r in scr if r["item"] is not None}
    totals = [r["__cnt"] for r in scr if r["item"] is None]
    n = sum(totals)
    assert len(totals) == 6  # one total row per partition
    exact = df.groupBy("item").count().collect()
    true_hh = {r["item"] for r in exact if r["count"] >= phi * n}
    assert true_hh <= cand
    assert len(cand) <= 6 * (2 / phi)


def test_heavy_hitters_rejects_bad_phi(spark):
    df = _zipf_items(spark, n_rows=100, n_parts=1)
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(df, "item", 0.0)


# ---------------------------------------------------------------------------
# Streaming HLL state
# ---------------------------------------------------------------------------


def test_stream_hll_state_equals_batch_build(spark, tmp_path):
    """Three micro-batches of ids folded through keyed state must give
    EXACTLY the single-shot PyHLL estimate over all ids (order
    independence), and land inside the band of the true distinct."""
    from finlogic_spark.streaming import drain_stream_to_df
    from finlogic_spark.streaming.stateful import hll_distinct_stream

    rng = np.random.RandomState(31)
    src = tmp_path / "src"
    all_ids: dict[str, list[int]] = {"a": [], "b": []}
    eid = 0
    for part in range(3):
        rows = []
        for g in ("a", "b"):
            ids = rng.randint(0, 2500, 3000)
            all_ids[g].extend(int(u) for u in ids)
            for u in ids:
                rows.append(
                    (eid, 1700000000000000000 + eid, int(u), g, 1.0, "{}")
                )
                eid += 1
        spark.createDataFrame(
            rows,
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.parquet(str(src / f"part{part}"))
    for i, f in enumerate(sorted(_glob.glob(str(src / "part*" / "*.parquet")))):
        _shutil.copy(f, str(src / f"events_{i}.parquet"))
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src / "part0")).schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events_*.parquet")
        .parquet(str(src))
    )
    out = drain_stream_to_df(hll_distinct_stream(stream), output_mode="update")
    finals = {}
    for r in out.collect():
        if r["event_type"] not in finals or r["n"] > finals[r["event_type"]]["n"]:
            finals[r["event_type"]] = r
    assert set(finals) == {"a", "b"}
    for g, r in finals.items():
        assert r["n"] == len(all_ids[g])
        batch = PyHLL(13)
        batch.add_ints(np.array(all_ids[g], dtype=np.int64))
        assert r["approx_users"] == batch.estimate()
        exact = len(set(all_ids[g]))
        assert abs(r["approx_users"] - exact) / exact <= 0.06


# ---------------------------------------------------------------------------
# Streaming sharded Misra-Gries heavy tokens
# ---------------------------------------------------------------------------


def test_stream_heavy_tokens_superset_and_exact_verify(spark, tmp_path):
    """Three micro-batches of documents through the sharded-MG state
    op: the drained candidate set must contain every true phi-heavy
    token (the MG no-miss bound), totals must be exact, and the
    batch-side verify must reproduce the brute-force answer."""
    from collections import Counter

    from finlogic_spark.streaming import drain_stream_to_df
    from finlogic_spark.streaming.stateful import heavy_tokens_stream

    rng = np.random.RandomState(23)
    vocab = ["hot%d" % i for i in range(5)] + [
        "tail%d" % i for i in range(2000)
    ]
    weights = np.array([200.0] * 5 + [1.0] * 2000)
    weights /= weights.sum()
    src = tmp_path / "src"
    truth: Counter = Counter()
    did = 0
    for part in range(3):
        rows = []
        for _ in range(300):
            toks = rng.choice(vocab, size=40, p=weights)
            truth.update(toks)
            rows.append((did, " ".join(toks), "en", "s", 40))
            did += 1
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.parquet(str(src / f"part{part}"))
    for i, f in enumerate(sorted(_glob.glob(str(src / "part*" / "*.parquet")))):
        _shutil.copy(f, str(src / f"documents_{i}.parquet"))
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src / "part0")).schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "documents_*.parquet")
        .parquet(str(src))
    )
    drained = drain_stream_to_df(
        heavy_tokens_stream(stream, num_shards=8), output_mode="update"
    )
    finals = {}
    for r in drained.collect():
        if r["shard"] not in finals or r["n"] > finals[r["shard"]]["n"]:
            finals[r["shard"]] = r
    n = sum(r["n"] for r in finals.values())
    assert n == sum(truth.values())
    cand = set()
    for r in finals.values():
        cand.update(r["items"])
    phi = 0.01
    true_hh = {t for t, c in truth.items() if c >= phi * n}
    assert true_hh  # the 5 hot tokens qualify
    assert true_hh <= cand
    # exact verify on candidates reproduces brute force
    exact = {t: truth[t] for t in cand if truth[t] >= phi * n}
    assert exact == {t: c for t, c in truth.items() if c >= phi * n}


def test_hll_window_estimate_band(spark):
    """Trailing-3-day windowed estimates from daily sketch rows must
    land within the band of the exact windowed distinct for every
    (group, day)."""
    import datetime

    from finlogic_spark.operators.distinct_sketch import (
        hll_sketch_table,
        hll_window_estimate,
    )

    rng = np.random.RandomState(13)
    base = datetime.date(2024, 3, 1)
    rows = [
        (base + datetime.timedelta(days=int(d)), "g%d" % (g,), int(u))
        for d, g, u in zip(
            rng.randint(0, 6, 30_000),
            rng.randint(0, 2, 30_000),
            rng.randint(0, 3000, 30_000),
        )
    ]
    df = spark.createDataFrame(rows, "day date, grp string, uid long")
    daily = hll_sketch_table(df, ["day", "grp"], "uid", lgk=12)
    est = {
        (r["grp"], r["day"]): r["approx"]
        for r in hll_window_estimate(
            daily, ["grp"], "day", 3, "approx"
        ).collect()
    }
    exact = {}
    from collections import defaultdict

    sets = defaultdict(set)
    for day, g, u in rows:
        sets[(g, day)].add(u)
    for g, day in est:
        win = set()
        for back in range(3):
            win |= sets.get((g, day - datetime.timedelta(days=back)), set())
        exact[(g, day)] = len(win)
    assert set(est) == set(exact)
    for k in exact:
        assert abs(est[k] - exact[k]) / exact[k] <= 0.06, (k, est[k], exact[k])


# ---------------------------------------------------------------------------
# KMV set-operation sketch
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k_and_wire_roundtrip():
    from finlogic_spark.operators.distinct_sketch import KMV

    ids = np.arange(900, dtype=np.int64)
    s = KMV(1024)
    for chunk in np.array_split(ids, 5):
        s.add_ints(chunk)
        s.add_ints(chunk)  # idempotent
    assert s.distinct_estimate() == 900.0  # below k: exact
    rt = KMV.from_longs(1024, s.to_longs())
    assert np.array_equal(rt.hashes, s.hashes)
    with pytest.raises(ValueError, match="k"):
        KMV(8)
    with pytest.raises(ValueError, match="merge"):
        KMV(64).merge(KMV(128))


def test_kmv_merge_equals_union_build():
    from finlogic_spark.operators.distinct_sketch import KMV

    lo = np.arange(0, 40_000, dtype=np.int64)
    hi = np.arange(30_000, 90_000, dtype=np.int64)
    a, b, u = KMV(512), KMV(512), KMV(512)
    a.add_ints(lo)
    b.add_ints(hi)
    u.add_ints(np.concatenate([lo, hi]))
    assert np.array_equal(a.merge(b).hashes, u.hashes)


def test_kmv_intersection_error_band():
    """Super-k regime: rho-estimator error across seeds stays within
    the modeled band (~1/sqrt(k) on the union, scaled by union/inter)."""
    from finlogic_spark.operators.distinct_sketch import KMV

    k = 4096
    rels = []
    for seed in range(8):
        rng = np.random.RandomState(seed)
        A = rng.choice(50_000_000, 60_000, replace=False)
        B = np.concatenate(
            [A[:15_000],
             rng.choice(np.arange(50_000_000, 99_000_000), 45_000, replace=False)]
        )
        ka, kb = KMV(k), KMV(k)
        ka.add_ints(A)
        kb.add_ints(B)
        exact = len(np.intersect1d(A, B))
        est = KMV.intersection_estimate(ka, kb)
        rels.append(abs(est - exact) / exact)
    # union/inter = 7; 3 sigma ~ 3 * sqrt(rho(1-rho)/k) / rho ~ 0.12
    assert max(rels) <= 0.15, rels
    assert sum(rels) / len(rels) <= 0.06, rels


def test_kmv_sketch_table_pair_overlap(spark):
    """Distributed build + pair estimator: below-k groups are exact, so
    the pair overlaps must equal the true intersections exactly."""
    from finlogic_spark.operators.distinct_sketch import (
        kmv_pair_overlap,
        kmv_sketch_table,
    )

    rng = np.random.RandomState(3)
    rows = []
    sets = {"a": set(), "b": set(), "c": set()}
    for g, lo, hi in (("a", 0, 800), ("b", 400, 1200), ("c", 0, 1500)):
        ids = rng.randint(lo, hi, 2000)
        sets[g].update(int(u) for u in ids)
        rows += [(g, int(u)) for u in ids]
    df = spark.createDataFrame(rows, "grp string, uid long").repartition(6)
    sk = kmv_sketch_table(df, ["grp"], "uid", k=4096)
    assert all(r["__k"] == 4096 for r in sk.select("__k").collect())
    got = {
        (r["key_a"], r["key_b"]): r["approx_overlap"]
        for r in kmv_pair_overlap(sk, "grp").collect()
    }
    for (x, y), v in got.items():
        assert v == len(sets[x] & sets[y]), (x, y, v)
    assert len(got) == 3


def test_xxhash64_long_matches_spark(spark):
    """The numpy XXH64 kernel is bit-identical to Spark's
    xxhash64(bigint) — the contract that makes JVM-built and
    Python-built KMV sketches one wire format."""
    from finlogic_spark.operators.distinct_sketch import xxhash64_long

    vals = np.array(
        [0, 1, -1, 12345, 2**62, -(2**63), 2**63 - 1, 987654321012345],
        dtype=np.int64,
    )
    jvm = [
        r.h
        for r in spark.sql(
            "SELECT xxhash64(CAST(v AS BIGINT)) AS h FROM VALUES "
            + ", ".join(f"({int(v)})" for v in vals)
            + " t(v)"
        ).collect()
    ]
    assert jvm == [int(x) for x in xxhash64_long(vals).view(np.int64)]


def test_kmv_jvm_build_equals_python_build(spark):
    """kmv_sketch_table (all-JVM slice/array_sort build) emits byte-
    for-byte the wire longs a Python KMV.add_ints build produces over
    the same values — including the super-k truncation."""
    from finlogic_spark.operators.distinct_sketch import KMV, kmv_sketch_table

    rng = np.random.RandomState(7)
    k = 64
    vals = {
        "x": rng.randint(-(2**62), 2**62, 500, dtype=np.int64),
        "y": rng.randint(0, 40, 300, dtype=np.int64),  # below k: exact
    }
    rows = [(g, int(v)) for g, arr in vals.items() for v in arr]
    df = spark.createDataFrame(rows, "grp string, uid long").repartition(5)
    got = {
        r["grp"]: list(r["__kmv"])
        for r in kmv_sketch_table(df, ["grp"], "uid", k=k).collect()
    }
    for g, arr in vals.items():
        py = KMV(k)
        py.add_ints(arr)
        assert got[g] == py.to_longs(), g


def test_kmv_rejects_non_integral_value_column(spark):
    """A string value column must raise, not silently cast→NULL→seed
    (which collapses every uncastable value onto one distinct hash)."""
    import pytest
    from finlogic_spark.operators.distinct_sketch import kmv_sketch_table

    df = spark.createDataFrame(
        [("a", "user_1"), ("a", "user_2")], "grp string, uid string"
    )
    with pytest.raises(TypeError, match="integral"):
        kmv_sketch_table(df, ["grp"], "uid")


def test_kmv_wire_tag_guards_hash_change(spark):
    """The persisted format carries its hash identity: a table without
    the __hash tag (pre-xxhash64 era) is refused at the operator edge,
    and a blob tagged with a DIFFERENT hash is refused at decode — both
    failure modes previously produced silently-garbage estimates."""
    import pytest
    from finlogic_spark.operators.distinct_sketch import (
        KMV,
        KMV_WIRE_TAG,
        kmv_pair_overlap,
        kmv_sketch_table,
    )

    df = spark.createDataFrame(
        [("a", i) for i in range(50)] + [("b", i) for i in range(25, 75)],
        "grp string, uid long",
    )
    sk = kmv_sketch_table(df, ["grp"], "uid", k=64)
    assert sk.columns == ["grp", "__k", "__hash", "__kmv"]
    assert {r["__hash"] for r in sk.select("__hash").collect()} == {
        KMV_WIRE_TAG
    }
    # round-trips: a tagged table still estimates
    got = kmv_pair_overlap(sk, "grp").collect()
    assert len(got) == 1 and got[0]["approx_overlap"] > 0

    legacy = sk.drop("__hash")  # a table persisted before the break
    with pytest.raises(ValueError, match="__hash"):
        kmv_pair_overlap(legacy, "grp")

    with pytest.raises(ValueError, match="wire tag mismatch"):
        KMV.from_longs(64, [1, 2, 3], wire_tag="splitmix64:0")
