"""Bloom-filter semi-join reduction — prune a huge probe side with a
compact bit-set built from the (filtered) build side BEFORE the shuffle
join moves the probe's bytes (engine-scope addition; Spark itself
injects these as AQE runtime filters — `InjectRuntimeFilter`,
`spark.sql.optimizer.runtime.bloomFilter.enabled` — but only under
planner heuristics; this operator makes the reduction explicit,
tunable, and available to any join the caller wants reduced).

Why this is the 100 TB shape: a fact⋈dim join where the dim carries a
selective predicate shuffles the ENTIRE fact unless something removes
non-matching fact rows first. A semi-join would itself shuffle the
fact. A bloom filter built from the dim keys is a few KiB–MiB: it
broadcasts to every fact scan task and drops non-matching rows inside
the scan stage, so the one big exchange carries only candidate rows.
False positives are possible (removed by the exact join that follows);
false negatives are not — the pruned join is bitwise-identical to the
unpruned one.

Layout: the filter is a map<long,long> of 64-bit words keyed by word
index, built with one tiny shuffle (groupBy over at most num_bits/64
word rows, partial bit_or combines map-side). It stays a 1-row
DataFrame end-to-end — broadcast-nested-loop joined onto the probe, no
driver collect, so the same plan runs unchanged on a real cluster.
k hash functions are xxhash64 seeded 0..k-1 (the same 64-bit hash
family Spark's own runtime bloom filters use).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k bit positions for a key: pmod(xxhash64(key, seed), m). pmod
    (not %) so negative hashes land in [0, m)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def _bit(pos: Column) -> Column:
    """1 << (pos % 64) as a signed long, via a literal powers-of-two
    table (PySpark's shiftleft only takes a Python-int shift, not a
    Column). Index 63 wraps to the sign bit: Java long has no unsigned
    1<<63, the negative value IS that bit pattern. Built per call, not
    at module scope — Column literals need a live SparkContext."""
    pow2 = F.array(
        *[
            F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long")
            for i in range(64)
        ]
    )
    return F.element_at(pow2, (pos % 64).cast("int") + F.lit(1))


def build_bloom_filter(
    build: DataFrame,
    key_col: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> DataFrame:
    """1-row DataFrame ``(bloom: map<long,long>)`` — the bit-set of the
    build side's keys, packed into 64-bit words keyed by word index.
    Absent words are all-zero (element_at → null on probe = certain
    miss). Null build keys set no bits: a null key never equi-joins, so
    dropping it from the filter cannot create a false negative.

    Size the filter to the build side: with k=5 hashes, m ≈ 10 bits per
    distinct key gives ~1% false-positive rate; the map costs at most
    num_bits/8 bytes regardless of build cardinality.
    """
    pos = F.explode(
        F.array(*_positions(F.col(key_col), num_bits, num_hashes))
    ).alias("pos")
    words = (
        build.filter(F.col(key_col).isNotNull())
        .select(pos)
        .select(
            F.floor(F.col("pos") / F.lit(64)).cast("long").alias("w"),
            _bit(F.col("pos")).alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("w"), F.col("word")))
        ).alias("bloom")
    )


def bloom_prune(
    probe: DataFrame,
    key_col: str,
    bloom: DataFrame,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> DataFrame:
    """Rows of ``probe`` whose key MIGHT be in the filter (all k bits
    set). Guaranteed superset of the exact semi-join — follow with the
    real join to discard false positives. num_bits/num_hashes must
    match the build call. The 1-row filter broadcasts (BNL join with a
    single row is a broadcast of the filter map, not a shuffle of the
    probe); probe rows with a null key are dropped, matching inner-join
    semantics.
    """
    probed = probe.join(F.broadcast(bloom))
    checks = []
    for p in _positions(F.col(key_col), num_bits, num_hashes):
        word = F.element_at(F.col("bloom"), F.floor(p / F.lit(64)).cast("long"))
        checks.append(word.isNotNull() & (word.bitwiseAND(_bit(p)) != 0))
    return probed.filter(reduce(lambda a, b: a & b, checks)).drop("bloom")


def bloom_pruned_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> DataFrame:
    """Inner equi-join with the probe side bloom-reduced first. Result
    is identical to ``probe.join(build, probe_key == build_key)`` —
    the filter only removes rows the join would drop anyway."""
    bloom = build_bloom_filter(build, build_key, num_bits, num_hashes)
    pruned = bloom_prune(probe, probe_key, bloom, num_bits, num_hashes)
    return pruned.join(build, F.col(probe_key) == F.col(build_key))
