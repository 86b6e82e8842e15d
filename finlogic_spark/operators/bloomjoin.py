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

Layout: the filter is a DENSE array<long> of num_bits/64 words held in
a 1-row DataFrame, built with one tiny shuffle (groupBy over at most
num_bits/64 word rows, partial bit_or combines map-side) and broadcast
onto the probe — no driver collect, so the same plan runs unchanged on
a real cluster. k hash functions are xxhash64 seeded 0..k-1 (the same
64-bit hash family Spark's own runtime bloom filters use).

Probe-cost note (measured at 10x bench scale): the bit test is built
as a SQL expression string — ``shiftleft(1L, pos % 64)`` — because the
PySpark ``shiftleft`` wrapper only accepts a Python-int shift, and the
workaround (indexing a 64-literal CreateArray per row per hash) showed
up as the dominant probe cost (3.3x the expression-form wall time).
The dense array (not map_from_entries) matters for the same reason:
Spark's map element_at linearly scans the entries; array indexing is
O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _est_row_bytes(schema: T.StructType) -> int:
    """Planner-style per-row width estimate (the same fixed per-type
    defaults Spark's own stats estimation uses when it has no column
    stats: 20 bytes for a string, the physical width for fixed types)."""
    widths = {
        T.BooleanType: 1, T.ByteType: 1, T.ShortType: 2, T.IntegerType: 4,
        T.FloatType: 4, T.DateType: 4, T.LongType: 8, T.DoubleType: 8,
        T.TimestampType: 8,
    }
    total = 0
    for f in schema.fields:
        total += widths.get(type(f.dataType), 20)
    return max(total, 1)


def _pos_sql(key_col: str, i: int, num_bits: int) -> str:
    """Bit position i via Kirsch–Mitzenmacher double hashing:
    pos_i = pmod(h1 + i·(h2|1), m) with h1/h2 = xxhash64(key, 0/1).
    Two base hashes serve all k positions (plain per-i seeding costs k
    xxhash64 per row — and 2k after the optimizer re-inlines each
    position into its DIV 64 and % 64 uses; KM caps that at 4). h2|1
    keeps the stride odd, coprime with the power-of-two m. pmod (not %)
    so negative values land in [0, m).

    CONTRACT: build and probe keys must be the SAME TYPE — xxhash64 is
    type-sensitive (xxhash64(int 5) != xxhash64(bigint 5)), so a type
    mismatch silently produces false negatives. bloom_pruned_join
    enforces this; callers composing build/prune directly must too."""
    # Reduce each base hash mod m BEFORE combining: raw h1 + i*h2 on
    # full-range int64 overflows (ANSI mode throws). After pmod both
    # operands are < m, so the combination stays far from the limit.
    # (h2|1) is odd, and an odd value stays odd under pmod by a
    # power-of-two m — the stride remains coprime with m.
    h1 = f"pmod(xxhash64({key_col}, 0), {num_bits})"
    h2 = f"pmod(xxhash64({key_col}, 1) | CAST(1 AS BIGINT), {num_bits})"
    return f"pmod({h1} + {i} * {h2}, {num_bits})"


def build_bloom_filter(
    build: DataFrame,
    key_col: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> DataFrame:
    """1-row DataFrame ``(__bloom_words: array<long>)`` — the bit-set
    of the build side's keys packed into a dense array of num_bits/64
    words (untouched words are 0). Null build keys set no bits: a null
    key never equi-joins, so dropping it cannot create a false
    negative. The column name is deliberately collision-proof: the
    filter is cross-joined onto arbitrary caller DataFrames in
    bloom_prune, so a friendly name like 'bloom' would shadow (and then
    drop) a caller column of the same name.

    Size the filter to the build side: with k=5 hashes, m ≈ 10 bits per
    distinct key gives ~1% false-positive rate; the array costs
    num_bits/8 bytes regardless of build cardinality.
    """
    n_words = (num_bits + 63) // 64
    pos = F.explode(
        F.array(
            *[
                F.expr(_pos_sql(key_col, i, num_bits))
                for i in range(num_hashes)
            ]
        )
    ).alias("pos")
    # Union a zero row per word so the groupBy emits EVERY word index:
    # the dense array then falls straight out of one array_sort over
    # the collected (w, word) structs — O(n_words log n_words) — where
    # the previous map_from_entries + per-index element_at densify was
    # O(n_words^2) map scans (fine at 2^17 bits, minutes at the 2^22
    # an auto-sized sf100 build wants).
    zeros = build.sparkSession.range(n_words).select(
        F.col("id").cast("int").alias("w"),
        F.lit(0).cast("long").alias("bit"),
    )
    words = (
        build.filter(F.col(key_col).isNotNull())
        .select(pos)
        .select(
            F.expr("CAST(pos DIV 64 AS INT)").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
            .alias("bit"),
        )
        .unionByName(zeros)
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )
    return words.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("w"), F.col("word")))
        ).alias("e")
    ).select(
        F.transform(F.col("e"), lambda s: s["word"]).alias("__bloom_words")
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
    match the build call. The 1-row filter broadcasts (a broadcast of
    the word array, never a shuffle of the probe); probe rows with a
    null key are dropped EXPLICITLY — Spark's xxhash64 hashes NULL to
    the seed (not to NULL), so without the guard a null key would probe
    real bit positions — matching inner-join semantics either way.
    """
    checks = [f"({key_col} IS NOT NULL)"]
    for i in range(num_hashes):
        pos = _pos_sql(key_col, i, num_bits)
        checks.append(
            f"(element_at(__bloom_words, CAST(({pos}) DIV 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(({pos}) % 64 AS INT)))"
            " != 0"
        )
    return (
        probe.join(F.broadcast(bloom))
        .filter(F.expr(" AND ".join(checks)))
        .drop("__bloom_words")
    )


def bloom_pruned_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    num_bits: int | None = None,
    num_hashes: int = 5,
    bits_per_key: int = 10,
    auto_bypass: bool = True,
) -> DataFrame:
    """Inner equi-join with the probe side bloom-reduced first. Result
    is identical to the plain inner join — the filter only removes rows
    the join would drop anyway. Same-named keys join by name (one
    merged key column, like ``probe.join(build, key)``); distinct names
    keep both columns.

    ``num_bits=None`` (default) AUTO-SIZES the filter to the build
    side: the build is localCheckpointed once (it is dim-sized by this
    operator's contract — the big side goes in ``probe``), counted,
    and m is the next power of two ≥ bits_per_key·n (10 bits/key at
    k=5 ≈ 1% false positives). A fixed m is a scale bug in disguise:
    2^17 bits saturate around ~30k build keys, after which the filter
    passes everything and the probe pays the hash cost for zero
    pruning. The checkpoint also means the build side is SCANNED ONCE
    — the same materialized rows feed the bit-set build and the final
    exact join — instead of once per consumer.

    ``auto_bypass`` (default on, auto-sized path only): when the build
    side fits under the session's
    ``spark.sql.autoBroadcastJoinThreshold``, SKIP the bloom and
    return the plain join. Two tiers: (1) a ZERO-JOB fast path — if
    Catalyst's optimized-plan stats already put the build side under
    the threshold, the plain join broadcasts on those same stats, so
    it is returned untouched, no checkpoint, no count (this was ~0.34 s
    of pure decision overhead at sf100 when the answer was "do
    nothing"); (2) otherwise ONE measurement job over the
    un-checkpointed dim — row count + MEASURED string/binary bytes
    (``octet_length`` sums on top of the planner's fixed widths; a
    flat per-string default would let a wide-string dim pass the
    threshold on paper and then force a driver-heavy broadcast via the
    explicit hint). A bypassed dim is never materialized: the bypass
    branch costs exactly one pushdown-filtered dim scan over the bare
    plain join, and only the bloom branch checkpoints (where
    scan-once across build+join pays). In the
    broadcast regime the exact join already prunes probe rows inside
    the scan stage for free — the bloom is pure overhead there
    (measured sf100 decomposition: plain broadcast join 1.28 s, bloom
    adds +1.16 s of per-row hashing for zero extra pruning), while in
    the shuffle regime (dim too big to broadcast) the bloom wins 2.35x
    (6.99 s -> 2.98 s) by shrinking the probe's exchange. The counted
    cardinality the auto-sizer already produces IS the regime signal,
    so the decision costs nothing extra. Set ``auto_bypass=False`` to
    force the filter (e.g. to measure it, or when the probe scan is so
    expensive that even a broadcast-regime prune pays for itself
    upstream of a multi-join pipeline).

    Raises on probe/build key dtype mismatch: xxhash64 is
    type-sensitive, so hashing e.g. an int probe key against a bigint
    build filter would silently drop matching rows (the equi-join
    itself would have coerced them equal). Cast one side first.
    """
    p_type = dict(probe.dtypes)[probe_key]
    b_type = dict(build.dtypes)[build_key]
    if p_type != b_type:
        raise TypeError(
            f"bloom join key types differ (probe {probe_key}: {p_type}, "
            f"build {build_key}: {b_type}); xxhash64 is type-sensitive, "
            "so this would silently produce false negatives — cast one "
            "side to the other's type first"
        )
    if num_bits is None:
        from finlogic_spark.sources import parse_size_bytes

        threshold = parse_size_bytes(
            build.sparkSession.conf.get(
                "spark.sql.autoBroadcastJoinThreshold", "10485760"
            ),
            default=10 * 1024 * 1024,
        )
        if auto_bypass and 0 < threshold:
            # Zero-job fast path: if Catalyst's own optimized-plan
            # stats already put the build side under the broadcast
            # threshold, a PLAIN join broadcasts it — on exactly these
            # stats — so return the plain join untouched. This is what
            # the r13 bench flagged: the bypassed path still paid
            # ~0.34 s of localCheckpoint+count when the decision was
            # "do nothing". Only a <=-threshold stats value short-
            # circuits; unknown/huge stats (joins, checkpoints —
            # LogicalRDD reports defaults) fall through to the
            # measured checkpoint+count decision below.
            stats_bytes = int(
                str(
                    build._jdf.queryExecution()
                    .optimizedPlan()
                    .stats()
                    .sizeInBytes()
                )
            )
            if stats_bytes <= threshold:
                if probe_key == build_key:
                    return probe.join(build, [probe_key])
                return probe.join(
                    build, F.col(probe_key) == F.col(build_key)
                )
        # One measurement job over the UN-checkpointed dim: row count +
        # MEASURED variable-width bytes (the old flat 20-bytes-per-
        # string planner default let a wide-string dim pass n*width <=
        # threshold while its real broadcast size was far above it —
        # the explicit hint below would then force the very driver-
        # heavy broadcast the threshold exists to prevent). Measuring
        # BEFORE checkpointing keeps the bypass branch — the common
        # case — free of any materialization: its total cost over the
        # bare plain join is one pushdown-filtered dim scan. Only the
        # bloom branch checkpoints, where scan-once across build+join
        # actually pays (the dim is small by this operator's contract,
        # so its one extra scan there is noise).
        # the byte measurement only feeds the bypass decision — with
        # auto_bypass=False the only thing this job must produce is the
        # row count for the bloom sizer, so the per-string octet sums
        # would be dead work (ADVICE r14)
        var_cols = (
            [
                f.name
                for f in build.schema.fields
                if isinstance(f.dataType, (T.StringType, T.BinaryType))
            ]
            if auto_bypass
            else []
        )
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            F.sum(F.octet_length(F.col(c))).alias(f"__b{i}")
            for i, c in enumerate(var_cols)
        ]
        sized = build.agg(*aggs).collect()[0]
        n = sized["__n"] or 0
        var_bytes = sum(
            sized[f"__b{i}"] or 0 for i in range(len(var_cols))
        )
        est_bytes = n * _est_row_bytes(build.schema) + var_bytes
        if auto_bypass and 0 < threshold and est_bytes <= threshold:
            # broadcast regime: the exact broadcast hash join prunes
            # in the scan stage already — skip the redundant k-hash
            # filter pass over the probe. The hint is explicit because
            # the dim's plan stats said "too big" (or unknown) while
            # the measurement says it fits — without the hint the
            # static planner would SMJ first and leave the fix to AQE
            # after the probe's shuffle files are written.
            if probe_key == build_key:
                return probe.join(F.broadcast(build), [probe_key])
            return probe.join(
                F.broadcast(build), F.col(probe_key) == F.col(build_key)
            )
        build = build.localCheckpoint(eager=True)
        num_bits = 1 << max(10, (bits_per_key * max(n, 1) - 1).bit_length())
    bloom = build_bloom_filter(build, build_key, num_bits, num_hashes)
    pruned = bloom_prune(probe, probe_key, bloom, num_bits, num_hashes)
    if probe_key == build_key:
        return pruned.join(build, [probe_key])
    return pruned.join(build, F.col(probe_key) == F.col(build_key))
