"""Corpus-curation operators for the training-data pipeline surface
(engine-scope addition — the reference has no corpus ops; SURVEY.md
§2.10): deterministic stratified sampling, vocabulary pruning, and
per-label embedding centroids.

All three are shapes a 100 TB curation run actually needs:
- sampling must be HASH-deterministic (reshuffle-proof, engine-
  independent) — "random with a seed" changes with partitioning;
- vocabulary pruning is a broadcast join against a built vocab, never
  a driver-side dictionary in a Python UDF;
- label centroids aggregate in scaled integers so the result is
  independent of float summation order across partitions.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_frac(id_col: str | Column, salt: str = "smp") -> Column:
    """First two md5 hex chars of ``salt|id`` — a uniform, engine-
    independent 1/256-granular stratum for threshold sampling. String
    compare against a 2-hex-char threshold ('80' ≈ 50%, '40' ≈ 25%;
    'g0' sorts above every hex char = keep all)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(F.concat(F.lit(f"{salt}|"), c.cast("string"))), 1, 2)


def stratified_sample_hash(
    df: DataFrame,
    stratum_col: str,
    rates: Mapping[str, str],
    id_col: str,
    default_rate: str = "g0",
    salt: str = "smp",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff the md5
    hash of its stable id sorts below its stratum's 2-hex-char
    threshold. Narrow map + filter — no shuffle, no RNG state, exactly
    reproducible across engines, runs, and repartitionings (the only
    sampling that is at 100 TB).

    ``rates`` maps stratum value → threshold ('80' keeps ≈ 128/256,
    '40' ≈ 64/256); unmapped strata use ``default_rate``."""
    thr: Column = F.lit(default_rate)
    for value, rate in rates.items():
        thr = F.when(F.col(stratum_col) == value, F.lit(rate)).otherwise(thr)
    return df.filter(hash_frac(id_col, salt) < thr)


def build_vocab(df: DataFrame, tokens_col: Column, size: int) -> DataFrame:
    """Top-``size`` corpus vocabulary by token frequency (ties broken
    by token): explode → map-side-combined count → TakeOrderedAndProject.
    Returns a one-column ``token`` DataFrame, small by construction —
    broadcast it into downstream joins."""
    return (
        df.select(F.explode(tokens_col).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(size)
        .select("token")
    )


def prune_to_vocab(
    df: DataFrame,
    tokens_col: Column,
    vocab: DataFrame,
    id_col: str,
    unk: str = "<unk>",
) -> DataFrame:
    """Replace out-of-vocabulary tokens with ``unk`` and rebuild the
    document text; returns (id_col, n_tokens, n_oov, text_pruned), one
    row per document with ≥1 token.

    Scale shape: posexplode → broadcast LEFT join against the (small by
    construction) vocab → groupBy(id) reassembly via sorted collect_list.
    One shuffle, keyed by document id — never a driver-side dict lookup.
    For huge vocabularies drop the broadcast hint and let the join
    shuffle on token: same plan shape, same semantics."""
    ex = df.select(
        id_col, F.posexplode(tokens_col).alias("pos", "token")
    )
    marked = ex.join(
        F.broadcast(vocab.withColumn("__in", F.lit(1))), "token", "left"
    ).select(
        id_col,
        "pos",
        F.when(F.col("__in").isNotNull(), F.col("token"))
        .otherwise(F.lit(unk))
        .alias("tok"),
        F.col("__in").isNull().cast("long").alias("oov"),
    )
    return marked.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum("oov").alias("n_oov"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("text_pruned"),
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale: float = 1_000_000.0,
) -> DataFrame:
    """Per-label mean vector as long rows (label, pos, c, n) — the
    distributed vector-mean every clustering / per-class-analysis step
    needs (same partial-agg shape as the k-means update,
    operators/kmeans.py).

    Values are scaled to integers per element before summing, so the
    aggregate is EXACT and independent of partition/merge order — a
    float sum would make the result (and any oracle hash) depend on
    scheduling. posexplode keys the shuffle by (label, pos): 64·|labels|
    cells, evenly spread, no hot key."""
    ex = df.select(
        label_col,
        F.posexplode(
            F.transform(vec_col, lambda x: x.cast("double"))
        ).alias("pos", "val"),
    )
    scaled = F.floor(F.col("val") * scale + F.lit(0.5))
    return (
        ex.groupBy(label_col, "pos")
        .agg(
            ((F.sum(scaled) / F.count("*")) / F.lit(scale)).alias("c"),
            F.count("*").alias("n"),
        )
    )


def hash_uniform(id_col: str | Column, salt: str = "wrs") -> Column:
    """Engine-independent uniform double in (0, 1) from a stable id:
    the first 6 md5 hex digits of ``salt|id`` parsed digit-by-digit
    with instr() (both engines share instr; neither needs a hex-cast
    builtin), +0.5 to stay strictly inside (0,1). Every arithmetic op
    is exactly-rounded IEEE (integer build-up, one divide), so Spark
    and the SQL oracle produce bit-identical doubles."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(F.lit(f"{salt}|"), c.cast("string")))
    acc: Column = F.lit(0).cast("long")
    for i in range(1, 7):
        digit = F.instr(F.lit("0123456789abcdef"), F.substring(h, i, 1)) - F.lit(1)
        acc = acc * F.lit(16) + digit.cast("long")
    return (acc.cast("double") + F.lit(0.5)) / F.lit(16777216.0)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    k: int,
    salt: str = "wrs",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis
    & Spirakis A-Res): each row draws key = u^(1/w) from its hash-
    uniform u and weight w; the k largest keys are the sample. The
    inclusion probability of a row is proportional to its weight, and
    because u comes from `hash_uniform` the sample is reproducible
    across runs, engines, and repartitionings — "rand() with a seed"
    is none of those under Spark's partition-nondeterministic rand.

    Plan: narrow map to compute keys, then TakeOrderedAndProject
    (per-partition top-k, k rows per partition to the driver-side
    merge) — no global sort, no full shuffle. Rows with weight <= 0 or
    NULL are excluded (their key is undefined).

    Returns the sampled rows plus ``sample_key`` (the A-Res priority,
    rounded to 6 dp at the edge)."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = hash_uniform(id_col, salt)
    # try_divide: rows are already filtered to w > 0, but ANSI-mode
    # constant folding evaluates 1.0/w eagerly for literal weights and
    # would raise on 0 before the filter ever runs.
    key = F.pow(u, F.try_divide(F.lit(1.0), w))
    return (
        df.filter(w > F.lit(0))
        .withColumn(
            "sample_key", F.floor(key * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
        )
        .withColumn("__key_raw", key)
        .orderBy(F.col("__key_raw").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("__key_raw")
    )


def unigram_logprob_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab_counts: DataFrame | None = None,
) -> DataFrame:
    """Unigram language-model quality score per document — the cheap
    tier of CCNet-style perplexity filtering: score(doc) = mean over
    tokens of log p(token), p estimated from corpus frequencies
    (``vocab_counts``: (token, n) — defaults to the corpus itself, so
    every token is in-vocabulary). Low scores = rare-token soup
    (gibberish, OCR noise); implausibly high = degenerate repetition
    of common words. Use both tails as curation gates.

    Cross-engine determinism: log p is computed ONCE PER VOCAB TOKEN
    and floored to integer micro-nats; per-document summation is then
    exact integer arithmetic, so the result is independent of Spark's
    partial-aggregation order (a raw SUM(double) would not be).

    Scale: vocab is corpus-bounded (top-V in practice — pass a pruned
    ``vocab_counts``); the token→logp join shuffles on token with the
    vocab side small enough for AQE to broadcast. One groupBy(id)
    carries one row per document out."""
    from finlogic_spark.functions.text import tokens as _tokens

    tok = df.select(F.col(id_col), F.explode(_tokens(text_col)).alias("token"))
    if vocab_counts is None:
        vocab_counts = tok.groupBy("token").agg(F.count("*").alias("n"))
    total = vocab_counts.agg(F.sum("n").cast("double").alias("__total"))
    logp = vocab_counts.crossJoin(F.broadcast(total)).select(
        "token",
        F.floor(F.log(F.col("n") / F.col("__total")) * F.lit(1e6))
        .cast("long")
        .alias("__lpq"),
    )
    scored = (
        tok.join(logp, "token")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("__lpq").alias("__sum_lpq"),
        )
    )
    return scored.select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (
            F.floor(
                F.col("__sum_lpq") / F.lit(1e6) / F.col("n_tokens") * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("logprob_per_token"),
    )


def token_cooccurrence(
    docs: DataFrame,
    min_support: int = 5,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k token pairs by pointwise mutual information:
    (tok_a, tok_b, n_ab, pmi), tok_a < tok_b, n_ab >= min_support —
    collocation mining / compound-term discovery over a corpus.

    pmi = ln(P(a,b) / (P(a)P(b))) over document-level presence: every
    count is an exact integer (distinct tokens per doc, one doc-keyed
    self-join for pairs, partial-agg counts), and the one double
    expression folds them in a fixed order — engine-deterministic.

    Scale shape: the self-join shuffles on doc_id and emits L²/2 pairs
    per doc where L = DISTINCT tokens per doc (bounded by doc length,
    NOT corpus size); counts partial-aggregate map-side. At real corpus
    scale, cap L by pre-pruning ultra-common tokens (they carry pmi ~ 0
    by construction) with a document-frequency filter like
    text_dedup.ngram_jaccard's — the same guard, same reason.
    """
    from finlogic_spark.functions.text import tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("token"),
    )
    n_t = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    n_docs = (
        toks.groupBy("doc_id")
        .agg(F.lit(1).alias("__one"))
        .agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    )
    a = toks.select(F.col("doc_id"), F.col("token").alias("tok_a"))
    b = toks.select(F.col("doc_id"), F.col("token").alias("tok_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    na = n_t.select(F.col("token").alias("tok_a"), F.col("n").alias("n_a"))
    nb = n_t.select(F.col("token").alias("tok_b"), F.col("n").alias("n_b"))
    pmi = F.log(
        F.col("n_ab").cast("double")
        * F.col("n_docs")
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    )
    scored = (
        pairs.join(F.broadcast(na), "tok_a")
        .join(F.broadcast(nb), "tok_b")
        .join(F.broadcast(n_docs))
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            (F.floor(pmi * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("pmi"),
        )
    )
    return (
        scored.orderBy(
            F.col("pmi").desc(), F.col("tok_a").asc(), F.col("tok_b").asc()
        ).limit(k)
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
    salt: str = "cap",
) -> DataFrame:
    """Keep a deterministic sample of at most ``cap`` rows per group —
    the domain-cap/contributor-cap step of corpus curation (no single
    source may dominate the training mix).

    Selection ranks rows inside each group by md5(salt‖id): stable
    under any partitioning or insertion order (a "random with seed"
    sample is irreproducible across repartitions), uniform because the
    hash is, and re-runnable — the same rows survive every time. One
    window shuffle on the group key; skew equals the largest single
    group, the same bound the downstream pipeline already carries.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        F.col(id_col),
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def bigram_logprob_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lam: float = 0.75,
) -> DataFrame:
    """Interpolated bigram LM score per document — the next tier above
    ``unigram_logprob_score`` in CCNet-style quality gating: word-salad
    documents have plausible unigrams but implausible transitions, so
    p(w2|w1) = lam * c(w1 w2)/c(w1) + (1-lam) * c(w2)/N separates them
    where the unigram gate cannot. Counts come from the corpus itself
    (self-trained, like the unigram default).

    Determinism contract (same as the unigram scorer): log p is
    computed once per BIGRAM TYPE and floored to integer micro-nats;
    the per-document mean is then exact integer arithmetic over the
    doc's bigram stream — independent of partial-agg order and
    engine. Docs with < 2 tokens have no bigrams and are omitted
    (compose with a left join to flag them).

    Scale: bigram types are corpus-bounded (Heaps-law sub-linear); the
    stream→logp join shuffles on (w1, w2) with partial-agg map-side.
    Adjacent pairing happens INSIDE the token array (HOF transform +
    get — a narrow map): no per-doc window, no (doc, pos) shuffle/sort
    of the full token stream — replacing the lead()-window formulation
    cut the sf10 run ~3x.
    """
    from finlogic_spark.functions.text import bind, tokens as _tokens

    tok = df.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("w1")
    )
    # (w1, w2) pairs built expression-side: F.get is 0-based and
    # returns null past the end (no ANSI out-of-bounds error), so the
    # final token's pair is dropped by the HOF filter.
    big_arr = bind(
        _tokens(text_col),
        lambda l: F.filter(
            F.transform(
                l,
                lambda x, i: F.struct(
                    x.alias("w1"), F.get(l, i + 1).alias("w2")
                ),
            ),
            lambda s: s["w2"].isNotNull(),
        ),
    )
    big = df.select(F.col(id_col), F.explode(big_arr).alias("__bg")).select(
        id_col,
        F.col("__bg.w1").alias("w1"),
        F.col("__bg.w2").alias("w2"),
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    # One vocab aggregate serves all three unigram statistics: c1 and
    # cu are the same plan (ReusedExchange dedups them) and the corpus
    # total sums the ~|V| counts instead of re-exploding the token
    # stream — 5 tokenize passes -> 3 (measured at 1000x bench scale,
    # where the extra explode passes were the super-linear term).
    vc = tok.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    c1 = vc
    cu = vc.select(F.col("w1").alias("w2"), F.col("n1").alias("nu"))
    total = vc.agg(F.sum("n1").cast("double").alias("__n"))
    # Expression shape mirrored EXACTLY in the SQL oracle (left-assoc
    # mul/div) so both engines run the same IEEE op sequence before
    # the micro-nat floor.
    logp = (
        c2.join(c1, "w1")
        .join(cu, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.floor(
                F.log(
                    F.lit(lam) * F.col("n2") / F.col("n1")
                    + F.lit(1.0 - lam) * F.col("nu") / F.col("__n")
                )
                * F.lit(1e6)
            )
            .cast("long")
            .alias("__lpq"),
        )
    )
    scored = (
        big.join(logp, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__lpq").alias("__sum_lpq"),
        )
    )
    return scored.select(
        F.col(id_col),
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        (
            F.floor(
                F.col("__sum_lpq") / F.lit(1e6) / F.col("n_bigrams") * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("logprob_per_bigram"),
    )


def pack_segments(
    sized: DataFrame,
    id_col: str,
    shard_col: str,
    len_col: str,
    budget: int,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """True concat-and-chunk packing INDEX: per shard, documents
    concatenate in id order into fixed-``budget`` training sequences,
    and each document emits one row PER SEQUENCE IT TOUCHES —
    (id, shard, seq_id, doc_offset, seg_len) — i.e. exactly the map a
    training loader consumes (seq_id's tokens [cum_start .. cum_end)
    come from doc X's tokens [doc_offset .. doc_offset+seg_len)).
    doc_pack_sequences only reports the sequence a doc STARTS in; this
    is the full segmentation, including docs split across sequence
    boundaries.

    Closed-form per row, so the plan is one per-shard running-sum
    window + a map-side explode: a doc spanning [start, end) covers
    sequences floor(start/B)..floor((end-1)/B); its slice in sequence
    s is [max(0, s*B - start), ...) of length
    min(end, (s+1)*B) - max(start, s*B). Zero-length docs emit no
    segments (they occupy no tokens). The explode fan-out is
    ceil(len/B) + 1 rows per doc — data-sized, never quadratic; the
    only exchange is the window's shard hash (packing is per-shard by
    design: a single global cumsum would serialize on one partition
    at 100 TB).

    ``carry_cols``: extra input columns appended unchanged to every
    emitted segment row (e.g. the document id when ``id_col`` is a
    synthetic ordering key, as in epoch_order composition) — a select
    passthrough, no extra exchange."""
    from pyspark.sql import Window

    B = int(budget)
    if B < 1:
        raise ValueError(f"budget must be >= 1, got {B}")
    carry = list(carry_cols or [])
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        sized.withColumn("__end", F.sum(len_col).over(w))
        .withColumn("__start", F.col("__end") - F.col(len_col))
        .filter(F.col(len_col) > 0)
    )
    seq = F.explode(
        F.sequence(
            F.expr(f"__start DIV {B}"), F.expr(f"(__end - 1) DIV {B}")
        )
    ).alias("seq_id")
    return spans.select(
        id_col, shard_col, "__start", "__end", seq, *carry
    ).select(
        id_col,
        shard_col,
        F.col("seq_id").cast("int").alias("seq_id"),
        (
            F.greatest(F.col("seq_id") * B, F.col("__start"))
            - F.col("__start")
        ).alias("doc_offset"),
        (
            F.least((F.col("seq_id") + 1) * B, F.col("__end"))
            - F.greatest(F.col("seq_id") * B, F.col("__start"))
        ).alias("seg_len"),
        *carry,
    )


def domain_mix_sample(
    docs: DataFrame,
    source_col: str,
    id_col: str,
    tokens_col: Column,
    targets_micro: Mapping[str, int],
    budget_tokens: int | Callable[[int], int],
    salt: str = "mix",
) -> DataFrame:
    """Domain-mixture sampling: fit a target source mixture under a
    total token budget — the step that turns per-domain weights (the
    Pile/DCLM-style mixture table) into a concrete keep/drop decision
    per document.

    For each source s with available tokens T_s and target share w_s
    (integer micro-units), the desired take is
    ``desired_s = (w_s * budget) // 1e6`` and the keep-rate threshold
    is the 1/256-granular hash stratum
    ``thr_s = (desired_s * 256) // T_s`` (>= 256 keeps everything).
    The threshold arithmetic runs DRIVER-SIDE in arbitrary-precision
    Python ints over the BOUNDED per-source totals (the centroids
    precedent — source cardinality, not corpus size; int64 column math
    would overflow at w*budget*256 ≈ 2.6e20 for a 100 TB token
    budget), so every engine derives identical thresholds from
    identical exact token counts. The per-doc decision is the engine's
    standard deterministic hash sample (``hash_frac(id) < thr``) —
    reshuffle-proof, RNG-free, the only sampling that reproduces at
    100 TB.

    Plan: ONE map-side-combining aggregate over the corpus (per-source
    token totals, bounded collect), then one PROJECTION with the
    thresholds as literals — no join at all. Sources absent from
    ``targets_micro`` get threshold '00' (dropped — an unlisted domain
    in a mixture spec is a drop, not a silent keep). Output:
    (id, source, n_tokens, kept); filter on ``kept`` to materialize
    the mixed corpus.

    ``budget_tokens`` may be a callable ``total_tokens -> budget``: it
    receives the corpus-wide token total (sum of the same bounded
    per-source aggregate — no extra pass) and returns the budget, so a
    registry row can carry a SCALE-PROPORTIONAL budget (e.g.
    ``lambda t: t // 3``) that selects a meaningful mixture at sf0.01
    AND at 100 TB, where any fixed absolute budget is degenerate at
    one end (r14 verdict item 5). The callable runs driver-side on
    exact Python ints — same overflow-proofing as the thresholds."""
    if not callable(budget_tokens) and budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    base = docs.select(
        F.col(id_col),
        F.col(source_col).alias("__src"),
        tokens_col.cast("long").alias("__n"),
    )
    totals = {
        r["__src"]: int(r["__T"] or 0)
        for r in base.groupBy("__src").agg(F.sum("__n").alias("__T")).collect()
    }
    budget = (
        int(budget_tokens(sum(totals.values())))
        if callable(budget_tokens)
        else int(budget_tokens)
    )
    if budget < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget}")
    thresholds: dict[str, str] = {}
    for src, total in totals.items():
        w = targets_micro.get(src)
        if w is None or total <= 0:
            thresholds[src] = "00"
            continue
        desired = (int(w) * budget) // 1_000_000
        byte = (desired * 256) // total
        thresholds[src] = "g0" if byte >= 256 else f"{byte:02x}"
    thr = F.lit("00")
    for src, hx in thresholds.items():
        thr = F.when(F.col("__src") == src, F.lit(hx)).otherwise(thr)
    return base.select(
        F.col(id_col),
        F.col("__src").alias(source_col),
        F.col("__n").alias("n_tokens"),
        (hash_frac(F.col(id_col), salt) < thr).alias("kept"),
    )


def epoch_order(
    df: DataFrame,
    id_col: str,
    seed: int,
    n_shards: int,
) -> DataFrame:
    """Deterministic, reshuffle-proof training-epoch ordering + shard
    assignment (engine-scope addition: every reproducible-training
    pipeline needs a global document order that survives job restarts,
    repartitioning, and engine changes — "random with a seed" is none
    of those at 100 TB).

    The order is a COLUMN, not a sort contract: each doc's epoch key
    is ``md5('{seed}:' || id)`` (the portable keyed-hash idiom —
    xxhash64 exists only in Spark, md5 is md5 everywhere), its shard
    is the key's first-4-hex-digit bucket mod ``n_shards`` (the
    conv/substring pattern shared with the quality classifier's
    feature buckets), and its position is the key's rank WITHIN its
    shard (row_number over (shard, key) — a per-shard sort, the
    pack_segments exchange shape, never a global TakeOrdered; ties
    broken by id for determinism under md5-collision paranoia). A new
    seed = a new epoch permutation; the same seed reproduces the
    exact loader order on any cluster.

    Output: all input columns + (order_key, shard int, position long,
    position 1-based within shard). Compose with ``pack_segments``
    using ``id_col='position'`` + ``carry_cols=[id]`` to emit a
    segment table that carries the loader order.

    Size ``n_shards`` so one shard's rows fit one sort task (the two
    windows — position rank and any downstream packing cumsum — share
    a single hash exchange on shard, Catalyst-verified): thousands of
    shards at 100 TB, single digits only at gate scale. Shard counts
    are part of the loader contract, so pick once per training run."""
    from pyspark.sql import Window

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = F.md5(
        F.concat(F.lit(f"{int(seed)}:"), F.col(id_col).cast("string"))
    )
    shard = (
        F.conv(F.substring(key, 1, 4), 16, 10).cast("long")
        % F.lit(int(n_shards))
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("order_key", id_col)
    return (
        df.withColumn("order_key", key)
        .withColumn("shard", shard)
        .withColumn("position", F.row_number().over(w).cast("long"))
    )


def length_batches(
    df: DataFrame,
    id_col: str,
    len_col: str,
    seed: int,
    n_shards: int,
    batch_size: int,
) -> DataFrame:
    """Length-bucketed batch assignment — the padded-batch loader shape
    (fine-tuning / any padded variable-length training) that
    ``pack_segments``' concat-and-chunk does NOT cover: documents
    batch with others of SIMILAR length so padding waste stays
    bounded, and the assignment is deterministic and reshuffle-proof
    (the epoch_order contract applied to batching).

    Each doc's length class is its token count's BIT LENGTH
    (``length(bin(n))`` — exact integer arithmetic; floor(log2(n))
    via floating log is a known cross-engine hazard at exact powers
    of two), its shard the seeded md5 hex bucket, and its batch the
    row_number within (shard, class) in seeded-key order, divided by
    ``batch_size``. Within a batch, lengths differ by at most 2x by
    construction (same bit length), so per-batch padding waste
    ``1 - sum(len)/(count*max(len))`` is < 50% worst-case and small
    in practice.

    Returns the per-doc assignment: all input columns +
    (shard, len_class, batch_id, pos_in_batch). One exchange: the
    (shard, len_class) window hash — size ``n_shards`` exactly as for
    epoch_order (thousands at 100 TB). Aggregate downstream for the
    batch manifest (see doc_length_batches: count/max/sum/pad_ratio
    per batch — a second exchange on the same key prefix that AQE
    coalesces)."""
    from pyspark.sql import Window

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    key = F.md5(
        F.concat(F.lit(f"{int(seed)}:"), F.col(id_col).cast("string"))
    )
    shard = (
        F.conv(F.substring(key, 1, 4), 16, 10).cast("long")
        % F.lit(int(n_shards))
    ).cast("int")
    cls = F.length(F.bin(F.col(len_col).cast("long"))).cast("int")
    w = Window.partitionBy("shard", "len_class").orderBy("__key", id_col)
    out = (
        df.filter(F.col(len_col) > 0)
        .withColumn("__key", key)
        .withColumn("shard", shard)
        .withColumn("len_class", cls)
        .withColumn("__rk", F.row_number().over(w))
        .withColumn(
            "batch_id",
            ((F.col("__rk") - 1) / F.lit(int(batch_size)))
            .cast("long"),
        )
        .withColumn(
            "pos_in_batch",
            ((F.col("__rk") - 1) % F.lit(int(batch_size))).cast("int"),
        )
    )
    return out.drop("__key", "__rk")
