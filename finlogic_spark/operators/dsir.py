"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS'23): pick pretraining documents from a huge raw corpus so the
selected set's feature distribution matches a small target/exemplar
corpus (wiki+books in the paper), by importance-weighting each raw doc
with the likelihood ratio of two bag-of-features models

    log w(x) = sum_{token t in x} [ log p_target(t) - log p_raw(t) ]

and resampling by weight. The paper hashes char n-grams into 10k
buckets; this implementation uses word unigrams over the engine's
shared whitespace tokenizer (``functions/text.py``) so the weights are
reproducible in ANSI SQL for the oracle — the estimator is otherwise
the paper's (add-alpha-smoothed unigram ratio over a shared vocab).

Cross-engine determinism (the ``doc_unigram_logprob`` trick): each
vocab token's log-ratio is floored ONCE to integer micro-nats; a
document's log-weight is then an exact integer SUM, independent of
partial-aggregation order on either engine.

Selection: the paper adds Gumbel noise to log-weights and takes top-k
(sampling without replacement); ``gumbel_seed`` enables exactly that
with xxhash64-seeded noise (Spark-side only — the noise has no SQL
twin). With ``gumbel_seed=None`` selection is the deterministic
top-k-by-weight MAP estimate, which is what the registry oracle pins.

Scale shape (100 TB): two token-count groupBys (vocab-bounded), one
vocab-sized outer join producing the per-token ratio table (prunable
to top-V, broadcastable), one token->ratio join + one groupBy(doc)
over the raw token stream, then TakeOrderedAndProject for top-k.
Nothing is ever pairwise; no driver collect.

Reference parity note: the reference engine (crdcj/FinLogic) has no
data-selection operator; engine-scope addition per SURVEY §2.10.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _micro(col: Column) -> Column:
    return F.floor(col * F.lit(1e6)).cast("long")


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document DSIR importance log-weights for ``raw`` against
    ``target``. Returns (id_col, n_tokens, log_weight) with log_weight
    in nats, floored to micro-nat exactness; documents with zero
    tokens are dropped (no features, no weight — same contract as
    unigram_logprob_score).

    Both unigram models are add-alpha smoothed over the UNION vocab:
    p(t) = (n_t + alpha) / (N + alpha * |V|), so target-unseen tokens
    get a finite penalty instead of -inf.

    Determinism caveat: micro-nat flooring makes the summed log_weight
    order-independent WITHIN an engine, not ACROSS engines — each
    engine computes log() with its own libm, and a 1-ulp difference
    landing exactly on a floor boundary shifts that token's integer
    ratio by 1 micro-nat, which can flip log_weight ties (and thus a
    top-k cut) between Spark and an external oracle. The flooring
    therefore guarantees order-independence, while cross-engine
    equality is empirical: it holds iff no token ratio lands within
    ~1 ulp of a floor boundary. That premise is PINNED, not assumed —
    tests/test_dsir_boundary.py recomputes every vocab token's two
    ln() values over the exact gate corpora (sf0.01 and sf0.1) and
    asserts ≥1e-6 micro-nat distance from the nearest boundary
    (~300x the 1-ulp drift), so a regenerated fixture that lands on a
    boundary fails that test loudly instead of reddening the gate
    mysteriously. A corpus that can't be pinned this way should
    compare with a ±1-micro-nat-per-token tolerance instead.
    """
    from finlogic_spark.functions.text import tokens as _tokens

    tok_raw = raw.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("token")
    )
    tok_tgt = target.select(F.explode(_tokens(text_col)).alias("token"))

    cnt_raw = tok_raw.groupBy("token").agg(F.count(F.lit(1)).alias("n_raw"))
    cnt_tgt = tok_tgt.groupBy("token").agg(F.count(F.lit(1)).alias("n_tgt"))
    vocab = (
        cnt_raw.join(cnt_tgt, "token", "full_outer")
        .select(
            "token",
            F.coalesce("n_raw", F.lit(0)).alias("n_raw"),
            F.coalesce("n_tgt", F.lit(0)).alias("n_tgt"),
        )
    )
    totals = vocab.agg(
        F.count(F.lit(1)).cast("double").alias("__v"),
        F.sum("n_raw").cast("double").alias("__traw"),
        F.sum("n_tgt").cast("double").alias("__ttgt"),
    )
    a = F.lit(float(alpha))
    ratio = vocab.crossJoin(F.broadcast(totals)).select(
        "token",
        (
            _micro(F.log((F.col("n_tgt") + a) / (F.col("__ttgt") + a * F.col("__v"))))
            - _micro(F.log((F.col("n_raw") + a) / (F.col("__traw") + a * F.col("__v"))))
        ).alias("__lwq"),
    )
    per_doc = (
        tok_raw.join(ratio, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__lwq").alias("__slwq"),
        )
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        (F.col("__slwq") / F.lit(1e6)).alias("log_weight"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    gumbel_seed: int | None = None,
) -> DataFrame:
    """Top-k DSIR selection. ``gumbel_seed=None``: deterministic MAP
    top-k by (log_weight, id) — the oracle-pinned mode.
    ``gumbel_seed=<int>``: the paper's Gumbel-top-k sampling without
    replacement — key = log_weight + Gumbel(0,1) noise derived from
    xxhash64(id, seed), deterministic for a fixed seed yet a faithful
    draw from the softmax over weights across seeds.

    Plans as TakeOrderedAndProject: per-task k-row heaps, driver heap
    merge — no full sort at any corpus size.
    """
    w = dsir_log_weights(raw, target, text_col, id_col, alpha)
    if gumbel_seed is None:
        key = F.col("log_weight")
    else:
        # uniform in (0,1) from the id hash, then Gumbel = -ln(-ln(u));
        # +1/2^64 keeps u strictly positive
        u = (
            (F.xxhash64(F.col(id_col), F.lit(int(gumbel_seed))).cast("double")
             / F.lit(float(2**64)))
            + F.lit(0.5 + 2.0**-64)
        )
        key = F.col("log_weight") - F.log(-F.log(u))
    return (
        w.withColumn("__key", key)
        .orderBy(F.col("__key").desc(), F.col(id_col))
        .limit(k)
        .drop("__key")
    )
