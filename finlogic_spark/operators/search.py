"""Inverted index + BM25 keyword search over a document corpus
(engine-scope addition: the lexical-retrieval companion to the
embedding ANN tier in operators/similarity.py — a training-data
pipeline needs both for decontamination lookups, corpus QA, and
building retrieval eval sets).

Shape at 100 TB:
- postings build = tokenize → explode → groupBy(token, doc) — one
  shuffle keyed by (token, doc) with map-side combine; the result is
  the classic inverted index laid out as a DataFrame, ready to be
  written bucketed by token so later term lookups are partition-pruned
  scans.
- document frequency / corpus stats = partial-aggregated counts, a
  few-row side output.
- scoring a query = semi-join of the postings on the (tiny,
  broadcast) term list — touches only the matching postings, never
  the corpus; then one groupBy(doc) to sum per-term contributions and
  a TakeOrderedAndProject top-k. Nothing in the plan scales with
  corpus size except the pruned postings read.

Determinism: BM25 term scores are doubles; summing doubles across an
unordered shuffle is partition-order-dependent at the ulp level. Each
per-term contribution is therefore quantized to integer micro-units
(floor(x*1e6 + 0.5)) BEFORE the sum — integer addition commutes, so
the final score is bitwise-stable under any partitioning (same trick
as corpus.unigram_logprob_score).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finlogic_spark.functions.text import tokens


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted-index postings: one row per (token, doc) with the term
    frequency and the document's token length.

    dl is derived as sum(tf) per doc and joined back, NOT carried
    through the explode: emitting dl on every exploded token row (plus
    the second tokenize for size()) measured 2.7x slower at 100x bench
    scale (19.2 s vs 7.2 s) — the Generate output then hauls a redundant
    column through 250x more rows. The dl aggregate re-uses the tf
    shuffle (same child plan → ReusedExchange) and the join's small
    side is one row per doc, which AQE broadcasts while it fits."""
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(text_col)).alias("token"),
        )
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    return tf.join(dl, "doc_id").select("token", "doc_id", "dl", "tf")


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs by BM25 for a bag of query terms. Returns
    (doc_id, score, n_terms_hit) ordered by score desc, doc_id asc.

    idf is the standard Robertson–Sparck-Jones form
    ln(1 + (N - df + 0.5)/(df + 0.5)) — always positive, no negative-idf
    clamp needed. avgdl is computed as exact-integer sum(dl)/N (NOT
    avg(dl)): the two integers aggregate deterministically, and the one
    double division is identical on every engine — a double avg() would
    drift with partial-agg order.
    """
    postings = build_postings(docs, id_col, text_col)

    # Corpus stats: N docs + total token count, one tiny aggregate over
    # the per-doc lengths (distinct (doc, dl) pairs collapse for free).
    stats = (
        postings.select("doc_id", "dl")
        .groupBy("doc_id")
        .agg(F.first("dl").alias("dl"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("total_dl"),
        )
    )

    # dict.fromkeys dedupes while keeping caller order — a duplicated
    # query term must not double-count its postings.
    terms = F.broadcast(
        postings.sparkSession.createDataFrame(
            [(t,) for t in dict.fromkeys(query_terms)], "token string"
        )
    )
    # Postings for the query terms only — broadcast semi-reduction, the
    # corpus-size-independent part of the plan.
    hits = postings.join(terms, "token")
    df_per_term = hits.groupBy("token").agg(
        F.count_distinct("doc_id").alias("df")
    )

    scored = (
        hits.join(F.broadcast(df_per_term), "token")
        .join(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (F.lit(k1) + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0)
                    - F.lit(b)
                    + F.lit(b)
                    * F.col("dl")
                    / (F.col("total_dl").cast("double") / F.col("n_docs"))
                )
            ),
        )
        # quantize BEFORE summing: integer micro-units commute across
        # any shuffle order; a double sum would not.
        .withColumn(
            "score_u",
            F.floor(F.col("term_score") * F.lit(1e6) + F.lit(0.5)).cast("long"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            (F.sum("score_u").cast("double") / F.lit(1e6)).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def tfidf_similar(
    docs: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k most similar docs per query doc by tf-idf cosine —
    lexical "more like this" retrieval (and a 4th near-dup signal next
    to MinHash/SimHash/n-gram Jaccard). Returns
    (query_id, doc_id, cos_sim, rk), rk 1..k, excluding self-matches.

    Shape: the query side is a broadcast-filtered slice of the
    postings (|Q| docs); candidates come from an equi-join on token —
    only docs sharing >= 1 term with a query are ever touched, and the
    join output is bounded by |Q| x corpus-df of the shared tokens,
    never all-pairs. Per-term dot-product contributions and per-doc
    norm-square terms are quantized to integer micro-units before
    their sums (partition-order independent); the final cosine is a
    fixed sequence of double ops on those integers.
    """
    postings = build_postings(docs, id_col, text_col)
    # n_docs stays IN the plan (1-row aggregate, broadcast onto the
    # postings) — an eager .count() here would execute the whole
    # postings build once extra, per call, before the real query runs.
    nd = (
        postings.groupBy("doc_id")
        .agg(F.lit(1).alias("__one"))
        .agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    )
    dfs = postings.groupBy("token").agg(
        F.count_distinct("doc_id").alias("df")
    )
    # idf = ln(N/df); weight = tf * idf (both derived from exact ints)
    weighted = (
        postings.join(F.broadcast(dfs), "token")
        .join(F.broadcast(nd))
        .withColumn(
            "w",
            F.col("tf")
            * F.log(F.col("n_docs") / F.col("df").cast("double")),
        )
        .drop("n_docs")
    )
    norms = (
        weighted.groupBy("doc_id")
        .agg(
            F.sum(
                F.floor(F.col("w") * F.col("w") * F.lit(1e6) + F.lit(0.5))
                .cast("long")
            ).alias("nsq_u")
        )
        .select(
            "doc_id",
            F.sqrt(F.col("nsq_u").cast("double") / F.lit(1e6)).alias("norm"),
        )
    )
    qp = weighted.filter(F.col("doc_id").isin(query_ids)).select(
        F.col("doc_id").alias("query_id"),
        "token",
        F.col("w").alias("wq"),
    )
    dots = (
        weighted.join(F.broadcast(qp), "token")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.floor(F.col("wq") * F.col("w") * F.lit(1e6) + F.lit(0.5))
                .cast("long")
            ).alias("dot_u")
        )
    )
    qn = norms.select(
        F.col("doc_id").alias("query_id"), F.col("norm").alias("qnorm")
    )
    scored = (
        dots.join(F.broadcast(qn), "query_id")
        .join(norms, "doc_id")
        .select(
            "query_id",
            "doc_id",
            # 6-dp floor-quantized so rank ties break identically on
            # any engine; zero-norm docs (empty after tokenize) can't
            # reach here (no shared token), so no divide guard needed.
            (
                F.floor(
                    F.col("dot_u").cast("double")
                    / F.lit(1e6)
                    / (F.col("qnorm") * F.col("norm"))
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "doc_id", "cos_sim", "rk")
    )
