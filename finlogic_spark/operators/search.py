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
    frequency and the document's token length. dl rides along via the
    groupBy key (constant within a doc) so no second join is needed."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(text_col)).alias("dl"),
        F.explode(tokens(text_col)).alias("token"),
    )
    return toks.groupBy("token", "doc_id", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )


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
