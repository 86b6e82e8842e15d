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

from collections.abc import Mapping

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
