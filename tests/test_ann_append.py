"""Incremental ANN index maintenance: append_to_lsh_index /
append_to_ivf_index must be EXACTLY rebuild-equivalent — the appended
index is row-for-row the from-scratch build over the union, and serving
from it returns identical top-k. This is the embedding-side twin of the
positional-postings append pin (tests/test_round8_ops.py): at 100 TB
the corpus arrives hourly, and an index you must rebuild to extend is
an index you can't afford."""

from __future__ import annotations

from pyspark.sql import functions as F

from finlogic_spark.operators.similarity import (
    append_to_ivf_index,
    append_to_lsh_index,
    build_ivf_index_table,
    build_lsh_index_table,
    ivf_topk,
    lsh_cosine_topk,
    read_ivf_index,
    read_lsh_index,
)

DIM, PLANES, TABLES = 64, 6, 3


def _corpus(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "embedding"
            ),
        )
    )


def _rows(df):
    return sorted(
        (int(r["vec_id"]), int(r["__tbl"]), int(r["__bucket"]))
        for r in df.select("vec_id", "__tbl", "__bucket").collect()
    )


def test_lsh_append_equals_rebuild(spark, sf_dir, tmp_path):
    corpus = _corpus(spark, sf_dir)
    old = corpus.filter(F.col("vec_id") % 2 == 0)
    new = corpus.filter(F.col("vec_id") % 2 == 1)

    full_path = str(tmp_path / "lsh_full")
    inc_path = str(tmp_path / "lsh_inc")
    full = build_lsh_index_table(corpus, full_path, DIM, PLANES, TABLES)
    build_lsh_index_table(old, inc_path, DIM, PLANES, TABLES)
    inc = append_to_lsh_index(new, inc_path)

    # parameters ride the sidecar, not the caller
    assert (inc.dim, inc.num_planes, inc.num_tables) == (DIM, PLANES, TABLES)
    assert _rows(inc.df) == _rows(full.df)

    # serving from the appended index == serving from the rebuild
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    def serve(idx):
        out = lsh_cosine_topk(
            idx.df, queries, k=3, dim=idx.dim,
            num_planes=idx.num_planes, num_tables=idx.num_tables,
            probe_radius=1, corpus_bucketed=True, local_query_probes=True,
        )
        return sorted(map(tuple, out.collect()))

    assert serve(inc) == serve(full)

    # read-back handle is self-sufficient (fresh open, no build state)
    reopened = read_lsh_index(spark, inc_path)
    assert _rows(reopened.df) == _rows(full.df)


def test_ivf_append_equals_rebuild(spark, sf_dir, tmp_path):
    corpus = _corpus(spark, sf_dir)
    rows = corpus.filter(F.col("vec_id") < 6).collect()
    cents = [
        (int(r["vec_id"]), list(map(float, r["embedding"]))) for r in rows
    ]
    old = corpus.filter(F.col("vec_id") % 2 == 0)
    new = corpus.filter(F.col("vec_id") % 2 == 1)

    full_path = str(tmp_path / "ivf_full")
    inc_path = str(tmp_path / "ivf_inc")
    full = build_ivf_index_table(corpus, cents, full_path)
    build_ivf_index_table(old, cents, inc_path)
    inc = append_to_ivf_index(new, inc_path)

    # centroids are frozen in the sidecar; append assigned against them
    assert inc.cents == sorted(cents)

    def assignments(idx):
        return sorted(
            (int(r["vec_id"]), int(r["__cell"]))
            for r in idx.df.select("vec_id", "__cell").collect()
        )

    assert assignments(inc) == assignments(full)

    queries = corpus.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    def serve(idx):
        out = ivf_topk(
            idx.df, queries, idx.cents, k=3, n_probe=2,
            corpus_assigned=True,
        )
        return sorted(map(tuple, out.collect()))

    assert serve(inc) == serve(full)

    reopened = read_ivf_index(spark, inc_path)
    assert assignments(reopened) == assignments(full)


def test_lsh_index_multi_rejects_zero_tables(spark):
    """ADVICE r16: num_tables=0 used to raise IndexError in the union
    form; the r16 explode form would instead silently drop every row
    and return an empty index, masking the caller bug. Guarded now."""
    import pytest

    from finlogic_spark.operators.similarity import lsh_index_multi

    df = spark.createDataFrame(
        [(1, [0.1] * DIM)], "vec_id long, embedding array<double>"
    )
    for bad in (0, -1):
        with pytest.raises(ValueError, match="num_tables"):
            lsh_index_multi(df, "embedding", DIM, PLANES, bad)
