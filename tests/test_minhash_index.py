"""Persisted MinHash-LSH index lifecycle: append == rebuild, and the
ingest-time screen finds corpus near-dups without re-reading corpus
text. Twin of tests/test_ann_append.py (vector side)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from finlogic_spark.operators.text_dedup import (
    append_to_minhash_index,
    bucket_pairs,
    build_minhash_index_table,
    minhash_lsh_pairs,
    read_minhash_index,
    screen_against_index,
)


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_append_equals_rebuild(spark, docs, tmp_path):
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    build_minhash_index_table(
        docs.filter(F.col("doc_id") % 2 == 0), inc, k=3, num_hashes=6, bands=2
    )
    appended = append_to_minhash_index(docs.filter(F.col("doc_id") % 2 == 1), inc)
    rebuilt = build_minhash_index_table(docs, full, k=3, num_hashes=6, bands=2)
    assert _sorted_rows(
        appended.df.select("doc_id", "band", "band_hash")
    ) == _sorted_rows(rebuilt.df.select("doc_id", "band", "band_hash"))
    # and the pairs served from the appended index match the direct
    # (no-index) computation exactly
    assert _sorted_rows(bucket_pairs(appended.df, "doc_id")) == _sorted_rows(
        minhash_lsh_pairs(docs, "text", "doc_id", k=3, num_hashes=6, bands=2)
    )


def test_append_uses_sidecar_params_not_caller(spark, tmp_path):
    path = str(tmp_path / "idx")
    a = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(2, "alpha beta gamma delta epsilon zeta eta")], "doc_id long, text string"
    )
    build_minhash_index_table(a, path, k=2, num_hashes=4, bands=2)
    idx = append_to_minhash_index(b, path)
    assert (idx.k, idx.num_hashes, idx.bands) == (2, 4, 2)
    # every doc occupies exactly `bands` bucket rows under the
    # sidecar's banding
    per_doc = {
        r["doc_id"]: r["count"] for r in idx.df.groupBy("doc_id").count().collect()
    }
    assert per_doc == {1: 2, 2: 2}


def test_screen_finds_corpus_neardups(spark, tmp_path):
    path = str(tmp_path / "idx")
    corpus = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog again and again"),
            (11, "an entirely different document about distributed query engines"),
        ],
        "doc_id long, text string",
    )
    build_minhash_index_table(corpus, path, k=3, num_hashes=6, bands=2)
    idx = read_minhash_index(spark, path)
    batch = spark.createDataFrame(
        [
            # near-identical to doc 10 -> must share a band bucket
            (100, "the quick brown fox jumps over the lazy dog again and again"),
            # unrelated -> no candidates
            (101, "completely unrelated text with zero shared shingles here"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["new_id"], r["corpus_id"])
        for r in screen_against_index(batch, idx).collect()
    }
    assert (100, 10) in got
    assert all(new_id != 101 for new_id, _ in got)


def test_sidecar_invisible_to_serving_frame(spark, docs, tmp_path):
    path = str(tmp_path / "idx")
    idx = build_minhash_index_table(
        docs.limit(50), path, k=3, num_hashes=6, bands=2
    )
    assert set(idx.df.columns) == {"doc_id", "band", "band_hash"}
    assert os.path.exists(os.path.join(path, "_stats"))
