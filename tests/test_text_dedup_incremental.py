"""Incremental exact dedup against the persisted fingerprint store
(operators/text_dedup.py build_fingerprint_store / dedup_against_store /
append_fingerprints)."""

import pytest
from pyspark.sql import functions as F

from finlogic_spark.operators.text_dedup import (
    append_fingerprints,
    build_fingerprint_store,
    canonical_text,
    dedup_against_store,
)


def _hist_and_batch(spark):
    hist = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (2, "Alpha   BETA gamma"),  # canonical dup of 0
            (4, "delta epsilon"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (11, "alpha beta gamma"),   # dup of history 0
            (13, "zeta eta"),           # novel
            (15, "ZETA  eta"),          # batch-dup of 13
            (17, None),                 # null text: novel by contract
            (19, "delta epsilon"),      # dup of history 4
        ],
        "doc_id long, text string",
    )
    return hist, batch


def test_dedup_against_store_flags_and_attribution(spark, tmp_path):
    hist, batch = _hist_and_batch(spark)
    path = str(tmp_path / "fp")
    build_fingerprint_store(hist, path, "text", "doc_id")
    store = spark.read.parquet(path)
    # one row per distinct hash, lowest owner wins (0, not 2)
    owners = {r["hash"]: r["owner"] for r in store.collect()}
    assert len(owners) == 2 and 0 in owners.values() and 4 in owners.values()

    got = {
        r["doc_id"]: (r["is_novel"], r["dup_of"])
        for r in dedup_against_store(batch, store, "text", "doc_id").collect()
    }
    assert got[11] == (False, 0)    # history owner wins
    assert got[13] == (True, None)  # novel
    assert got[15] == (False, 13)   # batch-mate attribution
    assert got[17] == (True, None)  # null text: novel, no hash
    assert got[19] == (False, 4)


def test_append_equals_rebuild(spark, tmp_path):
    """Ingest-commit: append of the batch's novel hashes must land the
    store a from-scratch rebuild over history+batch would (min() is
    associative; history ids precede batch ids by the ingest
    contract)."""
    hist, batch = _hist_and_batch(spark)
    path = str(tmp_path / "fp")
    build_fingerprint_store(hist, path, "text", "doc_id")
    added = append_fingerprints(batch, path, "text", "doc_id")
    assert added == 1  # only the zeta-eta class is new
    appended = {
        r["hash"]: r["owner"] for r in spark.read.parquet(path).collect()
    }
    rebuilt_path = str(tmp_path / "fp_rebuild")
    build_fingerprint_store(
        hist.unionByName(batch), rebuilt_path, "text", "doc_id"
    )
    rebuilt = {
        r["hash"]: r["owner"]
        for r in spark.read.parquet(rebuilt_path).collect()
    }
    assert appended == rebuilt
    # idempotent: a second append of the same batch adds nothing
    assert append_fingerprints(batch, path, "text", "doc_id") == 0


def test_registry_query_row_shape(spark, sf_dir):
    from finlogic_spark.driver_queries import QUERIES

    out = QUERIES["doc_exact_dedup_incremental"](spark, sf_dir)
    assert out.columns == ["doc_id", "text_hash", "is_novel", "dup_of"]
    rows = out.collect()
    assert rows and all(r["doc_id"] % 2 == 1 for r in rows)
    for r in rows:
        if r["is_novel"]:
            assert r["dup_of"] is None
        else:
            assert r["dup_of"] is not None and r["dup_of"] < r["doc_id"]
