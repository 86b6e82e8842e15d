"""Recall floors for the approximate similarity tiers at the SHIPPED
defaults (VERDICT r5 item 6): the defaults must keep measured recall
above these floors against their exact ground truths, so a parameter
regression (fewer tables, narrower probes, fewer bands) fails CI
instead of silently shipping a low-recall index.

Measured values at these defaults (tools/measure_recall.py; emb-LSH
defaults chosen from the tools/lsh_frontier.py sweep — 12 planes x 16
tables x Hamming-2, the same ~29% uniform-corpus scan budget as the
previous 8x8x1 at recall 0.94 vs 0.80 at sf0.1):
  sf0.01: doc pairs 1.00 recall / 1.00 precision,
          emb LSH 0.74 (500-vector corpus: bucket statistics are
          noisy at this size; the sf0.1 number is the meaningful one),
          emb IVF 0.86
  sf0.1:  doc pairs 0.98 recall / 0.99 precision,
          emb LSH 0.94, emb IVF 0.92
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from measure_recall import measure  # noqa: E402

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def recalls(spark):
    return measure(spark, SF)


def test_doc_lsh_pair_recall_floor(recalls):
    r = recalls["doc_lsh_pairs_vs_ngram_jaccard"]
    assert r["recall"] >= 0.9
    assert r["precision"] >= 0.9


def test_emb_lsh_topk_recall_floor(recalls):
    # floor at sf0.01 (0.74 measured on a 500-vector corpus); the
    # shipped-default quality claim (0.94) is pinned at sf0.1 by the
    # README frontier table + tools/lsh_frontier.py
    assert recalls["emb_lsh_topk_vs_cosine"]["recall_at_5"] >= 0.7


def test_emb_ivf_topk_recall_floor(recalls):
    assert recalls["emb_ivf_topk_vs_cosine"]["recall_at_5"] >= 0.7
