"""Measure recall of the approximate similarity tiers at the SHIPPED
defaults against their exact ground truths (VERDICT r5 item 6).

- doc_lsh_pairs (MinHash 6 hashes, 2 bands of 3) vs doc_ngram_jaccard
  (exact 3-shingle Jaccard >= 0.5): pair recall = |candidates ∩ truth|
  / |truth|. LSH can only MISS true pairs (false negatives); its false
  positives cost verification compute, so precision is reported too.
- emb_lsh_topk (6 hyperplanes) vs emb_cosine_topk (exact): recall@5
  over the registry's query set = fraction of exact top-5 (query, vec)
  pairs the approximate tier returns.
- emb_ivf_topk (8 cells, n_probe per registry default) vs exact:
  recall@5 the same way.

Usage: python tools/measure_recall.py [sf_dir] [--json out.json]
Defaults to /root/testdata/sf0.1 (the bench scale). The pytest floor
(tests/test_recall.py) runs the same function at sf0.01.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pair_recall(spark, sf_dir: str) -> dict:
    from finlogic_spark.driver_queries import QUERIES

    truth = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["doc_ngram_jaccard"](spark, sf_dir).collect()
    }
    cand = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["doc_lsh_pairs"](spark, sf_dir).collect()
    }
    hit = len(truth & cand)
    return {
        "n_true_pairs": len(truth),
        "n_candidates": len(cand),
        "recall": round(hit / len(truth), 4) if truth else None,
        "precision": round(hit / len(cand), 4) if cand else None,
    }


def topk_recall(spark, sf_dir: str, approx_name: str) -> dict:
    from finlogic_spark.driver_queries import QUERIES

    exact = {
        (r["query_id"], r["vec_id"])
        for r in QUERIES["emb_cosine_topk"](spark, sf_dir).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in QUERIES[approx_name](spark, sf_dir).collect()
    }
    return {
        "n_exact": len(exact),
        "n_approx": len(approx),
        "recall_at_5": round(len(exact & approx) / len(exact), 4),
    }


def measure(spark, sf_dir: str) -> dict:
    return {
        "sf_dir": sf_dir,
        "doc_lsh_pairs_vs_ngram_jaccard": pair_recall(spark, sf_dir),
        "emb_lsh_topk_vs_cosine": topk_recall(spark, sf_dir, "emb_lsh_topk"),
        "emb_ivf_topk_vs_cosine": topk_recall(spark, sf_dir, "emb_ivf_topk"),
    }


def main() -> None:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    from finlogic_spark.session import get_spark

    out = measure(get_spark("measure-recall"), sf_dir)
    print(json.dumps(out, indent=1))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
