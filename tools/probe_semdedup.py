"""Scale probe for semantic_dedup's n^1.5 claim.

SemDeDup's cost model: with n_cells ≈ sqrt(n) the within-cell pairwise
compare is ~n^1.5 cosine evaluations total. The registry query pins 8
cells (mirroring the IVF gate query at tiny sf); THIS probe runs the
operator the way a deployment would — cells scaled with the corpus —
and records wall time + survivor counts per sf so the scaling curve is
measured, not asserted.

Centroids are the first ceil(sqrt(n)) corpus vectors (deterministic
seed centroids, same convention as the IVF tier; a k-means fit would
tighten cells but the complexity claim is independent of centroid
quality).

Usage: python tools/probe_semdedup.py [sf_dir ...] [--json out.json]
Defaults: sf1 and sf10.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    dirs = argv or ["/root/repo/testdata/sf1", "/root/repo/testdata/sf10"]

    from finlogic_spark.driver_queries import _emb_corpus
    from finlogic_spark.operators.similarity import semantic_dedup
    from finlogic_spark.session import get_spark

    spark = get_spark("probe-semdedup")
    out = {"runs": {}}
    for sf_dir in dirs:
        emb = _emb_corpus(spark, sf_dir)
        n = emb.count()
        k = math.ceil(math.sqrt(n))
        cents = [
            (int(r["vec_id"]), list(map(float, r["embedding"])))
            for r in emb.filter(F.col("vec_id") < k).collect()
        ]
        t0 = time.perf_counter()
        kept = semantic_dedup(emb, cents, threshold=0.35).count()
        wall = round(time.perf_counter() - t0, 1)
        out["runs"][sf_dir] = {
            "n_vectors": n, "n_cells": len(cents),
            "kept": kept, "dropped": n - kept, "wall_s": wall,
        }
        print(sf_dir, out["runs"][sf_dir], flush=True)
    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
