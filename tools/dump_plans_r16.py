"""Dump .explain('formatted') for round-16 touched queries into
plans/r16/<query>_{before,after}.txt. 'before' recreates the prior
shape (e.g. distributed CC forced); 'after' is the current default.
For multi-job operators (CC/pagerank: eager materialization inside)
the file also records the JOB COUNT observed while evaluating the
query — the metric the optimization moves — since explain() of the
returned frame only shows the final composition over checkpoint scans.

Usage: python tools/dump_plans_r16.py <query> [<query> ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finlogic_spark import driver_queries as dq
from finlogic_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")

CC_QUERIES = {
    "doc_dedup_clusters",
    "doc_cluster_split",
    "doc_canonical_select",
    "doc_training_export",
    "doc_split_drift",
    "doc_split_assign_sticky",
}


def _capture(spark, name: str, label: str) -> str:
    sc = spark.sparkContext
    group = f"plan-{name}-{label}"
    sc.setJobGroup(group, group)
    try:
        df = dq.QUERIES[name](spark, SF_DIR)
        jobs_build = len(sc.statusTracker().getJobIdsForGroup(group))
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        df.write.format("noop").mode("overwrite").save()
        jobs_total = len(sc.statusTracker().getJobIdsForGroup(group))
    finally:
        sc.setJobGroup(None, None)
    return (
        f"-- {name} [{label}] jobs_during_build={jobs_build} "
        f"jobs_total_incl_noop={jobs_total}\n" + buf.getvalue()
    )


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plans-r16")
    from finlogic_spark.operators import graph

    orig = graph.connected_components
    for name in sys.argv[1:]:
        if name in CC_QUERIES:
            def forced(*a, **k):
                k["small_graph_max_bytes"] = 0
                return orig(*a, **k)

            graph.connected_components = forced
            try:
                before = _capture(spark, name, "before: distributed cc")
            finally:
                graph.connected_components = orig
            after = _capture(spark, name, "after: single-job cc gate")
        else:
            before = None
            after = _capture(spark, name, "current")
        if before is not None:
            with open(os.path.join(OUT_DIR, f"{name}_before.txt"), "w") as fh:
                fh.write(before)
        with open(os.path.join(OUT_DIR, f"{name}_after.txt"), "w") as fh:
            fh.write(after)
        print(f"wrote {name}", flush=True)


if __name__ == "__main__":
    main()
