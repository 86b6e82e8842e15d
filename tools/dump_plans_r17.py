"""Dump .explain('formatted') for round-17 queries into
plans/r17/<query>_<label>.txt. Unlike the r16 tool (which patched the
prior shape back in), this one is run TWICE — once at the pre-change
commit for `before`, once after landing for `after` — so each file is
the plan the committed code of that moment actually produces.

For multi-job operators (CC/pagerank: eager materialization inside the
operator) the header also records the JOB COUNT observed while
building and evaluating the query — the metric a shuffle/job-count
optimization moves — since explain() of the returned frame only shows
the final composition over checkpoint scans.

Usage: python tools/dump_plans_r17.py <before|after> <query> [...]
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
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r17",
)


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
    if len(sys.argv) < 3 or sys.argv[1] not in ("before", "after"):
        raise SystemExit(
            "usage: dump_plans_r17.py <before|after> <query> [...]"
        )
    label = sys.argv[1]
    names = sys.argv[2:]
    unknown = [n for n in names if n not in dq.QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plans-r17")
    for name in names:
        text = _capture(spark, name, label)
        path = os.path.join(OUT_DIR, f"{name}_{label}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
