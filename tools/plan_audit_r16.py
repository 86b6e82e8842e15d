"""Round-16 bulk plan audit: build EVERY registry query at sf0.1 and
scan its .explain('formatted') text for structural red flags (guide
sections in parens):

- CartesianProduct / BroadcastNestedLoopJoin that is not a bounded
  1-row/topk broadcast (§3.4)
- BatchEvalPython (row-at-a-time Python — §4.1); ArrowEvalPython /
  MapInPandas / MapInArrow are the sanctioned vectorized class
- SortMergeJoin count (§3.1: is a broadcast cheaper?)
- Exchange count (§2: each is a full shuffle of its input)
- parquet scans whose PushedFilters is empty while a Filter sits in
  the plan (§6.2 pushdown failure)

Output: JSON {query: {flags}} + a ranked text summary to stdout.
Explain-only — nothing executes, so this is safe to run alongside
nothing else and takes ~2 min for 177 queries.

Usage: python tools/plan_audit_r16.py [out.json]
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finlogic_spark import driver_queries as dq
from finlogic_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_audit_r16.json"
    spark = get_spark("plan-audit-r16")
    results: dict[str, dict] = {}
    for name, fn in dq.QUERIES.items():
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            results[name] = {"error": str(exc)[:200]}
            continue
        scans = txt.count("Scan parquet")
        empty_push = len(
            re.findall(r"PushedFilters: \[\]", txt)
        )
        results[name] = {
            "exchanges": txt.count("+- Exchange") + txt.count(": Exchange")
            + txt.count("- Exchange"),
            "smj": txt.count("SortMergeJoin"),
            "cartesian": txt.count("CartesianProduct"),
            "bnlj": txt.count("BroadcastNestedLoopJoin"),
            "batch_eval_python": txt.count("BatchEvalPython"),
            "arrow_eval_python": txt.count("ArrowEvalPython"),
            "map_in_arrow": txt.count("MapInArrow") + txt.count("mapInArrow"),
            "generates": txt.count("Generate"),
            "scans_parquet": scans,
            "scans_pushedfilters_empty": empty_push,
            "window_single_part": txt.count("Window")
            and "WindowExec" in txt,
        }
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    # ranked summary
    bad = {
        k: v
        for k, v in results.items()
        if v.get("error")
        or v.get("cartesian")
        or v.get("batch_eval_python")
    }
    print("errors/cartesian/rowPython:", json.dumps(bad, indent=1))
    top_x = sorted(
        ((v.get("exchanges", 0), k) for k, v in results.items()), reverse=True
    )[:20]
    print("top exchange counts:")
    for n, k in top_x:
        print(f"  {n:3d}  {k}")
    top_s = sorted(
        ((v.get("smj", 0), k) for k, v in results.items()), reverse=True
    )[:10]
    print("top SMJ counts:")
    for n, k in top_s:
        print(f"  {n:3d}  {k}")


if __name__ == "__main__":
    main()
