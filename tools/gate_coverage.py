"""Historical correctness-gate coverage audit.

The driver's per-round gate checks only the FIRST 50 registry entries;
the newest-first interleave (driver_queries._interleave_registry) keeps
each round's newcomers inside that window, and the committed
CORRECTNESS_local_r*.json runs cover the full registry. But "every
query has been green under SOME gate at least once" was, until now, an
argument, not a check. This tool makes it mechanical: scan every
committed correctness artifact (driver gates CORRECTNESS_r*.json and
full-registry local runs CORRECTNESS_local_r*.json), and report, for
each name currently in the registry, the artifacts in which it was
GREEN (rows+schema+hash for oracle-backed queries; a clean rows-only
record for the non-SQL-expressible ones).

Exit 0 iff every current registry query is green in >= 1 artifact.

Usage: python tools/gate_coverage.py [--json out.json] [repo_dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def record_green(rec: dict) -> bool:
    """A query record counts as green under the strongest check the
    artifact ran on it.

    - driver gate / local runs with an oracle: rows+schema+hash all
      True and no error. (Older local runs wrote rows_match: null —
      round 11 populates it; null is treated as "not asserted", so
      only schema+hash carry those artifacts.)
    - rows-only records (no SQL oracle expressible): an error-free run
      with a recorded row count.
    """
    if rec.get("err"):
        return False
    if rec.get("status") == "ROWS_ONLY" or rec.get("rows_only"):
        return "rows" in rec
    if rec.get("status") == "FAIL":
        return False
    return (
        rec.get("rows_match") is not False
        and rec.get("schema_match") is True
        and rec.get("hash_match") is True
    )


def iter_artifacts(repo: str):
    """Yield (artifact_name, {query: record}) for every committed
    correctness artifact, both driver-gate and local-full-registry
    shapes."""
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        name = os.path.basename(path)
        if isinstance(data, dict) and "results" in data:
            yield name, data["results"]
        elif isinstance(data, dict):
            # driver-gate shape: {query: record} directly
            if all(isinstance(v, dict) for v in data.values()):
                yield name, data


def audit(repo: str) -> dict:
    from finlogic_spark import driver_queries as dq

    registry = list(dq.QUERIES)
    green_in: dict[str, list[str]] = {q: [] for q in registry}
    for art, results in iter_artifacts(repo):
        for q, rec in results.items():
            if q in green_in and isinstance(rec, dict) and record_green(rec):
                green_in[q].append(art)
    uncovered = [q for q, arts in green_in.items() if not arts]
    return {
        "n_registry": len(registry),
        "n_covered": len(registry) - len(uncovered),
        "uncovered": uncovered,
        "green_in": green_in,
    }


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    repo = argv[0] if argv else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    out = audit(repo)
    print(
        f"{out['n_covered']}/{out['n_registry']} registry queries green "
        "in >= 1 committed correctness artifact"
    )
    for q in out["uncovered"]:
        print(f"UNCOVERED {q}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {json_out}")
    return 1 if out["uncovered"] else 0


if __name__ == "__main__":
    sys.exit(main())
