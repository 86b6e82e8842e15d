"""Guards the driver-gate window invariant.

The driver's hard correctness gate checks only the FIRST 50 entries of
finlogic_spark.driver_queries.QUERIES (tools/check_oracle.py mirrors
it). _interleave_registry() reorders the dict newest-first-interleaved
so that window always covers the most recently added operators — but
only if it stays the LAST registry mutation in the module. These tests
run against the fully-imported module, so a @q registration added
below the interleave call (which the module's own import-time assert
cannot see) fails here.
"""

from finlogic_spark import driver_queries as dq


def test_newest_registration_inside_gate_window():
    newest = dq.REGISTRATION_ORDER[-1]
    gate = list(dq.QUERIES)[:50]
    assert newest in gate, (
        f"newest query {newest!r} is outside the driver gate's 50-query "
        "window — a @q was registered after _interleave_registry()"
    )


def test_gate_window_covers_newest_quarter():
    # The interleave promises ~25 newest + ~25 oldest inside the gate.
    newest_25 = dq.REGISTRATION_ORDER[-25:]
    oldest_25 = dq.REGISTRATION_ORDER[:25]
    gate = set(list(dq.QUERIES)[:50])
    missing_new = [n for n in newest_25 if n not in gate]
    missing_old = [n for n in oldest_25 if n not in gate]
    assert not missing_new, f"newest-25 outside gate window: {missing_new}"
    assert not missing_old, f"oldest-25 outside gate window: {missing_old}"


def test_registry_and_registration_order_agree():
    assert set(dq.REGISTRATION_ORDER) == set(dq.QUERIES)
    assert len(dq.REGISTRATION_ORDER) == len(dq.QUERIES)


def test_every_registry_query_green_in_some_committed_gate():
    """Full HISTORICAL gate coverage, made mechanical: the 50-query
    driver window plus the committed full-registry local runs must
    have certified every current registry query green at least once.
    A query that exists but has never sat inside any gate is exactly
    the blind spot the newest-first interleave is supposed to prevent
    — this asserts the outcome, not the mechanism."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    )
    import gate_coverage

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = gate_coverage.audit(repo)
    assert not out["uncovered"], (
        f"{len(out['uncovered'])} registry queries never green in any "
        f"committed correctness artifact: {out['uncovered']}"
    )
