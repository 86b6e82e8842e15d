"""DSIR floor-boundary margin pin (VERDICT r12 item 5).

``doc_dsir_select``'s cross-engine determinism rests on every
per-token log-ratio being floored to micro-nats identically by Spark's
and DuckDB's libm. That holds unless some token's ln() value lands
within ~1 ulp of a floor boundary — then a 1-ulp libm divergence
shifts that token's integer ratio by 1 micro-nat and can flip the
top-100 cut, failing the gate on a CORRECT engine.

Rather than weaken the oracle to a tolerance comparison (which would
also forgive real bugs), this pins the empirical premise: for the
exact corpora the gate runs on (sf0.01 and sf0.1), every vocab
token's two ln() values sit at least MARGIN away from the nearest
floor boundary in micro-nat space. A 1-ulp difference moves a value
by |x|*1e6*2^-52 ≈ 3e-9 here; MARGIN = 1e-6 gives ~300x headroom.
If the driver ever regenerates testdata onto a boundary, this test
fails loudly BEFORE the gate goes red mysteriously.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')"
MARGIN = 1e-6

_SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.exists(f"{d}/documents.parquet")
]


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_dsir_log_ratios_clear_floor_boundaries(sf_dir):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    rows = con.sql(
        f"""
        WITH tok AS (SELECT doc_id, lang, unnest({_TOKS}) AS token
                     FROM documents),
        craw AS (SELECT token, count(*) AS n_raw FROM tok GROUP BY 1),
        ctgt AS (SELECT token, count(*) AS n_tgt FROM tok
                 WHERE lang = 'en' GROUP BY 1),
        vocab AS (SELECT token, n_raw, coalesce(n_tgt, 0) AS n_tgt
                  FROM craw LEFT JOIN ctgt USING (token)),
        tot AS (SELECT CAST(count(*) AS DOUBLE) AS v,
                       CAST(sum(n_raw) AS DOUBLE) AS traw,
                       CAST(sum(n_tgt) AS DOUBLE) AS ttgt
                FROM vocab)
        SELECT n_raw, n_tgt, v, traw, ttgt FROM vocab, tot
        """
    ).fetchall()
    assert rows, sf_dir
    min_d = 2.0
    for n_raw, n_tgt, v, traw, ttgt in rows:
        for x in (
            math.log((n_tgt + 0.5) / (ttgt + 0.5 * v)),
            math.log((n_raw + 0.5) / (traw + 0.5 * v)),
        ):
            y = x * 1e6
            d = min(y - math.floor(y), math.floor(y) + 1 - y)
            min_d = min(min_d, d)
    assert min_d > MARGIN, (
        f"a token log-ratio sits {min_d:.2e} from a micro-nat floor "
        f"boundary at {sf_dir} — cross-engine determinism of "
        "doc_dsir_select is no longer guaranteed; regenerate the "
        "fixture or switch the oracle to a ±1-micro-nat tolerance"
    )
