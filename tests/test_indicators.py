"""Tests for the indicators DAG semantics (reference:
src/finlogic/indicators.py — trap list SURVEY.md §4.3)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from finlogic_spark.indicators import build_indicators


def _financials(spark, rows):
    return spark.createDataFrame(
        rows,
        "entry_id long, cvm_id long, name_id string, tax_id string, "
        "acc_code string, acc_name string, acc_value double, "
        "is_annual boolean, is_consolidated boolean, "
        "period_begin date, period_end date",
    )


def _row(eid, cvm, code, value, year, annual=True, cons=True, month=12, day=31):
    return (
        eid, cvm, f"CO{cvm}", "00.000.000/0000-00", code, "nm", float(value),
        annual, cons, dt.date(year, 1, 1), dt.date(year, month, day),
    )


BASE_CODES = {
    "1": 1000.0e7, "1.01": 400e7, "1.01.01": 100e7, "1.01.02": 50e7,
    "2.01": 300e7, "2.01.04": 80e7, "2.02.01": 120e7, "2.03": 500e7,
    "3.01": 900e7, "3.03": 400e7, "3.05": 250e7, "3.07": 230e7,
    "3.08": -60e7, "3.11": 170e7, "6.01": 210e7, "6.01.01.04": 40e7,
    "3.99.01.01": 3.5,
}


def _company_rows(cvm=1, years=(2020, 2021), scale=1.0):
    rows, eid = [], 0
    for y in years:
        for code, v in BASE_CODES.items():
            val = v if code == "3.99.01.01" else v * scale
            rows.append(_row(eid := eid + 1, cvm, code, val, y))
    return rows


def test_derived_columns_exact(spark):
    df = _financials(spark, _company_rows())
    ind = build_indicators(df, "entry_id")
    r = ind.filter(F.col("period_end") == dt.date(2021, 12, 31)).collect()[0]
    assert r["total_cash"] == pytest.approx(150e7)
    assert r["total_debt"] == pytest.approx(200e7)
    assert r["working_capital"] == pytest.approx(100e7)
    assert r["net_debt"] == pytest.approx(50e7)
    assert r["ebitda"] == pytest.approx(290e7)
    assert r["invested_capital"] == pytest.approx(550e7)
    # effective_tax_rate = -(-60e7)/230e7
    assert r["effective_tax_rate"] == pytest.approx(60 / 230)
    assert r["gross_margin"] == pytest.approx(400 / 900)
    # ROIC year 2: avg invested capital = (550+550)/2 = 550e7
    assert r["roic"] == pytest.approx(250e7 * 0.66 / 550e7)


def test_first_year_avg_falls_back_to_current(spark):
    df = _financials(spark, _company_rows())
    ind = build_indicators(df, "entry_id")
    r = ind.filter(F.col("period_end") == dt.date(2020, 12, 31)).collect()[0]
    # No prior year → avg = current → same ROIC as steady state.
    assert r["roic"] == pytest.approx(250e7 * 0.66 / 550e7)


def test_cutoff_guard_zeroes_small_revenue(spark):
    rows = _company_rows()
    # Shrink revenues below CUT_OFF (1e6) for 2021.
    rows = [
        r if not (r[4] == "3.01" and r[10].year == 2021) else r[:6] + (5e5,) + r[7:]
        for r in rows
    ]
    df = _financials(spark, rows)
    ind = build_indicators(df, "entry_id")
    r = ind.filter(F.col("period_end") == dt.date(2021, 12, 31)).collect()[0]
    assert r["gross_margin"] == 0.0 and r["net_margin"] == 0.0


def test_missing_code_fills_zero(spark):
    rows = [r for r in _company_rows() if r[4] != "6.01.01.04"]
    df = _financials(spark, rows)
    ind = build_indicators(df, "entry_id")
    r = ind.collect()[0]
    assert r["depreciation_amortization"] == 0.0
    assert r["ebitda"] == pytest.approx(250e7)  # ebit + 0


def test_duplicate_key_keeps_latest_entry(spark):
    rows = _company_rows(years=(2021,))
    dup = _row(999, 1, "1", 7777e7, 2021)
    df = _financials(spark, rows + [dup])
    ind = build_indicators(df, "entry_id")
    assert ind.collect()[0]["total_assets"] == pytest.approx(7777e7)


def test_quarterly_keeps_only_latest_quarter(spark):
    rows = _company_rows(years=(2020, 2021))
    eid = 10_000
    for q, (m, d) in enumerate([(3, 31), (6, 30), (9, 30)]):
        for code, v in BASE_CODES.items():
            rows.append(
                _row(eid := eid + 1, 1, code, v, 2022, annual=False, month=m, day=d)
            )
    df = _financials(spark, rows)
    ind = build_indicators(df, "entry_id")
    quarterly = ind.filter(~F.col("is_annual")).collect()
    assert len(quarterly) == 1
    assert quarterly[0]["period_end"] == dt.date(2022, 9, 30)


def test_quarterly_lag4_preference(spark):
    # 6 quarters: avg for the last quarter must prefer lag-4 (same
    # quarter last year), not lag-1.
    rows = []
    eid = 0
    quarters = [
        (2021, 3, 31), (2021, 6, 30), (2021, 9, 30), (2021, 12, 31),
        (2022, 3, 31), (2022, 6, 30),
    ]
    for qi, (y, m, d) in enumerate(quarters):
        for code, v in BASE_CODES.items():
            val = v * (1 + qi) if code == "2.03" else v  # equity grows per quarter
            rows.append(_row(eid := eid + 1, 1, code, val, y, annual=False, month=m, day=d))
    df = _financials(spark, rows)
    ind = build_indicators(df, "entry_id")
    r = ind.collect()[0]  # only latest quarter survives: 2022-06-30, equity×6
    # lag-4 is 2021-06-30 (equity×2): avg_equity = (6+2)/2 = 4× base
    expected_roe = 250e7 * 0.66 / (4 * 500e7)
    assert r["return_on_equity"] == pytest.approx(expected_roe)


def test_annual_quarterly_union_coexists(spark):
    rows = _company_rows(years=(2021,))
    eid = 20_000
    for code, v in BASE_CODES.items():
        rows.append(_row(eid := eid + 1, 1, code, v, 2022, annual=False, month=3, day=31))
    df = _financials(spark, rows)
    ind = build_indicators(df, "entry_id")
    assert ind.filter(F.col("is_annual")).count() == 1
    assert ind.filter(~F.col("is_annual")).count() == 1
