"""Deterministic FinLogic-shaped fixture tables (FIXTURES.md).

The reference tests against live production data with golden scalars
(reference tests/test_company.py:6); these synthetic tables make that
style hermetic. Seeded, pure-Python generation — no RNG state leaks.
"""

from __future__ import annotations

import datetime as dt
import itertools
import os
import random

import pandas as pd
from pyspark.sql import SparkSession

# Indicator codes that must all appear (indicators.py mapping) plus
# deeper non-indicator codes for acc_level filtering and EPS.
BASE_CODES = [
    "1", "1.01", "1.01.01", "1.01.02", "1.02",
    "2", "2.01", "2.01.04", "2.01.04.01", "2.02", "2.02.01", "2.02.01.03",
    "2.03", "3", "3.01", "3.03", "3.05", "3.07", "3.08", "3.11",
    "3.99", "3.99.01.01", "6", "6.01", "6.01.01.04",
]

ACC_NAMES_PT = {
    "1": "Ativo Total",
    "1.01": "Ativo Circulante",
    "1.01.01": "Caixa e Equivalentes",
    "1.01.02": "Aplicacoes Financeiras",
    "1.02": "Ativo Nao Circulante",
    "2": "Passivo Total",
    "2.01": "Passivo Circulante",
    "2.01.04": "Emprestimos de Curto Prazo",
    "2.01.04.01": "Emprestimos em Moeda Nacional",
    "2.02": "Passivo Nao Circulante",
    "2.02.01": "Emprestimos de Longo Prazo",
    "2.02.01.03": "Debentures",
    "2.03": "Patrimonio Liquido",
    "3": "Resultado",
    "3.01": "Receita de Venda",
    "3.03": "Resultado Bruto",
    "3.05": "Resultado Operacional",
    "3.07": "Resultado Antes dos Impostos",
    "3.08": "Impostos",
    "3.11": "Lucro Liquido",
    "3.99": "Lucro por Acao",
    "3.99.01.01": "LPA Basico",
    "6": "Fluxo de Caixa",
    "6.01": "Caixa das Operacoes",
    "6.01.01.04": "Depreciacao e Amortizacao",
}

# Leave "Debentures" untranslated → exercises the "(pt) " fallback.
LANGUAGE_ROWS = [
    ("Ativo Total", "Total Assets"),
    ("Ativo Circulante", "Current Assets"),
    ("Caixa e Equivalentes", "Cash Equivalents"),
    ("Aplicacoes Financeiras", "Financial Investments"),
    ("Ativo Nao Circulante", "Non-current Assets"),
    ("Passivo Total", "Total Liabilities"),
    ("Passivo Circulante", "Current Liabilities"),
    ("Emprestimos de Curto Prazo", "Short-term Debt"),
    ("Emprestimos em Moeda Nacional", "Local Currency Loans"),
    ("Passivo Nao Circulante", "Non-current Liabilities"),
    ("Emprestimos de Longo Prazo", "Long-term Debt"),
    ("Patrimonio Liquido", "Equity"),
    ("Resultado", "Income"),
    ("Receita de Venda", "Revenues"),
    ("Resultado Bruto", "Gross Profit"),
    ("Resultado Operacional", "Operating Income"),
    ("Resultado Antes dos Impostos", "Earnings Before Taxes"),
    ("Impostos", "Taxes"),
    ("Lucro Liquido", "Net Income"),
    ("Lucro por Acao", "Earnings per Share"),
    ("LPA Basico", "Basic EPS"),
    ("Fluxo de Caixa", "Cash Flow"),
    ("Caixa das Operacoes", "Operating Cash Flow"),
    ("Depreciacao e Amortizacao", "Depreciation and Amortization"),
]

SEGMENTS = [
    "electric utilities",
    "exploration refining and distribution",
    "banking",
    "retail",
    "steel",
    "telecom",
]

N_COMPANIES = 20


def _tax_id(cvm_id: int) -> str:
    d = f"{cvm_id:014d}"
    return f"{d[:2]}.{d[2:5]}.{d[5:8]}/{d[8:12]}-{d[12:]}"


def make_financials(seed: int = 42) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    entry_id = itertools.count()
    for i in range(N_COMPANIES):
        cvm_id = 1000 + i
        name_id = f"COMPANY {i} SA"
        tax_id = _tax_id(cvm_id)
        # Company 0 is the hot/skewed one with the longest history.
        n_years = 12 if i == 0 else rng.randint(5, 10)
        # Some companies end on a quarterly report (LTM path), some
        # annual: tail-quarter companies stop annual reports at 2022 so
        # their 2023 quarters are genuinely the latest periods.
        has_tail_quarters = i % 3 != 0
        end_year = 2022 if has_tail_quarters else 2023
        years = list(range(end_year - n_years + 1, end_year + 1))
        # Company 7 gets < 4 quarters (lag-4 → lag-1 fallback).
        n_quarters = 2 if i == 7 else (6 if has_tail_quarters else 0)
        scale = 10.0 ** rng.uniform(8, 11)
        for is_consolidated in (True, False):
            mult = 1.0 if is_consolidated else 0.6
            periods = [(dt.date(y, 12, 31), True) for y in years]
            qdates = []
            for y in (2022, 2023):
                for m, d in ((3, 31), (6, 30), (9, 30)):
                    qdates.append(dt.date(y, m, d))
            for q in qdates[-n_quarters:] if n_quarters else []:
                periods.append((q, False))
            for period_end, is_annual in periods:
                period_begin = dt.date(period_end.year, 1, 1)
                for code in BASE_CODES:
                    base = scale * mult * (0.1 + rng.random())
                    if code.startswith("3.99"):
                        value = round(rng.uniform(0.5, 20.0), 2)  # EPS unscaled
                    elif code == "3.01" and i == 9:
                        value = rng.uniform(1e5, 9e5)  # below CUT_OFF
                    else:
                        value = round(base, 2)
                    rows.append(
                        dict(
                            entry_id=next(entry_id),
                            cvm_id=cvm_id,
                            name_id=name_id,
                            tax_id=tax_id,
                            acc_code=code,
                            acc_name=ACC_NAMES_PT[code],
                            acc_value=float(value),
                            is_annual=is_annual,
                            is_consolidated=is_consolidated,
                            period_begin=period_begin,
                            period_end=period_end,
                        )
                    )
                # Inject an exact-duplicate logical key with a different
                # value for one code → exercises keep-last dedup (D5).
                if is_annual and period_end.year == 2020 and i < 3:
                    dup = dict(rows[-1])
                    dup["entry_id"] = next(entry_id)
                    dup["acc_value"] = dup["acc_value"] * 2
                    rows.append(dup)
    return pd.DataFrame(rows)


def make_trades(seed: int = 43) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    entry_id = itertools.count()
    # Companies 0..16 traded (17 absent from trades → inner-join dropout);
    # ids 9000+ absent from financials.
    for i in list(range(17)) + [900, 901]:
        cvm_id = 1000 + i if i < 900 else 8000 + i
        seg = SEGMENTS[i % len(SEGMENTS)]
        for day in (10, 11, 12):
            rows.append(
                dict(
                    entry_id=next(entry_id),
                    cvm_id=cvm_id,
                    trade_date=dt.date(2023, 4, day),
                    # Company 15 always below min_volume → filtered out.
                    volume=5e4 if i == 15 else rng.uniform(2e5, 5e7),
                    segment=seg,
                    is_restructuring=(i == 4),
                    most_traded_stock=f"TCK{i}4",
                )
            )
    return pd.DataFrame(rows)


def make_language() -> pd.DataFrame:
    return pd.DataFrame(LANGUAGE_ROWS, columns=["pt", "en"])


def write_fixtures(spark: SparkSession, out_dir: str, seed: int = 42) -> str:
    os.makedirs(out_dir, exist_ok=True)
    for name, pdf in (
        ("financials", make_financials(seed)),
        ("trades", make_trades(seed + 1)),
        ("language", make_language()),
    ):
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    return out_dir
