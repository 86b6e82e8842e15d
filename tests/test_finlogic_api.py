"""Golden-style hermetic tests of the FinLogic API surface on seeded
fixtures — mirrors the reference's test strategy (live-data goldens,
reference tests/test_company.py, tests/test_data.py) without the
network dependency."""

from __future__ import annotations

import pytest

from finlogic_spark.api import Engine
from finlogic_spark.company import Company


def test_info_counts(engine):
    info = {r["key"]: r["FinLogic Info"] for r in engine.info().collect()}
    assert int(info["accounting_entries"]) > 1000
    assert int(info["number_of_companies"]) == 16  # traded ∩ volume filter
    assert info["first_report"].startswith("20")


def test_info_full_key_contract(engine):
    # Reference returns exactly these 7 keys in this order
    # (src/finlogic/data.py:81-95).
    rows = engine.info().collect()
    assert [r["key"] for r in rows] == [
        "data_url",
        "memory_usage",
        "accounting_entries",
        "number_of_reports",
        "first_report",
        "last_report",
        "number_of_companies",
    ]
    info = {r["key"]: r["FinLogic Info"] for r in rows}
    assert info["data_url"].endswith("financials.parquet")
    assert info["memory_usage"].endswith(" MB")
    assert float(info["memory_usage"].removesuffix(" MB")) > 0


def test_search_company_deterministic_id_row(engine):
    # keep_first with an explicit tiebreak: repeated runs must return
    # the identical (name_id, tax_id) row per cvm_id (D2 semantics —
    # dropDuplicates would pick an arbitrary row).
    a = sorted(map(tuple, engine.search_company("COMPANY", "name_id").collect()))
    b = sorted(map(tuple, engine.search_company("COMPANY", "name_id").collect()))
    assert a == b


def test_is_traded_false_loads_more(spark, fixture_dir, engine):
    eng_all = Engine.from_parquet_dir(
        spark, fixture_dir, is_traded=False, entry_order_col="entry_id"
    )
    n_all = int(
        {r["key"]: r["FinLogic Info"] for r in eng_all.info().collect()}[
            "number_of_companies"
        ]
    )
    n_traded = int(
        {r["key"]: r["FinLogic Info"] for r in engine.info().collect()}[
            "number_of_companies"
        ]
    )
    assert n_all > n_traded


def test_min_volume_excludes_illiquid(engine):
    # Fixture company 15 trades below min_volume → absent everywhere.
    assert engine.search_company("COMPANY 15", "name_id").count() == 0


def test_search_company_modes(engine):
    by_name = engine.search_company("COMPANY 1", "name_id")
    assert by_name.count() >= 2  # COMPANY 1, 10-14, 16 (traded subset)
    by_id = engine.search_company(1002, "cvm_id")
    rows = by_id.collect()
    assert len(rows) == 1 and rows[0]["name_id"] == "COMPANY 2 SA"
    tax = rows[0]["tax_id"]
    assert engine.search_company(tax, "tax_id").collect()[0]["cvm_id"] == 1002
    assert engine.search_segment("steel").count() == 1
    with pytest.raises(ValueError):
        engine.search_company("x", "bogus")


def test_rank_shape_and_order(engine):
    df = engine.rank(n=5, rank_by="roic")
    rows = df.collect()
    assert len(rows) == 5
    vals = [r["roic"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    assert df.columns[-1] == "roic"


def test_rank_segment_filter(engine):
    rows = engine.rank(segment="steel", n=10, rank_by="revenues").collect()
    assert rows and all(r["segment"] == "steel" for r in rows)


def test_company_identifier_roundtrip(engine):
    c = Company(engine, 1000)
    c2 = Company(engine, c.tax_id)
    assert c2._cvm_id == 1000
    with pytest.raises(KeyError):
        Company(engine, 99999)


def test_company_validation(engine):
    with pytest.raises(ValueError):
        Company(engine, 1000, acc_unit="x")
    with pytest.raises(ValueError):
        Company(engine, 1000, acc_unit=-1)
    with pytest.raises(ValueError):
        Company(engine, 1000, tax_rate=2.0)
    with pytest.raises(KeyError):
        Company(engine, 1000, language="klingon")
    c = Company(engine, 1000, acc_unit="m")
    assert c.acc_unit == 1_000_000.0


def test_report_unit_scaling_eps_exempt(engine):
    c1 = Company(engine, 1000, acc_unit=1.0)
    cb = Company(engine, 1000, acc_unit="b")
    a1 = c1.report("assets", acc_level=1).collect()[0]
    ab = cb.report("assets", acc_level=1).collect()[0]
    col = [c for c in c1.report("assets", acc_level=1).columns if c.startswith("20")][0]
    assert a1[col] == pytest.approx(ab[col] * 1e9, rel=1e-9)
    e1 = c1.report("earnings_per_share").collect()
    eb = cb.report("earnings_per_share").collect()
    last = [c for c in cb.report("earnings_per_share").columns if c.startswith("20")][-1]
    for r1, rb in zip(e1, eb):
        assert r1[last] == rb[last]  # EPS never scales


def test_report_acc_level_filters_depth(engine):
    c = Company(engine, 1000)
    lvl2 = c.report("balance_sheet", acc_level=2).collect()
    assert all(r["acc_code"].count(".") <= 1 for r in lvl2)
    lvl0 = c.report("balance_sheet").count()
    assert lvl0 > len(lvl2)


def test_report_translation_and_fallback(engine):
    c = Company(engine, 1000)
    names = {r["acc_name"] for r in c.report("balance_sheet").collect()}
    assert "Total Assets" in names
    assert any(n.startswith("(pt) ") for n in names)  # untranslated Debentures
    c_pt = Company(engine, 1000, language="portuguese")
    names_pt = {r["acc_name"] for r in c_pt.report("balance_sheet").collect()}
    assert "Ativo Total" in names_pt


def test_report_ltm_label(engine):
    c = Company(engine, 1001)  # tail-quarter company
    cols = c.report("income_statement").columns
    assert cols[-1].endswith(" ltm")
    c0 = Company(engine, 1000)  # annual-ending company
    assert not any("ltm" in col for col in c0.report("income_statement").columns)


def test_report_num_years(engine):
    c = Company(engine, 1000)
    all_cols = [c_ for c_ in c.report("assets").columns if c_.startswith("20")]
    two = [c_ for c_ in c.report("assets", num_years=2).columns if c_.startswith("20")]
    assert len(two) == 2 and two == all_cols[-2:]


def test_custom_report(engine):
    c = Company(engine, 1000)
    rows = c.custom_report(["1", "3.01", "6.01"]).collect()
    assert sorted(r["acc_code"] for r in rows) == ["1", "3.01", "6.01"]


def test_indicators_display(engine):
    c = Company(engine, 1000)
    df = c.indicators()
    rows = df.collect()
    assert [r["indicator"] for r in rows][:3] == [
        "total_assets", "current_assets", "total_cash",
    ]
    assert len(rows) == 27
    two = c.indicators(num_years=2)
    assert len(two.columns) == 3  # indicator + 2 periods


def test_indicators_consolidated_vs_separate_differ(engine):
    con = Company(engine, 1000, is_consolidated=True).indicators().collect()
    sep = Company(engine, 1000, is_consolidated=False).indicators().collect()
    col = [c for c in Company(engine, 1000).indicators().columns if c.startswith("20")][0]
    con_assets = [r[col] for r in con if r["indicator"] == "total_assets"][0]
    sep_assets = [r[col] for r in sep if r["indicator"] == "total_assets"][0]
    assert con_assets != sep_assets


def test_engine_from_urls_downloads_once_and_caches(spark, tmp_path):
    """Reference-parity remote load (fl.load needs no local files):
    file:// stands in for https:// hermetically. Second load must hit
    the cache — pinned by deleting the source before reloading."""
    import shutil

    from finlogic_spark.fixtures import make_financials, make_language, make_trades

    src = tmp_path / "src"
    src.mkdir()
    for name, pdf in (
        ("financials", make_financials(42)),
        ("trades", make_trades(43)),
        ("language", make_language()),
    ):
        pdf.to_parquet(src / f"{name}.parquet")
    urls = {
        n: f"file://{src}/{n}.parquet" for n in ("financials", "trades", "language")
    }
    cache = tmp_path / "cache"
    eng = Engine.from_urls(
        spark,
        urls["financials"],
        urls["trades"],
        urls["language"],
        cache_dir=str(cache),
        entry_order_col="entry_id",
    )
    info = {r["key"]: r["FinLogic Info"] for r in eng.info().collect()}
    assert info["data_url"] == urls["financials"]
    assert int(info["number_of_companies"]) > 0
    n_rows = eng.financials.count()
    cached_files = sorted(p.name for p in cache.iterdir())
    assert len(cached_files) == 3

    # Remove the "remote" source: a reload can only succeed via cache.
    shutil.rmtree(src)
    eng2 = Engine.from_urls(
        spark,
        urls["financials"],
        urls["trades"],
        urls["language"],
        cache_dir=str(cache),
        entry_order_col="entry_id",
    )
    assert eng2.financials.count() == n_rows
    assert sorted(p.name for p in cache.iterdir()) == cached_files


def test_module_load_accepts_remote_base_url(spark, tmp_path):
    """fl.load(spark, '<url>') — the one-call remote path a reference
    user expects: base URL holding the three parquet files, downloaded
    into the cache and loaded without any pre-existing local dir."""
    from finlogic_spark import api
    from finlogic_spark.fixtures import make_financials, make_language, make_trades

    src = tmp_path / "remote"
    src.mkdir()
    for name, pdf in (
        ("financials", make_financials(42)),
        ("trades", make_trades(43)),
        ("language", make_language()),
    ):
        pdf.to_parquet(src / f"{name}.parquet")
    eng = api.load(
        spark,
        f"file://{src}",
        cache_dir=str(tmp_path / "cache"),
        entry_order_col="entry_id",
    )
    try:
        assert eng.financials.count() > 0
        info = {r["key"]: r["FinLogic Info"] for r in api.info().collect()}
        assert info["data_url"] == f"file://{src}/financials.parquet"
    finally:
        api._DEFAULT = None
