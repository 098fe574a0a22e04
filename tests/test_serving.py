"""Serving-layer semantics: view modes, search, sorts, pagination,
override upsert, category catalog, connection health."""

from __future__ import annotations

import datetime as dt

import pytest

from doin_fine_ance__spark.plans.build import Warehouse, build
from doin_fine_ance__spark.serving import (
    ReservedCategoryError,
    categorize_transaction,
    connection_health,
    create_category,
    distinct_validated_categories,
    get_active_category_names,
    get_transactions_filtered,
    list_validated_transactions,
    transaction_overlay,
)
from doin_fine_ance__spark.serving.categories import ensure_default_categories
from doin_fine_ance__spark.sources import fixtures as FX


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("warehouse"))
    FX.write_warehouse_inputs(spark, root)
    w = Warehouse(spark, root)
    build(w, full_refresh=True)
    return w


@pytest.fixture(scope="module")
def overlay(spark, wh):
    return transaction_overlay(
        wh.read("analytics", "fct_trxns_with_predictions"),
        wh.read("public", "user_categories"),
    ).cache()


def test_view_mode_unvalidated_predicted(overlay):
    page = get_transactions_filtered(overlay, view_mode="unvalidated_predicted")
    rows = page.transactions.collect()
    assert page.total_count == len(rows) > 0
    for r in rows:
        assert not r.validated
        assert r.predicted_master_category not in (None, "UNCERTAIN")


def test_view_mode_unvalidated_unpredicted(overlay):
    rows = get_transactions_filtered(
        overlay, view_mode="unvalidated_unpredicted"
    ).transactions.collect()
    assert rows
    for r in rows:
        assert r.predicted_master_category in (None, "UNCERTAIN")


def test_low_confidence_exclusion(overlay):
    base = get_transactions_filtered(overlay, view_mode="unvalidated_predicted")
    excl = get_transactions_filtered(
        overlay, view_mode="unvalidated_predicted", exclude_low_confidence=True
    )
    # TRN-011 (0.20) drops below the 0.35 threshold
    assert excl.total_count < base.total_count
    for r in excl.transactions.collect():
        assert r.prediction_confidence is None or float(r.prediction_confidence) >= 0.35


def test_description_search_ilike(overlay):
    page = get_transactions_filtered(overlay, description_search="metro")
    rows = page.transactions.collect()
    assert rows and all("METRO" in r.description.upper() for r in rows)


def test_sort_allowlist_falls_back(overlay):
    page = get_transactions_filtered(overlay, sort_by="evil; DROP TABLE", limit=5)
    dates = [r.transacted_date for r in page.transactions.collect()]
    non_null = [d for d in dates if d is not None]
    assert non_null == sorted(non_null, reverse=True)  # default transacted_date DESC


def test_pagination_disjoint_and_ordered(overlay):
    p1 = get_transactions_filtered(overlay, limit=3, offset=0).transactions.collect()
    p2 = get_transactions_filtered(overlay, limit=3, offset=3).transactions.collect()
    ids1 = {r.transaction_id for r in p1}
    ids2 = {r.transaction_id for r in p2}
    assert ids1.isdisjoint(ids2)


def test_categorize_upsert_roundtrip(spark, wh):
    path = wh.path("public", "user_categories")
    before = spark.read.parquet(path).count()
    categorize_transaction(
        spark, path, "TRN-002", "Transportation", validated=True,
        now=dt.datetime(2024, 3, 10, 10, 0, 0),
    )
    after = spark.read.parquet(path)
    assert after.count() == before + 1
    # update the same id: no row growth, category changes
    categorize_transaction(
        spark, path, "TRN-002", "Fun!™", notes="actually fun",
        now=dt.datetime(2024, 3, 11, 10, 0, 0),
    )
    final = spark.read.parquet(path)
    assert final.count() == before + 1
    row = final.filter("transaction_id = 'TRN-002'").collect()[0]
    assert row.master_category == "Fun!™"
    assert row.notes == "actually fun"
    assert row.validated  # preserved from the first write


def test_validated_listing_and_filters(spark, wh):
    val = wh.read("analytics", "fct_validated_trxns")
    uc = wh.read("public", "user_categories")
    page = list_validated_transactions(val, uc, category="Groceries")
    rows = page.transactions.collect()
    assert rows and all(r.master_category == "Groceries" for r in rows)
    # exclude_from_forecast overlay: TRN-033 flagged true in fixtures
    all_rows = list_validated_transactions(val, uc, limit=100).transactions.collect()
    flags = {r.transaction_id: r.exclude_from_forecast for r in all_rows}
    assert flags.get("TRN-033") is True
    cats = [r.master_category for r in distinct_validated_categories(val).collect()]
    assert cats == sorted(cats)


def test_category_catalog_semantics(spark):
    catalog = ensure_default_categories(spark, None, now=dt.datetime(2024, 1, 1))
    assert len(get_active_category_names(catalog)) == 19
    with pytest.raises(ReservedCategoryError):
        create_category(spark, catalog, "uncertain")
    grown = create_category(spark, catalog, "Pets", now=dt.datetime(2024, 1, 2))
    assert "Pets" in get_active_category_names(grown)
    # re-adding existing is a no-op reactivation, not a duplicate
    again = create_category(spark, grown, "Pets")
    assert again.filter("name = 'Pets'").count() == 1


def test_connection_health_rollup(spark, wh):
    from pyspark.sql.functions import col

    raw = (
        wh.read("public", "simplefin")
        .withColumn("import_timestamp", col("import_timestamp").cast("timestamp"))
        .withColumn("transacted_date", col("transacted_date").cast("date"))
    )
    health = connection_health(raw).collect()
    assert health
    keys = [(r.institution_name, r.account_name) for r in health]
    # normalized: 'Savings Account (1234)' collapses into 'Savings Account'
    names = {k[1] for k in keys}
    assert "Savings Account (1234)" not in names
    assert "Savings Account" in names


def test_single_job_page_matches_two_action_page(overlay):
    two = get_transactions_filtered(overlay, limit=10, offset=3)
    one = get_transactions_filtered(overlay, limit=10, offset=3, single_job=True)
    assert one.total_count == two.total_count
    ids_two = [r["transaction_id"] for r in two.transactions.collect()]
    ids_one = [r["transaction_id"] for r in one.transactions]
    assert ids_one == ids_two
    assert all("__total" not in r for r in one.transactions)


def test_single_job_page_past_the_end_still_returns_total(overlay):
    # the rn==1 sentinel carries the total; no second count() job
    two = get_transactions_filtered(overlay, limit=10, offset=10_000)
    one = get_transactions_filtered(
        overlay, limit=10, offset=10_000, single_job=True
    )
    assert one.total_count == two.total_count > 0
    assert one.transactions == []


def test_collect_page_with_total_edges(spark):
    from pyspark.sql import functions as F

    from doin_fine_ance__spark.operators.pagination import (
        collect_page_with_total,
    )

    df = spark.range(25).select(F.col("id"))
    order = [F.col("id").asc()]
    # first page: sentinel row is also a page row — no duplication
    total, page = collect_page_with_total(df, order, limit=10, offset=0)
    assert total == 25
    assert [r["id"] for r in page] == list(range(10))
    # past the end: total still exact, page empty
    total, page = collect_page_with_total(df, order, limit=10, offset=100)
    assert (total, page) == (25, [])
    # empty input: zero total without any fallback
    total, page = collect_page_with_total(
        df.filter(F.col("id") < 0), order, limit=10, offset=0
    )
    assert (total, page) == (0, [])
    # helper columns never leak
    total, page = collect_page_with_total(df, order, limit=3, offset=20)
    assert [r["id"] for r in page] == [20, 21, 22]
    assert all(set(r) == {"id"} for r in page)
