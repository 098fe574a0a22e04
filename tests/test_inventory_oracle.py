"""Every registered query with an oracle must hash-match DuckDB at sf0.001."""

from __future__ import annotations

import pytest

from doin_fine_ance__spark.queries import load_registry

from .oracle import compare_query

QUERIES, ORACLES = load_registry()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    ok, detail = compare_query(spark, name, sf_dir, QUERIES, ORACLES)
    assert ok, f"{name}: {detail}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
