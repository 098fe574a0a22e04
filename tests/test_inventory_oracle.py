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


def test_dup_clusters_procedural_oracle_matches_recursive_cte(sf_dir):
    """The harness's iterative label-propagation oracle (scales to sf1)
    and the registered recursive-CTE oracle (what the driver runs)
    must reach the identical fixpoint."""
    from .oracle import PROCEDURAL_ORACLES, duck_connection

    con = duck_connection(sf_dir)
    try:
        proc_sql = PROCEDURAL_ORACLES["d_dup_clusters"](con)
        proc = sorted(con.execute(proc_sql).fetchall())
        cte = sorted(con.execute(ORACLES["d_dup_clusters"]).fetchall())
    finally:
        con.close()
    assert proc == cte
