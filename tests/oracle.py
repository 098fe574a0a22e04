"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, canonicalizes both result sets (columns sorted by name, rows
sorted by value), and asserts exact equality. This is the correctness
loop we iterate on before the driver's per-round check.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from doin_fine_ance__spark.sources.testdata import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", repr(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if v is None:
        return ("null",)
    return (type(v).__name__, v)


def canonical(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(row[i]) for i in order) for row in rows]
    out.sort(key=repr)
    return out


def compare_query(spark, name: str, sf_dir: str, queries: dict, oracles: dict):
    """Return (ok, detail) for one registered query vs its oracle."""
    sdf = queries[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(sf_dir)
    try:
        res = con.execute(oracles[name])
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
    finally:
        con.close()

    if sorted(s_cols) != sorted(o_cols):
        return False, f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"row counts differ: spark={len(s_rows)} oracle={len(o_rows)}"
    sc = canonical(s_cols, s_rows)
    oc = canonical(o_cols, o_rows)
    if sc != oc:
        diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
        return False, f"values differ; first diffs: {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
