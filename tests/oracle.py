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
    import os

    con = duckdb.connect()
    # Bound the ORACLE's memory so a quadratic oracle (e.g. the
    # d_ngram_jaccard_pairs all-pairs CTE on the sf1-skew boilerplate
    # clique) spills to disk instead of OOM-killing the box — the r10
    # sf1-skew sweep died at 107/119 on the DuckDB side (VERDICT r10
    # #3). Opt-in via env so small-SF local runs keep default behavior.
    mem = os.environ.get("SPARK_GRAFT_DUCK_MEM")
    if mem:
        spill = os.environ.get("SPARK_GRAFT_DUCK_TMP", "/tmp/duck-spill")
        os.makedirs(spill, exist_ok=True)
        con.execute(f"SET memory_limit='{mem}'")
        con.execute(f"SET temp_directory='{spill}'")
    for t in TESTDATA_TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # driver testdata ships single-file parquet; Spark-written
        # derivatives (tools/make_scale_data.py) are directories of
        # part files — glob those for DuckDB
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _dup_clusters_procedural(con: duckdb.DuckDBPyConnection) -> str:
    """Scalable oracle for d_dup_clusters: iterative min-label
    propagation to fixpoint over the SAME mh_pairs edge set, in temp
    tables (VERDICT r3 next-round #5).

    The registered oracle (what the driver runs at sf0.01) is a
    recursive-CTE transitive closure — exact but path-enumerating, so
    at the sf1 rehearsal's ~14M-edge graph it runs for hours. This
    loop is the standard O(E x diameter) label-propagation formulation
    and reaches the identical fixpoint (smallest doc_id per connected
    component); test_oracle_harness pins the equivalence against the
    recursive CTE at sf0.001. Returns the SELECT to fetch the result.
    """
    from doin_fine_ance__spark.queries.llm_ops import _minhash_pairs_cte

    con.execute(
        "CREATE OR REPLACE TEMP TABLE _sym AS WITH "
        + _minhash_pairs_cte(0.5)
        + " SELECT id_a AS node, id_b AS nbr FROM mh_pairs"
        " UNION SELECT id_b AS node, id_a AS nbr FROM mh_pairs"
    )
    con.execute(
        "CREATE OR REPLACE TEMP TABLE _lab AS"
        " SELECT DISTINCT node, node AS lab FROM _sym"
    )
    while True:
        con.execute(
            "CREATE OR REPLACE TEMP TABLE _lab2 AS"
            " SELECT l.node, LEAST(l.lab, MIN(nl.lab)) AS lab"
            " FROM _lab l"
            " JOIN _sym s ON s.node = l.node"
            " JOIN _lab nl ON nl.node = s.nbr"
            " GROUP BY l.node, l.lab"
        )
        changed = con.execute(
            "SELECT COUNT(*) FROM _lab l JOIN _lab2 n ON l.node = n.node"
            " WHERE l.lab <> n.lab"
        ).fetchone()[0]
        con.execute("CREATE OR REPLACE TEMP TABLE _lab AS SELECT * FROM _lab2")
        if changed == 0:
            break
    return "SELECT node AS doc_id, lab AS keeper_id FROM _lab"


# Harness-side procedural oracles: name -> fn(con) -> final SELECT.
# Used by compare_query/sweep INSTEAD of the registered single-statement
# oracle (the driver still runs the registered SQL at sf0.01; the
# procedural variant reaches the same fixpoint and follows the engine
# up the scale ladder where the SQL formulation cannot).
PROCEDURAL_ORACLES = {"d_dup_clusters": _dup_clusters_procedural}


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


def _pandas_cell(v):
    """Canonicalize one pandas cell the way a string-level hash would see it.

    Replicates the driver's weakness on purpose: a ``Decimal('1577.50')``
    from a Spark DecimalType column and a float64 ``1577.5`` from
    DuckDB-through-pandas stringify differently, so this mode FAILS where
    the exact-value mode would silently pass. All final outputs must be
    driver-canonical 64-bit types (double/bigint/string/date/timestamp).
    """
    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "<null>"
    if isinstance(v, (bool, np.bool_)):
        return f"bool:{bool(v)}"
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, (np.integer, int)):
        return repr(int(v))
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        # DATE columns arrive as datetime.date from Spark collect() but
        # as datetime64 midnight through DuckDB→pandas; unify (safe: the
        # logical type is the same on both sides of any one query).
        return v.isoformat() + "T00:00:00"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_pandas_cell(x) for x in v) + "]"
    return f"{type(v).__name__}:{v!r}"


def canonical_pandas(pdf) -> list[tuple]:
    cols = sorted(pdf.columns)
    # Column-wise access, NOT iterrows(): iterrows upcasts each row to
    # one common dtype, so a frame with an int64 count next to a
    # nullable float64 turns the int into 0.0 — and only on the side
    # that arrived with real numpy dtypes (DuckDB .df()), not on the
    # object-dtype frame built from Spark Row tuples. That asymmetry
    # produced fuzz false-positives on empty-input global aggregates.
    # Per-column iloc keeps each cell at its column's dtype, which
    # still catches the real r1 failure class (Decimal objects in a
    # Spark column vs float64 from DuckDB stringify differently).
    series = [pdf[c] for c in cols]
    out = [
        tuple(_pandas_cell(s.iloc[i]) for s in series)
        for i in range(len(pdf))
    ]
    out.sort()
    return out


def compare_query(spark, name: str, sf_dir: str, queries: dict, oracles: dict):
    """Return (ok, detail) for one registered query vs its oracle.

    Two gates, both must pass:
    1. exact-value mode (collect/fetchall, typed normalization) — the
       semantic ground truth;
    2. pandas-roundtrip mode — a replica of the driver's comparison,
       where DuckDB DECIMAL/HUGEINT degrade to float64 through pandas.
       This is the mode that caught r1's 17 canonicalization fails.
    """
    sdf = queries[name](spark, sf_dir)
    s_cols = sdf.columns
    rows_collected = sdf.collect()
    s_rows = [tuple(r) for r in rows_collected]

    con = duck_connection(sf_dir)
    try:
        osql = oracles[name]
        proc = PROCEDURAL_ORACLES.get(name)
        if proc is not None:
            osql = proc(con)
        res = con.execute(osql)
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
        o_pdf = con.execute(osql).df()
    finally:
        con.close()

    if s_cols != o_cols:
        # ORDER-sensitive on purpose: the driver's schema check may
        # compare positionally (the r1 judge flagged a column-order
        # divergence), so the local gate requires exact order parity.
        return False, f"columns differ (order-sensitive): spark={s_cols} oracle={o_cols}"
    if len(s_rows) != len(o_rows):
        return False, f"row counts differ: spark={len(s_rows)} oracle={len(o_rows)}"
    sc = canonical(s_cols, s_rows)
    oc = canonical(o_cols, o_rows)
    if sc != oc:
        diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
        return False, f"values differ; first diffs: {diffs}"

    import pandas as pd

    s_pdf = pd.DataFrame(s_rows, columns=s_cols)
    sp = canonical_pandas(s_pdf)
    op = canonical_pandas(o_pdf)
    if sp != op:
        diffs = [(a, b) for a, b in zip(sp, op) if a != b][:3]
        return False, f"pandas-canonical values differ; first diffs: {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
