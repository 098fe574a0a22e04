"""Global plan invariants across EVERY registered query.

tests/test_plans.py pins specific shapes for the headline queries;
this sweep enforces the two unconditional scale rules on all 99:

- **No CartesianProduct.** A cross product anywhere is a 100 TB
  non-starter; every pair-generation stage must be banded/bucketed/
  blocked (and the plans prove it).
- **No row-at-a-time Python.** ``BatchEvalPython`` (pickled per-row
  UDF) is the 10-100x-slower path; Python is allowed ONLY as
  Arrow-vectorized kernels (``ArrowEvalPython``, ``MapInPandas``,
  ``FlatMapGroupsInPandas``).

Plans are built lazily at sf0.001 — no query executes.
"""

from __future__ import annotations

from doin_fine_ance__spark.queries import load_registry

SF = "/root/testdata/sf0.001"

# queries whose operator intentionally builds a bounded small-side
# cross join (none today — keep the allowlist explicit so a future
# exception is a visible diff, not a silent pass)
CARTESIAN_ALLOWED: set[str] = set()


def _plan(spark, fn):
    df = fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_product_anywhere(spark):
    queries, _ = load_registry()
    offenders = []
    for name, fn in queries.items():
        if name in CARTESIAN_ALLOWED:
            continue
        if "CartesianProduct" in _plan(spark, fn):
            offenders.append(name)
    assert not offenders, f"cross products in: {offenders}"


def test_no_row_at_a_time_python_udfs(spark):
    queries, _ = load_registry()
    offenders = []
    for name, fn in queries.items():
        if "BatchEvalPython" in _plan(spark, fn):
            offenders.append(name)
    assert not offenders, (
        f"pickled row-at-a-time Python UDFs in: {offenders} "
        "(use pandas_udf / mapInPandas instead)"
    )
