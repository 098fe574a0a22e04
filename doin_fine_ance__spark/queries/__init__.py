"""Operator-inventory query registry.

Every operator claimed in SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable, usually paired with an
ANSI-SQL oracle string the driver runs on DuckDB over the same parquet
tables. ``__spark_entry__.queries()`` / ``oracle_sql()`` re-export
these dicts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register an inventory query (and optionally its DuckDB oracle)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_registry() -> tuple[dict, dict]:
    """Import every query module so the registry is populated."""
    from . import analytics  # noqa: F401
    from . import inventory  # noqa: F401
    from . import llm_ops  # noqa: F401
    from . import streaming_batch  # noqa: F401

    return QUERIES, ORACLES
