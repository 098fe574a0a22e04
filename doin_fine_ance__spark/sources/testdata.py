"""Readers for the driver's TPC-H-ish synthetic testdata.

Tables (one parquet each under ``/root/testdata/sf*/``):
``region nation customer supplier part orders lineitem events
documents embeddings``.

Scale notes: reads are plain ``spark.read.parquet`` so Catalyst keeps
predicate pushdown + column pruning; callers should ``select`` the
columns they need (or pass ``columns=``) so ``ReadSchema`` stays
narrow. At 100 TB these directories would be date-partitioned and the
same code path picks up partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import ensure_compat

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Load one testdata table with oracle-compatible types.

    ``events.ts`` has shipped as both TIMESTAMP(MICROS) (reads natively
    as timestamp) and INT64 TIMESTAMP(NANOS) (reads as LongType nanos
    under the nanosAsLong compat conf); when it arrives as a raw long
    we truncate ns→µs — exactly what DuckDB does — yielding
    TIMESTAMP_NTZ like every other timestamp column in the dataset.
    """
    ensure_compat(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    if columns:
        df = df.select(*columns)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
