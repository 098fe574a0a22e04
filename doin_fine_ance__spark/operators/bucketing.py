"""Bucketed (co-located) join machinery — the shuffle-free scale path.

At 100 TB the orders⨝lineitem-shaped join dominates every pipeline
run. Hash-shuffling both sides per query is the default Spark plan;
bucketing moves that shuffle to WRITE time: both tables are written
``bucketBy(N, key)`` so every subsequent equi-join / groupBy on the
key is exchange-free (Spark plans a SortMergeJoin over pre-hashed
bucket files, no Exchange operator on either side).

When to use (the engine's rule of thumb):
- a fact table joined on the same key by many downstream queries
  (e.g. ``transaction_id`` overlays J3/J5/J6, ``l_orderkey`` rollups);
- bucket count chosen so a bucket ≈ 100-200 MB at target scale
  (100 TB / 128 MB ≈ 800k buckets is too many files — combine with
  date partitioning so it's buckets × partitions, e.g. 2048 buckets
  inside each month partition);
- both sides MUST agree on (count, key) or Spark re-shuffles the
  mismatched side.

Reference parity note: the reference leans on Postgres B-tree indexes
(init_db.py:79-130) for its hot joins; bucketing is the warehouse
analog (SURVEY §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed (and bucket-sorted) table.

    Sorting within buckets lets the join skip its Sort too — the
    steady-state plan is scan → zip-merge → output.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    Callers are expected to have written both with
    :func:`write_bucketed` using the same ``(n_buckets, key)``; the
    resulting physical plan contains no Exchange on either side
    (asserted in tests/test_plans.py::test_bucketed_join_is_shuffle_free).
    """
    return spark.table(left_table).join(spark.table(right_table), key, how)
