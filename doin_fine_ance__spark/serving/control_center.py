"""Connection-health rollup (control_center.py:77-128).

The reference's most complex serving query: greatest-n-per-group on
import_timestamp, two grouped rollups over normalized account keys,
joined with null-safe equality on institution, with Postgres NULLS
LAST ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from ..functions.pg import normalize_account_name


def connection_health(simplefin: DataFrame) -> DataFrame:
    """Per-(institution, account_key) health rollup.

    Mirrors the CTE chain latest_imports → latest_poll_rows →
    account_polls ⨝ account_stored (IS NOT DISTINCT FROM) → outer
    GROUP BY. All three aggregations shuffle on narrow keys; the first
    join is an equi-join on (account_id, import_timestamp) after a
    broadcastable per-account max.
    """
    latest_imports = simplefin.groupBy("account_id").agg(
        F.max("import_timestamp").alias("latest_import")
    )

    s = simplefin.alias("s")
    li = latest_imports.alias("li")
    latest_poll_rows = s.join(
        li,
        (col("s.account_id") == col("li.account_id"))
        & (col("s.import_timestamp") == col("li.latest_import")),
        "inner",
    ).select(
        col("s.institution_name").alias("institution_name"),
        normalize_account_name(col("s.account_name")).alias("account_key"),
        col("s.account_id").alias("account_id"),
        col("s.transacted_date").alias("transacted_date"),
        col("li.latest_import").alias("last_successful_load"),
    )

    account_polls = latest_poll_rows.groupBy(
        "institution_name", "account_key", "account_id", "last_successful_load"
    ).agg(
        F.min("transacted_date").alias("poll_earliest"),
        F.max("transacted_date").alias("poll_latest"),
    )

    account_stored = simplefin.groupBy(
        col("institution_name"),
        normalize_account_name(col("account_name")).alias("account_key"),
    ).agg(
        F.min("transacted_date").alias("oldest_stored"),
        F.count("*").alias("transaction_count"),
    )

    ap = account_polls.alias("ap")
    ast = account_stored.alias("ast")
    joined = ap.join(
        ast,
        col("ap.institution_name").eqNullSafe(col("ast.institution_name"))
        & (col("ap.account_key") == col("ast.account_key")),
        "inner",
    )

    return (
        joined.groupBy(
            col("ap.institution_name").alias("institution_name"),
            col("ap.account_key").alias("account_name"),
            col("ast.oldest_stored").alias("oldest_stored_transaction_date"),
        )
        .agg(
            F.max("ap.account_id").alias("account_id"),
            F.max("ap.last_successful_load").alias("last_successful_load"),
            F.min("ap.poll_earliest").alias("poll_earliest_transaction_date"),
            F.max("ap.poll_latest").alias("poll_latest_transaction_date"),
            F.max("ast.transaction_count").alias("transaction_count"),
        )
        .orderBy(
            col("institution_name").asc_nulls_last(),
            col("account_name").asc_nulls_last(),
        )
    )
