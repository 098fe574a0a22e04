"""Binned range (interval) join.

``l.point BETWEEN r.lo AND r.hi`` in Spark plans as a
BroadcastNestedLoopJoin (fine for a broadcast-size interval table) or,
when both sides are big, an O(n·m) catastrophe. The scale path is
binning: quantize points and intervals onto a grid of width ``bin``;
an interval registers in every cell it overlaps, a point in exactly
one cell, and the join becomes an EQUI-join on the cell id plus a
residual BETWEEN filter. Cost: one hash shuffle on the cell id,
|cells per interval| ≈ width/bin copies of the right side — choose
``bin`` near the median interval width so the blow-up factor stays
~2x (same tuning rule as Databricks' range-join bin hints).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lo: str,
    hi: str,
    bin_width: float,
    how: str = "inner",
    extra_on: Column | None = None,
) -> DataFrame:
    """Join rows of `left` to every `right` interval containing
    ``left[point]`` (inclusive bounds), via grid binning.

    ``extra_on`` adds an equi/boolean condition (e.g. a shared key).
    Output columns = left's + right's.
    """
    lb = left.withColumn("__cell", F.floor(col(point) / lit(bin_width)))
    rb = right.withColumn(
        "__cells",
        F.sequence(
            F.floor(col(lo) / lit(bin_width)),
            F.floor(col(hi) / lit(bin_width)),
        ),
    ).withColumn("__cell", F.explode(col("__cells"))).drop("__cells")

    cond = (
        (lb["__cell"] == rb["__cell"])
        & (lb[point] >= rb[lo])
        & (lb[point] <= rb[hi])
    )
    if extra_on is not None:
        cond = cond & extra_on
    out = lb.join(rb, cond, how)
    return out.drop("__cell")
