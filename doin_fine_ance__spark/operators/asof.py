"""As-of (backward) join — point-in-time lookup.

Spark has no native ASOF JOIN (DuckDB, Postgres+timescale, kdb do).
The naive emulation — range join + greatest-per-group — is O(n·m)
within each key and blows up on dense histories. This implements the
scale-correct plan: UNION the two sides, one shuffle+sort per key on
(event time, side tag), and a running ``last(right-row struct,
ignorenulls)`` window — every left row picks up the most recent right
row with ``right.ts <= left.ts`` in a single pass. Cost = one
Exchange + one Sort over n+m rows, the same shape as a sort-merge
join, independent of match distances.

The matched right row travels as ONE struct (not per-column lasts), so
a legitimately-NULL right value can never be back-filled from an older
row — the classic bug in hand-rolled as-of joins.

Ties: a right row at exactly left.ts matches (sorted before the left
row via the side tag). Callers should pre-aggregate the right side to
one row per (key, ts) for determinism when duplicates exist —
matching DuckDB ASOF JOIN, which also assumes unique right timestamps.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of-backward join: attach, to every left row, the columns
    of the latest right row with ``right_ts <= left_ts`` per `by` key.

    Left rows with no match keep NULLs (left-join semantics). Output =
    left's columns + ``<value_col><suffix>`` per value column +
    ``<right_ts><suffix>`` of the matched row.
    """
    value_cols = list(value_cols or [c for c in right.columns if c not in (*by, right_ts)])
    payload_fields = [*value_cols, right_ts]
    payload_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in payload_fields]
    )

    lhs = left.select(
        *[col(c) for c in left.columns],
        col(left_ts).alias("__ts"),
        lit(1).alias("__is_left"),
        lit(None).cast(payload_type).alias("__r"),
    )
    rhs = right.select(
        *[lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by],
        *[col(c) for c in by],
        col(right_ts).alias("__ts"),
        lit(0).alias("__is_left"),
        F.struct(*[col(c) for c in payload_fields]).alias("__r"),
    ).select(*lhs.columns)  # align column order for the union

    merged = lhs.unionByName(rhs)
    # right rows sort BEFORE left rows at equal ts (__is_left 0 < 1), so
    # an exactly-simultaneous right row is visible to the left row.
    w = (
        Window.partitionBy(*[col(c) for c in by])
        .orderBy(col("__ts").asc(), col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn("__m", F.last(col("__r"), ignorenulls=True).over(w))
    return carried.filter(col("__is_left") == 1).select(
        *[col(c) for c in left.columns],
        *[col("__m").getField(c).alias(f"{c}{suffix}") for c in value_cols],
        col("__m").getField(right_ts).alias(f"{right_ts}{suffix}"),
    )
