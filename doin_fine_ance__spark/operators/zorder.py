"""Z-order (Morton) clustering for multi-column file skipping.

The reference keeps btree indexes on ``transaction_id`` /
``import_timestamp`` (init_db.py); a parquet lake's equivalent is
clustering data so per-file (and row-group) min/max statistics become
selective on the lookup columns — Delta's ``OPTIMIZE ... ZORDER BY``.
This module computes the interleaved-bit Morton code as a pure JVM
column expression; :func:`..operators.maintenance.compact_table`
range-partitions + sorts rewritten partitions by it, giving each
output file a tight bounding box over ALL z-ordered columns instead
of just the first sort key.

Scaling: each column is affinely mapped onto a 16-bit grid using its
global min/max (one tiny agg). Interleaving is a fixed unrolled
``shiftleft``/``bitwise OR`` expression — no UDF, stays inside
whole-stage codegen. 16 bits × ≤4 columns fits comfortably in a
BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

_BITS = 16


def _scaled(c: Column, cmin: float, cmax: float) -> Column:
    """Map [cmin, cmax] → integer grid [0, 2^16-1] (nulls → 0)."""
    span = cmax - cmin
    if span <= 0:
        return lit(0).cast("long")
    scaled = (c.cast("double") - lit(float(cmin))) / lit(float(span)) * lit(
        float((1 << _BITS) - 1)
    )
    return F.coalesce(
        F.least(F.greatest(F.round(scaled).cast("long"), lit(0)), lit((1 << _BITS) - 1)),
        lit(0),
    )


def zorder_key(df: DataFrame, columns: list[str]) -> Column:
    """Morton code over ``columns`` as one BIGINT expression.

    Bit i of each scaled column lands at position i*n_cols + column
    index, so the code alternates bits across columns — points close
    in the multi-dimensional grid get close codes.
    """
    if not (1 <= len(columns) <= 4):
        raise ValueError("zorder_key supports 1-4 columns")
    bounds = df.agg(
        *[F.min(col(c).cast("double")).alias(f"mn_{c}") for c in columns],
        *[F.max(col(c).cast("double")).alias(f"mx_{c}") for c in columns],
    ).first()
    scaled = [
        _scaled(col(c), bounds[f"mn_{c}"] or 0.0, bounds[f"mx_{c}"] or 0.0)
        for c in columns
    ]
    n = len(columns)
    code: Column = lit(0).cast("long")
    for bit in range(_BITS):
        for ci, s in enumerate(scaled):
            code = code.bitwiseOR(
                F.shiftleft(F.shiftright(s, bit).bitwiseAND(lit(1)), bit * n + ci)
            )
    return code
