"""Deduplication operators.

The reference's dedup machinery is all Postgres window functions
(SURVEY.md §2.5, stg_simplefin.sql:39-118). Re-expressed here as
general Spark operators:

- :func:`latest_wins` — W1/W3: keep the newest row per key.
- :func:`rownum_disambiguate` — W2: stable ordinal within a key group
  (feeds the MD5 surrogate id of stg_historic_trxns.sql:59-60).
- :func:`reconnection_dedup` — W4+W5: the two-layer fuzzy dedup that
  collapses cross-account reconnection duplicates while *preserving*
  legitimately identical same-day rows within one account
  (guarantees documented at stg_simplefin.sql:59-78).
- :func:`deduplicate` — the generalized operator the north star asks
  for: exact keys + recency + deterministic tiebreak.

Scale notes: each is a single window over an explicit key set — one
shuffle, partitioned by the key hash. Keys here are narrow
(transaction ids, small composite groups), so skew is bounded; AQE
skew-join/partition-coalescing handles the rest. No driver-side state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(cs: Sequence[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cs]


def latest_wins(
    df: DataFrame,
    keys: Sequence[str],
    recency: Sequence[Column | str],
) -> DataFrame:
    """Keep exactly one row per `keys`: the max under `recency` order.

    Reference: ``row_number() OVER (PARTITION BY transaction_id ORDER BY
    import_timestamp DESC) = 1`` (stg_simplefin.sql:39-42, W1;
    stg_predictions.sql:17-24, W3). Pass fully-deterministic `recency`
    (include a unique tiebreak column) for stable results.
    """
    w = Window.partitionBy(*_cols(keys)).orderBy(*_cols(recency))
    rn = F.row_number().over(w)
    return df.withColumn("__rn", rn).filter(F.col("__rn") == 1).drop("__rn")


def rownum_disambiguate(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column | str],
    out: str = "row_num",
) -> DataFrame:
    """Attach a 1-based ordinal within each key group (W2).

    Used by the historic loader to disambiguate exact-duplicate rows
    before hashing a surrogate id (stg_historic_trxns.sql:41-51).
    """
    w = Window.partitionBy(*_cols(keys)).orderBy(*_cols(order))
    return df.withColumn(out, F.row_number().over(w))


def reconnection_dedup(
    df: DataFrame,
    logical_keys: Sequence[str],
    group_key: str,
    recency: str,
) -> DataFrame:
    """Two-layer reconnection dedup (W4+W5, stg_simplefin.sql:86-118).

    A "logical transaction" is identified by `logical_keys` (reference:
    institution + normalized account name + date + amount +
    description). When the same logical transaction appears under
    MULTIPLE `group_key` values (reference: account_id — a bank
    reconnection created a new account id), keep only the rows of the
    most-recently-imported group (max `recency` within the group;
    tiebreak by `group_key` for determinism). Rows that are identical
    *within* one group all survive — they are legitimate duplicates
    (e.g. two same-price coffees on one day).

    Layer 1: ``max(recency) OVER (PARTITION BY logical_keys, group_key)``
    Layer 2: ``dense_rank() OVER (PARTITION BY logical_keys
              ORDER BY group_last_seen DESC, group_key) = 1``
    """
    w_group = Window.partitionBy(*_cols([*logical_keys, group_key]))
    df = df.withColumn("__group_last", F.max(recency).over(w_group))
    w_rank = Window.partitionBy(*_cols(logical_keys)).orderBy(
        F.col("__group_last").desc(), F.col(group_key)
    )
    return (
        df.withColumn("__dr", F.dense_rank().over(w_rank))
        .filter(F.col("__dr") == 1)
        .drop("__dr", "__group_last")
    )


def deduplicate(
    df: DataFrame,
    keys: Sequence[str],
    recency: Sequence[Column | str] | None = None,
    fuzzy_keys: Sequence[str] | None = None,
    group_key: str | None = None,
    recency_col: str | None = None,
) -> DataFrame:
    """Generalized dedup: exact latest-wins, plus optional fuzzy layer.

    - `keys` + `recency` → :func:`latest_wins` exact dedup. `recency`
      is an ORDER BY spec: pass explicit directions (e.g.
      ``[col('ts').desc(), col('id').desc()]``) — plain strings sort
      ascending, which keeps the OLDEST row.
    - `fuzzy_keys` + `group_key` → additionally collapse
      cross-`group_key` duplicates of the same fuzzy identity
      (:func:`reconnection_dedup`). The fuzzy layer aggregates
      ``max(recency_col)`` per group, so it needs a plain COLUMN NAME:
      pass `recency_col` explicitly; as a convenience it is inferred
      from `recency[0]` only when that element is a string (a Column
      expression like ``col('ts').desc()`` has no reliable name — on
      Spark Connect there is no ``_jc`` at all — so that case raises).
    """
    if recency is None:
        return df.dropDuplicates(list(keys))
    out = latest_wins(df, keys, recency)
    if fuzzy_keys and group_key:
        if recency_col is None:
            rec0 = recency[0]
            if not isinstance(rec0, str):
                raise TypeError(
                    "deduplicate(fuzzy_keys=...) needs recency_col=<column "
                    "name> when recency[0] is a Column expression"
                )
            recency_col = rec0
        out = reconnection_dedup(out, fuzzy_keys, group_key, recency_col)
    return out
