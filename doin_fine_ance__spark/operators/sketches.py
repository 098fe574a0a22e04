"""Count-min sketch: fixed-memory frequency estimation.

A 100 TB token/URL/entity stream cannot hold an exact frequency table
per executor, but many pipeline decisions only need approximate counts
with a one-sided error guarantee: heavy-hitter token lists for
vocabulary pruning, hot-URL throttling, skew detection before a join.
The count-min sketch (Cormode & Muthukrishnan 2005) gives
``exact <= estimate <= exact + eps * N`` with probability
``1 - delta`` using ``depth = ceil(ln 1/delta)`` rows of
``width = ceil(e / eps)`` counters — a few KB regardless of stream
size.

Engine-exactness: bucket hashing is md5-based (stable across engines
and partitionings — NOT Spark's ``hash()``, which is engine-private),
and cells are integer sums, so the sketch an oracle computes from
exact counts equals the sketch the engine computes from the raw
stream — summation into a cell is associative.

Scale shape: building the sketch is one partial-agg shuffle of at most
``depth * width`` cells (map-side combine collapses each task's stream
to cell counts before anything moves); estimation broadcasts the tiny
cell table. Nothing is ever collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit


def _bucket(j, token, width: int):
    """md5-derived bucket for sketch row ``j`` — identical in DuckDB as
    ``CAST(('0x' || substr(md5(j || ':' || token), 1, 8)) AS UBIGINT)
    % width`` (parity pinned in tests)."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat_ws(":", j, token)), 1, 8), 16, 10)
        .cast("bigint"),
        lit(width),
    )


def cms_build(
    df: DataFrame,
    token_col: str = "token",
    count_col: str | None = None,
    depth: int = 4,
    width: int = 256,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Build the sketch cells ``(j int, bucket bigint, cell bigint)``
    from a raw item stream (``count_col=None`` — each row counts 1) or
    a pre-aggregated ``(token, count)`` table. Both yield identical
    cells. ``partition_cols`` keeps one PARTIAL sketch per partition
    value (e.g. per day) — the rollup shape: persist partials, merge
    later with :func:`cms_merge` instead of rescanning history."""
    parts = list(partition_cols or [])
    rows = df.select(
        *parts,
        col(token_col).alias("_tok"),
        (lit(1) if count_col is None else col(count_col)).cast("bigint").alias("_c"),
    )
    ex = rows.select(
        *parts, "_tok", "_c", F.explode(F.sequence(lit(0), lit(depth - 1))).alias("j")
    )
    return (
        ex.select(
            *parts, "j", _bucket(col("j"), col("_tok"), width).alias("bucket"), "_c"
        )
        .groupBy(*parts, "j", "bucket")
        .agg(F.sum("_c").alias("cell"))
    )


def cms_merge(partials: DataFrame) -> DataFrame:
    """Merge partial sketches (any union of ``cms_build`` outputs,
    extra partition columns welcome) into one cell table. Count-min
    cells are plain sums, so merge-of-partials == build-over-the-whole
    EXACTLY (pinned in tests and driver-hashed by
    ``a_cms_rollup_merge``) — the property that lets a pipeline keep
    per-day sketch parquet and answer over any date range without
    rescanning raw history."""
    return partials.groupBy("j", "bucket").agg(F.sum("cell").alias("cell"))


def cms_estimate(
    tokens: DataFrame,
    cells: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 256,
    out_col: str = "cms_estimate",
) -> DataFrame:
    """Point-query the sketch: for each row of ``tokens`` append the
    count-min estimate ``min_j cell[j][bucket_j(token)]``. The cell
    table is at most ``depth * width`` rows — always broadcast."""
    keys = tokens.select(
        "*", F.explode(F.sequence(lit(0), lit(depth - 1))).alias("j")
    ).withColumn("bucket", _bucket(col("j"), col(token_col), width))
    group_cols = tokens.columns
    return (
        keys.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy(*group_cols)
        .agg(F.min("cell").alias(out_col))
    )


# --------------------------------------------------------------- bloom
#
# Bloom pre-screen: distributed membership against a compact bitset.
# Decontamination/blocklist joins at 100 TB shouldn't shuffle the full
# candidate stream against the reference set; a Bloom filter of the
# reference (a few KB-MB) broadcasts everywhere and eliminates the
# overwhelming majority of non-members map-side, with the exact check
# running only on survivors. One-sided by construction: a member is
# NEVER screened out; false positives only cost extra exact checks.
#
# The bit array is n_words x 62-bit words (62, not 64: DuckDB raises
# on 1<<63 and bit 62 would be the sign bit — staying below keeps the
# mask arithmetic identical in both engines' signed BIGINT).

_BLOOM_BITS_PER_WORD = 62


def bloom_build(
    items: DataFrame,
    item_col: str = "item",
    n_words: int = 256,
    k: int = 3,
) -> DataFrame:
    """OR-fold the reference set into ``(word bigint, bits bigint)``
    (at most ``n_words`` rows — broadcast-sized at any reference-set
    cardinality). md5 position hashes, so the identical filter can be
    rebuilt in SQL."""
    m = n_words * _BLOOM_BITS_PER_WORD
    ex = items.select(col(item_col).alias("_it")).select(
        "_it", F.explode(F.sequence(lit(0), lit(k - 1))).alias("j")
    )
    pos = F.pmod(
        F.conv(F.substring(F.md5(F.concat_ws(":", col("j"), col("_it"))), 1, 8), 16, 10)
        .cast("bigint"),
        lit(m),
    )
    return (
        ex.select(pos.alias("pos"))
        .select(
            F.expr(f"pos div {_BLOOM_BITS_PER_WORD}").alias("word"),
            F.expr(f"shiftleft(1L, cast(pos % {_BLOOM_BITS_PER_WORD} as int))")
            .alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_hits(
    candidates: DataFrame,
    words: DataFrame,
    item_col: str = "item",
    n_words: int = 256,
    k: int = 3,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Append ``out_col`` (boolean): true iff all ``k`` of the item's
    bits are set — the candidate survives the pre-screen. The word
    table is broadcast; the probe is map-side except the k-way
    all-bits-set regroup on the candidate's own key. ``candidates``
    rows must be unique (the regroup counts k probe rows per input
    row; duplicates would collapse and miscount — ``.distinct()``
    first if unsure)."""
    m = n_words * _BLOOM_BITS_PER_WORD
    group_cols = candidates.columns
    keys = candidates.select(
        "*", F.explode(F.sequence(lit(0), lit(k - 1))).alias("j")
    ).withColumn(
        "pos",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat_ws(":", col("j"), col(item_col))), 1, 8),
                16,
                10,
            ).cast("bigint"),
            lit(m),
        ),
    ).withColumn("word", F.expr(f"pos div {_BLOOM_BITS_PER_WORD}")).withColumn(
        "mask",
        F.expr(f"shiftleft(1L, cast(pos % {_BLOOM_BITS_PER_WORD} as int))"),
    )
    probed = keys.join(F.broadcast(words), "word", "left").withColumn(
        "_set", (F.coalesce(col("bits"), lit(0)).bitwiseAND(col("mask")) != 0)
    )
    return (
        probed.groupBy(*group_cols)
        .agg((F.sum(F.when(col("_set"), 1).otherwise(0)) == k).alias(out_col))
    )


# ----------------------------------------------------------------- hll
#
# Mergeable distinct-count rollups via Spark's built-in Apache
# DataSketches HLL (hll_sketch_agg / hll_union_agg — JVM-side,
# sketch binaries never touch Python). Same rollup contract as
# cms_build/cms_merge: persist one partial sketch per partition,
# union later. Sketch bytes are engine-specific, so there is no SQL
# oracle — accuracy is floored in pytest against exact counts, the
# HLL_ERROR evidence pattern.


def hll_partials(
    df: DataFrame,
    item_col: str,
    partition_cols: list[str],
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch (binary) per partition value — the persistable
    daily/ hourly rollup unit."""
    return df.groupBy(*partition_cols).agg(
        F.expr(f"hll_sketch_agg({item_col}, {lg_k})").alias("hll")
    )


def hll_merge_estimate(
    partials: DataFrame,
    group_cols: list[str] | None = None,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Union partial sketches (optionally regrouped on a coarser key,
    e.g. day -> month) and estimate the merged distinct count. Merging
    sketches is lossless relative to sketching the union — the
    estimate equals what one pass over the raw history would give."""
    gb = partials.groupBy(*group_cols) if group_cols else partials.groupBy()
    return gb.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(hll))").alias(out_col)
    )
