"""Windowed event-time analytics over the events table.

The reference is batch-only; the north star adds streaming windows.
These are the *batch* expressions of tumbling/sliding/session windows
— the same logical results a Structured Streaming job produces once
the watermark closes a window — so they can be oracle-checked in SQL.
The true ``readStream`` versions live in
:mod:`doin_fine_ance__spark.streaming.windows` and are covered by
pytest (memory-sink, processAllAvailable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from ..sources.testdata import load_table
from . import query


@query(
    "st_tumbling_window",
    oracle="""
    SELECT to_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT))::TIMESTAMP AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def st_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window counts/sums per event_type.

    Uses Spark's native ``window()`` — identical grouping to the
    streaming job; the oracle floors epoch seconds to the same buckets.
    """
    ev = load_table(spark, sf_dir, "events", ["ts", "event_type", "value"])
    return (
        ev.groupBy(F.window(col("ts"), "5 minutes").alias("w"), col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "st_sliding_window",
    oracle="""
    WITH offsets AS (SELECT unnest([0, 1, 2]) AS k),
    assigned AS (
      SELECT to_timestamp(CAST((floor((epoch(e.ts) - o.k * 300) / 900) * 900 + o.k * 300) AS BIGINT))::TIMESTAMP
               AS window_start,
             e.value
      FROM events e CROSS JOIN offsets o
      WHERE epoch(e.ts) >= floor((epoch(e.ts) - o.k * 300) / 900) * 900 + o.k * 300
    )
    SELECT window_start, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM assigned
    GROUP BY 1
    """,
)
def st_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute window sliding every 5 minutes (each event in 3 windows)."""
    ev = load_table(spark, sf_dir, "events", ["ts", "value"])
    return (
        ev.groupBy(F.window(col("ts"), "15 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(col("w.start").cast("timestamp_ntz").alias("window_start"), "n", "total_value")
    )


@query(
    "st_session_window",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def st_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap (lag + cumsum).

    The batch classic: one window per user ordered by time — the
    streaming twin is ``session_window(ts, '30 minutes')``.
    """
    ev = load_table(spark, sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                # exact fractional epoch seconds on both sides: DuckDB's
                # epoch() is a DOUBLE, so the gap comparison must be too
                col("ts").cast("timestamp").cast("double")
                - F.lag("ts").over(w).cast("timestamp").cast("double")
                > 1800
            ),
            1,
        ).otherwise(0),
    )
    sessions = gaps.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


@query(
    "st_interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_views
    FROM events p
    JOIN events v
      ON v.user_id = p.user_id
     AND v.event_type = 'view'
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL 30 MINUTE
    WHERE p.event_type = 'purchase'
    GROUP BY 1, 2
    ORDER BY purchase_id
    """,
)
def st_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join
    (:func:`doin_fine_ance__spark.streaming.windows.stream_stream_interval_join`):
    views attributed to each purchase within a 30-minute lookback.

    The join is an equi-join on user_id with the interval as a
    residual — per-user event counts are bounded, so no pair
    explosion; one shuffle on user_id. Inner join: purchases with no
    attributable view drop out (same as streaming append output).
    """
    ev = load_table(spark, sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    v = ev.filter(col("event_type") == "view").select(
        col("user_id").alias("v_user"), col("ts").alias("view_ts")
    )
    p = ev.filter(col("event_type") == "purchase").select(
        col("event_id").alias("purchase_id"),
        col("user_id").alias("p_user"),
        col("ts").alias("purchase_ts"),
    )
    return (
        p.join(
            v,
            (col("p_user") == col("v_user"))
            & (col("view_ts") <= col("purchase_ts"))
            & (col("view_ts") >= col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
        )
        .groupBy(col("purchase_id"), col("p_user").alias("user_id"))
        .agg(F.count("*").cast("bigint").alias("n_views"))
        .orderBy("purchase_id")
    )


@query(
    "st_stream_static_enrich",
    oracle="""
    SELECT to_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT))::TIMESTAMP AS window_start,
           c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def st_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment join
    (:func:`doin_fine_ance__spark.streaming.windows.stream_static_enrich`):
    events joined to the broadcast customer dimension, then a 15-minute
    tumbling rollup per market segment.

    Plan shape at scale: the dimension broadcasts (stream side never
    shuffles for the join — in streaming it re-resolves per
    micro-batch, picking up dim updates at the next trigger); the only
    shuffle is the windowed aggregation on (window, segment), which is
    low-cardinality and map-side-combined.
    """
    ev = load_table(spark, sf_dir, "events", ["ts", "user_id", "value"])
    cust = load_table(spark, sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    dim = cust.select(col("c_custkey").alias("user_id"), "c_mktsegment")
    return (
        ev.join(F.broadcast(dim), "user_id")
        .groupBy(F.window(col("ts"), "15 minutes").alias("w"), col("c_mktsegment"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            col("w.start").cast("timestamp_ntz").alias("window_start"),
            "c_mktsegment",
            "n",
            "total_value",
        )
    )
