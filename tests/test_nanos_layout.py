"""Regression pin for the events INT64-TIMESTAMP(NANOS) layout.

The driver regenerates testdata between rounds and has already
shipped ``events.ts`` both ways: TIMESTAMP(MICROS) (reads natively)
and INT64 TIMESTAMP(NANOS) (a vanilla session ERRORS on read unless
``spark.sql.legacy.parquet.nanosAsLong`` is set — ``ensure_compat``
does, and ``load_table`` then truncates ns→µs exactly like DuckDB).
The current drop happens to be MICROS, so without this test the nanos
branch would only be exercised the round the driver flips it again.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from doin_fine_ance__spark.sources.testdata import load_table

TS = [
    dt.datetime(2024, 1, 1, 0, 9, 58, 778549),
    dt.datetime(2024, 1, 15, 12, 0, 0, 1),
    dt.datetime(2024, 1, 30, 23, 26, 16, 220708),
]


def _write_nanos_events(dirpath: str) -> None:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(TS, pa.timestamp("ns")),
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["view", "click", "purchase"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}', '{"k": 3}']),
        }
    )
    # version='2.6' + no coercion keeps the physical INT64 NANOS type
    pq.write_table(
        table,
        os.path.join(dirpath, "events.parquet"),
        coerce_timestamps=None,
        version="2.6",
    )


def test_nanos_events_parquet_is_really_nanos(tmp_path):
    _write_nanos_events(str(tmp_path))
    meta = pq.read_schema(str(tmp_path / "events.parquet"))
    assert str(meta.field("ts").type) == "timestamp[ns]"


def test_load_table_truncates_nanos_to_micros(spark, tmp_path):
    _write_nanos_events(str(tmp_path))
    df = load_table(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    got = {r.event_id: r.ts for r in df.collect()}
    assert got == {i + 1: TS[i] for i in range(3)}


def test_events_stream_reads_nanos_layout(spark, tmp_path):
    from doin_fine_ance__spark.streaming.windows import read_events_stream

    _write_nanos_events(str(tmp_path))
    stream = read_events_stream(spark, str(tmp_path))
    # the stream reader casts NTZ -> LTZ (watermarks require it); the
    # UTC session pin keeps the wall clock identical
    assert dict(stream.dtypes)["ts"] == "timestamp"
    out = str(tmp_path / "sink")
    q = (
        stream.writeStream.format("parquet")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .option("path", out)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.event_id: r.ts for r in spark.read.parquet(out).collect()}
    assert got == {i + 1: TS[i] for i in range(3)}
