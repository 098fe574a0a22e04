"""Structured Streaming windows: the streaming results must equal the
batch expressions of the same windows (the oracle-checked queries)."""

from __future__ import annotations

from doin_fine_ance__spark.queries import load_registry
from doin_fine_ance__spark.streaming.windows import (
    read_events_stream,
    run_to_memory_sink,
    session_aggregates,
    tumbling_counts,
)

QUERIES, _ = load_registry()
SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_equals_batch(spark):
    stream = read_events_stream(spark, SF)
    result = run_to_memory_sink(tumbling_counts(stream), "tumbling_out")
    batch = QUERIES["st_tumbling_window"](spark, SF)
    got = _rows(
        result.withColumnRenamed("window_start", "ws"),
        ["ws", "event_type", "n", "total_value"],
    )
    # batch query emits TIMESTAMP_NTZ; stream emits LTZ — compare wall-clock
    want = _rows(
        batch.withColumnRenamed("window_start", "ws"),
        ["ws", "event_type", "n", "total_value"],
    )
    assert [(str(a), b, c, d) for a, b, c, d in got] == [
        (str(a), b, c, d) for a, b, c, d in want
    ]


def test_sliding_stream_equals_batch(spark):
    from doin_fine_ance__spark.streaming.windows import sliding_counts

    stream = read_events_stream(spark, SF)
    result = run_to_memory_sink(sliding_counts(stream), "sliding_out")
    batch = QUERIES["st_sliding_window"](spark, SF)
    got = sorted((str(r["window_start"]), r["n"]) for r in result.collect())
    want = sorted((str(r["window_start"]), r["n"]) for r in batch.collect())
    assert got == want


def test_session_stream_counts(spark):
    stream = read_events_stream(spark, SF)
    result = run_to_memory_sink(session_aggregates(stream), "session_out")
    # session totals must cover every event exactly once
    total_events = result.groupBy().sum("n_events").collect()[0][0]
    assert total_events == 1000
    batch = QUERIES["st_session_window"](spark, SF)
    assert result.count() == batch.count()  # same session boundaries


def test_stateful_first_seen_dedups_across_microbatches(spark, tmp_path):
    """applyInPandasWithState dedup: a key repeated in a LATER micro-batch
    is suppressed; repeats within the discovering batch are counted."""
    import shutil

    import pyspark.sql.functions as F

    from doin_fine_ance__spark.streaming.windows import stateful_first_seen

    src_dir = tmp_path / "dedup_src"
    src_dir.mkdir()

    def drop_batch(rows, name):
        staged = tmp_path / f"_stage_{name}"
        (
            spark.createDataFrame(rows, ["event_id", "ts_str"])
            .withColumn("ts", F.col("ts_str").cast("timestamp"))
            .select("event_id", "ts")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(staged))
        )
        part = next(p for p in staged.iterdir() if p.name.endswith(".parquet"))
        shutil.copy(str(part), str(src_dir / f"{name}.parquet"))

    # batch1: ids 1, 2, 2 (one in-batch dup)
    drop_batch(
        [
            (1, "2024-01-01 10:00:00"),
            (2, "2024-01-01 10:01:00"),
            (2, "2024-01-01 10:02:00"),
        ],
        "b1",
    )

    stream = (
        spark.readStream.format("parquet")
        .schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .load(str(src_dir))
    )
    deduped = stateful_first_seen(stream, key_col="event_id")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("first_seen_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_fs"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch2: id 2 again (cross-batch dup) + fresh id 3
        drop_batch(
            [(2, "2024-01-01 10:10:00"), (3, "2024-01-01 10:11:00")], "b2"
        )
        q.processAllAvailable()
    finally:
        q.stop()
    out = {r.key: r for r in spark.sql("SELECT * FROM first_seen_out").collect()}
    assert set(out) == {1, 2, 3}  # each key exactly once
    assert out[2].n_dups_seen == 1  # in-batch dup counted
    assert out[3].n_dups_seen == 0
    # first_ts is the earliest sighting of the key
    assert out[1].first_ts < out[2].first_ts < out[3].first_ts


def test_watermark_drops_late_data(spark, tmp_path):
    """A row arriving behind the advanced watermark is dropped (update mode)."""
    import shutil

    import pyspark.sql.functions as F

    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()

    def drop_batch(rows, name):
        # stage the write, then move the bare part file into the watched
        # dir root (the file source does not recurse into subdirectories)
        staged = tmp_path / f"_stage_{name}"
        (
            spark.createDataFrame(rows, ["event_id", "ts_str"])
            .withColumn("ts", F.col("ts_str").cast("timestamp"))
            .select("event_id", "ts")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(staged))
        )
        part = next(p for p in staged.iterdir() if p.name.endswith(".parquet"))
        shutil.copy(str(part), str(src_dir / f"{name}.parquet"))

    # batch1 establishes event time up to 11:00 → watermark 10:50
    drop_batch([(1, "2024-01-01 10:00:00"), (2, "2024-01-01 11:00:00")], "b1")

    stream = (
        spark.readStream.format("parquet")
        .schema("event_id long, ts timestamp")
        .load(str(src_dir))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "30 minutes"))
        .count()
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("late_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch2: event an hour BEHIND the watermark → silently dropped
        drop_batch([(3, "2024-01-01 09:00:00")], "b2")
        q.processAllAvailable()
        # batch3: on-time event → processed
        drop_batch([(4, "2024-01-01 11:05:00")], "b3")
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM late_out").collect()
    hours = {r["window"].start.hour for r in rows}
    assert 9 not in hours  # late event never produced a window
    assert 11 in hours  # on-time event did


def test_stream_incremental_dedup_pairs_across_batches(spark, tmp_path):
    """foreachBatch corpus ingestion: a doc arriving in a later
    micro-batch pairs with its stored near-dup from an earlier batch;
    no old-vs-old pairs are recomputed; replay-safe store append."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from doin_fine_ance__spark.streaming.windows import stream_incremental_dedup

    src = tmp_path / "docs_src"
    src.mkdir()
    base = "the quick brown fox jumps over the lazy dog " * 8
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )

    def drop(rows, name):
        (
            spark.createDataFrame(rows, schema)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(tmp_path / f"_stage_{name}"))
        )
        import shutil

        pq = next((tmp_path / f"_stage_{name}").glob("*.parquet"))
        shutil.copy(pq, src / f"{name}.parquet")

    drop([(1, base), (50, "unrelated filler words " * 10)], "b1")
    drop([(2, base + " tail"), (60, "still nothing alike here " * 9)], "b2")

    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    store = str(tmp_path / "sigstore")
    pairs_path = str(tmp_path / "pairs")
    q = stream_incremental_dedup(stream, store, pairs_path, threshold=0.6)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    pairs = {
        (r.id_a, r.id_b) for r in spark.read.parquet(pairs_path).collect()
    }
    assert (1, 2) in pairs
    assert all(1 in p or 2 in p for p in pairs)  # no unrelated-pair noise
    # the store accumulated every streamed signature
    assert spark.read.parquet(store).count() == 4


def test_stream_stream_interval_join_across_batches(spark, tmp_path):
    """A purchase arriving in a later micro-batch joins views buffered
    from an earlier batch; the appended pairs equal the batch join."""
    import shutil

    import pyspark.sql.functions as F

    from doin_fine_ance__spark.streaming.windows import stream_stream_interval_join

    src = tmp_path / "ev_src"
    src.mkdir()
    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def drop(rows, name):
        staged = tmp_path / f"_stage_{name}"
        (
            spark.createDataFrame(rows, "event_id long, ts_str string, user_id long, event_type string")
            .withColumn("ts", F.col("ts_str").cast("timestamp"))
            .select("event_id", "ts", "user_id", "event_type")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(staged))
        )
        part = next(p for p in staged.iterdir() if p.name.endswith(".parquet"))
        shutil.copy(str(part), str(src / f"{name}.parquet"))

    # batch1: two views for user 7 (one inside, one outside the 30-min
    # lookback of the batch2 purchase), and a view for user 8
    drop(
        [
            (1, "2024-01-01 10:00:00", 7, "view"),
            (2, "2024-01-01 10:20:00", 7, "view"),
            (3, "2024-01-01 10:25:00", 8, "view"),
        ],
        "b1",
    )
    # batch2: purchase for user 7 at 10:45 (view 2 attributable, view 1
    # not: 45 min earlier), purchase for user 9 (no views at all)
    drop(
        [
            (4, "2024-01-01 10:45:00", 7, "purchase"),
            (5, "2024-01-01 10:50:00", 9, "purchase"),
        ],
        "b2",
    )

    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    joined = stream_stream_interval_join(stream, "30 minutes", "1 hour")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.purchase_id, r.p_user, r.view_ts.isoformat())
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    }
    assert got == {(4, 7, "2024-01-01T10:20:00")}


def test_stream_incremental_dedup_restart_exactly_once(spark, tmp_path):
    """Kill-and-restart recovery (VERDICT r2 next-round #6): stop the
    foreachBatch incremental-dedup stream after the first micro-batch,
    restart against the same checkpoint dir, and assert the pair set
    equals the single-run result with no duplicates — exactly-once."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from doin_fine_ance__spark.streaming.windows import stream_incremental_dedup

    src = tmp_path / "docs_src"
    src.mkdir()
    base = "pack my box with five dozen liquor jugs every day " * 8
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )

    def drop(rows, name):
        import shutil

        (
            spark.createDataFrame(rows, schema)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(tmp_path / f"_stage_{name}"))
        )
        pq = next((tmp_path / f"_stage_{name}").glob("*.parquet"))
        shutil.copy(pq, src / f"{name}.parquet")

    store = str(tmp_path / "sigstore")
    pairs_path = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    stream_def = lambda: (  # noqa: E731
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )

    # run 1: only batch file b1 exists; process it, then KILL the query
    drop([(1, base), (90, "totally disjoint vocabulary here friends " * 9)], "b1")
    q1 = stream_incremental_dedup(
        stream_def(), store, pairs_path, threshold=0.6, checkpoint_dir=ckpt
    )
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()  # simulated crash/shutdown mid-stream

    # more data lands while the stream is down
    drop([(2, base + " extra tail"), (91, "other unrelated words only " * 9)], "b2")

    # run 2: restart from the SAME checkpoint — resumes at the
    # committed offset, must not reprocess b1
    q2 = stream_incremental_dedup(
        stream_def(), store, pairs_path, threshold=0.6, checkpoint_dir=ckpt
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    rows = spark.read.parquet(pairs_path).select("id_a", "id_b").collect()
    pairs = [(r.id_a, r.id_b) for r in rows]
    assert pairs.count((1, 2)) == 1, f"duplicate emission: {pairs}"
    assert set(pairs) == {(1, 2)}
    # store holds each streamed signature exactly once
    sigs = spark.read.parquet(store)
    assert sigs.count() == 4
    assert sigs.select("doc_id").distinct().count() == 4


def test_incremental_dedup_sink_epoch_replay_idempotent(spark, tmp_path):
    """Deterministic replay: invoking the sink twice with the SAME
    epoch_id (crash after writes, before checkpoint commit) converges
    to the identical store + pair state instead of double-appending."""
    from doin_fine_ance__spark.streaming.windows import incremental_dedup_sink

    store = str(tmp_path / "sigstore")
    pairs_path = str(tmp_path / "pairs")
    sink = incremental_dedup_sink(store, pairs_path, threshold=0.6)

    base = "sphinx of black quartz judge my vow repeatedly " * 8
    b1 = spark.createDataFrame([(1, base)], ["doc_id", "text"])
    b2 = spark.createDataFrame([(2, base + " tail")], ["doc_id", "text"])

    sink(b1, 0)
    sink(b2, 1)
    once_pairs = sorted(
        tuple(r) for r in
        spark.read.parquet(pairs_path).select("id_a", "id_b").collect()
    )
    once_store = spark.read.parquet(store).count()

    sink(b2, 1)  # replayed epoch
    replay_pairs = sorted(
        tuple(r) for r in
        spark.read.parquet(pairs_path).select("id_a", "id_b").collect()
    )
    assert replay_pairs == once_pairs == [(1, 2)]
    assert spark.read.parquet(store).count() == once_store == 2


def test_stateful_first_seen_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState recovery: stop the stream after batch 1,
    restart on the SAME checkpoint, then send a key from batch 1 again
    — the restored per-key state must suppress it (proving the state
    store, not just the source offset, recovered)."""
    import shutil

    import pyspark.sql.functions as F

    from doin_fine_ance__spark.streaming.windows import stateful_first_seen

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    out = str(tmp_path / "first_seen")
    ckpt = str(tmp_path / "ckpt")

    def drop_batch(rows, name):
        staged = tmp_path / f"_stage_{name}"
        (
            spark.createDataFrame(rows, ["event_id", "ts_str"])
            .withColumn("ts", F.col("ts_str").cast("timestamp"))
            .select("event_id", "ts")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(staged))
        )
        part = next(p for p in staged.iterdir() if p.name.endswith(".parquet"))
        shutil.copy(str(part), str(src_dir / f"{name}.parquet"))

    def start():
        stream = (
            spark.readStream.format("parquet")
            .schema("event_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .load(str(src_dir))
        )
        return (
            stateful_first_seen(stream, key_col="event_id")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    drop_batch([(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:01:00")], "b1")
    q1 = start()
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()  # simulated crash

    # while down: key 2 repeats (must be suppressed by RESTORED state),
    # key 3 is new
    drop_batch([(2, "2024-01-01 10:10:00"), (3, "2024-01-01 10:11:00")], "b2")
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    rows = spark.read.parquet(out).collect()
    keys = sorted(r.key for r in rows)
    assert keys == [1, 2, 3], rows  # each key exactly once
    by_key = {r.key: int(r.first_ts) for r in rows}
    # key 2's surviving row is its FIRST occurrence (10:01:00 UTC as
    # epoch seconds), not the 10:10:00 replay
    assert by_key[2] == 1704103260


def test_stream_static_enrich_equals_batch(spark):
    """Stream-static join + windowed rollup: the streaming result must
    equal the oracle-checked batch twin (the static side broadcasts
    per micro-batch; only the window agg shuffles)."""
    from doin_fine_ance__spark.sources.testdata import load_table
    from doin_fine_ance__spark.streaming.windows import stream_static_enrich

    stream = read_events_stream(spark, SF)
    dim = load_table(spark, SF, "customer", ["c_custkey", "c_mktsegment"])
    result = run_to_memory_sink(
        stream_static_enrich(stream, dim), "enrich_out"
    )
    batch = QUERIES["st_stream_static_enrich"](spark, SF)
    cols = ["ws", "c_mktsegment", "n", "total_value"]
    got = _rows(result.withColumnRenamed("window_start", "ws"), cols)
    want = _rows(batch.withColumnRenamed("window_start", "ws"), cols)
    # batch emits TIMESTAMP_NTZ; stream emits LTZ — compare wall-clock
    assert [(str(a), *rest) for a, *rest in got] == [
        (str(a), *rest) for a, *rest in want
    ]


def test_stream_static_enrich_custom_columns(spark):
    """ADVICE r6: value/event-time columns are parameters, not
    hardcoded names — a stream with renamed columns produces the same
    rollup through value_col/ts_col."""
    from doin_fine_ance__spark.sources.testdata import load_table
    from doin_fine_ance__spark.streaming.windows import stream_static_enrich

    stream = (
        read_events_stream(spark, SF)
        .withColumnRenamed("ts", "event_ts")
        .withColumnRenamed("value", "amount")
    )
    dim = load_table(spark, SF, "customer", ["c_custkey", "c_mktsegment"])
    result = run_to_memory_sink(
        stream_static_enrich(
            stream, dim, value_col="amount", ts_col="event_ts"
        ),
        "enrich_custom_cols",
    )
    batch = QUERIES["st_stream_static_enrich"](spark, SF)
    cols = ["ws", "c_mktsegment", "n", "total_value"]
    got = _rows(result.withColumnRenamed("window_start", "ws"), cols)
    want = _rows(batch.withColumnRenamed("window_start", "ws"), cols)
    assert [(str(a), *rest) for a, *rest in got] == [
        (str(a), *rest) for a, *rest in want
    ]
