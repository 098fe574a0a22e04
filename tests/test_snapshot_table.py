"""Snapshot-manifest table (VERDICT r3 next-round #7): a reader must
NEVER observe a half-committed table, even with a writer committing
concurrently; old versions stay readable (time travel) until vacuum."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from doin_fine_ance__spark.operators.snapshot import SnapshotTable


def _gen_df(spark, gen: int, rows: int):
    # every row of a committed version carries the same gen and a
    # gen-dependent row count — any torn read shows as a mixed-gen
    # result or a count that matches no generation
    return spark.range(rows).select(
        F.col("id"),
        F.lit(gen).alias("gen"),
    )


def test_reader_never_sees_half_committed_table(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    rows_for = lambda gen: 200 + 37 * gen  # noqa: E731
    t.commit_overwrite(_gen_df(spark, 1, rows_for(1)))

    stop = threading.Event()
    writer_err: list[BaseException] = []

    def writer():
        gen = 2
        try:
            while not stop.is_set() and gen <= 12:
                t.commit_overwrite(_gen_df(spark, gen, rows_for(gen)))
                gen += 1
        except BaseException as e:  # noqa: BLE001
            writer_err.append(e)

    th = threading.Thread(target=writer)
    th.start()
    try:
        for _ in range(30):
            df = t.read(spark)
            gens = [r[0] for r in df.select("gen").distinct().collect()]
            assert len(gens) == 1, f"torn read: generations {gens}"
            n = df.count()
            assert n == rows_for(gens[0]), (
                f"gen {gens[0]} read {n} rows, expected {rows_for(gens[0])}"
            )
    finally:
        stop.set()
        th.join()
    assert not writer_err, writer_err


def test_snapshot_pinned_across_concurrent_commit(spark, tmp_path):
    """A DataFrame resolved from version N keeps returning N's data
    even after N+1 commits — the scan is bound to explicit files."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    v1 = t.commit_overwrite(_gen_df(spark, 1, 100))
    pinned = t.read(spark, v1)
    t.commit_overwrite(_gen_df(spark, 2, 999))
    assert pinned.count() == 100
    assert [r[0] for r in pinned.select("gen").distinct().collect()] == [1]
    assert t.read(spark).count() == 999  # fresh resolve sees latest


def test_time_travel_and_vacuum(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    for gen in (1, 2, 3, 4):
        t.commit_overwrite(_gen_df(spark, gen, 10 * gen))
    assert t.read(spark, 2).count() == 20
    removed = t.vacuum(keep_last=2)
    assert removed == [1, 2]
    with pytest.raises(FileNotFoundError):
        t.manifest(2)
    assert t.read(spark, 4).count() == 40
    assert t.latest_version() == 4


def test_empty_table_raises_cleanly(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "none"))
    assert t.latest_version() == 0
    with pytest.raises(FileNotFoundError):
        t.read(spark)


def test_empty_overwrite_reads_as_empty_table(spark, tmp_path):
    """ADVICE r6: a committed EMPTY overwrite (AQE can coalesce the
    write to zero part files) is a legitimate table state — read()
    must return a zero-row frame with the committed schema, not raise
    SnapshotCorruptionError."""
    import json
    import os

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    st_schema = StructType(
        [StructField("id", LongType()), StructField("label", StringType())]
    )
    t = SnapshotTable(str(tmp_path / "tbl"))
    v = t.commit_overwrite(spark.createDataFrame([], st_schema))
    got = t.read(spark, v)
    assert got.count() == 0
    assert got.schema == st_schema

    # the exact ADVICE scenario, forced deterministically: a published
    # manifest whose files list is empty
    t2 = SnapshotTable(str(tmp_path / "tbl2"))
    t2.commit_overwrite(_gen_df(spark, 1, 5))
    m2 = {
        "version": 2,
        "ts": 0.0,
        "files": [],
        "schema": st_schema.json(),
    }
    with open(os.path.join(t2.root, "_manifests", "v000002.json"), "w") as f:
        json.dump(m2, f)
    with open(os.path.join(t2.root, "_latest"), "w") as f:
        f.write("2")
    empty = t2.read(spark)
    assert empty.count() == 0 and empty.schema == st_schema
    # legacy manifest (no schema recorded) with no files is still corrupt
    m3 = {"version": 3, "ts": 0.0, "files": []}
    with open(os.path.join(t2.root, "_manifests", "v000003.json"), "w") as f:
        json.dump(m3, f)
    with open(os.path.join(t2.root, "_latest"), "w") as f:
        f.write("3")
    from doin_fine_ance__spark.operators.snapshot import SnapshotCorruptionError

    with pytest.raises(SnapshotCorruptionError):
        t2.read(spark)


def test_empty_partitioned_overwrite_reads_as_empty_table(spark, tmp_path):
    """ADVICE r7: the empty-table schema replay must also cover the
    PARTITIONED branch — a committed empty partitioned overwrite has
    zero part files under its commit dir, so the manifest's recorded
    schema is the only source of truth."""
    from pyspark.sql.types import (
        DateType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    st_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("label", StringType()),
            StructField("day", DateType()),
        ]
    )
    t = SnapshotTable(str(tmp_path / "ptbl"))
    v = t.commit_overwrite(
        spark.createDataFrame([], st_schema), partition_by="day"
    )
    got = t.read(spark, v)
    assert got.count() == 0
    assert got.schema == st_schema


def test_append_after_empty_overwrite_keeps_recorded_schema_union(spark, tmp_path):
    """A committed EMPTY table still has a recorded schema; a later
    append's manifest schema must union with it, not silently forget
    the empty version's columns."""
    t = SnapshotTable(str(tmp_path / "etbl"))
    t.commit_overwrite(spark.createDataFrame([], "id bigint, label string"))
    t.commit_append(spark.createDataFrame([(1,)], "id bigint"))
    import json as _json

    from pyspark.sql.types import StructType

    st = StructType.fromJson(_json.loads(t.manifest()["schema"]))
    assert [f.name for f in st.fields] == ["id", "label"]
