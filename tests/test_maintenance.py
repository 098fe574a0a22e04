"""S9 backup/retention + S8 compaction — ports of the reference's
backup-service tests (ui/backend/tests/test_backup_service.py:14-51)
onto the parquet warehouse, plus the OPTIMIZE-analog file-count
assertions."""

from __future__ import annotations

import os
import time

from doin_fine_ance__spark.operators import maintenance as mnt


# --- schedule state (test_backup_service.py:14-36) -----------------------


def test_load_schedule_defaults_when_missing(tmp_path):
    assert mnt.load_schedule(str(tmp_path)) == mnt.DEFAULT_SCHEDULE


def test_save_and_load_schedule_round_trip(tmp_path):
    data = {"enabled": True, "cron": "0 3 * * *", "retention_days": 14}
    mnt.save_schedule(str(tmp_path), data)
    loaded = mnt.load_schedule(str(tmp_path))
    assert loaded["enabled"] is True
    assert loaded["cron"] == "0 3 * * *"
    assert loaded["retention_days"] == 14


def test_save_next_run_preserves_other_fields(tmp_path):
    mnt.save_schedule(
        str(tmp_path), {"enabled": True, "cron": "0 2 * * *", "retention_days": 7}
    )
    mnt.save_next_run(str(tmp_path), "2026-01-01T02:00:00")
    loaded = mnt.load_schedule(str(tmp_path))
    assert loaded["next_run"] == "2026-01-01T02:00:00"
    assert loaded["enabled"] is True


# --- retention sweep (test_backup_service.py:39-51) ----------------------


def test_apply_retention_deletes_old_snapshots(tmp_path):
    old = tmp_path / "snapshot_old"
    new = tmp_path / "snapshot_new"
    old.mkdir()
    (old / "x").write_bytes(b"old")
    new.mkdir()
    ten_days_ago = time.time() - 10 * 86400
    os.utime(old, (ten_days_ago, ten_days_ago))

    deleted = mnt.apply_retention(str(tmp_path), retention_days=7)

    assert not old.exists()
    assert new.exists()
    assert deleted == [str(old)]


def test_apply_retention_ignores_non_snapshot_entries(tmp_path):
    other = tmp_path / "schedule.json"
    other.write_text("{}")
    ten_days_ago = time.time() - 10 * 86400
    os.utime(other, (ten_days_ago, ten_days_ago))
    mnt.apply_retention(str(tmp_path), retention_days=7)
    assert other.exists()


# --- snapshot export / restore (pg_dump/pg_restore analog) ----------------


def test_snapshot_export_restore_round_trip(spark, tmp_path):
    wh = str(tmp_path / "warehouse")
    bk = str(tmp_path / "backups")
    df = spark.range(100).withColumnRenamed("id", "k")
    df.write.parquet(os.path.join(wh, "marts", "t1"))

    snap = mnt.export_snapshot(wh, bk)
    assert os.path.basename(snap).startswith(mnt.SNAPSHOT_PREFIX)

    # mutate the live warehouse, then restore: snapshot state wins
    spark.range(5).withColumnRenamed("id", "k").write.mode("overwrite").parquet(
        os.path.join(wh, "marts", "t1")
    )
    assert spark.read.parquet(os.path.join(wh, "marts", "t1")).count() == 5
    mnt.restore_snapshot(snap, wh)
    assert spark.read.parquet(os.path.join(wh, "marts", "t1")).count() == 100


def test_snapshot_errors(tmp_path):
    import pytest

    with pytest.raises(mnt.BackupError):
        mnt.export_snapshot(str(tmp_path / "nope"), str(tmp_path / "b"))
    with pytest.raises(mnt.BackupError):
        mnt.restore_snapshot(str(tmp_path / "nosnap"), str(tmp_path / "wh"))


# --- compaction (S8, OPTIMIZE analog) -------------------------------------


def test_compact_table_partitioned(spark, tmp_path):
    path = str(tmp_path / "t")
    # 8 appends x 4 shuffle partitions -> many small files per partition
    for i in range(8):
        (
            spark.range(i * 100, (i + 1) * 100)
            .selectExpr("id", "CAST(id % 2 AS STRING) AS p")
            .repartition(4)
            .write.mode("append")
            .partitionBy("p")
            .parquet(path)
        )
    before = {
        d: len([f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")])
        for d in ("p=0", "p=1")
    }
    assert all(n >= 8 for n in before.values())

    results = mnt.compact_table(spark, path)

    assert set(results) == {"p=0", "p=1"}
    for d in ("p=0", "p=1"):
        n = len([f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")])
        assert n == 1  # tiny data -> single ~target-size file
    # data identical after compaction
    back = spark.read.parquet(path)
    assert back.count() == 800
    assert back.selectExpr("sum(id)").first()[0] == sum(range(800))


def test_compact_table_skips_already_compact(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(100).coalesce(1).write.parquet(path)
    assert mnt.compact_table(spark, path) == {}


def test_compact_table_zorder_skips_files_on_both_columns(spark, tmp_path):
    """ZORDER analog: after a z-ordered rewrite, per-file min/max
    stats are selective on BOTH clustered columns, so a point-ish
    predicate on either column prunes most files — the parquet-lake
    stand-in for the reference's btree indexes (init_db.py:79-130)."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    path = str(tmp_path / "tz")
    df = spark.range(40000).select(
        F.col("id"),
        (F.col("id") * 7919 % 1000).alias("a"),
        (F.col("id") * 104729 % 1000).alias("b"),
    )
    df.repartition(24).write.mode("overwrite").parquet(path)
    before = df.count()

    out = mnt.compact_table(
        spark, path, target_file_bytes=40_000, min_files=2, zorder=["a", "b"]
    )
    assert out  # the rewrite happened

    files = [
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    ]
    assert len(files) >= 4

    def covering(colname, value):
        n = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(colname)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st.min <= value <= st.max:
                    n += 1
                    break
        return n

    # each column's value range is [0, 1000); a z-ordered layout keeps
    # both columns' per-file ranges narrow, so a point predicate on
    # either column touches a strict minority of files
    assert covering("a", 5) <= len(files) // 2
    assert covering("b", 5) <= len(files) // 2
    # data survives the rewrite intact
    after = spark.read.parquet(path)
    assert after.count() == before
    assert after.agg(F.sum("id")).first()[0] == sum(range(40000))


def _leaf_files(path, d):
    p = os.path.join(path, d)
    return [f for f in os.listdir(p) if f.endswith(".parquet")]


def test_repair_compaction_restores_orphaned_backup(spark, tmp_path):
    """ADVICE r8: if the process dies between compact_table's two swap
    renames, the partition survives only in the `_old_` backup dir —
    the origin marker lets repair_compaction rename it back instead of
    readers silently seeing the partition as empty."""
    path = str(tmp_path / "t")
    for i in range(4):
        (
            spark.range(i * 50, (i + 1) * 50)
            .selectExpr("id", "CAST(id % 2 AS STRING) AS p")
            .repartition(3)
            .write.mode("append")
            .partitionBy("p")
            .parquet(path)
        )
    total = spark.read.parquet(path).count()

    # simulate the crash window: stage written, d renamed to backup,
    # process dies before rename(staging, d)
    d = os.path.join(path, "p=0")
    staging = os.path.join(path, "_stage_deadbeef")
    spark.read.parquet(d).coalesce(1).write.parquet(staging)
    marker = os.path.join(path, "_old_cafe0001.origin")
    with open(marker, "w") as f:
        f.write("p=0")
    os.rename(d, os.path.join(path, "_old_cafe0001"))
    # the partition is now invisible to discovery
    assert spark.read.parquet(path).count() < total

    out = mnt.repair_compaction(path)
    assert out["restored"] == ["p=0"]
    assert "_stage_deadbeef" in out["removed"]
    assert not os.path.exists(marker)
    assert spark.read.parquet(path).count() == total


def test_repair_compaction_drops_superseded_backup_and_stale_marker(
    spark, tmp_path
):
    """Crash AFTER the swap completed (cleanup missed): the backup's
    destination exists, so the backup and marker are superseded litter;
    a marker with no backup dir (crash before the first rename) is
    stale on its own. Repair is idempotent."""
    path = str(tmp_path / "t")
    spark.range(100).selectExpr(
        "id", "CAST(id % 2 AS STRING) AS p"
    ).write.partitionBy("p").parquet(path)
    total = spark.read.parquet(path).count()

    # superseded backup: destination p=1 exists and holds the real data
    backup = os.path.join(path, "_old_feed0001")
    os.makedirs(backup)
    with open(os.path.join(path, "_old_feed0001.origin"), "w") as f:
        f.write("p=1")
    # stale marker with no backup dir at all
    with open(os.path.join(path, "_old_feed0002.origin"), "w") as f:
        f.write("p=0")

    out = mnt.repair_compaction(path)
    assert sorted(out["removed"]) == [
        "_old_feed0001",
        "_old_feed0002.origin",
    ]
    assert out["restored"] == []
    assert spark.read.parquet(path).count() == total
    # idempotent: a second sweep finds nothing
    assert mnt.repair_compaction(path) == {"restored": [], "removed": []}


def test_compact_table_writes_and_clears_origin_marker(spark, tmp_path):
    """The happy path leaves no markers or backup dirs behind."""
    path = str(tmp_path / "t")
    for i in range(4):
        spark.range(i * 50, (i + 1) * 50).repartition(3).write.mode(
            "append"
        ).parquet(path)
    assert mnt.compact_table(spark, path)
    leftovers = [
        n
        for n in os.listdir(os.path.dirname(path)) + os.listdir(path)
        if n.startswith(("_old_", "_stage_"))
    ]
    assert leftovers == []
    assert spark.read.parquet(path).count() == 200


def test_compact_table_versioned_rewrites_and_links(spark, tmp_path):
    """VERDICT r8 #6 unit coverage: the versioned compaction rewrites
    fragmented leaves into the target tree, HARD-LINKS already-compact
    leaves (same inode, no bytes copied), handles the unpartitioned
    (src-is-leaf) layout, and refuses to clobber an existing target."""
    import pytest as _pytest

    # partitioned: p=0 fragmented (rewritten), p=1 compact (linked)
    src = str(tmp_path / "t")
    for i in range(4):
        spark.range(i * 50, (i + 1) * 50).selectExpr(
            "id", "CAST(0 AS STRING) AS p"
        ).repartition(3).write.mode("append").partitionBy("p").parquet(src)
    spark.range(1000, 1100).selectExpr(
        "id", "CAST(1 AS STRING) AS p"
    ).coalesce(1).write.mode("append").partitionBy("p").parquet(src)
    dst = str(tmp_path / "t_v2")
    out = mnt.compact_table_versioned(spark, src, dst, min_files=2)
    assert set(out) == {"p=0"}  # only the fragmented leaf is listed
    assert spark.read.parquet(dst).count() == 300
    # linked leaf shares inodes with the source (no data copied)
    src_files = sorted(os.listdir(os.path.join(src, "p=1")))
    for f in src_files:
        if f.endswith(".parquet"):
            a = os.stat(os.path.join(src, "p=1", f))
            b = os.stat(os.path.join(dst, "p=1", f))
            assert a.st_ino == b.st_ino
    # target must be fresh
    with _pytest.raises(ValueError, match="already exists"):
        mnt.compact_table_versioned(spark, src, dst)

    # unpartitioned: the source root itself is the leaf
    flat = str(tmp_path / "flat")
    for i in range(3):
        spark.range(i * 10, (i + 1) * 10).repartition(2).write.mode(
            "append"
        ).parquet(flat)
    flat2 = str(tmp_path / "flat_v2")
    out2 = mnt.compact_table_versioned(spark, flat, flat2, min_files=2)
    assert set(out2) == {"."}
    assert spark.read.parquet(flat2).count() == 30
    assert len([f for f in os.listdir(flat2) if f.endswith(".parquet")]) == 1
