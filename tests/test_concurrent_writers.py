"""Concurrent-writer guard on the parquet warehouse
(VERDICT r2 next-round #5).

The reference inherits read-modify-write atomicity from Postgres
transactions (ui/backend/services/transaction_service.py:78-126);
plain-parquet stage-and-swap needs the explicit table lock of
``operators/upsert.py`` — one writer wins, the other raises
``ConcurrentWriteError`` instead of silently interleaving.
"""

from __future__ import annotations

import threading

import pytest

from doin_fine_ance__spark.operators.upsert import (
    ConcurrentWriteError,
    atomic_overwrite,
    insert_only_append,
    merge_keyed,
    table_write_lock,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["transaction_id", "category"])


def test_second_writer_raises_while_lock_held(spark, tmp_path):
    path = str(tmp_path / "tbl")
    merge_keyed(spark, path, _df(spark, [(1, "a")]), "transaction_id")
    with table_write_lock(path):
        with pytest.raises(ConcurrentWriteError) as ei:
            merge_keyed(spark, path, _df(spark, [(2, "b")]), "transaction_id")
        assert "pid=" in str(ei.value)
        with pytest.raises(ConcurrentWriteError):
            atomic_overwrite(_df(spark, [(3, "c")]), path)
        with pytest.raises(ConcurrentWriteError):
            insert_only_append(spark, path, _df(spark, [(4, "d")]),
                               "transaction_id")
    # lock released → writes succeed again and no update was lost
    merge_keyed(spark, path, _df(spark, [(2, "b")]), "transaction_id")
    got = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "b")}


def test_two_threads_one_wins_one_raises(spark, tmp_path):
    path = str(tmp_path / "tbl")
    merge_keyed(spark, path, _df(spark, [(1, "a")]), "transaction_id")

    in_lock = threading.Event()
    release = threading.Event()
    errors: list[Exception] = []

    def holder():
        # winner: holds the table lock across its read-modify-write
        # window while the loser attempts to start one
        with table_write_lock(path):
            in_lock.set()
            release.wait(timeout=30)
        merge_keyed(spark, path, _df(spark, [(2, "winner")]),
                    "transaction_id")

    t = threading.Thread(target=holder)
    t.start()
    try:
        assert in_lock.wait(timeout=30)
        try:
            merge_keyed(spark, path, _df(spark, [(3, "loser")]),
                        "transaction_id")
        except ConcurrentWriteError as e:
            errors.append(e)
    finally:
        release.set()
        t.join(timeout=60)
    assert len(errors) == 1, "second writer should have raised"
    got = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "winner")}


def test_timeout_waits_for_release(spark, tmp_path):
    path = str(tmp_path / "tbl")

    def hold_briefly():
        with table_write_lock(path):
            threading.Event().wait(0.5)

    t = threading.Thread(target=hold_briefly)
    t.start()
    threading.Event().wait(0.1)  # ensure the holder acquired first
    # timeout larger than the hold → this writer queues, then wins
    merge_keyed(spark, path, _df(spark, [(1, "queued")]),
                "transaction_id", timeout=30.0)
    t.join(timeout=30)
    got = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "queued")}


def test_lock_cleaned_up_after_failure(spark, tmp_path):
    path = str(tmp_path / "tbl")
    with pytest.raises(Exception):
        with table_write_lock(path):
            raise RuntimeError("writer crashed mid-merge")
    # lock dir must be gone — next writer proceeds
    merge_keyed(spark, path, _df(spark, [(1, "a")]), "transaction_id")
    assert spark.read.parquet(path).count() == 1


def test_concurrent_categorize_requests_serialize(spark, tmp_path):
    """Two simultaneous HTTP-style override writes: the serving path
    polls the table lock (timeout=10 s), so both requests succeed
    serialized — like Postgres row locks — and both rows land."""
    import datetime as dt

    from doin_fine_ance__spark.serving.transactions import (
        categorize_transaction,
    )

    path = str(tmp_path / "user_categories")
    now = dt.datetime(2026, 8, 14, 12, 0, 0)
    errors: list[BaseException] = []

    def write(txn_id, cat):
        try:
            categorize_transaction(
                spark, path, txn_id, cat, updated_by="t", now=now
            )
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=write, args=(f"TRN-{i}", "Groceries"))
        for i in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    rows = spark.read.parquet(path).collect()
    assert {r.transaction_id for r in rows} == {"TRN-0", "TRN-1", "TRN-2"}
    assert all(r.master_category == "Groceries" for r in rows)
