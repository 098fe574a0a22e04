"""SimpleFIN ingest invariants — ports of the reference's own tests
(dagster/tests/test_simplefin_retry.py) plus the windowing/dedup logic."""

from __future__ import annotations

import datetime as dt

from doin_fine_ance__spark.schemas import NUMERICAL_FEATURES, TEXT_FEATURE
from doin_fine_ance__spark.sources.simplefin import (
    RetryPolicy,
    append_to_landing,
    extract_simplefin,
    request_windows,
)

NOW = dt.datetime(2024, 3, 1, 12, 0, 0)


def _payload(window_idx: int) -> dict:
    """Two accounts; the same transaction id appears in EVERY window
    (overlapping windows re-serve rows) plus one unique row per window."""
    return {
        "accounts": [
            {
                "id": "ACT-1",
                "name": "Checking",
                "org": {"name": "Example Bank", "domain": "bank.example"},
                "transactions": [
                    {"id": "TRN-REPEAT", "amount": "-10.00", "posted": 1709200000,
                     "transacted_at": 1709100000, "description": "REPEATED ROW"},
                    {"id": f"TRN-W{window_idx}", "amount": "-1.50",
                     "posted": 1709200000 + window_idx,
                     "transacted_at": 1709100000 + window_idx,
                     "description": f"WINDOW {window_idx} ROW",
                     "extra": {"k": window_idx}},
                ],
            },
            {"id": "ACT-2", "name": "Savings", "org": {"name": "Example Bank"},
             "transactions": []},
        ]
    }


# --- retry policy (reference test_simplefin_retry.py:5-31) ---------------


def test_retry_policy_totals_and_backoff():
    p = RetryPolicy()
    assert p.total == 5
    assert p.backoff_factor > 0
    assert [p.backoff_seconds(i) for i in range(4)] == [0.0, 1.0, 2.0, 4.0]


def test_retries_transient_not_auth():
    p = RetryPolicy()
    for status in (429, 500, 502, 503, 504):
        assert p.should_retry(status, attempt=0), status
    for status in (402, 403):
        assert not p.should_retry(status, attempt=0), status
    assert not p.should_retry(429, attempt=5)  # budget exhausted


# --- feature-list invariants (reference test_common.py:5-54) -------------


def test_feature_contract_invariants():
    assert TEXT_FEATURE == "combined_text"
    assert len(NUMERICAL_FEATURES) == 14
    assert len(set(NUMERICAL_FEATURES)) == len(NUMERICAL_FEATURES)
    assert sum(1 for f in NUMERICAL_FEATURES if f.startswith("has_")) == 9


# --- windowing + extraction ----------------------------------------------


def test_request_windows_cover_lookback_in_45day_chunks():
    ws = request_windows(NOW)
    assert len(ws) == 5  # ceil(200/45)
    assert ws[0][0] == NOW - dt.timedelta(days=200)
    assert ws[-1][1] == NOW
    for s, e in ws:
        assert (e - s).days <= 45
    # contiguous, no gaps
    for (s1, e1), (s2, e2) in zip(ws, ws[1:]):
        assert e1 == s2


def test_extract_dedups_across_windows(spark):
    calls = []

    def fetch(start, end):
        calls.append((start, end))
        return _payload(len(calls))

    df = extract_simplefin(spark, fetch, now=NOW)
    rows = df.collect()
    assert len(calls) == 5
    ids = [r.transaction_id for r in rows]
    # TRN-REPEAT served 5 times but landed once; one unique row per window
    assert ids.count("TRN-REPEAT") == 1
    assert len(ids) == 6
    by_id = {r.transaction_id: r for r in rows}
    assert by_id["TRN-W1"].extra == '{"k": 1}'  # dict extra JSON-encoded
    assert by_id["TRN-REPEAT"].import_timestamp == NOW.isoformat()
    assert str(by_id["TRN-REPEAT"].amount) == "-10.00"


def test_append_to_landing_partitioned(spark, tmp_path):
    df = extract_simplefin(spark, lambda s, e: _payload(1), now=NOW)
    path = str(tmp_path / "landing")
    append_to_landing(df, path)
    append_to_landing(df, path)  # raw zone is append-only: duplicates land
    back = spark.read.parquet(path)
    assert back.count() == 2 * df.count()
    # import_date partition dir exists (time-pruned reads at scale)
    import os

    assert any(d.startswith("import_date=") for d in os.listdir(path))
