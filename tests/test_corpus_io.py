"""JSONL corpus interchange: explicit-schema reads, corrupt-line
quarantine, lossless round-trip against the parquet tables."""

from __future__ import annotations

import pytest
import glob
import gzip
import json

from doin_fine_ance__spark.sources.corpus_io import (
    DOCUMENTS_SCHEMA,
    land_jsonl,
    read_documents_jsonl,
    read_events_jsonl,
    write_jsonl,
)
from doin_fine_ance__spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_documents_roundtrip_parquet_jsonl(spark, tmp_path):
    src = load_table(spark, SF, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(src, out, shards=4)
    good, _bad = read_documents_jsonl(spark, out)
    assert good.schema == src.schema
    a = sorted(tuple(r) for r in src.collect())
    b = sorted(tuple(r) for r in good.collect())
    assert a == b  # every source row arrived clean -> quarantine empty
    assert len(glob.glob(f"{out}/part-*")) == 4  # shards honored


def test_events_roundtrip_with_gzip(spark, tmp_path):
    src = load_table(spark, SF, "events")
    out = str(tmp_path / "events_jsonl")
    write_jsonl(src, out, compression="gzip")
    good, _bad = read_events_jsonl(spark, out)
    assert dict(good.dtypes)["ts"] == "timestamp_ntz"
    assert sorted(tuple(r) for r in good.collect()) == sorted(
        tuple(r) for r in src.collect()
    )


def test_corrupt_lines_quarantined_not_dropped(spark, tmp_path):
    d = tmp_path / "mixed"
    d.mkdir()
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "lang": "en",
                    "source": "s", "n_chars": 11}),
        '{"doc_id": 2, "text": "broken',          # truncated JSON
        json.dumps({"doc_id": 3, "text": "ok", "lang": "de",
                    "source": "s", "n_chars": 2}),
        "not json at all",
    ]
    (d / "part-000.jsonl").write_text("\n".join(lines) + "\n")
    good, bad = land_jsonl(
        spark, str(d), DOCUMENTS_SCHEMA, str(tmp_path / "bronze")
    )
    assert {r.doc_id for r in good.collect()} == {1, 3}
    assert bad.count() == 2  # parquet-backed: corrupt-only aggregates allowed
    quarantined = [r["_corrupt_record"] for r in bad.collect()]
    assert "not json at all" in quarantined
    # the direct (non-landed) reader also splits correctly when the
    # query references data columns
    g2, b2 = read_documents_jsonl(spark, str(d))
    assert {r.doc_id for r in g2.collect()} == {1, 3}
    assert len(b2.collect()) == 2


def test_gzip_jsonl_readable(spark, tmp_path):
    d = tmp_path / "gz"
    d.mkdir()
    with gzip.open(d / "part-000.jsonl.gz", "wt") as f:
        f.write(json.dumps({"doc_id": 7, "text": "zipped", "lang": "en",
                            "source": "s", "n_chars": 6}) + "\n")
    good, _bad = read_documents_jsonl(spark, str(d))
    assert [r.doc_id for r in good.collect()] == [7]


@pytest.mark.slow
def test_operators_run_on_jsonl_documents(spark, tmp_path):
    """The JSONL read is schema-identical to the parquet table, so the
    registered operators run unchanged on it."""
    from doin_fine_ance__spark.llm.dedup import minhash_near_dups

    src = load_table(spark, SF, "documents")
    out = str(tmp_path / "docs")
    write_jsonl(src, out)
    good, _ = read_documents_jsonl(spark, out)
    via_jsonl = {
        (r.id_a, r.id_b)
        for r in minhash_near_dups(good.limit(200)).select("id_a", "id_b").collect()
    }
    via_parquet = {
        (r.id_a, r.id_b)
        for r in minhash_near_dups(src.limit(200)).select("id_a", "id_b").collect()
    }
    assert via_jsonl == via_parquet
