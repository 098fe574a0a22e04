"""Corpus-preparation operators (llm/corpus.py): planted-fixture
behavior tests. Engine parity with the DuckDB oracles is covered for
ALL registered queries by tests/test_inventory_oracle.py; here we pin
the semantics the oracles can't see on the real (PII-free, prose-free)
testdata.
"""

from __future__ import annotations

from doin_fine_ance__spark.llm.corpus import (
    decontaminate,
    pack_sequences,
    redact_pii,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_filter_flags_degenerate_docs(spark):
    df = _docs(
        spark,
        [
            (1, "spam " * 50),  # one word repeated: max_word_frac = 1.0
            (2, " ".join(f"word{i:02d}" for i in range(50))),  # all distinct
            (3, "a b " * 25),  # mean word length 1 < 3
        ],
    )
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert not got[1]["keep"] and got[1]["max_word_frac"] == 1.0
    assert got[2]["keep"] and got[2]["distinct_word_frac"] == 1.0
    assert not got[3]["keep"] and got[3]["mean_word_len"] == 1.0
    assert got[2]["n_words"] == 50


def test_redact_pii_plants(spark):
    df = _docs(
        spark,
        [
            (1, "mail bob.smith+x@example.co.uk or call 555-123-4567 now"),
            (2, "two mails a@b.io c@d.org and dots 555.111.2222"),
            (3, "clean text, no pii at all"),
        ],
    )
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[1]["n_emails"] == 1 and got[1]["n_phones"] == 1
    assert got[1]["redacted"] == "mail <EMAIL> or call <PHONE> now"
    assert got[2]["n_emails"] == 2 and got[2]["n_phones"] == 1
    assert got[2]["redacted"] == "two mails <EMAIL> <EMAIL> and dots <PHONE>"
    assert got[3]["n_emails"] == 0 and got[3]["n_phones"] == 0
    assert got[3]["redacted"] == "clean text, no pii at all"


def test_decontaminate_planted_overlap(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    train = _docs(
        spark,
        [
            (1, "intro text then the quick brown fox appears"),  # shares 3-grams
            (2, "completely unrelated words nothing in common here"),
            (3, "quick brown fox jumps elsewhere"),  # shares 3-grams
        ],
    )
    got = {r["doc_id"]: r["n_shared"] for r in decontaminate(train, bench, n=3).collect()}
    # doc 1 shares 'the quick brown' and 'quick brown fox'
    assert got[1] == 2
    # doc 3 shares 'quick brown fox', 'brown fox jumps'
    assert got[3] == 2
    assert 2 not in got  # clean doc not flagged


def test_pack_sequences_greedy_invariants(spark):
    rows = [(i, "tok " * (10 + i % 7)) for i in range(200)]
    out = pack_sequences(_docs(spark, rows), budget=64, n_shards=4).collect()
    assert len(out) == 200
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, docs in by_shard.items():
        # reconstruct: pack_id must equal exclusive-prefix-sum // budget
        # under SOME doc ordering that is consistent with the pack ids;
        # verify against the operator's documented md5 ordering.
        import hashlib

        docs.sort(key=lambda r: hashlib.md5(str(r["doc_id"]).encode()).hexdigest())
        running = 0
        for r in docs:
            assert r["pack_id"] == running // 64, (shard, r)
            running += r["n_tokens"]
        # packs are contiguous from 0
        pids = sorted({r["pack_id"] for r in docs})
        assert pids == list(range(pids[-1] + 1))
