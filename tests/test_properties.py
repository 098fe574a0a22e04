"""Property-based invariants (hypothesis) for the core operators.

The reference ships no property tests (SURVEY §5); these pin the
guarantees the engine's dedup/pagination machinery must hold for ANY
input, not just the finance fixtures — the kind of invariants that
keep a 100 TB run trustworthy when the data drifts.

Strategy sizes are small (Spark job per example is expensive);
`max_examples` is tuned so the whole module stays under ~2 min.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from doin_fine_ance__spark.operators.dedup import (
    latest_wins,
    reconnection_dedup,
    rownum_disambiguate,
)
from doin_fine_ance__spark.operators.pagination import paginate

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, recency, payload) rows; keys/recency from tiny domains to force
# collisions, payload to detect row mixups
row = st.tuples(
    st.integers(min_value=0, max_value=4),
    st.integers(min_value=0, max_value=6),
    st.integers(min_value=0, max_value=99),
)


@given(rows=st.lists(row, min_size=1, max_size=25))
@settings(**SETTINGS)
def test_latest_wins_properties(spark, rows):
    df = spark.createDataFrame(rows, "k long, rec long, payload long")
    out = latest_wins(df, ["k"], [df.rec.desc(), df.payload.desc()]).collect()
    got = {r.k: (r.rec, r.payload) for r in out}
    # exactly one row per distinct key
    assert len(out) == len({k for k, _, _ in rows})
    # and it is the max (rec, payload) row for that key
    for k in got:
        assert got[k] == max((rec, p) for kk, rec, p in rows if kk == k)


@given(rows=st.lists(row, min_size=1, max_size=25))
@settings(**SETTINGS)
def test_rownum_disambiguate_is_a_bijection(spark, rows):
    df = spark.createDataFrame(rows, "k long, rec long, payload long")
    out = rownum_disambiguate(df, ["k"], [df.rec, df.payload, df.k]).collect()
    # ordinals within each key group are exactly 1..n
    by_key: dict[int, list[int]] = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r.row_num)
    for k, nums in by_key.items():
        assert sorted(nums) == list(range(1, len(nums) + 1)), (k, nums)
    # no rows created or dropped
    assert len(out) == len(rows)


# reconnection rows: (logical_id, account, imported, payload)
recon_row = st.tuples(
    st.integers(min_value=0, max_value=2),
    st.sampled_from(["acct_a", "acct_b"]),
    st.integers(min_value=0, max_value=5),
    st.integers(min_value=0, max_value=99),
)


@given(rows=st.lists(recon_row, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_reconnection_dedup_guarantees(spark, rows):
    """The stg_simplefin.sql:65-78 contract, for arbitrary inputs:
    one surviving account per logical transaction (the most recently
    imported; ties break by account name), and EVERY row of that
    account survives (within-account duplicates are legitimate)."""
    df = spark.createDataFrame(rows, "lid long, acct string, imported long, payload long")
    out = reconnection_dedup(df, ["lid"], "acct", "imported").collect()

    for lid in {r[0] for r in rows}:
        group_last = {}
        for l, a, imp, _ in rows:
            if l == lid:
                group_last[a] = max(group_last.get(a, -1), imp)
        # expected winner: max(last_import), tiebreak smaller acct name
        winner = min(
            (a for a in group_last), key=lambda a: (-group_last[a], a)
        )
        surviving = [(r.acct, r.imported, r.payload) for r in out if r.lid == lid]
        expected = [(a, i, p) for l, a, i, p in rows if l == lid and a == winner]
        assert sorted(surviving) == sorted(expected), (lid, winner)


@given(
    rows=st.lists(row, min_size=0, max_size=30, unique_by=lambda r: (r[1], r[2])),
    page_size=st.integers(min_value=1, max_value=7),
)
@settings(**SETTINGS)
def test_pagination_partitions_the_order(spark, rows, page_size):
    """Pages tile the totally-ordered result: no overlap, no gap, order
    preserved across page boundaries."""
    df = spark.createDataFrame(rows, "k long, rec long, payload long")
    sort = [df.rec.asc(), df.payload.asc()]
    expect = sorted((rec, p) for _, rec, p in rows)
    got: list[tuple[int, int]] = []
    offset = 0
    while True:
        page = paginate(df, sort, limit=page_size, offset=offset).collect()
        got.extend((r.rec, r.payload) for r in page)
        if len(page) < page_size:
            break
        offset += page_size
    assert got == expect


# --- corpus-prep operators (llm/corpus.py) -------------------------------

word = st.sampled_from(["alpha", "beta", "gamma", "delta", "x", "longishword"])
doc_text = st.lists(word, min_size=0, max_size=30).map(" ".join)


@given(docs=st.lists(doc_text, min_size=1, max_size=12))
@settings(**SETTINGS)
def test_pack_sequences_partitions_the_corpus(spark, docs):
    """Every doc lands in exactly one (shard, pack); pack_id matches the
    concat-then-chunk spec exactly (exclusive token prefix ÷ budget in
    md5 order within the shard); n_tokens matches the whitespace
    tokenizer. Pack ids may legitimately skip an index when a single
    document longer than the budget spans whole chunks — hypothesis
    found that case, so the test mirrors the spec instead of asserting
    contiguity."""
    import hashlib

    from doin_fine_ance__spark.llm.corpus import pack_sequences

    budget = 16
    rows = [(i, t) for i, t in enumerate(docs)]
    out = pack_sequences(
        spark.createDataFrame(rows, "doc_id long, text string"), budget=budget, n_shards=2
    ).collect()
    assert sorted(r.doc_id for r in out) == [i for i, _ in rows]
    for r in out:
        assert r.n_tokens == len(docs[r.doc_id].split())
    # independent spec: md5-order each shard, exclusive prefix // budget
    expected: dict[int, int] = {}
    by_shard: dict[int, list[int]] = {}
    for i, _ in rows:
        md5 = hashlib.md5(str(i).encode()).hexdigest()
        by_shard.setdefault(int(md5[:4], 16) % 2, []).append(i)
    for members in by_shard.values():
        members.sort(key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
        prefix = 0
        for i in members:
            expected[i] = prefix // budget
            prefix += len(docs[i].split())
    assert {r.doc_id: r.pack_id for r in out} == expected


@given(docs=st.lists(doc_text, min_size=1, max_size=10))
@settings(**SETTINGS)
def test_repetition_stats_bounds_and_totals(spark, docs):
    from doin_fine_ance__spark.llm.corpus import repetition_stats

    rows = [(i, t) for i, t in enumerate(docs) if t.strip()]
    if not rows:
        return
    out = repetition_stats(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()
    assert {r.doc_id for r in out} == {i for i, _ in rows}
    for r in out:
        assert 0.0 < r.max_word_frac <= 1.0
        assert 0.0 < r.distinct_word_frac <= 1.0
        assert r.n_words == len(dict(rows)[r.doc_id].split())


@given(docs=st.lists(st.text(alphabet=" abc@.-0123456789", max_size=40), min_size=1, max_size=8))
@settings(**SETTINGS)
def test_redact_pii_is_idempotent(spark, docs):
    """Redacting twice equals redacting once — placeholders never
    re-match the patterns."""
    from doin_fine_ance__spark.llm.corpus import redact_pii

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = redact_pii(df).select("doc_id", "redacted")
    twice = redact_pii(
        once.withColumnRenamed("redacted", "text")
    ).select("doc_id", "redacted")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


# documents as small token sequences over a tiny vocabulary, so random
# inputs genuinely produce cross-doc repeated segments
_doc = st.lists(
    st.sampled_from([f"w{i}" for i in range(6)]), min_size=1, max_size=12
)


@given(docs=st.lists(_doc, min_size=1, max_size=10))
@settings(**SETTINGS)
def test_segment_dedup_matches_bruteforce(spark, docs):
    """segment_dedup == a driver-side brute-force re-implementation:
    same chunking, same distinct-doc threshold, same rebuild."""
    import hashlib
    from collections import defaultdict

    from doin_fine_ance__spark.llm.corpus import segment_dedup

    seg, max_docs = 3, 1
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]

    # brute force
    chunks = {}  # doc -> [chunk str]
    for i, toks in enumerate(docs):
        chunks[i] = [" ".join(toks[s : s + seg]) for s in range(0, len(toks), seg)]
    docs_per_chunk = defaultdict(set)
    for i, cs in chunks.items():
        for c in cs:
            docs_per_chunk[c].add(i)
    want = {}
    for i, cs in chunks.items():
        kept = [c for c in cs if len(docs_per_chunk[c]) <= max_docs]
        want[i] = (
            len(cs),
            len(cs) - len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_chunks, r.n_dropped, r.cleaned_md5)
        for r in segment_dedup(df, seg_tokens=seg, max_docs=max_docs).collect()
    }
    assert got == want


@given(docs=st.lists(_doc, min_size=1, max_size=10))
@settings(**SETTINGS)
@pytest.mark.slow
def test_duplicate_spans_and_scrub_match_bruteforce(spark, docs):
    """duplicate_spans AND remove_duplicate_spans == driver-side
    brute-force over the same sliding windows: same window hashing,
    same cross-doc threshold, same coverage union and rebuild."""
    import hashlib
    from collections import defaultdict

    from doin_fine_ance__spark.llm.corpus import duplicate_spans, remove_duplicate_spans

    k, min_docs = 3, 2
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]

    # brute force
    wins = {}  # doc -> [(pos, window str)]
    for i, toks in enumerate(docs):
        wins[i] = [
            (p, " ".join(toks[p : p + k])) for p in range(len(toks) - k + 1)
        ]
    docs_per_win = defaultdict(set)
    for i, ws in wins.items():
        for _, wstr in ws:
            docs_per_win[wstr].add(i)
    want_stats = {}
    want_scrub = {}
    for i, toks in enumerate(docs):
        dup = [(p, w) for p, w in wins[i] if len(docs_per_win[w]) >= min_docs]
        if wins[i]:
            n = len(wins[i])
            want_stats[i] = (n, len(dup), len(dup) / n)
        covered = set()
        for p, _ in dup:
            covered.update(range(p, p + k))
        kept = [t for j, t in enumerate(toks) if j not in covered]
        want_scrub[i] = (
            len(toks),
            len(toks) - len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got_stats = {
        r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_ratio)
        for r in duplicate_spans(df, k=k, min_docs=min_docs).collect()
    }
    assert got_stats == want_stats
    got_scrub = {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_md5)
        for r in remove_duplicate_spans(df, k=k, min_docs=min_docs).collect()
    }
    assert got_scrub == want_scrub
