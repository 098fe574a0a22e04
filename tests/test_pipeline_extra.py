"""Operator-level tests for the round-9 pipeline additions: chunking,
fixed-point PageRank, and the count-min sketch. The registered queries
are oracle-checked by test_inventory_oracle; these pin the operator
CONTRACTS — invariants, pure-Python reference equality, partitioning
invariance, and the plan shapes the 100 TB story depends on."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from doin_fine_ance__spark.llm.corpus import chunk_documents
from doin_fine_ance__spark.operators.graph import pagerank_fixed_point
from doin_fine_ance__spark.operators.sketches import cms_build, cms_estimate

# ------------------------------------------------------------ chunking


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_overlap_invariants(spark):
    texts = [
        (0, " ".join(f"w{i}" for i in range(100))),  # multi-chunk
        (1, "one two three"),  # single short chunk
        (2, " ".join(f"x{i}" for i in range(32))),  # exactly one window
        (3, " ".join(f"y{i}" for i in range(33))),  # one full + one tail
        (4, "   "),  # zero tokens -> no chunks
        (5, ""),  # zero tokens -> no chunks
    ]
    out = chunk_documents(_docs(spark, texts), window=32, stride=24)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}

    by_doc = defaultdict(list)
    for (d, k), r in rows.items():
        by_doc[d].append(r)
    # zero-token docs emit nothing
    assert 4 not in by_doc and 5 not in by_doc
    for d, text in texts:
        toks = text.lower().split()
        n = len(toks)
        if n == 0:
            continue
        chunks = sorted(by_doc[d], key=lambda r: r.chunk_id)
        # chunk count formula
        assert len(chunks) == (n - 1) // 24 + 1
        covered = set()
        for r in chunks:
            want = toks[r.start_tok : r.start_tok + 32]
            assert r.chunk_text.split(" ") == want
            assert r.n_chunk_tokens == len(want)
            covered.update(range(r.start_tok, r.start_tok + r.n_chunk_tokens))
        # every token position is covered by at least one chunk
        assert covered == set(range(n))
        # consecutive full chunks overlap by exactly window - stride
        for a, b in zip(chunks, chunks[1:]):
            assert b.start_tok - a.start_tok == 24


def test_chunk_rejects_bad_params(spark):
    d = _docs(spark, [(0, "a b c")])
    with pytest.raises(ValueError):
        chunk_documents(d, window=8, stride=9)  # stride > window
    with pytest.raises(ValueError):
        chunk_documents(d, window=0, stride=0)


def test_chunk_plan_is_map_only(spark):
    """The operator itself must not shuffle — the only Exchange allowed
    in the registered query is its final orderBy (oracle comparison)."""
    d = _docs(spark, [(0, "a b c d e")])
    plan = (
        chunk_documents(d, window=4, stride=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ------------------------------------------------------------ pagerank


def _py_pagerank(edges, iterations=5, damping_pct=85, scale=10**9, ppm=10**6):
    w: dict = defaultdict(int)
    for u, v, wt in edges:
        w[(u, v)] += wt
    wtot: dict = defaultdict(int)
    for (u, _v), x in w.items():
        wtot[u] += x
    share = {(u, v): (x * ppm) // wtot[u] for (u, v), x in w.items()}
    nodes = {u for u, _ in w} | {v for _, v in w}
    base = (100 - damping_pct) * scale // 100
    r = {n: scale for n in nodes}
    for _ in range(iterations):
        inc: dict = defaultdict(int)
        for (u, v), s in share.items():
            inc[v] += (r[u] * s) // ppm
        r = {n: base + (damping_pct * inc.get(n, 0)) // 100 for n in nodes}
    return r


_GRAPH = [
    (1, 2, 3),
    (1, 3, 1),
    (2, 3, 5),
    (3, 1, 2),
    (2, 1, 1),
    (4, 1, 7),  # 4 is dangling (no in-edges feed it back)
    (1, 2, 2),  # duplicate edge: weights must accumulate
]


def test_pagerank_matches_python_reference_exactly(spark):
    e = spark.createDataFrame(_GRAPH, "src int, dst int, weight long")
    got = {r.node: r.rank_fp for r in pagerank_fixed_point(e).collect()}
    assert got == _py_pagerank(_GRAPH)


def test_pagerank_partitioning_invariant(spark):
    """Integer arithmetic makes the result bit-identical under any
    partitioning — the property float PageRank cannot give."""
    e1 = spark.createDataFrame(_GRAPH, "src int, dst int, weight long")
    e7 = e1.repartition(7)
    r1 = sorted(pagerank_fixed_point(e1).collect())
    r7 = sorted(pagerank_fixed_point(e7).collect())
    assert r1 == r7


def test_pagerank_mass_bounded(spark):
    """Floor rounding and dropped dangling mass only LOSE rank mass:
    total never exceeds n_nodes * scale."""
    e = spark.createDataFrame(_GRAPH, "src int, dst int, weight long")
    rows = pagerank_fixed_point(e, scale=10**9).collect()
    assert sum(r.rank_fp for r in rows) <= len(rows) * 10**9
    assert all(r.rank_fp >= 150_000_000 for r in rows)  # teleport floor


def test_pagerank_rejects_bad_damping(spark):
    e = spark.createDataFrame(_GRAPH, "src int, dst int, weight long")
    with pytest.raises(ValueError):
        pagerank_fixed_point(e, damping_pct=101)


def test_pagerank_30_iterations_bounded_plan_and_exact(spark):
    """VERDICT r9 #8: crawl-rank iteration counts (30+) must not blow
    up Catalyst planning. With periodic lineage truncation the FINAL
    plan holds at most materialize_every iterations of joins — its
    size is pinned well below the unbounded unroll — and the ranks
    still match the pure-Python fixed-point reference bit-for-bit."""
    e = spark.createDataFrame(_GRAPH, "src int, dst int, weight long")
    out = pagerank_fixed_point(e, iterations=30, materialize_every=8)
    plan = out._jdf.queryExecution().logical().toString()
    got = {r.node: r.rank_fp for r in out.collect()}
    assert got == _py_pagerank(_GRAPH, iterations=30)
    # plan of the truncated loop covers <= 8 iterations of lineage:
    # compare against a 8-iteration unmaterialized plan as the bound
    ref_plan = (
        pagerank_fixed_point(e, iterations=8, materialize_every=0)
        ._jdf.queryExecution().logical().toString()
    )
    assert len(plan) <= len(ref_plan)


def test_pagerank_safe_scale():
    from doin_fine_ance__spark.operators.graph import pagerank_safe_scale

    # the documented hub-absorbs-everything worst case stays in bigint
    for n in (25, 9_000, 90_000_000):
        s = pagerank_safe_scale(n)
        assert n * s * 10**6 < 2**63
        assert n * (s * 10) * 10**6 > 2**63 - 1  # largest such power of 10
    assert pagerank_safe_scale(90_000_000) == 10**5
    with pytest.raises(ValueError):
        pagerank_safe_scale(10**12, ppm=10**7)


# ------------------------------------------------------------ count-min


def _py_bucket(j: int, token: str, width: int) -> int:
    return int(hashlib.md5(f"{j}:{token}".encode()).hexdigest()[:8], 16) % width


def _py_cells(counts: dict, depth: int, width: int) -> dict:
    cells: dict = defaultdict(int)
    for tok, c in counts.items():
        for j in range(depth):
            cells[(j, _py_bucket(j, tok, width))] += c
    return dict(cells)


def test_cms_cells_match_python_reference(spark):
    toks = [f"t{i % 37}" for i in range(1000)] + ["hot"] * 300
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    got = {
        (r.j, r.bucket): r.cell
        for r in cms_build(df, "token", depth=4, width=64).collect()
    }
    counts: dict = defaultdict(int)
    for t in toks:
        counts[t] += 1
    assert got == _py_cells(counts, 4, 64)


def test_cms_raw_stream_and_preaggregated_builds_identical(spark):
    toks = [f"t{i % 11}" for i in range(500)]
    raw = spark.createDataFrame([(t,) for t in toks], "token string")
    agg = raw.groupBy("token").agg(F.count("*").alias("c"))
    a = sorted(cms_build(raw, "token", depth=4, width=64).collect())
    b = sorted(cms_build(agg, "token", count_col="c", depth=4, width=64).collect())
    assert a == b


def test_cms_estimate_one_sided_for_every_token(spark):
    """exact <= estimate for ALL tokens, not just the reported top-k —
    the count-min theorem, checked exhaustively on a skewed stream."""
    toks = [f"t{i % 97}" for i in range(2000)] + ["hot"] * 500
    raw = spark.createDataFrame([(t,) for t in toks], "token string")
    cells = cms_build(raw, "token", depth=4, width=64)
    exact = raw.groupBy("token").agg(F.count("*").cast("bigint").alias("exact"))
    est = cms_estimate(exact, cells, "token", depth=4, width=64)
    rows = est.collect()
    assert len(rows) == 98
    assert all(r.cms_estimate >= r.exact for r in rows)
    # width 64 >> 98 distinct tokens: the error stays well under the
    # eps*N worst case; generous deterministic ceiling
    n = len(toks)
    assert all(r.cms_estimate - r.exact <= n // 8 for r in rows)


def test_cms_estimate_broadcasts_cells(spark):
    toks = [(f"t{i}",) for i in range(100)]
    raw = spark.createDataFrame(toks, "token string")
    cells = cms_build(raw, "token", depth=4, width=64)
    plan = (
        cms_estimate(raw, cells, "token", depth=4, width=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------------------ bloom

from doin_fine_ance__spark.operators.sketches import (  # noqa: E402
    _BLOOM_BITS_PER_WORD,
    bloom_build,
    bloom_hits,
)


def _py_bloom_words(items, n_words, k):
    m = n_words * _BLOOM_BITS_PER_WORD
    words: dict = defaultdict(int)
    for it in items:
        for j in range(k):
            pos = int(hashlib.md5(f"{j}:{it}".encode()).hexdigest()[:8], 16) % m
            words[pos // _BLOOM_BITS_PER_WORD] |= 1 << (pos % _BLOOM_BITS_PER_WORD)
    return dict(words)


def test_bloom_words_match_python_reference(spark):
    items = [f"gram-{i}" for i in range(500)]
    df = spark.createDataFrame([(i,) for i in items], "item string")
    got = {r.word: r.bits for r in bloom_build(df, "item", n_words=64, k=3).collect()}
    assert got == _py_bloom_words(items, 64, 3)


def test_bloom_members_never_screened_out(spark):
    """One-sidedness, exhaustively: every inserted item must survive
    the pre-screen — the Bloom guarantee downstream exact checks rely
    on to stay correct (a screened-out member would be silently lost)."""
    items = [f"member-{i}" for i in range(1000)]
    df = spark.createDataFrame([(i,) for i in items], "item string")
    words = bloom_build(df, "item", n_words=64, k=3)
    hit = bloom_hits(df, words, "item", n_words=64, k=3)
    assert hit.filter(~F.col("bloom_hit")).count() == 0


def test_bloom_false_positive_rate_in_expected_band(spark):
    """Non-members mostly screened out: with n=500 inserted into
    64x62 = 3968 bits at k=3 the theoretical FP rate is
    (1 - e^(-3*500/3968))^3 ~ 3.1%; md5 buckets make the measured rate
    deterministic — pin a generous band around theory."""
    members = [f"member-{i}" for i in range(500)]
    outsiders = [f"outsider-{i}" for i in range(2000)]
    mdf = spark.createDataFrame([(i,) for i in members], "item string")
    odf = spark.createDataFrame([(i,) for i in outsiders], "item string")
    words = bloom_build(mdf, "item", n_words=64, k=3)
    fp = bloom_hits(odf, words, "item", n_words=64, k=3).filter(
        F.col("bloom_hit")
    ).count()
    assert 0 < fp / len(outsiders) < 0.10


def test_bloom_probe_broadcasts_word_table(spark):
    df = spark.createDataFrame([(f"i{i}",) for i in range(50)], "item string")
    words = bloom_build(df, "item", n_words=64, k=3)
    plan = (
        bloom_hits(df, words, "item", n_words=64, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ----------------------------------------------------- mergeable rollups

from doin_fine_ance__spark.operators.sketches import (  # noqa: E402
    cms_merge,
    hll_merge_estimate,
    hll_partials,
)


def test_cms_merge_of_partials_equals_whole_build(spark):
    """The rollup theorem, exactly: per-day partial sketches merged ==
    one sketch over the whole stream. Lets history answer heavy-hitter
    queries from daily sketch parquet without a rescan."""
    rows = [(f"d{i % 5}", f"t{i % 53}") for i in range(3000)]
    df = spark.createDataFrame(rows, "day string, token string")
    daily = cms_build(df, "token", depth=4, width=64, partition_cols=["day"])
    merged = sorted(cms_merge(daily).collect())
    whole = sorted(cms_build(df, "token", depth=4, width=64).collect())
    assert merged == whole
    # and the partials really are per-day (5 sketches' worth of cells)
    assert daily.select("day").distinct().count() == 5


def test_hll_rollup_merge_within_error_floor(spark):
    """Daily HLL partials unioned must estimate the TRUE overall
    distinct count (users active on many days collapse), within the
    sketch's error at lg_k=12 (~1.6% rsd; floored at 5%)."""
    rows = [(i % 7, i % 997) for i in range(20000)]
    df = spark.createDataFrame(rows, "day int, user long")
    parts = hll_partials(df, "user", ["day"], lg_k=12)
    assert parts.count() == 7
    est = hll_merge_estimate(parts).first()["approx_distinct"]
    assert abs(est - 997) / 997 <= 0.05


def test_hll_rollup_regroup_to_coarser_key(spark):
    """day -> week regroup: merged estimates per coarse group, each
    within the floor of its exact distinct."""
    rows = [(i % 14, i % (200 + (i % 14 >= 7) * 300)) for i in range(20000)]
    df = spark.createDataFrame(rows, "day int, user long")
    parts = hll_partials(df, "user", ["day"], lg_k=12).withColumn(
        "week", F.col("day") / 7 >= 1
    )
    ests = {
        r.week: r.approx_distinct
        for r in hll_merge_estimate(parts, ["week"]).collect()
    }
    exact = {
        r.week: r.x
        for r in df.withColumn("week", F.col("day") / 7 >= 1)
        .groupBy("week")
        .agg(F.countDistinct("user").alias("x"))
        .collect()
    }
    assert set(ests) == set(exact)
    for wk, ex in exact.items():
        assert abs(ests[wk] - ex) / ex <= 0.05


def test_cms_estimate_out_of_stream_and_null_tokens(spark):
    """ADVICE r9: the probe left-joins the cell table, so a token the
    stream never saw still gets an output row with estimate 0 (empty
    buckets count as 0 — the CMS contract), and a NULL token estimates
    0 via the null-propagating bucket hash instead of colliding into
    str(j)'s bucket."""
    stream = spark.createDataFrame(
        [("alpha",)] * 5 + [("beta",)] * 2, "token string"
    )
    cells = cms_build(stream, "token", depth=4, width=64)
    probes = spark.createDataFrame(
        [("alpha",), ("never_seen_token",), (None,)], "token string"
    )
    got = {r["token"]: r["cms_estimate"]
           for r in cms_estimate(probes, cells, "token", depth=4, width=64).collect()}
    assert len(got) == 3  # every probe row survives, incl. NULL
    assert got["alpha"] >= 5
    assert got["never_seen_token"] == 0
    assert got[None] == 0


def test_cms_build_drops_null_tokens(spark):
    stream = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,)], "token string"
    )
    cells = cms_build(stream, "token", depth=2, width=16)
    # only 'a' contributes: every cell is exactly 2, none reflects NULLs
    assert sorted(r["cell"] for r in cells.collect()) == [2, 2]


def test_cms_estimate_rejects_colliding_candidate_columns(spark):
    import pytest as _pytest

    stream = spark.createDataFrame([("a",)], "token string")
    cells = cms_build(stream, "token", depth=2, width=16)
    bad = spark.createDataFrame([("a", 1)], "token string, __cms_j int")
    with _pytest.raises(ValueError, match="__cms_j"):
        cms_estimate(bad, cells, "token", depth=2, width=16)


def test_bloom_null_items_dropped_and_never_hit(spark):
    """ADVICE r9: NULL reference items set no bits; NULL candidates
    never pass the pre-screen (position hash null-propagates)."""
    import pytest as _pytest

    ref = spark.createDataFrame([("x",), (None,), ("y",)], "item string")
    words = bloom_build(ref, "item", n_words=64, k=3)
    cand = spark.createDataFrame([("x",), (None,)], "item string")
    got = {r["item"]: r["bloom_hit"]
           for r in bloom_hits(cand, words, "item", n_words=64, k=3).collect()}
    assert got == {"x": True, None: False}
    bad = spark.createDataFrame([("x", 0)], "item string, __bloom_pos int")
    with _pytest.raises(ValueError, match="__bloom_pos"):
        bloom_hits(bad, words, "item", n_words=64, k=3)
