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


# --- llm/selection.py: budget selection, shuffle order, domain mix ------


def test_global_running_sum_matches_naive_window(spark):
    """Two-pass distributed prefix sum == single-window cumulative sum."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from doin_fine_ance__spark.llm.selection import global_running_sum

    rng = random.Random(7)
    rows = [(i, rng.randrange(1, 50), rng.random()) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w long, key double")
    order = [F.col("key"), F.col("id")]
    got = {
        r.id: r.cum
        for r in global_running_sum(df, "w", order, out_col="cum").collect()
    }
    naive = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.id: r.cum
        for r in df.withColumn("cum", F.sum("w").over(naive)).collect()
    }
    assert got == want


def test_global_running_sum_no_single_partition_window(spark):
    """The scale contract: no global-sort window in the physical plan.

    A single-partition Window (the naive cumulative-sum plan) shows up
    as a Window operator whose required ordering triggered a global
    Sort without a partitioning key. Ours must window only within
    _pid partitions after a range repartition."""
    from pyspark.sql import functions as F

    from doin_fine_ance__spark.llm.selection import global_running_sum

    df = spark.range(100).withColumn("w", F.lit(1))
    out = global_running_sum(df, "w", [F.col("id")], out_col="cum")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_pid" in plan  # window is partitioned, not global
    import re

    for m in re.finditer(r"Window \[", plan):
        window_line = plan[m.start() : plan.find("\n", m.start())]
        assert "_pid" in window_line, window_line


def test_budget_select_boundary(spark):
    """Selection keeps exactly the prefix whose inclusive sum <= budget."""
    from pyspark.sql import functions as F

    from doin_fine_ance__spark.llm.selection import budget_select

    df = spark.createDataFrame(
        [(i, 10) for i in range(10)], "doc_id long, n long"
    )
    kept = budget_select(df, "n", 35, [F.col("doc_id")], cum_col="cum").collect()
    assert sorted(r.doc_id for r in kept) == [0, 1, 2]  # 10+10+10 <= 35 < 40
    assert {r.doc_id: r.cum for r in kept} == {0: 10, 1: 20, 2: 30}


def test_shuffle_rank_is_permutation_and_seed_sensitive(spark):
    from doin_fine_ance__spark.llm.selection import shuffle_rank

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    r42 = {r.doc_id: r.shuffle_rank for r in shuffle_rank(df, seed=42).collect()}
    assert sorted(r42.values()) == list(range(1, 201))  # a true permutation
    again = {r.doc_id: r.shuffle_rank for r in shuffle_rank(df, seed=42).collect()}
    assert r42 == again  # reproducible
    r43 = {r.doc_id: r.shuffle_rank for r in shuffle_rank(df, seed=43).collect()}
    assert r42 != r43  # seed actually reshuffles


def test_domain_mix_deterministic_and_weight_bounds(spark):
    from doin_fine_ance__spark.llm.selection import domain_mix

    rows = [(i, "keep" if i % 2 else "drop") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    mixed = domain_mix(df, {"keep": 1.0, "drop": 0.0}, default_weight=0.5)
    kept = [r.doc_id for r in mixed.collect()]
    assert all(i % 2 == 1 for i in kept)  # weight 0 excludes everything
    assert len(kept) == 200  # weight 1 keeps everything
    twice = [r.doc_id for r in mixed.collect()]
    assert kept == twice


def test_segment_dedup_drops_planted_boilerplate(spark):
    """A licence-header segment shared by many docs must be cut from
    each, unique bodies must survive, and an all-boilerplate doc must
    fingerprint as md5('')."""
    import hashlib

    from doin_fine_ance__spark.llm.corpus import segment_dedup

    boiler = " ".join(f"legal{i}" for i in range(10))  # one exact segment
    rows = [(i, boiler + " " + " ".join(f"body{i}w{j}" for j in range(10)))
            for i in range(5)]
    rows.append((99, boiler))  # nothing but the boilerplate
    rows.append((100, " ".join(f"solo{j}" for j in range(15))))  # untouched
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in segment_dedup(df, max_docs=3).collect()}

    for i in range(5):
        r = out[i]
        assert (r.n_chunks, r.n_dropped) == (2, 1)
        body = " ".join(f"body{i}w{j}" for j in range(10))
        assert r.cleaned_md5 == hashlib.md5(body.encode()).hexdigest()
    assert (out[99].n_chunks, out[99].n_dropped) == (1, 1)
    assert out[99].cleaned_md5 == hashlib.md5(b"").hexdigest()
    r = out[100]
    assert (r.n_chunks, r.n_dropped) == (2, 0)  # 15 tokens -> 10+5 segments
    solo = " ".join(f"solo{j}" for j in range(15))
    assert r.cleaned_md5 == hashlib.md5(solo.encode()).hexdigest()


def test_duplicate_spans_overlapping_windows(spark):
    """A shared 8-token run is caught at EVERY alignment: two docs
    embedding the same span at different offsets both report exactly
    one duplicated window; a doc with no shared run reports zero; a
    doc shorter than the window emits no row."""
    from doin_fine_ance__spark.llm.corpus import duplicate_spans

    span = " ".join(f"shared{j}" for j in range(8))
    rows = [
        (1, span + " " + " ".join(f"a{j}" for j in range(4))),   # span at pos 0
        (2, " ".join(f"b{j}" for j in range(3)) + " " + span),   # span at pos 3
        (3, " ".join(f"c{j}" for j in range(12))),               # unique doc
        (4, "too short"),                                        # < 8 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in duplicate_spans(df, k=8, min_docs=2).collect()}

    assert set(out) == {1, 2, 3}  # doc 4 has no window
    # doc 1: 12 tokens -> 5 windows, only the exact span window is shared
    assert (out[1].n_windows, out[1].n_dup_windows) == (5, 1)
    assert out[1].dup_ratio == 1 / 5
    # doc 2: 11 tokens -> 4 windows; the span sits at the LAST alignment
    assert (out[2].n_windows, out[2].n_dup_windows) == (4, 1)
    assert (out[3].n_windows, out[3].n_dup_windows) == (5, 0)
    assert out[3].dup_ratio == 0.0


def test_remove_duplicate_spans_surgery(spark):
    """Covered-position semantics: two docs sharing an 8-token run at
    different offsets lose exactly those 8 tokens each (the union of
    overlapping duplicated windows, not per-window repeats); a unique
    doc is untouched; an all-duplicate doc fingerprints as md5('');
    a short doc passes through whole."""
    import hashlib

    from doin_fine_ance__spark.llm.corpus import remove_duplicate_spans

    span = " ".join(f"shared{j}" for j in range(8))
    uniq1 = " ".join(f"a{j}" for j in range(4))
    uniq2 = " ".join(f"b{j}" for j in range(3))
    rows = [
        (1, span + " " + uniq1),     # span at pos 0 -> keeps uniq1
        (2, uniq2 + " " + span),     # span at pos 3 -> keeps uniq2
        (3, span),                   # nothing but the span
        (4, " ".join(f"c{j}" for j in range(12))),  # unique, untouched
        (5, "too short"),            # < 8 tokens: no windows, kept whole
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_duplicate_spans(df, k=8, min_docs=2).collect()}

    assert (out[1].n_tokens, out[1].n_removed) == (12, 8)
    assert out[1].cleaned_md5 == hashlib.md5(uniq1.encode()).hexdigest()
    assert (out[2].n_tokens, out[2].n_removed) == (11, 8)
    assert out[2].cleaned_md5 == hashlib.md5(uniq2.encode()).hexdigest()
    assert (out[3].n_tokens, out[3].n_removed) == (8, 8)
    assert out[3].cleaned_md5 == hashlib.md5(b"").hexdigest()
    assert (out[4].n_tokens, out[4].n_removed) == (12, 0)
    assert (out[5].n_tokens, out[5].n_removed) == (2, 0)
    assert out[5].cleaned_md5 == hashlib.md5(b"too short").hexdigest()

    # emit_text variant rebuilds the surviving tokens
    txt = {r.doc_id: r.cleaned_text
           for r in remove_duplicate_spans(df, k=8, min_docs=2, emit_text=True).collect()}
    assert txt[1] == uniq1 and txt[2] == uniq2 and txt[3] == ""


def test_temperature_mix_rates_and_floor(spark):
    """Round-7 op: keep_rate_i = (n_min/n_i)^(1-alpha); the smallest
    source is kept in full (rate exactly 1.0), rates decrease with
    source size, and membership is the deterministic md5 draw (rerun
    → identical selection)."""
    import math

    from pyspark.sql import functions as F

    from doin_fine_ance__spark.llm.selection import temperature_mix

    rows = [(i, "big" if i < 400 else ("mid" if i < 480 else "small"))
            for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(docs, alpha=0.5, seed="t").persist()
    rates = {r["source"]: r["keep_rate"]
             for r in out.select("source", "keep_rate").distinct().collect()}
    assert rates["small"] == 1.0
    assert rates["mid"] == math.sqrt(20 / 80)
    assert rates["big"] == math.sqrt(20 / 400)
    assert rates["big"] < rates["mid"] < rates["small"]
    # the whole smallest source survives; selection is deterministic
    assert out.filter(F.col("source") == "small").count() == 20
    again = temperature_mix(docs, alpha=0.5, seed="t")
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )
    # alpha=1 keeps everything (rate 1.0 for every source)
    assert temperature_mix(docs, alpha=1.0, seed="t").count() == 500
    out.unpersist()


def test_token_shards_balanced_and_contiguous(spark):
    """Round-7 op: shards are contiguous in the chosen order and every
    shard except the last carries target ± (max_doc_tokens - 1)
    tokens; the last carries at most that."""
    import random

    from pyspark.sql import functions as F

    from doin_fine_ance__spark.llm.selection import token_shards

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 120)) for i in range(2000)]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    target, max_w = 1000, 120
    out = token_shards(docs, "n_tokens", target, [F.col("doc_id")]).collect()
    by_id = sorted(out, key=lambda r: r.doc_id)
    # contiguity: shard ids are non-decreasing in order
    shards = [r.shard for r in by_id]
    assert shards == sorted(shards)
    totals: dict[int, int] = {}
    for r in by_id:
        totals[r.shard] = totals.get(r.shard, 0) + r.n_tokens
    last = max(totals)
    for s, tot in totals.items():
        assert tot < target + max_w, (s, tot)
        if s != last:
            assert tot > target - max_w, (s, tot)
    assert sum(totals.values()) == sum(w for _, w in rows)


def test_temperature_mix_general_alpha_matches_python_reference(spark):
    """VERDICT r7 #7: the general-alpha path (F.pow) has no SQL oracle
    — libm pow carries last-ulp variance across engines — so pin it
    against a pure-Python reference instead. For alpha in {0.3, 0.7,
    1.0}: per-source keep_rate within 1 ulp x safety of
    (n_min/n_i)^(1-alpha), the selected id set identical except for
    docs whose md5 draw sits within that ulp band of the boundary
    (none here, and asserted so), and the realized per-source counts
    equal to the reference's."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from doin_fine_ance__spark.llm.selection import temperature_mix

    rows = [
        (i, "big" if i < 400 else ("mid" if i < 480 else "small"))
        for i in range(500)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    n = {"big": 400, "mid": 80, "small": 20}
    n_min = min(n.values())

    def u_of(doc_id: int, seed: str) -> float:
        h = hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:8]
        return int(h, 16) / float(1 << 32)

    for alpha in (0.3, 0.7, 1.0):
        rate_py = {s: (n_min / c) ** (1.0 - alpha) for s, c in n.items()}
        out = temperature_mix(docs, alpha=alpha, seed="t").persist()
        rates_spark = {
            r["source"]: r["keep_rate"]
            for r in out.select("source", "keep_rate").distinct().collect()
        }
        tol = {s: 4 * math.ulp(rate_py[s]) for s in rates_spark}
        for s, got in rates_spark.items():
            assert abs(got - rate_py[s]) <= tol[s], (alpha, s, got, rate_py[s])
        # reference selection with the same deterministic draw
        want = {
            i for i, s in rows if u_of(i, "t") < rate_py[s]
        }
        got_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
        boundary = {
            i
            for i, s in rows
            if abs(u_of(i, "t") - rate_py[s]) <= tol[s]
        }
        assert not boundary, (alpha, boundary)  # fixture stays off the edge
        assert got_ids == want, (alpha, len(got_ids ^ want))
        # expected-count sanity: realized counts match the reference's
        got_counts = {
            r["source"]: r["c"]
            for r in out.groupBy("source").agg(F.count("*").alias("c")).collect()
        }
        want_counts = {
            s: sum(1 for i, s2 in rows if s2 == s and i in want) for s in n
        }
        want_counts = {s: c for s, c in want_counts.items() if c}
        assert got_counts == want_counts, (alpha, got_counts, want_counts)
        # and they track expectation n_i * rate within 5 sigma
        for s, c in n.items():
            exp = c * rate_py[s]
            sigma = math.sqrt(max(c * rate_py[s] * (1 - rate_py[s]), 1e-9))
            assert abs(got_counts.get(s, 0) - exp) <= 5 * sigma + 1, (
                alpha, s, got_counts.get(s, 0), exp
            )
        out.unpersist()
