"""Distributed BPE training vs a driver-side reference implementation."""

from __future__ import annotations

from collections import Counter


def _ref_bpe(word_counts: dict[str, int], num_merges: int):
    """Textbook BPE on a word-frequency dict (Sennrich et al. 2016),
    max count with lexicographic tie-break — the oracle."""
    table = {tuple(list(w[:-1]) + [w[-1] + "</w>"]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, c in table.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new = {}
        for syms, c in table.items():
            s, i, res = list(syms), 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            new[tuple(res)] = new.get(tuple(res), 0) + c
        table = new
    return merges


CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quicker brown foxes jump over lazy dogs"),
    (2, "low lower lowest newer newest widow window"),
    (3, "the the the lower lower newer"),
]


def test_bpe_train_matches_reference(spark):
    from doin_fine_ance__spark.llm.tokenizer import bpe_train, word_counts

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wc = {r["word"]: r["count"] for r in word_counts(df).collect()}
    want = _ref_bpe(wc, 20)
    got = bpe_train(df, 20)
    assert got == want


def test_apply_bpe_round_trip_and_compression(spark):
    from doin_fine_ance__spark.llm.tokenizer import EOW, apply_bpe, bpe_train

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = bpe_train(df, 25)
    enc = {r.doc_id: r for r in apply_bpe(df, merges).collect()}

    for i, text in CORPUS:
        toks = enc[i].tokens
        # lossless: stripping EOW and joining reproduces the words
        rebuilt = "".join(toks).replace(EOW, " ").strip()
        assert rebuilt == text
        # merges compress: fewer tokens than characters, at least as
        # many as words
        n_words = len(text.split())
        assert n_words <= enc[i].n_tokens < len(text.replace(" ", ""))

    # frequent words collapse to single tokens after enough merges
    assert "the" + EOW in set(enc[0].tokens)


def test_apply_bpe_empty_and_unseen(spark):
    from doin_fine_ance__spark.llm.tokenizer import apply_bpe, bpe_train

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = bpe_train(df, 10)
    probe = spark.createDataFrame(
        [(0, ""), (1, None), (2, "zzzqqq unseen")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in apply_bpe(probe, merges).collect()}
    assert out[0].n_tokens == 0 and out[1].n_tokens == 0
    assert out[2].n_tokens >= 2  # unseen chars fall back to characters


def test_make_training_examples_matches_reference(spark):
    """Distributed concat-then-chunk equals the driver-side reference:
    per shard, md5-ordered docs concatenated with one <eos> each, cut
    into exact seq_len windows, last partial dropped."""
    import hashlib

    from doin_fine_ance__spark.llm.tokenizer import make_training_examples

    rows = [(i, [f"t{i}_{j}" for j in range(3 + i % 5)]) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    seq_len, n_shards = 16, 4

    got = {}
    out = make_training_examples(df, seq_len, n_shards=n_shards).collect()
    for r in out:
        assert len(r.tokens) == seq_len
        got[(r.shard, r.example_id)] = list(r.tokens)

    # driver-side reference
    def md5(i):
        return hashlib.md5(str(i).encode()).hexdigest()

    want = {}
    for shard in range(n_shards):
        docs = sorted(
            (r for r in rows if int(md5(r[0])[:4], 16) % n_shards == shard),
            key=lambda r: md5(r[0]),
        )
        stream = []
        for _, toks in docs:
            stream.extend(toks)
            stream.append("<eos>")
        for e in range(len(stream) // seq_len):
            want[(shard, e)] = stream[e * seq_len : (e + 1) * seq_len]

    assert got == want
    # every shard's stream is fully covered except the dropped tail
    assert len(got) == sum(len(v) == seq_len for v in want.values())
