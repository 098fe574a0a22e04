"""Distributed BPE tokenizer training — learn the vocabulary FROM the
corpus, the step a training-data pipeline runs between corpus prep and
tokenization (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units"; the GPT-2/Llama tokenizers are this
algorithm at scale).

Scale shape — the key structural fact standard BPE trainers exploit:
merges operate on the WORD-FREQUENCY TABLE, not the corpus. One
corpus-sized shuffle builds ``(word, count)`` (Zipf makes the distinct
vocabulary orders of magnitude smaller than the token stream); every
merge iteration then runs on that small table:

  1. pair counts: explode each distinct word's adjacent symbol pairs,
     weight by word count — partial-agg shuffle over the word table;
  2. best pair: max count, ties broken lexicographically (smallest
     (a, b)) so the merge sequence is deterministic under any
     partitioning — ``TakeOrderedAndProject``, one row to the driver;
  3. apply: map-only Arrow pass rewriting symbol arrays, lineage
     truncated per round (the connected-components discipline).

At 100 TB the word table is still millions of rows, not trillions —
iterations cost seconds each, and the number of iterations is the
vocab size you asked for, independent of corpus size. Words are
space-split and end-of-word is marked with the customary ``</w>``
sentinel so merges never cross word boundaries.

``apply_bpe`` encodes a corpus with a learned merge list: merges are
ranked, each word greedily applies the lowest-rank applicable merge
until none applies (exact BPE inference), memoized per distinct word
inside each Arrow batch. Map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit, pandas_udf

from ..operators.checkpoint import materialize

EOW = "</w>"


def word_counts(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """Corpus → (word, count) — the ONE corpus-sized shuffle."""
    t = F.coalesce(col(text_col), lit(""))
    if lowercase:
        t = F.lower(t)
    words = F.filter(F.split(t, r"\s+"), lambda w: w != "")
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("count"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(word, count) → (symbols array<string>, count): characters plus
    the end-of-word sentinel on the final character."""
    n = F.length("word")
    # one symbol per character; the end-of-word sentinel rides on the
    # last one so merges never cross word boundaries
    chars = F.transform(
        F.sequence(lit(1), n),
        lambda i: F.when(i == n, F.concat(F.substring(col("word"), i, 1), lit(EOW))).otherwise(
            F.substring(col("word"), i, 1)
        ),
    )
    return words.select(chars.alias("symbols"), "count")


def bpe_train(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    checkpoint_mode: str | None = None,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a corpus. Returns the
    ordered merge list [(left, right), ...] — deterministic: max pair
    count, ties to the lexicographically smallest pair."""
    wc = word_counts(docs, text_col)
    table = materialize(_initial_symbols(wc), checkpoint_mode)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = table.select(
            F.explode(
                F.zip_with(
                    F.slice("symbols", 1, F.size("symbols") - 1),
                    F.slice("symbols", 2, F.size("symbols") - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p"),
            "count",
        )
        best = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("count").alias("n"))
            .orderBy(col("n").desc(), col("a"), col("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break  # every word is a single symbol: nothing left to merge
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        table = materialize(
            table.select(_merge_udf(a, b)(col("symbols")).alias("symbols"), "count"),
            checkpoint_mode,
        )
    return merges


def _merge_udf(a: str, b: str):
    """Pandas UDF applying ONE merge (a, b) → ab to symbol arrays.

    Factory (not a loop-local closure) so each iteration's UDF binds
    its own pair by value — immune to late-binding even if execution
    were deferred."""
    merged = a + b

    @pandas_udf("array<string>")
    def _apply(sym_col):
        import pandas as pd

        out = []
        for syms in sym_col:
            s = list(syms)
            i, res = 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return _apply


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Encode a corpus with a learned merge list → (id, tokens
    array<string>, n_tokens). Exact BPE inference: each word greedily
    applies the lowest-rank applicable merge until none applies;
    per-batch memoization over distinct words (Zipf again). Map-only."""
    rank = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def _encode(texts):
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is not None:
                return got
            s = list(w[:-1]) + [w[-1] + EOW] if w else []
            while len(s) > 1:
                cand = [
                    (rank[(s[i], s[i + 1])], i)
                    for i in range(len(s) - 1)
                    if (s[i], s[i + 1]) in rank
                ]
                if not cand:
                    break
                r, i = min(cand)
                a, b = merges[r]
                out = []
                j = 0
                while j < len(s):
                    if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                        out.append(a + b)
                        j += 2
                    else:
                        out.append(s[j])
                        j += 1
                s = out
            cache[w] = s
            return s

        res = []
        for t in texts:
            t = (t or "")
            if lowercase:
                t = t.lower()
            toks: list[str] = []
            for w in t.split():
                toks.extend(enc_word(w))
            res.append(toks)
        return pd.Series(res)

    return docs.select(
        col(id_col),
        _encode(col(text_col)).alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens").cast("bigint"))


def make_training_examples(
    tokens: DataFrame,
    seq_len: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    eos: str = "<eos>",
) -> DataFrame:
    """Tokenized docs → fixed-length training examples (GPT-style
    concat-then-chunk): documents are shuffled deterministically into
    shards (md5, the pack_sequences permutation), each shard's token
    streams are concatenated with one ``eos`` after every document,
    and the stream is cut into consecutive ``seq_len`` windows; the
    final partial window of each shard is dropped (standard practice).
    Returns ``(shard, example_id, tokens)`` with every row exactly
    ``seq_len`` tokens.

    Scale shape — no shard-sized group ever materializes: per-DOC
    start offsets come from a prefix-sum window over doc-level rows
    (partitioned by shard, parallelism = n_shards, same discipline as
    pack_sequences); then tokens posexplode to absolute positions and
    examples assemble by ``(shard, position ÷ seq_len)`` — each group
    is exactly seq_len tokens, so the assembly shuffle is uniform by
    construction. The token-level explode is the honest cost of
    materializing training data; everything else is doc-level.
    """
    from pyspark.sql import Window

    key = F.md5(col(id_col).cast("string"))
    with_eos = F.concat(col(tokens_col), F.array(lit(eos)))
    base = tokens.select(
        col(id_col),
        with_eos.alias("_t"),
        (F.conv(F.substring(key, 1, 4), 16, 10).cast("bigint") % n_shards)
        .cast("int")
        .alias("shard"),
        key.alias("_ord"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_ord")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(F.size("_t")).over(w), lit(0).cast("bigint"))
    # the offset MUST resolve before the explode: in a single select
    # Spark plans the Generate under the Window, making the prefix sum
    # run over token rows instead of document rows
    offsets = base.select("shard", start.alias("_start"), "_t")
    placed = offsets.select(
        "shard",
        "_start",
        F.posexplode("_t").alias("_pos", "_tok"),
    ).select(
        "shard",
        ((col("_start") + col("_pos")) / seq_len).cast("bigint").alias("example_id"),
        (col("_start") + col("_pos")).alias("_abs"),
        "_tok",
    )
    assembled = placed.groupBy("shard", "example_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_abs", "_tok"))),
            lambda x: x["_tok"],
        ).alias("tokens")
    )
    return assembled.filter(F.size("tokens") == seq_len)
