"""Realistic-vocabulary synthetic corpus with planted near-duplicates.

The driver's `documents` table draws every doc from a ~tiny shared
vocabulary, so distinct-token sets overlap far above char-shingle
similarity and the END-TO-END token-measure recall of the MinHash-LSH
pipeline measured there (~0.025, LSH_QUALITY_r07*.json) characterizes
the CORPUS, not the banding. Real web/text corpora look nothing like
that: vocabularies run 10k+ distinct words and random-pair token
Jaccard sits near 0. This module generates that shape (VERDICT r7
#5) — pseudo-word Zipf text over a >=10k-word vocabulary with
near-duplicate pairs planted at graded target token-set Jaccard —
so `tools/lsh_quality.py --realistic` can measure the pipeline's
end-to-end recall where the token and shingle measures agree.

Planting math: a variant made by replacing `n_repl` of a doc's `D`
distinct words with fresh out-of-doc words has token-set Jaccard
J = (D - n_repl) / (D + n_repl), so n_repl = round(D * (1-J)/(1+J))
hits the target exactly up to rounding. Replacement rewrites every
occurrence, so char shingles shift proportionally and the shingle
measure tracks the token measure — the property the small-vocab
corpus lacks.

Everything is seeded; the corpus is byte-identical across runs and
hash seeds (no set/dict iteration feeds the draw).
"""

from __future__ import annotations

import random

DEFAULT_LEVELS = (0.5, 0.6, 0.7, 0.8, 0.9, 0.95)


def realistic_corpus(
    spark,
    n_base: int = 1500,
    n_planted_per_level: int = 40,
    vocab_size: int = 20_000,
    words_per_doc: tuple[int, int] = (120, 220),
    levels: tuple[float, ...] = DEFAULT_LEVELS,
    seed: int = 8,
):
    """Build (docs DataFrame, planted pair list).

    Returns a `doc_id long, text string` frame of ``n_base`` base docs
    (ids 0..n_base-1) plus ``len(levels) * n_planted_per_level``
    planted variants (ids from n_base up), and a list of
    ``{"id_a", "id_b", "target_j"}`` dicts — id_a the base doc, id_b
    its variant at target token-set Jaccard ``target_j``.
    """
    rng = random.Random(seed)
    syllables = [c + v for c in "bcdfghjklmnprstvwz" for v in "aeiou"]
    vocab_set: set[str] = set()
    while len(vocab_set) < vocab_size:
        w = "".join(
            rng.choice(syllables) for _ in range(rng.randint(2, 4))
        )
        vocab_set.add(w)
    vocab = sorted(vocab_set)  # hash-seed-independent order
    # mild Zipf over a fixed vocab order: natural-text frequency shape
    weights = [1.0 / (i + 1) ** 0.7 for i in range(len(vocab))]

    docs: list[tuple[int, str]] = []
    for i in range(n_base):
        n = rng.randint(*words_per_doc)
        docs.append((i, " ".join(rng.choices(vocab, weights=weights, k=n))))

    planted: list[dict] = []
    srcs = rng.sample(range(n_base), len(levels) * n_planted_per_level)
    next_id = n_base
    si = 0
    for target_j in levels:
        for _ in range(n_planted_per_level):
            src = srcs[si]
            si += 1
            toks = docs[src][1].split()
            distinct = list(dict.fromkeys(toks))
            # floor, not round: actual J = (D-n)/(D+n) must land AT or
            # ABOVE the target level, so every pair labeled >= t really
            # is ground truth at threshold t
            n_repl = int(
                len(distinct) * (1.0 - target_j) / (1.0 + target_j)
            )
            replaced = rng.sample(distinct, n_repl)
            in_doc = set(distinct)
            mapping: dict[str, str] = {}
            used: set[str] = set()
            for w in replaced:
                while True:
                    cand = vocab[rng.randrange(len(vocab))]
                    if cand not in in_doc and cand not in used:
                        break
                mapping[w] = cand
                used.add(cand)
            docs.append(
                (next_id, " ".join(mapping.get(t, t) for t in toks))
            )
            planted.append(
                {"id_a": src, "id_b": next_id, "target_j": target_j}
            )
            next_id += 1
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return df, planted
