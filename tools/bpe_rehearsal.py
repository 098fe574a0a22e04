"""BPE training scale rehearsal (VERDICT r4 #4 / r5 #4).

Trains 1000 merges with the batched trainer and with the
one-merge-per-job baseline on the same corpus, recording wall time and
driver round-trips (pair-count jobs) to BPE_r06.json. The corpus is a
deterministic Zipf pseudo-text at the sf1 word-table shape (~3k
distinct words — the merge loop's cost scales with the DISTINCT word
table, not the corpus, so this is the honest rehearsal axis); the
generated ``documents`` tables are unusable here: their ~31-word
vocabulary exhausts all merges long before 1000.

Usage: python tools/bpe_rehearsal.py [--merges 1000] [--docs 5000]
       [--out BPE_r06.json] [--skip-sequential]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(spark, n_docs: int, words_per_doc: int = 200):
    rng = random.Random(7)
    syll = [c + v for c in "bcdfglmnprstvz" for v in "aeiou"]
    words = sorted(
        {"".join(rng.choice(syll) for _ in range(rng.randint(1, 4)))
         for _ in range(4000)}
    )
    weights = [1.0 / (i + 1) for i in range(len(words))]
    docs = [
        (i, " ".join(rng.choices(words, weights=weights, k=words_per_doc)))
        for i in range(n_docs)
    ]
    return spark.createDataFrame(docs, "doc_id long, text string"), len(words)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--merges", type=int, default=1000)
    ap.add_argument("--docs", type=int, default=5000)
    ap.add_argument("--out", default="BPE_r06.json")
    ap.add_argument("--skip-sequential", action="store_true")
    args = ap.parse_args()

    from doin_fine_ance__spark.llm.tokenizer import bpe_train
    from doin_fine_ance__spark.session import get_spark

    spark = get_spark("bpe-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    df, vocab = build_corpus(spark, args.docs)
    df = df.persist()
    df.count()

    runs = {}
    st_b: dict = {}
    t0 = time.time()
    merges_b = bpe_train(df, args.merges, _stats=st_b)
    runs["batched"] = {
        "wall_sec": round(time.time() - t0, 1),
        "merges": st_b["merges"],
        "pair_count_jobs": st_b["pair_count_jobs"],
        "mean_batch_width": round(st_b["merges"] / st_b["pair_count_jobs"], 2),
    }
    print("batched:", runs["batched"], flush=True)

    if not args.skip_sequential:
        st_s: dict = {}
        t0 = time.time()
        merges_s = bpe_train(df, args.merges, max_batch=1, _stats=st_s)
        runs["sequential"] = {
            "wall_sec": round(time.time() - t0, 1),
            "merges": st_s["merges"],
            "pair_count_jobs": st_s["pair_count_jobs"],
        }
        print("sequential:", runs["sequential"], flush=True)
        assert merges_b == merges_s, "batched/sequential merge sequences diverge"
        runs["sequences_identical"] = True

    payload = {
        "corpus": {"docs": args.docs, "words_per_doc": 200,
                   "distinct_vocab": vocab},
        "requested_merges": args.merges,
        "runs": runs,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
