"""Measure MinHash-LSH quality against exact ground truth (round 7).

The near-dup pipeline (llm/dedup.py) verifies every LSH candidate with
an exact token-set Jaccard, so its output has NO false positives by
construction — the open quality question is RECALL: what fraction of
the true near-duplicate pairs does the (k, bands) banding surface as
candidates at all? This tool measures it instead of trusting the
S-curve on faith (the same "measure, don't guess" seam as
tools/pq_recall.py):

1. **Banding recall** — exact all-pairs char-5-gram shingle Jaccard
   (the measure the signatures actually sketch): what fraction of
   pairs with shingle-J >= threshold collide in at least one band.
   This is the recall LSH theory bounds, and the number that must be
   ~1.0 for the pipeline to be trustworthy.
2. **Banding S-curve** — the same exact shingle-J binned against the
   empirical candidate probability, next to the theoretical curve
   P(candidate) = 1 - (1 - s^r)^b with r = k/bands.
3. **End-to-end token-measure recall** — exact all-pairs token Jaccard
   (the whitespace-token measure `_verified_pairs` thresholds on) as
   ground truth. On REAL text the two measures agree closely; on the
   driver's synthetic corpus they diverge hard (small shared
   vocabulary makes distinct-token sets overlap far above shingle
   similarity), so this number is reported with that caveat — it
   measures the corpus, not the banding.

All-pairs is quadratic — this is an offline evidence tool for the
small SFs (500 docs at sf0.01 → 125k pairs; 5,000 docs at sf0.1 →
12.5M pairs, both fine on local[32]), never a production path.

Usage::

    python tools/lsh_quality.py [sf_dir] [--threshold 0.7] [--k 64]
        [--bands 16] [--out LSH_QUALITY_r07.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import col

from doin_fine_ance__spark.llm.dedup import (
    lsh_candidate_pairs,
    minhash_near_dups,
    minhash_signatures,
    release_token_stores,
)
from doin_fine_ance__spark.sources.testdata import load_table


def _token_sets(docs: DataFrame) -> DataFrame:
    """EXACTLY `_verified_pairs`' token expression (hashed whitespace
    tokens) — the ground truth must share the pipeline's measure."""
    return docs.select(
        col("doc_id"),
        F.array_distinct(
            F.transform(
                F.filter(F.split(F.lower(col("text")), r"\s+"), lambda x: x != ""),
                lambda x: F.xxhash64(x),
            )
        ).alias("tokens"),
    )


def _shingle_sets(docs: DataFrame, n: int = 5) -> DataFrame:
    """Distinct char-n-gram shingles of the whitespace-normalized
    lowered text — the SAME shingling minhash_signatures sketches
    (llm/dedup.py), built JVM-side for the exact all-pairs pass."""
    norm = F.regexp_replace(F.lower(col("text")), r"\s+", " ")
    shingles = F.when(
        F.length(norm) < n, F.array(norm)
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(norm) - (n - 1)),
            lambda i: norm.substr(i, F.lit(n)),
        )
    )
    return docs.select(
        col("doc_id"),
        F.array_distinct(F.transform(shingles, lambda s: F.xxhash64(s))).alias("sh"),
    )


def _all_pairs_jaccard(sets_df: DataFrame, set_col: str, out_col: str) -> DataFrame:
    a = sets_df.select(col("doc_id").alias("id_a"), col(set_col).alias("xa"))
    b = sets_df.select(col("doc_id").alias("id_b"), col(set_col).alias("xb"))
    inter = F.size(F.array_intersect("xa", "xb"))
    union = F.size("xa") + F.size("xb") - inter
    pairs = a.join(F.broadcast(b), col("id_a") < col("id_b"))
    # spread the quadratic verify over every core (the broadcast
    # nest-loop join inherits the scan's few input partitions)
    width = int(sets_df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return pairs.repartition(width).select(
        "id_a", "id_b", (inter.cast("double") / union).alias(out_col)
    )


def measure(
    spark,
    sf_dir: str,
    threshold: float,
    k: int,
    bands: int,
    docs: DataFrame | None = None,
) -> dict:
    if docs is None:
        docs = load_table(spark, sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()
    r = k // bands

    # ---- 1. end-to-end recall vs exact token-Jaccard ground truth ----
    truth = (
        _all_pairs_jaccard(_token_sets(docs), "tokens", "jaccard")
        .filter(col("jaccard") >= threshold)
        .select("id_a", "id_b")
        .persist()
    )
    n_truth = truth.count()
    found = (
        minhash_near_dups(docs, threshold=threshold, k=k, bands=bands)
        .select("id_a", "id_b")
        .persist()
    )
    n_found = found.count()
    n_false = found.join(truth, ["id_a", "id_b"], "left_anti").count()
    recall = (n_found - n_false) / n_truth if n_truth else None

    # ---- 2. banding S-curve + recall on shingle Jaccard ----
    # The signatures sketch CHAR-SHINGLE Jaccard; the banding's recall
    # guarantee holds for that measure. (On this synthetic corpus the
    # token measure diverges hard: documents draw from a small shared
    # vocabulary, so DISTINCT-token sets overlap far above their
    # shingle similarity — the end-to-end token-threshold recall below
    # is honest but dominated by that measure mismatch, not by banding
    # misses.)
    sh_j = _all_pairs_jaccard(_shingle_sets(docs), "sh", "s").persist()
    cands = lsh_candidate_pairs(
        minhash_signatures(docs, k=k), bands=bands, k=k
    ).withColumn("is_cand", F.lit(1))
    sh_truth = sh_j.filter(col("s") >= threshold)
    n_sh_truth = sh_truth.count()
    n_sh_found = sh_truth.join(
        cands.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
    ).count()
    banding_recall = n_sh_found / n_sh_truth if n_sh_truth else None
    binned = (
        sh_j.join(cands, ["id_a", "id_b"], "left")
        .select(
            F.floor(col("s") * 20).alias("bin20"),
            F.coalesce(col("is_cand"), F.lit(0)).alias("is_cand"),
        )
        .groupBy("bin20")
        .agg(F.count("*").alias("n_pairs"), F.sum("is_cand").alias("n_cand"))
        .orderBy("bin20")
        .collect()
    )
    curve = []
    for row in binned:
        lo = row["bin20"] / 20.0
        s_mid = lo + 0.025
        curve.append(
            {
                "s_lo": round(lo, 3),
                "n_pairs": row["n_pairs"],
                "candidate_rate": round(row["n_cand"] / row["n_pairs"], 4),
                "theory_rate": round(1.0 - (1.0 - s_mid**r) ** bands, 4),
            }
        )

    for df in (truth, found, sh_j):
        df.unpersist()
    release_token_stores()
    return {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "threshold": threshold,
        "k": k,
        "bands": bands,
        "rows_per_band": r,
        "n_token_truth_pairs": n_truth,
        "n_found_pairs": n_found,
        "false_positives": n_false,
        "token_measure_recall": round(recall, 4) if recall is not None else None,
        "n_shingle_truth_pairs": n_sh_truth,
        "n_shingle_found": n_sh_found,
        "banding_recall": (
            round(banding_recall, 4) if banding_recall is not None else None
        ),
        "s_curve": curve,
    }


def measure_realistic(
    spark,
    threshold: float = 0.8,
    k: int = 64,
    bands: int = 16,
    **corpus_kw,
) -> dict:
    """End-to-end pipeline recall on the realistic-vocabulary corpus
    (VERDICT r7 #5): >=10k-word vocabulary with near-dups planted at
    graded target token-set Jaccard (tools/lsh_corpus.py). On this
    shape the token and shingle measures agree, so the token-measure
    recall characterizes the BANDING + verification pipeline, not a
    corpus artifact — the number the small-vocab testdata could not
    produce honestly.

    Adds to the standard report: per-target-level CANDIDATE recall
    (did banding surface the planted pair at all) and
    ``planted_recall_at_threshold`` — the fraction of planted pairs
    at target J >= threshold the full pipeline returns, the floor the
    suite pins.
    """
    from tools.lsh_corpus import realistic_corpus

    docs, planted = realistic_corpus(spark, **corpus_kw)
    docs = docs.persist()
    rep = measure(
        spark, "synthetic:realistic-vocab", threshold, k, bands, docs=docs
    )
    # one candidate+verify pass with NO threshold filter: exact J for
    # every banding candidate, so per-level hits read off a dict
    cand = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dups(docs, threshold=0.0, k=k, bands=bands)
        .select("id_a", "id_b")
        .collect()
    }
    levels = sorted({p["target_j"] for p in planted})
    per_level = []
    for lvl in levels:
        pairs = [p for p in planted if p["target_j"] == lvl]
        hits = sum((p["id_a"], p["id_b"]) in cand for p in pairs)
        per_level.append(
            {
                "target_j": lvl,
                "n_planted": len(pairs),
                "candidate_recall": round(hits / len(pairs), 4),
            }
        )
    eligible = [p for p in planted if p["target_j"] >= threshold]
    found_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dups(docs, threshold=threshold, k=k, bands=bands)
        .select("id_a", "id_b")
        .collect()
    }
    n_hit = sum((p["id_a"], p["id_b"]) in found_pairs for p in eligible)
    rep["planted_per_level"] = per_level
    rep["planted_recall_at_threshold"] = (
        round(n_hit / len(eligible), 4) if eligible else None
    )
    rep["n_planted_eligible"] = len(eligible)
    rep["corpus"] = {"kind": "realistic-vocab", **corpus_kw}
    docs.unpersist()
    release_token_stores()
    return rep


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--out", default="LSH_QUALITY_r07.json")
    ap.add_argument(
        "--realistic",
        action="store_true",
        help="measure on the generated realistic-vocabulary corpus "
        "instead of sf_dir's documents table",
    )
    args = ap.parse_args()

    from doin_fine_ance__spark.session import get_spark

    spark = get_spark("lsh-quality")
    spark.sparkContext.setLogLevel("ERROR")
    if args.realistic:
        rep = measure_realistic(spark, args.threshold, args.k, args.bands)
    else:
        rep = measure(spark, args.sf_dir, args.threshold, args.k, args.bands)
    with open(args.out, "w") as f:
        json.dump(rep, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v for k, v in rep.items() if k != "s_curve"}))
    spark.stop()


if __name__ == "__main__":
    main()
