"""Approximate nearest neighbor search over embedding columns.

Two tiers (SURVEY §7 phase 6 / north star):

- brute-force cosine top-k — the correctness baseline
  (queries/llm_ops.py::s_cosine_topk_bruteforce, oracle-checked);
- random-hyperplane LSH buckets — the scale path: each vector maps to
  a small bit-signature bucket; a query probes only its bucket
  (optionally ± multiprobe flips), turning a full-corpus scan into a
  bucket lookup. At 100 TB the bucketed table is written
  partitioned-by-bucket so a probe is a partition-pruned read.

Hyperplanes are deterministic (random.Random(4242) gaussians), so
bucket assignments are stable across runs — signatures can be
precomputed once and reused incrementally.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit


def _planes(dim: int, n_planes: int, seed: int = 4242) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        lit(0.0),
        lambda acc, v: acc + v,
    )


def hyperplane_buckets(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach the LSH bucket id (int of n_planes sign bits) per vector."""
    planes = _planes(dim, n_planes)
    bucket = lit(0)
    for i, p in enumerate(planes):
        plane_arr = F.array(*[lit(v) for v in p])
        bit = (_dot(col(vec_col), plane_arr) >= 0).cast("int")
        bucket = bucket + (bit * lit(1 << i))
    return embeddings.withColumn("bucket", bucket.cast("int"))


def ann_topk_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 2,
) -> DataFrame:
    """Top-k by cosine among vectors in the query's LSH bucket
    (+ single-bit-flip probes up to `multiprobe` planes).

    The candidate set is the union of 1 + multiprobe buckets — constant
    work per query regardless of corpus size once the bucketed table is
    partition-pruned.
    """
    dim = len(query_vec)
    planes = _planes(dim, n_planes)
    qbits = [
        1 if sum(q * p for q, p in zip(query_vec, plane)) >= 0 else 0
        for plane in planes
    ]
    qbucket = sum(b << i for i, b in enumerate(qbits))
    probe_buckets = [qbucket] + [qbucket ^ (1 << i) for i in range(min(multiprobe, n_planes))]

    bucketed = hyperplane_buckets(embeddings, dim, n_planes, id_col, vec_col)
    qarr = F.array(*[lit(float(v)) for v in query_vec])
    qnorm = sum(v * v for v in query_vec) ** 0.5
    scored = bucketed.filter(col("bucket").isin(probe_buckets)).select(
        id_col,
        "bucket",
        (
            _dot(col(vec_col), qarr)
            / (F.sqrt(_dot(col(vec_col), col(vec_col))) * lit(qnorm))
        ).alias("cosine"),
    )
    return scored.orderBy(col("cosine").desc(), col(id_col)).limit(k)
