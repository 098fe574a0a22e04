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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit, pandas_udf
from pyspark.sql.types import IntegerType


def _planes(dim: int, n_planes: int, seed: int = 4242) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        lit(0.0),
        lambda acc, v: acc + v,
    )


def _plane_matrix(dim: int, n_planes: int, quantize: bool = False):
    """(n_planes, dim) float64 plane matrix; ``quantize`` rounds the
    gaussians to integer-valued doubles (×1000) so plane·vector dots on
    likewise-quantized vectors are exact integers — sign bits then
    reproduce bit-for-bit in any engine/accumulation order (the same
    ×1000 trick the cosine oracles use)."""
    import numpy as np

    P = np.array(_planes(dim, n_planes), dtype=np.float64)
    return np.round(P * 1000.0) if quantize else P


def _bucket_of(vectors, P):
    """numpy (n, dim) × plane matrix → int bucket ids (sign bits packed)."""
    import numpy as np

    signs = (vectors @ P.T) >= 0  # (n, n_planes)
    weights = (1 << np.arange(P.shape[0])).astype(np.int64)
    return (signs @ weights).astype(np.int32)


def hyperplane_buckets(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize_planes: bool = False,
) -> DataFrame:
    """Attach the LSH bucket id (int of n_planes sign bits) per vector.

    Index-build path: one Arrow-vectorized pandas UDF doing the whole
    (batch × planes) sign matrix in a single numpy matmul. The earlier
    JVM formulation (n_planes chained aggregate/zip_with folds with the
    plane values inlined as n_planes×dim literals) ran interpreted AND
    bloated the plan at high dim; the plane matrix now travels once in
    the UDF closure. Query-side bucket ids use the same numpy matmul
    (:func:`ann_topk_lsh`), so corpus and query bucketing agree
    bit-for-bit.
    """
    import numpy as np

    P = _plane_matrix(dim, n_planes, quantize_planes)

    @pandas_udf(IntegerType())
    def _bucket_udf(vecs: pd.Series) -> pd.Series:
        E = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        return pd.Series(_bucket_of(E, P))

    return embeddings.withColumn("bucket", _bucket_udf(col(vec_col)))


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach the IVF inverted-list id (nearest centroid by cosine).

    Index-build path, map-only and Arrow-vectorized: the (K, dim)
    centroid matrix ships once in the UDF closure and each Arrow batch
    is one (batch × K) numpy matmul + argmax. The earlier JVM
    formulation broadcast-joined K centroid ROWS onto every vector
    (K× row explosion) and scored each pair with interpreted
    aggregate/zip_with folds — a constant-factor drag exactly where an
    index build spends its time. Tie-break (equal cosine → lowest
    list_id) matches the SQL oracle's ``row_number`` ordering, and on
    quantized integer-valued vectors every dot is exact, so
    assignments reproduce bit-for-bit in any engine. On a real cluster
    the assigned table is written ``partitionBy('list_id')`` once and
    probes are partition-pruned reads.
    """
    import numpy as np

    from .dedup import _fan_out

    C = np.asarray(centroids, dtype=np.float64)  # (K, dim)
    cn = np.sqrt((C * C).sum(axis=1))
    cn[cn == 0.0] = 1.0

    @pandas_udf(IntegerType())
    def _assign_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        E = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        en = np.sqrt((E * E).sum(axis=1))
        en[en == 0.0] = 1.0
        # dot / (||v|| * ||c||): same operation order as the SQL oracle
        sims = (E @ C.T) / (en[:, None] * cn[None, :])
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    return _fan_out(embeddings).select(
        col(id_col), _assign_udf(col(vec_col)).alias("list_id"), col(vec_col)
    )


def kmeans_fit(
    embeddings: DataFrame,
    k: int,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Distributed Lloyd's k-means over an embedding column.

    The real IVF index build (the deterministic-sample init in
    :func:`ann_topk_ivf` is the cheap stand-in). Each iteration:

    1. assign: map-only vectorized cosine argmax (:func:`ivf_assign`);
    2. update: ``posexplode`` the vectors → partial-agg ``SUM``/count
       per (list, dimension) → one narrow shuffle of K×dim partial
       sums, never of vectors — the scalable centroid update;
    3. collect the K×dim centroid matrix to the driver (bounded,
       independent of corpus size) for the next broadcast.

    Empty cells keep their previous centroid. On quantized
    (integer-valued) vectors every partial sum is exact, so the fit is
    deterministic under any partitioning; the mean's single division
    is the only rounding. Init = every n/k-th vector by id (seedless,
    engine-stable).
    """
    sample = (
        embeddings.orderBy(id_col)
        .select(id_col, vec_col)
        .limit(max(k * 8, k))
        .collect()
    )
    step = max(len(sample) // k, 1)
    centroids = [[float(x) for x in row[vec_col]] for row in sample[::step][:k]]

    for _ in range(iters):
        assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
        sums = (
            assigned.select(
                "list_id", F.posexplode(col(vec_col)).alias("dim", "x")
            )
            .groupBy("list_id", "dim")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        by_list: dict[int, dict[int, float]] = {}
        for row in sums:
            by_list.setdefault(row["list_id"], {})[row["dim"]] = row["s"] / row["n"]
        centroids = [
            [by_list[li][d] for d in range(len(centroids[li]))]
            if li in by_list
            else centroids[li]
            for li in range(len(centroids))
        ]
    return centroids


def ann_topk_ivf(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 0,
) -> DataFrame:
    """IVF-flat ANN: probe the `nprobe` centroid cells nearest the query.

    Default centroids are a deterministic corpus sample (every
    ``n/K``-th vector by ``id_col``) — stable across runs, enough for
    the recall targets the tests pin AND SQL-reproducible for the
    oracle. Pass ``kmeans_iters > 0`` to refine them with distributed
    Lloyd's iterations (:func:`kmeans_fit`) — the production index
    build. Complements the hyperplane-LSH tier: IVF adapts to the data
    distribution (cells follow density), LSH is data-independent (no
    index build).
    """
    if kmeans_iters > 0:
        centroids = kmeans_fit(
            embeddings, n_centroids, kmeans_iters, id_col, vec_col
        )
    else:
        sample = (
            embeddings.orderBy(id_col)
            .select(id_col, vec_col)
            .limit(max(n_centroids * 8, n_centroids))
            .collect()
        )
        step = max(len(sample) // n_centroids, 1)
        centroids = [
            [float(x) for x in row[vec_col]] for row in sample[::step][:n_centroids]
        ]

    def pysim(c: list[float]) -> float:
        d = sum(a * b for a, b in zip(query_vec, c))
        nq = sum(a * a for a in query_vec) ** 0.5
        nc = sum(a * a for a in c) ** 0.5
        return d / (nq * nc) if nq and nc else 0.0

    probes = sorted(range(len(centroids)), key=lambda i: -pysim(centroids[i]))[:nprobe]

    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    qarr = F.array(*[lit(float(v)) for v in query_vec])
    qnorm = sum(v * v for v in query_vec) ** 0.5
    # zero-norm vectors score 0/0 = NaN, which Spark sorts as the
    # largest double — one zero vector would head every descending
    # top-k (ADVICE r7); the oracle applies the same predicate
    scored = assigned.filter(col("list_id").isin(probes)).filter(
        F.sqrt(_dot(col(vec_col), col(vec_col))) > 0
    ).select(
        id_col,
        "list_id",
        (
            _dot(col(vec_col), qarr)
            / (F.sqrt(_dot(col(vec_col), col(vec_col))) * lit(qnorm))
        ).alias("cosine"),
    )
    return scored.orderBy(col("cosine").desc(), col(id_col)).limit(k)


def ann_topk_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 2,
    quantize_planes: bool = False,
) -> DataFrame:
    """Top-k by cosine among vectors in the query's LSH bucket
    (+ single-bit-flip probes up to `multiprobe` planes).

    The candidate set is the union of 1 + multiprobe buckets — constant
    work per query regardless of corpus size once the bucketed table is
    partition-pruned.
    """
    import numpy as np

    dim = len(query_vec)
    P = _plane_matrix(dim, n_planes, quantize_planes)
    qbucket = int(_bucket_of(np.asarray([query_vec], dtype=np.float64), P)[0])
    probe_buckets = [qbucket] + [qbucket ^ (1 << i) for i in range(min(multiprobe, n_planes))]

    bucketed = hyperplane_buckets(
        embeddings, dim, n_planes, id_col, vec_col, quantize_planes
    )
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


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011) — the memory tier
# ---------------------------------------------------------------------------
#
# IVF and hyperplane LSH above prune WHICH vectors a query touches; PQ
# compresses WHAT is stored: dim float32 (256 B at dim=64) becomes m
# uint8 codes (m bytes), letting a 100 TB embedding corpus keep its
# whole searchable representation in cluster memory. Codebooks train
# driver-side on a bounded deterministic sample (faiss practice — the
# sample, not the corpus, bounds training cost); ENCODING, the
# corpus-sized stage, is one map-only Arrow pass; search is
# asymmetric-distance (ADC): the query builds an m x k dot-product
# table against the codebooks (tiny, on the driver) and every stored
# vector scores as m table lookups — no float vectors move at query
# time. Scores approximate the INNER PRODUCT; feed unit-normalized
# embeddings for cosine ranking.


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    sample_size: int = 4096,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train m per-block codebooks of k centroids each (numpy Lloyd's,
    L2, deterministic every-nth init on an ``orderBy(id)`` sample).
    Returns an (m, k, dim/m) float64 ndarray. dim must divide by m."""
    import numpy as np

    import hashlib

    rows = (
        embeddings.orderBy(id_col)
        .select(id_col, vec_col)
        .limit(sample_size)
        .collect()
    )
    # Deterministic but DECORRELATED init order: stride-sampling the
    # id order picks every n/k-th row, and real corpora are often
    # periodic in id (round-robin sources, replicated shards) — a
    # stride that divides the period inits every centroid from one
    # mode. Hash-shuffling the sample first keeps determinism and
    # breaks any id structure.
    rows.sort(key=lambda r: hashlib.md5(str(r[id_col]).encode()).hexdigest())
    if len(rows) < k:
        raise ValueError(
            f"pq_train needs at least k={k} sampled rows to seed centroids; "
            f"got {len(rows)} (raise sample_size or lower k)"
        )
    X = np.array([list(map(float, r[vec_col])) for r in rows])
    n, dim = X.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    books = np.empty((m, k, sub))
    for b in range(m):
        Xb = X[:, b * sub : (b + 1) * sub]
        C = Xb[:k].copy()
        for _ in range(iters):
            d2 = ((Xb[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for j in range(k):
                pts = Xb[assign == j]
                if len(pts):
                    C[j] = pts.mean(0)
        books[b] = C
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only PQ encoding: (id, codes array<int>) — codes[b] is the
    L2-nearest codebook centroid of the b-th subvector block. The one
    corpus-sized stage; Arrow-vectorized, no shuffle."""
    import numpy as np

    m, k, sub = codebooks.shape
    flat = codebooks.reshape(m * k, sub)
    bnorm2 = (codebooks**2).sum(-1)  # (m, k)
    B = codebooks

    @pandas_udf("array<int>")
    def _enc(vecs: pd.Series) -> pd.Series:
        X = np.array([list(map(float, v)) for v in vecs])
        if not len(X):
            return pd.Series([], dtype=object)
        n = len(X)
        codes = np.empty((n, m), dtype=np.int32)
        for b in range(m):
            Xb = X[:, b * sub : (b + 1) * sub]
            # argmin ||x-c||^2 = argmin (|c|^2 - 2 x·c); |x|^2 constant
            d = bnorm2[b][None, :] - 2.0 * (Xb @ B[b].T)
            codes[:, b] = d.argmin(1)
        return pd.Series([list(map(int, c)) for c in codes])

    return embeddings.select(col(id_col), _enc(col(vec_col)).alias("codes"))


def pq_topk(
    codes: DataFrame,
    codebooks,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    rerank_with: DataFrame | None = None,
    rerank_factor: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over PQ codes: score(x) = Σ_b table[b][codes[b]] with
    table[b][j] = q_b · c_bj — approximate inner product, computed as
    m table lookups per stored vector (map-only) followed by a
    TakeOrderedAndProject. Ties break on id for determinism.

    ADC score error is on the order of the quantization distortion, so
    within a tight neighborhood PQ ranks coarsely — production systems
    therefore retrieve a ``k × rerank_factor`` candidate set by ADC
    and re-score JUST those against the full vectors. Pass the
    original embeddings as ``rerank_with`` to get that second stage:
    the exact pass touches k·factor rows (a broadcast semi-join
    against the candidate ids), never the corpus.
    """
    import numpy as np

    m, kk, sub = codebooks.shape
    q = np.asarray(query_vec, dtype=float)
    T = np.empty((m, kk))
    for b in range(m):
        T[b] = codebooks[b] @ q[b * sub : (b + 1) * sub]

    @pandas_udf("double")
    def _score(cs: pd.Series) -> pd.Series:
        C = np.array([list(c) for c in cs], dtype=np.int64)
        if not len(C):
            return pd.Series([], dtype=float)
        return pd.Series(T[np.arange(m)[None, :], C].sum(1))

    n_cand = k if rerank_with is None else max(k, k * rerank_factor)
    cand = (
        codes.select(col(id_col), _score(col("codes")).alias("score"))
        .orderBy(col("score").desc(), col(id_col))
        .limit(n_cand)
    )
    if rerank_with is None:
        return cand
    qarr = F.array(*[lit(float(v)) for v in query_vec])
    exact = rerank_with.join(
        F.broadcast(cand.select(id_col)), id_col, "left_semi"
    ).select(
        col(id_col), _dot(col(vec_col), qarr).alias("score")
    )
    return exact.orderBy(col("score").desc(), col(id_col)).limit(k)


def pq_recall_report(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 10,
    m: int = 8,
    n_centroids: int = 16,
    rerank_factor: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Measure recall@k of ADC and ADC+exact-rerank against the exact
    cosine top-k (the ``s_cosine_topk_bruteforce`` ranking) on the
    SAME corpus — the PQ evidence seam (VERDICT r4 #6 / r5 #6).

    Vectors are unit-normalized first (ADC approximates the inner
    product, so cosine ranking needs unit inputs — the documented
    contract of :func:`pq_topk`); the first ``n_queries`` vectors by
    id serve as queries; ground truth is the exact inner-product
    top-k over the normalized corpus, computed with the same JVM
    ``aggregate``/``zip_with`` dot product the brute-force query uses.
    Returns ``{"recall_adc": ..., "recall_rerank": ..., "n_queries",
    "k", "corpus_size"}`` with recalls averaged over queries.
    """
    nrm = F.sqrt(_dot(col(vec_col), col(vec_col)))
    # Zero-norm vectors have no cosine direction: dividing by the norm
    # would send NaN/Inf symbols through pq_train/pq_encode and silently
    # skew the recall numbers (ADVICE r6) — exclude them up front.
    unit = (
        embeddings.filter(nrm > 0)
        .select(
            col(id_col),
            F.transform(col(vec_col), lambda x: x / nrm).alias(vec_col),
        )
        .persist()
    )
    try:
        corpus_size = unit.count()
        books = pq_train(unit, m=m, k=n_centroids, id_col=id_col, vec_col=vec_col)
        codes = pq_encode(unit, books, id_col=id_col, vec_col=vec_col).persist()
        queries = (
            unit.orderBy(id_col).limit(n_queries).collect()
        )
        hits_adc = hits_rr = 0
        for q in queries:
            qvec = [float(x) for x in q[vec_col]]
            qarr = F.array(*[F.lit(v) for v in qvec])
            truth = {
                r[id_col]
                for r in unit.select(
                    col(id_col), _dot(col(vec_col), qarr).alias("score")
                )
                .orderBy(col("score").desc(), col(id_col))
                .limit(k)
                .collect()
            }
            adc = {
                r[id_col]
                for r in pq_topk(codes, books, qvec, k=k, id_col=id_col).collect()
            }
            rr = {
                r[id_col]
                for r in pq_topk(
                    codes,
                    books,
                    qvec,
                    k=k,
                    id_col=id_col,
                    rerank_with=unit,
                    rerank_factor=rerank_factor,
                    vec_col=vec_col,
                ).collect()
            }
            hits_adc += len(adc & truth)
            hits_rr += len(rr & truth)
        denom = len(queries) * k
        return {
            "recall_adc": hits_adc / denom,
            "recall_rerank": hits_rr / denom,
            "n_queries": len(queries),
            "k": k,
            "m": m,
            "n_centroids": n_centroids,
            "rerank_factor": rerank_factor,
            "corpus_size": corpus_size,
        }
    finally:
        unit.unpersist()
        try:
            codes.unpersist()
        except NameError:
            pass


class IvfIndex:
    """Persisted IVF index with incremental append (round 7, SURVEY L39).

    The production lifecycle the one-shot :func:`ann_topk_ivf` can't
    express: train centroids ONCE, write the assigned corpus
    ``partitionBy('list_id')`` (hive layout → a probe is a
    partition-pruned read), then keep absorbing new embeddings by
    assigning them against the FROZEN centroids and appending only
    their partitions — no retrain, no rewrite of the existing corpus.
    At 100 TB this is the difference between a nightly O(new-data)
    append job and an O(corpus) rebuild.

    Layout::

        <root>/centroids.json      # {"centroids", "dim", "id_col",
                                   #  "vec_col", "data_dir"}
        <root>/<data_dir>/list_id=N/  # hive-partitioned assigned
                                      # vectors; data_dir = "data_<hex>"
        <root>__lock/              # single-writer mutex

    Writer coordination (VERDICT r7 #3): :meth:`build`, :meth:`append`
    and :meth:`compact` serialize on the same ``table_write_lock`` the
    snapshot tables use, so a nightly append can't land in a cell
    mid-compaction and be silently dropped when the staged file set
    swaps in.

    Rebuild is reader-safe (ADVICE r7): :meth:`build` assigns into a
    FRESH ``data_<hex>`` directory and publishes it together with its
    centroids in one atomic ``centroids.json`` rename — centroids and
    corpus are always a consistent pair. A reader that loaded the old
    meta keeps probing the old directory with the old centroids; old
    data dirs stay on disk for in-flight readers until :meth:`vacuum`.

    Drift: appends shift the data distribution away from the frozen
    centroids; :meth:`stats` reports per-cell counts and the imbalance
    ratio (max cell / mean cell) — the retrain trigger a real pipeline
    alarms on (rebuild = :meth:`build` again).
    """

    def __init__(self, root: str):
        import os

        self.root = root
        self._meta_path = os.path.join(root, "centroids.json")

    def _meta(self) -> dict:
        import json

        with open(self._meta_path) as f:
            return json.load(f)

    def _data_path(self, meta: dict) -> str:
        import os

        # pre-r8 indexes recorded no data_dir and used a fixed "data"
        return os.path.join(self.root, meta.get("data_dir", "data"))

    # ------------------------------------------------------------ build

    @classmethod
    def build(
        cls,
        embeddings: DataFrame,
        root: str,
        n_centroids: int = 16,
        kmeans_iters: int = 0,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        timeout: float = 0.0,
    ) -> "IvfIndex":
        """Train (or deterministically sample) centroids and write the
        fully-assigned corpus partitioned by list id.

        Default (``kmeans_iters=0``) centroids stride a sample ordered
        by ``md5(id)`` — deterministic but UNBIASED: ordering by the
        raw id would take the head of the table, and ids always
        correlate with ingest time or content in real corpora, so the
        frozen centroids would represent only the oldest data and
        every later append would crowd a few cells (VERDICT r7 #2).
        ``kmeans_iters > 0`` refines with distributed Lloyd's.
        """
        import json
        import os
        import uuid

        from ..operators.upsert import table_write_lock

        if kmeans_iters > 0:
            centroids = kmeans_fit(
                embeddings, n_centroids, kmeans_iters, id_col, vec_col
            )
        else:
            sample = (
                embeddings.orderBy(
                    F.md5(col(id_col).cast("string")), col(id_col)
                )
                .select(id_col, vec_col)
                .limit(max(n_centroids * 8, n_centroids))
                .collect()
            )
            step = max(len(sample) // n_centroids, 1)
            centroids = [
                [float(x) for x in row[vec_col]]
                for row in sample[::step][:n_centroids]
            ]
        idx = cls(root)
        os.makedirs(root, exist_ok=True)
        with table_write_lock(root, timeout=timeout):
            data_dir = f"data_{uuid.uuid4().hex[:8]}"
            assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
            assigned.write.mode("overwrite").partitionBy("list_id").parquet(
                os.path.join(root, data_dir)
            )
            tmp = idx._meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"centroids": centroids, "dim": len(centroids[0]),
                           "id_col": id_col, "vec_col": vec_col,
                           "data_dir": data_dir}, f)
            # the publish point: centroids + the corpus assigned from
            # them become visible together or not at all
            os.rename(tmp, idx._meta_path)
        return idx

    def centroids(self) -> list[list[float]]:
        return self._meta()["centroids"]

    # ----------------------------------------------------------- append

    def append(self, embeddings: DataFrame, timeout: float = 0.0) -> None:
        """Assign new vectors against the FROZEN centroids and append.

        Map-only assignment (one Arrow matmul per batch) + an append
        that touches only the new rows' partitions; the existing
        corpus files are never rewritten, so a reader mid-append sees
        either the old or the extended cell — never a torn one (parquet
        appends are new files). Takes the index writer lock: an append
        racing a :meth:`compact` of the same cell would otherwise land
        files in the backup dir after the compactor listed its input
        and lose them at the swap (VERDICT r7 #3); the meta is read
        under the lock so a racing rebuild can't strand the append in
        a superseded data dir."""
        from ..operators.upsert import table_write_lock

        with table_write_lock(self.root, timeout=timeout):
            meta = self._meta()
            assigned = ivf_assign(
                embeddings, meta["centroids"], meta["id_col"], meta["vec_col"]
            )
            assigned.write.mode("append").partitionBy("list_id").parquet(
                self._data_path(meta)
            )

    # ------------------------------------------------------------ query

    def topk(
        self,
        spark,
        query_vec: list[float],
        k: int = 10,
        nprobe: int = 4,
    ) -> DataFrame:
        """Exact cosine top-k over the ``nprobe`` nearest cells.

        The ``list_id IN (probes)`` filter is a hive partition filter —
        Spark prunes every other cell's files at planning time, so the
        scan cost is O(probed cells), not O(corpus). The meta is read
        ONCE, so the centroids probed and the data dir scanned are a
        consistent published pair even if a rebuild lands mid-call.
        Zero-norm corpus vectors are excluded: their cosine is 0/0 =
        NaN, which Spark sorts as the LARGEST double, so one zero
        vector would head every top-k (ADVICE r7)."""
        meta = self._meta()
        centroids, vec_col, id_col = (
            meta["centroids"], meta["vec_col"], meta["id_col"]
        )

        def pysim(c: list[float]) -> float:
            d = sum(a * b for a, b in zip(query_vec, c))
            nq = sum(a * a for a in query_vec) ** 0.5
            nc = sum(a * a for a in c) ** 0.5
            return d / (nq * nc) if nq and nc else 0.0

        probes = sorted(
            range(len(centroids)), key=lambda i: -pysim(centroids[i])
        )[:nprobe]
        qarr = F.array(*[lit(float(v)) for v in query_vec])
        qnorm = sum(v * v for v in query_vec) ** 0.5
        scored = (
            spark.read.parquet(self._data_path(meta))
            .filter(col("list_id").isin(probes))
            .filter(F.sqrt(_dot(col(vec_col), col(vec_col))) > 0)
            .select(
                id_col,
                "list_id",
                (
                    _dot(col(vec_col), qarr)
                    / (F.sqrt(_dot(col(vec_col), col(vec_col))) * lit(qnorm))
                ).alias("cosine"),
            )
        )
        return scored.orderBy(col("cosine").desc(), col(id_col)).limit(k)

    # --------------------------------------------------------- maintain

    def compact(self, spark, timeout: float = 0.0, **kwargs) -> dict:
        """OPTIMIZE-analog for the index: every :meth:`append` adds new
        files to the touched cells, so a nightly-append index
        fragments into many small parquet files per partition — this
        rewrites each fragmented cell to ~128 MB files in place, the
        same ``operators/maintenance.compact_table`` the warehouse
        tables use. Runs under the index writer lock, so it can't race
        an append or rebuild. Staging/backup dirs are ``_``-prefixed
        (invisible to hive partition discovery); a concurrent reader
        sees the old or the new complete cell — except in the instant
        between the two swap renames, where the cell is briefly
        absent, so schedule compaction in the index's maintenance
        window if readers must never observe that (ADVICE r7)."""
        from ..operators.maintenance import compact_table
        from ..operators.upsert import table_write_lock

        with table_write_lock(self.root, timeout=timeout):
            return compact_table(spark, self._data_path(self._meta()), **kwargs)

    def vacuum(self) -> list[str]:
        """Remove data dirs superseded by a rebuild (kept on disk so
        in-flight readers of the old published pair finish; same
        retention contract as ``SnapshotTable.vacuum``). Returns the
        removed dir names."""
        import os
        import shutil

        from ..operators.upsert import table_write_lock

        with table_write_lock(self.root):
            live = os.path.basename(self._data_path(self._meta()))
            removed = []
            for d in sorted(os.listdir(self.root)):
                full = os.path.join(self.root, d)
                if (
                    d != live
                    and (d == "data" or d.startswith("data_"))
                    and os.path.isdir(full)
                ):
                    shutil.rmtree(full)
                    removed.append(d)
            return removed

    # ------------------------------------------------------------ stats

    def stats(self, spark) -> dict:
        """Per-cell counts + imbalance ratio (max/mean) — the drift
        signal a pipeline alarms on to schedule a retrain. The meta is
        read ONCE so the counted corpus and the centroid count are the
        same published pair even if a rebuild lands mid-call."""
        meta = self._meta()
        rows = (
            spark.read.parquet(self._data_path(meta))
            .groupBy("list_id")
            .count()
            .collect()
        )
        counts = {int(r["list_id"]): r["count"] for r in rows}
        n_cells = len(meta["centroids"])
        total = sum(counts.values())
        mean = total / n_cells if n_cells else 0.0
        return {
            "total": total,
            "n_cells": n_cells,
            "nonempty_cells": len(counts),
            "max_cell": max(counts.values(), default=0),
            "imbalance": (max(counts.values(), default=0) / mean) if mean else 0.0,
            "counts": counts,
        }
