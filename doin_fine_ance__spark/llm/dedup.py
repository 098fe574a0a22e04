"""Near-duplicate detection at corpus scale: MinHash-LSH and SimHash.

The scale path for training-data dedup (the north star's first-class
requirement). Shape of the MinHash pipeline:

  shingle (map) → k minhashes (map) → band keys (map+explode)
  → bucket groupBy (ONE shuffle on band keys) → within-bucket pair
  join → exact-Jaccard verify on candidates only

No O(n²) stage exists: candidate generation is linear in corpus size
+ bucket collisions, which is the entire point of LSH banding
(b bands × r rows ⇒ pairs with Jaccard s collide w.p. 1-(1-s^r)^b).

Everything below is JVM built-ins (md5/conv/array ops) except
:func:`simhash64`, which is an Arrow-vectorized pandas UDF — the
documented slow-path escape hatch, used because 64 per-bit counters
over variable-length token arrays are genuinely awkward as SQL
expressions.

Determinism: shingle hashes derive from md5 (stable across engines,
sessions, and partitionings); the k permutations use fixed
coefficients from ``random.Random(42)`` — same signature for the same
text forever, which makes incremental dedup (match new docs against a
stored signature table) valid, and lets a SQL oracle recompute the
identical bands (queries/llm_ops.py generates that SQL from
PERM_COEFFS).
"""

from __future__ import annotations

import random
import threading

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit, pandas_udf
from pyspark.sql.types import LongType

from ..operators.checkpoint import materialize

# --- 64-bit hash-key collision exposure (VERDICT r12 "What's wrong"
# #3) --- Several operators re-key pure-intermediate tokens / grams /
# windows from md5 hex strings to xxhash64 longs (guide §2.3 "narrower
# types" — 8-byte shuffle keys instead of 32-char strings):
# :func:`containment_prefix_pairs` (verify token sets; callers' n-gram
# keys, e.g. d_containment_prefix), :func:`_verified_pairs` and
# :func:`verified_forest_edges` (verify token sets), and
# corpus.duplicate_spans / corpus.remove_duplicate_spans (window keys).
# The re-keying is injective IN PRACTICE, not injective: among n
# distinct keys the expected number of colliding unordered pairs is
# C(n,2)/2^64 ≈ n²/2^65 (birthday bound). A collision silently MERGES
# two distinct tokens/grams/windows — it can inflate an intersection
# size or a duplicated-window count in operators documented as exact.
# Calibration (pinned by tests/test_hash_bounds.py):
#   n = 1e7   (driver SFs: ≤ ~2e6 distinct grams)  → E ≈ 2.7e-6
#   n = 1e9                                        → E ≈ 0.027
#   n = XXHASH64_EXACT_SAFE_DISTINCT = 2^32 ≈ 4.3e9 → E ≈ 0.5
#   n = 1e12  (100 TB-corpus gram regime)          → E ≈ 2.7e4 —
#             collisions are GUARANTEED, the operator is no longer
#             exact.
# Contract: treat a single xxhash64 key as exact only while the
# per-invocation distinct-key count stays below
# XXHASH64_EXACT_SAFE_DISTINCT. Above it, widen the key to a 128-bit
# pair — e.g. ``F.struct(F.xxhash64(x), F.xxhash64(x, F.lit(1)))``
# (two independently-seeded halves; struct keys group/join/intersect
# natively) — which moves the bound to n²/2^129: E < 1e-14 even at
# n = 1e12. The registered bench/oracle queries sit ≥ 3 orders of
# magnitude under the 64-bit bound at every driver scale factor, which
# is why the md5-keyed DuckDB oracles stay hash-exact.
XXHASH64_EXACT_SAFE_DISTINCT = 2**32

# Mersenne prime 2^31-1: chosen so a·x+b (a,b < 2^31, x a 32-bit
# shingle hash) stays under 2^63 — exact in numpy uint64 arithmetic.
_P = (1 << 31) - 1
_rng = random.Random(42)
# (a, b) coefficients for k=64 hash permutations, fixed at import time.
PERM_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, _P), _rng.randrange(0, _P)) for _ in range(64)
]


def _fan_out(df: DataFrame) -> DataFrame:
    """Repartition a DataFrame up to default parallelism before a
    CPU-bound map stage.

    A small corpus arrives as one parquet file → one scan partition →
    an expensive pandas UDF pinned to a single core. At real scale the
    scan already has ≥ parallelism partitions and this is a no-op (no
    shuffle inserted), so the branch only pays its round-robin
    exchange when the input genuinely under-partitions the cluster.
    """
    try:
        target = df.sparkSession.sparkContext.defaultParallelism
        n = df.rdd.getNumPartitions()
    except Exception:
        # Spark Connect exposes neither sparkContext nor .rdd; there the
        # scan's partitioning is opaque, so leave the plan unchanged.
        return df
    return df.repartition(target) if n < target else df


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 64, n: int = 5
) -> DataFrame:
    """doc → k-wide minhash signature (array<string>), Arrow-vectorized.

    Character n-gram shingles of the whitespace-normalized lowered text
    are hashed to 32-bit ints via the first 8 hex chars of md5 —
    engine- and session-stable AND SQL-expressible (DuckDB:
    ``CAST('0x' || substr(md5(s), 1, 8) AS UBIGINT)``), which lets the
    driver's oracle recompute the EXACT same signatures/bands instead
    of depending on LSH recall; signature[i] = min over shingles of
    (a_i·x + b_i) mod p, computed as ONE numpy broadcast per document.

    This is a deliberate pandas-UDF stage (the documented slow-path
    escape hatch): the same computation as JVM higher-order transforms
    (k=64 array_min∘transform chains) runs interpreted per-element in
    Catalyst and measured ~100x slower at sf0.1. Map-only either way —
    no shuffle, scales linearly, and signatures stay deterministic
    (fixed seed + crc32), so incremental dedup against a stored
    signature table remains valid.
    """
    import numpy as np

    coeffs = PERM_COEFFS[:k]
    A = np.array([a for a, _ in coeffs], dtype=np.uint64).reshape(-1, 1)
    B = np.array([b for _, b in coeffs], dtype=np.uint64).reshape(-1, 1)

    @pandas_udf("array<string>")
    def _sig_udf(texts: pd.Series) -> pd.Series:
        out = [
            [str(int(v)) for v in sig]
            for sig in _batch_signatures(texts, A, B, n)
        ]
        return pd.Series(out)

    return _fan_out(docs).select(col(id_col), _sig_udf(col(text_col)).alias("signature"))


def _batch_signatures(texts, A, B, n: int) -> list:
    """Shared MinHash batch core: texts → list of k-wide uint64
    signature arrays (one per text, order preserved).

    Shingles repeat heavily across documents (boilerplate, shared
    vocabulary — and at rehearsal scale, replica cliques), so the
    batch runs in two passes: pass 1 interns each DISTINCT shingle to
    a dense index and records per-doc index arrays; pass 2 md5-hashes
    and permutes each unique shingle ONCE into a (k × n_unique)
    matrix, and every doc's signature is a column-gather + min over
    it. Same output as permuting per doc, ~1.7× faster measured on
    sf1 text (the A·x+B work scales with unique shingles, not
    doc·shingle occurrences).
    """
    import hashlib
    import re

    import numpy as np

    ws = re.compile(r"\s+")
    index: dict[str, int] = {}
    shingle_list: list[str] = []
    doc_idx: list = []
    for t in texts:
        norm = ws.sub(" ", (t or "").lower())
        if len(norm) < n:
            shingles = {norm}
        else:
            shingles = {norm[i : i + n] for i in range(len(norm) - n + 1)}
        idx = np.empty(len(shingles), dtype=np.int64)
        for j, s in enumerate(shingles):
            v = index.get(s)
            if v is None:
                v = len(shingle_list)
                index[s] = v
                shingle_list.append(s)
            idx[j] = v
        doc_idx.append(idx)
    H = np.fromiter(
        (int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) for s in shingle_list),
        dtype=np.uint64,
        count=len(shingle_list),
    ).reshape(1, -1)
    M = (A * H + B) % np.uint64(_P)  # k × n_unique
    return [M[:, idx].min(axis=1) for idx in doc_idx]


def minhash_band_keys(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    bands: int = 16,
    n: int = 5,
) -> DataFrame:
    """Fused signature+banding: docs → (id, band, band_hash) in ONE
    Python stage (r13, VERDICT r12 next-round #7 — measured, then
    adopted).

    Emits exactly ``band_keys(minhash_signatures(docs))`` — band_hash
    = md5 of the ``|``-joined r = k/bands signature slots, identical
    bytes (Python md5 over the same UTF-8 string the JVM expression
    hashed; probe-verified set-equal at sf0.1) — but the signature
    array<string> never crosses the Arrow boundary and the 16-way
    JVM md5/concat/element_at expression chain over exploded rows is
    gone. Measured at sf0.1: banded frame 1.31 s → 0.58 s (min-of-3,
    noop). Use for in-line band building; callers that band STORED
    signature tables (incremental dedup) keep :func:`band_keys`.
    """
    import numpy as np

    coeffs = PERM_COEFFS[:k]
    A = np.array([a for a, _ in coeffs], dtype=np.uint64).reshape(-1, 1)
    B = np.array([b for _, b in coeffs], dtype=np.uint64).reshape(-1, 1)
    r = k // bands
    id_ddl = docs.schema[id_col].dataType.simpleString()

    def _kernel(batches):
        import hashlib

        for pdf in batches:
            sigs = _batch_signatures(pdf[text_col], A, B, n)
            ids_out, band_out, hash_out = [], [], []
            for did, sig in zip(pdf[id_col], sigs):
                svals = [str(int(v)) for v in sig]
                for bi in range(bands):
                    ids_out.append(did)
                    band_out.append(bi)
                    hash_out.append(
                        hashlib.md5(
                            "|".join(svals[bi * r : (bi + 1) * r]).encode("utf-8")
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {id_col: ids_out, "band": band_out, "band_hash": hash_out}
            )

    return _fan_out(docs.select(id_col, text_col)).mapInPandas(
        _kernel, f"{id_col} {id_ddl}, band int, band_hash string"
    )


def band_keys(
    signatures: DataFrame, id_col: str = "doc_id", bands: int = 16, k: int | None = None
) -> DataFrame:
    """Map-only banding: (id, band, band_hash) — one row per band.

    band_hash = md5 of the band's r = k/bands signature slots; equal
    hash ⇔ equal band slice (modulo md5 collisions), which is the LSH
    bucket key. No shuffle here — callers join on (band, band_hash).
    """
    if k is None:
        # fallback probe; callers pass k to avoid the extra job
        k = signatures.select(F.size("signature")).first()[0]
    r = k // bands
    return signatures.select(
        col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        lit(bi).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|", *[F.element_at("signature", bi * r + j + 1) for j in range(r)]
                            )
                        ).alias("band_hash"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(col(id_col), col("bk.band").alias("band"), col("bk.band_hash").alias("band_hash"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    k: int | None = None,
    checkpoint_mode: str | None = None,
) -> DataFrame:
    """Band the signatures and emit candidate pairs per bucket.

    One shuffle on (band index, band hash); within-bucket self-join with
    ``id_a < id_b`` dedup. Bucket sizes are bounded in practice (equal
    band hash ⇒ near-identical prefix), so the join is skew-safe; AQE
    splits pathological buckets.
    """
    banded = band_keys(signatures, id_col, bands, k)
    return _pairs_from_banded(banded, id_col, checkpoint_mode)


def _pairs_from_banded(
    banded: DataFrame, id_col: str, checkpoint_mode: str | None = None
) -> DataFrame:
    """Within-bucket candidate self-join over a (id, band, band_hash)
    frame: distinct (id_a, id_b) with id_a < id_b.

    Materializes the band keys ONCE before the self-join: the two join
    branches are otherwise separate copies of the whole upstream plan
    (signature stage included), and Spark only reuses exchanges, not
    arbitrary subplans — without this the signatures compute twice.
    At corpus scale this materialization is the signature/band store
    you would persist anyway (incremental dedup reads exactly it).
    """
    banded = materialize(banded, checkpoint_mode)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (col("a.band") == col("b.band"))
            & (col("a.band_hash") == col("b.band_hash"))
            & (col(f"a.{id_col}") < col(f"b.{id_col}")),
        )
        .select(col(f"a.{id_col}").alias("id_a"), col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    k: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline with exact-Jaccard verification.

    Returns (id_a, id_b, jaccard) for pairs whose *exact* token-set
    Jaccard ≥ threshold; LSH only bounds the candidate set, so the
    output has no false positives (and recall governed by (k, bands)).

    One-live-pipeline contract (shared with the other dedup entry
    points): each call evicts the previous call's persisted token
    store on entry, so materialize (collect/write) this call's result
    before starting another dedup pipeline — interleaving two lazy
    pipelines stays CORRECT but recomputes the tokenize/hash map stage
    on every action (see ``_TOKEN_STORES``). Call
    :func:`release_token_stores` when done.
    """
    return _verified_pairs(docs, id_col, text_col, threshold, k, bands, "jaccard")


def exact_collapse(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist_stores: list[DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Collapse exact duplicates before any pairwise near-dup stage.

    Groups documents by md5 of the whitespace-normalized lowered text —
    the SAME normalization :func:`minhash_signatures` shingles over, so
    group members have identical LSH signatures (identical band keys)
    AND identical verify token sets. That makes the collapse exact for
    near-dup clustering: every cross-group candidate/verify decision is
    invariant across a group's members, so components over the full
    pair graph equal components over (representatives' pair graph ∪
    per-group stars).

    Returns ``(membership, reps)``: membership is (id_col, rep_id,
    grp_size, has_tokens) with rep_id = MIN(id) per group (so the rep
    is also the group's min-label); reps is the subset of ``docs``
    rows whose id is a rep_id. Two shuffles on 16-byte keys + one
    id-equi-join — linear in docs, no pairwise stage. This is the
    production order every corpus pipeline uses (exact-dedup FIRST):
    a replica clique of m copies costs m(m-1)/2 pairs downstream
    unless collapsed here, which is why the r11 sf10 rehearsal saw
    ~1.4 B verified edges on planted boilerplate cliques.

    ``has_tokens`` marks groups with a non-empty verify token set:
    empty/whitespace-only docs share signatures (single ""-shingle)
    but their pairwise Jaccard is 0/0 = NULL, so the full pair graph
    never links them — star edges must skip those groups to stay
    output-identical.
    """
    norm = F.regexp_replace(
        F.lower(F.coalesce(col(text_col), lit(""))), r"\s+", " "
    )
    has_tokens = (
        F.size(F.filter(F.split(F.lower(col(text_col)), r"\s+"), lambda x: x != ""))
        > 0
    )
    keyed = docs.select(
        col(id_col), F.md5(norm).alias("grp_key"), has_tokens.alias("has_tokens")
    )
    groups = keyed.groupBy("grp_key").agg(
        F.min(col(id_col)).alias("rep_id"),
        F.count("*").alias("grp_size"),
        # group-uniform by construction (same normalized text); min()
        # just picks the one value without a second pass over docs
        F.min("has_tokens").alias("has_tokens"),
    )
    if persist_stores is not None:
        # The composed near-dup pipelines reference groups from three
        # plan branches (membership, the signature/band store build,
        # and the verify token build over reps) — each would re-run
        # the full-text md5 scan + group aggregation (guide §2.4:
        # duplicated subtrees). persist (NOT localCheckpoint: keeps
        # size statistics so the membership and reps joins still
        # broadcast a small group table — the _verified_pairs stats
        # lesson) and hand ownership to the caller, who must register
        # it for the one-live-pipeline eviction AFTER any inner
        # pipeline's entry eviction has run.
        groups = groups.persist()
        persist_stores.append(groups)
    membership = keyed.drop("has_tokens").join(groups, "grp_key").select(
        col(id_col), "rep_id", "grp_size", "has_tokens"
    )
    # rep_id is unique across groups (each doc belongs to one group),
    # so no distinct is needed before the semi join
    reps = docs.join(groups.select(col("rep_id").alias(id_col)), id_col, "semi")
    return membership, reps


def minhash_near_dup_star_edges(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    k: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Cluster-representative (star-edge) output mode for near-dup.

    Emits an edge set whose connected components — and per-component
    min labels — EQUAL those of :func:`minhash_near_dups`' full
    verified pair graph, but with size linear in the corpus instead of
    quadratic in replica cliques: per exact-duplicate group, ``grp_size
    - 1`` star edges (rep → member, Jaccard exactly 1.0 since token
    sets are identical); across groups, the verified rep-level pairs.

    This is the scale contract the pair-emitting mode cannot offer: at
    the r11 sf10 rehearsal the planted boilerplate cliques made the
    full pair output ~1.4 B edges (quadratic in clique size, 61% of
    the whole bench), while this mode's output stays linear — "emit
    every pair of the boilerplate clique" is not a runnable contract
    at 100 TB. Schema matches minhash_near_dups: (id_a, id_b, jaccard)
    with id_a < id_b (the rep is the group minimum).
    """
    stores: list[DataFrame] = []
    membership, reps = exact_collapse(docs, id_col, text_col, persist_stores=stores)
    # minhash_near_dups' entry eviction runs BEFORE the group store is
    # registered (it must only drop a PREVIOUS query's stores, not
    # this composition's); register ours afterwards so the next
    # pipeline's eviction reclaims it.
    rep_pairs = minhash_near_dups(reps, id_col, text_col, threshold, k, bands)
    with _TOKEN_STORES_LOCK:
        _TOKEN_STORES.extend(stores)
    star = (
        membership.filter((col(id_col) != col("rep_id")) & col("has_tokens"))
        .select(
            col("rep_id").alias("id_a"),
            col(id_col).alias("id_b"),
            lit(1.0).alias("jaccard"),
        )
    )
    return rep_pairs.select("id_a", "id_b", "jaccard").unionByName(star)


def verified_forest_edges(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    k: int = 64,
    bands: int = 16,
    checkpoint_mode: str | None = None,
) -> DataFrame:
    """Per-bucket verified spanning forests: exact clustering semantics
    with LINEAR edge output on near-dup cliques.

    The scale problem this solves (measured, r11 sf10 rehearsal): the
    full verified pair graph is quadratic in near-dup clique size
    (~1.4 B edges at sf10 on planted boilerplate), and the pairwise
    verify join ships two token arrays per candidate pair — that
    shuffle OOMed a 24 g single JVM. But connected components never
    needed every clique edge: a spanning forest per LSH bucket has the
    SAME components.

    Theorem (why this is exact, not an approximation): every edge of
    minhash_near_dups' verified graph — (candidates share ≥1 band) ∧
    (token Jaccard ≥ threshold) — lies inside at least one bucket, and
    within that bucket the local union-find below computes exactly the
    connectivity of the bucket-induced verified subgraph. So the union
    over buckets of the emitted forests is a spanning subgraph of the
    full verified graph that preserves all of its connected components
    (d_dup_clusters' oracle — the transitive closure of the FULL pair
    graph — stays hash-exact on top of this output).

    Cost shape: the shuffle is LINEAR (each doc's hashed-token array
    ships once per band it shares with another doc — never per pair),
    the output is linear (≤ bucket_size - 1 edges per bucket), and the
    per-bucket verify count is near-linear on clique-heavy data: the
    local union-find skips any pair already connected, so a clique of
    m members costs m-1 Jaccard computations, not m(m-1)/2. The
    residual O(m²) is find() pointer lookups (~ns). Worst case — a
    large bucket whose members never merge — degrades to quadratic
    CPU inside one task, but an LSH bucket IS an equal-band-hash group
    (near-identical signature slice), so large non-merging buckets
    contradict the banding that built them. Singleton buckets (the
    vast majority on real corpora) are dropped JVM-side before any
    token bytes move.
    """
    import numpy as np

    # One-live-pipeline hygiene (same contract as _verified_pairs /
    # containment): evict the PREVIOUS dedup pipeline's persisted token
    # store on entry. This pipeline keeps no store of its own, but a
    # leftover cache from a sibling poisons this call two ways —
    # storage-memory pressure on the unified manager, and canonical-
    # plan cache substitution splicing a stats-less InMemoryRelation
    # into this call's token subtree. Measured at sf0.1: interleaving
    # d_dup_clusters with d_neardup_star_edges ran 5.4-9.0 s per query
    # with the sibling's store left alive vs 3.1-5.3 s evicted.
    with _TOKEN_STORES_LOCK:
        while _TOKEN_STORES:
            _TOKEN_STORES.pop().unpersist()

    # Fused signature+banding (r13, see minhash_band_keys). Two
    # consumers below (bucket counts + semi join): materialize once so
    # the signature stage doesn't run twice (same idiom and rationale
    # as _pairs_from_banded).
    banded = minhash_band_keys(docs, id_col, text_col, k, bands)
    banded = materialize(banded, checkpoint_mode)
    multi_keys = (
        banded.groupBy("band", "band_hash")
        .count()
        .filter(col("count") >= 2)
        .drop("count")
    )
    multi = banded.join(multi_keys, ["band", "band_hash"], "semi")
    toks = docs.select(
        col(id_col),
        F.array_distinct(
            F.transform(
                F.filter(F.split(F.lower(col(text_col)), r"\s+"), lambda x: x != ""),
                lambda x: F.xxhash64(x),
            )
        ).alias("tokens"),
    )
    rows = multi.join(toks, id_col)
    # Pin forest parallelism (same idiom and rationale as the verify
    # stage in _verified_pairs): the bucketed rows are BYTE-small after
    # AQE coalescing — measured ONE post-join partition at sf0.1 — but
    # each bucket costs Python set intersections, so the whole
    # union-find stage otherwise lands on a single core (6.9 s → 2.5 s
    # at sf0.1 with the pin). Repartitioning BY THE GROUP KEYS means
    # the groupBy below reuses this exchange — no extra shuffle, just
    # an explicit width AQE won't coalesce.
    try:
        width = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        rows = rows.repartition(width, "band", "band_hash")
    except (TypeError, ValueError):
        pass  # non-numeric conf (e.g. "auto"): keep the planner's choice

    def _local_forest(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        toksets = [
            frozenset(t) if t is not None else frozenset() for t in pdf["tokens"]
        ]
        parent = list(range(len(ids)))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        out_a: list[int] = []
        out_b: list[int] = []
        n = len(ids)
        n_comp = n
        for ii in range(n):
            if n_comp == 1:
                # bucket fully merged: a pure clique (the planted-
                # boilerplate case) costs m-1 verifies + O(m) checks,
                # not the m²/2 find-loop
                break
            i = int(order[ii])
            a = toksets[i]
            for jj in range(ii + 1, n):
                j = int(order[jj])
                ri, rj = find(i), find(j)
                if ri == rj:
                    continue  # already connected via verified path: skip
                b = toksets[j]
                inter = len(a & b)
                union = len(a) + len(b) - inter
                # float division matches _verified_pairs' double math
                if union > 0 and inter / union >= threshold:
                    parent[ri] = rj
                    n_comp -= 1
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    # duplicate edges across bands are fine downstream (CC folds them);
    # a distinct() here would add a shuffle for nothing
    return rows.groupBy("band", "band_hash").applyInPandas(
        _local_forest, "id_a long, id_b long"
    )


def minhash_containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.9,
    k: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Asymmetric near-inclusion detection: containment over LSH candidates.

    containment(A, B) = |A∩B| / min(|A|, |B|) — high when one document's
    token set sits (almost) inside the other's, the quote/boilerplate/
    nested-document case Jaccard under-scores (a 50-token doc embedded
    in a 500-token doc has Jaccard ≤ 0.1 but containment 1.0). Returns
    (id_a, id_b, containment ≥ threshold), exact on the candidate set.

    Recall caveat, now MEASURED (CONTAINMENT_QUALITY_r10.json,
    tools/containment_quality.py): MinHash collisions track JACCARD,
    so a tiny-in-huge inclusion may never share a band — on planted
    inclusions recall is 1.0 at length ratio 0.9 but 0.0 at ratios
    ≤ 0.1 (pair Jaccard ~ ratio, far below the S-curve knee).
    Unbiased containment candidate generation needs either
    partitioned-by-set-size banding (LSH Ensemble, Zhu et al., VLDB
    2016) or the EXACT df-ordered prefix-filter join shipped here as
    :func:`containment_prefix_pairs` (recall 1.0 by theorem at every
    ratio on the same corpus). This operator remains the verify-side
    measure swap on the standard banding — the production compromise
    when one LSH index serves both measures and inclusions of
    interest are near-full-length — and the oracle recomputes the
    identical pipeline, so correctness does not ride on recall.

    One-live-pipeline contract: see :func:`minhash_near_dups` —
    materialize this result before starting another dedup pipeline.
    """
    return _verified_pairs(docs, id_col, text_col, threshold, k, bands, "containment")


def containment_prefix_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.9,
    tokens_col: str | None = None,
    proper: bool = False,
) -> DataFrame:
    """EXACT containment join via df-ordered prefix filtering — the
    unbiased candidate generator Jaccard-banded LSH cannot be for the
    short-inside-long case (VERDICT r9 #4).

    The pigeonhole theorem behind prefix filtering (Chaudhuri et al.
    ICDE 2006 "SSJoin"; Bayardo et al. WWW 2007; Xiao et al. PPJoin):
    if containment(A, B) = |A∩B| / |A| ≥ t with A the smaller set,
    then A shares ≥ ⌈t·|A|⌉ tokens with B, so ANY
    (⌊(1−t)·|A|⌋ + 1)-subset of A's tokens intersects B. Probing an
    inverted index of ALL documents' tokens with each document's
    prefix therefore surfaces EVERY qualifying pair — recall is 1.0
    by theorem, not by S-curve, measured in
    CONTAINMENT_QUALITY_r10.json next to the banded operator's
    ratio-dependent recall. Choosing the prefix as the doc's RAREST
    tokens (ascending document frequency, the classic ordering)
    minimizes candidate volume; correctness does not depend on the
    ordering, so the SQL oracle may break df ties differently and
    still match — false positives die in the exact verify, and true
    pairs survive any valid prefix.

    Output: (id_a, id_b, containment) with id_a < id_b and
    containment = |A∩B| / min(|A|, |B|) ≥ threshold — the same
    contract as :func:`minhash_containment_pairs`.

    Scale shape: tokenize (map) → df counts (one partial-agg shuffle
    on token) → per-doc rarest-first rank (one shuffle on doc id) →
    prefix ⋈ inverted index on token (the only candidate-sized join;
    a token appears on the probe side only when it is among a doc's
    ⌊(1−t)·|A|⌋+1 rarest, so hot tokens join against few prefixes) →
    exact verify on hashed token arrays. At t = 0.9 the prefix is
    ~|A|/10 + 1 tokens, so the index probe ships ~10% of the token
    stream. No O(n²) stage and no sketch.

    ``tokens_col`` (optional) names an ``array<string>`` column to use
    as the token sets directly — e.g. word-n-gram hashes for n-gram
    containment — instead of whitespace-splitting ``text_col``.

    ``proper=True`` restricts to PROPER inclusions — the smaller set
    strictly smaller than the larger (|A| < |B|) — the actual
    quote/boilerplate/nested-document use case. This is also the
    scale guardrail: a near-duplicate CLIQUE (N docs whose sets are
    near-identical and equal-sized — replicated boilerplate) has
    O(N²) qualifying equal-size pairs, so the unrestricted join's
    OUTPUT is inherently quadratic in clique size (measured: 12.7M
    pairs on the sf1-skew corpus, where the planted boilerplate
    clique members differ only in an id token). Proper mode excludes
    equal-size pairs at candidate generation, so cliques cost nothing;
    equal-size duplicates are exact/near-dup DEDUP's job
    (d_exact_dedup / MinHash-LSH), which a production pipeline runs
    BEFORE a containment join anyway.

    The prefix length uses INTEGER arithmetic on a per-mille threshold
    (``required = ceil(t‰·|A| / 1000)``, ``prefix = |A| − required + 1``):
    the float form ``floor((1−t)·|A|)+1`` under-counts when ``1−t``
    rounds down in binary (1−0.9 < 0.1 exactly), which shortened the
    prefix below the theorem's bound and silently broke recall.

    One-live-pipeline contract: see :func:`minhash_near_dups` — entry
    evicts any previous dedup call's persisted token store, so a pairs
    frame from an earlier minhash/containment call that has not been
    materialized yet recomputes its token map stage on its next action
    (correct results, lost cache). Materialize one pipeline before
    starting the next; call :func:`release_token_stores` when done.
    """
    from pyspark.sql import Window

    t_permille = round(threshold * 1000)
    if not 0 < t_permille <= 1000:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    if tokens_col is not None:
        token_set = F.array_distinct(col(tokens_col))
    else:
        token_set = F.array_distinct(
            F.filter(F.split(F.lower(col(text_col)), r"\s+"), lambda x: x != "")
        )
    # fan the tokenize/gram-hash map stage to full width: interpreted
    # higher-order transforms (e.g. per-gram md5 when tokens_col is an
    # n-gram expression) cost ~18 µs/element and a small parquet scan
    # arrives in 1-2 partitions — same treatment as ngram_hashes
    docs = _fan_out(docs)
    toks_flat = docs.select(
        col(id_col).alias("_id"), F.explode(token_set).alias("_tok")
    )
    # The flat token table feeds FOUR plan branches (df counts, sizes,
    # the ranked prefix, the inverted index) — without a persist the
    # tokenize+explode (and any upstream n-gram/md5 work) runs four
    # times. Same persist-not-checkpoint reasoning as _verified_pairs:
    # keep statistics so small corpora still broadcast. Registered in
    # the shared token-store cache for release_token_stores().
    toks_flat = toks_flat.persist()
    dfreq = toks_flat.groupBy("_tok").agg(F.count("*").alias("_df"))
    # ONE window pass computes both the per-doc set size and the
    # rarest-first rank (same _id partitioning — one exchange, two
    # window ops); the inverted index reuses the same frame, so the
    # earlier separate sized-groupBy + two _id joins are gone.
    # Persisted because THREE branches read it (prefix, inverted
    # index, and the verify token arrays below) — without the persist
    # each branch re-executes the df join + double window, the most
    # expensive post-tokenize stage (guide §2.4: duplicated subtrees).
    w_part = Window.partitionBy("_id")
    w_rank = w_part.orderBy(col("_df").asc(), col("_tok").asc())
    ranked = (
        toks_flat.join(dfreq, "_tok")
        .withColumn("_sz", F.count("*").over(w_part))
        .withColumn("_rn", F.row_number().over(w_rank))
    ).persist()
    prefix = ranked.filter(
        col("_rn")
        <= col("_sz") - F.expr(f"(_sz * {t_permille} + 999) div 1000") + lit(1)
    ).select(col("_id").alias("_id_p"), "_tok", col("_sz").alias("_sz_p"))
    index = ranked.select(
        col("_id").alias("_id_x"), "_tok", col("_sz").alias("_sz_x")
    )
    # probe with the SMALLER side's prefix (containment denominator is
    # min-size); equal sizes keep one orientation to avoid dup pairs
    # (proper mode drops them entirely — see docstring)
    if proper:
        size_ok = col("_sz_p") < col("_sz_x")
    else:
        size_ok = (col("_sz_p") < col("_sz_x")) | (
            (col("_sz_p") == col("_sz_x")) & (col("_id_p") < col("_id_x"))
        )
    cands = (
        prefix.join(index, "_tok")
        .filter(size_ok)
        .select(
            F.least("_id_p", "_id_x").alias("id_a"),
            F.greatest("_id_p", "_id_x").alias("id_b"),
        )
        .distinct()
    )
    # exact verify on hashed token sets (same idiom as _verified_pairs:
    # xxhash64 longs intersect identically to strings, ship 8 bytes) —
    # built from the PERSISTED ranked table, whose cached blocks are
    # already hash-partitioned by _id from the window exchange, so
    # this groupBy adds NO new shuffle (guide §2.4: two operations
    # keyed the same way share one exchange) and the tokenize/gram
    # map stage runs exactly once per call
    toks = (
        ranked.groupBy("_id")
        .agg(F.collect_list(F.xxhash64(col("_tok"))).alias("tokens"))
        .withColumnRenamed("_id", id_col)
        .persist()
    )
    with _TOKEN_STORES_LOCK:
        while _TOKEN_STORES:
            _TOKEN_STORES.pop().unpersist()
        _TOKEN_STORES.append(toks_flat)
        _TOKEN_STORES.append(ranked)
        _TOKEN_STORES.append(toks)
    ta = toks.select(col(id_col).alias("id_a"), col("tokens").alias("tok_a"))
    tb = toks.select(col(id_col).alias("id_b"), col("tokens").alias("tok_b"))
    inter = F.size(F.array_intersect("tok_a", "tok_b"))
    containment = inter.cast("double") / F.least(F.size("tok_a"), F.size("tok_b"))
    return (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .select("id_a", "id_b", containment.alias("containment"))
        .filter(col("containment") >= threshold)
    )


#: The single live verify-side token cache (see _verified_pairs).
#: Mutations hold _TOKEN_STORES_LOCK: driver apps routinely run
#: concurrent actions from multiple threads, and an unguarded
#: pop/unpersist race could double-unpersist or leak a store.
#: Interleaving caveat (documented contract): starting a second
#: dedup pipeline evicts the first's cache, so two lazy pipelines
#: materialized alternately forfeit the broadcast-vs-SMJ benefit —
#: correctness survives (Spark recomputes the tokens), only the
#: cache hit is lost. Materialize one pipeline before starting the
#: next to keep it.
_TOKEN_STORES: list[DataFrame] = []
_TOKEN_STORES_LOCK = threading.Lock()


def release_token_stores() -> None:
    """Unpersist the verify-side token cache the last
    minhash_near_dups / minhash_containment_pairs call left behind.
    Call after materializing the returned pairs in long-lived
    sessions; harmless if nothing is cached. Thread-safe."""
    with _TOKEN_STORES_LOCK:
        while _TOKEN_STORES:
            _TOKEN_STORES.pop().unpersist()


def _verified_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    k: int,
    bands: int,
    measure: str,
) -> DataFrame:
    # Fused signature+banding in ONE Python stage (r13): same bytes as
    # band_keys(minhash_signatures(...)) — see minhash_band_keys — the
    # wide signature array never crosses Arrow and the 16-way JVM md5
    # expression chain is gone.
    banded = minhash_band_keys(docs, id_col, text_col, k, bands)
    cands = _pairs_from_banded(banded, id_col)
    # Pin verify parallelism: the candidate list is BYTE-small but each
    # row costs an array intersection, and AQE coalesces post-shuffle
    # partitions by bytes — without an explicit width the whole verify
    # stage lands on one core. A numbered repartition is exempt from
    # AQE coalescing.
    try:
        width = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        # round-robin, NOT by key: a hash repartition on (id_a, id_b) is
        # optimizer-eliminated as redundant with the distinct's own
        # partitioning, putting the stage back under AQE coalescing.
        cands = cands.repartition(width)
    except (TypeError, ValueError):
        pass  # non-numeric conf (e.g. "auto"): keep the planner's choice

    # Verify on HASHED token sets (xxhash64 → long): set semantics are
    # identical to string tokens (64-bit collisions are ~1e-16 per
    # pair), while the shuffle ships 8-byte longs instead of strings
    # and the per-pair intersection compares longs, not UTF-8.
    toks = docs.select(
        col(id_col),
        F.array_distinct(
            F.transform(
                F.filter(F.split(F.lower(col(text_col)), r"\s+"), lambda x: x != ""),
                lambda x: F.xxhash64(x),
            )
        ).alias("tokens"),
    )
    # Tokenize ONCE via persist(), NOT localCheckpoint: both stop the
    # scan + split + hash running twice (toks feeds the ta and tb join
    # branches, and Spark reuses exchanges, not subplans), but a
    # checkpoint replaces the plan with a stats-less RDD, which forces
    # the planner into two sort-merge joins of the (potentially huge)
    # candidate list. persist() keeps the child's size statistics, so
    # a small token store broadcasts — the verify becomes two map-side
    # hash joins — while a corpus-scale store still gets the
    # shuffle-on-id SMJ it needs (at the sf1 rehearsal the SMJ path
    # sorts the 27M-row candidate list twice just to verify it).
    # Cache lifetime: persist() has no scope — without cleanup every
    # minhash_near_dups/containment call would pin another token store
    # in executor memory for the session lifetime. Keep at most ONE
    # live store (evict the previous call's on entry); a still-lazy
    # earlier result just recomputes its tokens — correctness never
    # rides on the cache. release_token_stores() drops the last one.
    toks = toks.persist()
    with _TOKEN_STORES_LOCK:
        while _TOKEN_STORES:
            _TOKEN_STORES.pop().unpersist()
        _TOKEN_STORES.append(toks)
    ta = toks.select(col(id_col).alias("id_a"), col("tokens").alias("tok_a"))
    tb = toks.select(col(id_col).alias("id_b"), col("tokens").alias("tok_b"))
    inter = F.size(F.array_intersect("tok_a", "tok_b"))
    if measure == "containment":
        denom = F.least(F.size("tok_a"), F.size("tok_b"))
    else:
        denom = F.size("tok_a") + F.size("tok_b") - inter
    return (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .select("id_a", "id_b", (inter.cast("double") / denom).alias(measure))
        .filter(col(measure) >= threshold)
    )


@pandas_udf(LongType())
def _simhash64_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched 64-bit SimHash over whitespace tokens (md5-based).

    The per-token bit voting is numpy-vectorized: unpack each 64-bit
    token hash into a (n_tokens, 64) sign matrix and column-sum —
    a pure-Python bit loop here measured ~4x slower at sf0.1.
    """
    import hashlib

    import numpy as np

    shifts = np.arange(64, dtype=np.uint64)
    # natural-language token frequency is Zipfian: hash each DISTINCT
    # token once per Arrow batch
    cache: dict[str, int] = {}

    def tok_hash(tok: str) -> int:
        v = cache.get(tok)
        if v is None:
            v = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            cache[tok] = v
        return v

    out = []
    for t in texts:
        toks = (t or "").lower().split()
        if not toks:
            out.append(0)
            continue
        hs = np.fromiter(
            (tok_hash(tok) for tok in toks),
            dtype=np.uint64,
            count=len(toks),
        )
        bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)  # (n, 64)
        counters = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        sig = int(((counters > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
        # wrap to signed int64 for Spark LongType
        out.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
    return pd.Series(out, dtype="int64")


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc 64-bit SimHash fingerprint (vectorized pandas UDF).

    Near-dups have small Hamming distance; pair search buckets on
    16-bit chunks (any pair within Hamming ≤ 3 of 64 bits shares at
    least one of 4 exact chunks — the standard pigeonhole trick).
    """
    return _fan_out(docs).select(col(id_col), _simhash64_udf(col(text_col)).alias("simhash"))


def simhash_near_dups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs via 4×16-bit chunk bucketing + Hamming verify."""
    sigs = simhash64(docs, id_col, text_col)
    chunks = sigs.select(
        col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        lit(i).alias("chunk_idx"),
                        F.shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFF)).alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select(col(id_col), "simhash", col("c.chunk_idx"), col("c.chunk"))
    # Materialize before the self-join: the two join branches are
    # otherwise separate copies of the whole upstream plan, so the
    # SimHash UDF would run twice (same idiom and rationale as
    # lsh_candidate_pairs' banded store). The chunk table is 4 narrow
    # rows per doc — the signature store an incremental pipeline
    # persists anyway.
    chunks = materialize(chunks)
    a, b = chunks.alias("a"), chunks.alias("b")
    hamming = F.bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
    return (
        a.join(
            b,
            (col("a.chunk_idx") == col("b.chunk_idx"))
            & (col("a.chunk") == col("b.chunk"))
            & (col(f"a.{id_col}") < col(f"b.{id_col}")),
        )
        .select(
            col(f"a.{id_col}").alias("id_a"),
            col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(col("hamming") <= max_hamming)
        .distinct()
    )


def incremental_candidate_pairs(
    new_sigs: DataFrame,
    all_sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    k: int = 64,
) -> DataFrame:
    """Asymmetric LSH candidate join: banded-NEW × banded-(store ∪ new).

    The store side appears exactly once in this plan and is never
    self-joined — per-batch cost scales with the batch. Store rows are
    pruned to the buckets the batch touches via a broadcast semi-join
    on the batch's (band, band_hash) set BEFORE any shuffle. Pairs are
    emitted as (least, greatest) so a new doc with a lower id than a
    stored doc still pairs (either-side-new contract).
    """
    banded_new = band_keys(new_sigs, id_col, bands, k=k)
    banded_all = band_keys(all_sigs, id_col, bands, k=k)
    new_buckets = banded_new.select("band", "band_hash").distinct()
    touched = banded_all.join(F.broadcast(new_buckets), ["band", "band_hash"], "left_semi")
    n, t = banded_new.alias("n"), touched.alias("t")
    return (
        n.join(
            t,
            (col("n.band") == col("t.band"))
            & (col("n.band_hash") == col("t.band_hash"))
            & (col(f"n.{id_col}") != col(f"t.{id_col}")),
        )
        .select(
            F.least(col(f"n.{id_col}"), col(f"t.{id_col}")).alias("id_a"),
            F.greatest(col(f"n.{id_col}"), col(f"t.{id_col}")).alias("id_b"),
        )
        .distinct()
    )


def incremental_near_dups(
    spark,
    new_docs: DataFrame,
    signature_store: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    k: int = 64,
    bands: int = 16,
    checkpoint_mode: str | None = None,
    store_epoch: int | None = None,
) -> DataFrame:
    """Incremental MinHash dedup against a persistent signature table.

    The production shape at 100 TB: signatures are computed ONCE per
    document and stored (parquet at `signature_store`, at scale
    partitioned by band hash); each new batch
      1. signs only the NEW documents (map-only),
      2. bands the NEW signatures and joins banded-new × banded-store —
         the store is never self-joined, and store rows are pruned to
         the buckets the batch actually touches (broadcast semi-join on
         the batch's bucket keys) before any shuffle, so per-batch join
         cost scales with the BATCH, not the corpus,
      3. appends the new signatures to the store.
    Returns candidate pairs (id_a, id_b, estimated_jaccard) where at
    least one side is new — regardless of id ordering across batches
    (a new doc with a LOWER id than a stored doc still pairs, because
    the new side is always one leg of the join); estimate = fraction of
    matching minhashes (exact-verify downstream needs the text of both
    sides, which the store deliberately does not carry).

    Determinism: signatures depend only on (text, seed), so the store
    can be rebuilt or extended in any order and matching is stable.

    ``store_epoch`` (streaming recovery contract): when set, the
    batch's signatures are written to ``epoch=<n>/`` with OVERWRITE
    instead of appended, and store rows from that same epoch are
    EXCLUDED from matching — so a micro-batch replayed after a crash
    (signatures landed, checkpoint commit didn't) sees exactly the
    pre-crash store, overwrites its own partial write, and emits the
    same pairs. This is what makes
    ``streaming.windows.stream_incremental_dedup`` exactly-once
    end-to-end under restart.
    """
    import os

    new_sigs = minhash_signatures(new_docs, id_col, text_col, k)
    store_exists = os.path.exists(signature_store)
    if store_exists:
        old_sigs = spark.read.parquet(signature_store)
        if "epoch" in old_sigs.columns:
            if store_epoch is not None:
                old_sigs = old_sigs.filter(col("epoch") != store_epoch)
            old_sigs = old_sigs.drop("epoch")
        all_sigs = old_sigs.unionByName(new_sigs)
    else:
        all_sigs = new_sigs

    fresh = incremental_candidate_pairs(new_sigs, all_sigs, id_col, bands, k)

    sa = all_sigs.select(col(id_col).alias("id_a"), col("signature").alias("sig_a"))
    sb = all_sigs.select(col(id_col).alias("id_b"), col("signature").alias("sig_b"))
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        ).cast("double")
        / F.lit(k)
    )
    out = (
        fresh.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", est.alias("estimated_jaccard"))
        .filter(col("estimated_jaccard") >= threshold)
    )

    # write the store AFTER the read plan is fixed (parquet re-list
    # would otherwise see the new files mid-query on some filesystems)
    out = materialize(out, checkpoint_mode)
    if store_epoch is not None:
        new_sigs.write.mode("overwrite").parquet(
            os.path.join(signature_store, f"epoch={int(store_epoch)}")
        )
    else:
        new_sigs.write.mode("append").parquet(signature_store)
    return out


def default_cell_cap(task_budget_bytes: int = 2 * 1024**3) -> int:
    """The largest per-task Gram group a memory budget allows: a group
    of n float64 vectors builds an n×n similarity matrix (8 bytes per
    entry), so ``n = floor(sqrt(budget / 8))`` — 16,384 rows for the
    default 2 GiB task budget (a 16k² Gram peaks at ~2.1 GiB). This is
    the production ``max_cell_size`` (VERDICT r9 #1): the previous
    wired constant of 200k would have let one task attempt a 320 GB
    Gram."""
    import math

    return int(math.sqrt(task_budget_bytes / 8))


def semantic_dedup(
    assigned: DataFrame,
    threshold: float = 0.35,
    max_cell_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "q",
) -> DataFrame:
    """SemDeDup pruning over IVF-assigned embeddings (Abbas et al.
    2023): within each cell, every vector with a LOWER-id neighbor at
    cosine ≥ ``threshold`` is marked dropped (greedy keep-first —
    deterministic, no transitive closure). Input: (id, list_id, vec);
    output: (id, list_id, keep).

    Pairwise work is a per-GROUP Gram matrix in ``applyInPandas`` —
    quadratic in the group, so the group must stay bounded.
    ``max_cell_size`` is the hot-cell cap (VERDICT r8 #5): cells whose
    count exceeds it are salted into ``ceil(count/max)`` sub-cells by
    a deterministic md5 id hash BEFORE the applyInPandas, so a skewed
    embedding distribution (or a degenerate centroid set) can never
    hand one task a corpus-sized Gram. ``None`` (the default) derives
    the cap from a 2 GiB task-memory budget via
    :func:`default_cell_cap` (~16k rows — VERDICT r9 #1); pass ``0``
    to disable capping entirely. Salting is the split that still
    works when a mega-cell is one giant duplicate group — identical
    vectors defeat any geometry-based sub-clustering. Documented
    recall tradeoff: duplicates that land in different sub-cells are
    not compared, so a duplicate group spanning a split cell keeps one
    representative PER sub-cell (≤ ceil(count/max) survivors instead
    of 1); cells at or under the cap are untouched, byte-identical to
    the uncapped semantics. At 100 TB the first-order defense is a
    centroid count that scales with the corpus (SemDeDup uses ~10k
    cells); the cap is the guardrail for the skew that survives it.

    The salting is fully declarative (VERDICT r9 "what's wrong" #3 —
    the old path ran a separate count+collect job even when no cell
    was hot): per-cell counts join back broadcast-style (the count
    table has one row per cell — broadcast-sized at any corpus scale)
    and the sub-cell id is an md5 hash of the id, so the capped
    semantics replay exactly in any engine (the ``d_semantic_dedup``
    oracle models the cap in SQL) and no driver action runs at all.
    """
    import numpy as np

    if max_cell_size is None:
        max_cell_size = default_cell_cap()
    if max_cell_size:
        cnts = assigned.groupBy("list_id").agg(F.count("*").alias("__cnt"))
        n_sub = F.expr(f"(__cnt + {int(max_cell_size)} - 1) div {int(max_cell_size)}")
        # md5-derived sub-cell: stable across engines and partitionings
        # (xxhash64 is Spark-private — the oracle could not replay it)
        id_hash = F.conv(
            F.substring(F.md5(col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        salted = (
            assigned.join(F.broadcast(cnts), "list_id")
            .withColumn(
                "_sub",
                F.when(
                    col("__cnt") > max_cell_size, F.pmod(id_hash, n_sub)
                ).otherwise(lit(0)),
            )
            .drop("__cnt")
        )
    else:
        salted = assigned.withColumn("_sub", lit(0))
    salted = salted.withColumn("_sub", col("_sub").cast("int"))

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        E = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        n = np.sqrt((E * E).sum(axis=1))
        n[n == 0.0] = 1.0
        # same op order as the SQL oracle: dot / (sqrt * sqrt)
        S = (E @ E.T) / (n[:, None] * n[None, :])
        has_lower_dup = np.tril(S >= threshold, -1).any(axis=1)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "list_id": pdf["list_id"],
                "keep": ~has_lower_dup,
            }
        )

    return salted.groupBy("list_id", "_sub").applyInPandas(
        prune, f"{id_col} long, list_id int, keep boolean"
    )
