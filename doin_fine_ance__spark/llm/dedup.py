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
stored signature table) valid.
"""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit, pandas_udf
from pyspark.sql.types import LongType

# Mersenne prime 2^61-1: standard choice for minhash permutations.
_P = (1 << 61) - 1
_rng = random.Random(42)
# (a, b) coefficients for k=64 hash permutations, fixed at import time.
PERM_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, _P), _rng.randrange(0, _P)) for _ in range(64)
]


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 64, n: int = 5
) -> DataFrame:
    """doc → k-wide minhash signature (array<string>), all JVM-side.

    Character n-gram shingles of the whitespace-normalized lowered text
    are hashed to 52-bit ints via an md5 prefix (13 hex digits —
    engine-stable, and small enough that a·x+b fits decimal(38)
    arithmetic exactly); signature[i] = min over shingles of
    (a_i·x + b_i) mod p.
    """
    norm = f"regexp_replace(lower({text_col}), '\\\\s+', ' ')"
    with_sh = docs.select(
        col(id_col),
        F.expr(
            f"array_distinct(transform(sequence(1, greatest(length({norm}) - {n - 1}, 1)),"
            f" i -> conv(substring(md5(substring({norm}, i, {n})), 1, 13), 16, 10)))"
        )
        .cast("array<decimal(38,0)>")
        .alias("_shingles"),
    )
    def _perm(a: int, b: int):
        # closure factory: a default-arg lambda would change the visible
        # arity and break PySpark's higher-order-function binding
        return lambda x: (x * lit(a) + lit(b)) % lit(_P)

    sig_elems = [
        F.array_min(F.transform(col("_shingles"), _perm(a, b)))
        .cast("decimal(38,0)")
        .cast("string")
        .alias(f"_h{i}")
        for i, (a, b) in enumerate(PERM_COEFFS[:k])
    ]
    return with_sh.select(col(id_col), F.array(*sig_elems).alias("signature"))


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str = "doc_id", bands: int = 16
) -> DataFrame:
    """Band the signatures and emit candidate pairs per bucket.

    One shuffle on (band index, band hash); within-bucket self-join with
    ``id_a < id_b`` dedup. Bucket sizes are bounded in practice (equal
    band hash ⇒ near-identical prefix), so the join is skew-safe; AQE
    splits pathological buckets.
    """
    k = signatures.select(F.size("signature")).first()[0]
    r = k // bands
    banded = signatures.select(
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
    """
    sigs = minhash_signatures(docs, id_col, text_col, k)
    cands = lsh_candidate_pairs(sigs, id_col, bands)

    toks = docs.select(
        col(id_col),
        F.array_distinct(
            F.filter(F.split(F.lower(col(text_col)), r"\s+"), lambda x: x != "")
        ).alias("tokens"),
    )
    ta = toks.select(col(id_col).alias("id_a"), col("tokens").alias("tok_a"))
    tb = toks.select(col(id_col).alias("id_b"), col("tokens").alias("tok_b"))
    inter = F.size(F.array_intersect("tok_a", "tok_b"))
    union = F.size("tok_a") + F.size("tok_b") - inter
    return (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .select("id_a", "id_b", (inter.cast("double") / union).alias("jaccard"))
        .filter(col("jaccard") >= threshold)
    )


@pandas_udf(LongType())
def _simhash64_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched 64-bit SimHash over whitespace tokens (md5-based)."""
    import hashlib

    out = []
    for t in texts:
        counters = [0] * 64
        for tok in (t or "").lower().split():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            for bit in range(64):
                counters[bit] += 1 if (h >> bit) & 1 else -1
        sig = 0
        for bit in range(64):
            if counters[bit] > 0:
                sig |= 1 << bit
        # wrap to signed int64 for Spark LongType
        out.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
    return pd.Series(out, dtype="int64")


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc 64-bit SimHash fingerprint (vectorized pandas UDF).

    Near-dups have small Hamming distance; pair search buckets on
    16-bit chunks (any pair within Hamming ≤ 3 of 64 bits shares at
    least one of 4 exact chunks — the standard pigeonhole trick).
    """
    return docs.select(col(id_col), _simhash64_udf(col(text_col)).alias("simhash"))


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
