"""Pin the xxhash64 re-keying collision-exposure contract (VERDICT r12
"What's wrong" #3; analysis lives next to
``llm.dedup.XXHASH64_EXACT_SAFE_DISTINCT``).

The dedup/containment/span operators ship 8-byte xxhash64 keys for
pure-intermediate tokens/grams/windows. These tests pin the birthday
arithmetic the in-code contract quotes, so the documented threshold
cannot silently drift from the math: expected colliding pairs among n
distinct keys under a b-bit hash is C(n,2)/2^b ≈ n²/2^(b+1).
"""

from __future__ import annotations

from doin_fine_ance__spark.llm.dedup import XXHASH64_EXACT_SAFE_DISTINCT


def expected_collisions(n: float, bits: int) -> float:
    return (n * (n - 1)) / 2.0 / float(2**bits)


def test_threshold_is_the_half_collision_point():
    # The documented threshold is calibrated to E[collisions] ≈ 0.5 —
    # the point where a 64-bit key stops being "exact in practice".
    e = expected_collisions(XXHASH64_EXACT_SAFE_DISTINCT, 64)
    assert 0.4 < e < 0.6


def test_driver_scale_is_far_under_the_bound():
    # The registered queries see ≤ ~2e6 distinct grams/windows/tokens
    # per invocation at the driver SFs; even at 1e7 the expected
    # collision count is negligible (< 1e-5), which is why the
    # md5-keyed DuckDB oracles stay hash-exact against the
    # xxhash64-keyed engine.
    assert expected_collisions(1e7, 64) < 1e-5


def test_100tb_regime_violates_64_bits_but_not_128():
    # At the 100 TB north star (1e11-1e12 distinct grams) a single
    # 64-bit key GUARANTEES collisions — the documented reason the
    # contract demands a 128-bit struct key above the threshold —
    # while a 128-bit pair keeps E far below one everywhere.
    assert expected_collisions(1e12, 64) > 1e4
    assert expected_collisions(1e12, 128) < 1e-14
