"""Operator-inventory query registry.

Every operator claimed in SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable, usually paired with an
ANSI-SQL oracle string the driver runs on DuckDB over the same parquet
tables. ``__spark_entry__.queries()`` / ``oracle_sql()`` re-export
these dicts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register an inventory query (and optionally its DuckDB oracle)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The external driver verifies the FIRST 50 registered queries against
# their DuckDB oracles; the rest keep local pytest + tests/oracle.py
# coverage only. Round-7 rotation: the six queries with NO driver row
# yet lead (st_stream_static_enrich, registered r6 after the r6 window
# froze; the round-7 TPC-H additions q2/q16/q20; and the round-7
# selection ops t_temperature_mix/t_token_shards, swapped in mid-round
# per the r4-amendment precedent); the six queries whose newest driver
# row is still r3 (left out of the r6 rotation at three green rows
# each) come back; the remaining 38 slots refresh 38 of the 46 queries
# whose newest row is r5 (the r4/r5 window members not kept in r6).
# Left at r5 evidence — each already holds 3-4 green driver rows:
# d_minhash_lsh_neardups (4: r2-r5), t_token_count, t_quality_score,
# t_lang_id_heuristic, o5_top5_categories, f8_f9_timestamp_conversions,
# o3_latest_one, f16_array_membership. After this round no registered
# query's newest driver row predates r5, and every oracle-backed query
# has at least one green row. The rows-only
# `a_approx_distinct_users` stays out (it can never hash-match).
# Per-round membership is tracked in WINDOWS.md. Everything out of
# window stays registered, plan-audited, and oracle-checked by
# tests/test_inventory_oracle.py + tools/sweep_correctness.py.
DRIVER_WINDOW: list[str] = [
    # --- round 8: newest driver row r5 — the oldest evidence in the
    # registry leads (VERDICT r7 #2) ---
    "d_minhash_lsh_neardups",
    "t_token_count",
    "t_quality_score",
    "t_lang_id_heuristic",
    "o5_top5_categories",
    "f8_f9_timestamp_conversions",
    "o3_latest_one",
    "f16_array_membership",
    # --- r7 first-timers keep a slot for a second consecutive row ---
    "st_stream_static_enrich",
    "q2_min_cost_supplier",
    "q16_supplier_part_type_counts",
    "q20_dominant_supplier_semi",
    "t_temperature_mix",
    "t_token_shards",
    # --- code touched in r8 (zero-norm scoring guard): re-verify ---
    "s_cosine_topk_ivf",
    # --- newest driver row r6, 2 green rows: refresh ---
    "a_exact_percentiles",
    "d_decontaminate",
    "d_incremental_neardups",
    "mm_image_resize",
    "mm_video_frame_sample",
    "q10_returned_revenue_customers",
    "q11_global_threshold_having",
    "q12_shipmode_priority_counts",
    "q15_top_supplier_revenue",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicate_join",
    "q21_waiting_supplier_shape",
    "q22_dormant_customer_balance",
    "q7_volume_shipping_pairs",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "s_cosine_topk_lsh",
    "st_interval_join",
    "t_bigram_familiarity",
    "t_doc_fingerprint",
    "t_domain_mix",
    "t_pii_redaction",
    "t_repetition_filter",
    "t_sequence_packing",
    "t_shuffle_order",
    "t_simhash_fingerprints",
    "t_stratified_sample",
    "t_token_count_bpe",
    "t_top_tokens",
    # --- newest driver row r6, 3 green rows: refresh ---
    "a3_yearly_spend_by_category",
    "a4_quarterly_spend",
    "a6_count_total",
    "a7_distinct_categories",
    "d_duplicate_spans",
    "d_minhash_containment",
]


def load_registry() -> tuple[dict, dict]:
    """Import every query module, then order the registry so the
    driver's 50-query verification window covers DRIVER_WINDOW."""
    from . import analytics  # noqa: F401
    from . import corpus_ops  # noqa: F401
    from . import inventory  # noqa: F401
    from . import llm_ops  # noqa: F401
    from . import streaming_batch  # noqa: F401
    from . import tpch_extra  # noqa: F401

    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names not registered: {missing}")
    ordered = list(DRIVER_WINDOW) + [n for n in QUERIES if n not in set(DRIVER_WINDOW)]
    for d in (QUERIES, ORACLES):
        tail = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(tail)
    return QUERIES, ORACLES
