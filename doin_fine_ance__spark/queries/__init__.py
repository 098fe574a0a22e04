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
# coverage only. Round-10 rotation (VERDICT r9 #3): the five round-9
# second-sitting registrations take their FIRST driver rows
# (t_chunk_overlap, g_pagerank_nation_trade, a_heavy_hitters_cms,
# a_cms_rollup_merge, d_bloom_prescreen — registered after the r9
# window froze, oracle-green at sf0.001/sf0.01/sf1/sf1-skew since);
# d_semantic_dedup stays in because its code changed this round (the
# memory-derived declarative hot-cell cap, VERDICT r9 #1); the ten
# queries rested at r7 evidence come back (a1/a2/a5/a12/a8/a11/j9/
# o2/p1/p6); the remaining 34 slots refresh the r8-evidence queries
# with the FEWEST total green rows — all six two-row r7 first-timers,
# every three-row query except the two rested below, and
# d_minhash_containment (whose recall path gains evidence this round,
# VERDICT r9 next #4). Rested at r8 evidence (3-5 green rows each):
# the eight r8 leaders (d_minhash_lsh_neardups, t_token_count,
# t_quality_score, t_lang_id_heuristic, o5, f8_f9, o3, f16), the four
# aggregation anchors a3/a4/a6/a7, d_duplicate_spans,
# s_cosine_topk_ivf, a_exact_percentiles, t_doc_fingerprint (its
# rolling-hash family is redundantly covered by
# t_winnowing_fingerprints, refreshed in r9). After this round no
# registered query's newest driver row predates r8. The rows-only
# `a_approx_distinct_users` stays out (it can never hash-match;
# quantitative accuracy evidence lives in HLL_ERROR_r09.json +
# tests/test_operators_extra.py).
# Per-round membership is tracked in WINDOWS.md. Everything out of
# window stays registered, plan-audited, and oracle-checked by
# tests/test_inventory_oracle.py + tools/sweep_correctness.py.
DRIVER_WINDOW: list[str] = [
    # --- round-9 second-sitting registrations: first driver rows ---
    "t_chunk_overlap",
    "g_pagerank_nation_trade",
    "a_heavy_hitters_cms",
    "a_cms_rollup_merge",
    "d_bloom_prescreen",
    # --- code changed this round (hot-cell cap): re-verify ---
    "d_semantic_dedup",
    # --- rested at r7 evidence: come back ---
    "a1_monthly_spend_by_category",
    "a2_monthly_net_change",
    "a5_pivot_month_by_status",
    "a12_cumulative_monthly_net",
    "a8_connection_health_rollup",
    "a11_class_distribution",
    "j9_latest_import_per_account",
    "o2_sort_nulls_last_top",
    "p1_projection_literals",
    "p6_dynamic_where_search",
    # --- newest driver row r8, fewest green rows: refresh ---
    "st_stream_static_enrich",
    "q2_min_cost_supplier",
    "q16_supplier_part_type_counts",
    "q20_dominant_supplier_semi",
    "t_temperature_mix",
    "t_token_shards",
    "d_decontaminate",
    "d_incremental_neardups",
    "mm_image_resize",
    "mm_video_frame_sample",
    "s_cosine_topk_lsh",
    "st_interval_join",
    "q7_volume_shipping_pairs",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q10_returned_revenue_customers",
    "q11_global_threshold_having",
    "q12_shipmode_priority_counts",
    "q15_top_supplier_revenue",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicate_join",
    "q21_waiting_supplier_shape",
    "q22_dormant_customer_balance",
    "t_repetition_filter",
    "t_pii_redaction",
    "t_sequence_packing",
    "t_stratified_sample",
    # --- round-10 registrations (mid-round amendment, r4/r7
    # precedent): swapped in for t_shuffle_order / t_domain_mix /
    # t_simhash_fingerprints / t_top_tokens, which keep their green
    # r8 rows ---
    "d_containment_prefix",
    "mm_image_neardups",
    "mm_jpeg_roundtrip",
    "t_bm25_more_like_this",
    "t_bigram_familiarity",
    "t_token_count_bpe",
    "d_minhash_containment",
]


def load_registry() -> tuple[dict, dict]:
    """Import every query module, then order the registry so the
    driver's 50-query verification window covers DRIVER_WINDOW."""
    from . import analytics  # noqa: F401
    from . import corpus_ops  # noqa: F401
    from . import inventory  # noqa: F401
    from . import llm_ops  # noqa: F401
    from . import pipeline_extra  # noqa: F401
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
