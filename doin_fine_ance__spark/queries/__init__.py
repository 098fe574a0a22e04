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
    # --- no driver row yet: first verification ---
    "st_stream_static_enrich",
    "q2_min_cost_supplier",
    "q16_supplier_part_type_counts",
    "q20_dominant_supplier_semi",
    "t_temperature_mix",
    "t_token_shards",
    # --- newest driver row r3 (rested in r6 at 3 green rows) ---
    "a1_monthly_spend_by_category",
    "a2_monthly_net_change",
    "a5_pivot_month_by_status",
    "a12_cumulative_monthly_net",
    "a13_prediction_stats",
    "w1_latest_import_dedup",
    # --- newest driver row r5: TPC-H probes ---
    "q1_pricing_summary",
    "q3_top_unshipped_orders",
    "q4_priority_semi_join",
    "q5_region_revenue_rollup",
    "q6_forecast_revenue",
    "q13_customer_order_distribution",
    "q14_promo_revenue_ratio",
    "q18_large_volume_customers",
    # --- newest driver row r5: analytics/join probes ---
    "a_cube_status_priority",
    "a_rollup_region_nation",
    "a_count_distinct_users",
    "a_event_funnel",
    "w_lead_lag_session_count",
    "j_salted_skew_join",
    "j_asof_purchase_last_view",
    "j_range_price_bands",
    # --- newest driver row r5: finance inventory ---
    "a8_connection_health_rollup",
    "a9_data_range_check",
    "a11_class_distribution",
    "p1_projection_literals",
    "p6_dynamic_where_search",
    "j9_latest_import_per_account",
    "o2_sort_nulls_last_top",
    # --- newest driver row r5: LLM text/dedup/ANN/multimodal/streaming ---
    "t_token_budget_select",
    "t_winnowing_fingerprints",
    "d_exact_dedup",
    "d_segment_dedup",
    "d_ngram_jaccard_pairs",
    "d_dup_clusters",
    "d_simhash_neardups",
    "s_cosine_topk_ivf",
    "s_cosine_topk_bruteforce",
    "d_embedding_cosine_neardups",
    "mm_media_features",
    "mm_audio_features",
    "st_tumbling_window",
    "st_sliding_window",
    "st_session_window",
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
