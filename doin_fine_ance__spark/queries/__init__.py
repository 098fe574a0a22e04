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
# coverage only. Round-6 rotation (per VERDICT.md r5 "Next round" #3;
# the planned r5 rotation never happened — r5's window was byte-equal
# to r4's): the four aggregation anchors swapped out in the r4
# mid-round amendment (a3/a4/a6/a7 — the ONLY queries whose newest
# driver row is still r2) lead; the four r4 dedup additions keep their
# slots per the verdict; the remaining 42 slots refresh the oldest r3
# evidence — all 29 queries first (and last) seen in the r3 window,
# plus 13 of the 19 r3-window repeats (the 6 left out — a1, a2, a5,
# a12, a13, w1 — each already hold three green driver rows, r1+r2+r3).
# After this round no registered query's newest driver row predates
# r3. The rows-only `a_approx_distinct_users` stays out (it can never
# hash-match). Per-round membership is tracked in WINDOWS.md.
# Everything out of window stays registered, plan-audited, and
# oracle-checked by tests/test_inventory_oracle.py +
# tools/sweep_correctness.py.
DRIVER_WINDOW: list[str] = [
    # --- newest driver row r2 (swapped out in the r4 amendment) ---
    "a3_yearly_spend_by_category",
    "a4_quarterly_spend",
    "a6_count_total",
    "a7_distinct_categories",
    # --- r4 dedup additions, kept per VERDICT r5 #3 ---
    "d_minhash_containment",
    "d_duplicate_spans",
    "d_span_scrub",
    "d_semantic_dedup",
    # --- newest driver row r3: TPC-H probes first seen r3 ---
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
    # --- newest driver row r3: LLM text/corpus/dedup/ANN/multimodal/streaming ---
    "t_repetition_filter",
    "t_pii_redaction",
    "d_decontaminate",
    "t_sequence_packing",
    "t_stratified_sample",
    "t_shuffle_order",
    "t_domain_mix",
    "a_exact_percentiles",
    "t_doc_fingerprint",
    "t_token_count_bpe",
    "t_top_tokens",
    "t_bigram_familiarity",
    "t_simhash_fingerprints",
    "d_incremental_neardups",
    "s_cosine_topk_lsh",
    "mm_image_resize",
    "mm_video_frame_sample",
    "st_interval_join",
    # --- newest driver row r3: inventory repeats (13 of 19) ---
    "w2_rownum_md5_surrogate",
    "w4_w5_reconnection_dedup",
    "j1_mapping_join_disjunctive",
    "j3_override_coalesce_overlay",
    "j8_incremental_anti_append",
    "j10_nullsafe_equality_join",
    "p3_uncategorized_anti_join",
    "p4_exclusion_patterns_anti",
    "o1_pagination_offset",
    "u1_union_two_sources",
    "f_feature_engineering",
    "f15_json_extraction",
    "m7_calibration_curve",
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
