"""The finance model DAG: staging → intermediate → marts.

Each model is a pure function ``DataFrame(s) -> DataFrame`` mirroring
one dbt model of the reference (cited per function). The reference
materializes these as Postgres *views* so every serving read re-runs
the whole chain; at 100 TB that's untenable, so our default is eager
materialization via :mod:`doin_fine_ance__spark.plans.build` — but the
functions themselves are lazy DataFrame graphs either way, and
Catalyst collapses the chain (projection/filter pushdown through all
layers) exactly like Postgres inlines views.

Spark-first choices:
- mapping seeds and exclusion patterns are broadcast (tiny dims);
- the dedup windows shuffle once on their key sets;
- NOT IN subqueries are authored as left_anti joins from the start;
- money stays DecimalType(18,2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from ..functions.pg import KEYWORD_PATTERNS, amount_bucket, ilike, normalize_account_name
from ..operators.dedup import latest_wins, reconnection_dedup, rownum_disambiguate

MISSING_MAPPING = "Missing mapping! Add to seed_account_mapping_simplefin.csv"
MISSING_MAPPING_HISTORIC = "Missing mapping! Add to seed_account_mapping_historic.csv"


def stg_simplefin(
    simplefin: DataFrame,
    account_mapping: DataFrame,
    transaction_exclusions: DataFrame,
) -> DataFrame:
    """Staging for SimpleFIN rows (dbt stg_simplefin.sql, whole file).

    Pipeline: exclusion anti-join (ILIKE patterns) → broadcast mapping
    join with disjunctive ON → typed casts → latest-import dedup per
    transaction_id → two-layer reconnection dedup.
    """
    src = simplefin

    # NOT EXISTS (pattern ILIKE description) — stg_simplefin.sql:51-55.
    src = src.join(
        F.broadcast(transaction_exclusions.select("pattern")),
        ilike(src.description, col("pattern")),
        "left_anti",
    )

    # LEFT join account mapping: equi on name AND (mapping id null/'' or
    # ids equal) — stg_simplefin.sql:44-50.
    m = account_mapping.select(
        col("account_name").alias("m_account_name"),
        col("account_id").alias("m_account_id"),
        col("mapped_account_name").alias("m_mapped_account_name"),
    )
    cond = (src.account_name == m.m_account_name) & (
        m.m_account_id.isNull()
        | (m.m_account_id == "")
        | (src.account_id == m.m_account_id)
    )
    joined = src.join(F.broadcast(m), cond, "left")

    typed = joined.select(
        "transaction_id",
        "account_id",
        "account_name",
        F.coalesce(
            col("m_mapped_account_name"),
            col("account_name"),
            lit(MISSING_MAPPING),
        ).alias("mapped_account_name"),
        "institution_domain",
        "institution_name",
        col("amount").cast("decimal(18,2)").alias("amount"),
        F.timestamp_seconds(col("posted")).alias("posted"),
        col("posted_date").cast("date").alias("posted_date"),
        F.timestamp_seconds(col("transacted_at")).alias("transacted_at"),
        col("transacted_date").cast("date").alias("transacted_date"),
        "description",
        "pending",
        col("import_timestamp").cast("timestamp").alias("import_timestamp"),
        col("import_date").cast("timestamp").alias("import_date"),
    )

    # Dedup layer 1: one row per transaction_id, latest import wins
    # (stg_simplefin.sql:39-42,61-63).
    unique_txns = latest_wins(
        typed, ["transaction_id"], [col("import_timestamp").desc()]
    )

    # Dedup layer 2: collapse reconnection duplicates
    # (stg_simplefin.sql:82-118). Logical key = institution + normalized
    # account name + date + amount + description; group = account_id.
    with_norm = unique_txns.withColumn(
        "_normalized_account_name", normalize_account_name("account_name")
    )
    deduped = reconnection_dedup(
        with_norm,
        logical_keys=[
            "institution_name",
            "_normalized_account_name",
            "transacted_date",
            "amount",
            "description",
        ],
        group_key="account_id",
        recency="import_timestamp",
    )
    return deduped.drop("_normalized_account_name")


def stg_historic_trxns(historic: DataFrame, account_mapping: DataFrame) -> DataFrame:
    """Staging for historic CSV rows (dbt stg_historic_trxns.sql, whole file).

    Mapping join with conditional second key, coalesce fallbacks, MD5
    surrogate id disambiguated by row_number, MM/DD/YYYY import dates.
    """
    m = account_mapping.select(
        col("account_name").alias("m_account_name"),
        col("additional_account_info").alias("m_additional_account_info"),
        col("mapped_account_name").alias("m_mapped_account_name"),
        col("owner_name").alias("m_owner_name"),
    )
    cond = (historic.account_name == m.m_account_name) & (
        m.m_additional_account_info.isNull()
        | (m.m_additional_account_info == "")
        | (historic.additional_account_detail == m.m_additional_account_info)
    )
    mapped = historic.join(F.broadcast(m), cond, "left").select(
        historic["*"],
        F.coalesce(
            col("m_mapped_account_name"),
            historic.account_name,
            lit(MISSING_MAPPING_HISTORIC),
        ).alias("mapped_account_name"),
        F.coalesce(
            col("m_owner_name"),
            historic.account_name,
            lit(MISSING_MAPPING_HISTORIC),
        ).alias("owner_name"),
        F.concat(
            F.coalesce(historic.account_name, lit("")),
            F.coalesce(historic.amount.cast("string"), lit("")),
            F.coalesce(historic.transaction_date, lit("")),
            F.coalesce(historic.description, lit("")),
        ).alias("base_transaction_id"),
    )

    # Disambiguate exact duplicates before hashing the surrogate id
    # (stg_historic_trxns.sql:41-51). transaction_date ordering ties are
    # broken arbitrarily in Postgres too — id stability only requires
    # the *set* of ordinals, which row_number provides.
    numbered = rownum_disambiguate(
        mapped,
        ["base_transaction_id"],
        [col("transaction_date")],
        out="duplicates_row_number",
    )

    return numbered.select(
        F.concat(
            lit("HIST_TRN_"),
            F.md5(
                F.concat(
                    col("base_transaction_id"),
                    col("duplicates_row_number").cast("string"),
                )
            ),
        ).alias("transaction_id"),
        lit(None).cast("string").alias("account_id"),
        col("account_name").alias("original_account_name"),
        col("mapped_account_name").alias("account_name"),
        col("additional_account_detail").alias("detailed_account_name"),
        "owner_name",
        lit(None).cast("string").alias("institution_domain"),
        lit(None).cast("string").alias("institution_name"),
        col("amount").cast("decimal(18,2)").alias("amount"),
        lit(None).cast("timestamp").alias("posted"),
        lit(None).cast("date").alias("posted_date"),
        lit(None).cast("timestamp").alias("transacted_at"),
        F.when(col("transaction_date").isNull(), lit(None).cast("date"))
        .otherwise(col("transaction_date").cast("date"))
        .alias("transacted_date"),
        "description",
        lit(None).cast("boolean").alias("pending"),
        "source_category",
        "master_category",
        lit(None).cast("timestamp").alias("import_timestamp"),
        F.when(
            col("input_date").isNull() | (col("input_date") == ""),
            lit(None).cast("date"),
        )
        .otherwise(F.to_date(col("input_date"), "MM/dd/yyyy"))
        .alias("import_date"),
    )


def int_trxns(stg_simplefin_df: DataFrame, stg_historic_df: DataFrame) -> DataFrame:
    """Union of the two transaction sources on the 21-column shape
    (dbt int_trxns.sql, whole file)."""
    simplefin_full = stg_simplefin_df.select(
        "transaction_id",
        "account_id",
        col("account_name").alias("original_account_name"),
        col("mapped_account_name").alias("account_name"),
        lit(None).cast("string").alias("detailed_account_name"),
        lit(None).cast("string").alias("owner_name"),
        "institution_domain",
        "institution_name",
        "amount",
        "posted",
        "posted_date",
        "transacted_at",
        "transacted_date",
        "description",
        "pending",
        lit(None).cast("string").alias("source_category"),
        lit(None).cast("string").alias("master_category"),
        "import_timestamp",
        col("import_date").cast("date").alias("import_date"),
        lit("simplefin").alias("source_name"),
    )
    historic_full = stg_historic_df.select(
        "transaction_id",
        "account_id",
        "original_account_name",
        "account_name",
        "detailed_account_name",
        "owner_name",
        "institution_domain",
        "institution_name",
        "amount",
        "posted",
        "posted_date",
        "transacted_at",
        "transacted_date",
        "description",
        "pending",
        "source_category",
        "master_category",
        "import_timestamp",
        "import_date",
        lit("historic").alias("source_name"),
    )
    return simplefin_full.unionByName(historic_full)


def _pandas_dow_from_date(c: Column) -> Column:
    """Postgres extract(dow) → pandas 0=Monday remap
    (int_trxns_features.sql:37-47)."""
    return ((F.dayofweek(c) + F.lit(5)) % 7).cast("int")


def int_trxns_features(int_trxns_df: DataFrame) -> DataFrame:
    """ML feature engineering (dbt int_trxns_features.sql, whole file).

    combined_text, pandas-dow/month/day, sign + abs + bucket amount
    features, nine keyword regex flags. All JVM built-ins.
    """
    desc_l = F.lower(F.coalesce(col("description"), lit("")))
    keyword_cols = [
        F.when(desc_l.rlike(pat), 1).otherwise(0).cast("int").alias(name)
        for name, pat in KEYWORD_PATTERNS.items()
    ]
    return int_trxns_df.select(
        "transaction_id",
        "account_id",
        "original_account_name",
        "account_name",
        "detailed_account_name",
        "owner_name",
        "institution_name",
        "amount",
        "posted_date",
        "transacted_date",
        "description",
        "pending",
        "source_category",
        "master_category",
        "import_timestamp",
        "import_date",
        "source_name",
        F.concat(
            F.coalesce(col("description"), lit("")),
            lit(" "),
            F.coalesce(col("account_name"), lit("")),
            lit(" "),
            F.coalesce(col("institution_name"), lit("")),
        ).alias("combined_text"),
        _pandas_dow_from_date(col("transacted_date")).alias("day_of_week"),
        F.month("transacted_date").cast("int").alias("month"),
        F.dayofmonth("transacted_date").cast("int").alias("day_of_month"),
        F.when(col("amount") < 0, 1).otherwise(0).cast("int").alias("is_negative"),
        F.abs(col("amount")).alias("amount_abs"),
        amount_bucket("amount").alias("amount_bucket"),
        *keyword_cols,
    )


def stg_predictions(predicted_transactions: DataFrame) -> DataFrame:
    """Latest prediction per transaction (dbt stg_predictions.sql).

    Keeps the reference's exposed ``rn`` column (always 1 post-filter).
    """
    w = Window.partitionBy("transaction_id").orderBy(col("prediction_timestamp").desc())
    return (
        predicted_transactions.select(
            "transaction_id",
            "predicted_master_category",
            "prediction_confidence",
            "model_version",
            "prediction_timestamp",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(col("rn") == 1)
    )


_FEATURE_COLS = [
    "combined_text",
    "day_of_week",
    "month",
    "day_of_month",
    "is_negative",
    "amount_abs",
    "amount_bucket",
    *KEYWORD_PATTERNS.keys(),
]


def stg_user_validated_categories(
    user_categories: DataFrame, int_trxns_features_df: DataFrame
) -> DataFrame:
    """Validated user overrides joined onto transaction details
    (dbt stg_user_validated_categories.sql, whole file).

    LEFT join keyed on transaction_id, user category takes precedence
    via coalesce, only ``validated = true`` rows flow to training.
    """
    u = user_categories.alias("u_cat")
    d = int_trxns_features_df.alias("details")
    return (
        u.join(d, col("u_cat.transaction_id") == col("details.transaction_id"), "left")
        .filter(col("u_cat.validated") == True)  # noqa: E712
        .select(
            col("u_cat.transaction_id").alias("transaction_id"),
            col("details.account_id").alias("account_id"),
            col("details.original_account_name").alias("original_account_name"),
            col("details.account_name").alias("account_name"),
            col("details.detailed_account_name").alias("detailed_account_name"),
            col("details.owner_name").alias("owner_name"),
            col("details.institution_name").alias("institution_name"),
            col("details.amount").alias("amount"),
            col("details.posted_date").alias("posted_date"),
            col("details.transacted_date").alias("transacted_date"),
            col("details.description").alias("description"),
            col("details.pending").alias("pending"),
            col("u_cat.source_category").alias("source_category"),
            F.coalesce(col("u_cat.master_category"), col("details.master_category")).alias(
                "master_category"
            ),
            col("details.import_timestamp").alias("import_timestamp"),
            col("details.import_date").alias("import_date"),
            col("details.source_name").alias("source_name"),
            col("u_cat.notes").alias("user_notes"),
            col("u_cat.updated_at").alias("category_changed_at"),
            *[col(f"details.{c}").alias(c) for c in _FEATURE_COLS],
        )
    )


def fct_trxns_categorized(int_trxns_features_df: DataFrame) -> DataFrame:
    """master_category IS NOT NULL mart (dbt fct_trxns_categorized.sql)."""
    return int_trxns_features_df.filter(col("master_category").isNotNull())


def fct_trxns_uncategorized(
    int_trxns_features_df: DataFrame, fct_validated_trxns_df: DataFrame
) -> DataFrame:
    """Uncategorized mart (dbt fct_trxns_uncategorized.sql).

    category NULL AND id NOT IN validated — the NOT IN (with its
    null-guard) authored as a left_anti join.
    """
    validated_ids = fct_validated_trxns_df.filter(
        col("transaction_id").isNotNull()
    ).select("transaction_id")
    return int_trxns_features_df.filter(col("master_category").isNull()).join(
        validated_ids, "transaction_id", "left_anti"
    )


def fct_trxns_with_predictions(
    fct_trxns_uncategorized_df: DataFrame, stg_predictions_df: DataFrame
) -> DataFrame:
    """Uncategorized mart + latest predictions (dbt fct_trxns_with_predictions.sql)."""
    p = stg_predictions_df.select(
        col("transaction_id").alias("p_transaction_id"),
        "predicted_master_category",
        "prediction_confidence",
        "model_version",
        "prediction_timestamp",
    )
    src = fct_trxns_uncategorized_df
    return src.join(
        p, src.transaction_id == p.p_transaction_id, "left"
    ).drop("p_transaction_id")


_VALIDATED_COLS = [
    "transaction_id",
    "account_id",
    "original_account_name",
    "account_name",
    "detailed_account_name",
    "owner_name",
    "institution_name",
    "amount",
    "posted_date",
    "transacted_date",
    "description",
    "pending",
    "source_category",
    "master_category",
    "import_timestamp",
    "import_date",
    "source_name",
    "user_notes",
    "category_changed_at",
    *_FEATURE_COLS,
]


def fct_validated_trxns_bootstrap(
    fct_trxns_categorized_df: DataFrame, stg_user_validated_df: DataFrame
) -> DataFrame:
    """Full-refresh branch of the incremental model
    (dbt fct_validated_trxns.sql:24-70): historic-categorized rows
    (with NULL user_notes/category_changed_at) UNION ALL user-validated."""
    bootstrap = fct_trxns_categorized_df.select(
        *[
            c
            if c not in ("user_notes", "category_changed_at")
            else (
                lit(None).cast("string").alias("user_notes")
                if c == "user_notes"
                else lit(None).cast("timestamp").alias("category_changed_at")
            )
            for c in _VALIDATED_COLS
        ]
    )
    return bootstrap.unionByName(stg_user_validated_df.select(*_VALIDATED_COLS))


def fct_validated_trxns_increment(
    existing: DataFrame, stg_user_validated_df: DataFrame
) -> DataFrame:
    """Incremental branch (dbt fct_validated_trxns.sql:13-19): only ids
    absent from the existing snapshot — INSERT-ONLY, existing rows are
    never updated (preserved reference quirk: category edits reach this
    table only via full refresh)."""
    existing_ids = existing.filter(col("transaction_id").isNotNull()).select(
        "transaction_id"
    )
    return stg_user_validated_df.select(*_VALIDATED_COLS).join(
        existing_ids, "transaction_id", "left_anti"
    )
