"""Explicit StructTypes for every finance-domain table.

The reference lands raw columns as TEXT/BIGINT and casts in staging
(schema-on-write for shape, schema-on-read for types —
ui/backend/init_db.py:95-113, stg_simplefin.sql:30-38). We keep that
split: RAW_* schemas are the landing shapes, staging output schemas
are produced by the model functions.

``amount`` is DecimalType(18,2) everywhere (Postgres NUMERIC,
init_db.py:102) so money sums are exact.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DecimalType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# public.simplefin — raw SimpleFIN landing table (init_db.py:95-113;
# extractor row shape simplefin_api.py:216-233).
RAW_SIMPLEFIN = StructType(
    [
        _f("transaction_id", StringType()),
        _f("account_id", StringType()),
        _f("account_name", StringType()),
        _f("institution_domain", StringType()),
        _f("institution_name", StringType()),
        _f("amount", DecimalType(18, 2)),
        _f("posted", LongType()),  # epoch seconds
        _f("posted_date", StringType()),  # ISO text, cast in staging
        _f("transacted_at", LongType()),  # epoch seconds
        _f("transacted_date", StringType()),
        _f("description", StringType()),
        _f("pending", BooleanType()),
        _f("import_timestamp", StringType()),  # ISO text, cast in staging
        _f("import_date", StringType()),
        _f("extra", StringType()),
    ]
)

# balances-only extraction (simplefin_api.py:113's balances-only=1 mode):
# one row per account per fetch, no transactions materialized.
RAW_BALANCES = StructType(
    [
        _f("account_id", StringType()),
        _f("account_name", StringType()),
        _f("institution_domain", StringType()),
        _f("institution_name", StringType()),
        _f("balance", DecimalType(18, 2)),
        _f("available_balance", DecimalType(18, 2)),
        _f("balance_date", LongType()),  # epoch seconds
        _f("import_timestamp", StringType()),  # ISO text, cast in staging
        _f("import_date", StringType()),
    ]
)

# historic_transactions — user CSV seed (stg_historic_trxns.sql:59-84).
RAW_HISTORIC = StructType(
    [
        _f("transaction_date", StringType()),
        _f("description", StringType()),
        _f("amount", DecimalType(18, 2)),
        _f("account_name", StringType()),
        _f("source_category", StringType()),
        _f("additional_account_detail", StringType()),
        _f("master_category", StringType()),
        _f("input_date", StringType()),  # MM/DD/YYYY or ''
    ]
)

# dbt seeds (seed_*.csv headers, dbt/seeds/examples/*.csv:1).
SEED_ACCOUNT_MAPPING_SIMPLEFIN = StructType(
    [
        _f("account_name", StringType()),
        _f("account_id", StringType()),
        _f("mapped_account_name", StringType()),
    ]
)

SEED_ACCOUNT_MAPPING_HISTORIC = StructType(
    [
        _f("account_name", StringType()),
        _f("additional_account_info", StringType()),
        _f("mapped_account_name", StringType()),
        _f("owner_name", StringType()),
    ]
)

SEED_TRANSACTION_EXCLUSIONS = StructType([_f("pattern", StringType())])

# public.user_categories — override/validation table (init_db.py:138-149).
USER_CATEGORIES = StructType(
    [
        _f("transaction_id", StringType(), nullable=False),
        _f("master_category", StringType(), nullable=False),
        _f("source_category", StringType()),
        _f("notes", StringType()),
        _f("validated", BooleanType()),
        _f("exclude_from_forecast", BooleanType()),
        _f("updated_by", StringType()),
        _f("updated_at", TimestampType()),
    ]
)

# analytics.predicted_transactions key columns (init_db.py:70-73).
PREDICTIONS = StructType(
    [
        _f("transaction_id", StringType()),
        _f("predicted_master_category", StringType()),
        _f("prediction_confidence", DecimalType(9, 6)),
        _f("model_version", StringType()),
        _f("prediction_timestamp", TimestampType()),
    ]
)

# public.categories catalog (init_db.py:164-191).
CATEGORIES = StructType(
    [
        _f("name", StringType(), nullable=False),
        _f("is_default", BooleanType()),
        _f("is_active", BooleanType()),
        _f("created_at", TimestampType()),
    ]
)

# analytics.model_registry (init_db.py:199-224); metrics JSONB → JSON string.
MODEL_REGISTRY = StructType(
    [
        _f("model_version", StringType(), nullable=False),
        _f("training_timestamp", TimestampType(), nullable=False),
        _f("file_path", StringType()),
        _f("metrics", StringType()),
        _f("status", StringType(), nullable=False),
        _f("is_active", BooleanType()),
        _f("is_latest", BooleanType()),
        _f("n_train_samples", LongType()),
        _f("n_test_samples", LongType()),
        _f("n_features", LongType()),
        _f("n_classes", LongType()),
        _f("accuracy", DecimalType(9, 6)),
        _f("macro_f1", DecimalType(9, 6)),
        _f("weighted_f1", DecimalType(9, 6)),
        _f("macro_precision", DecimalType(9, 6)),
        _f("macro_recall", DecimalType(9, 6)),
        _f("reason", StringType()),
        _f("message", StringType()),
    ]
)

# The default 19-name category catalog (ui/backend/constants.py:44-64).
DEFAULT_CATEGORIES = [
    "Dining out",
    "Donation",
    "Flight",
    "Fun!™",
    "Gas",
    "Groceries",
    "Health care",
    "Home",
    "Income",
    "Insurance",
    "Interest",
    "Investments",
    "Miscellaneous",
    "Professional development",
    "Rent",
    "Shopping",
    "Transfers",
    "Transportation",
    "Utilities",
]

# Reserved label predictions fall back to under low confidence
# (classifier_predict.py:135; never a real category, category_service.py:109).
UNCERTAIN_LABEL = "UNCERTAIN"

# ML feature contract (dagster/common.py:37-53) — the 14 numerical
# features fed to StandardScaler, exactly as common.py orders them.
TEXT_FEATURE = "combined_text"
NUMERICAL_FEATURES = [
    "amount",
    "is_negative",
    "day_of_week",
    "day_of_month",
    "amount_bucket",
    "has_hotel_keyword",
    "has_gas_keyword",
    "has_grocery_keyword",
    "has_restaurant_keyword",
    "has_transport_keyword",
    "has_shop_keyword",
    "has_flight_keyword",
    "has_credit_fee_keyword",
    "has_interest_keyword",
]
MIN_TRAINING_SAMPLES = 50  # common.py:61
DEFAULT_CONFIDENCE_THRESHOLD = 0.40  # common.py:58
LOW_CONFIDENCE_THRESHOLD = 0.35  # ui/backend/constants.py:29
