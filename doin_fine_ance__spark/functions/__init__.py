from .pg import (
    ilike,
    pg_asc,
    pg_desc,
    pandas_dow,
    amount_bucket,
    keyword_flag,
    KEYWORD_PATTERNS,
    normalize_account_name,
    month_trunc,
)

__all__ = [
    "ilike",
    "pg_asc",
    "pg_desc",
    "pandas_dow",
    "amount_bucket",
    "keyword_flag",
    "KEYWORD_PATTERNS",
    "normalize_account_name",
    "month_trunc",
]
