"""Postgres-compatible expression helpers.

The reference executes all SQL on Postgres 15; several defaults differ
from Spark and must be reproduced for oracle-exact results
(SURVEY.md §4.3.1):

- **Null ordering**: Postgres ASC puts NULLs last, DESC puts NULLs
  first (opposite of Spark's DESC default). ``pg_asc``/``pg_desc``
  encode that.
- **ILIKE** (reference: stg_simplefin.sql:54, transaction_service.py:185)
  → lower/lower LIKE, which also matches DuckDB's ``ILIKE``.
- **extract(dow)** remap: reference maps Postgres dow (0=Sunday) to the
  pandas convention 0=Monday (int_trxns_features.sql:37-47); Spark's
  ``dayofweek`` is 1=Sunday..7=Saturday, so pandas-dow =
  ``(dayofweek(c) + 5) % 7``.
- **Amount buckets**: the 6-way CASE of int_trxns_features.sql:56-63
  (NULL falls through to bucket 5 — `when` order matters).
- **Keyword flags**: the nine case-insensitive alternation regexes of
  int_trxns_features.sql:66-109 (`~*` POSIX alternation-only patterns,
  identical semantics in Java regex).
- **Account-name normalization**: strip a trailing ``" (1234)"`` mask
  suffix (stg_simplefin.sql:79-84).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def ilike(c: Column | str, pattern: Column | str) -> Column:
    """Case-insensitive LIKE with ``%``/``_`` wildcards (Postgres ILIKE)."""
    if isinstance(pattern, str):
        return F.lower(_col(c)).like(pattern.lower())
    # Column pattern (e.g. a broadcast pattern table): the Column.like
    # method only takes str, so call the SQL like() function directly.
    return F.call_function("like", F.lower(_col(c)), F.lower(pattern))


def pg_asc(c: Column | str) -> Column:
    """ASC with Postgres default null placement (NULLS LAST)."""
    return _col(c).asc_nulls_last()


def pg_desc(c: Column | str) -> Column:
    """DESC with Postgres default null placement (NULLS FIRST)."""
    return _col(c).desc_nulls_first()


def pandas_dow(c: Column | str) -> Column:
    """Day of week, pandas convention (0=Monday .. 6=Sunday).

    Mirrors the CASE remap at int_trxns_features.sql:37-47.
    """
    return ((F.dayofweek(_col(c)) + F.lit(5)) % 7).cast("int")


def month_trunc(c: Column | str) -> Column:
    """``DATE_TRUNC('month', d)::date`` (notebooks 00/02)."""
    return F.date_trunc("month", _col(c)).cast("date")


def amount_bucket(amount: Column | str) -> Column:
    """Six-way absolute-amount bucket (int_trxns_features.sql:56-63).

    0: |a|<=10, 1: <=50, 2: <=100, 3: <=500, 4: >500, 5: NULL.
    """
    a = F.abs(_col(amount))
    return (
        F.when(a.isNull(), F.lit(5))
        .when(a <= 10, F.lit(0))
        .when(a <= 50, F.lit(1))
        .when(a <= 100, F.lit(2))
        .when(a <= 500, F.lit(3))
        .otherwise(F.lit(4))
        .cast("int")
    )


# The nine keyword-flag alternation patterns of int_trxns_features.sql:66-109
# (verbatim — alternation-only POSIX patterns, identical under Java regex).
KEYWORD_PATTERNS: dict[str, str] = {
    "has_hotel_keyword": "hotel|airbnb|inn|resort|motel|hipcamp|booking",
    "has_gas_keyword": "shell|chevron|exxon|bp|mobil|gas|fuel|76|arco",
    "has_grocery_keyword": "safeway|costco|trader|whole foods|kroger|grocery|market|albertsons|bowlberkeley",
    "has_restaurant_keyword": "restaurant|cafe|coffee|starbucks|mcdonald|burger|pizza|chipotle|dining",
    "has_transport_keyword": "uber|lyft|taxi|bart|metro|transit|parking|toll",
    "has_shop_keyword": "amazon|target|walmart|ebay|etsy|shop|store",
    "has_flight_keyword": "airline|united|delta|american|southwest|jetblue|alaska|spirit|frontier|airlines|flight",
    "has_credit_fee_keyword": "annual|membership|fee",
    "has_interest_keyword": "interest",
}


def keyword_flag(text: Column | str, pattern: str) -> Column:
    """``CASE WHEN lower(text) ~* pattern THEN 1 ELSE 0 END`` as INT."""
    return (
        F.when(F.lower(F.coalesce(_col(text), F.lit(""))).rlike(pattern), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
    )


def normalize_account_name(c: Column | str) -> Column:
    r"""Strip trailing " (1234)" account-mask suffix after btrim.

    ``regexp_replace(btrim(account_name), '\s*\([0-9]+\)\s*$', '')``
    (stg_simplefin.sql:79-84).
    """
    return F.regexp_replace(F.trim(_col(c)), r"\s*\([0-9]+\)\s*$", "")
