from .models import (
    stg_simplefin,
    stg_historic_trxns,
    stg_predictions,
    stg_user_validated_categories,
    int_trxns,
    int_trxns_features,
    fct_trxns_categorized,
    fct_trxns_uncategorized,
    fct_trxns_with_predictions,
    fct_validated_trxns_bootstrap,
    fct_validated_trxns_increment,
)
from .build import Warehouse, build

__all__ = [
    "stg_simplefin",
    "stg_historic_trxns",
    "stg_predictions",
    "stg_user_validated_categories",
    "int_trxns",
    "int_trxns_features",
    "fct_trxns_categorized",
    "fct_trxns_uncategorized",
    "fct_trxns_with_predictions",
    "fct_validated_trxns_bootstrap",
    "fct_validated_trxns_increment",
    "Warehouse",
    "build",
]
