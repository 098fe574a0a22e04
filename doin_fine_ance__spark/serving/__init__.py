from .transactions import (
    transaction_overlay,
    get_transactions_filtered,
    get_transaction_by_id,
    categorize_transaction,
)
from .validated import list_validated_transactions, distinct_validated_categories
from .categories import (
    get_active_category_names,
    create_category,
    ReservedCategoryError,
)
from .control_center import connection_health

__all__ = [
    "transaction_overlay",
    "get_transactions_filtered",
    "get_transaction_by_id",
    "categorize_transaction",
    "list_validated_transactions",
    "distinct_validated_categories",
    "get_active_category_names",
    "create_category",
    "ReservedCategoryError",
    "connection_health",
]
