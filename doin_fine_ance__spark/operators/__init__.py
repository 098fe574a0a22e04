from .dedup import latest_wins, rownum_disambiguate, reconnection_dedup, deduplicate
from .pagination import paginate

__all__ = [
    "latest_wins",
    "rownum_disambiguate",
    "reconnection_dedup",
    "deduplicate",
    "paginate",
]
