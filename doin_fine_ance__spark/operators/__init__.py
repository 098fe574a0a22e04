from .dedup import latest_wins, rownum_disambiguate, reconnection_dedup, deduplicate
from .maintenance import (
    apply_retention,
    compact_table,
    export_snapshot,
    restore_snapshot,
)
from .pagination import paginate

__all__ = [
    "latest_wins",
    "rownum_disambiguate",
    "reconnection_dedup",
    "deduplicate",
    "paginate",
    "export_snapshot",
    "restore_snapshot",
    "apply_retention",
    "compact_table",
]
