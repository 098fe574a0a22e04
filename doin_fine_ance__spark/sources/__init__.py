from .corpus_io import (
    land_jsonl,
    read_documents_jsonl,
    read_events_jsonl,
    read_jsonl,
    write_jsonl,
)
from .testdata import TESTDATA_TABLES, load_all, load_table

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "load_all",
    "read_jsonl",
    "land_jsonl",
    "write_jsonl",
    "read_documents_jsonl",
    "read_events_jsonl",
]
