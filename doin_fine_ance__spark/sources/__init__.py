from .testdata import TESTDATA_TABLES, load_table, load_all

__all__ = ["TESTDATA_TABLES", "load_table", "load_all"]
