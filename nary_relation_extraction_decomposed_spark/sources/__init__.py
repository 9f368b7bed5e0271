from .tables import TABLE_NAMES, load_table, pages_from_documents

__all__ = ["TABLE_NAMES", "load_table", "pages_from_documents"]
