from .tables import TABLES, load_table, load_tables, register_views
from .wikicorpus import wiki_corpus

__all__ = ["TABLES", "load_table", "load_tables", "register_views", "wiki_corpus"]
