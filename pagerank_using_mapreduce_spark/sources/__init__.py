from .tables import TABLES, load_table, load_tables, register_views
from .textio import (
    decode_rank_records,
    encode_rank_records,
    read_corpus_text,
    write_corpus_text,
    write_postings_text,
    write_rank_records_text,
    write_ranking_text,
)
from .wikicorpus import wiki_corpus

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "wiki_corpus",
    "read_corpus_text",
    "write_corpus_text",
    "encode_rank_records",
    "decode_rank_records",
    "write_rank_records_text",
    "write_ranking_text",
    "write_postings_text",
]
