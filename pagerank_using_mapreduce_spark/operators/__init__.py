from .inverted_index import inverted_index, inverted_index_wiki, tf_idf
from .pagerank import count_n, edges, link_graph, pagerank, parse_corpus, ranking, top_k

__all__ = [
    "count_n",
    "edges",
    "link_graph",
    "pagerank",
    "parse_corpus",
    "ranking",
    "top_k",
    "inverted_index",
    "inverted_index_wiki",
    "tf_idf",
]
