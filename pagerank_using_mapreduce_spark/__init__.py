"""PySpark-native analytics engine with the query surface of
``Valentina9091/PageRank_Using_MapReduce`` (reference at /root/reference).

The reference is a 13-job Hadoop MapReduce pipeline (PageRank over a
wiki-style corpus + an inverted index).  This engine re-expresses every
operator Spark-first: declarative DataFrame plans optimized by Catalyst,
zero Python UDFs on the core path, and LLM-data-pipeline extensions
(dedup, similarity search, text analysis) built on the same surface.

Layout
------
- ``session``    : tuned SparkSession builder
- ``sources``    : table loaders + the deterministic wiki-corpus derivation
- ``functions``  : shared column-expression library (regex extractors,
                   tokenizer, portable hashing)
- ``operators``  : pagerank, inverted index, dedup, similarity,
                   text analysis, as-of join
- ``plans``      : relational demonstration queries (TPC-H-ish)
- ``streaming``  : Structured Streaming variants of the event operators
"""

__version__ = "0.1.0"
