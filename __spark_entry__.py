"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (full 10-iteration PageRank over the
  deterministic wiki corpus derived from sf0.001 documents) — smoke.
- ``queries()``: one entry per implemented operator (SURVEY.md §2 +
  extensions), each ``(spark, sf_dir) -> DataFrame``.
- ``oracle_sql()``: the DuckDB ANSI-SQL twin of each query; the driver
  hash-compares both at sf0.01.

All float outputs are integer micro-units (``*_e6`` / ``*_e9`` bigint
columns) so value hashes are stable across engines (SURVEY.md §7.4.4).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pagerank_using_mapreduce_spark.operators.pagerank import (
    pagerank,
    parse_corpus,
    ranking,
)
from pagerank_using_mapreduce_spark.plans.registry import ORACLE_SQL, QUERIES
from pagerank_using_mapreduce_spark.sources.tables import load_table
from pagerank_using_mapreduce_spark.sources.wikicorpus import wiki_corpus

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: parse → 10× PageRank → global descending sort."""
    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    n = docs.count()  # one page per doc: reused as PageRank's N below
    pages = parse_corpus(wiki_corpus(docs, n))
    ranks = pagerank(pages, n=n, iterations=10)
    return ranking(ranks).select(
        "title", F.round(F.col("rank"), 6).alias("rank")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
