"""Text-file source/sink parity with the reference's I/O surface.

The reference consumes line-oriented text via ``TextInputFormat``
(PageRankAlgorithm.java:66,84,102,119; InvertedIndex.java:51) and emits
``key \\t value`` lines via ``TextOutputFormat`` defaults
(PageRankAlgorithm.java:67,85,104,121), with structured records packed
into the value using ``SEPARATOR = "##"`` and ``LINK_SEPARATOR = "@#@"``
(PageRankAlgorithm.java:31-32,300-313).  A user of the reference feeds a
wiki XML dump as text and reads text results; this module gives the
engine the same boundary:

- :func:`read_corpus_text` — S1: one page per line → corpus(doc_id, raw);
- :func:`encode_rank_records` / :func:`decode_rank_records` — P9: the
  ``title \\t ##rank##l1@#@l2`` page-record codec, both directions
  (decode replicates Java ``split("##")`` trailing-empty collapse: a
  linkless page encodes as ``##rank##`` and decodes to an empty array);
- :func:`write_*_text` — S2 sinks for rank records, the sorted ranking,
  and inverted-index postings.

All sinks are plain ``df.write.text`` — distributed writers, one file
per partition; the sorted ranking preserves global order because
``orderBy`` range-partitions (part-00000 < part-00001 < …), exactly how
the reference's single reducer guaranteed it, minus the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textops import extract_doc_id

SEPARATOR = "##"  # PageRankAlgorithm.java:31
LINK_SEPARATOR = "@#@"  # PageRankAlgorithm.java:32


def read_corpus_text(spark: SparkSession, path: str) -> DataFrame:
    """S1: read a one-page-per-line wiki dump → corpus(doc_id, raw).

    ``spark.read.text`` is the TextInputFormat twin (one row per line,
    splittable scan).  doc_id is extracted from the ``<id>`` tag; pages
    without one get null (they still flow into title-keyed operators,
    which never look at doc_id — same as the reference, which keys
    everything on title).
    """
    return spark.read.text(path).select(
        F.nullif(extract_doc_id("value"), F.lit("")).cast("long").alias("doc_id"),
        F.col("value").alias("raw"),
    )


def write_corpus_text(corpus: DataFrame, path: str) -> None:
    corpus.select(F.col("raw").alias("value")).write.mode("overwrite").text(path)


# ---------------------------------------------------------------------------
# P9: the ##/@#@ page-record codec
# ---------------------------------------------------------------------------


def encode_rank_records(ranked_pages: DataFrame) -> DataFrame:
    """(title, rank, links) → (title, record) with the reference's exact
    value encoding ``##rank##l1@#@l2`` (PageRankAlgorithm.java:300-313);
    a linkless page encodes as ``##rank##`` (:306-312)."""
    return ranked_pages.select(
        "title",
        F.concat(
            F.lit(SEPARATOR),
            F.col("rank").cast("string"),
            F.lit(SEPARATOR),
            F.array_join(F.col("links"), LINK_SEPARATOR),
        ).alias("record"),
    )


def decode_rank_records(records: DataFrame) -> DataFrame:
    """(title, record) → (title, rank, links): the MapRank decode
    (PageRankAlgorithm.java:327-340).  Java's ``split("##")`` drops
    trailing empties, so ``##rank##`` yields length 2 ⇒ no out-links
    (the reference's ``value.length == 3`` gate, :332); the `filter`
    mirrors that by collapsing the empty link list."""
    parts = F.split(F.col("record"), SEPARATOR)
    links_str = F.element_at(parts, 3)
    return records.select(
        "title",
        F.element_at(parts, 2).cast("double").alias("rank"),
        F.when(
            links_str.isNull() | (links_str == ""), F.array().cast("array<string>")
        )
        .otherwise(F.split(links_str, LINK_SEPARATOR))
        .alias("links"),
    )


# ---------------------------------------------------------------------------
# S2 sinks: key \t value text lines
# ---------------------------------------------------------------------------


def _write_kv(df: DataFrame, key: str, value, path: str) -> None:
    df.select(
        F.concat_ws("\t", F.col(key), value).alias("value")
    ).write.mode("overwrite").text(path)


def write_rank_records_text(ranked_pages: DataFrame, path: str) -> None:
    """The per-iteration job output format (PageRankAlgorithm.java:395-397)."""
    enc = encode_rank_records(ranked_pages)
    _write_kv(enc, "title", F.col("record"), path)


def write_ranking_text(ranks: DataFrame, path: str) -> None:
    """The final ``_sortedOutput`` format ``title \\t rank``
    (PageRankAlgorithm.java:424-436), globally descending; parallel
    range-partitioned sort replaces the single reducer."""
    _write_kv(
        ranks.orderBy(F.desc("rank"), F.asc("title")),
        "title",
        F.col("rank").cast("string"),
        path,
    )


def write_postings_text(postings: DataFrame, path: str) -> None:
    """The inverted-index format ``word \\t id1,id2`` (InvertedIndex
    .java:124-131); doc_ids already comma-joined by the operator."""
    _write_kv(postings, "word", F.col("doc_ids"), path)
