"""Inverted index: the reference's single-job pipeline
(InvertedIndex.java:45-59) as one DataFrame expression, plus the TF-IDF
generalization (SURVEY.md §2.9).

Semantics (reference README.md:78-82): alpha-only tokens
(``[^a-zA-Z]+`` → space), lowercased, duplicates in the posting list
RETAINED (one entry per token occurrence, InvertedIndex.java:104-106,
120-131).  The reference's posting order is shuffle-arrival order
(nondeterministic); we sort doc ids ascending — documented deviation
for reproducibility (SURVEY.md §7.4.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sqltext import sql_quote
from ..functions.textops import (
    extract_doc_id,
    extract_text_body,
    strip_non_alpha,
    tokens,
)


def _postings(word_doc: DataFrame) -> DataFrame:
    """(word, doc_id) occurrences → (word, doc_ids) with doc_ids a
    comma-joined ascending list, duplicates retained (A6)."""
    return word_doc.groupBy("word").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("doc_ids")
    )


def token_stream(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """P6+P7+P8 over the ``documents`` table: one row per token
    occurrence → (doc_id, word)."""
    return documents.select(
        "doc_id",
        F.explode(tokens(strip_non_alpha(text_col))).alias("word"),
    )


def inverted_index(documents: DataFrame) -> DataFrame:
    """A6 over the plain ``documents`` table → (word, doc_ids)."""
    return _postings(token_stream(documents))


def inverted_index_wiki(corpus: DataFrame) -> DataFrame:
    """The reference's exact input shape: raw wiki page lines.

    ParseMapper (InvertedIndex.java:69-110): doc id from the first
    ``<id>`` tag, body from ``group(2)`` of the text regex (wrapper
    excluded — unlike the PageRank mapper), then strip/tokenize/lower.
    Pages without a text tag contribute no tokens.
    """
    word_doc = (
        corpus.where(F.length("raw") > 0)
        .select(
            extract_doc_id("raw").cast("long").alias("doc_id"),
            extract_text_body("raw").alias("body"),
        )
        .where(F.col("body") != "")
        .select("doc_id", F.explode(tokens(strip_non_alpha("body"))).alias("word"))
    )
    return _postings(word_doc)


N_SHARDS = 16


def inverted_index_sharded(
    documents: DataFrame, n_shards: int = N_SHARDS
) -> DataFrame:
    """(word, shard, doc_ids): postings sharded by ``doc_id % n_shards``.

    The plain index materializes ONE row per word — a stopword-class
    word's posting list is a single aggregation group and a single
    array in one task's memory, the classic skew wall at corpus scale.
    Sharding bounds every group to ~1/n_shards of the worst list, the
    groupBy key becomes (word, shard) (uniform), and a reader
    re-concatenates shards in shard order (ids within a shard sorted,
    shards disjoint by construction — production posting formats shard
    exactly this way).
    """
    return (
        token_stream(documents)
        .withColumn("shard", F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int"))
        .groupBy("word", "shard")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("doc_ids")
        )
    )


def tf_idf(documents: DataFrame, n_docs: int | None = None) -> DataFrame:
    """Extension (SURVEY.md §2.9): TF-IDF over the token stream.

    TF is A6 with counts; IDF needs N (A1).  Smoothed IDF:
    ``ln((1+N)/(1+df)) + 1`` — computed with built-in expressions only.
    Output: (doc_id, word, tf, df, tf_idf).
    """
    if n_docs is None:
        n_docs = documents.count()
    toks = token_stream(documents)
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df = tf.groupBy("word").agg(F.count("*").alias("df"))
    return (
        tf.join(df, "word")
        .select(
            "doc_id",
            "word",
            "tf",
            "df",
            (
                F.col("tf")
                * (F.log((F.lit(1.0 + n_docs)) / (F.col("df") + 1.0)) + F.lit(1.0))
            ).alias("tf_idf"),
        )
    )


# ---------------------------------------------------------------------------
# Positional postings + phrase search: the IR capability plain A6
# postings can't answer.  Positions come from the token ORDER within
# each document (posexplode), so the index supports adjacency
# predicates; a k-word phrase is a (k-1)-way self-join on
# (doc_id, pos + offset) — each join leg is an equi-join on doc_id
# with an integer position equality, shuffling only the posting rows
# of the phrase's words once the word filter is pushed into the scan.
# ---------------------------------------------------------------------------


def positional_index(documents: DataFrame) -> DataFrame:
    """(word, doc_id, pos): one row per token OCCURRENCE with its
    0-based position in the normalized token stream."""
    from ..functions.textops import strip_non_alpha, tokens

    return documents.select(
        "doc_id", F.posexplode(tokens(strip_non_alpha("text"))).alias("pos", "word")
    ).select("word", "doc_id", "pos")


def phrase_search(documents: DataFrame, phrase: list[str]) -> DataFrame:
    """(doc_id, n_matches): documents containing the exact consecutive
    ``phrase``, with match counts.  Each phrase word filters the
    positional index BEFORE the join (predicate pushdown does the
    candidate pruning), then adjacency is enforced by pos arithmetic.
    """
    if len(phrase) < 2:
        raise ValueError("phrase_search needs >= 2 words")
    idx = positional_index(documents)
    legs = None
    for k, w in enumerate(phrase):
        leg = (
            idx.where(F.col("word") == w)
            .select("doc_id", (F.col("pos") - F.lit(k)).alias("anchor"))
            .alias(f"t{k}")
        )
        legs = leg if legs is None else legs.join(leg, ["doc_id", "anchor"])
    return legs.groupBy("doc_id").agg(F.count("*").alias("n_matches"))


def phrase_search_sql(phrase: list[str]) -> str:
    """DuckDB twin of :func:`phrase_search` over the documents view."""
    toks = """
  SELECT doc_id, u.p AS pos, u.t AS word FROM (
    SELECT doc_id, unnest(list_transform(
      list_filter(string_split_regex(
        lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
        x -> x != ''),
      (x, i) -> {'p': i - 1, 't': x})) AS u
    FROM documents)"""
    legs = [
        f"t{k} AS (SELECT doc_id, pos - {k} AS anchor FROM toks "
        f"WHERE word = {sql_quote(w)})"
        for k, w in enumerate(phrase)
    ]
    joins = " ".join(
        f"JOIN t{k} USING (doc_id, anchor)" for k in range(1, len(phrase))
    )
    legs_sql = ",\n".join(legs)
    return f"""
WITH toks AS MATERIALIZED ({toks}),
{legs_sql}
SELECT doc_id, COUNT(*) AS n_matches
FROM t0 {joins}
GROUP BY doc_id"""
