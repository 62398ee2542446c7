from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_using_mapreduce_spark.operators.inverted_index import (
    inverted_index,
    inverted_index_wiki,
    tf_idf,
)

DOCS = [
    (1, "the Cat sat, the cat!"),
    (2, "a cat and a dog-house"),
    (3, "DOG dog dog 42"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_inverted_index_duplicates_retained_sorted(docs):
    got = {r["word"]: r["doc_ids"] for r in inverted_index(docs).collect()}
    # "cat" twice in doc 1 → id appears twice (InvertedIndex.java:120-131)
    assert got["cat"] == "1,1,2"
    assert got["dog"] == "2,3,3,3"  # "dog-house" splits into dog + house
    assert got["the"] == "1,1"
    assert got["house"] == "2"
    assert "42" not in got  # alpha-only


def test_inverted_index_wiki(spark):
    corpus = spark.createDataFrame(
        [
            ('<title>A</title><id>7</id><text x="p">Hello hello world</text>',),
            ("<title>B</title><id>8</id><revision></revision>",),
            ('<title>C</title><id>9</id><text x="p">world 99</text>',),
        ],
        "raw string",
    )
    got = {r["word"]: r["doc_ids"] for r in inverted_index_wiki(corpus).collect()}
    # body = group(2): the <text …> wrapper is excluded (InvertedIndex.java:96-100)
    assert got == {"hello": "7,7", "world": "7,9"}


def test_tf_idf(docs):
    rows = {(r["doc_id"], r["word"]): r for r in tf_idf(docs, n_docs=3).collect()}
    assert rows[(1, "cat")]["tf"] == 2
    assert rows[(1, "cat")]["df"] == 2
    assert rows[(3, "dog")]["tf"] == 3
    # a word in every doc gets the minimal idf (=1 exactly when df = N+... smoothed)
    import math

    want = 2 * (math.log(4 / 3) + 1)
    assert rows[(1, "cat")]["tf_idf"] == pytest.approx(want, rel=1e-12)


def test_sharded_index_reconstructs_plain_index(spark):
    """Concatenating a word's shards in shard order = the unsharded
    posting list (disjoint shards, ids sorted within each)."""
    from pagerank_using_mapreduce_spark.operators.inverted_index import (
        inverted_index,
        inverted_index_sharded,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plain = {r["word"]: r["doc_ids"] for r in inverted_index(docs).collect()}
    sharded = {}
    for r in sorted(
        inverted_index_sharded(docs).collect(), key=lambda r: (r["word"], r["shard"])
    ):
        sharded.setdefault(r["word"], []).extend(r["doc_ids"].split(","))
    assert set(sharded) == set(plain)
    for w, ids in sharded.items():
        assert sorted(ids, key=int) == plain[w].split(",")


def test_phrase_search_adjacency_and_counts(spark):
    """Phrase matching is exact adjacency: 'a b' matches only where b
    immediately follows a; overlapping repeats count each start."""
    from pagerank_using_mapreduce_spark.operators.inverted_index import (
        phrase_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark window spark window spark"),  # 'spark window' twice
            (2, "window spark"),                      # reversed: no match
            (3, "spark and window"),                  # gap: no match
            (4, "spark window"),                      # once
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(docs, ["spark", "window"]).collect()}
    assert got == {1: 2, 4: 1}


def test_phrase_search_three_words(spark):
    from pagerank_using_mapreduce_spark.operators.inverted_index import (
        phrase_search,
    )

    docs = spark.createDataFrame(
        [(1, "fast key order sort"), (2, "fast order key")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(docs, ["fast", "key", "order"]).collect()}
    assert got == {1: 1}


def test_phrase_search_sql_escapes_quotes():
    """A phrase word containing a single quote must produce well-formed
    SQL (doubled quote), not a syntax error / string break."""
    import duckdb

    from pagerank_using_mapreduce_spark.operators.inverted_index import (
        phrase_search_sql,
    )

    sql = phrase_search_sql(["o'brien", "rules"])
    assert "'o''brien'" in sql
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT 1 AS doc_id, 'no match here' AS text"
    )
    assert con.execute(sql).df().shape[0] == 0  # parses and runs
