"""Text source/sink parity: the reference's TextInputFormat /
TextOutputFormat boundary (S1/S2) and the ##/@#@ record codec (P9)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from pagerank_using_mapreduce_spark.operators.pagerank import (
    link_graph,
    pagerank,
    parse_corpus,
)
from pagerank_using_mapreduce_spark.sources.textio import (
    decode_rank_records,
    encode_rank_records,
    read_corpus_text,
    write_corpus_text,
    write_postings_text,
    write_ranking_text,
)
from pagerank_using_mapreduce_spark.sources.wikicorpus import wiki_corpus


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return wiki_corpus(docs, docs.count())


def test_text_roundtrip_preserves_pagerank(spark, corpus):
    """Write the corpus as a one-page-per-line text dump, read it back
    through the S1 source, and check the derived graph is identical."""
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/dump"
        write_corpus_text(corpus, path)
        reread = read_corpus_text(spark, path)
        assert reread.count() == corpus.count()
        a = parse_corpus(corpus).select("title", F.col("links"))
        b = parse_corpus(reread).select("title", F.col("links"))
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_codec_roundtrip_exact(spark, corpus):
    pages = parse_corpus(corpus)
    lg = link_graph(pages, pages.count())
    back = decode_rank_records(encode_rank_records(lg))
    orig = {r["title"]: r for r in lg.collect()}
    for r in back.collect():
        o = orig[r["title"]]
        assert r["rank"] == o["rank"]  # double→string→double exact
        assert r["links"] == o["links"]


def test_codec_linkless_page_collapses(spark):
    lg = spark.createDataFrame(
        [("a", 0.5, []), ("b", 0.25, ["a", "a"])],
        "title string, rank double, links array<string>",
    )
    enc = {r["title"]: r["record"] for r in encode_rank_records(lg).collect()}
    assert enc["a"] == "##0.5##"  # PageRankAlgorithm.java:306-312 shape
    assert enc["b"] == "##0.25##a@#@a"
    dec = {r["title"]: r for r in decode_rank_records(
        encode_rank_records(lg)).collect()}
    assert dec["a"]["links"] == []
    assert dec["b"]["links"] == ["a", "a"]


def test_ranking_text_globally_sorted(spark, corpus):
    pages = parse_corpus(corpus)
    ranks = pagerank(pages, iterations=2)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/sorted"
        write_ranking_text(ranks, path)
        # part files sort lexicographically in global rank order
        import glob

        vals = []
        for f in sorted(glob.glob(f"{path}/part-*")):
            with open(f) as fh:
                vals += [float(line.split("\t")[1]) for line in fh]
        assert len(vals) == ranks.count()
        assert vals == sorted(vals, reverse=True)


def test_postings_text_format(spark):
    from pagerank_using_mapreduce_spark.operators.inverted_index import (
        inverted_index,
    )

    docs = spark.createDataFrame(
        [(1, "Apple banana"), (2, "banana!! cherry")],
        "doc_id long, text string",
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/postings"
        write_postings_text(inverted_index(docs), path)
        import glob

        lines = []
        for f in sorted(glob.glob(f"{path}/part-*")):
            with open(f) as fh:
                lines += [line.rstrip("\n") for line in fh]
        assert "banana\t1,2" in lines


def test_format_generic_roundtrip_json_csv(spark):
    """The same relation flows through json and csv sinks/sources and
    yields identical query results (schema given explicitly — no
    inference scan, as at scale)."""
    import tempfile

    from pagerank_using_mapreduce_spark.sources.tables import (
        load_table,
        read_table,
        write_table,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    want = sorted(map(tuple, ev.collect()))
    schema = "event_id long, user_id long, event_type string, value double"
    with tempfile.TemporaryDirectory() as d:
        for fmt in ("json", "csv", "parquet"):
            write_table(ev, f"{d}/{fmt}", fmt=fmt)
            back = read_table(spark, f"{d}/{fmt}", fmt=fmt, schema=schema)
            got = sorted(map(tuple, back.select(*ev.columns).collect()))
            assert got == want, fmt


def test_partitioned_write_prunes(spark):
    """partitionBy layout + a partition-key filter → the scan lists
    only the matching directory (partition pruning)."""
    import tempfile

    from pagerank_using_mapreduce_spark.sources.tables import (
        load_table,
        read_table,
        write_table,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "event_type", "value"
    )
    with tempfile.TemporaryDirectory() as d:
        write_table(ev, f"{d}/p", partition_by=["event_type"])
        back = read_table(spark, f"{d}/p").where(F.col("event_type") == "click")
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(event_type" in plan
        assert back.count() == ev.where(F.col("event_type") == "click").count()


def test_orc_roundtrip_identity_and_pruning(spark, tmp_path):
    """ORC sink/source: row-identical roundtrip, and a partition
    filter on the hive layout prunes to the one matching directory."""
    from pyspark.sql import functions as F

    from pagerank_using_mapreduce_spark.sources.tables import (
        read_table,
        write_table,
    )

    df = spark.createDataFrame(
        [(i, f"t{i % 3}", i * 10) for i in range(60)],
        "id long, part string, v long",
    )
    d = str(tmp_path / "orc_tbl")
    write_table(df, d, fmt="orc", partition_by=["part"])
    back = read_table(spark, d, fmt="orc")
    assert sorted((r["id"], r["part"], r["v"]) for r in back.collect()) == sorted(
        (r["id"], r["part"], r["v"]) for r in df.collect()
    )
    pruned = back.where(F.col("part") == "t1")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == 20
    # partition filter must reach the scan, not a post-scan Filter
    assert "PartitionFilters: [isnotnull(part" in plan or "part#" in plan.split("PartitionFilters")[1][:80]


def test_corrupt_ingest_accounts_for_every_line(spark):
    """x84: good + corrupt counts must cover every input line, the
    corrupt set must be exactly the event_id % 13 == 0 lines, and no
    corrupt line may leak into a typed group."""
    from pyspark.sql import functions as F

    from pagerank_using_mapreduce_spark.plans.extensions import (
        q_x84_corrupt_ingest,
    )
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = {r["event_type"]: r["n_rows"] for r in q_x84_corrupt_ingest(spark, sf).collect()}
    ev = load_table(spark, sf, "events")
    assert sum(rows.values()) == ev.count()
    assert rows["__corrupt__"] == ev.where(F.col("event_id") % 13 == 0).count()
    good = ev.where(F.col("event_id") % 13 != 0).groupBy("event_type").count()
    for r in good.collect():
        assert rows[r["event_type"]] == r["count"]


def test_schema_evolution_no_row_loss(spark):
    """x86: the merged read must surface every row from BOTH parquet
    generations, v1 rows with NULL channel only."""
    from pyspark.sql import functions as F

    from pagerank_using_mapreduce_spark.plans.extensions import (
        q_x86_schema_evolution,
    )
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = {r["channel"]: r for r in q_x86_schema_evolution(spark, sf).collect()}
    ev = load_table(spark, sf, "events")
    assert sum(r["n_rows"] for r in rows.values()) == ev.count()
    assert rows["__v1__"]["n_rows"] == ev.where(F.col("event_id") % 2 == 0).count()
    assert set(rows) == {"__v1__", "ch_0", "ch_1", "ch_2"}
