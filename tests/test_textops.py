"""Parser-branch tests: every README assumption of the reference
(reference README.md:56-82), verified on hand-built page lines."""

from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_using_mapreduce_spark.functions.textops import (
    extract_doc_id,
    extract_links,
    extract_text_body,
    extract_text_full,
    extract_title,
    strip_non_alpha,
    tokens,
)


def _one(spark, raw, expr):
    return spark.createDataFrame([(raw,)], "raw string").select(expr.alias("v")).head()[0]


PAGE = (
    '<title>Anarchism</title><id>12</id><revision>'
    '<text xml:space="preserve">x [[A]] y [[B|alias b]] z '
    "[[File:pic.png|thumb [[Banana]] caption]] [[A]] w</text></revision>"
)


def test_title(spark):
    assert _one(spark, PAGE, extract_title("raw")) == "Anarchism"
    # untrimmed capture is trimmed at parse (SURVEY.md §7.4.5)
    assert _one(spark, "<title> X </title>", extract_title("raw")) == "X"


def test_doc_id(spark):
    assert _one(spark, PAGE, extract_doc_id("raw")) == "12"


def test_text_full_vs_body(spark):
    full = _one(spark, PAGE, extract_text_full("raw"))
    body = _one(spark, PAGE, extract_text_body("raw"))
    assert full.startswith('<text xml:space="preserve">') and full.endswith("</text>")
    assert body.startswith("x [[A]]") and body.endswith(" w")


def test_links_plain_piped_nested_duplicate(spark):
    links = _one(spark, PAGE, extract_links(extract_text_full("raw")))
    # piped kept whole (never resolved), nested resolves to innermost,
    # duplicate retained
    assert links == ["A", "B|alias b", "Banana", "A"]


def test_links_self_loop_kept(spark):
    raw = '<title>C</title><id>3</id><text a="1">[[C]]</text>'
    assert _one(spark, raw, extract_links(extract_text_full("raw"))) == ["C"]


def test_no_text_tag_page_has_no_links(spark):
    raw = "<title>D</title><id>4</id><revision></revision>"
    assert _one(spark, raw, extract_links(extract_text_full("raw"))) == []


def test_strip_non_alpha_and_tokens(spark):
    raw = "Hello, World! 42 times_3 End"
    assert _one(spark, raw, strip_non_alpha("raw")) == "Hello World times End"
    assert _one(spark, raw, tokens(strip_non_alpha("raw"))) == [
        "hello",
        "world",
        "times",
        "end",
    ]


def test_tokens_no_empties(spark):
    assert _one(spark, "  a  b  ", tokens("raw")) == ["a", "b"]
    assert _one(spark, "", tokens("raw")) == []


def test_approx_count_distinct_within_tolerance(spark):
    """Approximate aggregates exist and land within the documented HLL
    error envelope (no oracle — approximation differs per engine)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    exact = ev.select("user_id").distinct().count()
    approx = ev.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("a")
    ).first()["a"]
    assert abs(approx - exact) / exact < 0.05
