"""Property-based tests (hypothesis): invariants that hold for ALL
inputs, not just the fixtures.

The codec inherits the reference's in-band encoding limitation: titles
and link targets must not contain the separators ``##`` / ``@#@`` or a
tab (the reference would silently corrupt such records too —
PageRankAlgorithm.java:300-313 does no escaping).  The generators
exclude exactly those, nothing else (unicode is fair game).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pagerank_using_mapreduce_spark.functions.textops import (
    strip_non_alpha,
    tokens,
)
from pagerank_using_mapreduce_spark.sources.textio import (
    decode_rank_records,
    encode_rank_records,
)

_name = st.text(
    alphabet=st.characters(
        exclude_characters="#@\t\n\r", exclude_categories=("Cs",)
    ),
    min_size=1,
    max_size=30,
).filter(lambda s: s.strip() == s and s != "")

_pages = st.lists(
    st.tuples(
        _name,
        st.floats(min_value=1e-6, max_value=1e6, allow_nan=False),
        st.lists(_name, max_size=5),
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
)

_SETTINGS = settings(
    max_examples=15,  # each example is a Spark round-trip — keep it tight
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(pages=_pages)
@_SETTINGS
def test_codec_roundtrip_property(spark, pages):
    df = spark.createDataFrame(
        pages, "title string, rank double, links array<string>"
    )
    back = {
        r["title"]: r
        for r in decode_rank_records(encode_rank_records(df)).collect()
    }
    for title, rank, links in pages:
        assert back[title]["rank"] == rank
        assert back[title]["links"] == links


@given(text=st.text(max_size=200))
@_SETTINGS
def test_tokenizer_invariants(spark, text):
    """Tokens are always non-empty, lowercase, alpha-only — for ANY
    input (the inverted-index word-domain invariant, README.md:79-81)."""
    df = spark.createDataFrame([(text,)], "text string")
    toks = df.select(tokens(strip_non_alpha("text")).alias("t")).first()["t"]
    for t in toks:
        assert t != ""
        assert t.isalpha()
        assert t == t.lower()
