"""Shared column-expression library: the reference's per-record parsing
logic as pure Catalyst expressions (zero Python UDFs — everything stays
inside whole-stage codegen).

Spark uses Java regex, the same engine the reference uses, so the
patterns port verbatim (including the fixed-width lookbehind /
lookahead in the link regex).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Verbatim reference patterns.
TITLE_REGEX = r"<title>(.*?)</title>"  # PageRankAlgorithm.java:148-149,210
TEXT_REGEX = r"<text(.*?)>(.+?)</text>"  # PageRankAlgorithm.java:211; InvertedIndex.java:72
# Text between "[[" and the first "]" — PageRankAlgorithm.java:212-213.
LINK_REGEX = r"(?<=\[{2}).+?(?=\])"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def extract_title(raw: Column | str) -> Column:
    """P1: first <title>…</title> capture.  The reference captures the
    title untrimmed (PageRankAlgorithm.java:170-175) but trims page keys
    at record decode (:330); we trim once at parse (SURVEY.md §7.4.5)."""
    return F.trim(F.regexp_extract(_c(raw), TITLE_REGEX, 1))


def extract_doc_id(raw: Column | str) -> Column:
    """P3: first <id>…</id> capture (InvertedIndex.java:71,93-95)."""
    return F.regexp_extract(_c(raw), r"<id>(.*?)</id>", 1)


def extract_text_full(raw: Column | str) -> Column:
    """P2 (graph flavor): the *whole* text-tag match, wrapper included —
    the reference's LinkGraphMapper scans ``matcher.group()``
    (PageRankAlgorithm.java:239-241); link syntax cannot appear inside
    the tag so the wrapper is harmless."""
    return F.regexp_extract(_c(raw), TEXT_REGEX, 0)


def extract_text_body(raw: Column | str) -> Column:
    """P2 (index flavor): group(2) — body only (InvertedIndex.java:96-100)."""
    return F.regexp_extract(_c(raw), TEXT_REGEX, 2)


def extract_links(text: Column | str) -> Column:
    """P4+P5: all wiki-link targets with the nested-link rule applied.

    P4 — every match of ``(?<=\\[{2}).+?(?=\\])`` (text between ``[[``
    and the first ``]``, PageRankAlgorithm.java:212-213,241-243).
    P5 — nested-link resolution: keep only the text after the *last*
    ``[[`` (PageRankAlgorithm.java:245-250; README assumption 1).
    Piped targets are kept whole, duplicates are preserved (outdegree
    counts them), targets are used verbatim (no trim)."""
    matches = F.regexp_extract_all(_c(text), F.lit(LINK_REGEX), 0)
    return F.transform(matches, lambda x: F.element_at(F.split(x, r"\[\["), -1))


def strip_non_alpha(text: Column | str) -> Column:
    """P6: ``replaceAll("[^a-zA-Z]+", " ")`` (InvertedIndex.java:100-101)."""
    return F.regexp_replace(_c(text), "[^a-zA-Z]+", " ")


def tokens(text: Column | str) -> Column:
    """P7+P8: StringTokenizer-on-spaces + lowercase + trim
    (InvertedIndex.java:102-105).  ``split`` emits empty strings where
    the tokenizer would not (leading/trailing runs), so callers must
    filter ``token != ''`` after exploding — :func:`filter` applied here
    keeps the array form clean instead."""
    toks = F.split(F.lower(F.trim(_c(text))), " +")
    return F.filter(toks, lambda t: t != "")
