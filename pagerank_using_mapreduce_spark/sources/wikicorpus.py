"""Deterministic wiki-style corpus derived from the ``documents`` table.

The reference's input is a Simple-English-Wikipedia dump formatted one
page per line (reference README.md:9-15; the mapper's instance-state
title tracking, PageRankAlgorithm.java:214,237, only works under that
one-page-per-line contract).  The shipped testdata has no wiki markup,
so this module renders one XML-ish page line per ``documents`` row with
*pure column arithmetic* — the same derivation is re-implemented in ANSI
SQL inside ``__spark_entry__.oracle_sql`` so DuckDB produces a
byte-identical corpus for the differential tests.

The generated markup exercises every parser branch the reference's
README promises (its assumption list, README.md:56-70):

- plain links ``[[doc_T1]]``      (T1 = (i*3+7) % N)
- piped links ``[[doc_T2|alias]]`` (kept whole, never resolved —
  PageRankAlgorithm.java:245-250; T2 = (i*5+11) % N)
- nested links ``[[File:imgI.png|thumb [[doc_T3]] caption]]`` — only
  the innermost target counts (README.md:57-60; T3 = (i*7+13) % N)
- duplicate links (i % 11 == 0 repeats T1 — each occurrence counts
  toward outdegree, PageRankAlgorithm.java:336-340)
- phantom targets ``[[ghost_K]]`` (i % 13 == 0) that must vanish from
  the final ranking (README.md:66)
- explicit self-loops (i % 23 == 0; kept, README.md:62)
- pages with a <title> but no <text> tag (i % 17 == 0; still valid,
  rank-receiving pages, README.md:64)
- dangling pages: text but zero links (i % 19 == 0)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _s(*cols: Column | str) -> Column:
    """concat() with implicit cast of numerics to string (matches || in DuckDB)."""
    return F.concat(*[F.lit(c) if isinstance(c, str) else c.cast("string") for c in cols])


def wiki_corpus(documents: DataFrame, n_docs: int) -> DataFrame:
    """documents(doc_id, ...) -> corpus(doc_id, raw) — one page line per row.

    ``n_docs`` is the table row count (the driver-side scalar the
    reference ships through a Hadoop counter + Configuration,
    PageRankAlgorithm.java:77-78,88; here it is just a Python int
    folded into the expressions as a literal).
    """
    i = F.col("doc_id")
    n = F.lit(n_docs)
    t1 = (i * 3 + 7) % n
    t2 = (i * 5 + 11) % n
    t3 = (i * 7 + 13) % n

    links = _s(
        _s("[[doc_", t1, "]] "),
        _s("[[doc_", t2, "|alias]] "),
        _s("[[File:img", i, ".png|thumb [[doc_", t3, "]] caption]] "),
        F.when(i % 11 == 0, _s("[[doc_", t1, "]] ")).otherwise(F.lit("")),
        F.when(i % 13 == 0, _s("[[ghost_", i % 7, "]] ")).otherwise(F.lit("")),
        F.when(i % 23 == 0, _s("[[doc_", i, "]] ")).otherwise(F.lit("")),
    )
    body = F.when(i % 19 == 0, F.lit("plain dangling text no links here")).otherwise(
        _s("intro words ", links, "outro")
    )
    raw = F.when(
        i % 17 == 0,
        _s("<title>doc_", i, "</title><id>", i, "</id><revision></revision>"),
    ).otherwise(
        _s(
            "<title>doc_",
            i,
            "</title><id>",
            i,
            '</id><revision><text xml:space="preserve">',
            body,
            "</text></revision>",
        )
    )
    return documents.select(i.alias("doc_id"), raw.alias("raw"))


def wiki_corpus_sql(n_expr: str = "(SELECT COUNT(*) FROM documents)") -> str:
    """The DuckDB-SQL twin of :func:`wiki_corpus`, as a CTE body.

    Returns a ``SELECT`` producing (doc_id, raw) from ``documents``;
    kept next to the Spark derivation so the two stay in sync.
    """
    return f"""
    SELECT d.doc_id,
      CASE WHEN d.doc_id % 17 = 0 THEN
        '<title>doc_' || d.doc_id || '</title><id>' || d.doc_id || '</id><revision></revision>'
      ELSE
        '<title>doc_' || d.doc_id || '</title><id>' || d.doc_id
        || '</id><revision><text xml:space="preserve">'
        || CASE WHEN d.doc_id % 19 = 0 THEN 'plain dangling text no links here'
           ELSE 'intro words '
             || '[[doc_' || ((d.doc_id * 3 + 7) % {n_expr}) || ']] '
             || '[[doc_' || ((d.doc_id * 5 + 11) % {n_expr}) || '|alias]] '
             || '[[File:img' || d.doc_id || '.png|thumb [[doc_'
                || ((d.doc_id * 7 + 13) % {n_expr}) || ']] caption]] '
             || CASE WHEN d.doc_id % 11 = 0
                  THEN '[[doc_' || ((d.doc_id * 3 + 7) % {n_expr}) || ']] ' ELSE '' END
             || CASE WHEN d.doc_id % 13 = 0
                  THEN '[[ghost_' || (d.doc_id % 7) || ']] ' ELSE '' END
             || CASE WHEN d.doc_id % 23 = 0
                  THEN '[[doc_' || d.doc_id || ']] ' ELSE '' END
             || 'outro'
           END
        || '</text></revision>'
      END AS raw
    FROM documents d
    """
