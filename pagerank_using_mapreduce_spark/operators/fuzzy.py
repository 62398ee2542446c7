"""Fuzzy (approximate-string) matching: edit-distance joins without a
quadratic cross join — the data-cleaning primitive for typo clustering,
entity resolution, and vocabulary normalization (extension surface; the
reference matches tokens exactly, InvertedIndex.java:102-105).

Blocking is the symmetric-delete scheme (SymSpell, public algorithm):
if edit_distance(a, b) <= d, then a and b share at least one common
variant in their delete neighborhoods of depth <= d — so generating
ONLY deletions (never the alphabet-sized insert/substitute fan-out)
and equi-joining on the variant key finds every candidate pair.  The
exact Levenshtein check then runs on candidates only.

Scale shape: runs on the DISTINCT-WORD relation (corpus -> vocab
compression first, like the BPE trainer); the delete-variant fan-out
is O(len^d) per word with d=2 — bounded by word length, not corpus
size; the candidate equi-join shuffles on uniform string keys.  No
Python anywhere: variant generation is nested `transform` lambdas,
verification is the built-in `levenshtein`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import word_freqs

FUZZY_MAX_DIST = 2

# All delete-variants of `w` at depth 1 (one char removed), as a SQL
# lambda so the identical expression nests for depth 2.
_DEL1 = (
    "transform(sequence(1, length({w})), i -> "
    "concat(substring({w}, 1, i - 1), substring({w}, i + 1, length({w}))))"
)


def _variant_keys() -> F.Column:
    """word ∪ deletes1(word) ∪ deletes2(word), deduplicated."""
    d1 = _DEL1.format(w="word")
    d2 = f"flatten(transform({d1}, v -> {_DEL1.format(w='v')}))"
    return F.expr(f"array_distinct(concat(array(word), {d1}, {d2}))")


def fuzzy_word_pairs(
    documents: DataFrame, max_dist: int = FUZZY_MAX_DIST
) -> DataFrame:
    """(word_a, word_b, dist): distinct corpus-vocabulary word pairs
    within Levenshtein distance ``max_dist`` (<= 2 — the blocking
    depth is fixed at 2 delete levels)."""
    if not 1 <= max_dist <= 2:
        raise ValueError("blocking depth supports max_dist in {1, 2}")
    keys = (
        word_freqs(documents)
        .select("word", F.explode(_variant_keys()).alias("k"))
        .distinct()
    )
    a, b = keys.alias("a"), keys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.word") < F.col("b.word")),
        )
        .select(
            F.col("a.word").alias("word_a"), F.col("b.word").alias("word_b")
        )
        .distinct()
    )
    dist = F.levenshtein("word_a", "word_b")
    return cand.select("word_a", "word_b", dist.cast("long").alias("dist")).where(
        F.col("dist") <= max_dist
    )


def fuzzy_word_pairs_sql(max_dist: int = FUZZY_MAX_DIST) -> str:
    del1 = (
        "list_transform(range(1, length({w}) + 1), i -> "
        "substr({w}, 1, CAST(i - 1 AS INT)) || substr({w}, CAST(i + 1 AS INT), length({w})))"
    )
    d1 = del1.format(w="word")
    d2 = f"flatten(list_transform({d1}, v -> {del1.format(w='v')}))"
    return f"""
WITH wf AS (
  SELECT DISTINCT unnest(list_filter(
           string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
           t -> t != '')) AS word
  FROM documents
),
keys AS (
  SELECT DISTINCT word, unnest(list_distinct(
           list_concat(list_concat([word], {d1}), {d2}))) AS k
  FROM wf
),
cand AS (
  SELECT DISTINCT a.word AS word_a, b.word AS word_b
  FROM keys a JOIN keys b ON a.k = b.k AND a.word < b.word
)
SELECT word_a, word_b, CAST(levenshtein(word_a, word_b) AS BIGINT) AS dist
FROM cand WHERE levenshtein(word_a, word_b) <= {max_dist}"""
