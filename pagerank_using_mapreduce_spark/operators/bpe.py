"""Byte-pair-encoding merge training — learning a subword tokenizer's
merge table from the corpus, on-cluster (extension surface; the
reference tokenizes by whitespace only, InvertedIndex.java:102-105).

The algorithm (Sennrich et al. 2016, the standard LLM tokenizer
bootstrap): start from characters, repeatedly find the most frequent
ADJACENT symbol pair across the corpus and fuse it into one symbol;
the ordered list of fused pairs IS the tokenizer's merge table.

Design for 100 TB:

- **Train on the vocabulary, not the corpus.**  The first step
  aggregates the corpus to ``(word, freq)`` — one groupBy, after which
  every merge round touches only the distinct-word relation (Heaps'
  law: millions of rows for a 100 TB corpus, not trillions).  This is
  the same corpus→vocab compression every production BPE trainer does.
- **One bounded aggregation + one driver scalar per round.**  Pair
  counting is a groupBy over the vocab with map-side partial sums; the
  argmax crosses cluster→driver as a single collected row (the S4/S5
  scalar-channel pattern, reference PageRankAlgorithm.java:77-78,88),
  then folds into the next round's merge expression as literals.
- **The merge itself is a column-expression fold** (``F.aggregate``)
  over each word's symbol array — greedy left-to-right, the exact
  semantics reference BPE implementations use ("aaa" + merge (a,a)
  -> ["aa","a"]).  No Python touches any row.

Determinism: counts are integer sums; argmax ties break on the
lexicographically smallest (left, right) pair, so the trajectory —
and therefore the oracle replay — is unique.

The symbol-array fold accumulates a UNIT-SEPARATED STRING rather than
an array so the DuckDB twin (``list_reduce``, whose accumulator must
be element-typed) can express the identical fold; '\\x1f' cannot occur
in [a-z]+ symbols, so the encoding is unambiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textops import strip_non_alpha, tokens

N_MERGES = 8
SEP = "\x1f"


def word_freqs(documents: DataFrame) -> DataFrame:
    """(word, freq): the alpha-only lowercased vocabulary with corpus
    frequencies — the inverted-index tokenization (P6-P8)."""
    return (
        documents.select(
            F.explode(tokens(strip_non_alpha(F.col("text")))).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _chars(word):
    return F.expr(f"transform(sequence(1, length({word})), i -> substring({word}, i, 1))")


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(left, right, cnt): adjacent-pair frequencies over the vocab,
    weighted by word frequency.  zip_with over two slices — no
    self-join, no explode of anything bigger than the symbol arrays."""
    n = F.size("syms")
    pairs = F.zip_with(
        F.slice("syms", 1, n - 1),
        F.expr("slice(syms, 2, size(syms) - 1)"),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        vocab.where(n >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _keep_disjoint(
    top: list[tuple[str, str, int]], cap: int | None = None
) -> list[tuple[str, str, int]]:
    """Greedy-maximal batch rule (replayed exactly by the SQL twin's
    linear recursive CTE): walk the ranked top-m list, keep every pair
    whose symbols are both unused by an already-kept pair (at most
    ``cap`` pairs).  The top pair always survives, so every round makes
    progress.  Survivors are pairwise symbol-disjoint: their counts are
    mutually unaffected (fusing (l, r) only changes adjacencies that
    touch l or r) and their right symbols are unique, which the
    simultaneous fold relies on."""
    kept: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for l, r, cnt in top:
        if l not in used and r not in used:
            kept.append((l, r, cnt))
            used.update((l, r))
            if cap is not None and len(kept) >= cap:
                break
    return kept


def _batch_merge_expr(kept: list[tuple[str, str]]):
    """One simultaneous left-to-right fold applying every kept pair —
    first-match-wins over the rank-ordered batch.  Right symbols are
    unique across the batch (disjointness), so "first match" is "the
    match": semantics are identical to the SQL twin's
    list_position-indexed fold."""
    sep = F.lit(SEP)

    def step(acc, x):
        w = F.when(acc == "", x)
        for left, right in kept:
            l, lr = F.lit(left), F.lit(left + right)
            fuse = (x == F.lit(right)) & (
                (acc == l) | acc.endswith(F.concat(sep, l))
            )
            fused = F.concat(
                F.substring(acc, 1, F.length(acc) - F.length(l)).cast("string"),
                lr,
            )
            w = w.when(fuse, fused)
        return w.otherwise(F.concat(acc, sep, x))

    folded = F.aggregate("syms", F.lit(""), step)
    return F.split(folded, SEP)


def _train_batched(
    documents: DataFrame,
    rounds: int,
    batch: int,
    lookahead: int | None = None,
) -> tuple[list[tuple[int, int, str, str, int]], DataFrame]:
    """Batched merge training: ``rounds`` driver round-trips, each
    applying up to ``batch`` mutually symbol-disjoint top pairs in ONE
    vocab pass — the standard distributed-BPE trick, so a realistic
    30k-merge vocabulary needs O(n_merges / batch) Spark jobs, not one
    per merge (VERDICT r05 #2).  At ``batch=1`` the trajectory is
    exactly sequential BPE.  ``lookahead`` (default = ``batch``) is how
    deep the ranked candidate list is scanned for disjoint pairs: on a
    small alphabet the top-``batch`` candidates share symbols heavily
    (16 starting symbols admit at most 8 disjoint pairs), so a deeper
    scan — still one O(lookahead) driver collect — fills batches
    sooner.  Returns ([(merge_idx, round, left, right, pre-batch
    pair_count)], final vocab)."""
    lookahead = max(batch, lookahead or batch)
    vocab = (
        word_freqs(documents)
        .select("word", _chars("word").alias("syms"), "freq")
        .localCheckpoint(eager=True)
    )
    out: list[tuple[int, int, str, str, int]] = []
    for k in range(rounds):
        top = [
            (r["left"], r["right"], r["cnt"])
            for r in _pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(lookahead)
            .collect()
        ]
        kept = _keep_disjoint(top, cap=batch)
        if not kept:
            break
        for left, right, cnt in kept:
            out.append((len(out), k, left, right, cnt))
        # the merge fold is an O(batch)-branch CASE per round: lineage
        # must be CUT each round (eager localCheckpoint, the pagerank
        # S3 pattern) — persist()+count() materializes data but keeps
        # the ANALYZED PLAN growing by batch whens per round, and at
        # batch 64 the driver OOMs on plan analysis around round 10
        # long before data volume matters
        nxt = vocab.select(
            "word",
            _batch_merge_expr([(l, r) for l, r, _ in kept]).alias("syms"),
            "freq",
        ).localCheckpoint(eager=True)
        # no explicit release: localCheckpoint blocks are not
        # CacheManager entries (unpersist() would be a no-op); dropping
        # the reference here lets the ContextCleaner reclaim the
        # previous round's blocks, and each round's vocab is
        # Heaps-law-bounded so at most a handful of rounds' blocks
        # coexist between GC cycles
        vocab = nxt
    return out, vocab


def _train(
    documents: DataFrame, n_merges: int = N_MERGES
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Sequential (batch=1) merge training; returns (merge table rows,
    final vocab as (word, syms, freq)).  The vocab keeps the original
    word as the join key so encoding (applying the learned merges back
    to the corpus) is a plain word join — the trainer itself ignores
    it."""
    out, vocab = _train_batched(documents, n_merges, 1)
    return [(i, l, r, cnt) for i, _k, l, r, cnt in out], vocab


def bpe_merges(
    documents: DataFrame, n_merges: int = N_MERGES
) -> DataFrame:
    """(merge_idx, left, right, pair_count): the learned merge table,
    in training order.  Stops early if the vocabulary runs out of
    adjacent pairs."""
    spark = documents.sparkSession
    out, _vocab = _train(documents, n_merges)  # blocks freed by GC
    return spark.createDataFrame(
        out, "merge_idx long, left string, right string, pair_count long"
    )


BATCH_ROUNDS = 3
BATCH_M = 8


def bpe_merges_batched(
    documents: DataFrame,
    rounds: int = BATCH_ROUNDS,
    batch: int = BATCH_M,
    lookahead: int | None = None,
) -> DataFrame:
    """(merge_idx, round, left, right, pair_count): the merge table
    learned by the BATCHED trainer — up to ``batch`` symbol-disjoint
    merges per driver round-trip (see :func:`_train_batched`).
    ``pair_count`` is the pre-batch count, exact for every survivor
    because survivors are pairwise symbol-disjoint."""
    spark = documents.sparkSession
    # final vocab unused here; its checkpoint blocks are reclaimed by
    # the ContextCleaner once the reference drops (unpersist() is a
    # no-op on localCheckpoint blocks — not CacheManager entries)
    out, _vocab = _train_batched(documents, rounds, batch, lookahead)
    return spark.createDataFrame(
        out,
        "merge_idx long, round long, left string, right string,"
        " pair_count long",
    )


def _batched_round_ctes(
    rounds: int, batch: int, lookahead: int | None = None
) -> list[str]:
    """Unrolled CTE chain replaying the batched trajectory: per round,
    pair counts -> ranked top-``lookahead`` -> GREEDY disjoint
    selection capped at ``batch`` kept (a linear recursive CTE
    carrying the used-symbol set AND the kept counter, one row per
    rank — exactly :func:`_keep_disjoint` with the candidate
    lookahead) -> a 1-row (ls, rs) batch relation -> the simultaneous
    indexed fold.  ``lookahead=None`` degenerates to ``batch`` (the
    registry default, where the two caps coincide).  Static in
    ``rounds`` (the per-round survivor count is data-dependent; the
    round count is not), so the twin needs no data access to
    generate.  The caller must emit ``WITH RECURSIVE``."""
    lookahead = batch if lookahead is None else max(lookahead, batch)
    ctes = [
        """wf AS MATERIALIZED (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT unnest(list_filter(
             string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
             t -> t != '')) AS word
    FROM documents)
  WHERE word != '' GROUP BY word
),
v0 AS MATERIALIZED (
  SELECT word,
         list_transform(range(1, length(word) + 1),
                        i -> substr(word, CAST(i AS INT), 1)) AS syms,
         freq
  FROM wf
)"""
    ]
    for k in range(rounds):
        ctes.append(
            f"""p{k} AS MATERIALIZED (
  SELECT element1 AS lft, element2 AS rgt, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (
    SELECT unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)]),
                  recursive := true), freq
    FROM v{k} WHERE len(syms) >= 2)
  GROUP BY element1, element2
),
t{k} AS MATERIALIZED (
  SELECT lft, rgt, cnt,
         row_number() OVER (ORDER BY cnt DESC, lft ASC, rgt ASC) AS rk
  FROM p{k}
  QUALIFY rk <= {lookahead}
),
sel{k} AS (
  SELECT 0 AS rk, CAST([] AS VARCHAR[]) AS used, 0 AS nkept,
         CAST(NULL AS VARCHAR) AS lft, CAST(NULL AS VARCHAR) AS rgt,
         CAST(NULL AS BIGINT) AS cnt, FALSE AS kept
  UNION ALL
  SELECT t.rk,
         CASE WHEN NOT (list_contains(s.used, t.lft)
                        OR list_contains(s.used, t.rgt))
              THEN list_append(list_append(s.used, t.lft), t.rgt)
              ELSE s.used END,
         s.nkept + CASE WHEN list_contains(s.used, t.lft)
                        OR list_contains(s.used, t.rgt)
                   THEN 0 ELSE 1 END,
         t.lft, t.rgt, t.cnt,
         NOT (list_contains(s.used, t.lft) OR list_contains(s.used, t.rgt))
  FROM sel{k} s JOIN t{k} t ON t.rk = s.rk + 1 AND s.nkept < {batch}
),
kept{k} AS MATERIALIZED (
  SELECT lft, rgt, cnt, rk FROM sel{k} WHERE kept
),
kb{k} AS MATERIALIZED (
  SELECT COALESCE(list(lft ORDER BY rk), []) AS ls,
         COALESCE(list(rgt ORDER BY rk), []) AS rs
  FROM kept{k}
),
v{k + 1} AS MATERIALIZED (
  -- ls/rs captured as row columns via the 1-row CROSS JOIN; right
  -- symbols are unique across the batch, so list_position indexes the
  -- only applicable pair
  SELECT word,
         string_split(
           list_reduce(
             list_prepend('', syms),
             (acc, x) -> CASE
               WHEN acc = '' THEN x
               WHEN COALESCE(list_position(rs, x), 0) > 0
                    AND (acc = ls[list_position(rs, x)]
                         OR ends_with(acc, chr(31) || ls[list_position(rs, x)]))
                 THEN substr(acc, 1,
                             length(acc) - length(ls[list_position(rs, x)]))
                      || ls[list_position(rs, x)] || x
               ELSE acc || chr(31) || x
             END),
           chr(31)) AS syms,
         freq
  FROM v{k} CROSS JOIN kb{k}
)"""
        )
    return ctes


def bpe_merges_batched_sql(
    rounds: int = BATCH_ROUNDS,
    batch: int = BATCH_M,
    lookahead: int | None = None,
) -> str:
    """DuckDB twin of :func:`bpe_merges_batched` — including the
    candidate ``lookahead`` (deeper ranked scan before the disjoint
    cap), so non-default-lookahead trainings (bench's 1k-merge
    evidence row) have an oracle replay too."""
    union = "\nUNION ALL\n".join(
        f"SELECT {k} AS round, lft, rgt, cnt, rk FROM kept{k}"
        for k in range(rounds)
    )
    return (
        "WITH RECURSIVE "
        + ",\n".join(_batched_round_ctes(rounds, batch, lookahead))
        + f""",
allkept AS ({union})
SELECT row_number() OVER (ORDER BY round, rk) - 1 AS merge_idx,
       CAST(round AS BIGINT) AS round,
       lft AS "left", rgt AS "right", cnt AS pair_count
FROM allkept
ORDER BY merge_idx"""
    )


def bpe_encode_counts(
    documents: DataFrame, n_merges: int = N_MERGES
) -> DataFrame:
    """(doc_id, n_tokens, n_subwords): tokenize the corpus with the
    merge table just trained on it — the per-document subword budget a
    packing/pricing pass needs.

    Scale shape: the fold already happened per DISTINCT word during
    training (corpus→vocab compression), so encoding is one explode of
    doc tokens + one word-keyed join against the ≤vocab-sized
    (word → subword count) relation + one doc aggregate.  No per-token
    Python, no re-fold over the full corpus."""
    _, vocab = _train(documents, n_merges)
    enc = vocab.select("word", F.size("syms").cast("long").alias("ns"))
    doc_words = documents.select(
        "doc_id",
        F.explode(tokens(strip_non_alpha(F.col("text")))).alias("word"),
    ).where(F.col("word") != "")
    out = (
        doc_words.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("ns").alias("n_subwords"),
        )
    )
    return out


def _trajectory_ctes(n_merges: int = N_MERGES) -> list[str]:
    """The unrolled per-round CTE chain replaying the exact training
    trajectory — vocab_k -> pair counts -> 1-row best_k (same tiebreak)
    -> vocab_{k+1} via the identical list_reduce fold.  MATERIALIZED
    per round (each vocab is referenced by both the pair count and the
    next round; inlining would re-derive exponentially).  The v-chain
    carries ``word`` so the final vocab doubles as the encoder's
    (word → syms) map; the trainer's aggregates ignore it."""
    ctes = [
        """wf AS MATERIALIZED (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT unnest(list_filter(
             string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
             t -> t != '')) AS word
    FROM documents)
  WHERE word != '' GROUP BY word
),
v0 AS MATERIALIZED (
  SELECT word,
         list_transform(range(1, length(word) + 1),
                        i -> substr(word, CAST(i AS INT), 1)) AS syms,
         freq
  FROM wf
)"""
    ]
    for k in range(n_merges):
        ctes.append(
            f"""p{k} AS MATERIALIZED (
  SELECT element1 AS lft, element2 AS rgt, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (
    SELECT unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)]),
                  recursive := true), freq
    FROM v{k} WHERE len(syms) >= 2)
  GROUP BY element1, element2
),
b{k} AS MATERIALIZED (
  SELECT lft, rgt, cnt FROM p{k}
  ORDER BY cnt DESC, lft ASC, rgt ASC LIMIT 1
),
v{k + 1} AS MATERIALIZED (
  -- lft/rgt captured as row columns via the 1-row CROSS JOIN (DuckDB
  -- lambdas cannot contain subqueries)
  SELECT word,
         string_split(
           list_reduce(
             list_prepend('', syms),
             (acc, x) -> CASE
               WHEN acc = '' THEN x
               WHEN x = rgt AND (acc = lft OR ends_with(acc, chr(31) || lft))
                 THEN substr(acc, 1, length(acc) - length(lft)) || lft || rgt
               ELSE acc || chr(31) || x
             END),
           chr(31)) AS syms,
         freq
  FROM v{k} CROSS JOIN b{k}
)"""
        )
    return ctes


def bpe_merges_sql(n_merges: int = N_MERGES) -> str:
    """DuckDB twin of :func:`bpe_merges` over the trajectory CTEs."""
    union = "\nUNION ALL\n".join(
        f'SELECT CAST({k} AS BIGINT) AS merge_idx, lft AS "left", rgt AS "right", cnt AS pair_count'
        f" FROM b{k}"
        for k in range(n_merges)
    )
    return "WITH " + ",\n".join(_trajectory_ctes(n_merges)) + "\n" + union


def bpe_encode_sql(n_merges: int = N_MERGES) -> str:
    """DuckDB twin of :func:`bpe_encode_counts`: replay the training
    trajectory, then join each document's token stream against the
    final (word → subword count) vocabulary."""
    ctes = _trajectory_ctes(n_merges)
    ctes.append(
        f"""enc AS MATERIALIZED (
  SELECT word, CAST(len(syms) AS BIGINT) AS ns FROM v{n_merges}
),
docw AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
           t -> t != '')) AS word
  FROM documents
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(ns) AS BIGINT) AS n_subwords
FROM docw JOIN enc USING (word)
WHERE word != ''
GROUP BY doc_id"""
    )


# --------------------------------------------------------------------------
# Vocabulary coverage / OOV rate: given a top-K frequency vocabulary,
# what fraction of corpus tokens would be out-of-vocabulary — the
# metric that sizes a tokenizer's word list.  Rides the same
# corpus->vocab compression as the BPE trainer: everything after the
# first groupBy runs on the distinct-word relation.
# --------------------------------------------------------------------------

VOCAB_K = 20


def vocab_coverage(documents: DataFrame, k: int = VOCAB_K) -> DataFrame:
    """One row: (vocab_k, n_distinct_words, total_tokens,
    covered_tokens, oov_e6) for the top-``k``-by-frequency vocabulary
    (ties broken alphabetically — deterministic cut)."""
    wf = word_freqs(documents).persist()
    top = wf.orderBy(F.desc("freq"), F.asc("word")).limit(k)
    totals = wf.agg(
        F.count("*").alias("n_distinct_words"),
        F.sum("freq").alias("total_tokens"),
    )
    covered = top.agg(F.sum("freq").alias("covered_tokens"))
    return (
        totals.crossJoin(covered)
        .select(
            F.lit(k).cast("long").alias("vocab_k"),
            "n_distinct_words",
            "total_tokens",
            "covered_tokens",
            F.floor(
                (1.0 - F.col("covered_tokens").cast("double") / F.col("total_tokens"))
                * 1e6
                + F.lit(0.5000001)
            )
            .cast("long")
            .alias("oov_e6"),
        )
    )


def vocab_coverage_sql(k: int = VOCAB_K) -> str:
    return f"""
WITH wf AS (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT unnest(list_filter(
             string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
             t -> t != '')) AS word
    FROM documents)
  WHERE word != '' GROUP BY word
),
top AS (SELECT freq FROM wf ORDER BY freq DESC, word ASC LIMIT {k})
SELECT CAST({k} AS BIGINT) AS vocab_k,
       (SELECT COUNT(*) FROM wf) AS n_distinct_words,
       (SELECT CAST(SUM(freq) AS BIGINT) FROM wf) AS total_tokens,
       (SELECT CAST(SUM(freq) AS BIGINT) FROM top) AS covered_tokens,
       CAST(FLOOR(
         (1.0 - CAST((SELECT SUM(freq) FROM top) AS DOUBLE)
                / (SELECT SUM(freq) FROM wf)) * 1e6 + 0.5000001) AS BIGINT)
         AS oov_e6"""
