"""Text-analysis operators for training-data curation: language ID
(stopword-hit heuristic), quality scoring, token counting, document
fingerprinting.  Pure column expressions — the hot path stays inside
whole-stage codegen; per-row ratios are computed from integer counts so
both engines produce bit-identical doubles before quantization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textops import strip_non_alpha, tokens

# Tiny public stopword lists (per-language function words).  The guess
# is a heuristic score, not a model — deterministic and portable.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "es": ("el", "la", "los", "y", "es", "de", "un"),
    "fr": ("le", "la", "les", "et", "est", "un", "une"),
}

STOPWORDS_EN = LANG_STOPWORDS["en"]


def _toks(text_col: str = "text") -> Column:
    return tokens(strip_non_alpha(text_col))


def _hit_count(toks: Column, words: tuple[str, ...]) -> Column:
    """# token occurrences (duplicates counted) found in ``words``."""
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_id(documents: DataFrame) -> DataFrame:
    """(doc_id, lang_guess, best_ratio_e6): argmax stopword-hit ratio,
    'und' (undetermined) when no list scores > 0; alphabetical-first
    tiebreak (deterministic in both engines)."""
    toked = documents.select("doc_id", _toks().alias("toks"))
    scored = toked.select(
        "doc_id",
        F.size("toks").alias("n"),
        *[
            _hit_count(F.col("toks"), ws).alias(f"hits_{lang}")
            for lang, ws in sorted(LANG_STOPWORDS.items())
        ],
    )
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in sorted(LANG_STOPWORDS)])
    guess = F.lit("und")
    # iterate reversed so earlier (alphabetical) languages win ties
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        guess = F.when(
            (F.col(f"hits_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(guess)
    ratio = F.when(F.col("n") > 0, best.cast("double") / F.col("n")).otherwise(
        F.lit(0.0)
    )
    return scored.select(
        "doc_id",
        guess.alias("lang_guess"),
        F.floor(ratio * 1e6 + F.lit(0.5000001)).cast("long").alias("best_ratio_e6"),
    )


def _lang_id_sql() -> str:
    hits = ",\n         ".join(
        "len(list_filter(toks, t -> t IN ({}))) AS hits_{}".format(
            ", ".join(f"'{w}'" for w in ws), lang
        )
        for lang, ws in sorted(LANG_STOPWORDS.items())
    )
    langs = sorted(LANG_STOPWORDS)
    best = f"GREATEST({', '.join(f'hits_{lang}' for lang in langs)})"
    guess = "'und'"
    for lang in reversed(langs):
        guess = f"CASE WHEN hits_{lang} = {best} AND {best} > 0 THEN '{lang}' ELSE {guess} END"
    return f"""
WITH toked AS (
  SELECT doc_id,
         list_filter(string_split_regex(
           lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
           t -> t != '') AS toks
  FROM documents
),
scored AS (
  SELECT doc_id, len(toks) AS n,
         {hits}
  FROM toked
)
SELECT doc_id,
       {guess} AS lang_guess,
       CAST(FLOOR(
         CASE WHEN n > 0 THEN CAST({best} AS DOUBLE) / n ELSE 0.0 END
         * 1e6 + 0.5000001) AS BIGINT) AS best_ratio_e6
FROM scored"""


LANG_ID_SQL = _lang_id_sql()


def quality_score(documents: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_tokens, mean_token_len_e6, stopword_ratio_e6,
    alpha_ratio_e6, quality_e6).

    quality = 0.4·stopword_ratio + 0.3·alpha_ratio
            + 0.3·min(n_tokens, 200)/200 — a simple, monotone composite
    of the classic heuristic signals (length, letter density, function-
    word density)."""
    toked = documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).alias("n_alpha"),
        _toks().alias("toks"),
    )
    n_tok = F.size("toks")
    sw = _hit_count(F.col("toks"), STOPWORDS_EN)
    tok_chars = F.aggregate(
        F.transform(F.col("toks"), F.length),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    mean_len = F.when(n_tok > 0, tok_chars.cast("double") / n_tok).otherwise(F.lit(0.0))
    sw_ratio = F.when(n_tok > 0, sw.cast("double") / n_tok).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        F.col("n_chars") > 0, F.col("n_alpha").cast("double") / F.col("n_chars")
    ).otherwise(F.lit(0.0))
    len_score = F.least(n_tok, F.lit(200)).cast("double") / 200
    quality = sw_ratio * 0.4 + alpha_ratio * 0.3 + len_score * 0.3

    def e6(c: Column) -> Column:
        return F.floor(c * 1e6 + F.lit(0.5000001)).cast("long")

    return toked.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        e6(mean_len).alias("mean_token_len_e6"),
        e6(sw_ratio).alias("stopword_ratio_e6"),
        e6(alpha_ratio).alias("alpha_ratio_e6"),
        e6(quality).alias("quality_e6"),
    )


def quality_sql(docs_sql: str = "SELECT * FROM documents") -> str:
    """DuckDB twin of :func:`quality_score`, parameterized over the
    document relation (the augmented corpus for dedup compositions)."""
    return f"""
WITH toked AS (
  SELECT doc_id,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
         list_filter(string_split_regex(
           lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
           t -> t != '') AS toks
  FROM ({docs_sql})
),
m AS (
  SELECT doc_id, n_chars, n_alpha,
         len(toks) AS n_tok,
         len(list_filter(toks, t -> t IN ({", ".join(f"'{w}'" for w in STOPWORDS_EN)}))) AS sw,
         list_sum(list_transform(toks, t -> length(t))) AS tok_chars
  FROM toked
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_tok AS BIGINT) AS n_tokens,
       CAST(FLOOR((CASE WHEN n_tok > 0 THEN CAST(tok_chars AS DOUBLE) / n_tok ELSE 0.0 END) * 1e6 + 0.5000001) AS BIGINT) AS mean_token_len_e6,
       CAST(FLOOR((CASE WHEN n_tok > 0 THEN CAST(sw AS DOUBLE) / n_tok ELSE 0.0 END) * 1e6 + 0.5000001) AS BIGINT) AS stopword_ratio_e6,
       CAST(FLOOR((CASE WHEN n_chars > 0 THEN CAST(n_alpha AS DOUBLE) / n_chars ELSE 0.0 END) * 1e6 + 0.5000001) AS BIGINT) AS alpha_ratio_e6,
       CAST(FLOOR((
         (CASE WHEN n_tok > 0 THEN CAST(sw AS DOUBLE) / n_tok ELSE 0.0 END) * 0.4
         + (CASE WHEN n_chars > 0 THEN CAST(n_alpha AS DOUBLE) / n_chars ELSE 0.0 END) * 0.3
         + CAST(LEAST(n_tok, 200) AS DOUBLE) / 200 * 0.3
       ) * 1e6 + 0.5000001) AS BIGINT) AS quality_e6
FROM m"""


QUALITY_SQL = quality_sql()


# BPE-ish pre-tokenization: letter runs, single digits, single
# non-alphanumeric marks (whitespace dropped) — the classic GPT-2-style
# pre-tokenizer shape, counted without any Python in the loop.
BPE_REGEX = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_count(documents: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_pieces)."""
    return documents.select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_REGEX), 0))
        .cast("long")
        .alias("n_bpe_pieces"),
    )


TOKEN_COUNT_SQL = rf"""
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(lower(trim(text)), ' +'), t -> t != '')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_pieces
FROM documents"""


def fingerprint(documents: DataFrame) -> DataFrame:
    """(doc_id, fp): content fingerprint of the normalized token stream
    — whitespace/punctuation-insensitive exact identity (the md5 of the
    canonical token join), the cheap first stage before MinHash."""
    norm = F.array_join(_toks(), " ")
    return documents.select("doc_id", F.md5(norm).alias("fp"))


FINGERPRINT_SQL = """
SELECT doc_id,
       md5(array_to_string(list_filter(string_split_regex(
         lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
         t -> t != ''), ' ')) AS fp
FROM documents"""


def ngram_counts(documents: DataFrame, n: int = 2) -> DataFrame:
    """(ngram, cnt): global word-n-gram frequencies over the normalized
    token stream — the vocabulary-statistics pass of a training-data
    pipeline (n-gram LM features, contamination screens).

    Stays JVM-side: the n-gram windows are built with ``zip_with`` over
    ``slice`` offsets of the token array (no posexplode self-join, no
    Python), then one explode + one shuffle for the global count.  At
    100 TB the explode multiplies rows ~tokens-per-doc-fold but the
    groupBy gets map-side partial aggregation, so the shuffle carries
    only distinct n-grams per partition."""
    if n < 2:
        raise ValueError("use token counts for n=1")
    return (
        documents.select(F.explode(_gram_windows(_toks(), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("cnt"))
    )


def _gram_windows(toks: Column, n: int) -> Column:
    """Array of space-joined word n-grams via zip_with over slice
    offsets (no posexplode self-join, no Python)."""
    grams = F.slice(toks, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    for k in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, k + 1, F.greatest(F.size(toks) - (n - 1), F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return grams


def ngram_counts_sql(n: int = 2) -> str:
    """DuckDB twin of :func:`ngram_counts` (1-indexed list slicing)."""
    joined = " || ' ' || ".join(f"t[i+{k}]" for k in range(n))
    return f"""
WITH toks AS (
  SELECT list_filter(string_split_regex(
           lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
           t -> t != '') AS t
  FROM documents
),
grams AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - {n - 1}), i -> {joined})) AS ngram
  FROM toks
)
SELECT ngram, COUNT(*) AS cnt FROM grams GROUP BY ngram"""


def redact_numbers(events: DataFrame, col: str = "props") -> DataFrame:
    """Per-type redaction audit for a PII-style scrubbing pass: digit
    runs in ``col`` replaced by the '<NUM>' sentinel.  (The documents
    table is digit-free by construction, so the demonstration target is
    the events payload column.)  Emits, per event_type: row count,
    total redacted runs, and the count of distinct redacted payloads —
    the last verifies the replacement TEXT cross-engine, not just the
    match counts.  Pure column expressions; one shuffle."""
    redacted = F.regexp_replace(F.col(col), r"[0-9]+", "<NUM>")
    n_runs = F.size(F.regexp_extract_all(col, F.lit(r"[0-9]+"), 0))
    return (
        events.select(
            "event_type",
            redacted.alias("red"),
            n_runs.cast("long").alias("n_runs"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("n_runs").alias("total_runs"),
            F.countDistinct("red").alias("distinct_payloads"),
        )
    )


REDACT_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT) AS total_runs,
       COUNT(DISTINCT regexp_replace(props, '[0-9]+', '<NUM>', 'g')) AS distinct_payloads
FROM events
GROUP BY event_type"""


def repetition_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct, distinct_ratio_e6,
    top_share_e6): token-repetition quality signals — low distinct
    ratio / high top-token share flag boilerplate and degenerate
    (looping) generations, a standard pretraining-corpus filter.

    Stays exploded-relational (token explode → two-level aggregate)
    rather than per-row array gymnastics: the explode+groupBy shape
    gets map-side partial aggregation and whole-stage codegen, and the
    doc_id key is unique per document so the shuffle is balanced by
    construction.  Ratios divide two exact integers — bit-identical
    cross-engine."""
    toks = documents.select(
        "doc_id", F.explode(_toks()).alias("tok")
    )
    per_tok = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    per_doc = per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    def e6(c: Column) -> Column:
        return F.floor(c * 1e6 + F.lit(0.5000001)).cast("long")

    return (
        documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("n_distinct"), F.lit(0)).alias("n_distinct"),
            e6(
                F.when(
                    F.col("n_tokens") > 0,
                    F.col("n_distinct").cast("double") / F.col("n_tokens"),
                ).otherwise(F.lit(0.0))
            ).alias("distinct_ratio_e6"),
            e6(
                F.when(
                    F.col("n_tokens") > 0,
                    F.col("top_c").cast("double") / F.col("n_tokens"),
                ).otherwise(F.lit(0.0))
            ).alias("top_share_e6"),
        )
    )


REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(
           lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
           t -> t != '')) AS tok
  FROM documents
),
per_tok AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
per_doc AS (
  SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_distinct, MAX(c) AS top_c
  FROM per_tok GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(p.n_distinct, 0) AS BIGINT) AS n_distinct,
       CAST(FLOOR((CASE WHEN p.n_tokens > 0
                        THEN CAST(p.n_distinct AS DOUBLE) / p.n_tokens
                        ELSE 0.0 END) * 1e6 + 0.5000001) AS BIGINT) AS distinct_ratio_e6,
       CAST(FLOOR((CASE WHEN p.n_tokens > 0
                        THEN CAST(p.top_c AS DOUBLE) / p.n_tokens
                        ELSE 0.0 END) * 1e6 + 0.5000001) AS BIGINT) AS top_share_e6
FROM documents d LEFT JOIN per_doc p USING (doc_id)"""


# --------------------------------------------------------------------------
# Character-bigram language-model quality score: the model-based
# filter of the curation toolbox.  The corpus FITS its own bigram LM
# (P(c2|c1) from pair counts over normalized [a-z ] text), then each
# document is scored by its total log-probability — low scores flag
# gibberish / repetitive / off-distribution documents, the same signal
# perplexity filters use, with a model small enough to broadcast.
#
# Scale shape: the corpus is exploded to per-doc pair counts ONCE and
# that relation serves both phases — the model is an aggregate of it
# (<= alphabet^2 = 729 rows, broadcast back), the scores a join with
# it.  Determinism: log-probs are quantized to e6 integers PER DISTINCT
# BIGRAM (exact-operand division + ln on identical doubles, the tfidf
# precedent), so each doc's total is an integer sum — order-independent.
# --------------------------------------------------------------------------


def char_lm_scores(documents: DataFrame) -> DataFrame:
    """(doc_id, n_pairs, total_logp_e6, avg_logp_e6): per-document
    char-bigram log-likelihood under the corpus's own bigram model.
    Documents with fewer than 2 normalized characters are dropped
    (no pairs to score)."""
    normed = documents.select(
        "doc_id",
        F.trim(
            F.regexp_replace(F.lower(strip_non_alpha(F.col("text"))), " +", " ")
        ).alias("_norm"),
    )
    chars = F.expr("transform(sequence(1, length(_norm)), i -> substring(_norm, i, 1))")
    pairs = F.zip_with(
        F.expr("slice(ch, 1, size(ch) - 1)"),
        F.expr("slice(ch, 2, size(ch) - 1)"),
        lambda a, b: F.concat(a, b),
    )
    doc_pairs = (
        normed.where(F.length("_norm") >= 2)
        .select("doc_id", chars.alias("ch"))
        .select("doc_id", F.explode(pairs).alias("pair"))
        .groupBy("doc_id", "pair")
        .agg(F.count("*").alias("cnt"))
        .persist()  # serves both the model fit and the scoring join
    )
    bigram = doc_pairs.groupBy("pair").agg(F.sum("cnt").alias("c_pair"))
    ctx = bigram.groupBy(F.substring("pair", 1, 1).alias("c1")).agg(
        F.sum("c_pair").alias("c_ctx")
    )
    logp = bigram.join(ctx, F.substring(bigram.pair, 1, 1) == ctx.c1).select(
        "pair",
        F.floor(
            F.log(F.col("c_pair").cast("double") / F.col("c_ctx")) * 1e6
            + F.lit(0.5000001)
        )
        .cast("long")
        .alias("logp_e6"),
    )
    return (
        doc_pairs.join(F.broadcast(logp), "pair")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_pairs"),
            F.sum(F.col("cnt") * F.col("logp_e6")).alias("total_logp_e6"),
        )
        .select(
            "doc_id",
            "n_pairs",
            "total_logp_e6",
            # floor over an exact-operand double division: identical in
            # both engines even for negative totals (integer `div`
            # truncates toward zero in Spark but floors in DuckDB, so
            # it cannot be used here)
            F.floor(F.col("total_logp_e6").cast("double") / F.col("n_pairs"))
            .cast("long")
            .alias("avg_logp_e6"),
        )
    )


CHAR_LM_SQL = """
WITH normed AS (
  SELECT doc_id,
         trim(regexp_replace(lower(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g')),
                             ' +', ' ', 'g')) AS s
  FROM documents
),
doc_pairs AS MATERIALIZED (
  SELECT doc_id, pair, COUNT(*) AS cnt FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, length(s)),
                                 i -> substr(s, CAST(i AS INT), 2))) AS pair
    FROM normed WHERE length(s) >= 2)
  GROUP BY doc_id, pair
),
bigram AS (SELECT pair, CAST(SUM(cnt) AS BIGINT) AS c_pair
           FROM doc_pairs GROUP BY pair),
ctx AS (SELECT substr(pair, 1, 1) AS c1, CAST(SUM(c_pair) AS BIGINT) AS c_ctx
        FROM bigram GROUP BY 1),
logp AS (
  SELECT pair,
         CAST(FLOOR(ln(CAST(c_pair AS DOUBLE) / c_ctx) * 1e6 + 0.5000001)
              AS BIGINT) AS logp_e6
  FROM bigram JOIN ctx ON substr(pair, 1, 1) = c1
)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_pairs,
       CAST(SUM(cnt * logp_e6) AS BIGINT) AS total_logp_e6,
       CAST(FLOOR(CAST(SUM(cnt * logp_e6) AS DOUBLE) / SUM(cnt)) AS BIGINT)
         AS avg_logp_e6
FROM doc_pairs JOIN logp USING (pair)
GROUP BY doc_id"""


# --------------------------------------------------------------------------
# Exact n-gram decontamination: the eval-leakage screen used by
# production pretraining pipelines (flag TRAIN documents sharing any
# exact word n-gram with the EVAL split).  Complements the MinHash
# contamination audit (x38): LSH finds near-duplicate documents,
# this finds verbatim PHRASE overlap — the "benchmark answer string
# leaked into a training page" case near-dup similarity misses.
#
# Scale shape: one explode to (doc, gram), one distinct per side, one
# semi-join keyed on the gram — uniform text keys, map-side partial
# distinct, no all-pairs anything.  The eval side is typically tiny
# (a benchmark), so at production scale the distinct eval-gram
# relation broadcasts and the train side never shuffles.
# --------------------------------------------------------------------------

CONTAM_N = 5


def ngram_contamination(
    documents: DataFrame,
    n: int = CONTAM_N,
    key_col: str = "doc_id",
    seed: str = "split-0",
    train_split: str = "train",
    eval_split: str = "test",
) -> DataFrame:
    """(doc_id, n_shared): train-split documents sharing at least one
    exact word ``n``-gram with the eval split (splits via the standard
    md5 ``hash_split`` convention), with the count of distinct shared
    grams.  Clean documents are absent — the output is the
    contamination list, not a per-doc report."""
    from .sampling import hash_split

    grams = hash_split(documents, key_col, seed=seed).select(
        key_col, "split", F.explode(_gram_windows(_toks(), n)).alias("gram")
    )
    eval_grams = (
        grams.where(F.col("split") == eval_split).select("gram").distinct()
    )
    train_grams = (
        grams.where(F.col("split") == train_split)
        .select(key_col, "gram")
        .distinct()
    )
    return (
        train_grams.join(eval_grams, "gram", "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").alias("n_shared"))
    )


def ngram_contamination_sql(
    n: int = CONTAM_N,
    seed: str = "split-0",
) -> str:
    from .sampling import hash_split_sql

    joined = " || ' ' || ".join(f"t[i+{k}]" for k in range(n))
    split_case = hash_split_sql("doc_id", seed=seed)
    return f"""
WITH toks AS (
  SELECT doc_id, {split_case} AS split,
         list_filter(string_split_regex(
           lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
           t -> t != '') AS t
  FROM documents),
g AS (
  SELECT doc_id, split,
         unnest(list_transform(generate_series(1, len(t) - {n - 1}),
                               i -> {joined})) AS gram
  FROM toks),
ev AS (SELECT DISTINCT gram FROM g WHERE split = 'test'),
tr AS (SELECT DISTINCT doc_id, gram FROM g WHERE split = 'train')
SELECT doc_id, COUNT(*) AS n_shared
FROM tr WHERE gram IN (SELECT gram FROM ev)
GROUP BY doc_id"""


# ---------------------------------------------------------------------------
# Collocation mining: bigram lift (observed / expected-under-
# independence — the monotone core of PMI without the cross-engine
# hazard of log(), which is not IEEE-correctly-rounded).  Surfaces the
# corpus's multi-word expressions; a training pipeline uses the top of
# this list for tokenizer phrase candidates and template detection.
# ---------------------------------------------------------------------------

LIFT_MIN_COUNT = 5
LIFT_TOP_K = 50


def bigram_lift(
    documents: DataFrame,
    min_count: int = LIFT_MIN_COUNT,
    top_k: int = LIFT_TOP_K,
) -> DataFrame:
    """(left, right, pair_cnt, lift_e6): the ``top_k`` adjacent word
    pairs by lift = P(l,r) / (P(l)·P(r)), pairs below ``min_count``
    dropped (rare-pair lift is noise).

    Scale shape: two vocabulary-sized aggregates (unigrams, bigrams —
    both with map-side partial agg), two joins keyed on single words
    (uniform Zipf head is fine: the join carries the DISTINCT pair
    relation, not token occurrences), two 1-row total broadcasts, and a
    TakeOrdered top-k — no full sort.  All arithmetic after the integer
    counts is a fixed-association double expression, identical text in
    the oracle, so e6 quantization is cross-engine stable."""
    uni = (
        documents.select(F.explode(_toks()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("ucnt"))
    )
    n_uni = uni.agg(F.sum("ucnt").cast("double").alias("n_tok"))
    bi = (
        ngram_counts(documents, 2)
        .where(F.col("cnt") >= min_count)
        .select(
            F.split("ngram", " ")[0].alias("left"),
            F.split("ngram", " ")[1].alias("right"),
            F.col("cnt").alias("pair_cnt"),
        )
    )
    n_bi = (
        ngram_counts(documents, 2)
        .agg(F.sum("cnt").cast("double").alias("n_pair"))
    )
    lu = uni.select(F.col("word").alias("left"), F.col("ucnt").alias("lcnt"))
    ru = uni.select(F.col("word").alias("right"), F.col("ucnt").alias("rcnt"))
    lift = (F.col("pair_cnt").cast("double") / F.col("n_pair")) / (
        (F.col("lcnt").cast("double") / F.col("n_tok"))
        * (F.col("rcnt").cast("double") / F.col("n_tok"))
    )
    return (
        bi.join(lu, "left")
        .join(ru, "right")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "left",
            "right",
            "pair_cnt",
            F.floor(lift * 1e6 + F.lit(0.5000001)).cast("long").alias("lift_e6"),
        )
        .orderBy(F.desc("lift_e6"), F.asc("left"), F.asc("right"))
        .limit(top_k)
    )


def bigram_lift_sql(
    min_count: int = LIFT_MIN_COUNT, top_k: int = LIFT_TOP_K
) -> str:
    """DuckDB twin of :func:`bigram_lift` — identical fixed-association
    double arithmetic, identical tiebreak."""
    return f"""
WITH toked AS (
  SELECT list_filter(string_split_regex(
           lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
           t -> t != '') AS t
  FROM documents
),
uni AS (
  SELECT word, COUNT(*) AS ucnt
  FROM (SELECT unnest(t) AS word FROM toked)
  GROUP BY word
),
bi_all AS (
  SELECT lft, rgt, COUNT(*) AS pair_cnt
  FROM (
    SELECT unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i])) AS lft,
           unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i+1])) AS rgt
    FROM toked WHERE len(t) >= 2)
  GROUP BY lft, rgt
),
tot AS (
  SELECT CAST((SELECT SUM(ucnt) FROM uni) AS DOUBLE) AS n_tok,
         CAST((SELECT SUM(pair_cnt) FROM bi_all) AS DOUBLE) AS n_pair
)
SELECT b.lft AS "left", b.rgt AS "right", b.pair_cnt,
       CAST(FLOOR(
         ((CAST(b.pair_cnt AS DOUBLE) / n_pair)
          / ((CAST(l.ucnt AS DOUBLE) / n_tok)
             * (CAST(r.ucnt AS DOUBLE) / n_tok))) * 1e6 + 0.5000001)
         AS BIGINT) AS lift_e6
FROM bi_all b
JOIN uni l ON b.lft = l.word
JOIN uni r ON b.rgt = r.word
CROSS JOIN tot
WHERE b.pair_cnt >= {min_count}
ORDER BY lift_e6 DESC, "left" ASC, "right" ASC
LIMIT {top_k}"""


# ---------------------------------------------------------------------------
# Per-source distinctive keywords: each source's top words by rate
# lift (in-source frequency / corpus frequency — the c-TF-IDF idea
# with the same log-free ratio scoring as bigram_lift).  The corpus-
# profiling view a curation pipeline uses to see what each source is
# actually about (and to spot template/boilerplate sources).
# ---------------------------------------------------------------------------

KEYWORDS_PER_SOURCE = 5
KEYWORD_MIN_COUNT = 5


def source_keywords(
    documents: DataFrame,
    per_source: int = KEYWORDS_PER_SOURCE,
    min_count: int = KEYWORD_MIN_COUNT,
) -> DataFrame:
    """(source, word, cnt, lift_e6, rnk): the ``per_source`` most
    over-represented words per source (rate in source / rate in
    corpus), rare words dropped.

    Scale shape: one (source, word) aggregate with map-side combine —
    bounded by |sources|·vocab, not token volume; corpus totals are a
    word-keyed join against the vocab relation plus two 1-row
    broadcasts; per-source ranks are a window partitioned by source
    over the (source, word) relation (sharded by the key)."""
    sw = (
        documents.select("source", F.explode(_toks()).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").alias("cnt"))
    )
    src_tot = sw.groupBy("source").agg(F.sum("cnt").alias("src_toks"))
    word_tot = sw.groupBy("word").agg(F.sum("cnt").alias("word_cnt"))
    all_tot = sw.agg(F.sum("cnt").cast("double").alias("n_tok"))
    lift = (F.col("cnt").cast("double") / F.col("src_toks")) / (
        F.col("word_cnt").cast("double") / F.col("n_tok")
    )
    scored = (
        sw.where(F.col("cnt") >= min_count)
        .join(src_tot, "source")
        .join(word_tot, "word")
        .crossJoin(F.broadcast(all_tot))
        .select(
            "source",
            "word",
            "cnt",
            F.floor(lift * 1e6 + F.lit(0.5000001)).cast("long").alias("lift_e6"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.desc("lift_e6"), F.asc("word")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= per_source)
    )


def source_keywords_sql(
    per_source: int = KEYWORDS_PER_SOURCE, min_count: int = KEYWORD_MIN_COUNT
) -> str:
    """DuckDB twin of :func:`source_keywords` (identical ratio
    association and tiebreak)."""
    return f"""
WITH sw AS (
  SELECT source, word, COUNT(*) AS cnt FROM (
    SELECT source, unnest(list_filter(
             string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
             t -> t != '')) AS word
    FROM documents)
  GROUP BY source, word
),
src_tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS src_toks FROM sw GROUP BY source),
word_tot AS (SELECT word, CAST(SUM(cnt) AS BIGINT) AS word_cnt FROM sw GROUP BY word),
all_tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n_tok FROM sw),
scored AS (
  SELECT sw.source, sw.word, sw.cnt,
         CAST(FLOOR(
           ((CAST(sw.cnt AS DOUBLE) / s.src_toks)
            / (CAST(w.word_cnt AS DOUBLE) / n_tok)) * 1e6 + 0.5000001)
           AS BIGINT) AS lift_e6
  FROM sw
  JOIN src_tot s ON sw.source = s.source
  JOIN word_tot w ON sw.word = w.word
  CROSS JOIN all_tot
  WHERE sw.cnt >= {min_count}
)
SELECT source, word, cnt, lift_e6,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY source ORDER BY lift_e6 DESC, word ASC) AS rnk
  FROM scored)
WHERE rnk <= {per_source}"""


# --------------------------------------------------------------------------
# Per-document character entropy (x93): the Shannon entropy of the
# letter distribution — a classic gibberish / low-diversity quality
# signal (keyboard-mash and single-char spam score near 0; natural
# text near the language's ~4.1 bits).  COLUMN-ONLY: the 26 letter
# counts come from length-difference expressions (no per-char explode
# — a 100 TB corpus never fans out to one row per character), so the
# whole op is one narrow projection, no shuffle at all.
# --------------------------------------------------------------------------

_ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def doc_entropy(documents: DataFrame) -> DataFrame:
    """(doc_id, n_letters, entropy_e6): letter-distribution Shannon
    entropy (bits, e6-quantized) per document."""
    norm = F.lower(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    sel = documents.select("doc_id", norm.alias("_n"))
    total = F.length("_n").cast("double")
    terms = []
    for ch in _ALPHABET:
        c = (
            F.length("_n") - F.length(F.expr(f"replace(_n, '{ch}', '')"))
        ).cast("double")
        p = c / total
        terms.append(F.when(c > 0, -p * F.log2(p)).otherwise(F.lit(0.0)))
    ent = sum(terms[1:], terms[0])
    return sel.select(
        "doc_id",
        F.length("_n").cast("long").alias("n_letters"),
        F.when(F.length("_n") == 0, F.lit(0))
        .otherwise(F.floor(ent * 1e6 + F.lit(0.5000001)).cast("long"))
        .cast("long")
        .alias("entropy_e6"),
    )


def _doc_entropy_sql() -> str:
    terms = " + ".join(
        f"CASE WHEN length(n) - length(replace(n, '{ch}', '')) > 0 THEN"
        f" -(CAST(length(n) - length(replace(n, '{ch}', '')) AS DOUBLE)"
        f" / length(n))"
        f" * log2(CAST(length(n) - length(replace(n, '{ch}', '')) AS DOUBLE)"
        f" / length(n)) ELSE 0.0 END"
        for ch in _ALPHABET
    )
    return f"""
WITH nd AS (
  SELECT doc_id, lower(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n
  FROM documents
)
SELECT doc_id,
       CAST(length(n) AS BIGINT) AS n_letters,
       CASE WHEN length(n) = 0 THEN 0
            ELSE CAST(FLOOR(({terms}) * 1e6 + 0.5000001) AS BIGINT)
       END AS entropy_e6
FROM nd"""


DOC_ENTROPY_SQL = _doc_entropy_sql()


# --------------------------------------------------------------------------
# Stratified iceberg query (x92): frequent bigrams PER LANGUAGE with a
# HAVING-count threshold — the classic iceberg aggregate (Fang et al.,
# VLDB'98: the answer is the tiny tip; the below-threshold mass is
# never materialized past the partial aggregates) stratified by lang.
# Scale shape: one explode + one (lang, ngram) groupBy with map-side
# combine; the HAVING prunes before anything wide happens downstream,
# and the per-lang totals are a lang-cardinality relation (broadcast).
# --------------------------------------------------------------------------

ICEBERG_MIN_COUNT = 20


def stratified_iceberg(
    documents: DataFrame, min_count: int = ICEBERG_MIN_COUNT
) -> DataFrame:
    """(lang, ngram, cnt, share_e6): per-language bigrams with
    cnt >= ``min_count``; share is within-language frequency."""
    grams = documents.select(
        "lang", F.explode(_gram_windows(_toks(), 2)).alias("ngram")
    )
    counts = grams.groupBy("lang", "ngram").agg(F.count("*").alias("cnt"))
    totals = grams.groupBy("lang").agg(F.count("*").alias("lang_total"))
    return (
        counts.where(F.col("cnt") >= min_count)
        .join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "ngram",
            "cnt",
            F.floor(
                F.col("cnt").cast("double") / F.col("lang_total") * 1e6
                + F.lit(0.5000001)
            )
            .cast("long")
            .alias("share_e6"),
        )
    )


def stratified_iceberg_sql(min_count: int = ICEBERG_MIN_COUNT) -> str:
    return f"""
WITH grams AS (
  SELECT lang, unnest(list_transform(
           generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1])) AS ngram
  FROM (
    SELECT lang, list_filter(string_split_regex(
             lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
             t -> t != '') AS t
    FROM documents)
),
counts AS (
  SELECT lang, ngram, COUNT(*) AS cnt FROM grams GROUP BY lang, ngram
),
totals AS (SELECT lang, COUNT(*) AS lang_total FROM grams GROUP BY lang)
SELECT c.lang, c.ngram, c.cnt,
       CAST(FLOOR(CAST(c.cnt AS DOUBLE) / t.lang_total * 1e6 + 0.5000001)
            AS BIGINT) AS share_e6
FROM counts c JOIN totals t ON c.lang = t.lang
WHERE c.cnt >= {min_count}"""


# --------------------------------------------------------------------------
# Rare-token document audit (x94): which documents carry the corpus's
# hapax legomena (global frequency 1)?  High hapax rate flags OCR
# noise / mojibake / codeswitching — a standard curation screen.
# Scale shape: the hapax set is vocab-scale (Heaps' law — NOT
# broadcastable at 100 TB), so it joins the token stream word-keyed;
# hapax join keys are globally UNIQUE by construction, so the join is
# skew-free and its output is bounded by |hapax|.
# --------------------------------------------------------------------------


def rare_token_docs(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_hapax, hapax_rate_e6), one row per doc
    with >= 1 token; zero-hapax docs report 0."""
    doc_words = documents.select(
        "doc_id", F.explode(_toks()).alias("word")
    )
    wf = doc_words.groupBy("word").agg(F.count("*").alias("freq"))
    hapax = wf.where(F.col("freq") == 1).select("word")
    per_doc = doc_words.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens")
    )
    hap_doc = (
        doc_words.join(hapax, "word")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hapax"))
    )
    return (
        per_doc.join(hap_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_hapax", F.lit(0)).alias("n_hapax"),
            F.floor(
                F.coalesce("n_hapax", F.lit(0)).cast("double")
                / F.col("n_tokens")
                * 1e6
                + F.lit(0.5000001)
            )
            .cast("long")
            .alias("hapax_rate_e6"),
        )
    )


RARE_TOKEN_DOCS_SQL = """
WITH dw AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(
           lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
           t -> t != '')) AS word
  FROM documents
),
wf AS (SELECT word, COUNT(*) AS freq FROM dw GROUP BY word),
hapax AS (SELECT word FROM wf WHERE freq = 1),
per_doc AS (SELECT doc_id, COUNT(*) AS n_tokens FROM dw GROUP BY doc_id),
hap_doc AS (
  SELECT dw.doc_id, COUNT(*) AS n_hapax
  FROM dw JOIN hapax USING (word) GROUP BY dw.doc_id
)
SELECT p.doc_id, p.n_tokens,
       CAST(COALESCE(h.n_hapax, 0) AS BIGINT) AS n_hapax,
       CAST(FLOOR(CAST(COALESCE(h.n_hapax, 0) AS DOUBLE) / p.n_tokens * 1e6
                  + 0.5000001) AS BIGINT) AS hapax_rate_e6
FROM per_doc p LEFT JOIN hap_doc h ON p.doc_id = h.doc_id"""


# --------------------------------------------------------------------------
# Exact grouped length percentiles (x96): per-source p50/p90/p99 of
# per-doc token counts, WITHOUT approx_percentile and WITHOUT sorting
# documents — the doc relation collapses to a (source, len) histogram
# first (distinct lengths per source are bounded — thousands, not
# billions), the CDF is a window over that bounded relation, and the
# nearest-rank pick is pure integer arithmetic (cum*100 >= p*tot), so
# the oracle comparison has no float boundary at all.
# --------------------------------------------------------------------------


def length_percentiles(documents: DataFrame) -> DataFrame:
    """(source, n_docs, p50, p90, p99): exact nearest-rank percentiles
    of per-document token counts."""
    from pyspark.sql import Window

    lens = documents.select(
        "source", F.size(_toks()).cast("long").alias("len")
    )
    hist = lens.groupBy("source", "len").agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy("source")
        .orderBy("len")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("source")
    cdf = hist.select(
        "source",
        "len",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wt).alias("tot"),
    )
    pick = lambda p: F.min(  # noqa: E731
        F.when(F.col("cum") * 100 >= F.lit(p) * F.col("tot"), F.col("len"))
    )
    return cdf.groupBy("source").agg(
        F.max("tot").cast("long").alias("n_docs"),
        pick(50).alias("p50"),
        pick(90).alias("p90"),
        pick(99).alias("p99"),
    )


LENGTH_PERCENTILES_SQL = """
WITH lens AS (
  SELECT source,
         CAST(len(list_filter(string_split_regex(
           lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
           t -> t != '')) AS BIGINT) AS len
  FROM documents
),
hist AS (SELECT source, len, COUNT(*) AS cnt FROM lens GROUP BY source, len),
cdf AS (
  SELECT source, len,
         SUM(cnt) OVER (PARTITION BY source ORDER BY len
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY source) AS tot
  FROM hist
)
SELECT source,
       CAST(MAX(tot) AS BIGINT) AS n_docs,
       MIN(CASE WHEN cum * 100 >= 50 * tot THEN len END) AS p50,
       MIN(CASE WHEN cum * 100 >= 90 * tot THEN len END) AS p90,
       MIN(CASE WHEN cum * 100 >= 99 * tot THEN len END) AS p99
FROM cdf GROUP BY source"""


# --------------------------------------------------------------------------
# Document co-occurrence PMI (x99): pointwise mutual information of
# word pairs sharing documents — topic-association mining (x59 scores
# ADJACENT bigrams; this scores bag-of-doc co-occurrence).  The naive
# per-doc word self-join is quadratic in doc vocabulary and skewed by
# stopwords; the scale shape DF-BANDS the vocabulary first (only words
# with doc-freq in [lo, hi] participate — stopwords and hapaxes are
# excluded before anything wide), so the per-doc pair fan-out is
# bounded by the band's per-doc hit count, and the pair groupBy gets
# map-side combine.  Same blocking idea as x54's contamination screen.
# --------------------------------------------------------------------------

CO_DF_LO = 2
CO_DF_HI_PCT = 80  # upper cut: df <= 80% of n_docs (ubiquity screen)
CO_MIN_PAIRS = 3


def cooccurrence_pmi(
    documents: DataFrame,
    lo: int = CO_DF_LO,
    hi_pct: int = CO_DF_HI_PCT,
    min_pairs: int = CO_MIN_PAIRS,
) -> DataFrame:
    """(word_a, word_b, n_ab, pmi_e6): word_a < word_b, doc-level
    co-occurrence count and PMI = ln(P(a,b) / (P(a)P(b))) over doc
    probabilities.  The upper df cut is RELATIVE (df*100 <= hi_pct *
    n_docs, integer arithmetic) so the ubiquity screen tracks corpus
    size instead of needing retuning per scale."""
    dw = (
        documents.select("doc_id", F.explode(_toks()).alias("word"))
        .where(F.col("word") != "")
        .distinct()
    )
    nd = documents.agg(F.count("*").alias("n_docs"))
    dfreq = dw.groupBy("word").agg(F.count("*").alias("df"))
    band = (
        dfreq.crossJoin(F.broadcast(nd))
        .where(
            (F.col("df") >= lo)
            & (F.col("df") * 100 <= F.lit(hi_pct) * F.col("n_docs"))
        )
        .select("word", "df")
    )
    dwf = dw.join(band, "word")
    pairs = (
        dwf.alias("a")
        .join(
            dwf.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.word") < F.col("b.word")),
        )
        .groupBy(
            F.col("a.word").alias("word_a"),
            F.col("b.word").alias("word_b"),
            F.col("a.df").alias("df_a"),
            F.col("b.df").alias("df_b"),
        )
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= min_pairs)
    )
    nd = documents.agg(F.count("*").alias("n_docs"))
    pmi = F.log(
        F.col("n_ab").cast("double")
        * F.col("n_docs")
        / (F.col("df_a").cast("double") * F.col("df_b"))
    )
    return pairs.crossJoin(F.broadcast(nd)).select(
        "word_a",
        "word_b",
        "n_ab",
        F.floor(pmi * 1e6 + F.lit(0.5000001)).cast("long").alias("pmi_e6"),
    )


def cooccurrence_pmi_sql(
    lo: int = CO_DF_LO,
    hi_pct: int = CO_DF_HI_PCT,
    min_pairs: int = CO_MIN_PAIRS,
) -> str:
    return f"""
WITH dw AS (
  SELECT DISTINCT doc_id, word FROM (
    SELECT doc_id, unnest(list_filter(string_split_regex(
             lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
             t -> t != '')) AS word
    FROM documents)
  WHERE word != ''
),
dfreq AS (SELECT word, COUNT(*) AS df FROM dw GROUP BY word),
band AS (SELECT word, df FROM dfreq
         WHERE df >= {lo}
           AND df * 100 <= {hi_pct} * (SELECT COUNT(*) FROM documents)),
dwf AS (SELECT dw.doc_id, dw.word, band.df FROM dw JOIN band USING (word)),
pairs AS (
  SELECT a.word AS word_a, b.word AS word_b, a.df AS df_a, b.df AS df_b,
         COUNT(*) AS n_ab
  FROM dwf a JOIN dwf b ON a.doc_id = b.doc_id AND a.word < b.word
  GROUP BY a.word, b.word, a.df, b.df
  HAVING COUNT(*) >= {min_pairs}
),
nd AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT word_a, word_b, n_ab,
       CAST(FLOOR(ln(CAST(n_ab AS DOUBLE) * n_docs
                     / (CAST(df_a AS DOUBLE) * df_b)) * 1e6 + 0.5000001)
            AS BIGINT) AS pmi_e6
FROM pairs CROSS JOIN nd"""


# --------------------------------------------------------------------------
# N-gram novelty curve (x101): per document, the fraction of its
# distinct bigrams whose FIRST corpus occurrence (min doc_id —
# doc_ids are ingest-ordered) is this document.  The dataset-freshness
# metric a curation team tracks per crawl batch: novelty decaying to
# zero means the crawl is re-collecting what it already has.
# Scale shape: one distinct (gram, doc) relation, one gram-keyed min
# aggregate (uniform text keys, map-side combine), one gram-keyed join
# back, one doc aggregate — the same envelope as x60's first-occurrence
# election, never comparing documents pairwise.
# --------------------------------------------------------------------------


def ngram_novelty(documents: DataFrame) -> DataFrame:
    """(doc_id, n_grams, n_novel, novelty_e6) for every doc with >= 1
    bigram; novelty = n_novel / n_grams."""
    dg = (
        documents.select(
            "doc_id", F.explode(_gram_windows(_toks(), 2)).alias("gram")
        )
        .distinct()
    )
    first = dg.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    return (
        dg.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                (F.col("doc_id") == F.col("first_doc")).cast("long")
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.floor(
                F.col("n_novel").cast("double") / F.col("n_grams") * 1e6
                + F.lit(0.5000001)
            )
            .cast("long")
            .alias("novelty_e6"),
        )
    )


NGRAM_NOVELTY_SQL = """
WITH dg AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1])) AS gram
    FROM (
      SELECT doc_id, list_filter(string_split_regex(
               lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
               t -> t != '') AS t
      FROM documents))
),
first AS (SELECT gram, MIN(doc_id) AS first_doc FROM dg GROUP BY gram)
SELECT dg.doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN dg.doc_id = f.first_doc THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(FLOOR(CAST(SUM(CASE WHEN dg.doc_id = f.first_doc THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*) * 1e6 + 0.5000001) AS BIGINT)
         AS novelty_e6
FROM dg JOIN first f ON dg.gram = f.gram
GROUP BY dg.doc_id"""


# --------------------------------------------------------------------------
# Gopher-style n-gram repetition (x102): per document, the fraction of
# trigram OCCURRENCES that are repeats of a trigram already seen in the
# same document, plus the share claimed by the single most frequent
# trigram — the two repetition gates of the Gopher quality rules
# (Rae et al. 2021 §A1.1), at the n-gram level x34's token-level
# distinct-ratio cannot see (boilerplate repeats phrases, not words).
# Scale shape: explode + one (doc, gram) count with map-side combine
# (keys near-unique per doc, uniform), then a doc-keyed aggregate —
# no corpus-wide state, no pairwise comparison.
# --------------------------------------------------------------------------

REPETITION_GRAM_N = 3


def gopher_repetition(documents: DataFrame, n: int = REPETITION_GRAM_N) -> DataFrame:
    """(doc_id, n_grams, n_distinct, dup_frac_e6, top_share_e6) for
    every doc with >= 1 word n-gram; dup_frac = 1 - distinct/total."""
    per = (
        documents.select(
            "doc_id", F.explode(_gram_windows(_toks(), n)).alias("gram")
        )
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        per.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.count("*").alias("n_distinct"),
            F.max("cnt").alias("top_cnt"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_distinct",
            F.floor(
                (F.col("n_grams") - F.col("n_distinct")).cast("double")
                / F.col("n_grams")
                * 1e6
                + F.lit(0.5000001)
            )
            .cast("long")
            .alias("dup_frac_e6"),
            F.floor(
                F.col("top_cnt").cast("double") / F.col("n_grams") * 1e6
                + F.lit(0.5000001)
            )
            .cast("long")
            .alias("top_share_e6"),
        )
    )


GOPHER_REPETITION_SQL = """
WITH per AS (
  SELECT doc_id, gram, COUNT(*) AS cnt FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(t) - 2),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             AS gram
    FROM (
      SELECT doc_id, list_filter(string_split_regex(
               lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
               t -> t != '') AS t
      FROM documents))
  GROUP BY doc_id, gram
)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_grams,
       COUNT(*) AS n_distinct,
       CAST(FLOOR(CAST(SUM(cnt) - COUNT(*) AS DOUBLE) / SUM(cnt) * 1e6
                  + 0.5000001) AS BIGINT) AS dup_frac_e6,
       CAST(FLOOR(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) * 1e6 + 0.5000001)
            AS BIGINT) AS top_share_e6
FROM per GROUP BY doc_id"""


# --------------------------------------------------------------------------
# Word-bigram perplexity quality filter (x103): the CCNet-style signal
# — score every document by its cross-entropy under a word-bigram LM
# with add-one smoothing trained on the corpus itself.  Differs from
# x52's char model in unit (words), smoothing (add-1 over the vocab —
# the model generalizes to held-out text), and JOIN SHAPE: a word-
# bigram model is vocab²-scale (Heaps' law), so scoring rides a
# gram-keyed SHUFFLE join — broadcasting it, fine for x52's ~26²
# char table, would OOM executors at 100 TB.  Per-bigram log-probs are
# quantized to e6 integers FIRST and summed exactly, so both engines
# agree bit-for-bit regardless of float summation order.
# --------------------------------------------------------------------------


def bigram_perplexity(
    documents: DataFrame, materialize: bool = True
) -> DataFrame:
    """(doc_id, n_pairs, total_logp_e6, xent_e6) for docs with >= 2
    tokens; xent = -mean bigram log-prob (natural log, e6-quantized),
    P(w2 | w1) = (c12 + 1) / (c1 + V).

    ``materialize`` eagerly pins the scored result and releases the
    internal (doc, bigram) cache before returning (the
    with_global_position policy — long-lived sessions don't
    accumulate blocks); pass False to inspect the lazy plan."""
    toked = documents.select("doc_id", _toks().alias("t")).where(
        F.size("t") >= 2
    )
    bg = F.zip_with(
        F.expr("slice(t, 1, size(t) - 1)"),
        F.expr("slice(t, 2, size(t) - 1)"),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    doc_pairs = (
        toked.select("doc_id", F.explode(bg).alias("g"))
        .select("doc_id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("cnt"))
        .persist()  # serves both the model fit and the scoring join
    )
    bigram = doc_pairs.groupBy("w1", "w2").agg(F.sum("cnt").alias("c12"))
    ctx = bigram.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        documents.select(F.explode(_toks()).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    logp = (
        bigram.join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))  # 1-row scalar, S4 pattern
        .select(
            "w1",
            "w2",
            F.floor(
                F.log(
                    (F.col("c12") + 1).cast("double")
                    / (F.col("c1") + F.col("v"))
                )
                * 1e6
                + F.lit(0.5000001)
            )
            .cast("long")
            .alias("logp_e6"),
        )
    )
    out = (
        doc_pairs.join(logp, ["w1", "w2"])  # vocab²-scale: shuffle join
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_pairs"),
            F.sum(F.col("cnt") * F.col("logp_e6")).alias("total_logp_e6"),
        )
        .select(
            "doc_id",
            "n_pairs",
            "total_logp_e6",
            # floor over an exact-operand double division (x52's trick:
            # integer div truncates toward zero in Spark but floors in
            # DuckDB, so it cannot be used on negative totals)
            F.floor(
                -F.col("total_logp_e6").cast("double") / F.col("n_pairs")
            )
            .cast("long")
            .alias("xent_e6"),
        )
    )
    if not materialize:
        return out
    out = out.localCheckpoint(eager=True)
    doc_pairs.unpersist()
    return out


BIGRAM_PPL_SQL = """
WITH toked AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, list_filter(string_split_regex(
             lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
             t -> t != '') AS t
    FROM documents)
  WHERE len(t) >= 2
),
doc_pairs AS MATERIALIZED (
  SELECT doc_id, w1, w2, COUNT(*) AS cnt FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(t) - 1),
                                 i -> t[i])) AS w1,
           unnest(list_transform(generate_series(1, len(t) - 1),
                                 i -> t[i+1])) AS w2
    FROM toked)
  GROUP BY doc_id, w1, w2
),
bigram AS (SELECT w1, w2, SUM(cnt) AS c12 FROM doc_pairs GROUP BY w1, w2),
ctx AS (SELECT w1, SUM(c12) AS c1 FROM bigram GROUP BY w1),
vocab AS (
  SELECT COUNT(DISTINCT w) AS v FROM (
    SELECT unnest(list_filter(string_split_regex(
             lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
             t -> t != '')) AS w
    FROM documents)
),
logp AS (
  SELECT b.w1, b.w2,
         CAST(FLOOR(LN(CAST(b.c12 + 1 AS DOUBLE) / (c.c1 + vocab.v)) * 1e6
                    + 0.5000001) AS BIGINT) AS logp_e6
  FROM bigram b JOIN ctx c ON c.w1 = b.w1 CROSS JOIN vocab
)
SELECT dp.doc_id,
       CAST(SUM(dp.cnt) AS BIGINT) AS n_pairs,
       CAST(SUM(dp.cnt * l.logp_e6) AS BIGINT) AS total_logp_e6,
       CAST(FLOOR(-CAST(SUM(dp.cnt * l.logp_e6) AS DOUBLE) / SUM(dp.cnt))
            AS BIGINT) AS xent_e6
FROM doc_pairs dp JOIN logp l ON l.w1 = dp.w1 AND l.w2 = dp.w2
GROUP BY dp.doc_id"""


# --------------------------------------------------------------------------
# Zipf slope audit (x105): per-language least-squares fit of
# ln(freq) ~ ln(rank) over the word-frequency table — the power-law
# health check a corpus curation team runs per crawl (natural text
# sits near slope -1; a drifting slope flags boilerplate floods or
# template spam).  Determinism: ln(rank)/ln(freq) are quantized to e3
# integers FIRST; all five regression sums are EXACT integer
# aggregates (decimal(38) on Spark, HUGEINT on DuckDB), and the final
# slope/r² divisions start from identical integers in both engines.
# Scale shape: one (lang, word) count, one lang-partitioned rank
# window over the VOCAB relation (vocab-scale, not corpus-scale),
# then a 5-sum aggregate per lang — no corpus-sized sort.
# --------------------------------------------------------------------------

ZIPF_MIN_TYPES = 3  # below this the regression denominator is ~0


def zipf_slope(documents: DataFrame) -> DataFrame:
    """(lang, n_types, slope_e6, r2_e6) per language with >=
    ZIPF_MIN_TYPES word types; slope from the e3-quantized log-log
    regression."""
    from pyspark.sql import Window

    wf = (
        documents.select("lang", F.explode(_toks()).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count("*").alias("freq"))
    )
    ranked = wf.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(F.desc("freq"), "word")
        ),
    )
    q3 = lambda c: (  # noqa: E731 — ln quantized to e3 integers
        F.floor(F.log(c.cast("double")) * 1e3 + F.lit(0.5000001)).cast(
            "decimal(20,0)"
        )
    )
    pts = ranked.select(
        "lang", q3(F.col("rk")).alias("x"), q3(F.col("freq")).alias("y")
    )
    sums = pts.groupBy("lang").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return (
        sums.where(F.col("n") >= ZIPF_MIN_TYPES)
        .select(
            "lang",
            F.col("n").cast("long").alias("n_types"),
            F.floor(num / den * 1e6 + F.lit(0.5000001))
            .cast("long")
            .alias("slope_e6"),
            F.floor(num * num / (den * deny) * 1e6 + F.lit(0.5000001))
            .cast("long")
            .alias("r2_e6"),
        )
    )


ZIPF_SLOPE_SQL = f"""
WITH wf AS (
  SELECT lang, word, COUNT(*) AS freq FROM (
    SELECT lang, unnest(list_filter(string_split_regex(
             lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
             t -> t != '')) AS word
    FROM documents)
  GROUP BY lang, word
),
ranked AS (
  SELECT lang, freq,
         row_number() OVER (PARTITION BY lang ORDER BY freq DESC, word)
           AS rk
  FROM wf
),
pts AS (
  SELECT lang,
         CAST(FLOOR(LN(CAST(rk AS DOUBLE)) * 1e3 + 0.5000001) AS BIGINT) AS x,
         CAST(FLOOR(LN(CAST(freq AS DOUBLE)) * 1e3 + 0.5000001) AS BIGINT) AS y
  FROM ranked
),
sums AS (
  SELECT lang, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM pts GROUP BY lang
)
SELECT lang, CAST(n AS BIGINT) AS n_types,
       CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE) * 1e6 + 0.5000001)
            AS BIGINT) AS slope_e6,
       CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                  * CAST(n * sxy - sx * sy AS DOUBLE)
                  / (CAST(n * sxx - sx * sx AS DOUBLE)
                     * CAST(n * syy - sy * sy AS DOUBLE)) * 1e6 + 0.5000001)
            AS BIGINT) AS r2_e6
FROM sums WHERE n >= {ZIPF_MIN_TYPES}"""


# ---------------------------------------------------------------------------
# PII scan (x107): per-source detection rates for emails / IPv4 / phone
# numbers.  The synthetic corpus is letters-only, so the query augments
# it with deterministic doc_id-derived PII before scanning — both
# engines inject the identical strings, and every non-injected doc is a
# true negative the patterns must not fire on.  Detection is
# regexp_count on the raw text: a pure column expression (JVM
# whole-stage codegen), one map-side-combinable aggregate per source —
# zero joins, zero extra shuffles beyond the final groupBy.  Patterns
# deliberately use the regex subset (character classes, +, {n})
# interpreted identically by Java util.regex and DuckDB's RE2.
# ---------------------------------------------------------------------------

PII_EMAIL_PAT = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
PII_IP_PAT = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"
PII_PHONE_PAT = "555-[0-9]{4}"


def pii_augment(documents: DataFrame) -> DataFrame:
    """documents with deterministic PII appended: doc_id % 7 -> email,
    % 11 -> dotted-quad IP, % 13 -> 555-prefix phone (overlapping
    moduli give docs with several kinds)."""
    did = F.col("doc_id")
    email = F.when(
        did % 7 == 0,
        F.concat(F.lit(" contact user"), did, F.lit("@example.com")),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 11 == 0,
        F.concat(
            F.lit(" host 10."),
            (did % 256).cast("string"),
            F.lit("."),
            ((did * 7) % 256).cast("string"),
            F.lit("."),
            ((did * 13) % 256).cast("string"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 13 == 0,
        F.concat(
            F.lit(" call 555-"), F.lpad((did % 10000).cast("string"), 4, "0")
        ),
    ).otherwise(F.lit(""))
    return documents.select(
        "doc_id",
        "source",
        F.concat(F.col("text"), email, ip, phone).alias("text"),
    )


PII_AUGMENT_SQL = """
  SELECT doc_id, source,
         text
         || CASE WHEN doc_id % 7 = 0
              THEN ' contact user' || doc_id || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 11 = 0
              THEN ' host 10.' || (doc_id % 256) || '.'
                   || ((doc_id * 7) % 256) || '.' || ((doc_id * 13) % 256)
              ELSE '' END
         || CASE WHEN doc_id % 13 = 0
              THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END AS text
  FROM documents
"""


def pii_scan(docs: DataFrame) -> DataFrame:
    """(source, n_docs, docs_with_pii, n_emails, n_ips, n_phones,
    pii_rate_e6): per-source PII exposure — the pre-training redaction
    audit.  Counts are exact integers; the rate quantizes last."""
    scanned = docs.select(
        "source",
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL_PAT)).alias("ne"),
        F.regexp_count(F.col("text"), F.lit(PII_IP_PAT)).alias("ni"),
        F.regexp_count(F.col("text"), F.lit(PII_PHONE_PAT)).alias("np"),
    )
    return (
        scanned.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                ((F.col("ne") + F.col("ni") + F.col("np")) > 0).cast("long")
            ).alias("docs_with_pii"),
            F.sum("ne").cast("long").alias("n_emails"),
            F.sum("ni").cast("long").alias("n_ips"),
            F.sum("np").cast("long").alias("n_phones"),
        )
        .select(
            "source",
            "n_docs",
            "docs_with_pii",
            "n_emails",
            "n_ips",
            "n_phones",
            F.floor(
                F.col("docs_with_pii").cast("double")
                / F.col("n_docs")
                * 1e6
                + F.lit(0.5000001)
            )
            .cast("long")
            .alias("pii_rate_e6"),
        )
    )


PII_SCAN_SQL = f"""
WITH aug AS ({PII_AUGMENT_SQL}),
scanned AS (
  SELECT source,
         len(regexp_extract_all(text, '{PII_EMAIL_PAT}')) AS ne,
         len(regexp_extract_all(text, '{PII_IP_PAT}')) AS ni,
         len(regexp_extract_all(text, '{PII_PHONE_PAT}')) AS np
  FROM aug
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN ne + ni + np > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_pii,
       CAST(SUM(ne) AS BIGINT) AS n_emails,
       CAST(SUM(ni) AS BIGINT) AS n_ips,
       CAST(SUM(np) AS BIGINT) AS n_phones,
       CAST(FLOOR(CAST(SUM(CASE WHEN ne + ni + np > 0 THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*) * 1e6 + 0.5000001) AS BIGINT)
         AS pii_rate_e6
FROM scanned GROUP BY source"""


# ---------------------------------------------------------------------------
# Winnowing fingerprints (x109) — Schleimer/Wilkerson/Aiken (SIGMOD'03,
# the MOSS algorithm): hash every token k-gram, slide a window of w
# consecutive k-grams over each doc, and select each window's minimal
# hash (rightmost position on ties).  The selected set is the classic
# position-robust document fingerprint: any shared substring of
# >= w + k - 1 tokens between two docs is GUARANTEED to share at least
# one selected fingerprint, at ~2/(w+1) the density of the full gram
# stream — the index-size/recall trade every plagiarism/near-dup
# fingerprint index at scale is built on (x10 is the whole-doc digest;
# this is its substring-granular sibling).
#
# Scale shape: per-doc windows only (partitionBy doc_id — embarrassing
# parallelism, no cross-doc shuffle); the rightmost-min election is
# MIN over struct(hash, -pos) — an aggregate over a w-row frame, never
# a per-window sort; output density ~2/(w+1) of the gram stream, so
# the fingerprint relation is a small fraction of the token volume.
# Docs with fewer than k + w - 1 tokens have no full window and emit
# nothing (mirrored by the oracle).
# ---------------------------------------------------------------------------

WINNOW_K = 4  # tokens per k-gram
WINNOW_W = 5  # k-grams per winnowing window


def winnow_fingerprints(
    documents: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """(doc_id, pos, fp): the winnowed fingerprint selection — pos is
    the 1-based k-gram position, fp the md5 of the space-joined gram."""
    from pyspark.sql import Window

    toked = documents.select("doc_id", _toks().alias("toks"))
    grams = toked.select(
        "doc_id",
        # n_grams from the array size directly — a second (unbounded)
        # count window would force an extra sort pass per doc
        F.greatest(
            F.size("toks") - (k - 1), F.lit(0)
        ).alias("n_grams"),
        F.posexplode(_gram_windows(F.col("toks"), k)).alias("p0", "gram"),
    ).select(
        "doc_id",
        "n_grams",
        (F.col("p0") + 1).alias("pos"),
        F.md5("gram").alias("h"),
    )
    frame = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    )
    return (
        grams.withColumn(
            "m",
            F.min(
                F.struct(F.col("h"), (-F.col("pos")).alias("np"))
            ).over(frame),
        )
        # only rows that START a full window elect a fingerprint
        .where(F.col("pos") <= F.col("n_grams") - w + 1)
        .select(
            "doc_id",
            (-F.col("m.np")).cast("long").alias("pos"),
            F.col("m.h").alias("fp"),
        )
        .distinct()
    )


def winnow_fingerprints_sql(
    docs_sql: str, k: int = WINNOW_K, w: int = WINNOW_W
) -> str:
    """DuckDB twin: identical gram hashing; the per-window rightmost-min
    election via a bounded self-join + (h ASC, pos DESC) rank."""
    joined = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(
           lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
           t -> t != '') AS t
  FROM ({docs_sql})
),
grams AS (
  SELECT doc_id, g.pos AS pos, g.h AS h FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(t) - {k - 1}),
             i -> {{'pos': i, 'h': md5({joined})}})) AS g
    FROM toks
  )
),
sized AS (
  SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id
),
wins AS (
  SELECT a.doc_id, a.pos AS s, b.pos AS p, b.h
  FROM grams a
  JOIN sized z ON z.doc_id = a.doc_id AND a.pos <= z.n_grams - {w} + 1
  JOIN grams b ON b.doc_id = a.doc_id
              AND b.pos BETWEEN a.pos AND a.pos + {w - 1}
),
sel AS (
  SELECT doc_id, p, h FROM (
    SELECT doc_id, p, h,
           ROW_NUMBER() OVER (
             PARTITION BY doc_id, s ORDER BY h ASC, p DESC) AS rn
    FROM wins
  ) WHERE rn = 1
)
SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS pos, h AS fp FROM sel"""


# ---------------------------------------------------------------------------
# Duplicated-span coverage (x110) — the diagnostic behind exact
# SUBSTRING dedup (Lee et al. 2022, "Deduplicating Training Data Makes
# Language Models Better"): a token n-gram occurring more than once in
# the corpus marks all n of its token positions as duplicated; a doc's
# dup_frac is the fraction of its token positions covered by at least
# one such repeated n-gram.  Docs with high coverage are near-verbatim
# repeats even when no whole-doc or shingle-set method fires.
#
# Scale shape: one gram groupBy (map-side combinable counts; only
# grams with cnt > 1 survive the iceberg cut), one join of the
# surviving grams back onto the gram stream (hash join on the gram
# key; fan-out = occurrence count, linear not quadratic), and a
# per-doc distinct over covered positions whose size is bounded by
# the doc's own token count.  No step holds more than the gram
# relation of one doc in a task.
# ---------------------------------------------------------------------------

DUP_SPAN_N = 5  # tokens per duplicated span


def _dup_span_base(
    docs: DataFrame, n: int
) -> tuple[DataFrame, DataFrame]:
    """Shared x110/x114 core: (toked(doc_id, toks), covered(doc_id,
    cp)) — the iceberg-cut repeated-gram positions.  ONE definition so
    the diagnostic and the removal transform cannot diverge."""
    toked = docs.select("doc_id", _toks().alias("toks"))
    grams = toked.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.size("toks") >= n,
                F.expr(
                    f"transform(sequence(0, size(toks) - {n}), "
                    f"i -> concat_ws(' ', {', '.join(f'toks[i + {j}]' for j in range(n))}))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("p0", "gram"),
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > 1)
        .select("gram")
    )
    covered = (
        grams.join(dup, "gram")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("p0") + 1, F.col("p0") + n)
            ).alias("cp"),
        )
        .distinct()
    )
    return toked, covered


def _dup_span_ctes(docs_sql: str, n: int) -> str:
    """Shared DuckDB CTE block (toked/grams/dup/covered) for the
    x110/x114 twins — covered is the DISTINCT (doc_id, cp) relation."""
    joined = " || ' ' || ".join(f"t[i+{j}]" for j in range(1, n + 1))
    return f"""toked AS (
  SELECT doc_id,
         list_filter(string_split_regex(
           lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
           t -> t != '') AS t
  FROM ({docs_sql})
),
grams AS (
  SELECT doc_id, g.p0 AS p0, g.gram AS gram FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(t) >= {n}
             THEN list_transform(generate_series(0, len(t) - {n}),
                    i -> {{'p0': i, 'gram': {joined}}})
             ELSE [] END) AS g
    FROM toked
  )
),
dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) > 1
),
covered AS (
  SELECT DISTINCT g.doc_id, u.cp
  FROM grams g
  JOIN dup d ON d.gram = g.gram
  CROSS JOIN LATERAL unnest(generate_series(g.p0 + 1, g.p0 + {n})) AS u(cp)
)"""


def dup_span_coverage(docs: DataFrame, n: int = DUP_SPAN_N) -> DataFrame:
    """(doc_id, n_tokens, covered, dup_frac_e6): per-doc fraction of
    token positions covered by a corpus-repeated n-gram."""
    toked, covered_pos = _dup_span_base(docs, n)
    covered = covered_pos.groupBy("doc_id").agg(
        F.count("*").alias("covered")
    )
    return (
        toked.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("covered", F.lit(0)).cast("long").alias("covered"),
            F.when(F.col("n_tokens") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.floor(
                    F.coalesce("covered", F.lit(0)).cast("double")
                    / F.col("n_tokens")
                    * 1e6
                    + F.lit(0.5000001)
                ).cast("long")
            )
            .alias("dup_frac_e6"),
        )
    )


def dup_span_coverage_sql(docs_sql: str, n: int = DUP_SPAN_N) -> str:
    """DuckDB twin of :func:`dup_span_coverage`."""
    return f"""
WITH {_dup_span_ctes(docs_sql, n)},
cov AS (
  SELECT doc_id, COUNT(*) AS covered FROM covered GROUP BY doc_id
)
SELECT k.doc_id, CAST(len(k.t) AS BIGINT) AS n_tokens,
       CAST(COALESCE(c.covered, 0) AS BIGINT) AS covered,
       CASE WHEN len(k.t) = 0 THEN 0
            ELSE CAST(FLOOR(CAST(COALESCE(c.covered, 0) AS DOUBLE)
                            / len(k.t) * 1e6 + 0.5000001) AS BIGINT)
       END AS dup_frac_e6
FROM toked k LEFT JOIN cov c ON c.doc_id = k.doc_id"""


# ---------------------------------------------------------------------------
# Duplicated-span REMOVAL (x114) — the transform behind x110's
# diagnostic (Lee et al. exact substring dedup): drop every token
# position covered by a corpus-repeated n-gram and re-join the
# survivors, emitting the cleaned token stream's fingerprint.  This is
# the step that actually shrinks a training corpus; x110 only measures.
#
# Scale shape: x110's gram iceberg + linear join-back, then ONE
# per-doc sort of the kept (pos, token) pairs — bounded by each doc's
# own token count (sort_array over a collected per-doc array, the
# a2/collect_list discipline; a doc's tokens always fit in a task or
# the corpus couldn't have been read in the first place).
# ---------------------------------------------------------------------------


def dup_span_removal(docs: DataFrame, n: int = DUP_SPAN_N) -> DataFrame:
    """(doc_id, n_tokens, kept_tokens, cleaned_fp): tokens covered by a
    repeated n-gram removed; cleaned_fp = md5 of the space-joined
    survivors ('' stays hashable for fully-duplicated docs).  Shares
    :func:`_dup_span_base` with the x110 diagnostic — the two cannot
    diverge on tokenization, the gram window, or the cnt>1 rule."""
    toked, covered = _dup_span_base(docs, n)
    positions = toked.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.posexplode("toks").alias("p0", "tok"),
    ).select(
        "doc_id", "n_tokens", (F.col("p0") + 1).alias("pos"), "tok"
    )
    kept = positions.join(
        covered,
        (positions.doc_id == covered.doc_id) & (positions.pos == covered.cp),
        "left_anti",
    )
    cleaned = kept.groupBy("doc_id", "n_tokens").agg(
        F.count("*").cast("long").alias("kept_tokens"),
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s.getField("tok"),
                ),
                " ",
            )
        ).alias("cleaned_fp"),
    )
    return (
        toked.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
        .join(cleaned.drop("n_tokens"), "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
            F.coalesce("cleaned_fp", F.md5(F.lit(""))).alias("cleaned_fp"),
        )
    )


def dup_span_removal_sql(docs_sql: str, n: int = DUP_SPAN_N) -> str:
    """DuckDB twin of :func:`dup_span_removal` (shares
    :func:`_dup_span_ctes` with the x110 twin)."""
    return f"""
WITH {_dup_span_ctes(docs_sql, n)},
positions AS (
  SELECT doc_id, len(t) AS n_tokens, u.pos AS pos, t[u.pos] AS tok
  FROM toked
  CROSS JOIN LATERAL unnest(generate_series(1, len(t))) AS u(pos)
),
kept AS (
  SELECT p.doc_id, p.pos, p.tok FROM positions p
  LEFT JOIN covered c ON c.doc_id = p.doc_id AND c.cp = p.pos
  WHERE c.cp IS NULL
),
cleaned AS (
  SELECT doc_id, COUNT(*) AS kept_tokens,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS cleaned_fp
  FROM kept GROUP BY doc_id
)
SELECT k.doc_id, CAST(len(k.t) AS BIGINT) AS n_tokens,
       CAST(COALESCE(c.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       COALESCE(c.cleaned_fp, md5('')) AS cleaned_fp
FROM toked k LEFT JOIN cleaned c ON c.doc_id = k.doc_id"""


# ---------------------------------------------------------------------------
# Duplication spectrum (x121) — the memorization-risk profile behind
# Lee et al.'s analysis tables: for each power-of-two bucket of
# occurrence count, how many distinct n-grams fall in it and how many
# total occurrences they carry.  A fat tail (grams occurring 100s of
# times) predicts verbatim memorization and tells you whether exact
# span dedup (x110/x114) is worth a full pass BEFORE paying for it;
# the spectrum's shape is also the standard before/after evidence
# that a dedup pass worked.
#
# Scale shape: one gram aggregate with map-side combine (the
# overwhelming singleton mass dies in partial aggregation's combiner
# output — same iceberg property as x92), then a <= 64-row bucket
# aggregate.  The bucket is the integer MSB position
# (length(bin(cnt)) - 1 == floor(log2 cnt)) — the w8 discipline: no
# floating log whose ulp at exact powers of two could flip a bucket
# cross-engine.
# ---------------------------------------------------------------------------


def gram_spectrum(docs: DataFrame, n: int = DUP_SPAN_N) -> DataFrame:
    """(log2_bucket, n_grams, n_occurrences): bucket 0 = singleton
    grams, 1 = 2-3x, 2 = 4-7x, ...; occurrence counts include
    within-doc repeats (memorization pressure counts every exposure,
    so the gram stream is NOT per-doc deduped)."""
    toked = docs.select(_toks().alias("toks"))
    grams = toked.select(
        F.explode(_gram_windows(F.col("toks"), n)).alias("gram")
    )
    counts = grams.groupBy("gram").agg(F.count("*").alias("cnt"))
    bucket = (F.length(F.expr("bin(cnt)")) - 1).cast("long")
    return (
        counts.select(bucket.alias("log2_bucket"), "cnt")
        .groupBy("log2_bucket")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("cnt").cast("long").alias("n_occurrences"),
        )
    )


def gram_spectrum_sql(docs_sql: str, n: int = DUP_SPAN_N) -> str:
    """DuckDB twin of :func:`gram_spectrum` (same tokenizer, same
    MSB bucketing via bin-string arithmetic)."""
    joined = " || ' ' || ".join(f"t[i+{j}]" for j in range(1, n + 1))
    return f"""
WITH toked AS (
  SELECT list_filter(string_split_regex(
           lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
           t -> t != '') AS t
  FROM ({docs_sql})
),
grams AS (
  SELECT unnest(CASE WHEN len(t) >= {n}
           THEN list_transform(generate_series(0, len(t) - {n}),
                  i -> {joined})
           ELSE [] END) AS gram
  FROM toked
),
counts AS (SELECT gram, COUNT(*) AS cnt FROM grams GROUP BY gram)
SELECT CAST(length(bin(cnt))
            - length(regexp_extract(bin(cnt), '^0*', 0)) - 1
       AS BIGINT) AS log2_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(cnt) AS BIGINT) AS n_occurrences
FROM counts GROUP BY 1"""


# ---------------------------------------------------------------------------
# EXACT-span contamination screen (x118) — the fixed-length exact
# k-gram variant of x113 (VERDICT r07 #5).  x113 joins WINNOWED
# fingerprints, whose guarantee only covers shared runs of
# >= WINNOW_W + WINNOW_K - 1 tokens (= 8 with the shipped 5/4 config):
# a shared span of 6-7 tokens can be sampled AWAY by the per-window
# min-hash election and silently pass the screen.  This variant hashes
# EVERY k-gram (k = 6, below the winnowing floor) so any shared run of
# >= k tokens fires deterministically — the Lee-et-al "exact span"
# discipline applied to train/eval contamination, at (w+1)/2 ≈ 3× the
# index density of x109's winnowed stream (the density/recall trade
# stated in SIGMOD'03; here recall wins because a leaked eval span is
# exactly the thing you cannot afford to sample away).
#
# Scale shape: one distinct per-doc gram relation (iceberg-prunable),
# one TRAIN-side df aggregate whose cap (df > EXACT_CONTAM_DF_CAP
# training docs) removes boilerplate phrases AND bounds the join
# fan-out per gram key — the x108 hot-key discipline, except dropping
# hot grams is semantically CORRECT here (a phrase in 65+ training
# docs is boilerplate, not leakage evidence).  The gram join is then
# md5-uniform and per-key bounded at any corpus size; never broadcast
# (both sides are corpus-proportional).
# ---------------------------------------------------------------------------

EXACT_CONTAM_K = 6  # tokens per exact gram — below the 8-token winnow floor
EXACT_CONTAM_DF_CAP = 64  # grams in more training docs are boilerplate


def doc_kgrams(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, gram): DISTINCT space-joined token k-grams per doc —
    the exact-span sibling of x109's winnowed stream (same tokenizer,
    same gram join, no sampling)."""
    toked = docs.select("doc_id", _toks().alias("toks"))
    return toked.select(
        "doc_id", F.explode(_gram_windows(F.col("toks"), k)).alias("gram")
    ).distinct()


def exact_contamination(
    docs: DataFrame,
    split_at: int,
    k: int = EXACT_CONTAM_K,
    df_cap: int = EXACT_CONTAM_DF_CAP,
) -> DataFrame:
    """(train_doc, eval_doc, n_shared): pairs sharing >= 1 exact
    k-token span, boilerplate grams (train-df > df_cap) excluded.
    Threshold is 1 because each gram IS a k-token exact match — unlike
    x113's fingerprints there is no sampling noise floor to clear."""
    grams = doc_kgrams(docs, k)
    train = grams.where(F.col("doc_id") < split_at).select(
        F.col("doc_id").alias("train_doc"), "gram"
    )
    ev = grams.where(F.col("doc_id") >= split_at).select(
        F.col("doc_id").alias("eval_doc"), "gram"
    )
    keep = (
        train.groupBy("gram")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= df_cap)
        .select("gram")
    )
    return (
        train.join(keep, "gram")
        .join(ev, "gram")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


def exact_contamination_sql(
    docs_sql: str,
    split_at: int,
    k: int = EXACT_CONTAM_K,
    df_cap: int = EXACT_CONTAM_DF_CAP,
) -> str:
    """DuckDB twin of :func:`exact_contamination`."""
    joined = " || ' ' || ".join(f"t[i+{j}]" for j in range(1, k + 1))
    return f"""
WITH toked AS (
  SELECT doc_id,
         list_filter(string_split_regex(
           lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
           t -> t != '') AS t
  FROM ({docs_sql})
),
grams AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(t) >= {k}
             THEN list_transform(generate_series(0, len(t) - {k}),
                    i -> {joined})
             ELSE [] END) AS gram
    FROM toked
  )
),
train AS (SELECT doc_id AS train_doc, gram FROM grams
          WHERE doc_id < {split_at}),
ev AS (SELECT doc_id AS eval_doc, gram FROM grams
       WHERE doc_id >= {split_at}),
keep AS (SELECT gram FROM train GROUP BY gram
         HAVING COUNT(*) <= {df_cap})
SELECT t.train_doc, e.eval_doc, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM train t
JOIN keep USING (gram)
JOIN ev e USING (gram)
GROUP BY t.train_doc, e.eval_doc"""


# --------------------------------------------------------------------------
# Hashed linear quality classifier (x129/x130): the fastText-style
# quality filter every production pretraining pipeline runs (CCNet,
# LLaMA, GPT-3 data work): hash each token into one of D buckets,
# score a document as the mean learned bucket weight, keep documents
# above a threshold.  The model here is a deterministic stand-in
# (weights derived from the bucket id's md5, so the DuckDB oracle can
# rebuild the identical table), but the PLAN is the production shape:
# the model is a D-row relation BROADCAST to every executor, scoring
# is explode -> broadcast hash join (NO shuffle) -> one doc-keyed
# aggregate with map-side partial sums.  At 100 TB the corpus-side
# cost is one pass + one balanced doc_id shuffle; the model side is a
# fixed 4096-row broadcast regardless of corpus size.  Integer
# milli-weights keep the dot product exact until one final quantized
# division, so both engines agree bit-for-bit.
# --------------------------------------------------------------------------

CLASSIFIER_BUCKETS = 4096
_CLS_HASH_HEX = 10  # 40-bit md5-prefix hashes, same idiom as simhash


def _cls_hash(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, _CLS_HASH_HEX), 16, 10).cast(
        "long"
    )


def _cls_hash_sql(expr: str) -> str:
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substring(md5({expr}), {i + 1}, 1)) - 1)"
        f" * {16 ** (_CLS_HASH_HEX - 1 - i)}"
        for i in range(_CLS_HASH_HEX)
    )
    return f"({digits})"


def classifier_weights(spark, n_buckets: int = CLASSIFIER_BUCKETS) -> DataFrame:
    """(bucket, w): the model relation — integer milli-weights in
    [-1000, 1000], derived from md5('w#' || bucket) so they are
    reproducible in any engine.  A trained model would be loaded from
    a table instead; the shape (D rows, broadcast at score time) is
    identical."""
    b = F.col("id").cast("long")
    return spark.range(n_buckets).select(
        b.alias("bucket"),
        (_cls_hash(F.concat(F.lit("w#"), b.cast("string"))) % 2001 - 1000)
        .cast("long")
        .alias("w"),
    )


def _weights_sql(n_buckets: int = CLASSIFIER_BUCKETS) -> str:
    h = _cls_hash_sql("'w#' || CAST(b AS VARCHAR)")
    return f"""
SELECT b AS bucket, CAST({h} % 2001 - 1000 AS BIGINT) AS w
FROM (SELECT unnest(generate_series(0, {n_buckets - 1})) AS b)"""


def classifier_score(
    documents: DataFrame,
    weights: DataFrame,
    n_buckets: int = CLASSIFIER_BUCKETS,
) -> DataFrame:
    """(doc_id, n_tokens, sum_w, score_e6): per-document linear score
    under the hashed bag-of-words model; score = mean token weight in
    [-1, 1], e6-quantized.  Every doc survives (docs with no tokens
    score 0), so the relation composes with filters downstream.
    With a SPARSE model (e.g. x131's learned weights), tokens hashing
    to absent buckets are ignored: n_tokens counts matched tokens and
    the score is the mean over known features — implicit-zero
    semantics; the x129 registry entry uses the dense 4096-row model
    where every bucket exists.

    Plan: explode -> broadcast join against the D-row model (no
    shuffle on the corpus side) -> groupBy(doc_id) with map-side
    partial sum -> left join back to the doc list.  sum_w stays an
    exact integer; the single double division at the end is the same
    op tree in Spark and DuckDB."""
    toks = documents.select("doc_id", F.explode(_toks()).alias("tok"))
    feats = toks.select(
        "doc_id", (_cls_hash(F.col("tok")) % n_buckets).alias("bucket")
    )
    per = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("w").alias("sum_w"))
    )
    return (
        documents.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("sum_w", F.lit(0)).alias("sum_w"),
            F.when(
                F.coalesce("n_tokens", F.lit(0)) > 0,
                F.floor(
                    F.col("sum_w").cast("double")
                    / (F.col("n_tokens").cast("double") * 1000.0)
                    * 1e6
                    + F.lit(0.5000001)
                ).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("score_e6"),
        )
    )


def classifier_score_sql(
    docs_sql: str = "SELECT * FROM documents",
    n_buckets: int = CLASSIFIER_BUCKETS,
    weights_sql: str | None = None,
) -> str:
    """DuckDB twin of :func:`classifier_score`.  ``weights_sql``
    overrides the fixed md5-derived model relation (default) with any
    (bucket, w) query — the c6 capstone passes the x131-trained model;
    sparse models keep the same implicit-zero semantics as the Spark
    side (the feats⨝wt inner join drops unknown buckets)."""
    return f"""
WITH docs AS ({docs_sql}),
toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(
           lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
           t -> t != '')) AS tok
  FROM docs
),
wt AS ({weights_sql if weights_sql is not None else _weights_sql(n_buckets)}),
feats AS (SELECT doc_id, {_cls_hash_sql("tok")} % {n_buckets} AS bucket
          FROM toks),
per AS (
  SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(w) AS BIGINT) AS sum_w
  FROM feats JOIN wt USING (bucket)
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(n_tokens, 0) AS n_tokens,
       COALESCE(sum_w, 0) AS sum_w,
       CASE WHEN COALESCE(n_tokens, 0) > 0
            THEN CAST(FLOOR(CAST(sum_w AS DOUBLE)
                            / (CAST(n_tokens AS DOUBLE) * 1000.0)
                            * 1e6 + 0.5000001) AS BIGINT)
            ELSE 0 END AS score_e6
FROM (SELECT doc_id FROM docs) d
LEFT JOIN per USING (doc_id)"""


def classifier_calibration(
    documents: DataFrame,
    weights: DataFrame,
    threshold_e6: int = 0,
    n_buckets: int = CLASSIFIER_BUCKETS,
) -> DataFrame:
    """(source, n_docs, mean_score_e6, min_score_e6, max_score_e6,
    n_keep, keep_frac_e6): what a classifier threshold would DO to the
    corpus, per source — the pre-flight you run before committing a
    filter pass at 100 TB (a threshold that keeps 90% of one source
    and 4% of another is a data-mix decision, not a default).

    One x129 scoring pass, one source-keyed aggregate over exact
    integers (sum/count, never engine-AVG, so partial-aggregation
    order cannot perturb the mean)."""
    scores = classifier_score(documents, weights, n_buckets)
    j = documents.select("doc_id", "source").join(scores, "doc_id")
    agg = j.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("score_e6").alias("sum_score"),
        F.min("score_e6").alias("min_score_e6"),
        F.max("score_e6").alias("max_score_e6"),
        F.sum(
            F.when(F.col("score_e6") >= threshold_e6, 1).otherwise(0)
        ).alias("n_keep"),
    )
    return agg.select(
        "source",
        "n_docs",
        F.floor(
            F.col("sum_score").cast("double") / F.col("n_docs").cast("double")
            + F.lit(0.5000001)
        )
        .cast("long")
        .alias("mean_score_e6"),
        "min_score_e6",
        "max_score_e6",
        "n_keep",
        F.floor(
            F.col("n_keep").cast("double") / F.col("n_docs").cast("double")
            * 1e6
            + F.lit(0.5000001)
        )
        .cast("long")
        .alias("keep_frac_e6"),
    )


def classifier_calibration_sql(
    docs_sql: str = "SELECT * FROM documents",
    threshold_e6: int = 0,
    n_buckets: int = CLASSIFIER_BUCKETS,
) -> str:
    """DuckDB twin of :func:`classifier_calibration`."""
    return f"""
WITH scored AS ({classifier_score_sql(docs_sql, n_buckets)}),
j AS (
  SELECT d.source, s.score_e6
  FROM ({docs_sql}) d JOIN scored s USING (doc_id)
),
agg AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(score_e6) AS BIGINT) AS sum_score,
         MIN(score_e6) AS min_score_e6,
         MAX(score_e6) AS max_score_e6,
         CAST(SUM(CASE WHEN score_e6 >= {threshold_e6} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_keep
  FROM j GROUP BY source
)
SELECT source, n_docs,
       CAST(FLOOR(CAST(sum_score AS DOUBLE) / CAST(n_docs AS DOUBLE)
                  + 0.5000001) AS BIGINT) AS mean_score_e6,
       min_score_e6, max_score_e6, n_keep,
       CAST(FLOOR(CAST(n_keep AS DOUBLE) / CAST(n_docs AS DOUBLE) * 1e6
                  + 0.5000001) AS BIGINT) AS keep_frac_e6
FROM agg"""


# --------------------------------------------------------------------------
# Distributed perceptron training (x131): the TRAIN side of the x129
# classifier — distill an expensive quality signal (here the x8
# heuristic composite; in production an LLM judge or human labels)
# into the cheap hashed linear model that x129 can then score at any
# corpus size.  Batch margin-0 perceptron over binary hashed-bucket
# presence features: every update is INTEGER arithmetic (y ∈ {+1,-1},
# x_b ∈ {0,1}, w ← w + Σ_errors y·x), so T rounds replay EXACTLY in
# SQL — no learning-rate floats, no sigmoid, no cross-engine ulp risk.
# Scale shape (the x51-BPE driver-loop discipline): the corpus is
# featurized ONCE (persisted doc→bucket presence relation); each round
# is one broadcast join of the ≤D-row weight relation + one doc-keyed
# margin aggregate + one bucket-keyed gradient aggregate (≤D rows
# out); only the ≤D-row gradient crosses the driver per round (the S5
# scalar channel, generalized).  At 100 TB: featurize = one scan, each
# round touches the persisted feature relation only.
# --------------------------------------------------------------------------

PERCEPTRON_ROUNDS = 3
PERCEPTRON_LABEL_CUTOFF_E6 = 355000  # ~median x8 quality on testdata


def perceptron_train(
    documents: DataFrame,
    n_buckets: int = CLASSIFIER_BUCKETS,
    rounds: int = PERCEPTRON_ROUNDS,
    cutoff_e6: int = PERCEPTRON_LABEL_CUTOFF_E6,
    labels: DataFrame | None = None,
) -> DataFrame:
    """(bucket, w): nonzero integer weights after `rounds` batch
    perceptron rounds.  Labels default to the distillation target
    y = +1 iff x8 quality_e6 >= cutoff_e6; pass `labels` (doc_id, y
    in {+1,-1}) to train on real supervision.  Round 1 from w = 0 is
    the degenerate all-errors round (margin 0 counts as an error —
    the classic convention), so w after round 1 is the class-signed
    bucket document-frequency; later rounds correct only misclassified
    docs.  ``rounds`` must be >= 1: the SQL twin's round-1 CTE is
    unconditional (the recurrence unrolls from w1), so rounds=0 would
    silently diverge between the engines (ADVICE r10) — both sides
    reject it instead."""
    if rounds < 1:
        raise ValueError("perceptron_train requires rounds >= 1")
    spark = documents.sparkSession
    toks = documents.select("doc_id", F.explode(_toks()).alias("tok"))
    feats = (
        toks.select(
            "doc_id", (_cls_hash(F.col("tok")) % n_buckets).alias("bucket")
        )
        .distinct()
        .persist()
    )
    if labels is None:
        labels = quality_score(documents).select(
            "doc_id",
            F.when(F.col("quality_e6") >= cutoff_e6, F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("y"),
        )
    labels = labels.persist()
    w: dict[int, int] = {}
    try:
        for _ in range(rounds):
            if w:
                wdf = spark.createDataFrame(
                    list(w.items()), "bucket long, w long"
                )
                doc_margin = (
                    feats.join(F.broadcast(wdf), "bucket")
                    .groupBy("doc_id")
                    .agg(F.sum("w").alias("margin"))
                )
                margins = labels.join(doc_margin, "doc_id", "left").select(
                    "doc_id",
                    "y",
                    F.coalesce("margin", F.lit(0)).alias("margin"),
                )
            else:  # w = 0 -> every margin is 0
                margins = labels.select(
                    "doc_id", "y", F.lit(0).cast("long").alias("margin")
                )
            errs = margins.where(F.col("y") * F.col("margin") <= 0).select(
                "doc_id", "y"
            )
            grad = (
                feats.join(errs, "doc_id")
                .groupBy("bucket")
                .agg(F.sum("y").alias("g"))
                .collect()  # <= n_buckets rows: the per-round driver
                # channel, same budget class as a BPE merge head
            )
            if not grad:
                break
            for r in grad:
                w[r.bucket] = w.get(r.bucket, 0) + r.g
    finally:
        feats.unpersist()
        labels.unpersist()
    final = [(b, v) for b, v in w.items() if v != 0]
    return spark.createDataFrame(final or [], "bucket long, w long")


def perceptron_train_sql(
    docs_sql: str = "SELECT * FROM documents",
    n_buckets: int = CLASSIFIER_BUCKETS,
    rounds: int = PERCEPTRON_ROUNDS,
    cutoff_e6: int = PERCEPTRON_LABEL_CUTOFF_E6,
) -> str:
    """DuckDB twin of :func:`perceptron_train` (default labels): the
    recurrence unrolled into MATERIALIZED CTEs — exact integer replay
    of every round.  Same ``rounds >= 1`` contract as the Spark side
    (the w1 CTE is unconditional)."""
    if rounds < 1:
        raise ValueError("perceptron_train_sql requires rounds >= 1")
    ctes = [
        f"""docs AS MATERIALIZED ({docs_sql}),
feats AS MATERIALIZED (
  SELECT DISTINCT doc_id, {_cls_hash_sql("tok")} % {n_buckets} AS bucket
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(
             lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
             t -> t != '')) AS tok
    FROM docs)
),
labels AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN quality_e6 >= {cutoff_e6} THEN 1 ELSE -1 END AS y
  FROM ({quality_sql("SELECT * FROM docs")})
),
w1 AS MATERIALIZED (
  SELECT bucket, CAST(SUM(y) AS BIGINT) AS w
  FROM feats JOIN labels USING (doc_id)
  GROUP BY bucket
)"""
    ]
    prev = "w1"
    for t in range(2, rounds + 1):
        ctes.append(
            f"""m{t} AS MATERIALIZED (
  SELECT l.doc_id, l.y, COALESCE(s.margin, 0) AS margin
  FROM labels l LEFT JOIN (
    SELECT f.doc_id, CAST(SUM(w.w) AS BIGINT) AS margin
    FROM feats f JOIN {prev} w USING (bucket)
    GROUP BY f.doc_id
  ) s USING (doc_id)
),
g{t} AS MATERIALIZED (
  SELECT f.bucket, CAST(SUM(e.y) AS BIGINT) AS g
  FROM feats f JOIN (
    SELECT doc_id, y FROM m{t} WHERE y * margin <= 0
  ) e USING (doc_id)
  GROUP BY f.bucket
),
w{t} AS MATERIALIZED (
  SELECT COALESCE(a.bucket, b.bucket) AS bucket,
         COALESCE(a.w, 0) + COALESCE(b.g, 0) AS w
  FROM {prev} a FULL JOIN g{t} b ON a.bucket = b.bucket
)"""
        )
        prev = f"w{t}"
    body = ",\n".join(ctes)
    return f"WITH {body}\nSELECT bucket, w FROM {prev} WHERE w != 0"
