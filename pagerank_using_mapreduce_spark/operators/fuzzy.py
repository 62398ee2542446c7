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

from pyspark.sql import DataFrame, Window
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
    documents: DataFrame,
    max_dist: int = FUZZY_MAX_DIST,
    max_bucket: int | None = None,
    wf: DataFrame | None = None,
    pair_shards: int | None = None,
) -> DataFrame:
    """(word_a, word_b, dist): distinct corpus-vocabulary word pairs
    within Levenshtein distance ``max_dist`` (<= 2 — the blocking
    depth is fixed at 2 delete levels).

    Plan shape (the r10 vocab-growth decade exposed both):

    - The keys relation is explicitly ``repartition(P, "k")``-ed before
      the self-join.  Without it, AQE coalesces the post-distinct keys
      exchange by its INPUT size (~180 MB at sf1_vg -> a handful of
      partitions) and the join stage — whose OUTPUT is the candidate
      fan-out, ~35x its input rows on a vocab-growth corpus — inherits
      that task count: 253 s at ~5 busy cores vs ~80 s at 32.  An
      explicit numPartitions is user-specified, so AQE leaves it alone;
      both self-join sides reuse the one exchange.
    - ``levenshtein`` runs BEFORE the pair ``distinct``, so the wide
      dedup exchange carries only verified pairs (the candidate
      superset is pairs within delete-distance <= 2·depth, i.e. up to
      lev 4 — the false 2/3 never shuffles).
    - The verified-pair stream is explicitly ``repartition(pair_shards,
      word_a, word_b)``-ed BEFORE the ``distinct`` (r11; VERDICT r10
      #1).  Without it the dedup's map-side partial HashAggregate runs
      INSIDE the candidate fan-out stage, so each join task's hash
      state scales with the distinct pairs its variant-key partition
      fans out to — task memory proportional to OUTPUT volume (~840M
      pairs at sf10_vg needed a 24g heap; at 100x that is an OOM, not
      a knob).  With the explicit pair-keyed exchange, the fan-out
      stage streams straight into shuffle writes (no agg state), the
      aggregate's required distribution is already satisfied (pair
      keys are a subset of the grouping keys), so BOTH halves of the
      dedup run post-exchange with state bounded by pairs/shard.
      ``pair_shards`` defaults to 8x shuffle.partitions: reduce tasks
      are cheap, and 8x keeps per-task state ~an order below the
      per-core heap share at the decade scale while AQE (user-
      specified exchange) never undoes it.  Measured (BENCH_LOCAL_r11):
      sf10_vg green in a 12g heap, half the 24g the r10 shape needed.

    ``max_bucket`` (default None = exact) is the skew fuse, same
    discipline as ``lsh_candidates``: variant keys shared by more than
    ``max_bucket`` words are excluded from candidate generation — each
    such key contributes C(size, 2) join rows, and degenerate keys
    (the empty string collects every word of length <= depth) grow
    with the vocabulary.  Arming it drops any true pair whose ONLY
    shared variants are oversized keys; run :func:`variant_bucket_stats`
    first to see whether/where it would bite.  When armed, the keys
    relation is localCheckpoint-ed: the fuse's size-count pass and the
    join would otherwise evaluate the lambda-bearing variant explode
    twice (stage reuse never fires across lambda subtrees).

    ``wf`` optionally supplies a precomputed :func:`word_freqs`
    relation (callers like :func:`vocab_normalize` that also need the
    frequencies materialize it ONCE instead of re-tokenizing the
    corpus per reference)."""
    if not 1 <= max_dist <= 2:
        raise ValueError("blocking depth supports max_dist in {1, 2}")
    keys = (
        (wf if wf is not None else word_freqs(documents))
        .select("word", F.explode(_variant_keys()).alias("k"))
        .distinct()
    )
    if max_bucket is not None:
        keys = keys.localCheckpoint(eager=True)
        oversized = (
            keys.groupBy("k")
            .agg(F.count("*").alias("_sz"))
            .where(F.col("_sz") > max_bucket)
            .select("k")
        )
        keys = keys.join(F.broadcast(oversized), "k", "left_anti")
    n_part = int(
        documents.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    keys = keys.repartition(n_part, "k")
    a, b = keys.alias("a"), keys.alias("b")
    cand = a.join(
        b,
        (F.col("a.k") == F.col("b.k")) & (F.col("a.word") < F.col("b.word")),
    ).select(F.col("a.word").alias("word_a"), F.col("b.word").alias("word_b"))
    dist = F.levenshtein("word_a", "word_b")
    if pair_shards is None:
        pair_shards = 8 * n_part
    return (
        cand.select("word_a", "word_b", dist.cast("long").alias("dist"))
        .where(F.col("dist") <= max_dist)
        .repartition(pair_shards, "word_a", "word_b")
        .distinct()
    )


# deterministic WORD-sample rule for the sampled pre-flight, the
# frontier_sample discipline (dedup.py) applied to the vocabulary:
# keep a word iff the zero-padded first-4-hex prefix of
# md5(seed|word) falls below round(65536/sample_den).  Pure md5 —
# both engines and every retry draw the identical sample.
VOCAB_SAMPLE_SEED = "variant-stats"


def variant_bucket_stats(
    documents: DataFrame,
    sample_den: int | None = None,
    sample_seed: str = VOCAB_SAMPLE_SEED,
) -> DataFrame:
    """One-row delete-variant-index occupancy audit: (n_entries, n_keys,
    max_bucket, n_multi, sum_pairs) — the pre-flight check for
    :func:`fuzzy_word_pairs`, mirroring :func:`..dedup.lsh_bucket_stats`
    for the LSH family.  ``sum_pairs`` = Σ C(size, 2) over variant keys
    is the exact candidate-join row count the blocking will produce;
    ``max_bucket`` in the tens-of-thousands means a degenerate key (mass
    short words, a pathological spelling cluster) that the ``max_bucket``
    fuse should exclude.  Pure two-level aggregate — no join, no pair
    enumeration, safe at any skew.

    ``sample_den`` (r11; VERDICT r10 #4) switches to the SAMPLED
    estimate — the x125 frontier-sample pattern applied to the variant
    index, so the pre-flight itself stays 100x-runnable: the exact
    audit enumerates the FULL variant index (O(vocab · len²) explode
    rows — 64 s at sf10_vg), which at a 100-TB vocabulary is a real
    job of its own.  The sampled form keeps a deterministic
    1/sample_den md5 word sample, builds the variant index of the
    SAMPLE only, and scales: a key of true size s retains
    Binomial(s, 1/den) sampled words, so E[Σ C(kept, 2)] =
    Σ C(s, 2)/den² — ``est_sum_pairs = sum_pairs_sample · den²`` is an
    unbiased estimate of the exact candidate bill, and
    ``est_entries = n_entries_sample · den`` of the index size.
    ``est_max_bucket`` (sampled max · den) is an indicator, not
    unbiased: small true buckets vanish from the sample, so it reads
    on the degenerate-key REGIME (the only decision it feeds — whether
    to arm the ``max_bucket`` fuse), not an exact maximum.  Output row:
    (sample_den, n_words, n_entries_sample, sum_pairs_sample,
    est_entries, est_max_bucket, est_sum_pairs)."""
    wf = word_freqs(documents).select("word")
    if sample_den is not None:
        from .dedup import _FRONTIER_HEX, _frontier_sample_hex

        wf = wf.where(
            F.concat(
                F.lit("0"),
                F.substring(
                    F.md5(F.concat_ws("|", F.lit(sample_seed), F.col("word"))),
                    1,
                    _FRONTIER_HEX,
                ),
            )
            < F.lit(_frontier_sample_hex(sample_den))
        )
    per = (
        wf.select("word", F.explode(_variant_keys()).alias("k"))
        .distinct()
        .groupBy("k")
        .agg(F.count("*").alias("sz"))
    )
    if sample_den is None:
        return per.agg(
            F.sum("sz").cast("long").alias("n_entries"),
            F.count("*").cast("long").alias("n_keys"),
            F.max("sz").cast("long").alias("max_bucket"),
            F.sum(F.when(F.col("sz") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_multi"),
            F.sum(F.expr("sz * (sz - 1) div 2"))
            .cast("long")
            .alias("sum_pairs"),
        ).select("n_entries", "n_keys", "max_bucket", "n_multi", "sum_pairs")
    den = int(sample_den)
    agg = per.agg(
        F.coalesce(F.sum("sz"), F.lit(0)).cast("long").alias("_entries"),
        F.coalesce(F.max("sz"), F.lit(0)).cast("long").alias("_max"),
        F.coalesce(F.sum(F.expr("sz * (sz - 1) div 2")), F.lit(0))
        .cast("long")
        .alias("_pairs"),
    )
    n_words = wf.agg(F.count("*").cast("long").alias("n_words"))
    # both sides are one-row scalars — the broadcast crossJoin spine
    return agg.crossJoin(F.broadcast(n_words)).select(
        F.lit(den).cast("long").alias("sample_den"),
        F.col("n_words"),
        F.col("_entries").alias("n_entries_sample"),
        F.col("_pairs").alias("sum_pairs_sample"),
        (F.col("_entries") * den).alias("est_entries"),
        (F.col("_max") * den).alias("est_max_bucket"),
        (F.col("_pairs") * den * den).alias("est_sum_pairs"),
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


def vocab_normalize(
    documents: DataFrame, max_dist: int = FUZZY_MAX_DIST
) -> DataFrame:
    """(word, canonical, canonical_freq): map every corpus word to the
    HIGHEST-FREQUENCY word within Levenshtein distance ``max_dist`` of
    it (itself included; frequency tie → lexicographically smallest) —
    the end use the SymSpell blocking exists for: a typo-normalization
    table that collapses spelling noise onto the dominant form before
    token counting, dedup shingling, or vocabulary budgeting.

    One-hop semantics, deliberately: the canonical is chosen among the
    word's DIRECT edit-neighborhood, not a transitive closure (chains
    a→b→c with dist(a,c) > max_dist stay separate — collapsing them
    would merge unrelated words through a bridge typo).

    Scale shape: the pair relation comes from :func:`fuzzy_word_pairs`
    (blocked, skew-fusable); candidates per word are bounded by its
    edit-neighborhood degree, so the argmax window partitions on
    uniform word keys — never a global sort; the freq join is
    vocab-keyed, map-side combinable upstream.  Output is exactly
    vocab-sized.

    The vocab relation is eagerly localCheckpoint-ed and shared by all
    four of its references (blocking keys, both self-union arms, the
    freq join) — without that, each reference re-tokenizes and
    re-aggregates the corpus (stage reuse never fires across the
    tokenize lambda subtrees; the same armor as fuzzy_word_pairs'
    fuse path)."""
    wf = word_freqs(documents).localCheckpoint(eager=True)
    pairs = fuzzy_word_pairs(documents, max_dist=max_dist, wf=wf)
    # both directions + self so every word has at least one candidate
    neigh = (
        pairs.select(F.col("word_a").alias("word"), F.col("word_b").alias("cand"))
        .unionAll(
            pairs.select(
                F.col("word_b").alias("word"), F.col("word_a").alias("cand")
            )
        )
        .unionAll(wf.select("word", F.col("word").alias("cand")))
    )
    cand = neigh.join(
        wf.select(F.col("word").alias("cand"), F.col("freq").alias("cand_freq")),
        "cand",
    )
    w = Window.partitionBy("word").orderBy(
        F.desc("cand_freq"), F.asc("cand")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "word",
            F.col("cand").alias("canonical"),
            F.col("cand_freq").alias("canonical_freq"),
        )
    )


def vocab_normalize_sql(max_dist: int = FUZZY_MAX_DIST) -> str:
    return f"""
WITH pairs AS ({fuzzy_word_pairs_sql(max_dist)}),
wf AS (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT unnest(list_filter(
             string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
             t -> t != '')) AS word
    FROM documents) GROUP BY word
),
neigh AS (
  SELECT word_a AS word, word_b AS cand FROM pairs
  UNION ALL SELECT word_b AS word, word_a AS cand FROM pairs
  UNION ALL SELECT word AS word, word AS cand FROM wf
),
cand AS (
  SELECT n.word, n.cand, wf.freq AS cand_freq
  FROM neigh n JOIN wf ON n.cand = wf.word
),
ranked AS (
  SELECT word, cand, cand_freq,
         ROW_NUMBER() OVER (PARTITION BY word
                            ORDER BY cand_freq DESC, cand ASC) AS rn
  FROM cand
)
SELECT word, cand AS canonical, CAST(cand_freq AS BIGINT) AS canonical_freq
FROM ranked WHERE rn = 1"""


def variant_bucket_stats_sql(
    sample_den: int | None = None, sample_seed: str = VOCAB_SAMPLE_SEED
) -> str:
    del1 = (
        "list_transform(range(1, length({w}) + 1), i -> "
        "substr({w}, 1, CAST(i - 1 AS INT)) || substr({w}, CAST(i + 1 AS INT), length({w})))"
    )
    d1 = del1.format(w="word")
    d2 = f"flatten(list_transform({d1}, v -> {del1.format(w='v')}))"
    samp = ""
    if sample_den is not None:
        from .dedup import _FRONTIER_HEX, _frontier_sample_hex

        samp = (
            f"  WHERE '0' || substr(md5('{sample_seed}|' || word), 1, "
            f"{_FRONTIER_HEX}) < '{_frontier_sample_hex(sample_den)}'\n"
        )
    head = f"""
WITH wf AS (
  SELECT word FROM (
    SELECT DISTINCT unnest(list_filter(
             string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
             t -> t != '')) AS word
    FROM documents)
{samp}),
keys AS (
  SELECT DISTINCT word, unnest(list_distinct(
           list_concat(list_concat([word], {d1}), {d2}))) AS k
  FROM wf
),
per AS (
  SELECT k, COUNT(*) AS sz FROM keys GROUP BY k
)"""
    if sample_den is None:
        return (
            head
            + """
SELECT CAST(SUM(sz) AS BIGINT) AS n_entries,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(MAX(sz) AS BIGINT) AS max_bucket,
       CAST(SUM(CASE WHEN sz >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi,
       CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS sum_pairs
FROM per"""
        )
    den = int(sample_den)
    return (
        head
        + f""",
agg AS (
  SELECT COALESCE(CAST(SUM(sz) AS BIGINT), 0) AS _entries,
         COALESCE(CAST(MAX(sz) AS BIGINT), 0) AS _max,
         COALESCE(CAST(SUM(sz * (sz - 1) // 2) AS BIGINT), 0) AS _pairs
  FROM per
),
nw AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_words FROM wf)
SELECT CAST({den} AS BIGINT) AS sample_den,
       n_words,
       _entries AS n_entries_sample,
       _pairs AS sum_pairs_sample,
       _entries * {den} AS est_entries,
       _max * {den} AS est_max_bucket,
       _pairs * {den} * {den} AS est_sum_pairs
FROM agg CROSS JOIN nw"""
    )


def normalized_fingerprint_dedup(
    documents: DataFrame, max_dist: int = FUZZY_MAX_DIST
) -> DataFrame:
    """(doc_id, norm_fp, is_kept): exact-duplicate election over the
    TYPO-NORMALIZED token stream — the end-to-end use of the whole
    fuzzy family (r11): every token is first mapped to its
    :func:`vocab_normalize` canonical (highest-frequency lev-2
    neighbor), so documents that differ only by spelling noise
    fingerprint IDENTICALLY and dedup together, where raw
    fingerprinting (x10/x1) sees distinct hashes.  Min-doc_id election
    per fingerprint, every doc emitted with its verdict.

    The fingerprint is a POSITION-KEYED additive hash: norm_fp =
    Σ_pos h40(pos || '|' || canonical) over the doc's tokens (h40 =
    the 40-bit md5-prefix idiom of simhash/x129).  Order-sensitive
    (pos is inside the hash) yet a plain SUM — so the per-doc
    reduction is a map-side-combinable aggregate, never a
    collect_list + array reassembly; at 100 TB the doc-keyed shuffle
    moves one long per token, and no executor ever materializes a
    document's token array.  Tokenless docs fingerprint 0.

    Scale shape: vocab_normalize is vocab-sized (its own blocked
    SymSpell join); the token→canonical join is word-keyed like the
    x103 model join — uniform keys, map-side combine downstream."""
    from ..functions.textops import strip_non_alpha, tokens

    norm = vocab_normalize(documents, max_dist=max_dist)
    toks = documents.select(
        "doc_id",
        F.posexplode(tokens(strip_non_alpha(F.col("text")))).alias(
            "pos", "word"
        ),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.col("pos").cast("string"), F.col("canonical")
                )
            ),
            1,
            10,
        ),
        16,
        10,
    ).cast("long")
    per = (
        toks.join(norm.select("word", "canonical"), "word")
        .groupBy("doc_id")
        .agg(F.sum(h).alias("norm_fp"))
    )
    fps = (
        documents.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("norm_fp", F.lit(0)).cast("long").alias("norm_fp"),
        )
    )
    keep = fps.groupBy("norm_fp").agg(F.min("doc_id").alias("__nfd_keep"))
    return fps.join(keep, "norm_fp").select(
        "doc_id",
        "norm_fp",
        (F.col("doc_id") == F.col("__nfd_keep")).alias("is_kept"),
    )


def normalized_fingerprint_dedup_sql(max_dist: int = FUZZY_MAX_DIST) -> str:
    from .text_analysis import _cls_hash_sql

    h = _cls_hash_sql("CAST(t.pos AS VARCHAR) || '|' || vn.canonical")
    return f"""
WITH vn AS MATERIALIZED ({vocab_normalize_sql(max_dist)}),
toks AS (
  SELECT doc_id, u.p AS pos, u.t AS word FROM (
    SELECT doc_id, unnest(list_transform(
      list_filter(string_split_regex(
        lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
        x -> x != ''),
      (x, i) -> {{'p': i - 1, 't': x}})) AS u
    FROM documents)
),
per AS (
  SELECT t.doc_id, CAST(SUM({h}) AS BIGINT) AS norm_fp
  FROM toks t JOIN vn ON t.word = vn.word
  GROUP BY t.doc_id
),
fps AS (
  SELECT d.doc_id, COALESCE(per.norm_fp, 0) AS norm_fp
  FROM (SELECT doc_id FROM documents) d LEFT JOIN per USING (doc_id)
),
keep AS (SELECT norm_fp, MIN(doc_id) AS keep_id FROM fps GROUP BY norm_fp)
SELECT f.doc_id, f.norm_fp, f.doc_id = k.keep_id AS is_kept
FROM fps f JOIN keep k USING (norm_fp)"""
