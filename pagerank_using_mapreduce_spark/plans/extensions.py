"""Registry wiring for the LLM-data-pipeline extension operators:
dedup, similarity search, text analysis, multimodal plumbing, as-of
join.  Each Spark query has a DuckDB oracle that re-derives the result
independently (SURVEY.md §2.9)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators.asof import asof_join
from ..operators.multimodal import (
    DECODE_META_SQL,
    FEATURES_SQL,
    RESIZE_META_SQL,
    binarize_docs,
    decode_images,
    extract_features,
    frame_sample,
    resize_meta,
)
from ..operators.similarity import (
    COSINE_TOPK_SQL,
    EMBEDDING_CONTAMINATION_SQL,
    EMBEDDING_NEAR_DUP_SQL,
    IVF_KMEANS_SQL,
    IVF_TOPK_SQL,
    SRP_LSH_SQL,
    SRP_MULTIPROBE_SQL,
    cosine_topk,
    embedding_near_dups,
    ivf_kmeans_topk,
    ivf_topk,
    srp_lsh_near_dups,
    srp_lsh_near_dups_multiprobe,
)
from ..operators.text_analysis import (
    FINGERPRINT_SQL,
    LANG_ID_SQL,
    QUALITY_SQL,
    REDACT_SQL,
    REPETITION_SQL,
    TOKEN_COUNT_SQL,
    fingerprint,
    lang_id,
    ngram_counts,
    ngram_counts_sql,
    quality_score,
    redact_numbers,
    repetition_stats,
    token_count,
)
from ..operators.inverted_index import phrase_search_sql
from ..operators.packing import (
    chunk_windows,
    chunk_windows_sql,
    pack_sequences,
    pack_sequences_sql,
)
from ..operators.pca import pc_projection_sql, top_pc_sql
from ..operators.sketches import (
    bloom_join_audit_sql,
    cms_counts_sql,
    cms_heavy_hitters_sql,
    cms_join_size_estimate_sql,
    hll_registers_sql,
)
from ..operators.sampling import (
    bottom_k_per_group,
    bottom_k_per_group_sql,
    bottom_k_sample,
    bottom_k_sample_sql,
    curriculum_order,
    curriculum_order_sql,
    hash_split,
    hash_split_sql,
    quantile_bins,
    stratified_sample,
    stratified_sample_sql,
    weighted_mix,
    weighted_mix_sql,
)
from ..sources.tables import load_table
from .relational import E1_SQL as _E1_BATCH_SQL
from .relational import E9_SQL as _E9_BATCH_SQL
from .relational import E4_SQL as _E4_BATCH_SQL
from .relational import E2_SQL as _E2_BATCH_SQL
from .relational import W6_SQL as _W6_BATCH_SQL


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _roundtrip_dir(tag: str) -> str:
    """Per-process scratch dir for the write/read-back roundtrip
    queries.  The returned DataFrame is LAZY — the read happens when
    the caller executes it — so the dir cannot be rmtree'd before
    returning; a fresh mkdtemp per call therefore leaked one table
    copy per sweep/bench rep.  Instead: one deterministic dir per
    (pid, tag), wiped on first acquisition in this process (so reps
    overwrite, not accumulate) and registered for atexit removal."""
    import atexit
    import os
    import shutil
    import tempfile

    d = os.path.join(tempfile.gettempdir(), f"spark_roundtrip_{os.getpid()}_{tag}")
    if tag not in _roundtrip_dir._claimed:  # type: ignore[attr-defined]
        shutil.rmtree(d, ignore_errors=True)
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        _roundtrip_dir._claimed.add(tag)  # type: ignore[attr-defined]
    os.makedirs(d, exist_ok=True)
    return d


_roundtrip_dir._claimed = set()  # type: ignore[attr-defined]


def _sha_base(docs: DataFrame) -> DataFrame:
    """Materialized shingle base shared by every near-dup consumer
    inside ONE query (VERDICT r08 #2): stage reuse never fires across
    the lambda-bearing tokenize subtrees, so without this each plan
    subtree (signatures, both verify sides, the AllPairs truth side)
    re-tokenizes the corpus.  The CALLER (this registry layer) owns
    the lifetime: eager localCheckpoint per query invocation — honest
    under bench repetitions (every rep re-pays the one tokenize pass),
    released with the query's lineage.  DISK_ONLY storage is
    load-bearing: checkpoint blocks cannot be dropped (lineage is
    truncated, so they are not recomputable) and are only freed when
    the referencing plan is GC'd — on the default MEMORY_AND_DISK
    level a bench/sweep session accumulating one base per query rep
    pinned the whole driver heap ahead of GC (measured: 8g heap OOM
    ~25 min into the r09 bench).  On disk the blocks cost zero heap,
    reads ride the OS page cache, and the same setting is what a
    100 TB caller would use."""
    from pyspark import StorageLevel

    return dd.shingle_arrays(docs).localCheckpoint(
        eager=True, storageLevel=StorageLevel.DISK_ONLY
    )


def q_x1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.exact_dedup(dd.augment_docs(_docs(spark, sf_dir)))


def q_x2_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.minhash_signatures(dd.shingles(dd.augment_docs(_docs(spark, sf_dir))))


def q_x3_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.lsh_candidates(
        dd.minhash_signatures(dd.shingles(dd.augment_docs(_docs(spark, sf_dir))))
    )


def q_x4_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = dd.augment_docs(_docs(spark, sf_dir))
    return dd.near_dup_pipeline(docs, sha=_sha_base(docs))


def q_x33_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → transitive closure → canonical doc per cluster
    (operators/dedup.py:dedup_clusters)."""
    docs = dd.augment_docs(_docs(spark, sf_dir))
    return dd.dedup_clusters(docs, sha=_sha_base(docs))


def q_x35_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-md5 HyperLogLog register table over
    lineitem.l_orderkey (operators/sketches.py) — the sketch content
    itself is integer-exact and hash-checked; the float estimate is
    bounded in tests/test_sketches.py."""
    from ..operators.sketches import hll_registers

    return hll_registers(load_table(spark, sf_dir, "lineitem"), "l_orderkey")


def q_x36_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-md5 count-min frequency table over
    lineitem.l_suppkey — fixed depth x width cells, integer-exact and
    hash-checked; the min-over-rows estimator is bounded in
    tests/test_sketches.py."""
    from ..operators.sketches import cms_counts

    return cms_counts(load_table(spark, sf_dir, "lineitem"), "l_suppkey")


def q_x37_bloom_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom pre-join pruning audit: filter built from URGENT orders'
    keys, probed by distinct lineitem orderkeys; counts pass/true/
    false-positive exactly (operators/sketches.py — md5 positions, so
    the per-key decision is bit-identical cross-engine)."""
    from ..operators.sketches import bloom_join_audit

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return bloom_join_audit(li, "l_orderkey", orders, "o_orderkey")


def q_x38_contamination_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit: near-dup pairs that STRADDLE
    dataset splits — the leakage a curation pipeline must catch before
    training (a test doc whose near-duplicate sits in train inflates
    eval).  Composes the LSH near-dup pipeline with the deterministic
    hash split; output is the pair count per (split_a, split_b) cell
    plus how many of those pairs cross splits."""
    from ..operators.sampling import hash_split

    docs = dd.augment_docs(_docs(spark, sf_dir))
    splits = hash_split(docs, "doc_id").select("doc_id", "split")
    pairs = dd.near_dup_pipeline(docs, sha=_sha_base(docs)).select(
        "doc_a", "doc_b"
    )
    sa = splits.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    sb = splits.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy("split_a", "split_b")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(
                F.when(F.col("split_a") != F.col("split_b"), 1).otherwise(0)
            ).alias("n_leaking"),
        )
    )


def q_x39_top_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding collection (power
    iteration over the distributed covariance — operators/pca.py);
    oracle unrolls the identical max-abs-normalized recurrence."""
    from ..operators.pca import top_principal_component

    return top_principal_component(load_table(spark, sf_dir, "embeddings"))


def q_x40_pc_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D reduction: every embedding's coordinate along the (e6-
    quantized, sign-fixed) top principal component."""
    from ..operators.pca import project_onto_top_pc

    return project_onto_top_pc(load_table(spark, sf_dir, "embeddings"))


PHRASE = ["table", "hash"]


def q_x41_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact consecutive-phrase search over the positional index
    (operators/inverted_index.py:phrase_search) — the adjacency
    capability plain postings can't answer."""
    from ..operators.inverted_index import phrase_search

    return phrase_search(_docs(spark, sf_dir), PHRASE)


def q_x42_hll_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped HLL: one register table per documents.source — distinct
    doc_id cardinality per corpus source, the per-domain stat a
    curation pipeline tracks."""
    from ..operators.sketches import hll_registers

    return hll_registers(_docs(spark, sf_dir), "doc_id", by=["source"])


def q_x43_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS inner-product join-cardinality estimate vs the exact join
    size (lineitem x URGENT orders on orderkey) — what a cost-based
    planner computes from sketches, with the error audited exactly."""
    from ..operators.sketches import cms_join_size_estimate

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cms_join_size_estimate(li, "l_orderkey", orders, "o_orderkey")


def q_x44_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 suppliers by CMS-estimated lineitem frequency — the
    sketch's point-query read path, deterministic tie-break."""
    from ..operators.sketches import cms_heavy_hitters

    return cms_heavy_hitters(load_table(spark, sf_dir, "lineitem"), "l_suppkey")


def q_x34_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-repetition quality signals (distinct ratio, top-token
    share) — operators/text_analysis.py:repetition_stats."""
    return repetition_stats(_docs(spark, sf_dir))


def q_x5_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(load_table(spark, sf_dir, "embeddings"))


def q_x6_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_topk(load_table(spark, sf_dir, "embeddings"))


def q_x23_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format sink/source path end-to-end in the driver gate: the
    events subset is quantized to integers, written as BOTH hive-style
    partitioned csv and json (sources.tables.write_table), read back
    with explicit schemas (no inference scan), joined, and aggregated.
    Quantizing BEFORE the write means only longs/strings cross the
    text formats — the check proves the sink/source plumbing without
    any float-formatting risk.  The oracle recomputes the aggregate
    straight from the parquet table: identical numbers prove both
    roundtrips were lossless."""
    import os

    from ..sources.tables import read_table, write_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5000001))
        .cast("long")
        .alias("v_e2"),
    )
    d = _roundtrip_dir("fmt")
    write_table(ev, os.path.join(d, "csv"), fmt="csv", partition_by=["event_type"])
    write_table(ev, os.path.join(d, "json"), fmt="json")
    schema = "event_id long, v_e2 long, event_type string"
    back_csv = read_table(spark, os.path.join(d, "csv"), fmt="csv", schema=schema)
    back_json = read_table(
        spark, os.path.join(d, "json"), fmt="json", schema=schema
    )
    both = back_csv.alias("c").join(
        back_json.alias("j"), "event_id"
    )
    return (
        both.where(F.col("c.v_e2") == F.col("j.v_e2"))
        .groupBy(F.col("c.event_type").alias("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("c.v_e2")).alias("sum_v_e2"),
        )
    )


X23_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5000001) AS BIGINT)) AS BIGINT) AS sum_v_e2
FROM events GROUP BY event_type
"""


def q_x22_srp_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit multi-probe SRP-LSH near-dups — recall recovery over x20
    at a controlled (n_planes+1)x candidate cost."""
    return srp_lsh_near_dups_multiprobe(load_table(spark, sf_dir, "embeddings"))


def q_x21_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a learned (deterministic seeded k-means) coarse
    quantizer — the oracle replays the identical quantized Lloyd
    trajectory via unrolled CTEs, so this hash-checks the k-means
    itself, not just the final scan."""
    return ivf_kmeans_topk(load_table(spark, sf_dir, "embeddings"))


def q_x7_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(_docs(spark, sf_dir))


def q_x8_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(_docs(spark, sf_dir))


def q_x9_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_count(_docs(spark, sf_dir))


def q_x10_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(_docs(spark, sf_dir))


def q_x11_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG/GIF/BMP header parsing over constructed payloads in
    mapInPandas — the oracle re-derives the dims from the generative
    formula, so assembly and parsing must both be correct to hash."""
    return decode_images(binarize_docs(_docs(spark, sf_dir)))


def q_x17_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas resize plumbing on decoded dims (integer-exact)."""
    return resize_meta(decode_images(binarize_docs(_docs(spark, sf_dir))))


def q_x18_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas batch feature extraction over the binary payload."""
    return extract_features(binarize_docs(_docs(spark, sf_dir)))


def q_x24_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1-in-N frame sampling over decoded multimodal
    metadata — the cheap-predicate, no-shuffle video-sampling shape."""
    return frame_sample(decode_images(binarize_docs(_docs(spark, sf_dir))))


X24_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text))
            + CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 13 ELSE 54 END
            AS BIGINT) AS n_bytes,
       CASE doc_id % 3 WHEN 0 THEN 'image/png'
            WHEN 1 THEN 'image/gif' ELSE 'image/bmp' END AS format,
       CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
       CAST((octet_length(encode(text)) * 7) % 480 + 1 AS BIGINT) AS height
FROM documents WHERE doc_id % 7 = 0"""


def q_x19_sharded_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-bounded posting lists: sharded by doc_id % 16."""
    from ..operators.inverted_index import inverted_index_sharded

    return inverted_index_sharded(_docs(spark, sf_dir))


X19_SQL = """
WITH toks AS (
  SELECT doc_id, doc_id % 16 AS shard,
         unnest(list_filter(
           string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
           t -> t != '')) AS word
  FROM documents
)
SELECT word, CAST(shard AS INTEGER) AS shard,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS doc_ids
FROM toks GROUP BY word, shard"""


def q_x13_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.simhash(dd.augment_docs(_docs(spark, sf_dir)))


def q_x14_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.simhash_near_dups(dd.simhash(dd.augment_docs(_docs(spark, sf_dir))))


def q_x15_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dups(load_table(spark, sf_dir, "embeddings"))


def q_x20_srp_lsh_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH blocking + exact rescoring on candidates."""
    return srp_lsh_near_dups(load_table(spark, sf_dir, "embeddings"))


def q_x16_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage aggregation — result-identical to the plain
    groupBy, which is exactly what the oracle asserts (plain GROUP BY
    SQL vs the salted rewrite)."""
    from ..operators.scale import salted_agg

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 100 + F.lit(0.5000001)).alias("v")
    )
    return salted_agg(
        ev,
        ["event_type"],
        {"total_v": "sum(v)", "n": "count(v)", "max_v": "max(v)"},
    )


X16_SQL = """
SELECT event_type,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5000001) AS BIGINT)) AS BIGINT) AS total_v,
       COUNT(*) AS n,
       MAX(CAST(FLOOR(value * 100 + 0.5000001) AS BIGINT)) AS max_v
FROM events GROUP BY event_type
"""


def q_z6_stream_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming HLL registers over events.user_id drained with
    AvailableNow — max-per-register is a monotone merge, so the result
    is bit-identical to the batch sketch (oracle: the batch SQL)."""
    from ..streaming.events import (
        hll_registers_stream,
        read_event_stream,
        run_available_now,
        stage_table_dir,
    )

    stream = hll_registers_stream(
        read_event_stream(spark, stage_table_dir(sf_dir))
    )
    return run_available_now(stream, "t_z6_hll", output_mode="complete")


def q_x64_minhash_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator audit: estimated vs exact Jaccard per LSH
    candidate pair (sketch-error methodology, the x43 pattern applied
    to dedup)."""
    return dd.minhash_jaccard_audit(
        dd.shingles(dd.augment_docs(_docs(spark, sf_dir)))
    )


def q_x66_source_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinctive keywords by rate lift (c-TF-IDF idea,
    log-free) — corpus profiling for curation."""
    from ..operators.text_analysis import source_keywords

    return source_keywords(_docs(spark, sf_dir))


def q_x65_lang_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-vs-content audit: cross-tabulate the declared ``lang``
    column against the n-gram lang_id guess.  The curation check that
    catches mislabeled or machine-mixed sources before a language
    filter trusts the metadata.  One doc-keyed join + one tiny
    cross-tab aggregate on top of x7's scoring."""
    docs = _docs(spark, sf_dir)
    guesses = lang_id(docs).select("doc_id", "lang_guess")
    return (
        docs.select("doc_id", "lang")
        .join(guesses, "doc_id")
        .groupBy("lang", "lang_guess")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("lang") == F.col("lang_guess")).cast("long")).alias(
                "n_agree"
            ),
        )
    )


def q_x67_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink/source roundtrip (Spark's other native columnar
    format): the quantized events subset is written hive-partitioned
    ORC, read back, and aggregated; the oracle recomputes the
    aggregate straight from parquet, so identical numbers prove the
    roundtrip lossless.  Partitioned write + schema-carrying columnar
    read — the x23 text-format check's columnar sibling."""
    import os

    from ..sources.tables import read_table, write_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5000001))
        .cast("long")
        .alias("v_e2"),
    )
    d = _roundtrip_dir("orc")
    write_table(
        ev, os.path.join(d, "orc"), fmt="orc", partition_by=["event_type"]
    )
    back = read_table(spark, os.path.join(d, "orc"), fmt="orc")
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("v_e2").alias("sum_v_e2"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


def q_z13_stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OHLC candles drained with AvailableNow — monotone
    min/max merges over integer state, bit-identical to the batch w6
    (oracle: the batch SQL)."""
    from ..streaming.events import (
        hourly_ohlc_stream,
        read_event_stream,
        run_available_now,
        stage_table_dir,
    )

    stream = hourly_ohlc_stream(read_event_stream(spark, stage_table_dir(sf_dir)))
    return run_available_now(stream, "t_z13_ohlc", output_mode="complete")


def q_x68_dataset_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset datasheet: ONE row summarizing the corpus — sizes,
    vocabulary, language/source diversity, mean quality, top-20-vocab
    OOV rate.  Every number a data card needs before training, in one
    fused query (three corpus scans: metadata, tokens, quality).  All
    ratios are floor+nudge-quantized over exact integer sums, so the
    row is hash-checkable cross-engine."""
    from ..operators.bpe import word_freqs
    from ..operators.text_analysis import quality_score

    docs = _docs(spark, sf_dir)
    meta = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum((F.col("lang") == "en").cast("long")).alias("n_en"),
    )
    wf = word_freqs(docs)
    vocab = wf.agg(
        F.sum("freq").alias("total_tokens"),
        F.count("*").alias("distinct_words"),
    )
    top20 = wf.orderBy(F.desc("freq"), F.asc("word")).limit(20).agg(
        F.sum("freq").alias("top20_tokens")
    )
    qual = quality_score(docs).agg(F.sum("quality_e6").alias("q_sum"))
    return (
        meta.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(top20))
        .crossJoin(F.broadcast(qual))
        .select(
            "n_docs",
            "total_chars",
            "total_tokens",
            "distinct_words",
            "n_langs",
            "n_sources",
            F.floor(
                F.col("n_en").cast("double") / F.col("n_docs") * 1e6
                + F.lit(0.5000001)
            )
            .cast("long")
            .alias("pct_en_e6"),
            F.floor(
                F.col("q_sum").cast("double") / F.col("n_docs")
                + F.lit(0.5000001)
            )
            .cast("long")
            .alias("mean_quality_e6"),
            F.floor(
                (
                    1.0
                    - F.col("top20_tokens").cast("double")
                    / F.col("total_tokens")
                )
                * 1e6
                + F.lit(0.5000001)
            )
            .cast("long")
            .alias("oov20_e6"),
        )
    )


def q_x69_pixel_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode: complete 24-bpp BMPs assembled JVM-side
    (padded raster, generative pixel values), then numpy walks the
    actual raster bytes per Arrow batch and sums channels.  The oracle
    replays the pixel generator over (x, row) ranges — integer-exact
    both sides."""
    from ..operators.multimodal import binarize_raster, decode_pixels

    return decode_pixels(binarize_raster(_docs(spark, sf_dir)))


def q_x134_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode (VERDICT r10 #6): complete valid PNGs —
    zlib-compressed IDAT, per-scanline Sub/Up filters, CRC'd chunks —
    built per document, then the decoder walks the chunk structure
    from the actual bytes (verifying CRCs), inflates IDAT with stdlib
    zlib, reconstructs the five-filter predictor chain, and sums
    channels.  The pixel generator is x69's, so the oracle re-derives
    the channel sums from the generative (x, row) formulas — the same
    exactness discipline, now through a genuinely compressed codec
    path."""
    from ..operators.multimodal import binarize_png, decode_png_pixels

    return decode_png_pixels(binarize_png(_docs(spark, sf_dir)))


def q_x70_pixel_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor resample on REAL decoded pixels (x69's rasters
    through the resize_meta fit math, applied to actual bytes); oracle
    replays the generator at exactly the sampled coordinates."""
    from ..operators.multimodal import binarize_raster, resize_pixels

    return resize_pixels(binarize_raster(_docs(spark, sf_dir)))


def q_x71_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode: complete 16-bit PCM WAV files assembled
    JVM-side, chunk layout parsed and int16 samples frombuffered per
    Arrow batch; oracle replays the sample generator (integer-exact
    |s| sums)."""
    from ..operators.multimodal import binarize_audio, decode_audio

    return decode_audio(binarize_audio(_docs(spark, sf_dir)))


def q_x85_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signal features over the REAL decoded PCM (x71's files): exact
    integer energy and zero-crossing counts — the cheap voice/noise
    discriminators, one numpy pass per file."""
    from ..operators.multimodal import audio_features, binarize_audio

    return audio_features(binarize_audio(_docs(spark, sf_dir)))


def _x85_sql() -> str:
    from ..operators.multimodal import AUDIO_FEATURES_SQL

    return AUDIO_FEATURES_SQL


def q_x72_dedup_method_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-selection evidence: MinHash-Jaccard vs SimHash pair-set
    agreement on the augmented corpus (both / jaccard_only /
    simhash_only counts)."""
    return dd.dedup_method_audit(dd.augment_docs(_docs(spark, sf_dir)))


def q_c3_model_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based curation gate: score every document under the
    corpus-fit char-bigram LM (x52), drop the bottom DECILE by average
    log-prob (equi-depth bins via the parallel global-position
    operator — no single-partition window), and account the survivors
    per language.  The composition that makes the trained LM a
    production filter, not just a metric."""
    from ..operators.sampling import quantile_bins
    from ..operators.text_analysis import char_lm_scores

    docs = _docs(spark, sf_dir)
    scored = char_lm_scores(docs).select("doc_id", "avg_logp_e6")
    binned = quantile_bins(
        scored, [F.asc("avg_logp_e6"), F.asc("doc_id")], 10
    )
    kept = binned.where(F.col("bin") > 1).select("doc_id")
    return (
        docs.select("doc_id", "lang")
        .join(scored.select("doc_id"), "doc_id")
        .join(kept.withColumn("kept", F.lit(1)), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_scored"),
            F.sum(F.coalesce("kept", F.lit(0))).alias("n_kept"),
        )
    )


def q_x73_hll_shard_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-merge proof as a driver-checked query: sketch the even-
    and odd-keyed halves of lineitem INDEPENDENTLY, merge by
    elementwise register max, and the result must hash-match the
    whole-table sketch (the oracle) — the distributed-combine law that
    makes HLL the 100 TB cardinality path."""
    from ..operators.sketches import hll_merge, hll_registers

    li = load_table(spark, sf_dir, "lineitem")
    even = hll_registers(li.where(F.col("l_orderkey") % 2 == 0), "l_orderkey")
    odd = hll_registers(li.where(F.col("l_orderkey") % 2 == 1), "l_orderkey")
    return hll_merge([even, odd])


def q_x74_composition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition matrix: token counts pivoted source × lang
    (the mixture table a training-data report leads with).  One
    (source, lang) aggregate then a conditional-sum pivot — bounded by
    |sources| rows × |langs| columns regardless of corpus size."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "source", "lang", F.size(_toks_col()).alias("n_toks")
    )
    langs = ["de", "en", "es", "fr", "zh"]
    return toks.groupBy("source").agg(
        *[
            F.sum(F.when(F.col("lang") == l, F.col("n_toks")).otherwise(0))
            .alias(f"toks_{l}")
            for l in langs
        ],
        F.sum("n_toks").alias("toks_total"),
    )


def _toks_col():
    from ..operators.text_analysis import _toks

    return _toks()


def q_x75_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (the Heaps-law view): distinct words
    within the first 20/40/60/80/100% of documents (by doc_id order —
    deterministic prefixes).  One explode + one agg with five
    conditional DISTINCT counts; the curve a tokenizer-sizing decision
    reads."""
    docs = _docs(spark, sf_dir)
    n = docs.count()  # S5 scalar channel — the prefix thresholds
    words = docs.select("doc_id", F.explode(_toks_col()).alias("word"))
    cuts = [(pct, (n * pct) // 100) for pct in (20, 40, 60, 80, 100)]
    return words.agg(
        *[
            F.countDistinct(
                F.when(F.col("doc_id") < thr, F.col("word"))
            ).alias(f"vocab_p{pct}")
            for pct, thr in cuts
        ]
    )


def q_z12_stream_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user purchase moments (n, Σv3, Σv3²) drained with
    AvailableNow — additive integer merges, so the drain is
    bit-identical to the batch aggregation (oracle: batch SQL)."""
    from ..streaming.events import (
        read_event_stream,
        run_available_now,
        stage_table_dir,
        user_moments_stream,
    )

    stream = user_moments_stream(
        read_event_stream(spark, stage_table_dir(sf_dir))
    )
    return run_available_now(stream, "t_z12_moments", output_mode="complete")


def q_z7_session_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming session_window drained with AvailableNow —
    oracle is the batch e4 SQL (engine-managed session state parity)."""
    from ..streaming.events import (
        read_event_stream,
        run_available_now,
        session_window_stream,
        stage_table_dir,
    )

    stream = session_window_stream(
        read_event_stream(spark, stage_table_dir(sf_dir))
    )
    return run_available_now(stream, "t_z7_sessions", output_mode="complete")


def q_z8_stream_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming count-min over events.user_id drained with
    AvailableNow — additive cells, bit-identical to the batch sketch
    (oracle: the batch SQL)."""
    from ..streaming.events import (
        cms_counts_stream,
        read_event_stream,
        run_available_now,
        stage_table_dir,
    )

    stream = cms_counts_stream(read_event_stream(spark, stage_table_dir(sf_dir)))
    return run_available_now(stream, "t_z8_cms", output_mode="complete")


def q_x51_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-table training over documents (8 merges): corpus
    compressed to the (word, freq) vocabulary first, then each round
    is one bounded pair-count aggregate + a single driver-scalar
    argmax — the tokenizer-bootstrap path that never re-touches the
    corpus after the first groupBy."""
    from ..operators.bpe import bpe_merges

    return bpe_merges(_docs(spark, sf_dir))


def q_x90_batched_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCHED BPE training (3 rounds x up to 8 symbol-disjoint merges
    per driver round-trip): the distributed-tokenizer scale path — a
    30k-merge vocabulary costs O(n/batch) Spark jobs instead of one
    per merge.  The oracle replays the identical conservative batch
    rule and simultaneous fold, so the trajectory is hash-checked."""
    from ..operators.bpe import bpe_merges_batched

    return bpe_merges_batched(_docs(spark, sf_dir))


def q_x98_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection on synthesized raw-luma clips: JVM-side
    payload assembly, genuine byte-walk decode in mapInPandas,
    integer consecutive-frame SAD threshold."""
    from ..operators.multimodal import binarize_video, scene_cuts

    return scene_cuts(binarize_video(_docs(spark, sf_dir)))


def q_x101_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bigram novelty (fraction of grams first seen HERE, by
    ingest order) — the crawl-freshness curve; one gram-keyed min
    election + join back, no pairwise comparison."""
    from ..operators.text_analysis import ngram_novelty

    return ngram_novelty(_docs(spark, sf_dir))


def q_x102_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc trigram repetition gates (duplicated-occurrence fraction
    + top-trigram share) — the Gopher boilerplate rules at the n-gram
    level x34's token distinct-ratio cannot see; one (doc, gram) count
    with map-side combine, then a doc-keyed aggregate."""
    from ..operators.text_analysis import gopher_repetition

    return gopher_repetition(_docs(spark, sf_dir))


def q_x103_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality score: per-doc cross-entropy under an
    add-one-smoothed word-bigram LM trained on the corpus; the
    vocab²-scale model rides a gram-keyed SHUFFLE join (never
    broadcast), per-bigram log-probs e6-quantized then summed
    exactly."""
    from ..operators.text_analysis import bigram_perplexity

    return bigram_perplexity(_docs(spark, sf_dir))


def q_x105_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Zipf (log-log) slope + r² over the word-frequency
    table — the power-law health check per crawl; e3-quantized logs,
    exact integer regression sums, vocab-scale rank window."""
    from ..operators.text_analysis import zipf_slope

    return zipf_slope(_docs(spark, sf_dir))


def q_x100_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dim symmetric int8 quantization of the embedding table:
    bounded per-dim scale aggregate broadcast onto the scan, integer
    codes out — the ANN index compression step."""
    from ..operators.similarity import quantize_embeddings

    return quantize_embeddings(
        load_table(spark, sf_dir, "embeddings")
    )


def q_x99_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-co-occurrence PMI over the df-banded vocabulary ([5, 200]
    doc-freq): stopwords and hapaxes never reach the per-doc pair
    join, so the quadratic surface is blocked, not discovered."""
    from ..operators.text_analysis import cooccurrence_pmi

    return cooccurrence_pmi(_docs(spark, sf_dir))


def q_x95_window_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup rate per ingest window (doc_id div 250) over the
    augmented corpus — the when-did-duplication-spike drift view."""
    from ..operators.dedup import window_dedup_rate

    return window_dedup_rate(dd.augment_docs(_docs(spark, sf_dir)))


def q_x96_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source p50/p90/p99 token-length percentiles via the
    bounded (source, len) histogram + CDF window + integer nearest-rank
    pick — no approx_percentile, no doc-relation sort."""
    from ..operators.text_analysis import length_percentiles

    return length_percentiles(_docs(spark, sf_dir))


def q_x94_rare_token_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomenon audit: per-doc count/rate of globally-unique
    tokens (OCR-noise screen).  Hapax keys are unique by construction
    — the vocab-scale join is skew-free, never broadcast-sized."""
    from ..operators.text_analysis import rare_token_docs

    return rare_token_docs(_docs(spark, sf_dir))


def q_x92_stratified_iceberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language iceberg bigram aggregate (HAVING cnt >= 20): the
    below-threshold tail dies in the map-side partial aggregates; only
    the tip joins the broadcast per-lang totals."""
    from ..operators.text_analysis import stratified_iceberg

    return stratified_iceberg(_docs(spark, sf_dir))


def q_x93_doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document letter-distribution Shannon entropy (gibberish /
    low-diversity quality signal).  Column-only: 26 length-difference
    expressions, no per-char explode, no shuffle."""
    from ..operators.text_analysis import doc_entropy

    return doc_entropy(_docs(spark, sf_dir))


def q_x52_char_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-bigram LM self-scoring (model-based quality filter): the
    corpus fits its own <=729-row bigram model, broadcast back to
    score every document; per-bigram log-probs are e6-quantized so
    doc totals are order-independent integer sums."""
    from ..operators.text_analysis import char_lm_scores

    return char_lm_scores(_docs(spark, sf_dir))


def q_x54_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-gram decontamination: train-split documents sharing a
    verbatim word 5-gram with the test split (md5 hash-split
    convention) — the phrase-leak screen that complements the MinHash
    contamination audit (x38)."""
    from ..operators.text_analysis import ngram_contamination

    return ngram_contamination(_docs(spark, sf_dir))


C2_MIN_TOKENS = 40  # admits most of the batch, rejects short docs


def q_c2_ingest_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-side composition (the ingest twin of c1): an incoming
    batch — genuinely new documents (every 7th original) MIXED with
    re-crawled duplicates (the synthetic dup set) — is token-count
    gated, screened against the EXISTING corpus's LSH band index
    (x56 — never a self-join), and the admitted docs are split, with
    per-split accounting.  One plan; the gate runs BEFORE the dedup
    screen so rejected docs never pay shingling; duplicates of
    existing content are dropped while the genuinely new docs pass."""
    from ..functions.textops import strip_non_alpha, tokens

    aug = dd.augment_docs(_docs(spark, sf_dir))
    in_batch = (F.col("doc_id") % 7 == 3) | (
        F.col("doc_id") >= dd.NEAR_DUP_OFFSET
    )
    new = aug.where(in_batch)
    existing = aug.where(~in_batch)
    gated = new.where(
        F.size(tokens(strip_non_alpha(F.col("text")))) >= C2_MIN_TOKENS
    )
    dups = (
        dd.incremental_near_dups(existing, gated)
        .select(F.col("new_doc").alias("doc_id"))
        .distinct()
    )
    admitted = gated.select(
        "doc_id", F.length("text").cast("long").alias("n_chars")
    ).join(dups, "doc_id", "left_anti")
    return (
        hash_split(admitted, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def _c2_sql() -> str:
    in_batch = f"(doc_id % 7 = 3 OR doc_id >= {dd.NEAR_DUP_OFFSET})"
    gated_new = f"""
  SELECT doc_id, text FROM ({dd.AUGMENT_SQL})
  WHERE {in_batch}
    AND len(list_filter(string_split_regex(
          lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
          t -> t != '')) >= {C2_MIN_TOKENS}"""
    existing = f"SELECT * FROM ({dd.AUGMENT_SQL}) WHERE NOT {in_batch}"
    inc = dd.incremental_near_dups_sql(existing, gated_new)
    return f"""
WITH dups AS (SELECT DISTINCT new_doc AS doc_id FROM ({inc})),
admitted AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
  FROM ({gated_new})
  WHERE doc_id NOT IN (SELECT doc_id FROM dups)
)
SELECT {hash_split_sql("doc_id")} AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM admitted
GROUP BY 1"""


def q_x58_fuzzy_word_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-2 vocabulary pairs via symmetric-delete blocking
    (SymSpell) + built-in levenshtein verify — fuzzy joins without a
    quadratic cross join, on the distinct-word relation."""
    from ..operators.fuzzy import fuzzy_word_pairs

    return fuzzy_word_pairs(_docs(spark, sf_dir))


def _x58_sql() -> str:
    from ..operators.fuzzy import fuzzy_word_pairs_sql

    return fuzzy_word_pairs_sql()


def q_x57_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OOV-rate metric for a top-20 frequency vocabulary — the
    tokenizer-sizing statistic; runs on the distinct-word relation
    after one corpus groupBy."""
    from ..operators.bpe import vocab_coverage

    return vocab_coverage(_docs(spark, sf_dir))


def _x57_sql() -> str:
    from ..operators.bpe import vocab_coverage_sql

    return vocab_coverage_sql()


def q_x56_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: the synthetic dup batch (augmented
    ids) screened against the existing corpus — candidates are
    new x existing band matches only, never a full self-join; the
    existing band table is the persisted index at production scale."""
    aug = dd.augment_docs(_docs(spark, sf_dir))
    new = aug.where(F.col("doc_id") >= dd.NEAR_DUP_OFFSET)
    existing = aug.where(F.col("doc_id") < dd.NEAR_DUP_OFFSET)
    return dd.incremental_near_dups(existing, new)


def _x56_sql() -> str:
    return dd.incremental_near_dups_sql(
        f"SELECT * FROM ({dd.AUGMENT_SQL}) WHERE doc_id < {dd.NEAR_DUP_OFFSET}",
        f"SELECT * FROM ({dd.AUGMENT_SQL}) WHERE doc_id >= {dd.NEAR_DUP_OFFSET}",
    )


def q_x55_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup clusters: transitive closure of the
    embedding-cosine near-dup pairs (x15) via the same convergent
    min-label machinery the text-LSH clusters use (x33) — the
    composition that turns pairwise near-dup evidence into one
    canonical representative per semantic group."""
    from ..operators.dedup import cluster_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dups(emb).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    # the cluster universe is the same augmented set the pair relation
    # is defined over (x15) — clustering the raw table against pairs
    # that reference augmented ids would silently drop cluster members
    from ..operators.similarity import augment_embeddings

    docs = augment_embeddings(emb).select(F.col("vec_id").alias("doc_id"))
    return cluster_pairs(docs, pairs).select(
        F.col("doc_id").alias("vec_id"), "canonical_id", "is_canonical"
    )


def _x55_sql(rounds: int = 8) -> str:
    """Min-label unroll over the x15 pair relation (idempotent past
    the fixpoint, valid while rounds >= pair-graph diameter — planted
    near-dup groups are small)."""
    from ..operators.similarity import AUGMENT_EMB_SQL

    ctes = [
        f"universe AS MATERIALIZED (SELECT vec_id FROM ({AUGMENT_EMB_SQL}))",
        f"nd AS MATERIALIZED ({EMBEDDING_NEAR_DUP_SQL})",
        "sym AS MATERIALIZED (SELECT vec_a AS doc_a, vec_b AS doc_b FROM nd "
        "UNION ALL SELECT vec_b AS doc_a, vec_a AS doc_b FROM nd)",
        "l0 AS MATERIALIZED (SELECT DISTINCT doc_a AS doc_id, doc_a AS label FROM sym)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(f"""l{k} AS MATERIALIZED (
  SELECT doc_id, MIN(label) AS label FROM (
    SELECT doc_id, label FROM l{k - 1}
    UNION ALL
    SELECT e.doc_a AS doc_id, l.label
    FROM sym e JOIN l{k - 1} l ON l.doc_id = e.doc_b
  ) GROUP BY doc_id)""")
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT u.vec_id,
       COALESCE(l.label, u.vec_id) AS canonical_id,
       u.vec_id = COALESCE(l.label, u.vec_id) AS is_canonical
FROM universe u LEFT JOIN l{rounds} l ON l.doc_id = u.vec_id"""


def q_x53_histogram_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value histograms (one fixed-bin sketch per
    group): at most |groups|*nbins aggregate rows — per-segment
    distribution monitoring at any input volume."""
    from ..operators.sketches import histogram_bins

    return histogram_bins(
        load_table(spark, sf_dir, "events"), "value", by=["event_type"]
    )


def q_z11_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user funnel state machine drained with
    AvailableNow — min-merge state (three longs per user), stage
    identical to the batch per-user funnel (oracle: E6_STAGE_SQL)."""
    from ..streaming.events import (
        funnel_stream,
        read_event_stream,
        run_available_now,
        stage_table_dir,
    )

    stream = funnel_stream(read_event_stream(spark, stage_table_dir(sf_dir)))
    return run_available_now(stream, "t_z11_funnel", output_mode="update")


def q_z10_stream_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming fixed-bin histogram over events.value drained with
    AvailableNow — additive per-bin counts, identical to the batch
    sketch (oracle: the batch bins SQL)."""
    from ..streaming.events import (
        read_event_stream,
        run_available_now,
        stage_table_dir,
        value_histogram_stream,
    )

    stream = value_histogram_stream(read_event_stream(spark, stage_table_dir(sf_dir)))
    return run_available_now(stream, "t_z10_hist", output_mode="complete")


def q_z17_stream_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming KS drift: the (event_type, v_e2) half counts are the
    ADDITIVE complete-mode state (bounded by the value grid), drained
    with AvailableNow; the sup-gap finish runs as a batch post-pass
    over the drained grid.  Oracle = the batch d6 SQL — the hash gate
    proves streaming/batch parity on the same input."""
    from ..plans.relational import ks_from_counts
    from ..streaming.events import (
        ks_counts_stream,
        read_event_stream,
        run_available_now,
        stage_table_dir,
    )

    stream = ks_counts_stream(
        read_event_stream(spark, stage_table_dir(sf_dir))
    )
    drained = run_available_now(stream, "t_z17_ks", output_mode="complete")
    return ks_from_counts(drained)


def q_x114_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-substring-dedup TRANSFORM behind x110's diagnostic:
    every token position covered by a corpus-repeated n-gram is
    dropped and the cleaned token stream fingerprinted — the step that
    actually shrinks the corpus.  Runs on the augmented corpus so
    repeated spans exist."""
    from ..operators.text_analysis import dup_span_removal

    return dup_span_removal(dd.augment_docs(_docs(spark, sf_dir)))


def q_z18_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState last-touch attribution vs the batch e9
    as-of twin: per-user state carries the (click, purchase) sets
    across micro-batches; each batch re-attributes, so out-of-order
    clicks retroactively correct earlier answers (order-insensitive
    fold, the z2 discipline).  Oracle = the batch e9 SQL."""
    from ..plans.relational import ATTRIBUTION_WINDOW_S
    from ..streaming.events import (
        attribution_stream,
        read_event_stream,
        run_available_now,
        stage_table_dir,
    )

    stream = attribution_stream(
        read_event_stream(spark, stage_table_dir(sf_dir)),
        window_s=ATTRIBUTION_WINDOW_S,
    )
    # last_write_key: update-mode re-emits every touched purchase each
    # batch; keep each event_id's LAST emission so the result is
    # correct under multi-batch delivery, not just the single-batch
    # staging dir shipped today.
    return run_available_now(
        stream,
        "drv_z18_attr",
        output_mode="update",
        last_write_key=["event_id"],
    )


def q_z19_stream_hourweek(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hour-of-week seasonality: the additive (type, how)
    grid is the complete-mode state (bounded at types x 168), drained
    with AvailableNow; the share/peak finish runs as a batch post-pass.
    Oracle = the batch w12 SQL (stream/batch parity)."""
    from ..plans.relational import hourweek_from_grid
    from ..streaming.events import (
        hourweek_counts_stream,
        read_event_stream,
        run_available_now,
        stage_table_dir,
    )

    stream = hourweek_counts_stream(
        read_event_stream(spark, stage_table_dir(sf_dir))
    )
    drained = run_available_now(
        stream, "t_z19_hourweek", output_mode="complete"
    )
    return hourweek_from_grid(drained)


def q_z1_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming rollup drained with AvailableNow — the
    oracle is the BATCH rollup SQL (e2), i.e. the hash check proves
    streaming/batch parity on the same input."""
    from ..streaming.events import (
        hourly_rollup_stream,
        measured_state_partitions,
        read_event_stream,
        run_available_now,
        stage_table_dir,
    )

    d = stage_table_dir(sf_dir)
    stream = hourly_rollup_stream(read_event_stream(spark, d))
    # measured-size state-store width (guide §2.2 for streaming state:
    # the width is pinned at query start from the shuffle conf, so a
    # small input otherwise pays the full configured width in
    # state-store init/commit tasks every micro-batch)
    return run_available_now(
        stream,
        "drv_z1_rollup",
        state_partitions=measured_state_partitions(spark, d),
    )


def q_z9_stream_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-group bottom-k sample (mergeable min-k state) vs
    the batch per-group bottom-k twin — same membership, any batching."""
    from ..streaming.events import (
        bottom_k_stream,
        read_event_stream,
        run_available_now,
        stage_table_dir,
    )

    stream = bottom_k_stream(read_event_stream(spark, stage_table_dir(sf_dir)))
    return run_available_now(stream, "drv_z9_bottomk", output_mode="update")


def q_z2_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState sessionizer vs the batch lag+running-sum
    twin (e1) — custom stateful streaming state machine, same result."""
    from ..streaming.events import (
        read_event_stream,
        run_available_now,
        sessionize_stream,
        stage_table_dir,
    )

    stream = sessionize_stream(read_event_stream(spark, stage_table_dir(sf_dir)))
    return run_available_now(stream, "drv_z2_sessions", output_mode="update")


def q_z3_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream self-join drained with AvailableNow;
    the oracle is the equivalent batch band-join SQL."""
    from ..streaming.events import (
        click_purchase_join_stream,
        measured_state_partitions,
        read_event_stream,
        run_available_now,
        stage_table_dir,
    )

    d = stage_table_dir(sf_dir)
    stream = click_purchase_join_stream(read_event_stream(spark, d))
    # measured-size state-store width: the stream-stream join keeps
    # FOUR state stores per partition (left/right keyToNumValues +
    # keyWithIndexToValue), so conf-width overhead is 4x the rollup's
    # — z3 was the r11 scaling block's worst anti-scaler (0.41)
    return run_available_now(
        stream,
        "drv_z3_ssjoin",
        output_mode="append",
        state_partitions=measured_state_partitions(spark, d),
    )


Z3_SQL = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
 AND epoch_us(c.ts) < epoch_us(p.ts)
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
"""


def q_z4_sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window (1h window / 30min slide) streaming rollup — the
    oracle re-derives each event's two covering windows arithmetically
    (starts ≡ 0 mod slide), proving the overlap semantics."""
    from ..streaming.events import (
        read_event_stream,
        run_available_now,
        sliding_rollup_stream,
        stage_table_dir,
    )

    stream = sliding_rollup_stream(
        read_event_stream(spark, stage_table_dir(sf_dir))
    )
    return run_available_now(stream, "drv_z4_sliding")


Z4_SQL = """
SELECT (epoch_us(ts) // 1800000000) * 1800 - u.k * 1800 AS win_epoch,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5000001) AS BIGINT)) AS BIGINT) AS sum_value_e2
FROM events, (SELECT unnest([0, 1]) AS k) u
GROUP BY 1, 2"""


def q_z5_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: events stream joined to the customer
    dimension (broadcast per micro-batch), then a windowed per-segment
    rollup.  Oracle: the identical batch join+rollup."""
    from ..streaming.events import (
        enrich_stream,
        read_event_stream,
        run_available_now,
        stage_table_dir,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    enriched = enrich_stream(
        read_event_stream(spark, stage_table_dir(sf_dir)),
        cust,
        "user_id",
        "c_custkey",
    )
    rolled = (
        enriched.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 day").alias("win"), "c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5000001)).cast("long")
            ).alias("sum_value_e2"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("day_epoch"),
            F.col("c_mktsegment").alias("segment"),
            "n",
            "sum_value_e2",
        )
    )
    return run_available_now(rolled, "drv_z5_enrich")


Z5_SQL = """
SELECT (epoch_us(ts) // 86400000000) * 86400 AS day_epoch,
       c_mktsegment AS segment,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5000001) AS BIGINT)) AS BIGINT) AS sum_value_e2
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2"""


def q_x12_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    out = asof_join(
        ev,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_payload=["o_orderkey"],
        how="inner",
    )
    return out.select("event_id", "user_id", "r_o_orderkey")


X12_ASOF_SQL = """
SELECT event_id, user_id, o_orderkey AS r_o_orderkey FROM (
  SELECT e.event_id, e.user_id, o.o_orderkey,
         ROW_NUMBER() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e
  JOIN orders o
    ON o.o_custkey = e.user_id
   AND epoch_us(o.o_orderdate) <= epoch_us(e.ts)
) WHERE rn = 1"""


ASOF_FWD_TOL_S = 7200


def q_x30_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: each purchase matched to the
    NEAREST click at-or-after it (same user) within 2 hours — the
    time-reversed direction of x12, exercising the negated-sort path
    and the tolerance bound."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    out = asof_join(
        purchases,
        clicks,
        left_on="user_id",
        right_on="c_user",
        left_ts="ts",
        right_ts="c_ts",
        right_payload=["event_id"],
        how="inner",
        direction="forward",
        tolerance_s=ASOF_FWD_TOL_S,
    )
    return out.select("purchase_id", "user_id", F.col("r_event_id").alias("next_click_id"))


X30_SQL = f"""
SELECT purchase_id, user_id, event_id AS next_click_id FROM (
  SELECT p.event_id AS purchase_id, p.user_id, c.event_id,
         ROW_NUMBER() OVER (
           PARTITION BY p.event_id
           ORDER BY c.ts ASC, c.event_id DESC) AS rn
  FROM events p
  JOIN events c
    ON c.user_id = p.user_id AND c.event_type = 'click'
   AND epoch_us(c.ts) >= epoch_us(p.ts)
   AND epoch_us(c.ts) <= epoch_us(p.ts) + {ASOF_FWD_TOL_S * 1_000_000}
  WHERE p.event_type = 'purchase'
) WHERE rn = 1"""


# ---------------------------------------------------------------------------
# Sampling / split / curation queries (operators/sampling.py,
# text_analysis.py ngram/redact) — the dataset-assembly surface of a
# training pipeline
# ---------------------------------------------------------------------------

SAMPLE_FRACTIONS = {"click": 0.05, "view": 0.02, "error": 0.5, "purchase": 1.0}
QBIN_N = 10


MIX_WEIGHTS = {"src0": 2.5, "src1": 0.25, "src2": 0.0}  # others 1.0


def q_x32_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source re-weighting: src0 oversampled 2.5×, src1
    damped to 0.25×, src2 dropped, the rest passed through — each doc
    replicated/kept purely from md5(seed|doc_id)."""
    return weighted_mix(
        _docs(spark, sf_dir), "source", MIX_WEIGHTS, key_col="doc_id"
    ).select("doc_id", "source", F.col("copy").cast("long").alias("copy"))


def _x32_sql() -> str:
    n = weighted_mix_sql("source", MIX_WEIGHTS, "doc_id")
    return f"""
WITH n_of AS (
  SELECT doc_id, source, {n} AS n_copies FROM documents
)
SELECT doc_id, source, CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy
FROM n_of WHERE n_copies >= 1"""


def q_x25_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document deterministic split assignment + char mass per split
    proves both the assignment and that the full row survives intact."""
    return hash_split(_docs(spark, sf_dir), "doc_id").select(
        "doc_id", "split", "n_chars"
    )


X25_SQL = f"""
SELECT doc_id, {hash_split_sql("doc_id")} AS split, n_chars
FROM documents"""


def q_x26_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-style rebalancing: downsample the common event types,
    keep every rare purchase (signup falls to the 0 default — absent
    strata are dropped, the usual blocklist behavior)."""
    ev = load_table(spark, sf_dir, "events")
    return stratified_sample(
        ev, "event_type", SAMPLE_FRACTIONS, key_col="event_id"
    ).select("event_id", "event_type", "user_id")


X26_SQL = f"""
SELECT event_id, event_type, user_id
FROM events
WHERE {stratified_sample_sql("event_type", SAMPLE_FRACTIONS, "event_id")}"""


def q_x27_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_counts(_docs(spark, sf_dir), n=2)


def q_x28_redact_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return redact_numbers(load_table(spark, sf_dir, "events"))


def q_x29_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile bins over the quantized event value (equi-depth, global
    total order via the parallel position operator)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.floor(F.col("value") * 100 + F.lit(0.5000001)).cast("long").alias("value_e2")
    )
    binned = quantile_bins(ev, [F.asc("value_e2"), F.asc("event_id")], QBIN_N)
    return binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.min("value_e2").alias("lo_e2"),
        F.max("value_e2").alias("hi_e2"),
    )


X29_SQL = f"""
WITH v AS (
  SELECT event_id,
         CAST(FLOOR(value * 100 + 0.5000001) AS BIGINT) AS value_e2
  FROM events
),
p AS (
  SELECT value_e2,
         ROW_NUMBER() OVER (ORDER BY value_e2 ASC, event_id ASC) AS pos
  FROM v
)
SELECT (pos - 1) * {QBIN_N} // (SELECT COUNT(*) FROM v) + 1 AS bin,
       COUNT(*) AS n,
       MIN(value_e2) AS lo_e2,
       MAX(value_e2) AS hi_e2
FROM p GROUP BY 1"""


def q_x31_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm statistics over the embedding arrays — the
    vector-hygiene pass (detect unnormalized / degenerate vectors)
    before any similarity work.  Pure higher-order column expressions
    (zip_with product + left-to-right aggregate fold, the same float
    contract the cosine oracle proves); per-row norms quantized to e6
    integers BEFORE the cross-row agg so no float crosses a shuffle."""
    from ..operators.similarity import _dot

    emb = load_table(spark, sf_dir, "embeddings")
    norm_e6 = F.floor(
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))) * 1e6
        + F.lit(0.5000001)
    ).cast("long")
    return (
        emb.select(F.col("label").cast("long").alias("label"), norm_e6.alias("norm_e6"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.min("norm_e6").alias("min_norm_e6"),
            F.max("norm_e6").alias("max_norm_e6"),
            F.sum("norm_e6").alias("sum_norm_e6"),
        )
    )


X31_SQL = """
WITH norms AS (
  SELECT label,
         CAST(FLOOR(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                    * 1e6 + 0.5000001) AS BIGINT) AS norm_e6
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label,
       COUNT(*) AS n,
       MIN(norm_e6) AS min_norm_e6,
       MAX(norm_e6) AS max_norm_e6,
       CAST(SUM(norm_e6) AS BIGINT) AS sum_norm_e6
FROM norms GROUP BY 1"""


QUALITY_THR_E6 = 330_000  # ~40th pct on this corpus — a real split


def q_c1_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composition: the end-to-end curation pass a training
    pipeline runs — quality gate → fingerprint dedup (canonical =
    min doc_id per fingerprint) → deterministic split → per-split
    accounting.  Every stage is an existing oracle-checked operator;
    this query proves they COMPOSE (one plan, no materialization
    between stages)."""
    from ..operators.text_analysis import fingerprint, quality_score

    docs = _docs(spark, sf_dir)
    kept = (
        quality_score(docs)
        .where(F.col("quality_e6") >= QUALITY_THR_E6)
        .select("doc_id", "n_chars")
    )
    fp = fingerprint(docs)
    canon = (
        kept.join(fp, "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(kept, "doc_id")
    )
    return (
        hash_split(canon, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def q_z15_stream_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d4's right-to-be-forgotten rule applied AT INGEST: the request
    list anti-joins every micro-batch (stream-static broadcast), so
    deleted users never enter downstream state.  Drained per-type
    counts must equal d4's n_after column — the batch/stream parity
    the compliance audit needs."""
    from ..streaming.events import (
        forget_users_stream,
        read_event_stream,
        run_available_now,
        stage_table_dir,
    )

    forget = (
        load_table(spark, sf_dir, "events")
        .where((F.col("event_type") == "signup") & (F.col("user_id") % 7 == 0))
        .select(F.col("user_id").alias("fuid"))
        .distinct()
    )
    stream = forget_users_stream(
        read_event_stream(spark, stage_table_dir(sf_dir)), forget
    ).select("event_id", "event_type")
    drained = run_available_now(stream, "t_z15_forget", output_mode="append")
    return drained.groupBy("event_type").agg(F.count("*").alias("n_after"))


Z15_SQL = """
WITH forget AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'signup' AND user_id % 7 = 0
)
SELECT event_type, COUNT(*) AS n_after
FROM events
WHERE user_id NOT IN (SELECT user_id FROM forget)
GROUP BY event_type
"""


def q_x86_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet generations: a v1 dump
    (event_id, v_e2) and a v2 dump that ADDS a `channel` column are
    read together with mergeSchema — old files surface the new column
    as NULL instead of failing, the posture every long-lived dataset
    directory needs.  Output: per-channel counts with v1 rows under
    NULL→'__v1__', plus value sums proving both generations' data
    survived the merge."""
    import os

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5000001))
        .cast("long")
        .alias("v_e2"),
    )
    v1 = ev.where(F.col("event_id") % 2 == 0).select("event_id", "v_e2")
    v2 = ev.where(F.col("event_id") % 2 == 1).select(
        "event_id",
        "v_e2",
        F.concat(F.lit("ch_"), (F.col("user_id") % 3).cast("string")).alias(
            "channel"
        ),
    )
    d = _roundtrip_dir("schemaevo")
    v1.write.mode("overwrite").parquet(os.path.join(d, "gen=1"))
    v2.write.mode("overwrite").parquet(os.path.join(d, "gen=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(d, "gen=1"), os.path.join(d, "gen=2")
    )
    return (
        merged.select(
            F.coalesce(F.col("channel"), F.lit("__v1__")).alias("channel"),
            "v_e2",
        )
        .groupBy("channel")
        .agg(F.count("*").alias("n_rows"), F.sum("v_e2").alias("sum_v_e2"))
    )


X86_SQL = """
WITH ev AS (
  SELECT event_id, user_id,
         CAST(FLOOR(value * 100 + 0.5000001) AS BIGINT) AS v_e2
  FROM events
)
SELECT CASE WHEN event_id % 2 = 0 THEN '__v1__'
            ELSE 'ch_' || CAST(user_id % 3 AS VARCHAR) END AS channel,
       COUNT(*) AS n_rows,
       CAST(SUM(v_e2) AS BIGINT) AS sum_v_e2
FROM ev GROUP BY 1
"""


def q_x84_corrupt_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-tolerant ingest: a deterministically DIRTY json-lines
    dump of the events table (every event_id % 13 == 0 line truncated
    mid-object) read back PERMISSIVE with an explicit schema +
    `_corrupt_record` — good rows parse, bad rows land whole in the
    corrupt column instead of killing the job (the posture any
    100 TB crawl ingest needs; FAILFAST is one config flip away).
    Output: per-event_type good counts plus a `__corrupt__` row —
    accounting for every input line, parsed or not."""
    import os

    from ..sources.tables import load_table as _lt

    ev = _lt(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5000001))
        .cast("long")
        .alias("v_e2"),
    )
    line = F.when(
        F.col("event_id") % 13 == 0,
        # truncated mid-object: structurally invalid JSON
        F.concat(F.lit('{"event_id": '), F.col("event_id").cast("string"), F.lit(', "v_e2": ')),
    ).otherwise(F.to_json(F.struct("event_id", "event_type", "v_e2")))
    d = os.path.join(_roundtrip_dir("dirty"), "json")
    ev.select(line.alias("value")).write.mode("overwrite").text(d)
    back = spark.read.schema(
        "event_id long, event_type string, v_e2 long, _corrupt_record string"
    ).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    ).json(d)
    return (
        back.select(
            F.when(F.col("_corrupt_record").isNotNull(), F.lit("__corrupt__"))
            .otherwise(F.col("event_type"))
            .alias("event_type")
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("n_rows"))
    )


X84_SQL = """
SELECT CASE WHEN event_id % 13 = 0 THEN '__corrupt__' ELSE event_type END
         AS event_type,
       COUNT(*) AS n_rows
FROM events GROUP BY 1
"""


def q_x83_filter_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-calibration contingency: decile-bin every document by
    the HEURISTIC quality composite (x8) and by the MODEL score (x52
    char-LM avg log-prob), then count the 10x10 (q_bin, m_bin) cells
    — the agreement matrix that tells a curation team whether the
    cheap heuristic can stand in for the model gate (mass on the
    diagonal) or they disagree and both must run.  Bins ride the
    parallel-position operator; the output is bounded at 100 rows at
    any corpus size."""
    from ..operators.sampling import quantile_bins
    from ..operators.text_analysis import char_lm_scores, quality_score

    docs = _docs(spark, sf_dir)
    qb = quantile_bins(
        quality_score(docs).select("doc_id", "quality_e6"),
        [F.asc("quality_e6"), F.asc("doc_id")],
        10,
    ).select("doc_id", F.col("bin").alias("q_bin"))
    mb = quantile_bins(
        char_lm_scores(docs).select("doc_id", "avg_logp_e6"),
        [F.asc("avg_logp_e6"), F.asc("doc_id")],
        10,
    ).select("doc_id", F.col("bin").alias("m_bin"))
    return (
        qb.join(mb, "doc_id")
        .groupBy("q_bin", "m_bin")
        .agg(F.count("*").alias("n_docs"))
    )


def _x83_sql() -> str:
    from ..operators.text_analysis import CHAR_LM_SQL, QUALITY_SQL

    return f"""
WITH q AS (SELECT doc_id, quality_e6 FROM ({QUALITY_SQL})),
m AS (SELECT doc_id, avg_logp_e6 FROM ({CHAR_LM_SQL})),
nq AS (SELECT COUNT(*) AS n FROM q),
nm AS (SELECT COUNT(*) AS n FROM m),
qb AS (
  SELECT doc_id,
         (ROW_NUMBER() OVER (ORDER BY quality_e6 ASC, doc_id ASC) - 1)
           * 10 // (SELECT n FROM nq) + 1 AS q_bin
  FROM q
),
mb AS (
  SELECT doc_id,
         (ROW_NUMBER() OVER (ORDER BY avg_logp_e6 ASC, doc_id ASC) - 1)
           * 10 // (SELECT n FROM nm) + 1 AS m_bin
  FROM m
)
SELECT CAST(q_bin AS BIGINT) AS q_bin, CAST(m_bin AS BIGINT) AS m_bin,
       COUNT(*) AS n_docs
FROM qb JOIN mb USING (doc_id)
GROUP BY q_bin, m_bin"""


C4_PACK_BUDGET = 256
C4_SHARDS = 4


def q_c4_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-prep capstone: quality gate → fingerprint dedup
    (c1's stages) → concatenate-and-cut packing into 256-token
    sequences (x45's distributed prefix sum) → serpentine
    token-balanced shard manifest over the SEQUENCES (x79's core) —
    one composed Catalyst plan from raw corpus to writer manifest.
    Output: (shard, n_seqs, total_tokens); all sequences are exactly
    budget-sized except the chunk tails, so the manifest proves the
    balancing on near-uniform sizes too."""
    from ..operators.packing import pack_sequences, serpentine_shards
    from ..operators.text_analysis import fingerprint, quality_score

    docs = _docs(spark, sf_dir)
    kept = quality_score(docs).where(
        F.col("quality_e6") >= QUALITY_THR_E6
    ).select("doc_id")
    fp = fingerprint(docs)
    canon_ids = (
        kept.join(fp, "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    curated = docs.join(canon_ids, "doc_id").select("doc_id", "text")
    packed = pack_sequences(curated, budget=C4_PACK_BUDGET)
    return serpentine_shards(packed, "seq_id", "n_tokens", C4_SHARDS).select(
        "shard",
        F.col("n_items").alias("n_seqs"),
        F.col("total_size").alias("total_tokens"),
    )


def _c4_sql() -> str:
    from ..operators.packing import pack_sequences_sql, serpentine_shards_sql
    from ..operators.text_analysis import FINGERPRINT_SQL, QUALITY_SQL

    curated = f"""
SELECT d.doc_id, d.text FROM documents d
JOIN (
  SELECT MIN(k.doc_id) AS doc_id
  FROM (SELECT q.doc_id, f.fp
        FROM ({QUALITY_SQL}) q JOIN ({FINGERPRINT_SQL}) f
          ON q.doc_id = f.doc_id
        WHERE q.quality_e6 >= {QUALITY_THR_E6}) k
  GROUP BY k.fp
) c ON c.doc_id = d.doc_id"""
    packed = pack_sequences_sql(C4_PACK_BUDGET, curated)
    inner = serpentine_shards_sql(packed, "seq_id", "n_tokens", C4_SHARDS)
    return (
        f"SELECT shard, n_items AS n_seqs, total_size AS total_tokens"
        f" FROM ({inner})"
    )


def q_c5_quality_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation capstone a pipeline would ACTUALLY ship (VERDICT
    r09: wire x123 into the end-to-end pass): near-dup quality-aware
    keep-best (x123 — per cluster the HIGHEST-quality member survives,
    not the min-id one) → quality gate on the survivors → c4's
    concatenate-and-cut packing → serpentine token-balanced shard
    manifest, one composed plan over the augmented (duplicate-bearing)
    corpus.  Differs from c4 exactly where a real pipeline differs
    from the toy: dedup is NEAR-dup (catches the mutated copies
    fingerprinting misses) and canonical choice is quality-driven, so
    the packed text is the cleaner variant of every cluster."""
    from ..operators.packing import pack_sequences, serpentine_shards
    from ..operators.text_analysis import quality_score

    docs = dd.augment_docs(_docs(spark, sf_dir))
    kept = dd.dedup_keep_best(docs, quality_score(docs), sha=_sha_base(docs))
    curated_ids = kept.where(
        F.col("is_kept") & (F.col("quality_e6") >= QUALITY_THR_E6)
    ).select("doc_id")
    curated = docs.join(curated_ids, "doc_id").select("doc_id", "text")
    packed = pack_sequences(curated, budget=C4_PACK_BUDGET)
    return serpentine_shards(packed, "seq_id", "n_tokens", C4_SHARDS).select(
        "shard",
        F.col("n_items").alias("n_seqs"),
        F.col("total_size").alias("total_tokens"),
    )


def _c5_sql() -> str:
    from ..operators.dedup import dedup_keep_best_sql
    from ..operators.packing import pack_sequences_sql, serpentine_shards_sql
    from ..operators.text_analysis import quality_sql

    kb = dedup_keep_best_sql(dd.AUGMENT_SQL, quality_sql(dd.AUGMENT_SQL))
    curated = f"""
SELECT d.doc_id, d.text FROM ({dd.AUGMENT_SQL}) d
JOIN (SELECT doc_id FROM ({kb})
      WHERE is_kept AND quality_e6 >= {QUALITY_THR_E6}) k
  ON k.doc_id = d.doc_id"""
    packed = pack_sequences_sql(C4_PACK_BUDGET, curated)
    inner = serpentine_shards_sql(packed, "seq_id", "n_tokens", C4_SHARDS)
    return (
        f"SELECT shard, n_items AS n_seqs, total_size AS total_tokens"
        f" FROM ({inner})"
    )


def q_c6_trained_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full "train the filter, then filter the corpus" loop a real
    curation run executes (VERDICT r10 #7), composing the round-10
    classifier family end to end: x131 perceptron TRAINING (distill
    the x8 composite into the hashed linear model — integer-exact,
    ≤4096 gradient rows/round to the driver) → x129 scoring of the
    whole corpus under the TRAINED model → the x130 calibration
    relation as a broadcast dimension (per-source n_docs / Σscore),
    gating each doc at its source's MEAN score via the integer-exact
    cross-multiplied inequality score·n ≥ Σscore (no division, no ulp
    risk) → x132's α=0.5 budgeted top-score mix over the survivors →
    c4's concatenate-and-cut packing → serpentine token-balanced shard
    manifest.  Output: (shard, n_seqs, total_tokens).

    Scale shape: training featurizes the corpus once (persisted);
    scoring is explode → broadcast model join (the corpus never
    shuffles); the scored relation is eagerly localCheckpoint-ed
    because calibration, the gate, and the mix's four passes all scan
    it; everything downstream runs on the curated subset."""
    from ..operators.packing import pack_sequences, serpentine_shards
    from ..operators.sampling import quality_budget_mix
    from ..operators.text_analysis import classifier_score, perceptron_train

    docs = _docs(spark, sf_dir)
    model = perceptron_train(docs)
    scored = (
        docs.select("doc_id", "source")
        .join(
            classifier_score(docs, model).select("doc_id", "score_e6"),
            "doc_id",
        )
        .localCheckpoint(eager=True)
    )
    calib = scored.groupBy("source").agg(
        F.count("*").alias("__c6_n"),
        F.sum("score_e6").alias("__c6_sum"),
    )
    gated = (
        scored.join(F.broadcast(calib), "source")
        .where(F.col("score_e6") * F.col("__c6_n") >= F.col("__c6_sum"))
        .select("doc_id", "source", "score_e6")
    )
    kept = quality_budget_mix(gated, "source", "score_e6", "doc_id")
    curated = docs.join(kept.select("doc_id"), "doc_id").select(
        "doc_id", "text"
    )
    packed = pack_sequences(curated, budget=C4_PACK_BUDGET)
    return serpentine_shards(packed, "seq_id", "n_tokens", C4_SHARDS).select(
        "shard",
        F.col("n_items").alias("n_seqs"),
        F.col("total_size").alias("total_tokens"),
    )


def _c6_sql() -> str:
    from ..operators.packing import pack_sequences_sql, serpentine_shards_sql
    from ..operators.sampling import quality_budget_mix_sql
    from ..operators.text_analysis import (
        classifier_score_sql,
        perceptron_train_sql,
    )

    score = classifier_score_sql(
        weights_sql=f"SELECT * FROM ({perceptron_train_sql()})"
    )
    gated = f"""
WITH __scored AS MATERIALIZED (
  SELECT d.doc_id, d.source, s.score_e6
  FROM documents d JOIN ({score}) s USING (doc_id)
)
SELECT t.doc_id, t.source, t.score_e6
FROM __scored t JOIN (
  SELECT source, COUNT(*) AS n, CAST(SUM(score_e6) AS BIGINT) AS sm
  FROM __scored GROUP BY source
) c USING (source)
WHERE t.score_e6 * c.n >= c.sm"""
    kept = quality_budget_mix_sql(
        gated,
        "source",
        "score_e6",
        "doc_id",
        out_cols="doc_id, source, score_e6",
    )
    curated = f"""
SELECT d.doc_id, d.text FROM documents d
JOIN ({kept}) k ON k.doc_id = d.doc_id"""
    packed = pack_sequences_sql(C4_PACK_BUDGET, curated)
    inner = serpentine_shards_sql(packed, "seq_id", "n_tokens", C4_SHARDS)
    return (
        f"SELECT shard, n_items AS n_seqs, total_size AS total_tokens"
        f" FROM ({inner})"
    )


def _c1_sql() -> str:
    from ..operators.text_analysis import FINGERPRINT_SQL, QUALITY_SQL

    return f"""
WITH q AS ({QUALITY_SQL}),
f AS ({FINGERPRINT_SQL}),
kept AS (
  SELECT q.doc_id, q.n_chars, f.fp FROM q JOIN f ON q.doc_id = f.doc_id
  WHERE q.quality_e6 >= {QUALITY_THR_E6}
),
canon AS (
  SELECT k.doc_id, k.n_chars
  FROM (SELECT fp, MIN(doc_id) AS doc_id FROM kept GROUP BY fp) c
  JOIN kept k ON k.doc_id = c.doc_id
)
SELECT {hash_split_sql("doc_id")} AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM canon
GROUP BY 1"""


def q_x104_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted sample without replacement (Efraimidis-
    Spirakis, weight = n_chars — 'sample tokens, not documents');
    selection is a pure md5 function of doc_id, so retries and
    re-layouts agree row-for-row."""
    from ..operators.sampling import weighted_sample_per_group

    return weighted_sample_per_group(_docs(spark, sf_dir))


def q_x46_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size deterministic uniform sample via bottom-k hash —
    TakeOrderedAndProject (per-partition top-k + driver merge), never
    a full sort/shuffle."""
    return bottom_k_sample(_docs(spark, sf_dir), "doc_id", k=100).select(
        "doc_id", "source"
    )


def q_x47_groupwise_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced per-source sample: 20 deterministic docs per source —
    one group shuffle + streaming rank window, skew-proof output size."""
    return bottom_k_per_group(
        _docs(spark, sf_dir), "source", "doc_id", k=20
    ).select("source", "doc_id")


def q_x45_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-then-chunk packing of documents into 4096-token
    training sequences — distributed prefix sum (range partitions +
    broadcast offsets), no single-partition global window."""
    return pack_sequences(_docs(spark, sf_dir))


def q_x48_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-context chunking: overlapping 128-token windows at
    stride 96 per document — per-document column expressions only, so
    the fan-out partitions embarrassingly at any corpus size."""
    return chunk_windows(_docs(spark, sf_dir))


def q_x49_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted source interleave (the training-order
    schedule for a mixture corpus): weights 1-4 derived from the
    source id; positions via the range-partitioned parallel counter,
    never a single-partition global window."""
    return curriculum_order(
        _docs(spark, sf_dir),
        "source",
        "doc_id",
        weight=F.expr(f"CAST(substring(source, 4) AS INT) % 4 + 1"),
    )


def q_x50_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin mergeable histogram over events.value — bounded
    O(nbins) state (the 100 TB distribution-monitoring path next to
    exact-sort percentiles); sketch content hash-checked bin by bin."""
    from ..operators.sketches import value_histogram

    return value_histogram(load_table(spark, sf_dir, "events"), "value")


def q_x59_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by lift (observed / expected-under-
    independence): two vocab-sized aggregates + word-keyed joins +
    TakeOrdered top-k — the tokenizer-phrase-candidate miner."""
    from ..operators.text_analysis import bigram_lift

    return bigram_lift(_docs(spark, sf_dir))


def q_x60_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (paragraph-grain) exact dedup over the augmented
    corpus: every distinct 10-token window survives only at its
    globally-first occurrence.  Wide stages move md5 digests, not
    text."""
    return dd.paragraph_dedup(dd.augment_docs(_docs(spark, sf_dir)))


def q_x62_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the corpus-trained BPE merge table back to the corpus:
    per-document token and subword totals.  The fold happens once per
    DISTINCT word during training; encoding is a word-keyed join."""
    from ..operators.bpe import bpe_encode_counts

    return bpe_encode_counts(_docs(spark, sf_dir))


def q_x89_persisted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup index as a DURABLE artifact: the existing corpus's
    LSH band table is written to parquet, read back, and an incoming
    batch is screened against the STORED index — the result must
    hash-match x56's recompute-everything oracle, proving the index
    survives storage byte-exactly (band keys are pure functions of
    the text).  This is the production ingest shape: sketch the corpus
    once, persist the index, pay only new x stored-index joins per
    batch."""
    import os

    from ..operators.dedup import band_table, minhash_signatures

    aug = dd.augment_docs(_docs(spark, sf_dir))
    new = aug.where(F.col("doc_id") >= dd.NEAR_DUP_OFFSET)
    existing = aug.where(F.col("doc_id") < dd.NEAR_DUP_OFFSET)
    bands = band_table(minhash_signatures(dd.shingles(existing)))
    d = os.path.join(_roundtrip_dir("dedupindex"), "bands")
    # REBALANCE before the write (guide §6): AQE sizes the output
    # partitions to the advisory target, so the stored index is a few
    # well-sized files instead of one shard per shuffle partition —
    # the read-back side then lists/opens that many files per screen
    bands.hint("rebalance").write.mode("overwrite").parquet(d)
    stored = spark.read.parquet(d)
    return dd.incremental_near_dups(existing, new, index=stored)


def q_x91_index_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The durable dedup index across REPEATED ingests (x89's missing
    write path): build the index on the base corpus, persist it, screen
    batch 1, APPEND batch 1's bands into the stored index
    (union + distinct compaction, re-persisted), then screen batch 2
    against the UPDATED stored artifact.  The batch-2 result must
    hash-match a recompute-everything oracle over (base + batch 1) —
    proving the append/compact step preserves exactly the index a full
    rebuild would produce."""
    import os

    from ..operators.dedup import (
        band_table,
        minhash_signatures,
        update_band_index,
    )

    aug = dd.augment_docs(_docs(spark, sf_dir))
    existing = aug.where(F.col("doc_id") < dd.NEAR_DUP_OFFSET)
    batch1 = aug.where(
        (F.col("doc_id") >= dd.NEAR_DUP_OFFSET) & (F.col("doc_id") % 2 == 0)
    )
    batch2 = aug.where(
        (F.col("doc_id") >= dd.NEAR_DUP_OFFSET) & (F.col("doc_id") % 2 == 1)
    )
    root = _roundtrip_dir("dedupindex_compact")
    d0 = os.path.join(root, "v0")
    # REBALANCE both persisted index versions (guide §6): output files
    # come out advisory-sized instead of one per shuffle partition,
    # and every later screen re-reads this artifact
    band_table(minhash_signatures(dd.shingles(existing))).hint(
        "rebalance"
    ).write.mode("overwrite").parquet(d0)
    stored0 = spark.read.parquet(d0)
    # ingest batch 1: screen (result unused here — x56/x89 cover it),
    # then append its bands into the stored artifact
    d1 = os.path.join(root, "v1")
    update_band_index(stored0, batch1).hint("rebalance").write.mode(
        "overwrite"
    ).parquet(d1)
    stored1 = spark.read.parquet(d1)
    return dd.incremental_near_dups(
        existing.unionAll(batch1), batch2, index=stored1
    )


def q_x87_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: subwords-per-word under the
    corpus-trained BPE (x62's encoder), the metric that tells a
    tokenizer team which languages pay the most subword overhead —
    the per-lang mean is an exact integer ratio quantized once.
    Reuses the trained encoder end-to-end; one extra doc-keyed join
    onto lang + a |langs|-row aggregate."""
    from ..operators.bpe import bpe_encode_counts

    docs = _docs(spark, sf_dir)
    enc = bpe_encode_counts(docs)
    return (
        enc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_subwords").alias("n_subwords"),
        )
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "n_subwords",
            F.floor(
                F.col("n_subwords").cast("double")
                / F.col("n_tokens").cast("double")
                * 1e6
                + F.lit(0.5000001)
            )
            .cast("long")
            .alias("fertility_e6"),
        )
    )


def _x87_sql() -> str:
    from ..operators.bpe import bpe_encode_sql

    return f"""
WITH enc AS ({bpe_encode_sql()})
SELECT d.lang, COUNT(*) AS n_docs,
       CAST(SUM(e.n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(e.n_subwords) AS BIGINT) AS n_subwords,
       CAST(FLOOR(CAST(SUM(e.n_subwords) AS DOUBLE)
                  / CAST(SUM(e.n_tokens) AS DOUBLE) * 1e6 + 0.5000001)
            AS BIGINT) AS fertility_e6
FROM enc e JOIN documents d ON d.doc_id = e.doc_id
GROUP BY d.lang"""


def q_x88_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup business case in one row: bytes the near-dup
    clustering (x33) would delete — non-canonical cluster members'
    text bytes over the augmented corpus — as counts, byte totals, and
    the savings ratio.  Pure composition: the cluster relation joined
    once against byte lengths, two bounded aggregates."""
    aug = dd.augment_docs(_docs(spark, sf_dir))
    clusters = dd.dedup_clusters(aug, sha=_sha_base(aug))
    sized = clusters.join(
        aug.select(
            "doc_id",
            F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("nbytes"),
        ),
        "doc_id",
    )
    return sized.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(~F.col("is_canonical"), 1).otherwise(0))
        .cast("long")
        .alias("n_dropped"),
        F.sum("nbytes").alias("bytes_total"),
        F.sum(F.when(~F.col("is_canonical"), F.col("nbytes")).otherwise(0))
        .cast("long")
        .alias("bytes_dropped"),
    ).select(
        "n_docs",
        "n_dropped",
        "bytes_total",
        "bytes_dropped",
        F.floor(
            F.col("bytes_dropped").cast("double")
            / F.col("bytes_total").cast("double")
            * 1e6
            + F.lit(0.5000001)
        )
        .cast("long")
        .alias("savings_e6"),
    )


def _x88_sql() -> str:
    return f"""
WITH cl AS ({dd.dedup_clusters_sql(dd.AUGMENT_SQL)}),
aug AS ({dd.AUGMENT_SQL}),
sized AS (
  SELECT cl.doc_id, cl.is_canonical,
         octet_length(CAST(aug.text AS BLOB)) AS nbytes
  FROM cl JOIN aug ON aug.doc_id = cl.doc_id
)
SELECT COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN NOT is_canonical THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       CAST(SUM(nbytes) AS BIGINT) AS bytes_total,
       CAST(SUM(CASE WHEN NOT is_canonical THEN nbytes ELSE 0 END) AS BIGINT)
         AS bytes_dropped,
       CAST(FLOOR(CAST(SUM(CASE WHEN NOT is_canonical THEN nbytes ELSE 0 END)
                       AS DOUBLE)
                  / CAST(SUM(nbytes) AS DOUBLE) * 1e6 + 0.5000001) AS BIGINT)
         AS savings_e6
FROM sized"""


def q_x63_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment screen (|A∩B| / min set size) over rare-shingle
    blocked candidates: catches subset-duplication whose Jaccard —
    and therefore whose minhash-LSH hit rate — is arbitrarily low
    (the quoted-wholesale case)."""
    return dd.containment_pipeline(dd.augment_docs(_docs(spark, sf_dir)))


def q_x61_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """alpha = 0.5 temperature rebalancing of the language mixture
    (head language downsampled toward the tail): data-derived
    per-group keep-thresholds, md5-deterministic membership.  Audit
    view: (grp, n_before, thr, n_after)."""
    from ..operators.sampling import temperature_mix_summary

    return temperature_mix_summary(_docs(spark, sf_dir), "lang", "doc_id")


def q_x76_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary cardinality via the KMV bottom-k-hash
    sketch, plus the merged '__ALL__' row built ONLY from the
    per-source sketches — the distributed-combine law (x73's HLL
    shard-merge story) for the third cardinality tool.  The window
    ranks distinct hashes, never corpus rows; the merge input is
    <= n_sources * k rows.  A source with < k distinct words is
    exact by construction.  two_phase: the hash-space threshold
    prefilter — only md5 values in the bottom 1/16 of the space reach
    the distinct exchange (non-survivors collapse map-side to one
    NULL marker per partition), so the vocabulary-sized shuffle the
    sf10 decade exposed (mutated replicas grow the vocabulary with
    the corpus: 38.4 s single-phase at sf10) becomes a vocab/16
    exchange; sources not proven (>= k distinct survivors) fall back
    to the exact unfiltered path, so toy vocabularies cost one extra
    scan and huge ones never touch it.

    two_phase is passed UNCONDITIONALLY here — an explicit choice
    (VERDICT r09 #5): on the shipped sf0.1 corpus (31-word vocab,
    always < k survivors) the probe + exact fallback costs a measured
    ~1.5 s premium over single-phase, which we accept to keep the
    registry entry exercising the 100-TB posture every round; on the
    vocab-growth decade (sf10_vg, ~1.8M spellings) every source takes
    the PROVEN branch and the premium inverts."""
    from ..functions.textops import strip_non_alpha, tokens
    from ..operators.sketches import kmv_estimates, kmv_merge, kmv_sketch

    words = (
        _docs(spark, sf_dir)
        .select(
            "source",
            F.explode(tokens(strip_non_alpha(F.col("text")))).alias("word"),
        )
        .where(F.col("word") != "")
    )
    sk = kmv_sketch(
        words, key="word", group_col="source", two_phase=True
    ).persist()
    out = kmv_estimates(sk.unionAll(kmv_merge(sk))).select(
        F.col("grp").alias("source"), "n_kept", "est_distinct"
    )
    return out


def _x76_sql() -> str:
    from ..operators.sketches import kmv_estimates_sql

    pairs = """
SELECT source AS grp,
       unnest(list_filter(
         string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
         t -> t != '')) AS key
FROM documents"""
    return (
        f"SELECT grp AS source, n_kept, est_distinct FROM ("
        f"{kmv_estimates_sql(pairs)})"
    )


def q_x81_join_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key join fan-out audit for lineitem x orders on orderkey:
    the top-10 keys by OUTPUT rows (left count x right count) plus
    each key's share of the total join size — the exact-key complement
    of x43's CMS total estimate, and the skew diagnosis you run BEFORE
    a big join to decide whether to salt (x16).  Two bounded
    per-key aggregates + a key equi-join of the two count relations
    (each <= distinct keys); top-10 is TakeOrdered, never a full
    sort."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lc = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count("*").alias("nl")
    )
    oc = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count("*").alias("nr")
    )
    prod = lc.join(oc, "k").select(
        "k", "nl", "nr", (F.col("nl") * F.col("nr")).alias("out_rows")
    )
    total = prod.agg(F.sum("out_rows").alias("tot"))
    return (
        prod.crossJoin(F.broadcast(total))
        .select(
            "k",
            "nl",
            "nr",
            "out_rows",
            F.floor(
                F.col("out_rows").cast("double") / F.col("tot") * 1e6
                + F.lit(0.5000001)
            )
            .cast("long")
            .alias("share_e6"),
        )
        .orderBy(F.desc("out_rows"), F.asc("k"))
        .limit(10)
    )


X81_SQL = """
WITH lc AS (SELECT l_orderkey AS k, COUNT(*) AS nl FROM lineitem GROUP BY 1),
oc AS (SELECT o_orderkey AS k, COUNT(*) AS nr FROM orders GROUP BY 1),
prod AS (SELECT lc.k, nl, nr, nl * nr AS out_rows FROM lc JOIN oc ON lc.k = oc.k),
tot AS (SELECT SUM(out_rows) AS tot FROM prod)
SELECT k, nl, nr, out_rows,
       CAST(FLOOR(CAST(out_rows AS DOUBLE) / tot * 1e6 + 0.5000001) AS BIGINT)
         AS share_e6
FROM prod CROSS JOIN tot
ORDER BY out_rows DESC, k ASC LIMIT 10
"""


def q_x80_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold sweep: surviving pair / affected-doc counts
    at Jaccard cuts 0.5..0.9 from ONE verify pass (grid broadcast onto
    the pair relation) — the evidence for choosing the cut before the
    destructive dedup runs at scale."""
    return dd.dedup_threshold_curve(
        dd.shingles(dd.augment_docs(_docs(spark, sf_dir)))
    )


def _x80_sql() -> str:
    return dd.dedup_threshold_curve_sql(dd.AUGMENT_SQL)


def q_x79_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced output-shard manifest (serpentine deal on the
    by-length rank; distributed parallel positions) — writer planning
    for near-equal training shard files under heavy-tailed document
    lengths."""
    from ..operators.packing import shard_manifest

    return shard_manifest(_docs(spark, sf_dir))


def _x79_sql() -> str:
    from ..operators.packing import shard_manifest_sql

    return shard_manifest_sql()


def q_z16_stream_index_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest screened against the DURABLE dedup index via
    ``foreachBatch`` — the production sink pattern's first registered
    use: each micro-batch of incoming documents (the augmented copies,
    derived in-stream) runs the batch incremental screen (x56's op)
    against the STORED band-table artifact and appends its verified
    near-dup pairs to parquet.  The drained union across batches must
    hash-match x56's recompute-everything oracle: per-doc screens are
    independent, so any micro-batch partitioning of the incoming set
    drains to the same pair relation."""
    import os

    from ..operators.dedup import band_table, minhash_signatures
    from ..streaming.events import (
        read_document_stream,
        run_foreach_batch,
        stage_table_dir,
    )

    existing = _docs(spark, sf_dir).select("doc_id", "text")
    d_idx = os.path.join(_roundtrip_dir("z16index"), "bands")
    band_table(minhash_signatures(dd.shingles(existing))).write.mode(
        "overwrite"
    ).parquet(d_idx)
    stored = spark.read.parquet(d_idx)

    stream = read_document_stream(
        spark, stage_table_dir(sf_dir, "documents")
    )
    near = stream.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + dd.NEAR_DUP_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(dd.NEAR_DUP_TAIL)).alias("text"),
    )
    exact = stream.where(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + dd.EXACT_DUP_OFFSET).alias("doc_id"), "text"
    )
    incoming = near.unionByName(exact)

    # per-CALL output (batches append into it): wipe before draining,
    # or a second call in the same process would double the pairs
    import shutil

    out_dir = os.path.join(_roundtrip_dir("z16out"), "pairs")
    shutil.rmtree(out_dir, ignore_errors=True)

    def screen(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        dd.incremental_near_dups(
            existing, batch_df, index=stored
        ).write.mode("append").parquet(out_dir)

    run_foreach_batch(incoming, screen)
    if not os.path.exists(out_dir):  # no incoming docs at all
        return spark.createDataFrame(
            [], "new_doc long, existing_doc long, jaccard_e6 long"
        )
    return spark.read.parquet(out_dir)


def q_z14_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup under REAL duplication: the staged events
    directory is read by TWO file-source streams unioned (every
    event_id arrives twice), `dropDuplicatesWithinWatermark` keeps one
    copy with watermark-bounded state, and the drained per-type counts
    must equal the single-copy batch counts — proving the dedup state
    works, not that the input was accidentally unique."""
    from ..streaming.events import (
        read_event_stream,
        run_available_now,
        stage_table_dir,
        stream_dedup,
    )

    d = stage_table_dir(sf_dir)
    doubled = read_event_stream(spark, d).union(read_event_stream(spark, d))
    stream = stream_dedup(doubled).select("event_id", "event_type")
    drained = run_available_now(stream, "t_z14_dedup", output_mode="append")
    return drained.groupBy("event_type").agg(F.count("*").alias("n_events"))


Z14_SQL = """
SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY event_type
"""


def q_x106_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confident-learning label QA: own label vs k-NN majority label
    for a bounded audit sample (broadcast to the collection scan, the
    x5 shape); disagreement flags likely mislabels before training."""
    from ..operators.similarity import label_noise_audit

    return label_noise_audit(load_table(spark, sf_dir, "embeddings"))


def q_x107_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII exposure audit (emails / IPv4 / phones) over the
    deterministically PII-augmented corpus: regexp_count column
    expressions + one map-side-combinable per-source aggregate — zero
    joins; non-injected docs are true negatives the patterns must not
    fire on."""
    from ..operators.text_analysis import pii_augment, pii_scan

    return pii_scan(pii_augment(_docs(spark, sf_dir)))


def q_x108_setsim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.7 shingle-set join via AllPairs/PPJoin prefix
    filtering (rarest-first global order; complete by the prefix-filter
    theorem) — the deterministic complement to MinHash.  Oracle derives
    the same pair set from the FULL inverted index, proving the prefix
    filter dropped nothing."""
    from ..operators.dedup import setsim_join

    docs = dd.augment_docs(_docs(spark, sf_dir))
    return setsim_join(docs, sha=_sha_base(docs))


def q_x109_winnow_fingerprints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer et al., the MOSS
    algorithm): per-window minimal k-gram hash, rightmost on ties —
    the position-robust substring fingerprint index (any shared run of
    >= w + k - 1 tokens shares a fingerprint).  Per-doc windows only:
    no cross-doc shuffle anywhere."""
    from ..operators.text_analysis import winnow_fingerprints

    return winnow_fingerprints(_docs(spark, sf_dir))


def q_x110_dup_span_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Duplicated-span coverage (Lee et al. 2022 exact-substring-dedup
    diagnostic): fraction of each doc's token positions covered by a
    corpus-repeated n-gram — catches near-verbatim repeats that
    whole-doc digests miss.  Runs on the augmented corpus so repeated
    spans exist by construction."""
    from ..operators.text_analysis import dup_span_coverage

    return dup_span_coverage(dd.augment_docs(_docs(spark, sf_dir)))


def q_x115_audio_contour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio energy-contour fingerprint (the aHash analog for PCM):
    per-window integer energy over the REAL decoded WAV samples, one
    bit per adjacent window pair — loudness-profile matching, stage 1
    of audio near-dup.  Oracle replays the generative sample formula."""
    from ..operators.multimodal import audio_contour, binarize_audio

    return audio_contour(binarize_audio(_docs(spark, sf_dir)))


def q_x117_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (the IVF-PQ codebook path): M=2
    per-subspace codebooks via the deterministic seeded Lloyd, vectors
    compressed to M codes, queries answered by the ADC table-lookup
    sum — the representation that turns a 10⁹×256-byte scan into a
    10⁹×M-byte scan.  Codebooks/tables broadcast; the collection never
    shuffles; oracle replays the unrolled per-subspace trajectory."""
    from ..operators.similarity import pq_topk

    return pq_topk(load_table(spark, sf_dir, "embeddings"))


def q_x116_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the production MinHash/LSH near-dup pipeline
    (x4: 12 hashes, 4 bands) against EXACT ground truth — the salted
    AllPairs join (x108) run at x4's own threshold (J >= 1/2).  x72
    compares two approximations to each other; this one compares
    against the deterministic-complete truth, which is what you
    actually need before trusting a band config at production scale
    (the x78 ANN-recall pattern applied to dedup).  Both sides are the
    existing candidate-bounded pipelines; the audit itself is one
    pair-keyed left join + one scalar row."""
    from ..operators.dedup import setsim_join

    docs = dd.augment_docs(_docs(spark, sf_dir))
    sha = _sha_base(docs)
    exact = setsim_join(docs, num=1, den=2, sha=sha).select("doc_a", "doc_b")
    lsh = (
        dd.near_dup_pipeline(docs, sha=sha)
        .select("doc_a", "doc_b")
        .withColumn("_hit", F.lit(1))
    )
    return (
        exact.join(lsh, ["doc_a", "doc_b"], "left")
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_found"),
            (F.count("*") - F.coalesce(F.sum("_hit"), F.lit(0)))
            .cast("long")
            .alias("n_missed"),
            F.when(F.count("*") == 0, F.lit(1_000_000).cast("long"))
            .otherwise(
                F.floor(
                    F.coalesce(F.sum("_hit"), F.lit(0)).cast("double")
                    / F.count("*")
                    * 1e6
                    + F.lit(0.5000001)
                ).cast("long")
            )
            .alias("recall_e6"),
        )
    )


def q_x112_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image hash (aHash): real BMP raster byte-walk in
    mapInPandas → integer ITU-601 luma → exact-integer mean threshold
    → 1 bit/pixel in stored order.  The oracle replays the generative
    pixel formula, so assembly, padding, decode AND thresholding must
    all agree bit-for-bit."""
    from ..operators.multimodal import ahash_images, binarize_raster

    return ahash_images(binarize_raster(_docs(spark, sf_dir)))


def q_x113_winnow_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Substring-level contamination screen composing x109: winnow
    fingerprints over the augmented corpus, then join the held-out
    side's fingerprints (the near-dup copies — planted 'eval leaks')
    against the training side's on the fp key.  The winnowing
    guarantee makes this complete for any shared run of >= w + k - 1
    tokens; pairs need >= 2 shared fingerprints to fire (noise floor).
    Scale shape: one fp-keyed SHUFFLE join — fp keys are md5-uniform
    so the join is skew-free at any eval-set size (here the held-out
    side is ~10% of the corpus; when the eval side is a genuinely
    small benchmark suite, AQE broadcasts it automatically — never
    force a broadcast of a corpus-proportional relation)."""
    from ..operators.text_analysis import winnow_fingerprints

    fps = winnow_fingerprints(dd.augment_docs(_docs(spark, sf_dir)))
    train = fps.where(F.col("doc_id") < dd.NEAR_DUP_OFFSET).select(
        F.col("doc_id").alias("train_doc"), "fp"
    )
    ev = fps.where(F.col("doc_id") >= dd.NEAR_DUP_OFFSET).select(
        F.col("doc_id").alias("eval_doc"), "fp"
    )
    return (
        train.join(ev, "fp")
        .groupBy("train_doc", "eval_doc")
        .agg(F.countDistinct("fp").alias("n_shared"))
        .where(F.col("n_shared") >= 2)
    )


def q_x118_exact_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT-span contamination screen (the fixed-length k-gram
    variant of x113, VERDICT r07 #5): every 6-token gram hashed — no
    winnowing sampling, so shared spans BELOW the 8-token winnow
    guarantee floor (which x113 can sample away) fire
    deterministically.  Same train/eval split as x113; boilerplate
    grams (train-df > 64) excluded, which also bounds the gram join's
    per-key fan-out at any corpus size (the x108 hot-key discipline,
    here semantically correct: a phrase in 65+ training docs is
    boilerplate, not leakage)."""
    from ..operators.text_analysis import exact_contamination

    return exact_contamination(
        dd.augment_docs(_docs(spark, sf_dir)), dd.NEAR_DUP_OFFSET
    )


def q_x119_lsh_band_frontier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LSH band-config frontier (VERDICT r07 #6): the x116 recall
    audit swept over every divisor slicing of the 12-hash MinHash
    signature — (2 bands × 6 rows) … (12 × 1) — each row reporting
    candidate volume AND recall against the same exact AllPairs truth.
    The tuning tool you run before committing a banding to a 100-TB
    dedup pass; the shipped (4, 3) config appears as one frontier row
    and must reproduce x116's recall.  Signatures computed once and
    exploded per-config — one tall band relation, not |configs| plan
    branches over the corpus."""
    from ..operators.dedup import lsh_band_frontier

    docs = dd.augment_docs(_docs(spark, sf_dir))
    return lsh_band_frontier(docs, sha=_sha_base(docs))


def q_x120_cross_source_dups(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-source duplication matrix: verified near-dup pairs
    aggregated to one row per unordered source pair — the "is source B
    a mirror of source A" audit that decides source-level drops
    before any per-doc dedup pass.  Pairs ride the candidate-bounded
    LSH pipeline; source attribution is two id-keyed shuffle joins;
    output bounded by |sources|²."""
    from ..operators.dedup import cross_source_dups

    docs = _docs(spark, sf_dir)
    aug = dd.augment_docs(docs.select("doc_id", "text"))
    pairs = dd.near_dup_pipeline(aug, sha=_sha_base(aug))
    return cross_source_dups(docs, pairs)


def q_x121_gram_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication spectrum (Lee et al. memorization analysis): how
    many distinct 5-grams occur 1x, 2-3x, 4-7x, ... and the total
    occurrences per bucket — the before/after evidence for a dedup
    pass and the cheap screen for whether exact-span dedup is worth
    running.  One map-side-combinable gram agg + a <= 64-row bucket
    agg; MSB bucketing is pure integer (the w8 discipline).  Runs on
    the augmented corpus so the duplicated mass is visible."""
    from ..operators.text_analysis import gram_spectrum

    return gram_spectrum(dd.augment_docs(_docs(spark, sf_dir)))


def q_x122_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-dedup sampling weights: every document weighted
    1/|its near-dup cluster| (singletons 1.0) — the down-weight-not-
    drop curation strategy; a cluster's total sampling mass equals one
    document's.  Inherits x33's pair-graph fixpoint + one map-side-
    combinable size agg + one join back."""
    from ..operators.dedup import dedup_weights

    docs = dd.augment_docs(_docs(spark, sf_dir))
    return dedup_weights(docs, sha=_sha_base(docs))


def q_x123_quality_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection (VERDICT r08 #4): per near-dup
    cluster keep the member with the HIGHEST x8 quality score (tie:
    min doc_id) instead of x33's arbitrary min-id — the rule a real
    curation pipeline ships (near-dup copies here carry an appended
    tail, so the kept doc is frequently NOT the min-id one: the
    composite favours the longer variant).  Fixpoint on the pair graph
    only; argmax is one canonical_id-keyed window over uniform keys."""
    from ..operators.text_analysis import quality_score

    docs = dd.augment_docs(_docs(spark, sf_dir))
    return dd.dedup_keep_best(
        docs, quality_score(docs), sha=_sha_base(docs)
    )


def q_x124_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket-occupancy audit: per band, bucket count, max bucket
    size, multi-doc buckets, and the pair-enumeration bound Σ C(sz,2)
    — the pre-flight check before a production LSH pass (x3/x4's
    per-bucket collect_list has O(max_bucket) task state; this audit
    is a pure two-level aggregate, safe at any skew) and the signal
    for arming lsh_candidates' max_bucket fuse."""
    docs = dd.augment_docs(_docs(spark, sf_dir))
    return dd.lsh_bucket_stats(dd.minhash_signatures(dd.shingles(docs)))


def q_x125_frontier_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x119's band-config frontier in its 100-TB posture (VERDICT r09):
    the ENTIRE audit — signatures, bandings, and the exact AllPairs
    truth side (the one super-linear term) — runs over the
    deterministic 1/4 md5 document sample, so the audit's cost scales
    with the sample while per-config recall stays an unbiased estimate
    of the full corpus's (a true pair survives iff both members do,
    uniformly at the document grain).  The shared shingle base is
    materialized AFTER the sample filter (frontier_sample), so the
    tokenize pass too is 1/4-sized — the shape a production pre-flight
    would ship."""
    from ..operators.dedup import frontier_sample, lsh_band_frontier

    docs = dd.augment_docs(_docs(spark, sf_dir))
    return lsh_band_frontier(
        docs, sha=_sha_base(frontier_sample(docs, 4)), sample_den=4
    )


def q_x126_variant_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-variant-index occupancy audit for the SymSpell blocking
    (x58) — x124's pre-flight discipline applied to the fuzzy-join
    family.  sum_pairs is the exact candidate-join row count x58 will
    produce; the r10 vocab-growth decade measured it at 255M for a
    188k-word vocabulary (vs 82k for the 31-word shipped corpus), which
    is what made x58 the decade's one superlinear-looking query until
    its join parallelism was pinned.  Pure two-level aggregate — no
    join, safe at any skew."""
    from ..operators.fuzzy import variant_bucket_stats

    return variant_bucket_stats(_docs(spark, sf_dir))


def _x126_sql() -> str:
    from ..operators.fuzzy import variant_bucket_stats_sql

    return variant_bucket_stats_sql()


_X133_SAMPLE_DEN = 8


def q_x133_variant_stats_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sampled delete-variant pre-flight (VERDICT r10 #4): x126's
    sum_pairs audit run on a deterministic 1/8 md5 word sample, with
    est_sum_pairs = sampled Σ C(sz,2) · den² the unbiased estimate of
    the exact candidate bill — the x125 sampled-frontier pattern
    applied to the variant index, so the pre-flight itself stays
    100x-runnable (the exact x126 audit enumerates the full variant
    index: 64 s at sf10_vg and growing with the vocabulary; the
    sampled form's explode is den× smaller end to end).  Estimator
    tolerance is pinned by test on a synthetic few-thousand-word
    vocabulary (plus den=1 EXACT equality); note the shipped
    replica-mode testdata has only ~31 distinct words, so this
    registered row is a degenerate-sample demonstration — the n_words
    column makes that observable — while the operator's target regime
    is measured on the vocab-growth decades (est within 0.08 % of the
    exact bill at sf1_vg, 0.002 % at sf10_vg; SCALING.md)."""
    from ..operators.fuzzy import variant_bucket_stats

    return variant_bucket_stats(
        _docs(spark, sf_dir), sample_den=_X133_SAMPLE_DEN
    )


def _x133_sql() -> str:
    from ..operators.fuzzy import variant_bucket_stats_sql

    return variant_bucket_stats_sql(sample_den=_X133_SAMPLE_DEN)


def q_x135_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-normalized fingerprint dedup (r11): exact-duplicate
    election over the vocab_normalize-mapped token stream — docs that
    differ only by spelling noise dedup together where raw
    fingerprinting sees distinct hashes.  The fingerprint is a
    position-keyed additive 40-bit-md5 sum, so the per-doc reduction
    is a map-side-combinable aggregate (no collect_list, no token
    arrays on any executor) — the whole fuzzy family's end use in one
    composed plan."""
    from ..operators.fuzzy import normalized_fingerprint_dedup

    return normalized_fingerprint_dedup(_docs(spark, sf_dir))


def _x135_sql() -> str:
    from ..operators.fuzzy import normalized_fingerprint_dedup_sql

    return normalized_fingerprint_dedup_sql()


def q_x136_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie et al. 2023): select the raw-
    pool docs whose hashed-bigram distribution best matches the
    src0-src3 target domain, via Gumbel-top-k over e6-quantized
    importance log-weights.  Model = fixed 4096-row broadcast;
    selection = TakeOrderedAndProject — the corpus side pays one
    feature pass and one doc_id aggregate, never a global window."""
    from ..operators.sampling import dsir_resample

    return dsir_resample(_docs(spark, sf_dir))


def _x136_sql() -> str:
    from ..operators.sampling import dsir_resample_sql

    return dsir_resample_sql()


def q_x137_embedding_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-level decontamination: every training vector's
    argmax-cosine eval-set neighbor + threshold flag — catches
    PARAPHRASED benchmark leakage the token-level audits (x54/x113/
    x118) cannot see.  Eval matrix is a driver-collected constant
    (benchmark-sized); the corpus side is ONE mapInPandas scan with
    zero shuffles, numpy fold bit-identical to the SQL twin."""
    from ..operators.similarity import embedding_contamination

    return embedding_contamination(load_table(spark, sf_dir, "embeddings"))


def q_z22_stream_dsir_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DSIR scoring at ingest (r11): the document stream is
    scored per micro-batch against the importance model FIT ONCE on
    the static snapshot (the z20/z5 slowly-changing-dimension
    discipline) via ``foreachBatch``.  Per-doc scores are independent,
    so the drained union hash-matches batch dsir_score at ANY
    micro-batch partitioning — this streaming op carries the FULL
    value-hash SQL oracle, not a rows-only check.  Zero streaming
    state; each batch OWNS and OVERWRITES its batch_id=N hive dir
    (the z20 idempotency contract)."""
    import os
    import shutil

    from ..operators.sampling import dsir_model, dsir_score
    from ..streaming.events import (
        read_document_stream,
        run_foreach_batch,
        stage_table_dir,
    )

    model = dsir_model(_docs(spark, sf_dir))
    stream = read_document_stream(
        spark, stage_table_dir(sf_dir, "documents")
    )
    out_dir = os.path.join(_roundtrip_dir("z22out"), "dsir")
    shutil.rmtree(out_dir, ignore_errors=True)

    def score(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        dsir_score(batch_df, model).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    run_foreach_batch(stream, score)
    if not os.path.exists(out_dir):
        return spark.createDataFrame(
            [], "doc_id long, source string, n_feats long, total_lr_e6 long"
        )
    return spark.read.parquet(out_dir).select(
        "doc_id", "source", "n_feats", "total_lr_e6"
    )


def _z22_sql() -> str:
    from ..operators.sampling import dsir_score_sql

    return dsir_score_sql()


def q_z23_stream_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming embedding decontamination at ingest (r11 ext): each
    micro-batch of arriving vectors is screened against the eval
    matrix COLLECTED ONCE from the static snapshot (quarantine media
    as it lands, not in a later corpus-wide pass — the z20/z22
    discipline).  Per-vector independence → the drained union
    hash-matches batch x137 at any micro-batch partitioning, so this
    op carries x137's FULL value-hash oracle.  Zero streaming state;
    per-batch idempotent batch_id=N sink."""
    import os
    import shutil

    from ..operators.similarity import (
        contamination_eval_rows,
        score_against_eval,
    )
    from ..streaming.events import (
        read_embedding_stream,
        run_foreach_batch,
        stage_table_dir,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    eval_rows = contamination_eval_rows(emb)
    stream = read_embedding_stream(
        spark, stage_table_dir(sf_dir, "embeddings")
    )
    out_dir = os.path.join(_roundtrip_dir("z23out"), "contam")
    shutil.rmtree(out_dir, ignore_errors=True)

    def screen(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        train = batch_df.select(
            "vec_id",
            F.transform(
                F.col("embedding"), lambda x: x.cast("double")
            ).alias("emb"),
        )
        score_against_eval(train, eval_rows).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"batch_id={batch_id}"))

    run_foreach_batch(stream, screen)
    if not os.path.exists(out_dir):
        return spark.createDataFrame(
            [],
            "vec_id long, best_eval_id long, best_cos_e6 long,"
            " contaminated long",
        )
    return spark.read.parquet(out_dir).select(
        "vec_id", "best_eval_id", "best_cos_e6", "contaminated"
    )


def q_c7_dsir_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The modern selection-first curation capstone (r11 ext): DSIR
    importance resampling toward the target domain → exact dedup of
    the kept set (canonical = min doc_id) → n-gram decontamination
    against the held-out eval split → per-source manifest.  Every
    stage is an existing oracle-checked operator; this proves the
    x136 → x1 → x54 chain COMPOSES into one plan.  At 100 TB the
    stages keep their own shapes: a fixed broadcast model + TakeOrdered
    for selection, a digest groupBy for dedup, a broadcast eval-gram
    semi-join for decontamination."""
    from ..operators.dedup import exact_dedup
    from ..operators.sampling import dsir_resample
    from ..operators.text_analysis import ngram_contamination

    docs = _docs(spark, sf_dir)
    kept = docs.join(dsir_resample(docs).select("doc_id"), "doc_id")
    canon = (
        exact_dedup(kept).where(F.col("is_canonical")).select("doc_id")
    )
    contam = ngram_contamination(docs).select("doc_id")
    clean = canon.join(contam, "doc_id", "left_anti")
    return (
        clean.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def _c7_sql() -> str:
    from ..operators.sampling import dsir_resample_sql
    from ..operators.text_analysis import ngram_contamination_sql

    return f"""
WITH sel AS MATERIALIZED ({dsir_resample_sql()}),
kept AS (SELECT d.doc_id, d.text, d.source, d.n_chars
         FROM documents d JOIN sel USING (doc_id)),
hashed AS (SELECT doc_id, md5(text) AS h FROM kept),
canon AS (SELECT h, MIN(doc_id) AS doc_id FROM hashed GROUP BY h),
contam AS MATERIALIZED ({ngram_contamination_sql()}),
clean AS (
  SELECT c.doc_id FROM canon c
  WHERE c.doc_id NOT IN (SELECT doc_id FROM contam)
)
SELECT d.source, COUNT(*) AS n_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
FROM clean JOIN documents d USING (doc_id)
GROUP BY d.source"""


def q_x127_kmv_proof_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KMV two-phase proof audit: how many distinct words
    survive the 1/16 hash-space prefilter, and whether that proves the
    source (>= k=128 survivors -> the filtered sketch is exact and
    x76's fallback scan never runs).  Makes the branch the two-phase
    armor takes OBSERVABLE per corpus — on the shipped testdata every
    source reads (2, proven=0); on the r10 vocab-growth decade every
    source is proven (survivors 1774+ at sf1_vg).  One distinct + one
    aggregate, map-side combinable; the x124/x126 pre-flight pattern
    for the cardinality family."""
    from ..functions.textops import strip_non_alpha, tokens
    from ..operators.sketches import kmv_proof_audit

    words = (
        _docs(spark, sf_dir)
        .select(
            "source",
            F.explode(tokens(strip_non_alpha(F.col("text")))).alias("word"),
        )
        .where(F.col("word") != "")
    )
    return kmv_proof_audit(words, key="word", group_col="source").select(
        F.col("grp").alias("source"), "survivors", "proven"
    )


def _x127_sql() -> str:
    from ..operators.sketches import kmv_proof_audit_sql

    pairs = """
SELECT source AS grp,
       unnest(list_filter(
         string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
         t -> t != '')) AS key
FROM documents"""
    return (
        f"SELECT grp AS source, survivors, proven FROM ("
        f"{kmv_proof_audit_sql(pairs)})"
    )


def q_x128_vocab_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-normalization table: every corpus word mapped to the
    highest-frequency word in its Levenshtein-2 neighborhood (itself
    included; tie -> lexicographically smallest) — the end use of the
    x58 blocking: collapse spelling noise onto the dominant form
    before token counting, shingling, or vocabulary budgeting.
    One-hop by design (no transitive closure — bridge typos must not
    merge unrelated words).  Output is exactly vocab-sized; the argmax
    is a per-word window over the bounded edit-neighborhood."""
    from ..operators.fuzzy import vocab_normalize

    return vocab_normalize(_docs(spark, sf_dir))


def _x128_sql() -> str:
    from ..operators.fuzzy import vocab_normalize_sql

    return vocab_normalize_sql()


def q_x138_boilerplate_removal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CCNet/RefinedWeb-style boilerplate scrub (r11 ext2): paragraphs
    whose document frequency exceeds max(BOILER_MAX_DF, n_docs //
    BOILER_DF_DEN) — a RELATIVE rule, so boilerplate means "covers a
    fixed fraction of the corpus", never "any duplicated passage" —
    are template chrome; remove them from every document and
    reassemble the cleaned text.  x60 reports sub-document
    duplication — this op REWRITES the corpus, the artifact a
    pipeline actually ships.
    One digest-keyed wide pass fits the hot set (bounded driver
    scalar, fused); the scrub itself is a narrow doc-local projection
    — document text never enters an exchange at any corpus size."""
    from ..operators.dedup import boilerplate_removal

    return boilerplate_removal(_docs(spark, sf_dir))


def _x138_sql() -> str:
    from ..operators.dedup import boilerplate_removal_sql

    return boilerplate_removal_sql("SELECT doc_id, text FROM documents")


def q_x139_lsh_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy eval decontamination (r11 ext2, the GPT-3/PaLM screen):
    train-split docs that MinHash-LSH-collide with an eval-split doc,
    verified by exact Jaccard, with the best eval neighbor.  Completes
    the decontamination matrix (x118 exact spans / x54 exact n-grams /
    x113 winnowed spans / x137 embedding paraphrases) with the
    lexically-rewritten near-copy case.  The benchmark-sized eval band
    table broadcasts; the corpus band relation never shuffles for
    candidates."""
    from ..operators.dedup import lsh_contamination

    return lsh_contamination(_docs(spark, sf_dir))


def _x139_sql() -> str:
    from ..operators.dedup import lsh_contamination_sql

    return lsh_contamination_sql()


def q_z24_stream_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming boilerplate scrub at ingest (r11 ext2): the hot-hash
    set is fitted ONCE on the static snapshot (bounded driver list —
    the z20/z22 slowly-changing-dimension discipline), then every
    arriving micro-batch is scrubbed doc-locally via ``foreachBatch``.
    The scrub is a narrow per-doc rewrite, so the drained union
    hash-matches batch x138 at ANY micro-batch partitioning — this
    streaming op carries the FULL value-hash SQL oracle.  Zero
    streaming state; each batch OWNS and OVERWRITES its batch_id=N
    hive dir (the z20 idempotency contract)."""
    import os
    import shutil

    from ..operators.dedup import boilerplate_hot_hashes, remove_boilerplate
    from ..streaming.events import (
        read_document_stream,
        run_foreach_batch,
        stage_table_dir,
    )

    hot = boilerplate_hot_hashes(_docs(spark, sf_dir))
    stream = read_document_stream(
        spark, stage_table_dir(sf_dir, "documents")
    )
    out_dir = os.path.join(_roundtrip_dir("z24out"), "boiler")
    shutil.rmtree(out_dir, ignore_errors=True)

    def scrub(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        remove_boilerplate(batch_df, hot).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    run_foreach_batch(stream, scrub)
    if not os.path.exists(out_dir):
        return spark.createDataFrame(
            [], "doc_id long, n_paras long, n_removed long, clean_text string"
        )
    return spark.read.parquet(out_dir).select(
        "doc_id", "n_paras", "n_removed", "clean_text"
    )


def q_c8_scrub_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RefinedWeb-order curation capstone (r11 ext2): boilerplate
    scrub FIRST (x138), then exact dedup of the CLEANED text, then
    fuzzy eval decontamination (x139) of the CLEANED corpus, then the
    per-source manifest — proving the ext2 operators COMPOSE, with the
    downstream stages consuming the scrubbed text (scrub-then-dedup is
    the production order: chrome removal changes which docs are
    duplicates).  Fully-boilerplate docs drop out; the scrubbed
    relation is eagerly localCheckpointed (three consumers scan it —
    the x132 discipline).  At 100 TB each stage keeps its own shape:
    narrow scrub, digest groupBy dedup, broadcast eval band join."""
    from ..operators.dedup import (
        boilerplate_removal,
        exact_dedup,
        lsh_contamination,
    )

    docs = _docs(spark, sf_dir)
    scrub = boilerplate_removal(docs).localCheckpoint(eager=True)
    cleaned = (
        scrub.where(F.col("clean_text") != "")
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("doc_id", F.col("clean_text").alias("text"), "source")
    )
    canon = (
        exact_dedup(cleaned).where(F.col("is_canonical")).select("doc_id")
    )
    contam = lsh_contamination(cleaned.select("doc_id", "text")).select(
        "doc_id"
    )
    keep = canon.join(contam, "doc_id", "left_anti")
    return (
        keep.join(cleaned, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
        )
    )


def _c8_sql() -> str:
    from ..operators.dedup import (
        boilerplate_removal_sql,
        lsh_contamination_sql,
    )

    scrub = boilerplate_removal_sql("SELECT doc_id, text FROM documents")
    contam = lsh_contamination_sql(
        docs_sql="SELECT doc_id, text FROM cleaned"
    )
    return f"""
WITH scrub AS MATERIALIZED ({scrub}),
cleaned AS MATERIALIZED (
  SELECT s.doc_id, s.clean_text AS text, d.source
  FROM scrub s JOIN documents d USING (doc_id)
  WHERE s.clean_text != ''),
hashed AS (SELECT doc_id, md5(text) AS h FROM cleaned),
canon AS (SELECT h, MIN(doc_id) AS doc_id FROM hashed GROUP BY h),
contam AS MATERIALIZED ({contam}),
keepers AS (
  SELECT c.doc_id FROM canon c
  WHERE c.doc_id NOT IN (SELECT doc_id FROM contam))
SELECT d.source, COUNT(*) AS n_docs,
       CAST(SUM(length(d.text)) AS BIGINT) AS total_chars
FROM keepers JOIN cleaned d USING (doc_id)
GROUP BY d.source"""


def q_x129_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear quality classifier: every doc
    scored as the mean model weight of its hashed tokens — the
    classifier-filter stage of a CCNet/LLaMA-class curation pipeline.
    The 4096-row model relation is BROADCAST (the production shape for
    a learned model table): scoring is explode -> broadcast hash join
    (no corpus-side shuffle) -> one balanced doc_id aggregate.  Exact
    integer milli-weights until one final quantized division."""
    from ..operators.text_analysis import classifier_score, classifier_weights

    docs = _docs(spark, sf_dir)
    return classifier_score(docs, classifier_weights(spark))


def _x129_sql() -> str:
    from ..operators.text_analysis import classifier_score_sql

    return classifier_score_sql()


def q_x130_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source calibration of the x129 classifier at threshold 0:
    doc counts, mean/min/max score, and the keep fraction the
    threshold would ship — the pre-flight a 100-TB filter pass runs
    before committing (a cut keeping 90% of one source and 4% of
    another is a data-mix decision).  Sum/count exact-integer
    aggregates only; |sources| output rows."""
    from ..operators.text_analysis import (
        classifier_calibration,
        classifier_weights,
    )

    docs = _docs(spark, sf_dir)
    return classifier_calibration(docs, classifier_weights(spark))


def _x130_sql() -> str:
    from ..operators.text_analysis import classifier_calibration_sql

    return classifier_calibration_sql()


def q_x131_perceptron_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN side of the x129 classifier: distill the x8 quality
    composite into the hashed linear model via a batch margin-0
    perceptron — integer-exact updates (y in {+1,-1}, binary bucket
    presence), so 3 rounds replay exactly in SQL.  The corpus is
    featurized ONCE (persisted); per round: one broadcast join of the
    <=4096-row weight relation + one doc margin agg + one bucket
    gradient agg; only the gradient crosses the driver (the BPE
    driver-loop budget).  Output = nonzero (bucket, w)."""
    from ..operators.text_analysis import perceptron_train

    return perceptron_train(_docs(spark, sf_dir))


def _x131_sql() -> str:
    from ..operators.text_analysis import perceptron_train_sql

    return perceptron_train_sql()


def q_x132_quality_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted quality mix: x61's α=0.5 temperature allocation per
    source, but keeping each source's TOP x129-classifier scorers
    instead of a hash-random subset — the quality-filtered sampling a
    production mix ships.  Histogram-first cutoff (the d6/w10
    discipline): the per-source threshold is found on the bounded
    (source, score) grid, never a row_number over a whole source's
    documents; only cutoff-score ties pay a bounded window, min-doc_id
    tiebreak.  Output = kept (doc_id, source, score_e6)."""
    from ..operators.sampling import quality_budget_mix
    from ..operators.text_analysis import classifier_score, classifier_weights

    docs = _docs(spark, sf_dir)
    scored = (
        docs.select("doc_id", "source")
        .join(
            classifier_score(docs, classifier_weights(spark)).select(
                "doc_id", "score_e6"
            ),
            "doc_id",
        )
        # quality_budget_mix scans its input 4x (counts, histogram,
        # above-cut, at-cut); eager localCheckpoint materializes the
        # scoring pass ONCE (its own docstring's guidance — ADVICE r10)
        .localCheckpoint(eager=True)
    )
    return quality_budget_mix(scored, "source", "score_e6", "doc_id")


def _x132_sql() -> str:
    from ..operators.sampling import quality_budget_mix_sql
    from ..operators.text_analysis import classifier_score_sql

    scored = (
        f"SELECT d.doc_id, d.source, s.score_e6 FROM documents d JOIN "
        f"({classifier_score_sql()}) s USING (doc_id)"
    )
    return quality_budget_mix_sql(
        scored,
        "source",
        "score_e6",
        "doc_id",
        out_cols="doc_id, source, score_e6",
    )


def q_z20_stream_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming classifier scoring: the document ingest stream scored
    per micro-batch against the STATIC broadcast model via
    ``foreachBatch`` (the z16 production-sink pattern — at ingest you
    score with the model you have, a slowly-changing dimension like
    z5's enrich side).  Per-doc scores are independent, so the drained
    union across batches hash-matches the batch x129 relation at ANY
    micro-batch partitioning — which is why this streaming op carries
    x129's FULL value-hash SQL oracle, not a rows-only check.  No
    streaming state at all: each batch is one broadcast join + one
    batch-local doc aggregate."""
    import os
    import shutil

    from ..operators.text_analysis import classifier_score, classifier_weights
    from ..streaming.events import (
        read_document_stream,
        run_foreach_batch,
        stage_table_dir,
    )

    weights = classifier_weights(spark)
    stream = read_document_stream(
        spark, stage_table_dir(sf_dir, "documents")
    )
    out_dir = os.path.join(_roundtrip_dir("z20out"), "scores")
    shutil.rmtree(out_dir, ignore_errors=True)

    def score(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        # idempotent per batch (ADVICE r10): each micro-batch OWNS the
        # hive-partition dir batch_id=N and overwrites it, so a retried
        # batch replaces rather than double-appends — keeping the
        # drained-set == batch-x129 invariant the full value-hash
        # oracle relies on, exactly the (checkpoint, batch_id) contract
        # run_foreach_batch's docstring advertises.
        classifier_score(batch_df, weights).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    run_foreach_batch(stream, score)
    if not os.path.exists(out_dir):
        return spark.createDataFrame(
            [], "doc_id long, n_tokens long, sum_w long, score_e6 long"
        )
    return spark.read.parquet(out_dir).select(
        "doc_id", "n_tokens", "sum_w", "score_e6"
    )


def q_z21_stream_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming multimodal ingest (r11): the document stream is
    rendered to REAL compressed PNGs and pixel-decoded per micro-batch
    via ``foreachBatch`` — the decode-at-ingest pattern (a production
    pipeline decodes/validates media as it lands, not in a later
    corpus-wide pass).  Per-doc independence means the drained union
    hash-matches batch x134 at ANY micro-batch partitioning, so this
    streaming op carries x134's FULL generative value-hash oracle.
    Zero streaming state; the z20 idempotency discipline (each batch
    owns and overwrites its batch_id=N dir)."""
    import os
    import shutil

    from ..operators.multimodal import binarize_png, decode_png_pixels
    from ..streaming.events import (
        read_document_stream,
        run_foreach_batch,
        stage_table_dir,
    )

    stream = read_document_stream(
        spark, stage_table_dir(sf_dir, "documents")
    )
    out_dir = os.path.join(_roundtrip_dir("z21out"), "pixels")
    shutil.rmtree(out_dir, ignore_errors=True)

    def decode(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        decode_png_pixels(binarize_png(batch_df)).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"batch_id={batch_id}"))

    run_foreach_batch(stream, decode)
    if not os.path.exists(out_dir):
        return spark.createDataFrame(
            [],
            "doc_id long, width long, height long, n_px long,"
            " sum_r long, sum_g long, sum_b long",
        )
    return spark.read.parquet(out_dir).select(
        "doc_id", "width", "height", "n_px", "sum_r", "sum_g", "sum_b"
    )


def q_x111_label_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the gold labels and nearest-centroid
    predicted labels (the x6 quantizer as a 1-NN classifier) — the
    chance-corrected agreement gate before trusting weak labels.
    Exact-integer confusion-matrix arithmetic; centroids broadcast,
    collection never shuffles."""
    from ..operators.similarity import label_agreement_kappa

    return label_agreement_kappa(load_table(spark, sf_dir, "embeddings"))


def q_x78_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of the IVF-pruned search (x6) against the exact
    brute-force top-k (x5), per query — the x43/x64 audit pattern
    applied to ANN: measure the pruned index's miss rate ON THIS
    corpus before trusting nprobe at production scale.  Both sides
    are the existing candidate-bounded pipelines; the audit itself is
    one (query_id, vec_id)-keyed left join on two k-row-per-query
    relations."""
    from ..operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb).select("query_id", "vec_id")
    approx = ivf_topk(emb).select("query_id", "vec_id").withColumn(
        "_hit", F.lit(1)
    )
    return (
        exact.join(approx, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("long")
            .alias("n_hit"),
            F.count("*").alias("k"),
        )
        .select(
            "query_id",
            "n_hit",
            F.floor(
                F.col("n_hit").cast("double") / F.col("k") * 1e6
                + F.lit(0.5000001)
            )
            .cast("long")
            .alias("recall_e6"),
        )
    )


def _x78_sql() -> str:
    from ..operators.similarity import COSINE_TOPK_SQL, IVF_TOPK_SQL

    return f"""
WITH exact AS MATERIALIZED ({COSINE_TOPK_SQL}),
approx AS MATERIALIZED ({IVF_TOPK_SQL})
SELECT e.query_id,
       CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hit,
       CAST(FLOOR(CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*) * 1e6 + 0.5000001) AS BIGINT)
         AS recall_e6
FROM exact e LEFT JOIN approx a
  ON a.query_id = e.query_id AND a.vec_id = e.vec_id
GROUP BY e.query_id"""


def q_x82_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary overlap matrix estimated from the
    per-source KMV sketches ALONE (bottom-k of a union derives from
    the bottom-ks of the parts — the set algebra HLL lacks): Jaccard
    share of the merged sketch present in both sources x the union
    estimate.  Sketch-only pair work: <= |sources|² x 2k rows, corpus
    untouched after the one sketch pass.  two_phase unconditional for
    the same documented reason as x76 (small toy-corpus premium
    accepted; proven branch fires on vocab-growth corpora)."""
    from ..functions.textops import strip_non_alpha, tokens
    from ..operators.sketches import kmv_overlap, kmv_sketch

    words = (
        _docs(spark, sf_dir)
        .select(
            "source",
            F.explode(tokens(strip_non_alpha(F.col("text")))).alias("word"),
        )
        .where(F.col("word") != "")
    )
    return kmv_overlap(
        kmv_sketch(words, key="word", group_col="source", two_phase=True)
    )


def _x82_sql() -> str:
    from ..operators.sketches import kmv_overlap_sql

    pairs = """
SELECT source AS grp,
       unnest(list_filter(
         string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
         t -> t != '')) AS key
FROM documents"""
    return kmv_overlap_sql(pairs)


def q_x77_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two training epochs of the corpus as deterministic shard/pos
    assignments — the data-loader global shuffle without a global
    sort (per-(epoch, shard) windows only; shards hash-balanced)."""
    from ..operators.sampling import epoch_shuffle

    return epoch_shuffle(_docs(spark, sf_dir), "doc_id")


def _x77_sql() -> str:
    from ..operators.sampling import epoch_shuffle_sql

    return epoch_shuffle_sql("documents", "doc_id")


EXTENSION_QUERIES = {
    "x1_exact_dedup": q_x1_exact_dedup,
    "x2_minhash_signatures": q_x2_minhash_signatures,
    "x3_lsh_candidates": q_x3_lsh_candidates,
    "x4_near_dups": q_x4_near_dups,
    "x5_cosine_topk": q_x5_cosine_topk,
    "x6_ivf_topk": q_x6_ivf_topk,
    "x7_lang_id": q_x7_lang_id,
    "x8_quality_score": q_x8_quality_score,
    "x9_token_count": q_x9_token_count,
    "x10_fingerprint": q_x10_fingerprint,
    "x11_multimodal_decode": q_x11_multimodal_decode,
    "x12_asof_join": q_x12_asof_join,
    "x13_simhash": q_x13_simhash,
    "x14_simhash_near_dups": q_x14_simhash_near_dups,
    "x15_embedding_near_dups": q_x15_embedding_near_dups,
    "x16_salted_agg": q_x16_salted_agg,
    "x17_resize": q_x17_resize,
    "x18_features": q_x18_features,
    "x19_sharded_index": q_x19_sharded_index,
    "x20_srp_lsh_near_dups": q_x20_srp_lsh_near_dups,
    "x21_ivf_kmeans": q_x21_ivf_kmeans,
    "x22_srp_multiprobe": q_x22_srp_multiprobe,
    "x23_format_roundtrip": q_x23_format_roundtrip,
    "x24_frame_sample": q_x24_frame_sample,
    "c1_curation_pipeline": q_c1_curation_pipeline,
    "c4_training_manifest": q_c4_training_manifest,
    "x83_filter_calibration": q_x83_filter_calibration,
    "x84_corrupt_ingest": q_x84_corrupt_ingest,
    "x85_audio_features": q_x85_audio_features,
    "z15_stream_forget": q_z15_stream_forget,
    "x86_schema_evolution": q_x86_schema_evolution,
    "x87_tokenizer_fertility": q_x87_tokenizer_fertility,
    "x88_dedup_savings": q_x88_dedup_savings,
    "x89_persisted_index": q_x89_persisted_index,
    "x91_index_compaction": q_x91_index_compaction,
    "x25_train_test_split": q_x25_train_test_split,
    "x26_stratified_sample": q_x26_stratified_sample,
    "x27_bigram_counts": q_x27_bigram_counts,
    "x28_redact_numbers": q_x28_redact_numbers,
    "x29_quantile_bins": q_x29_quantile_bins,
    "x30_asof_forward": q_x30_asof_forward,
    "x31_embedding_norms": q_x31_embedding_norms,
    "x32_weighted_mix": q_x32_weighted_mix,
    "x33_dedup_clusters": q_x33_dedup_clusters,
    "x34_repetition_stats": q_x34_repetition_stats,
    "x35_hll_registers": q_x35_hll_registers,
    "x36_cms_counts": q_x36_cms_counts,
    "x37_bloom_join_audit": q_x37_bloom_join_audit,
    "x38_contamination_audit": q_x38_contamination_audit,
    "x39_top_pc": q_x39_top_pc,
    "x40_pc_projection": q_x40_pc_projection,
    "x41_phrase_search": q_x41_phrase_search,
    "x42_hll_by_source": q_x42_hll_by_source,
    "x43_join_size_estimate": q_x43_join_size_estimate,
    "x44_cms_heavy_hitters": q_x44_cms_heavy_hitters,
    "x45_sequence_packing": q_x45_sequence_packing,
    "x46_bottomk_sample": q_x46_bottomk_sample,
    "x104_weighted_sample": q_x104_weighted_sample,
    "x105_zipf_slope": q_x105_zipf_slope,
    "x107_pii_scan": q_x107_pii_scan,
    "x108_setsim_join": q_x108_setsim_join,
    "x109_winnow_fingerprints": q_x109_winnow_fingerprints,
    "x110_dup_span_coverage": q_x110_dup_span_coverage,
    "x111_label_kappa": q_x111_label_kappa,
    "x112_image_ahash": q_x112_image_ahash,
    "x113_winnow_contamination": q_x113_winnow_contamination,
    "x114_dup_span_removal": q_x114_dup_span_removal,
    "z17_stream_ks": q_z17_stream_ks,
    "z18_stream_attribution": q_z18_stream_attribution,
    "x115_audio_contour": q_x115_audio_contour,
    "x116_lsh_recall": q_x116_lsh_recall,
    "x117_pq_topk": q_x117_pq_topk,
    "z19_stream_hourweek": q_z19_stream_hourweek,
    "x118_exact_contamination": q_x118_exact_contamination,
    "x119_lsh_band_frontier": q_x119_lsh_band_frontier,
    "x120_cross_source_dups": q_x120_cross_source_dups,
    "x121_gram_spectrum": q_x121_gram_spectrum,
    "x122_dedup_weights": q_x122_dedup_weights,
    "x123_quality_canonical": q_x123_quality_canonical,
    "x124_lsh_bucket_stats": q_x124_lsh_bucket_stats,
    "x125_frontier_sampled": q_x125_frontier_sampled,
    "c5_quality_manifest": q_c5_quality_manifest,
    "c6_trained_curation": q_c6_trained_curation,
    "x126_variant_bucket_stats": q_x126_variant_bucket_stats,
    "x133_variant_stats_sampled": q_x133_variant_stats_sampled,
    "x135_normalized_dedup": q_x135_normalized_dedup,
    "x136_dsir_resample": q_x136_dsir_resample,
    "x137_embedding_contamination": q_x137_embedding_contamination,
    "z22_stream_dsir_score": q_z22_stream_dsir_score,
    "z23_stream_contamination": q_z23_stream_contamination,
    "c7_dsir_curation": q_c7_dsir_curation,
    "x138_boilerplate_removal": q_x138_boilerplate_removal,
    "x139_lsh_contamination": q_x139_lsh_contamination,
    "z24_stream_boilerplate": q_z24_stream_boilerplate,
    "c8_scrub_curation": q_c8_scrub_curation,
    "x127_kmv_proof_audit": q_x127_kmv_proof_audit,
    "x128_vocab_normalize": q_x128_vocab_normalize,
    "x129_classifier_scores": q_x129_classifier_scores,
    "x130_classifier_calibration": q_x130_classifier_calibration,
    "x131_perceptron_train": q_x131_perceptron_train,
    "x132_quality_mix": q_x132_quality_mix,
    "z20_stream_classifier": q_z20_stream_classifier,
    "x47_groupwise_sample": q_x47_groupwise_sample,
    "x48_chunk_windows": q_x48_chunk_windows,
    "x49_curriculum_order": q_x49_curriculum_order,
    "x50_value_histogram": q_x50_value_histogram,
    "x51_bpe_merges": q_x51_bpe_merges,
    "x90_batched_bpe": q_x90_batched_bpe,
    "x92_stratified_iceberg": q_x92_stratified_iceberg,
    "x94_rare_token_docs": q_x94_rare_token_docs,
    "x95_window_dedup_rate": q_x95_window_dedup_rate,
    "x99_cooccurrence_pmi": q_x99_cooccurrence_pmi,
    "x98_scene_cuts": q_x98_scene_cuts,
    "x100_quantize_embeddings": q_x100_quantize_embeddings,
    "x101_ngram_novelty": q_x101_ngram_novelty,
    "x102_gopher_repetition": q_x102_gopher_repetition,
    "x103_bigram_perplexity": q_x103_bigram_perplexity,
    "x96_length_percentiles": q_x96_length_percentiles,
    "x93_doc_entropy": q_x93_doc_entropy,
    "x52_char_lm_scores": q_x52_char_lm_scores,
    "x53_histogram_by_type": q_x53_histogram_by_type,
    "x54_ngram_contamination": q_x54_ngram_contamination,
    "x55_semantic_clusters": q_x55_semantic_clusters,
    "x56_incremental_dedup": q_x56_incremental_dedup,
    "x57_vocab_coverage": q_x57_vocab_coverage,
    "x58_fuzzy_word_pairs": q_x58_fuzzy_word_pairs,
    "c2_ingest_curation": q_c2_ingest_curation,
    "x59_bigram_lift": q_x59_bigram_lift,
    "x60_paragraph_dedup": q_x60_paragraph_dedup,
    "x61_temperature_mix": q_x61_temperature_mix,
    "x62_bpe_encode": q_x62_bpe_encode,
    "x63_containment": q_x63_containment,
    "x64_minhash_audit": q_x64_minhash_audit,
    "x65_lang_consistency": q_x65_lang_consistency,
    "x66_source_keywords": q_x66_source_keywords,
    "z12_stream_moments": q_z12_stream_moments,
    "x67_orc_roundtrip": q_x67_orc_roundtrip,
    "x68_dataset_profile": q_x68_dataset_profile,
    "x69_pixel_decode": q_x69_pixel_decode,
    "x134_png_decode": q_x134_png_decode,
    "z21_stream_png_decode": q_z21_stream_png_decode,
    "x70_pixel_resize": q_x70_pixel_resize,
    "x71_wav_decode": q_x71_wav_decode,
    "x72_dedup_method_audit": q_x72_dedup_method_audit,
    "c3_model_gate": q_c3_model_gate,
    "x73_hll_shard_merge": q_x73_hll_shard_merge,
    "x74_composition_matrix": q_x74_composition_matrix,
    "x75_vocab_growth": q_x75_vocab_growth,
    "x76_kmv_distinct": q_x76_kmv_distinct,
    "x77_epoch_shuffle": q_x77_epoch_shuffle,
    "x78_ann_recall": q_x78_ann_recall,
    "x106_label_noise": q_x106_label_noise,
    "z14_stream_dedup": q_z14_stream_dedup,
    "z16_stream_index_screen": q_z16_stream_index_screen,
    "x79_shard_manifest": q_x79_shard_manifest,
    "x80_threshold_curve": q_x80_threshold_curve,
    "x81_join_skew_audit": q_x81_join_skew_audit,
    "x82_kmv_overlap": q_x82_kmv_overlap,
    "z13_stream_ohlc": q_z13_stream_ohlc,
    "z1_stream_rollup": q_z1_stream_rollup,
    "z2_stream_sessions": q_z2_stream_sessions,
    "z9_stream_bottomk": q_z9_stream_bottomk,
    "z3_stream_stream_join": q_z3_stream_stream_join,
    "z4_sliding_rollup": q_z4_sliding_rollup,
    "z5_stream_enrich": q_z5_stream_enrich,
    "z6_stream_hll": q_z6_stream_hll,
    "z7_session_window_stream": q_z7_session_window_stream,
    "z8_stream_cms": q_z8_stream_cms,
    "z10_stream_histogram": q_z10_stream_histogram,
    "z11_stream_funnel": q_z11_stream_funnel,
}

def _value_histogram_oracle() -> str:
    from ..operators.sketches import value_histogram_sql

    return value_histogram_sql()


def _histogram_bins_oracle() -> str:
    from ..operators.sketches import histogram_bins_sql

    return histogram_bins_sql()


def _histogram_by_type_oracle() -> str:
    from ..operators.sketches import histogram_bins_sql

    return histogram_bins_sql(by=["event_type"])


def _ngram_contamination_oracle() -> str:
    from ..operators.text_analysis import ngram_contamination_sql

    return ngram_contamination_sql()


def _funnel_stage_oracle() -> str:
    from .relational import E6_STAGE_SQL

    return E6_STAGE_SQL


def _bpe_merges_oracle() -> str:
    from ..operators.bpe import bpe_merges_sql

    return bpe_merges_sql()


def _scene_cuts_oracle() -> str:
    from ..operators.multimodal import SCENE_SQL

    return SCENE_SQL


def _novelty_oracle() -> str:
    from ..operators.text_analysis import NGRAM_NOVELTY_SQL

    return NGRAM_NOVELTY_SQL


def _gopher_repetition_oracle() -> str:
    from ..operators.text_analysis import GOPHER_REPETITION_SQL

    return GOPHER_REPETITION_SQL


def _bigram_ppl_oracle() -> str:
    from ..operators.text_analysis import BIGRAM_PPL_SQL

    return BIGRAM_PPL_SQL


def _weighted_sample_oracle() -> str:
    from ..operators.sampling import weighted_sample_sql

    return weighted_sample_sql()


def _zipf_slope_oracle() -> str:
    from ..operators.text_analysis import ZIPF_SLOPE_SQL

    return ZIPF_SLOPE_SQL


def _label_noise_oracle() -> str:
    from ..operators.similarity import label_noise_sql

    return label_noise_sql()


def _pii_scan_oracle() -> str:
    from ..operators.text_analysis import PII_SCAN_SQL

    return PII_SCAN_SQL


def _setsim_join_oracle() -> str:
    from ..operators.dedup import setsim_join_sql

    return setsim_join_sql(dd.AUGMENT_SQL)


def _winnow_oracle() -> str:
    from ..operators.text_analysis import winnow_fingerprints_sql

    return winnow_fingerprints_sql("SELECT doc_id, text FROM documents")


def _dup_span_oracle() -> str:
    from ..operators.text_analysis import dup_span_coverage_sql

    return dup_span_coverage_sql(dd.AUGMENT_SQL)


def _label_kappa_oracle() -> str:
    from ..operators.similarity import LABEL_KAPPA_SQL

    return LABEL_KAPPA_SQL


def _ahash_oracle() -> str:
    from ..operators.multimodal import AHASH_SQL

    return AHASH_SQL


def _audio_contour_oracle() -> str:
    from ..operators.multimodal import AUDIO_CONTOUR_SQL

    return AUDIO_CONTOUR_SQL


def _pq_oracle() -> str:
    from ..operators.similarity import pq_topk_sql

    return pq_topk_sql()


def _lsh_recall_oracle() -> str:
    from ..operators.dedup import near_dup_sql, setsim_join_sql

    return f"""
WITH exact_pairs AS ({setsim_join_sql(dd.AUGMENT_SQL, num=1, den=2)}),
lsh_pairs AS ({near_dup_sql(dd.AUGMENT_SQL)})
SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(COUNT(l.doc_a) AS BIGINT) AS n_found,
       CAST(COUNT(*) - COUNT(l.doc_a) AS BIGINT) AS n_missed,
       CASE WHEN COUNT(*) = 0 THEN CAST(1000000 AS BIGINT)
            ELSE CAST(FLOOR(CAST(COUNT(l.doc_a) AS DOUBLE) / COUNT(*) * 1e6
                            + 0.5000001) AS BIGINT)
       END AS recall_e6
FROM exact_pairs e
LEFT JOIN lsh_pairs l ON l.doc_a = e.doc_a AND l.doc_b = e.doc_b"""


def _dup_span_removal_oracle() -> str:
    from ..operators.text_analysis import dup_span_removal_sql

    return dup_span_removal_sql(dd.AUGMENT_SQL)


def _z19_oracle() -> str:
    from .relational import W12_SQL

    return W12_SQL


def _z17_oracle() -> str:
    from .relational import D6_SQL

    return D6_SQL


def _winnow_contamination_oracle() -> str:
    from ..operators.text_analysis import winnow_fingerprints_sql

    return f"""
WITH fps AS ({winnow_fingerprints_sql(dd.AUGMENT_SQL)})
SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc,
       COUNT(DISTINCT t.fp) AS n_shared
FROM fps t JOIN fps e ON e.fp = t.fp
WHERE t.doc_id < {dd.NEAR_DUP_OFFSET} AND e.doc_id >= {dd.NEAR_DUP_OFFSET}
GROUP BY t.doc_id, e.doc_id
HAVING COUNT(DISTINCT t.fp) >= 2"""


def _cross_source_dups_oracle() -> str:
    from ..operators.dedup import cross_source_dups_sql

    return cross_source_dups_sql(dd.AUGMENT_SQL)


def _dedup_weights_oracle() -> str:
    from ..operators.dedup import dedup_weights_sql

    return dedup_weights_sql(dd.AUGMENT_SQL)


def _gram_spectrum_oracle() -> str:
    from ..operators.text_analysis import gram_spectrum_sql

    return gram_spectrum_sql(dd.AUGMENT_SQL)


def _quality_canonical_oracle() -> str:
    from ..operators.dedup import dedup_keep_best_sql
    from ..operators.text_analysis import quality_sql

    return dedup_keep_best_sql(dd.AUGMENT_SQL, quality_sql(dd.AUGMENT_SQL))


def _lsh_bucket_stats_oracle() -> str:
    from ..operators.dedup import (
        lsh_bucket_stats_sql,
        minhash_signatures_sql,
        shingles_sql,
    )

    return lsh_bucket_stats_sql(
        minhash_signatures_sql(shingles_sql(dd.AUGMENT_SQL))
    )


def _exact_contamination_oracle() -> str:
    from ..operators.text_analysis import exact_contamination_sql

    return exact_contamination_sql(dd.AUGMENT_SQL, dd.NEAR_DUP_OFFSET)


def _lsh_band_frontier_oracle() -> str:
    from ..operators.dedup import lsh_band_frontier_sql

    return lsh_band_frontier_sql(dd.AUGMENT_SQL)


def _frontier_sampled_oracle() -> str:
    from ..operators.dedup import lsh_band_frontier_sql

    return lsh_band_frontier_sql(dd.AUGMENT_SQL, sample_den=4)


def _quantize_oracle() -> str:
    from ..operators.similarity import QUANTIZE_SQL

    return QUANTIZE_SQL


def _cooccurrence_pmi_oracle() -> str:
    from ..operators.text_analysis import cooccurrence_pmi_sql

    return cooccurrence_pmi_sql()


def _window_dedup_rate_oracle() -> str:
    from ..operators.dedup import window_dedup_rate_sql

    return window_dedup_rate_sql(dd.AUGMENT_SQL)


def _length_percentiles_oracle() -> str:
    from ..operators.text_analysis import LENGTH_PERCENTILES_SQL

    return LENGTH_PERCENTILES_SQL


def _rare_token_docs_oracle() -> str:
    from ..operators.text_analysis import RARE_TOKEN_DOCS_SQL

    return RARE_TOKEN_DOCS_SQL


def _stratified_iceberg_oracle() -> str:
    from ..operators.text_analysis import stratified_iceberg_sql

    return stratified_iceberg_sql()


def _doc_entropy_oracle() -> str:
    from ..operators.text_analysis import DOC_ENTROPY_SQL

    return DOC_ENTROPY_SQL


def _batched_bpe_oracle() -> str:
    from ..operators.bpe import bpe_merges_batched_sql

    return bpe_merges_batched_sql()


def _char_lm_oracle() -> str:
    from ..operators.text_analysis import CHAR_LM_SQL

    return CHAR_LM_SQL


def _x59_sql() -> str:
    from ..operators.text_analysis import bigram_lift_sql

    return bigram_lift_sql()


def _x60_sql() -> str:
    return dd.paragraph_dedup_sql(dd.AUGMENT_SQL)


def _x62_sql() -> str:
    from ..operators.bpe import bpe_encode_sql

    return bpe_encode_sql()


def _x63_sql() -> str:
    return dd.containment_sql(dd.AUGMENT_SQL)


def _x64_sql() -> str:
    return dd.minhash_jaccard_audit_sql(dd.AUGMENT_SQL)


def _x66_sql() -> str:
    from ..operators.text_analysis import source_keywords_sql

    return source_keywords_sql()


def _x65_sql() -> str:
    return f"""
WITH guesses AS ({LANG_ID_SQL})
SELECT d.lang, g.lang_guess, COUNT(*) AS n,
       CAST(SUM(CASE WHEN d.lang = g.lang_guess THEN 1 ELSE 0 END) AS BIGINT)
         AS n_agree
FROM documents d JOIN guesses g USING (doc_id)
GROUP BY d.lang, g.lang_guess"""


def _x68_sql() -> str:
    return f"""
WITH wf AS (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT unnest(list_filter(
             string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
             t -> t != '')) AS word
    FROM documents)
  WHERE word != '' GROUP BY word
),
q AS ({QUALITY_SQL}),
m AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         COUNT(DISTINCT lang) AS n_langs, COUNT(DISTINCT source) AS n_sources,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
  FROM documents
),
v AS (SELECT CAST(SUM(freq) AS BIGINT) AS total_tokens, COUNT(*) AS distinct_words FROM wf),
t AS (SELECT CAST(SUM(freq) AS BIGINT) AS top20_tokens
      FROM (SELECT freq FROM wf ORDER BY freq DESC, word ASC LIMIT 20)),
qq AS (SELECT CAST(SUM(quality_e6) AS BIGINT) AS q_sum FROM q)
SELECT n_docs, total_chars, total_tokens, distinct_words, n_langs, n_sources,
       CAST(FLOOR(CAST(n_en AS DOUBLE) / n_docs * 1e6 + 0.5000001) AS BIGINT)
         AS pct_en_e6,
       CAST(FLOOR(CAST(q_sum AS DOUBLE) / n_docs + 0.5000001) AS BIGINT)
         AS mean_quality_e6,
       CAST(FLOOR((1.0 - CAST(top20_tokens AS DOUBLE) / total_tokens) * 1e6
                  + 0.5000001) AS BIGINT) AS oov20_e6
FROM m CROSS JOIN v CROSS JOIN t CROSS JOIN qq"""


def _x69_sql() -> str:
    from ..operators.multimodal import PIXEL_SQL

    return PIXEL_SQL


def _x70_sql() -> str:
    from ..operators.multimodal import RESIZE_PIX_SQL

    return RESIZE_PIX_SQL


def _x71_sql() -> str:
    from ..operators.multimodal import AUDIO_SQL

    return AUDIO_SQL


def _x72_sql() -> str:
    return dd.dedup_method_audit_sql(dd.AUGMENT_SQL)


def _c3_sql() -> str:
    from ..operators.text_analysis import CHAR_LM_SQL

    return f"""
WITH scored AS (SELECT doc_id, avg_logp_e6 FROM ({CHAR_LM_SQL})),
n AS (SELECT COUNT(*) AS n FROM scored),
pos AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY avg_logp_e6 ASC, doc_id ASC) AS pos
  FROM scored
),
binned AS (
  SELECT doc_id, (pos - 1) * 10 // (SELECT n FROM n) + 1 AS bin FROM pos
)
SELECT d.lang,
       COUNT(*) AS n_scored,
       CAST(SUM(CASE WHEN b.bin > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents d
JOIN scored s ON d.doc_id = s.doc_id
JOIN binned b ON d.doc_id = b.doc_id
GROUP BY d.lang"""


_TOKS_SQL = ("list_filter(string_split_regex("
             "lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),"
             " t -> t != '')")


def _x74_sql() -> str:
    langs = ["de", "en", "es", "fr", "zh"]
    arms = ",\n       ".join(
        f"CAST(SUM(CASE WHEN lang = '{l}' THEN n_toks ELSE 0 END) AS BIGINT)"
        f" AS toks_{l}"
        for l in langs
    )
    return f"""
WITH t AS (SELECT source, lang, len({_TOKS_SQL}) AS n_toks FROM documents)
SELECT source,
       {arms},
       CAST(SUM(n_toks) AS BIGINT) AS toks_total
FROM t GROUP BY source"""


def _x75_sql() -> str:
    cuts = ",\n       ".join(
        f"COUNT(DISTINCT CASE WHEN doc_id < (SELECT COUNT(*) FROM documents) * {pct} // 100"
        f" THEN word END) AS vocab_p{pct}"
        for pct in (20, 40, 60, 80, 100)
    )
    return f"""
WITH w AS (SELECT doc_id, unnest({_TOKS_SQL}) AS word FROM documents)
SELECT {cuts}
FROM w"""


def _x61_sql() -> str:
    from ..operators.sampling import temperature_mix_summary_sql

    return temperature_mix_summary_sql("documents", "lang", "doc_id")


EXTENSION_ORACLE = {
    "x1_exact_dedup": dd.exact_dedup_sql(dd.AUGMENT_SQL),
    "x2_minhash_signatures": dd.minhash_signatures_sql(
        dd.shingles_sql(dd.AUGMENT_SQL)
    ),
    "x3_lsh_candidates": dd.lsh_candidates_sql(
        dd.minhash_signatures_sql(dd.shingles_sql(dd.AUGMENT_SQL))
    ),
    "x4_near_dups": dd.near_dup_sql(dd.AUGMENT_SQL),
    "x5_cosine_topk": COSINE_TOPK_SQL,
    "x6_ivf_topk": IVF_TOPK_SQL,
    "x7_lang_id": LANG_ID_SQL,
    "x8_quality_score": QUALITY_SQL,
    "x9_token_count": TOKEN_COUNT_SQL,
    "x10_fingerprint": FINGERPRINT_SQL,
    "x11_multimodal_decode": DECODE_META_SQL,
    "x12_asof_join": X12_ASOF_SQL,
    "x13_simhash": dd.simhash_sql(dd.AUGMENT_SQL),
    "x14_simhash_near_dups": dd.simhash_near_dups_sql(dd.simhash_sql(dd.AUGMENT_SQL)),
    "x15_embedding_near_dups": EMBEDDING_NEAR_DUP_SQL,
    "x16_salted_agg": X16_SQL,
    "x17_resize": RESIZE_META_SQL,
    "x18_features": FEATURES_SQL,
    "x19_sharded_index": X19_SQL,
    "x20_srp_lsh_near_dups": SRP_LSH_SQL,
    "x21_ivf_kmeans": IVF_KMEANS_SQL,
    "x22_srp_multiprobe": SRP_MULTIPROBE_SQL,
    "x23_format_roundtrip": X23_SQL,
    "x24_frame_sample": X24_SQL,
    "c1_curation_pipeline": _c1_sql(),
    "c4_training_manifest": _c4_sql(),
    "x83_filter_calibration": _x83_sql(),
    "x84_corrupt_ingest": X84_SQL,
    "x85_audio_features": _x85_sql(),
    "z15_stream_forget": Z15_SQL,
    "x86_schema_evolution": X86_SQL,
    "x87_tokenizer_fertility": _x87_sql(),
    "x88_dedup_savings": _x88_sql(),
    "x89_persisted_index": _x56_sql(),
    "z16_stream_index_screen": _x56_sql(),
    "x91_index_compaction": dd.incremental_near_dups_sql(
        f"SELECT * FROM ({dd.AUGMENT_SQL}) WHERE doc_id < {dd.NEAR_DUP_OFFSET}"
        f" OR doc_id % 2 = 0",
        f"SELECT * FROM ({dd.AUGMENT_SQL})"
        f" WHERE doc_id >= {dd.NEAR_DUP_OFFSET} AND doc_id % 2 = 1",
    ),
    "x25_train_test_split": X25_SQL,
    "x26_stratified_sample": X26_SQL,
    "x27_bigram_counts": ngram_counts_sql(n=2),
    "x28_redact_numbers": REDACT_SQL,
    "x29_quantile_bins": X29_SQL,
    "x30_asof_forward": X30_SQL,
    "x31_embedding_norms": X31_SQL,
    "x32_weighted_mix": _x32_sql(),
    "x33_dedup_clusters": dd.dedup_clusters_sql(dd.AUGMENT_SQL),
    "x34_repetition_stats": REPETITION_SQL,
    "x35_hll_registers": hll_registers_sql("lineitem", "l_orderkey"),
    "x36_cms_counts": cms_counts_sql("lineitem", "l_suppkey"),
    "x37_bloom_join_audit": bloom_join_audit_sql(
        "lineitem",
        "l_orderkey",
        "orders",
        "o_orderkey",
        build_where="o_orderpriority = '1-URGENT'",
    ),
    "x38_contamination_audit": f"""
WITH nd AS MATERIALIZED ({dd.near_dup_sql(dd.AUGMENT_SQL)}),
docs AS ({dd.AUGMENT_SQL}),
splits AS (SELECT doc_id, {hash_split_sql("doc_id")} AS split FROM docs)
SELECT sa.split AS split_a, sb.split AS split_b, COUNT(*) AS n_pairs,
       CAST(SUM(CASE WHEN sa.split != sb.split THEN 1 ELSE 0 END) AS BIGINT) AS n_leaking
FROM nd
JOIN splits sa ON sa.doc_id = nd.doc_a
JOIN splits sb ON sb.doc_id = nd.doc_b
GROUP BY 1, 2""",
    "x39_top_pc": top_pc_sql(),
    "x40_pc_projection": pc_projection_sql(),
    "x41_phrase_search": phrase_search_sql(PHRASE),
    "x42_hll_by_source": hll_registers_sql("documents", "doc_id", by=["source"]),
    "x44_cms_heavy_hitters": cms_heavy_hitters_sql("lineitem", "l_suppkey"),
    "x45_sequence_packing": pack_sequences_sql(),
    "x46_bottomk_sample": bottom_k_sample_sql(
        "doc_id, source", "documents", "doc_id", 100
    ),
    "x47_groupwise_sample": bottom_k_per_group_sql(
        "source, doc_id", "documents", "source", "doc_id", 20
    ),
    "x104_weighted_sample": _weighted_sample_oracle(),
    "x105_zipf_slope": _zipf_slope_oracle(),
    "x106_label_noise": _label_noise_oracle(),
    "x107_pii_scan": _pii_scan_oracle(),
    "x108_setsim_join": _setsim_join_oracle(),
    "x109_winnow_fingerprints": _winnow_oracle(),
    "x110_dup_span_coverage": _dup_span_oracle(),
    "x111_label_kappa": _label_kappa_oracle(),
    "x112_image_ahash": _ahash_oracle(),
    "x113_winnow_contamination": _winnow_contamination_oracle(),
    "x114_dup_span_removal": _dup_span_removal_oracle(),
    "z17_stream_ks": _z17_oracle(),
    "x115_audio_contour": _audio_contour_oracle(),
    "x116_lsh_recall": _lsh_recall_oracle(),
    "x117_pq_topk": _pq_oracle(),
    "x118_exact_contamination": _exact_contamination_oracle(),
    "x119_lsh_band_frontier": _lsh_band_frontier_oracle(),
    "x120_cross_source_dups": _cross_source_dups_oracle(),
    "x121_gram_spectrum": _gram_spectrum_oracle(),
    "x122_dedup_weights": _dedup_weights_oracle(),
    "x123_quality_canonical": _quality_canonical_oracle(),
    "x124_lsh_bucket_stats": _lsh_bucket_stats_oracle(),
    "x125_frontier_sampled": _frontier_sampled_oracle(),
    "c5_quality_manifest": _c5_sql(),
    "c6_trained_curation": _c6_sql(),
    "x126_variant_bucket_stats": _x126_sql(),
    "x133_variant_stats_sampled": _x133_sql(),
    "x135_normalized_dedup": _x135_sql(),
    "x136_dsir_resample": _x136_sql(),
    "x137_embedding_contamination": EMBEDDING_CONTAMINATION_SQL,
    "z22_stream_dsir_score": _z22_sql(),
    "z23_stream_contamination": EMBEDDING_CONTAMINATION_SQL,
    "c7_dsir_curation": _c7_sql(),
    "x138_boilerplate_removal": _x138_sql(),
    "x139_lsh_contamination": _x139_sql(),
    "z24_stream_boilerplate": _x138_sql(),
    "c8_scrub_curation": _c8_sql(),
    "x127_kmv_proof_audit": _x127_sql(),
    "x128_vocab_normalize": _x128_sql(),
    "x129_classifier_scores": _x129_sql(),
    "x130_classifier_calibration": _x130_sql(),
    "x131_perceptron_train": _x131_sql(),
    "x132_quality_mix": _x132_sql(),
    "z20_stream_classifier": _x129_sql(),
    "x48_chunk_windows": chunk_windows_sql(),
    "x49_curriculum_order": curriculum_order_sql(
        "documents",
        "source",
        "doc_id",
        "CAST(substring(source, 4) AS INT) % 4 + 1",
    ),
    "x50_value_histogram": _value_histogram_oracle(),
    "x51_bpe_merges": _bpe_merges_oracle(),
    "x90_batched_bpe": _batched_bpe_oracle(),
    "x92_stratified_iceberg": _stratified_iceberg_oracle(),
    "x94_rare_token_docs": _rare_token_docs_oracle(),
    "x95_window_dedup_rate": _window_dedup_rate_oracle(),
    "x99_cooccurrence_pmi": _cooccurrence_pmi_oracle(),
    "x98_scene_cuts": _scene_cuts_oracle(),
    "x100_quantize_embeddings": _quantize_oracle(),
    "x101_ngram_novelty": _novelty_oracle(),
    "x102_gopher_repetition": _gopher_repetition_oracle(),
    "x103_bigram_perplexity": _bigram_ppl_oracle(),
    "x96_length_percentiles": _length_percentiles_oracle(),
    "x93_doc_entropy": _doc_entropy_oracle(),
    "x52_char_lm_scores": _char_lm_oracle(),
    "x53_histogram_by_type": _histogram_by_type_oracle(),
    "x54_ngram_contamination": _ngram_contamination_oracle(),
    "x55_semantic_clusters": _x55_sql(),
    "x56_incremental_dedup": _x56_sql(),
    "x57_vocab_coverage": _x57_sql(),
    "x58_fuzzy_word_pairs": _x58_sql(),
    "c2_ingest_curation": _c2_sql(),
    "x59_bigram_lift": _x59_sql(),
    "x60_paragraph_dedup": _x60_sql(),
    "x61_temperature_mix": _x61_sql(),
    "x62_bpe_encode": _x62_sql(),
    "x63_containment": _x63_sql(),
    "x64_minhash_audit": _x64_sql(),
    "x65_lang_consistency": _x65_sql(),
    "x68_dataset_profile": _x68_sql(),
    "x69_pixel_decode": _x69_sql(),
    # x134 shares x69's generative oracle: the PNG builder rasterizes
    # the identical (x, row) channel formulas, so the SQL re-derives
    # the sums the zlib/unfilter path must reproduce byte-exactly
    "x134_png_decode": _x69_sql(),
    # z21 drains to exactly the batch x134 relation (per-doc
    # independence), so the streaming entry carries the same FULL
    # generative value-hash oracle, not a rows-only check
    "z21_stream_png_decode": _x69_sql(),
    "x70_pixel_resize": _x70_sql(),
    "x71_wav_decode": _x71_sql(),
    "x72_dedup_method_audit": _x72_sql(),
    "c3_model_gate": _c3_sql(),
    "x73_hll_shard_merge": hll_registers_sql("lineitem", "l_orderkey"),
    "x74_composition_matrix": _x74_sql(),
    "x75_vocab_growth": _x75_sql(),
    "x76_kmv_distinct": _x76_sql(),
    "x77_epoch_shuffle": _x77_sql(),
    "x78_ann_recall": _x78_sql(),
    "z14_stream_dedup": Z14_SQL,
    "x79_shard_manifest": _x79_sql(),
    "x80_threshold_curve": _x80_sql(),
    "x81_join_skew_audit": X81_SQL,
    "x82_kmv_overlap": _x82_sql(),
    "x67_orc_roundtrip": """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5000001) AS BIGINT)) AS BIGINT)
         AS sum_v_e2,
       MIN(event_id) AS min_id, MAX(event_id) AS max_id
FROM events GROUP BY event_type""",
    "x66_source_keywords": _x66_sql(),
    "x43_join_size_estimate": cms_join_size_estimate_sql(
        "lineitem",
        "l_orderkey",
        "orders",
        "o_orderkey",
        b_where="o_orderpriority = '1-URGENT'",
    ),
    # streaming queries: oracle = the BATCH twin's SQL (parity proof)
    "z1_stream_rollup": _E2_BATCH_SQL,
    "z2_stream_sessions": _E1_BATCH_SQL,
    "z18_stream_attribution": _E9_BATCH_SQL,
    "z19_stream_hourweek": _z19_oracle(),
    "z9_stream_bottomk": bottom_k_per_group_sql(
        "event_type, event_id", "events", "event_type", "event_id", 20
    ),
    "z3_stream_stream_join": Z3_SQL,
    "z4_sliding_rollup": Z4_SQL,
    "z5_stream_enrich": Z5_SQL,
    "z6_stream_hll": hll_registers_sql("events", "user_id"),
    "z7_session_window_stream": _E4_BATCH_SQL,
    "z8_stream_cms": cms_counts_sql("events", "user_id"),
    "z10_stream_histogram": _histogram_bins_oracle(),
    "z11_stream_funnel": _funnel_stage_oracle(),
    "z13_stream_ohlc": _W6_BATCH_SQL,
    "z12_stream_moments": """
SELECT user_id, COUNT(*) AS n,
       CAST(SUM(v3) AS BIGINT) AS s,
       CAST(SUM(v3 * v3) AS BIGINT) AS ss
FROM (SELECT user_id, CAST(FLOOR(value * 1000 + 0.5000001) AS BIGINT) AS v3
      FROM events WHERE event_type = 'purchase')
GROUP BY user_id""",
}
