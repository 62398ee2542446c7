"""PageRank: the reference's 13-job MapReduce pipeline as one declarative
Spark program.

Reference shape (PageRankAlgorithm.java:60-136): ① count N → ② parse
link graph → ③ 10× rank iterations → ④ global sort, with 13 full HDFS
materializations and no combiners.  Here: the corpus is parsed once and
persisted; N is a plain action; each iteration is `join → partial+final
aggregate → left join`; the static adjacency is persisted and
hash-partitioned once instead of being re-shipped through every shuffle
(the reference's "^"+links passthrough, PageRankAlgorithm.java:334,
381-383, moves the full link structure through the network 10 times).

Semantics preserved exactly (SURVEY.md §7.4):
- un-normalized Brin-Page recurrence ``new = (1-d) + d·Σ rank/outdeg``
  (PageRankAlgorithm.java:356-361,395) — teleport NOT divided by N;
- phantom link targets dropped every iteration (the "!" existence
  marker, PageRankAlgorithm.java:330,376-379) — expressed as the join
  direction: new ranks are computed FROM the pages relation;
- duplicate links each count toward outdegree and contribution
  (PageRankAlgorithm.java:336-340) — ``collect_list``/``explode``,
  never ``collect_set``/``array_distinct``;
- dangling pages keep receiving the (1-d) baseline but contribute
  nothing (mass leaks, no renormalization);
- fixed iteration count, no convergence test (PageRankAlgorithm.java:98).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textops import extract_links, extract_text_full, extract_title

DAMPING = 0.85
ITERATIONS = 10


def parse_corpus(corpus: DataFrame) -> DataFrame:
    """corpus(raw) → pages(title, links array<string>).

    The reference's LinkGraphMapper + LinkGraphReducer (PageRankAlgorithm
    .java:207-315) minus the rank column (added by :func:`link_graph`).
    The groupBy mirrors the reducer's concatenation of per-mapper link
    lists for a repeated title (PageRankAlgorithm.java:298-314);
    duplicates inside a page are preserved.
    """
    parsed = (
        corpus.where(F.length("raw") > 0)  # F1
        .select(
            extract_title("raw").alias("title"),
            extract_links(extract_text_full("raw")).alias("links"),
        )
        .where(F.col("title") != "")  # F2/F4
    )
    return parsed.groupBy("title").agg(
        # F.filter: guard against empty-string targets, the one artifact
        # of the reference's multi-line-doc path (SURVEY.md §7.4.2).
        F.filter(F.flatten(F.collect_list("links")), lambda x: x != "").alias("links")
    )


def count_n(pages: DataFrame) -> int:
    """A1: N = number of distinct page titles.  The reference burns a
    whole MapReduce job + a counter for this (PageRankAlgorithm.java:
    146-201); here it is one action over the already-parsed corpus
    (titles are distinct post-groupBy)."""
    return pages.count()


def link_graph(pages: DataFrame, n: int) -> DataFrame:
    """A2+A3: attach the initial rank 1/N (PageRankAlgorithm.java:300-304)."""
    return pages.select("title", F.lit(1.0 / n).alias("rank"), "links")


def edges(pages: DataFrame) -> DataFrame:
    """J2 prep: one row per link *occurrence* (duplicates preserved),
    with the source outdegree (PageRankAlgorithm.java:336-340).

    outdeg is computed before the explode so each occurrence carries
    the full duplicate-counting degree.
    """
    return (
        pages.where(F.size("links") > 0)
        .select(
            F.col("title").alias("src"),
            F.size("links").alias("outdeg"),
            F.explode("links").alias("dst"),
        )
    )


def _truncate_lineage(df: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    """S3 twin: eager lineage truncation.  Default is
    ``localCheckpoint`` — executor-local blocks, fast, but lost with an
    executor.  With ``checkpoint_dir`` set, a RELIABLE ``checkpoint()``
    to that filesystem dir (HDFS/S3 on a cluster): iteration state
    survives executor loss, which is the recipe SCALING.md prescribes
    for 1000-executor runs — one knob, no code edit."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=True)


def pagerank(
    pages: DataFrame,
    n: int | None = None,
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """I1 + J1/J2 + A4/A5: the full fixed-point loop → (title, rank).

    Scale notes (target: 1000-executor cluster, edges ≫ memory):
    - the static relations (titles, edges) are hash-partitioned on the
      join key once and persisted; Spark preserves the cached output
      partitioning, so per-iteration joins only shuffle the small
      (title, rank) relation;
    - the contribution sum gets automatic map-side partial aggregation
      (the combiner the reference never wrote);
    - lineage is truncated every ``checkpoint_every`` iterations via an
      eager localCheckpoint (swap for ``checkpoint()`` + a reliable
      checkpoint dir on a real cluster) — otherwise the plan depth grows
      linearly and a single task failure recomputes the whole chain.
      Each eager checkpoint costs one extra materialization, so the
      cadence is a recompute-risk/latency dial: measured locally at
      sf0.1, every-3 = 5.8s, every-5 = 3.6s, none = 1.1s for 10
      iterations; 5 balances that against bounded recovery at scale.
    - ``init_ranks`` (a (title, rank) DataFrame) WARM-STARTS the loop
      from a prior state instead of uniform 1/N — the restart path: a
      100 TB job killed at iteration k resumes from its checkpointed
      ranks and the remaining iterations produce exactly what the
      uninterrupted run would have (the recurrence only depends on the
      current rank vector).  Proven through the hash gate: warm-start
      4+6 ≡ straight 10 (`i3_warm_start`).
    """
    from .scale import adaptive_partitions

    spark = pages.sparkSession

    # Stage the parse once: both static relations derive from `pages`,
    # and materializing their caches independently would re-run the
    # corpus parse per relation (measured ~2× parse cost at sf0.1).
    pages_c = pages.persist()
    if n is None:
        n = pages_c.count()  # A1/S5: action replaces the Hadoop counter
        # (pages rows ARE the distinct titles: parse_corpus groupBys)
    # static caches sized from the MEASURED page count, capped by the
    # configured shuffle width (guide §2: derive partitioning from
    # input size, not a constant tuned for one deployment) — every
    # iteration stage inherits this width, so a 5k-page bench corpus
    # stops paying 32 scheduling-only tasks per stage while a cluster
    # run still saturates its configured parallelism.
    parts = adaptive_partitions(spark, n)
    titles = pages_c.select("title").repartition(parts, "title").persist()
    e = edges(pages_c).repartition(parts, "src").persist()
    titles.count()
    e.count()  # materialize the adjacency once (reference job ②)
    pages_c.unpersist()  # the staging cache served its purpose
    if n == 0:
        # empty corpus: the reference would divide by zero building
        # 1/N ranks (PageRankAlgorithm.java:302); return empty instead
        return titles.select("title", F.lit(0.0).alias("rank")).where(F.lit(False))

    if init_ranks is not None:
        ranks = init_ranks.select("title", "rank")
    else:
        ranks = titles.select("title", F.lit(1.0 / n).alias("rank"))
    for i in range(iterations):
        contribs = (
            e.alias("e")
            .join(ranks.alias("r"), F.col("e.src") == F.col("r.title"))
            .select(
                F.col("e.dst").alias("dst"),
                (F.col("r.rank") / F.col("e.outdeg")).alias("contrib"),
            )
        )
        mass = contribs.groupBy("dst").agg(F.sum("contrib").alias("mass"))
        # Left join FROM pages: valid-page gate (F3) — phantom targets in
        # `mass` never survive; linkless-but-valid pages get the (1-d)
        # baseline via coalesce (the reducer's sum=0 path).
        ranks = (
            titles.alias("t")
            .join(mass.alias("m"), F.col("t.title") == F.col("m.dst"), "left")
            .select(
                F.col("t.title").alias("title"),
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("m.mass"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if checkpoint_dir is not None:
            # reliable-checkpoint cadence: cluster restart durability (S3)
            if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
                ranks = _truncate_lineage(ranks, checkpoint_dir)
        else:
            # lazy per-round localCheckpoint: plan depth stays O(1)
            # instead of growing per round, and the cadence form's
            # dedicated eager-materialization job disappears (S3 —
            # the next action materializes the truncated frame)
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def weighted_pagerank(
    pages: DataFrame,
    n: int | None = None,
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Edge-weighted PageRank: a source splits its rank over out-edges
    proportionally to edge WEIGHT (w / Σw) instead of uniformly
    (1 / outdeg) — link strength (co-citation counts, anchor
    frequency) biases the walk.  Same un-normalized recurrence and
    phantom-gate semantics as :func:`pagerank`
    (PageRankAlgorithm.java:96-114 with the 1/outdeg split replaced).

    Weights are the deterministic 1..5 integers derived from the
    target title (operators/graph.py:edge_weight — same derivation as
    g8's SSSP so both engines agree bit-for-bit).  The per-source
    total rides the persisted static edge relation, computed ONCE by a
    co-partitioned self-aggregate before the loop: per-iteration cost
    is identical to the unweighted loop (one join + one partial-agg
    sum over the moving rank relation)."""
    from .graph import edge_weight
    from .scale import adaptive_partitions

    spark = pages.sparkSession

    pages_c = pages.persist()
    if n is None:
        n = pages_c.count()
    parts = adaptive_partitions(spark, n)  # measured-size static caches
    titles = pages_c.select("title").repartition(parts, "title").persist()
    we = (
        edges(pages_c)
        .select("src", "dst", edge_weight(F.col("dst")).alias("w"))
        .repartition(parts, "src")
    )
    wtot = we.groupBy("src").agg(F.sum("w").alias("wout"))
    e = we.join(wtot, "src").persist()  # co-partitioned: no extra shuffle
    titles.count()
    e.count()
    pages_c.unpersist()
    if n == 0:
        return titles.select("title", F.lit(0.0).alias("rank")).where(F.lit(False))

    ranks = titles.select("title", F.lit(1.0 / n).alias("rank"))
    for i in range(iterations):
        contribs = (
            e.alias("e")
            .join(ranks.alias("r"), F.col("e.src") == F.col("r.title"))
            .select(
                F.col("e.dst").alias("dst"),
                (F.col("r.rank") * F.col("e.w") / F.col("e.wout")).alias(
                    "contrib"
                ),
            )
        )
        mass = contribs.groupBy("dst").agg(F.sum("contrib").alias("mass"))
        ranks = (
            titles.alias("t")
            .join(mass.alias("m"), F.col("t.title") == F.col("m.dst"), "left")
            .select(
                F.col("t.title").alias("title"),
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("m.mass"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if checkpoint_dir is not None:
            # reliable-checkpoint cadence: cluster restart durability
            if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
                ranks = _truncate_lineage(ranks, checkpoint_dir)
        else:
            # lazy per-round localCheckpoint: plan depth stays O(1)
            # instead of growing per round (and the cadence form's
            # dedicated eager-materialization job disappears — the
            # next action materializes the truncated frame).  Old
            # rounds' blocks are freed by ContextCleaner as their
            # frames drop out of the lineage.
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


SEED_ISIN_MAX = 64  # above this, seeds go cluster-side via broadcast join


def personalized_pagerank(
    pages: DataFrame,
    sources: list[str],
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
    checkpoint_every: int = 5,
    seed_isin_max: int = SEED_ISIN_MAX,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Personalized PageRank: teleport mass returns only to ``sources``
    (uniformly), not to every page — relevance ranking *relative to a
    seed set* (query-biased ranking, related-page discovery).  An
    extension of the reference's global recurrence
    (PageRankAlgorithm.java:96-114): same un-normalized update with the
    constant (1-d) term replaced by ``(1-d)/|S|·[v ∈ S]``.

    Same scale skeleton as :func:`pagerank` (static edge relation
    hash-partitioned once + persisted; only the small rank relation
    moves per iteration; lineage truncated on a cadence).  Seed-set
    channel by size: up to ``seed_isin_max`` seeds fold into the plan
    as an ``isin`` literal (S4 channel — zero extra joins); above
    that, the seeds become a DataFrame broadcast-joined onto the
    static title relation ONCE before the loop (an is_seed flag column
    rides the persisted relation, so the per-iteration plans are
    identical either way and a million-seed set never serializes into
    the query plan).
    """
    if not sources:
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    from .scale import adaptive_partitions

    spark = pages.sparkSession
    pages_c = pages.persist()
    parts = adaptive_partitions(spark, pages_c.count())
    titles = pages_c.select("title")
    if len(sources) <= seed_isin_max:
        titles = titles.select(
            "title", F.col("title").isin(*sources).alias("is_seed")
        )
    else:
        seeds_df = spark.createDataFrame(
            [(t,) for t in sources], "title string"
        ).withColumn("is_seed", F.lit(True))
        titles = (
            titles.join(F.broadcast(seeds_df), "title", "left")
            .select("title", F.coalesce("is_seed", F.lit(False)).alias("is_seed"))
        )
    titles = titles.repartition(parts, "title").persist()
    e = edges(pages_c).repartition(parts, "src").persist()
    titles.count()
    e.count()
    pages_c.unpersist()

    s = float(len(sources))
    teleport = F.when(
        F.col("t.is_seed"), F.lit((1.0 - damping) / s)
    ).otherwise(F.lit(0.0))
    init = F.when(F.col("is_seed"), F.lit(1.0 / s)).otherwise(F.lit(0.0))
    ranks = titles.select("title", init.alias("rank"))
    for i in range(iterations):
        contribs = (
            e.alias("e")
            .join(ranks.alias("r"), F.col("e.src") == F.col("r.title"))
            .select(
                F.col("e.dst").alias("dst"),
                (F.col("r.rank") / F.col("e.outdeg")).alias("contrib"),
            )
        )
        mass = contribs.groupBy("dst").agg(F.sum("contrib").alias("mass"))
        ranks = (
            titles.alias("t")
            .join(mass.alias("m"), F.col("t.title") == F.col("m.dst"), "left")
            .select(
                F.col("t.title").alias("title"),
                (
                    teleport
                    + F.lit(damping) * F.coalesce(F.col("m.mass"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if checkpoint_dir is not None:
            # reliable-checkpoint cadence: cluster restart durability
            if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
                ranks = _truncate_lineage(ranks, checkpoint_dir)
        else:
            # lazy per-round localCheckpoint: plan depth stays O(1)
            # instead of growing per round (and the cadence form's
            # dedicated eager-materialization job disappears — the
            # next action materializes the truncated frame).  Old
            # rounds' blocks are freed by ContextCleaner as their
            # frames drop out of the lineage.
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def pagerank_until(
    pages: DataFrame,
    tol: float = 1e-6,
    max_iterations: int = 50,
    damping: float = DAMPING,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Convergence-terminated PageRank — an extension the reference
    deliberately lacks (fixed 10 rounds, README.md:70): iterate until
    ``max |Δrank| < tol`` or ``max_iterations``.

    The delta check is one extra action per iteration (a max over the
    joined old/new relation — small, same partitioning, no extra wide
    op on the adjacency).  Returns (title, rank, iterations) with the
    iteration count that achieved convergence on every row.
    """
    from .scale import adaptive_partitions

    spark = pages.sparkSession

    pages_c = pages.persist()
    n = pages_c.count()
    parts = adaptive_partitions(spark, n)  # measured-size static caches
    titles = pages_c.select("title").repartition(parts, "title").persist()
    e = edges(pages_c).repartition(parts, "src").persist()
    titles.count()
    e.count()
    pages_c.unpersist()
    if n == 0:
        # same empty-corpus guard as pagerank(): 1/N is undefined
        return titles.select(
            "title", F.lit(0.0).alias("rank"), F.lit(0).alias("iterations")
        ).where(F.lit(False))

    ranks = titles.select("title", F.lit(1.0 / n).alias("rank")).localCheckpoint(
        eager=False
    )
    done = 0
    for i in range(max_iterations):
        contribs = (
            e.alias("e")
            .join(ranks.alias("r"), F.col("e.src") == F.col("r.title"))
            .select(
                F.col("e.dst").alias("dst"),
                (F.col("r.rank") / F.col("e.outdeg")).alias("contrib"),
            )
        )
        mass = contribs.groupBy("dst").agg(F.sum("contrib").alias("mass"))
        new_ranks = (
            titles.alias("t")
            .join(mass.alias("m"), F.col("t.title") == F.col("m.dst"), "left")
            .select(
                F.col("t.title").alias("title"),
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("m.mass"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if checkpoint_dir is not None and (i + 1) % checkpoint_every == 0:
            # reliable-checkpoint cadence for cluster runs (restart
            # durability); locally the lazy branch below already
            # truncates every round
            new_ranks = _truncate_lineage(new_ranks, checkpoint_dir)
        else:
            # ranks is referenced twice per round (the contribution
            # join and the delta join), so the analyzed plan doubles
            # per round; the lazy per-round checkpoint keeps it flat
            # and the delta action materializes it in the job it
            # already pays (see graph.connected_components_until)
            new_ranks = new_ranks.localCheckpoint(eager=False)
        delta = (
            new_ranks.alias("n")
            .join(ranks.alias("o"), "title")
            .agg(F.max(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("d"))
            .first()["d"]
        )
        ranks = new_ranks
        done = i + 1
        if delta < tol:
            break
    return ranks.select("title", "rank", F.lit(done).alias("iterations"))


def ranking(ranks: DataFrame, with_position: bool = False) -> DataFrame:
    """O1: global descending sort by rank, title as deterministic
    tiebreak (the reference's tie order is shuffle-arrival order,
    PageRankAlgorithm.java:432 — documented deviation, SURVEY.md §7.4.6).

    ``orderBy`` range-partitions after sampling → a parallel total sort,
    replacing the reference's single-reducer bottleneck
    (PageRankAlgorithm.java:117-129).  ``with_position`` adds a global
    row_number via the parallel offset operator (operators/ranking.py)
    — never a single-partition window.
    """
    if with_position:
        from .ranking import with_global_position

        return with_global_position(
            ranks, [F.desc("rank"), F.asc("title")]
        ).select("title", "rank", "pos")
    return ranks.orderBy(F.desc("rank"), F.asc("title"))


def top_k(ranks: DataFrame, k: int) -> DataFrame:
    """Natural extension (no LIMIT exists in the reference): TakeOrdered
    — per-partition top-k then merge, no global sort."""
    return ranks.orderBy(F.desc("rank"), F.asc("title")).limit(k)
