"""Structured Streaming variants of the event operators.

The reference is batch-only (Hadoop MR), so everything here is
extension surface: the same event analytics as plans/relational, but
incremental — file-source streams, watermarked tumbling windows,
streaming dedup, and a custom stateful sessionizer built on
``applyInPandasWithState`` (the blessed Spark surface for operators
whose state machine the built-ins can't express).

Scale notes: the file source lists incrementally and each micro-batch
is a normal Catalyst plan; the window aggregation keeps per-(window,
type) state with the watermark bounding state size; sessionization
keys state by user_id, so state shards across executors with the
shuffle and a skewed user degrades one task, not the query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Historical note: events.ts has been written as TIMESTAMP(NANOS)
# (readable only as long via nanosAsLong) and as plain micros.  The
# stream reader derives its required explicit schema from a footer-only
# batch peek of the directory, so both — and any future re-typing —
# work unchanged; sources.tables.normalize_event_ts then lands every
# variant on TimestampType.


def stage_table_dir(sf_dir: str, table: str = "events") -> str:
    """The file stream source requires a DIRECTORY; the testdata layout
    is one flat dir of per-table parquet files.  Stage a temp dir with
    a symlink to the single table file (no data copy)."""
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix=f"stream_{table}_")
    os.symlink(f"{sf_dir}/{table}.parquet", f"{d}/{table}.parquet")
    return d


def read_event_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a directory of events parquet files.
    ``ts`` is normalized to TimestampType whichever way the files were
    written — long nanos (older testdata, via nanosAsLong) or native
    micros (current testdata) — by the same rules as the batch loader
    (:func:`..sources.tables.normalize_event_ts`).

    ``max_files_per_trigger`` caps files per micro-batch — the test
    harness uses it to force multi-batch (and out-of-order) delivery
    from a static directory."""
    # Runtime-set for driver-owned sessions (same reason as
    # sources.tables.load_table): NANOS-era events.ts is readable only
    # as long nanos with this legacy conf on.
    # PERSISTENT SESSION SIDE EFFECT (deliberate, same as load_table):
    # the conf stays on for the session — micro-batches consult it at
    # execution time, so restoring it after planning would break the
    # stream.  Later parquet reads in this session see NANOS columns
    # as longs; events.ts is the only such testdata column.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The file source needs an explicit schema; peek at the directory
    # with a one-off batch read (footer-only, no data scan) to learn
    # which physical ts type this generation of files carries.
    from ..sources.tables import normalize_event_ts

    try:
        peeked = spark.read.parquet(events_dir).schema
    except Exception:
        # Directory empty (files arrive later) or unreadable at stream
        # definition time: fall back to the current testdata shape
        # (native micros ts).  The adaptive peek still wins whenever a
        # file is present, which is how the NANOS-era files get their
        # long-typed ts.
        peeked = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
                T.StructField("props", T.StringType()),
            ]
        )
    reader = spark.readStream.schema(peeked)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return normalize_event_ts(reader.parquet(events_dir))


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window rollup — the streaming twin of
    plans.relational.e2_hourly_rollup."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5000001)).cast("long")
            ).alias("sum_value_e2"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("hour_epoch"),
            "event_type",
            "n",
            "sum_value_e2",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id with watermark-bounded state.

    ``dropDuplicatesWithinWatermark`` is the operator whose state the
    watermark actually evicts: a key's entry is dropped once the
    watermark passes its event time, so state is bounded by (event
    rate x watermark delay).  Plain ``dropDuplicates([\"event_id\"])``
    would NOT evict — without the event-time column in the subset its
    keys live forever, growing state unboundedly on a real stream.
    Duplicates farther apart than the watermark delay may both survive;
    that is the documented trade for bounded state.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


SESSION_GAP_S = 1800
_SESSION_OUT_SCHEMA = "user_id long, n_sessions long, n_events long"
_SESSION_STATE_SCHEMA = "starts array<long>, ends array<long>, n_events long"


def _merge_intervals(
    starts: np.ndarray, ends: np.ndarray, gap_us: int
) -> tuple[np.ndarray, np.ndarray]:
    """Merge [start, end] intervals whose gap is <= gap_us (vectorized;
    inputs need not be sorted).  Pure function so the cross-batch fold
    is unit-testable without a streaming harness."""
    order = np.argsort(starts, kind="stable")
    starts, ends = starts[order], ends[order]
    cummax_end = np.maximum.accumulate(ends)
    # strictly-greater gap opens a new session — same strictness as the
    # batch twin's `ts - lag(ts) > gap`
    brk = np.concatenate(([True], starts[1:] > cummax_end[:-1] + gap_us))
    idx = np.flatnonzero(brk)
    return starts[idx], np.maximum.reduceat(ends, idx)


def sessionize_stream(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Custom stateful operator: per-user session counting with a
    ``gap_s`` inactivity gap, state carried across micro-batches.

    Batch-equivalent: plans.relational.e1_sessions (lag + running sum).

    Cross-batch ordering: the fold is ORDER-INSENSITIVE.  State is the
    user's merged session intervals (start/end event-time arrays), and
    each batch's event times are merged in as point intervals — so a
    late event arriving in a later micro-batch lands in (or bridges,
    or opens) exactly the session it would have produced in a single
    sorted batch.  Any partition of the events into micro-batches, in
    any order, yields the same final (n_sessions, n_events).

    State size: O(#sessions per user), not O(#events) — bounded by the
    user's activity span / gap, and by construction can only shrink as
    sessions merge.  A production variant would additionally seal and
    emit intervals older than a watermark (they can no longer change)
    to cap state for unbounded retention; with NoTimeout here, totals
    stay exact and re-emittable every batch.
    """
    gap_us = gap_s * 1_000_000

    def update(
        key: tuple, pdfs, state: GroupState
    ):
        if state.exists:
            starts, ends, n_events = state.get
            starts = np.asarray(starts, dtype=np.int64)
            ends = np.asarray(ends, dtype=np.int64)
        else:
            starts = np.empty(0, dtype=np.int64)
            ends = np.empty(0, dtype=np.int64)
            n_events = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            us = pdf["ts"].astype("int64").to_numpy() // 1000
            starts = np.concatenate([starts, us])
            ends = np.concatenate([ends, us])
            starts, ends = _merge_intervals(starts, ends, gap_us)
            n_events += len(us)
        state.update((starts.tolist(), ends.tolist(), n_events))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [len(starts)],
                "n_events": [n_events],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        _SESSION_OUT_SCHEMA,
        _SESSION_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


JOIN_WINDOW_S = 3600


def click_purchase_join_stream(
    events: DataFrame, watermark: str = "2 hours", window_s: int = JOIN_WINDOW_S
) -> DataFrame:
    """Watermarked stream-stream self-join: each purchase matched to the
    same user's clicks in the preceding ``window_s`` seconds.

    Both sides carry watermarks + the time-range join condition, which
    is what lets Spark bound the join state (clicks older than the
    window past the watermark are evicted).  The batch twin is the
    z3 oracle SQL — identical result, proving the incremental plan.
    """
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window_s} SECONDS"))
        & (F.col("c_ts") < F.col("p_ts")),
        "inner",
    )
    return joined.select(
        "purchase_id", "click_id", F.col("p_user").alias("user_id")
    )


def measured_state_partitions(
    spark: SparkSession, events_dir: str
) -> int | None:
    """Scale-adaptive state-store width for a stream whose source is
    ``events_dir`` (guide §2.2 applied to streaming state).

    Structured Streaming pins its state-store partition count to
    ``spark.sql.shuffle.partitions`` AT QUERY START (the checkpoint
    then holds it for the query's lifetime), so a stateful query over
    a small input pays the full configured width in state-store
    init/commit tasks EVERY micro-batch — the r11 scaling block's
    worst anti-scaler (z3 ran 2.4x faster on 8 cores than 32 purely
    from this fixed overhead).  Measure the source once (a parquet
    count is footer-metadata work, no column decode) and size like
    the batch operators' adaptive_partitions: rows/16k clamped to
    [1, configured shuffle width], so a real deployment's conf still
    rules.  Returns None (caller keeps the conf default) when the
    directory cannot be read."""
    from ..operators.scale import adaptive_partitions

    try:
        n = spark.read.parquet(events_dir).count()
    except Exception:
        return None
    return adaptive_partitions(spark, n)


class _scoped_shuffle_partitions:
    """Set spark.sql.shuffle.partitions for the duration of a stream
    start+drain, restoring the session value after.  AvailableNow
    drains every micro-batch inside awaitTermination, and the state
    width is captured at query start, so the scope covers exactly the
    query that should see it."""

    def __init__(self, spark: SparkSession, n: int | None):
        self.spark, self.n = spark, n

    def __enter__(self):
        if self.n is not None:
            self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
            self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))

    def __exit__(self, *exc):
        if self.n is not None:
            self.spark.conf.set("spark.sql.shuffle.partitions", self.old)
        return False


def run_foreach_batch(
    stream: DataFrame,
    batch_fn,
    output_mode: str = "append",
    state_partitions: int | None = None,
) -> None:
    """Drain the stream through ``foreachBatch`` — the production sink
    pattern: each micro-batch arrives as a BATCH DataFrame plus its
    batch id, so any batch writer (parquet/jdbc/merge-into) becomes a
    streaming sink with exactly-once semantics via the (checkpoint,
    batch_id) pair.  ``batch_fn(df, batch_id)`` is called per batch.
    ``state_partitions``: measured-size state-store width (see
    :func:`measured_state_partitions`)."""
    spark = stream.sparkSession
    with _scoped_shuffle_partitions(spark, state_partitions):
        q = (
            stream.writeStream.foreachBatch(batch_fn)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def run_available_now(
    stream: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    last_write_key: list[str] | None = None,
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain all available input into an in-memory table and return it
    (test/driver harness helper).

    ``last_write_key``: for UPDATE-mode stateful queries that re-emit a
    key's answer every micro-batch (e.g. last-touch attribution, which
    re-attributes every touched purchase per batch), the memory sink
    APPENDS rather than upserting — multi-batch delivery (multi-file
    stage dir, ``maxFilesPerTrigger``) would leave duplicate and
    contradictory rows per key.  Pass the logical key columns and the
    drained table is reduced to each key's LAST emission (max batch
    id), restoring upsert semantics regardless of how many batches the
    drain took.  Uses a ``foreachBatch`` parquet stage (batch id is not
    visible through the memory sink).  ASSUMES the stateful query
    emits at most ONE row per key per micro-batch (true of any keyed
    aggregate, e.g. z18's per-purchase attribution) — with several
    same-key rows in one batch the within-batch pick would be
    arbitrary.  The staged parquet is deleted before returning; the
    result is materialized (eager localCheckpoint) first, so the
    returned frame never references the deleted directory.

    ``state_partitions``: measured-size state-store width, scoped to
    the stream's start+drain (see :func:`measured_state_partitions`);
    None keeps the session conf."""
    if last_write_key:
        import shutil
        import tempfile

        from pyspark.sql import Window

        out_dir = tempfile.mkdtemp(prefix=f"drain_{query_name}_")
        spark = stream.sparkSession
        try:
            def _sink(df: DataFrame, batch_id: int) -> None:
                df.withColumn("_batch_id", F.lit(batch_id)).write.mode(
                    "append"
                ).parquet(out_dir)

            with _scoped_shuffle_partitions(spark, state_partitions):
                q = (
                    stream.writeStream.foreachBatch(_sink)
                    .queryName(query_name)
                    .outputMode(output_mode)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
            cols = stream.columns
            drained = spark.read.parquet(out_dir)
            w = Window.partitionBy(*last_write_key).orderBy(
                F.col("_batch_id").desc()
            )
            return (
                drained.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .select(*cols)
                .localCheckpoint(eager=True)
            )
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
    with _scoped_shuffle_partitions(stream.sparkSession, state_partitions):
        q = (
            stream.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return stream.sparkSession.table(query_name)


def sliding_rollup_stream(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked SLIDING-window rollup: each event lands in
    window/slide overlapping windows (2 here), the windowing mode the
    tumbling z1 rollup can't express (moving averages, overlap-smoothed
    rates).  State per (window, type) key as with tumbling — the
    watermark still evicts closed windows; the only cost of overlap is
    window/slide× more live keys."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5000001)).cast("long")
            ).alias("sum_value_e2"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("win_epoch"),
            "event_type",
            "n",
            "sum_value_e2",
        )
    )


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: the dimension is a plain batch
    DataFrame re-read every micro-batch — the standard pattern for
    slowly-changing lookup tables; no state is kept for the static
    side.  ``broadcast_dim`` hints the broadcast (right for the usual
    small-dim case); pass ``False`` when the dimension is too large to
    fit executor memory — Spark then plans a shuffled join per
    micro-batch instead of OOMing on the build side."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return events.join(d, events[stream_key] == dim[dim_key], "inner")


def hll_registers_stream(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Streaming HLL register table over ``key`` — the incremental twin
    of :func:`..operators.sketches.hll_registers`.  max-per-register is
    a monotone merge, so complete-mode state is a fixed 2^p rows and the
    drained result is BIT-IDENTICAL to the batch sketch on the same
    input regardless of micro-batch partitioning (the z-series parity
    pattern: the oracle is the batch SQL)."""
    from ..operators.sketches import hll_registers

    return hll_registers(events, key)


_FUNNEL_OUT_SCHEMA = "user_id long, stage long"
_FUNNEL_STATE_SCHEMA = "t0 long, t1 long, t2 long"
_FUNNEL_INF = 1 << 62  # "not seen yet" — min-merge identity


def funnel_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user funnel STATE MACHINE — the
    streaming twin of the batch funnel (plans.relational.e6 /
    E6_STAGE_SQL).  Emits each user's strict first-occurrence stage
    (0-3) through view -> click -> purchase.

    Cross-batch ordering: state is the per-step MINIMUM first-seen
    timestamp, and min-merge is an order-insensitive monotone fold
    (the same parity argument as the HLL register max-merge, z6) — any
    partition of the events into micro-batches, in any order,
    converges to the stage a single sorted batch would produce.
    State is three longs per user, O(1) regardless of event volume.
    """
    from ..plans.relational import FUNNEL_STEPS

    def update(key: tuple, pdfs, state: GroupState):
        t = list(state.get) if state.exists else [_FUNNEL_INF] * 3
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            us = pdf["ts"].astype("int64").to_numpy() // 1000
            et = pdf["event_type"].to_numpy()
            for i, step in enumerate(FUNNEL_STEPS):
                hit = us[et == step]
                if len(hit):
                    t[i] = min(t[i], int(hit.min()))
        state.update(tuple(t))
        stage = 0
        if t[0] < _FUNNEL_INF:
            stage = 1
            if t[1] < _FUNNEL_INF and t[1] > t[0]:
                stage = 2
                if t[2] < _FUNNEL_INF and t[2] > t[1]:
                    stage = 3
        yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        _FUNNEL_OUT_SCHEMA,
        _FUNNEL_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def value_histogram_stream(events: DataFrame, col: str = "value") -> DataFrame:
    """Streaming fixed-bin histogram over ``col`` — the incremental
    twin of :func:`..operators.sketches.value_histogram`.  Per-bin
    counts are ADDITIVE, so complete-mode state is at most ``nbins``
    rows and the drained counts equal the batch sketch on the same
    input (oracle = the batch bins SQL).  The batch operator's
    cumulative column is deliberately absent: a non-time window after
    a streaming aggregate is unsupported, and cum is a cheap batch
    post-pass over <= nbins rows anyway."""
    from ..operators.sketches import histogram_bins

    return histogram_bins(events, col)


def session_window_stream(
    events: DataFrame, gap_s: int = SESSION_GAP_S, watermark: str = "2 hours"
) -> DataFrame:
    """Spark's NATIVE session-window aggregation on the stream — the
    built-in complement to the custom applyInPandasWithState
    sessionizer (:func:`sessionize_stream`): engine-managed merging
    session state, one output row per session.  Same schema and
    boundary semantics (events exactly gap apart MERGE; only
    diff > gap opens a new session) as the batch twin
    ``plans.relational.e4_session_windows``, which is its oracle."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            "user_id", F.session_window("ts", f"{gap_s} seconds").alias("sw")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5000001)).cast("long")
            ).alias("sum_value_e2"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("sess_start_us"),
            F.unix_micros(F.col("sw.end")).alias("sess_end_us"),
            "n_events",
            "sum_value_e2",
        )
    )


def cms_counts_stream(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Streaming count-min table over ``key`` — the incremental twin of
    :func:`..operators.sketches.cms_counts`.  Cell counts are ADDITIVE,
    so complete-mode state is the fixed depth×width table and the
    drained result equals the batch sketch on the same input (oracle =
    the batch SQL), the same parity pattern as the HLL stream."""
    from ..operators.sketches import cms_counts

    return cms_counts(events, key)


BK_STREAM_K = 20
_BK_OUT_SCHEMA = "event_type string, event_id long"
_BK_STATE_SCHEMA = "hashes array<string>, ids array<long>"


def bottom_k_stream(
    events: DataFrame, k: int = BK_STREAM_K, seed: str = "bkg-0"
) -> DataFrame:
    """Streaming per-group bottom-k sample: for each ``event_type``,
    maintain the ``k`` event_ids with the smallest ``md5(seed|id)``
    across micro-batches — the streaming twin of
    ``operators.sampling.bottom_k_per_group`` (z-series parity: the
    batch SQL is the oracle).

    The state is a MERGEABLE MONOTONE sketch: min-k of a union is
    min-k of min-ks, so the fold is order-insensitive — any partition
    of the events into micro-batches, in any order, converges to the
    same membership a single batch would produce (the same argument as
    the HLL register max-merge, z6).  State size is O(k) per group
    regardless of stream length; duplicate ids collapse via the hash
    key.  Each batch re-emits the group's full current membership
    (update mode), so the final generation IS the sample.
    """

    def update(key: tuple, pdfs, state: GroupState):
        import hashlib

        if state.exists:
            hashes, ids = state.get
            pairs = dict(zip(list(hashes), list(ids)))
        else:
            pairs = {}
        for pdf in pdfs:
            for eid in pdf["event_id"]:
                e = int(eid)
                h = hashlib.md5(f"{seed}|{e}".encode()).hexdigest()
                pairs[h] = e
        best = sorted(pairs.items())[:k]
        state.update(([h for h, _ in best], [i for _, i in best]))
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(best),
                "event_id": [i for _, i in best],
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        _BK_OUT_SCHEMA,
        _BK_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def user_moments_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user purchase moments: (user_id, n, s, ss) over
    e3-quantized values — the state a live 2σ outlier monitor needs
    (plans.relational.e8 evaluates the flag from exactly these sums).

    Parity argument (the z-series pattern): count/sum/sum-of-squares
    are ADDITIVE integer merges, so complete-mode state is 3 longs per
    user and the drained result is bit-identical to the batch
    aggregation however the stream is micro-batched.  Integer e3
    quantization happens BEFORE the sums — no float accumulation
    order to diverge."""
    v3 = F.floor(F.col("value") * 1000 + F.lit(0.5000001)).cast("long")
    return (
        events.where(F.col("event_type") == "purchase")
        .select("user_id", v3.alias("v3"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("v3").alias("s"),
            F.sum(F.col("v3") * F.col("v3")).alias("ss"),
        )
    )


def hourly_ohlc_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch OHLC candles
    (plans.relational.w6_hourly_ohlc): per (event_type, hour), open/
    close as MIN/MAX over (ts, event_id, value_e3) structs plus plain
    low/high.  Every aggregate is a monotone min/max merge over
    integer-quantized state, so complete-mode drain is bit-identical
    to the batch query at any micro-batch partitioning — the candle
    chart that updates live without a nightly recompute."""
    v3 = F.floor(F.col("value") * 1000 + F.lit(0.5000001)).cast("long")
    ts_us = F.unix_micros(F.col("ts"))
    keyed = events.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).cast("string").alias("hour"),
        F.struct(
            ts_us.alias("t"), F.col("event_id").alias("e"), v3.alias("v")
        ).alias("o"),
        v3.alias("v3"),
    )
    return keyed.groupBy("event_type", "hour").agg(
        F.min("o").getField("v").alias("open_v3"),
        F.max("o").getField("v").alias("close_v3"),
        F.min("v3").alias("low_v3"),
        F.max("v3").alias("high_v3"),
        F.count("*").alias("n"),
    )


def forget_users_stream(events: DataFrame, forget: DataFrame) -> DataFrame:
    """Stream-static LEFT ANTI join: drop every in-flight event of the
    deletion-request users — d4's right-to-be-forgotten rule applied
    AT INGEST, so deleted users never re-enter downstream state.  The
    (tiny) request list broadcasts per micro-batch like any
    slowly-changing dimension; no streaming state is kept for it."""
    return events.join(
        F.broadcast(forget), events["user_id"] == forget["fuid"], "left_anti"
    )


def read_document_stream(
    spark: SparkSession, docs_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a directory of documents parquet files
    (the ingest feed for the streaming dedup screen, z16)."""
    reader = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string,"
            " n_chars long"
        )
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(docs_dir)


def ks_counts_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of d6's KS grid state: per-(event_type, v_e2)
    half counts — ADDITIVE, so complete-mode state is the bounded e2
    grid (value-range-bounded, not data-bounded) and the drained
    counts equal the batch grid on the same input.  The sup-gap finish
    (``plans.relational.ks_from_counts``) runs as a batch post-pass
    over the drained grid, the same split as z10's histogram (a
    non-time window after a streaming aggregate is unsupported, and
    the finish is cheap on <= grid rows)."""
    from ..plans.relational import ks_grid_counts

    return ks_grid_counts(events)


# --------------------------------------------------------------------------
# Streaming last-touch attribution (z18) — the stateful streaming twin
# of batch e9: every purchase attributed to the user's most recent
# click within the attribution window, with state carried across
# micro-batches.
#
# Cross-batch ordering: the fold is ORDER-INSENSITIVE.  State is the
# user's full (click, purchase) event sets; each batch merges its rows
# in and RE-attributes every purchase of the user, so an out-of-order
# click arriving in a later micro-batch retroactively corrects the
# attribution to exactly the single-sorted-batch answer (update mode:
# the corrected row is re-emitted).  Tie rule matches the e9 oracle:
# latest click ts, then largest click event_id.
#
# State size: O(user events) here so totals stay exact and the oracle
# can be the batch e9 SQL; a production variant seals events older
# than watermark + window (their attribution can no longer change) and
# evicts them — the same bound/exactness trade documented on the
# sessionizer.
# --------------------------------------------------------------------------

_ATTR_OUT_SCHEMA = (
    "event_id long, user_id long, attributed_click_id long"
)
_ATTR_STATE_SCHEMA = (
    "c_ts array<long>, c_id array<long>, p_ts array<long>, p_id array<long>"
)


def attribution_stream(events: DataFrame, window_s: int = 1800) -> DataFrame:
    """(event_id, user_id, attributed_click_id) per purchase, -1 when
    no click within ``window_s`` seconds precedes it."""
    win_us = window_s * 1_000_000

    def update(key: tuple, pdfs, state: GroupState):
        if state.exists:
            c_ts, c_id, p_ts, p_id = (
                list(x) for x in state.get
            )
        else:
            c_ts, c_id, p_ts, p_id = [], [], [], []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            us = pdf["ts"].astype("int64").to_numpy() // 1000
            kinds = pdf["event_type"].to_numpy()
            ids = pdf["event_id"].astype("int64").to_numpy()
            for t, kind, eid in zip(us, kinds, ids):
                if kind == "click":
                    c_ts.append(int(t)); c_id.append(int(eid))
                elif kind == "purchase":
                    p_ts.append(int(t)); p_id.append(int(eid))
        state.update((c_ts, c_id, p_ts, p_id))
        if not p_ts:
            return iter(())
        # re-attribute every purchase, vectorized: clicks sorted by
        # (ts, id); the last entry with ct <= p_ts is the (max ts,
        # max id) winner, valid if inside the window
        pts = np.asarray(p_ts, dtype=np.int64)
        if c_ts:
            cts = np.asarray(c_ts, dtype=np.int64)
            cid = np.asarray(c_id, dtype=np.int64)
            order = np.lexsort((cid, cts))
            cts, cid = cts[order], cid[order]
            idx = np.searchsorted(cts, pts, side="right") - 1
            safe = np.clip(idx, 0, None)
            ok = (idx >= 0) & (pts - cts[safe] <= win_us)
            attr = np.where(ok, cid[safe], -1)
        else:
            attr = np.full(len(pts), -1, dtype=np.int64)
        return iter(
            (
                pd.DataFrame(
                    {
                        "event_id": np.asarray(p_id, dtype=np.int64),
                        "user_id": np.full(len(pts), key[0], dtype=np.int64),
                        "attributed_click_id": attr,
                    }
                ),
            )
        )

    relevant = events.where(
        F.col("event_type").isin("click", "purchase")
    ).select("event_id", "user_id", "event_type", "ts")
    return relevant.groupBy("user_id").applyInPandasWithState(
        update,
        _ATTR_OUT_SCHEMA,
        _ATTR_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def hourweek_counts_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of w12's hour-of-week grid: per-(event_type,
    how) counts — ADDITIVE, so complete-mode state is the bounded
    ≤ types×168 grid and the drained counts equal the batch grid on
    the same input.  The share/peak finish
    (``plans.relational.hourweek_from_grid``) runs as a batch
    post-pass over the drained grid (the z10/z17 split)."""
    from ..plans.relational import hourweek_grid

    return hourweek_grid(events)


def read_embedding_stream(spark: SparkSession, emb_dir: str) -> DataFrame:
    """File-source stream over a directory of embeddings parquet files
    (the ingest feed for the z23 decontamination-at-ingest screen)."""
    return (
        spark.readStream.schema(
            "vec_id long, embedding array<float>, label int"
        )
        .format("parquet")
        .load(emb_dir)
    )
