"""Streaming operators verified against their batch twins on the real
sf0.001 events table (file-source stream drained with availableNow)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from pagerank_using_mapreduce_spark.plans.relational import (
    e1_sessions,
    e2_hourly_rollup,
)
from pagerank_using_mapreduce_spark.streaming import (
    hourly_rollup_stream,
    read_event_stream,
    run_available_now,
    sessionize_stream,
    stream_dedup,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF}/events.parquet", d / "part-000.parquet")
    return str(d)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streaming_hourly_rollup_matches_batch(spark, events_dir):
    stream = hourly_rollup_stream(read_event_stream(spark, events_dir))
    got = run_available_now(stream, "t_rollup")
    want = e2_hourly_rollup(spark, SF)
    cols = ["hour_epoch", "event_type", "n", "sum_value_e2"]
    assert _rows(got, cols) == _rows(want, cols)


def test_streaming_sessionize_matches_batch(spark, events_dir):
    stream = sessionize_stream(read_event_stream(spark, events_dir))
    got = run_available_now(stream, "t_sessions", output_mode="update")
    want = e1_sessions(spark, SF)
    cols = ["user_id", "n_sessions", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_merge_intervals_order_insensitive():
    """The sessionizer's cross-batch fold is a pure interval merge:
    any partition of the events into batches, in any order, must give
    the same sessions as one sorted batch."""
    import numpy as np

    from pagerank_using_mapreduce_spark.streaming.events import _merge_intervals

    gap = 10
    # sessions (sorted view): [0,5], [20,28], [100,100]
    all_ts = np.array([0, 5, 20, 25, 28, 100], dtype=np.int64)

    def fold(batches):
        s = np.empty(0, dtype=np.int64)
        e = np.empty(0, dtype=np.int64)
        for b in batches:
            b = np.asarray(b, dtype=np.int64)
            s, e = _merge_intervals(
                np.concatenate([s, b]), np.concatenate([e, b]), gap
            )
        return s.tolist(), e.tolist()

    want = fold([all_ts])
    assert want == ([0, 20, 100], [5, 28, 100])
    # late batch arrives after a newer one (out of event-time order)
    assert fold([[20, 25, 28, 100], [0, 5]]) == want
    # a late event BRIDGES two previously-separate sessions
    s, e = fold([[0, 5], [20, 28]])
    assert len(s) == 2
    assert fold([[0, 5], [20, 28], [12]]) == ([0], [28])
    # singleton batches in reverse order
    assert fold([[t] for t in reversed(all_ts.tolist())]) == want


def test_streaming_sessionize_out_of_order_batches(spark, tmp_path):
    """Two micro-batches delivered out of event-time order (the late
    half of the table first) must still converge to the batch twin's
    totals — the r02 verdict's cross-batch ordering gap."""
    from pagerank_using_mapreduce_spark.streaming import events as se

    from pagerank_using_mapreduce_spark.sources.tables import normalize_event_ts

    ev = normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))
    mid = ev.selectExpr(
        "percentile_cont(0.5) WITHIN GROUP (ORDER BY unix_micros(ts))"
    ).first()[0]
    d = tmp_path / "ooo_events"
    d.mkdir()
    # file source orders batches by modification time: write LATE half
    # first so batch 0 = newest events, batch 1 = oldest (out of order)
    import os
    import time

    ev.where(F.unix_micros(F.col("ts")) > mid).coalesce(1).write.mode("overwrite").parquet(
        str(d / "late")
    )
    ev.where(F.unix_micros(F.col("ts")) <= mid).coalesce(1).write.mode("overwrite").parquet(
        str(d / "early")
    )
    staged = tmp_path / "staged"
    staged.mkdir()
    for i, sub in enumerate(["late", "early"]):
        src = next((d / sub).glob("*.parquet"))
        dst = staged / f"batch{i}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (time.time() - 100 + i, time.time() - 100 + i))

    stream = se.sessionize_stream(
        se.read_event_stream(spark, str(staged), max_files_per_trigger=1)
    )
    latest: dict[int, tuple[int, int]] = {}
    batches: list[int] = []

    def collect(df, batch_id):
        rows = df.collect()
        if rows:
            batches.append(batch_id)
        for r in rows:
            latest[r["user_id"]] = (r["n_sessions"], r["n_events"])

    se.run_foreach_batch(stream, collect, output_mode="update")
    assert len(batches) >= 2, "expected multiple micro-batches"
    want = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in e1_sessions(spark, SF).collect()
    }
    assert latest == want


def test_stream_dedup_keeps_distinct_event_ids(spark, events_dir):
    stream = stream_dedup(read_event_stream(spark, events_dir))
    got = run_available_now(
        stream.select("event_id"), "t_dedup", output_mode="append"
    )
    n_distinct = got.select("event_id").distinct().count()
    assert got.count() == n_distinct == 1000


def test_stream_stream_join_matches_batch(spark, events_dir):
    from pyspark.sql import functions as F

    from pagerank_using_mapreduce_spark.streaming import events as se

    stream = se.click_purchase_join_stream(se.read_event_stream(spark, events_dir))
    got = se.run_available_now(stream, "t_ssjoin", output_mode="append")

    from pagerank_using_mapreduce_spark.sources.tables import normalize_event_ts

    ev = normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    want = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 3600 SECONDS"))
        & (F.col("c_ts") < F.col("p_ts")),
    ).select("purchase_id", "click_id", "user_id")
    cols = ["purchase_id", "click_id", "user_id"]
    assert _rows(got.select(*cols), cols) == _rows(want, cols)


def test_foreach_batch_parquet_sink(spark, events_dir, tmp_path):
    from pagerank_using_mapreduce_spark.streaming import events as se

    out = str(tmp_path / "sink")
    stream = se.stream_dedup(se.read_event_stream(spark, events_dir))

    def write_batch(df, batch_id):
        df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out)

    se.run_foreach_batch(stream, write_batch)
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert back.select("event_id").distinct().count() == 1000


def test_sliding_rollup_overlap_and_batch_parity(spark, events_dir):
    from pagerank_using_mapreduce_spark.streaming import sliding_rollup_stream
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    stream = sliding_rollup_stream(read_event_stream(spark, events_dir))
    got = run_available_now(stream, "t_sliding")
    # every event lands in exactly window/slide = 2 windows
    ev = load_table(spark, SF, "events")
    assert got.agg(F.sum("n")).first()[0] == 2 * ev.count()
    # parity with the same sliding window computed in batch
    want = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5000001)).cast("long")).alias(
                "sum_value_e2"
            ),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("win_epoch"),
            "event_type",
            "n",
            "sum_value_e2",
        )
    )
    cols = ["win_epoch", "event_type", "n", "sum_value_e2"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_static_enrich_matches_batch_join(spark, events_dir):
    from pagerank_using_mapreduce_spark.streaming import enrich_stream
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    cust = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    enriched = enrich_stream(
        read_event_stream(spark, events_dir), cust, "user_id", "c_custkey"
    )
    counted = enriched.groupBy("c_mktsegment").count()
    got = run_available_now(counted, "t_enrich")
    ev = load_table(spark, SF, "events")
    want = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .count()
    )
    cols = ["c_mktsegment", "count"]
    assert _rows(got, cols) == _rows(want, cols)


def test_session_window_exact_gap_boundary(spark):
    """Events exactly SESSION_GAP_S apart MERGE into one session in
    Spark's session_window (verified PySpark 4.1.2 behavior: a session
    [t, t+gap) is extended by an event at t+gap); only diff > gap
    splits.  The E4/z7 DuckDB oracle must agree at this boundary."""
    import duckdb
    import pandas as pd

    from pagerank_using_mapreduce_spark.plans.relational import (
        E4_SQL,
        SESSION_GAP_S,
    )

    base = pd.Timestamp("2024-01-01 00:00:00")
    gap = pd.Timedelta(seconds=SESSION_GAP_S)
    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2],
            "event_id": [10, 11, 20, 21],
            # user 1: exactly gap apart -> ONE session
            # user 2: gap + 1s apart   -> TWO sessions
            "ts": [base, base + gap, base, base + gap + pd.Timedelta(seconds=1)],
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    ev = spark.createDataFrame(pdf)
    got = (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("sw"),
        )
        .count()
        .groupBy("user_id")
        .count()
        .collect()
    )
    spark_sessions = {r["user_id"]: r["count"] for r in got}
    assert spark_sessions == {1: 1, 2: 2}

    con = duckdb.connect()
    con.register("events", pdf)
    oracle = con.execute(E4_SQL).df()
    oracle_sessions = oracle.groupby("user_id").size().to_dict()
    assert oracle_sessions == spark_sessions


def test_stream_defined_on_empty_dir_then_files_arrive(spark, tmp_path):
    """A stream may be DEFINED before any file exists (the production
    arrival order).  The schema peek falls back to the static micros
    schema on an empty directory; files landing afterwards are read
    normally."""
    d = tmp_path / "late_events"
    d.mkdir()
    stream = read_event_stream(spark, str(d))  # must not raise
    assert "ts" in stream.columns and dict(stream.dtypes)["ts"] == "timestamp"
    shutil.copy(f"{SF}/events.parquet", d / "part-000.parquet")
    counted = hourly_rollup_stream(stream)
    got = run_available_now(counted, "t_late_arrival")
    want = e2_hourly_rollup(spark, SF)
    cols = ["hour_epoch", "event_type", "n", "sum_value_e2"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_bottom_k_matches_batch_and_batching_invariant(spark, tmp_path):
    """The streaming min-k state is mergeable: multi-batch delivery
    (2 files, 1 per trigger) converges to the same per-group
    membership as the batch bottom_k_per_group twin."""
    import pyarrow.parquet as pq

    from pagerank_using_mapreduce_spark.operators.sampling import (
        bottom_k_per_group,
    )
    from pagerank_using_mapreduce_spark.sources.tables import load_table
    from pagerank_using_mapreduce_spark.streaming import events as se

    # split the events file in two so maxFilesPerTrigger=1 forces
    # two micro-batches
    t = pq.read_table(f"{SF}/events.parquet")
    d = tmp_path / "split_events"
    d.mkdir()
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), d / "a.parquet")
    pq.write_table(t.slice(half), d / "b.parquet")

    latest: dict = {}

    def collect(batch_df, _bid):
        for r in batch_df.collect():
            latest.setdefault(r["event_type"], set())
        # each emission is the group's FULL current membership: replace
        for et in {r["event_type"] for r in batch_df.collect()}:
            latest[et] = {
                r["event_id"]
                for r in batch_df.collect()
                if r["event_type"] == et
            }

    stream = se.bottom_k_stream(
        se.read_event_stream(spark, str(d), max_files_per_trigger=1)
    )
    se.run_foreach_batch(stream, collect, output_mode="update")

    ev = load_table(spark, SF, "events")
    want: dict = {}
    for r in bottom_k_per_group(ev, "event_type", "event_id", k=20).collect():
        want.setdefault(r["event_type"], set()).add(r["event_id"])
    assert latest == want


def test_stream_funnel_matches_batch_across_batches(spark, tmp_path):
    """The funnel state machine's min-merge state is order-insensitive:
    two micro-batches (1 file per trigger) converge to the same
    per-user stage as the batch per-user funnel."""
    import duckdb
    import pyarrow.parquet as pq

    from pagerank_using_mapreduce_spark.streaming import events as se

    t = pq.read_table(f"{SF}/events.parquet")
    d = tmp_path / "split_funnel"
    d.mkdir()
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), d / "a.parquet")
    pq.write_table(t.slice(half), d / "b.parquet")

    latest: dict = {}

    def collect(batch_df, _bid):
        for r in batch_df.collect():
            latest[r["user_id"]] = r["stage"]  # update-mode: last wins

    stream = se.funnel_stream(
        se.read_event_stream(spark, str(d), max_files_per_trigger=1)
    )
    se.run_foreach_batch(stream, collect, output_mode="update")

    from pagerank_using_mapreduce_spark.plans.relational import E6_STAGE_SQL

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = {
        int(r.user_id): int(r.stage)
        for _, r in con.execute(E6_STAGE_SQL).df().iterrows()
    }
    assert latest == want and len(want) > 0


def test_stream_moments_match_batch_across_batches(spark, tmp_path):
    """Per-user purchase moments are additive integer merges: 2-file
    delivery (one per trigger, complete mode) drains to exactly the
    batch aggregation."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from pagerank_using_mapreduce_spark.sources.tables import load_table
    from pagerank_using_mapreduce_spark.streaming import events as se

    t = pq.read_table(f"{SF}/events.parquet")
    d = tmp_path / "split_events_m"
    d.mkdir()
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), d / "a.parquet")
    pq.write_table(t.slice(half), d / "b.parquet")

    stream = se.user_moments_stream(
        se.read_event_stream(spark, str(d), max_files_per_trigger=1)
    )
    got = {
        r["user_id"]: (r["n"], r["s"], r["ss"])
        for r in se.run_available_now(
            stream, "t_test_moments", output_mode="complete"
        ).collect()
    }

    ev = load_table(spark, SF, "events").where(F.col("event_type") == "purchase")
    v3 = F.floor(F.col("value") * 1000 + F.lit(0.5000001)).cast("long")
    want = {
        r["user_id"]: (r["n"], r["s"], r["ss"])
        for r in ev.select("user_id", v3.alias("v3"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("v3").alias("s"),
            F.sum(F.col("v3") * F.col("v3")).alias("ss"),
        )
        .collect()
    }
    assert got == want


def test_stream_ohlc_matches_batch_across_batches(spark, tmp_path):
    """OHLC aggregates are monotone min/max merges: 2-file delivery
    drains to exactly the batch w6 answer."""
    import pyarrow.parquet as pq

    from pagerank_using_mapreduce_spark.plans.relational import w6_hourly_ohlc
    from pagerank_using_mapreduce_spark.streaming import events as se

    t = pq.read_table(f"{SF}/events.parquet")
    d = tmp_path / "split_events_o"
    d.mkdir()
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), d / "a.parquet")
    pq.write_table(t.slice(half), d / "b.parquet")

    stream = se.hourly_ohlc_stream(
        se.read_event_stream(spark, str(d), max_files_per_trigger=1)
    )
    got = {
        (r["event_type"], r["hour"]): (
            r["open_v3"], r["close_v3"], r["low_v3"], r["high_v3"], r["n"]
        )
        for r in se.run_available_now(
            stream, "t_test_ohlc", output_mode="complete"
        ).collect()
    }
    want = {
        (r["event_type"], r["hour"]): (
            r["open_v3"], r["close_v3"], r["low_v3"], r["high_v3"], r["n"]
        )
        for r in w6_hourly_ohlc(spark, SF).collect()
    }
    assert got == want


def test_stream_dedup_doubled_input_multibatch(spark, events_dir):
    """z14's claim under forced multi-batch delivery: two unioned
    copies of the stream, one file per trigger per source — the
    drained per-type counts still equal the single-copy batch
    counts."""
    doubled = read_event_stream(spark, events_dir, max_files_per_trigger=1).union(
        read_event_stream(spark, events_dir, max_files_per_trigger=1)
    )
    got = run_available_now(
        stream_dedup(doubled).select("event_id", "event_type"),
        "t_dedup_doubled",
        output_mode="append",
    )
    want = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type")
        .count()
    )
    got_counts = {
        r["event_type"]: r["count"]
        for r in got.groupBy("event_type").count().collect()
    }
    want_counts = {r["event_type"]: r["count"] for r in want.collect()}
    assert got_counts == want_counts


def test_stream_forget_matches_batch_d4(spark, events_dir):
    """z15 drained counts == d4's n_after per event_type — the
    batch/stream parity the compliance audit needs."""
    from pagerank_using_mapreduce_spark.plans.relational import d4_forget_users
    from pagerank_using_mapreduce_spark.streaming.events import (
        forget_users_stream,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    forget = (
        ev.where((F.col("event_type") == "signup") & (F.col("user_id") % 7 == 0))
        .select(F.col("user_id").alias("fuid"))
        .distinct()
    )
    stream = forget_users_stream(
        read_event_stream(spark, events_dir), forget
    ).select("event_id", "event_type")
    got = {
        r["event_type"]: r["count"]
        for r in run_available_now(stream, "t_forget_par", output_mode="append")
        .groupBy("event_type")
        .count()
        .collect()
    }
    want = {
        r["event_type"]: r["n_after"]
        for r in d4_forget_users(spark, SF).collect()
    }
    assert got == want
