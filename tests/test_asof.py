from __future__ import annotations

from datetime import datetime

import pytest

from pagerank_using_mapreduce_spark.operators.asof import asof_join
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def frames(spark):
    quotes = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 0, 0), 100, 1.0),
            (1, datetime(2024, 1, 1, 11, 0, 0), 101, 2.0),
            (2, datetime(2024, 1, 1, 10, 30, 0), 200, 5.0),
            # two right rows at the identical timestamp: larger key wins
            (3, datetime(2024, 1, 1, 9, 0, 0), 300, 7.0),
            (3, datetime(2024, 1, 1, 9, 0, 0), 301, 8.0),
        ],
        "key long, t timestamp, rid long, px double",
    )
    trades = spark.createDataFrame(
        [
            (10, 1, datetime(2024, 1, 1, 10, 30, 0)),  # after rid 100
            (11, 1, datetime(2024, 1, 1, 11, 0, 0)),  # exactly at rid 101
            (12, 1, datetime(2024, 1, 1, 9, 0, 0)),  # before everything
            (13, 2, datetime(2024, 1, 1, 23, 0, 0)),  # after rid 200
            (14, 3, datetime(2024, 1, 1, 9, 0, 1)),  # tie on right ts
            (15, 4, datetime(2024, 1, 1, 9, 0, 0)),  # key never matches
        ],
        "tid long, key long, t timestamp",
    )
    return trades, quotes


def _run(frames, how):
    trades, quotes = frames
    out = asof_join(
        trades,
        quotes,
        left_on="key",
        right_on="key",
        left_ts="t",
        right_ts="t",
        right_payload=["rid", "px"],
        how=how,
    )
    return {r["tid"]: r for r in out.collect()}


def test_asof_inner(frames):
    got = _run(frames, "inner")
    assert got[10]["r_rid"] == 100
    assert got[11]["r_rid"] == 101  # simultaneous right row IS visible
    assert 12 not in got  # nothing at-or-before
    assert got[13]["r_rid"] == 200
    assert got[14]["r_rid"] == 301  # tie -> larger rid wins
    assert 15 not in got  # key with no right rows
    assert got[10]["r_px"] == 1.0 and got[14]["r_px"] == 8.0


def test_asof_left(frames):
    got = _run(frames, "left")
    assert len(got) == 6
    assert got[12]["r_rid"] is None and got[15]["r_rid"] is None
    assert got[10]["r_rid"] == 100


def test_asof_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "k", 100.0), (2, "k", 500.0)],
        "id long, k string, t double",
    ).select("id", "k", F.timestamp_seconds("t").alias("ts"))
    right = spark.createDataFrame(
        [(10, "k", 120.0), (11, "k", 120.0), (12, "k", 9000.0)],
        "rid long, k string, t double",
    ).select("rid", "k", F.timestamp_seconds("t").alias("rts"))
    out = asof_join(
        left, right, "k", "k", "ts", "rts", ["rid"],
        how="left", direction="forward", tolerance_s=60.0,
    )
    got = {r["id"]: r["r_rid"] for r in out.collect()}
    # id=1: nearest-after at t=120 (two ties -> max rid wins); within 60s
    assert got[1] == 11
    # id=2: nearest-after is t=9000, 8500s away > tolerance -> null
    assert got[2] is None


def test_asof_forward_inner_drops_out_of_tolerance(spark):
    left = spark.createDataFrame([(1, "k", 100.0)], "id long, k string, t double").select(
        "id", "k", F.timestamp_seconds("t").alias("ts")
    )
    right = spark.createDataFrame([(9, "k", 99.0)], "rid long, k string, t double").select(
        "rid", "k", F.timestamp_seconds("t").alias("rts")
    )
    # only right row is BEFORE the left row -> no forward match at all
    out = asof_join(left, right, "k", "k", "ts", "rts", ["rid"],
                    how="inner", direction="forward")
    assert out.count() == 0
    with pytest.raises(ValueError):
        asof_join(left, right, "k", "k", "ts", "rts", ["rid"], direction="sideways")
