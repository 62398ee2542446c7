"""Skew/co-location utilities: salted rewrites must be result-identical
to the plain ops, and bucketed joins must plan with zero exchanges."""

from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_using_mapreduce_spark.operators.scale import (
    read_bucketed,
    salted_agg,
    salted_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_agg_equals_plain_groupby(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type", F.floor(F.col("value") * 100).alias("v")
    )
    plain = ev.groupBy("event_type").agg(
        F.sum("v").alias("total"),
        F.count(F.lit(1)).alias("n"),
        F.max("v").alias("mx"),
    )
    salted = salted_agg(
        ev,
        ["event_type"],
        {"total": "sum(v)", "n": "count(v)", "mx": "max(v)"},
        n_salts=8,
    )
    assert _sorted(salted.select("event_type", "total", "n", "mx")) == _sorted(
        plain.select("event_type", "total", "n", "mx")
    )


def test_salted_agg_with_stable_id(spark):
    # stable_id salt: spreads byte-identical payload rows of a hot key
    # and stays result-identical to the plain groupBy
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "event_type", F.floor(F.col("value") * 100).alias("v")
    )
    plain = ev.groupBy("event_type").agg(
        F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")
    )
    salted = salted_agg(
        ev,
        ["event_type"],
        {"total": "sum(v)", "n": "count(v)"},
        n_salts=8,
        stable_id="event_id",
    )
    assert _sorted(salted.select("event_type", "total", "n")) == _sorted(
        plain.select("event_type", "total", "n")
    )
    # the id-derived salt actually spreads one hot key over many buckets
    from pagerank_using_mapreduce_spark.operators.scale import _row_salt

    hot = ev.where(F.col("event_type") == "click")
    n_buckets = (
        hot.select(_row_salt(hot, 8, "event_id").alias("s")).distinct().count()
    )
    assert n_buckets > 1


def test_salted_join_equals_plain_join(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "user_id")
    users = (
        spark.range(0, 150)
        .select(F.col("id").alias("user_id"), (F.col("id") * 2).alias("score"))
    )
    plain = ev.join(users, "user_id").select("event_id", "score")
    salted = salted_join(ev, users, "user_id", n_salts=4).select(
        "event_id", "score"
    )
    assert _sorted(salted) == _sorted(plain)


def test_bucketed_join_has_no_exchange(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    # drop_stale_location: explicit opt-in for in-memory-catalog sessions
    # whose warehouse files outlive the table registration
    write_bucketed(
        orders, "t_orders_b", "o_orderkey", n_buckets=8, drop_stale_location=True
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        "o_orderkey",
        n_buckets=8,
        drop_stale_location=True,
    )
    joined = read_bucketed(spark, "t_orders_b").join(
        read_bucketed(spark, "t_lineitem_b"), "o_orderkey"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    # and it still computes the right thing
    expect = orders.join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    ).count()
    assert joined.count() == expect
