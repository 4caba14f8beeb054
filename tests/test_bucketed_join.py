"""Bucketed tables: the shuffle paid once at write time buys every later
equi-join on the bucket key a shuffle-free SortMergeJoin. This is the
100-TB story for recurring fact⋈fact joins (probe-spine ⋈ history,
orders ⋈ lineitem): at scale the per-run shuffle of both sides dominates;
bucketing amortizes it to the single write."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from query_cost_feature_engineering_spark.runtime.bucketed import (
    assert_no_join_exchange,
    bucketed_join,
    count_exchanges,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed_wh")
    orders = spark.range(0, 5000).select(
        F.col("id").alias("o_key"),
        (F.col("id") % 97).cast("double").alias("o_price"),
    )
    items = spark.range(0, 20000).select(
        (F.col("id") % 5000).alias("o_key"),
        (F.col("id") % 13).cast("double").alias("qty"),
    )
    write_bucketed(orders, "b_orders", "o_key", 8, path=str(wh / "o"))
    write_bucketed(items, "b_items", "o_key", 8, path=str(wh / "i"))
    yield "b_orders", "b_items"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the join genuinely exercises the bucketed path
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, lt, rt, on="o_key")
        assert_no_join_exchange(j)
        assert j.count() == 20000
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_same_join_does_shuffle(spark, bucketed_tables, tmp_path):
    """Control: identical data without bucket metadata shuffles both sides."""
    lt, rt = bucketed_tables
    l_plain = str(tmp_path / "lp")
    r_plain = str(tmp_path / "rp")
    spark.table(lt).write.parquet(l_plain)
    spark.table(rt).write.parquet(r_plain)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.read.parquet(l_plain).join(
            spark.read.parquet(r_plain), on="o_key"
        )
        assert count_exchanges(j) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also rides the write-time partitioning."""
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("o_key").agg(F.sum("o_price").alias("s"))
    assert count_exchanges(agg) == 0
    assert agg.count() == 5000
