"""Binned range join: identical rows to the naive theta-join, but with an
equi-join plan (no BroadcastNestedLoopJoin / CartesianProduct)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from query_cost_feature_engineering_spark.operators.rangejoin import (
    range_join_binned,
)


@pytest.fixture(scope="module")
def frames(spark):
    base = dt.datetime(2023, 1, 1)
    facts = spark.createDataFrame(
        [(i, base + dt.timedelta(hours=7 * i)) for i in range(400)],
        "fact_id: long, ts: timestamp",
    )
    intervals = spark.createDataFrame(
        [
            # varied lengths: sub-bin, exact-bin, multi-bin
            (1, base + dt.timedelta(days=2), base + dt.timedelta(days=3)),
            (2, base + dt.timedelta(days=10), base + dt.timedelta(days=17)),
            (3, base + dt.timedelta(days=20), base + dt.timedelta(days=45)),
            # boundary: starts exactly at a fact timestamp
            (4, base + dt.timedelta(hours=7 * 50), base + dt.timedelta(days=16)),
            # empty interval (start == end)
            (5, base + dt.timedelta(days=60), base + dt.timedelta(days=60)),
        ],
        "iv_id: long, start: timestamp, end: timestamp",
    )
    return facts, intervals


def _key_set(df):
    return {(r.fact_id, r.iv_id) for r in df.select("fact_id", "iv_id").collect()}


def test_matches_naive_theta_join(spark, frames):
    facts, intervals = frames
    naive = facts.join(
        intervals, on=F.col("ts").between(F.col("start"), F.col("end"))
    )
    binned = range_join_binned(facts, "ts", intervals, "start", "end", 7)
    assert _key_set(binned) == _key_set(naive)
    assert len(_key_set(naive)) > 0


def test_no_nested_loop_in_plan(spark, frames):
    facts, intervals = frames
    binned = range_join_binned(facts, "ts", intervals, "start", "end", 7)
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_inclusive_boundaries(spark, frames):
    facts, intervals = frames
    binned = range_join_binned(facts, "ts", intervals, "start", "end", 7)
    # interval 4 starts exactly on fact 50's timestamp: inclusive lower bound
    assert (50, 4) in _key_set(binned)


def test_no_duplicate_pairs(spark, frames):
    facts, intervals = frames
    binned = range_join_binned(facts, "ts", intervals, "start", "end", 7)
    n = binned.count()
    assert n == binned.select("fact_id", "iv_id").distinct().count()
