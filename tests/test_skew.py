"""Salted-join operator: row-identity with the plain join, salt actually
in the shuffle keys, retry-determinism of the salt derivation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from query_cost_feature_engineering_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 1 hot key (id=0) holding 50% of probe rows + a long tail.
    probe = spark.range(2000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise(F.pmod(F.col("id"), 97) + 1)
        .alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    build = spark.range(120).select(
        F.col("id").alias("bk"), F.concat(F.lit("dim_"), F.col("id")).alias("dim")
    )
    return probe, build


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_inner_equals_plain(spark, skewed):
    probe, build = skewed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = probe.join(build, probe["k"] == build["bk"], "inner")
        salted = salted_join(probe, build, "k", "bk", n_salts=8, salt_col="row_id")
        cols = ["row_id", "k", "payload", "bk", "dim"]
        assert _rows(salted, cols) == _rows(plain, cols)
        # The salt must survive into the physical join keys (not optimized out).
        plan = salted._jdf.queryExecution().executedPlan().toString()
        assert "__salt" in plan
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_salted_left_keeps_unmatched(spark, skewed):
    probe, build = skewed
    small_build = build.filter(F.col("bk") < 10)
    plain = probe.join(small_build, probe["k"] == small_build["bk"], "left")
    salted = salted_join(probe, small_build, "k", "bk", n_salts=4, salt_col="row_id")
    # inner drops unmatched; left keeps them exactly once despite replication
    salted_left = salted_join(
        probe, small_build, "k", "bk", n_salts=4, salt_col="row_id", how="left"
    )
    cols = ["row_id", "k", "payload", "bk", "dim"]
    assert _rows(salted_left, cols) == _rows(plain, cols)
    assert len(_rows(salted, cols)) == len(
        [r for r in _rows(plain, cols) if r[3] is not None]
    )


def test_salt_is_deterministic(spark, skewed):
    probe, _ = skewed
    s1 = probe.withColumn(
        "s", F.pmod(F.xxhash64(F.col("row_id")), F.lit(8)).cast("int")
    )
    a = s1.select("row_id", "s").collect()
    b = s1.select("row_id", "s").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0 <= r["s"] < 8 for r in a)


def test_rejects_unknown_how(spark, skewed):
    probe, build = skewed
    with pytest.raises(ValueError):
        salted_join(probe, build, "k", "bk", salt_col="row_id", how="full")
