"""Bucketed (pre-shuffled) tables for shuffle-free co-located joins.

At 100 TB the dominant cost of a recurring fact⋈fact join (e.g. the
probe-spine ⋈ feature-history as-of join, or orders ⋈ lineitem) is the
shuffle of both sides on every run. Spark's bucketed tables amortize that
shuffle to write time: ``bucketBy(n, key).sortBy(key)`` hash-partitions
the files once, and every later equi-join on the bucket key reads both
sides pre-partitioned — the physical plan has a SortMergeJoin with **no
Exchange on either side** (verified by ``assert_no_join_exchange`` and
``tests/test_bucketed_join.py``).

Rules encoded here (public Spark semantics, SQL guide "Bucketing"):
- both sides must have the SAME bucket count (else one side re-shuffles);
- the join key must equal the bucket key;
- ``spark.sql.sources.bucketing.enabled`` must be on (default);
- files-per-bucket > 1 is fine (Spark coalesces within a bucket).

The reference has no storage layer at all — it re-reads pickled dicts per
run (`main.py:27-44`); this module is the Spark-native replacement for
that re-read, with the shuffle paid once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    path: str | None = None,
    sorted_within: bool = True,
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table in the session
    catalog. The one-time shuffle-on-write buys every subsequent join or
    aggregation on ``bucket_col`` a shuffle-free plan."""
    w = df.write.mode("overwrite").format("parquet")
    if path is not None:
        w = w.option("path", path)
    w = w.bucketBy(n_buckets, bucket_col)
    if sorted_within:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str]
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on=on)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes in the executed plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )


def assert_no_join_exchange(df: DataFrame) -> None:
    """Raise if the plan shuffles — the bucketed-join contract."""
    n = count_exchanges(df)
    if n:
        raise AssertionError(
            f"bucketed join plan contains {n} shuffle Exchange node(s):\n"
            + df._jdf.queryExecution().executedPlan().toString()
        )
