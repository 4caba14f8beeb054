"""Range-sorted layout: the same range filter must (a) return identical
rows on any layout and (b) be row-group-prunable on the sorted layout —
quantified from parquet footer stats, not assumed."""

from __future__ import annotations

import pyspark.sql.functions as F

from query_cost_feature_engineering_spark.runtime.layout import (
    pruning_ratio,
    read_pruned,
    write_range_layout,
)

EVENTS = "/root/testdata/sf0.01/events.parquet"


def _window(spark):
    lo, hi = (
        spark.read.parquet(EVENTS)
        .agg(
            F.timestamp_micros(
                F.percentile(
                    F.unix_micros(F.col("ts").cast("timestamp")), F.lit(0.45)
                ).cast("long")
            ),
            F.timestamp_micros(
                F.percentile(
                    F.unix_micros(F.col("ts").cast("timestamp")), F.lit(0.55)
                ).cast("long")
            ),
        )
        .first()
    )
    return lo, hi


def test_range_layout_prunes_row_groups(spark, tmp_path):
    e = spark.read.parquet(EVENTS)
    sorted_dir = str(tmp_path / "by_ts")
    shuffled_dir = str(tmp_path / "shuffled")
    write_range_layout(e, sorted_dir, ["ts"], n_files=16)
    # control: same data, same file count, hash-scattered on a key
    # uncorrelated with ts
    e.repartition(16, "event_id").write.parquet(shuffled_dir)

    lo, hi = _window(spark)
    frac_sorted, _, n1 = pruning_ratio(sorted_dir, "ts", lo, hi)
    frac_shuffled, _, n2 = pruning_ratio(shuffled_dir, "ts", lo, hi)
    assert n1 >= 16 and n2 >= 16
    # a ~10%-selectivity window on the sorted layout must skip most row
    # groups; on the scattered layout every row group spans ~the full ts
    # domain so nothing is skippable
    assert frac_sorted >= 0.75, frac_sorted
    assert frac_shuffled == 0.0, frac_shuffled


def test_range_layout_scan_is_lossless(spark, tmp_path):
    e = spark.read.parquet(EVENTS)
    d = str(tmp_path / "by_ts")
    write_range_layout(e, d, ["ts"], n_files=8)
    lo, hi = _window(spark)
    want = sorted(
        r.event_id for r in e.filter(F.col("ts").between(lo, hi)).collect()
    )
    got = sorted(
        r.event_id
        for r in read_pruned(spark, d, "ts", lo, hi).collect()
    )
    assert got == want and len(want) > 0
    # and the filter reaches the scan
    plan = read_pruned(spark, d, "ts", lo, hi)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull(ts)" in plan


def test_observe_counts_piggybacks_on_the_action(spark, tmp_path):
    from query_cost_feature_engineering_spark.runtime.metrics import (
        observe_counts,
    )

    e = spark.read.parquet(EVENTS)
    df, obs = observe_counts(
        e,
        sum_value=F.sum("value"),
        n_click=F.sum((F.col("event_type") == "click").cast("long")),
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "out"))
    m = obs.get
    assert m["rows"] == e.count()
    assert m["n_click"] == e.filter(F.col("event_type") == "click").count()
    assert abs(m["sum_value"] - e.agg(F.sum("value")).first()[0]) < 1e-6


def test_zorder_layout_prunes_on_both_columns(spark, tmp_path):
    """Z-order on (x, y): a narrow filter on EITHER column skips most
    row groups; a range layout on x alone skips nothing for y filters."""
    from query_cost_feature_engineering_spark.runtime.layout import (
        write_zorder_layout,
    )

    n = 200_000
    grid = spark.range(n).select(
        (F.col("id") % 447).cast("long").alias("x"),
        ((F.col("id") * 7919) % 449).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    zdir = str(tmp_path / "z")
    xdir = str(tmp_path / "xr")
    write_zorder_layout(grid, zdir, ["x", "y"], bits=9, n_files=32)
    write_range_layout(grid, xdir, ["x"], n_files=32)

    fx_z, _, nz = pruning_ratio(zdir, "x", 10, 30)
    fy_z, _, _ = pruning_ratio(zdir, "y", 10, 30)
    fy_x, _, nx = pruning_ratio(xdir, "y", 10, 30)
    fx_x, _, _ = pruning_ratio(xdir, "x", 10, 30)
    assert nz >= 32 and nx >= 32
    # x-range layout: perfect on x, useless on y
    assert fx_x >= 0.9 and fy_x == 0.0, (fx_x, fy_x)
    # z-order: substantial skipping on BOTH axes (~5% windows)
    assert fx_z >= 0.5 and fy_z >= 0.5, (fx_z, fy_z)


def test_zorder_scan_is_lossless(spark, tmp_path):
    from query_cost_feature_engineering_spark.runtime.layout import (
        write_zorder_layout,
    )

    grid = spark.range(50_000).select(
        (F.col("id") % 223).cast("long").alias("x"),
        ((F.col("id") * 31) % 227).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    d = str(tmp_path / "z2")
    write_zorder_layout(grid, d, ["x", "y"], bits=8, n_files=8)
    want = sorted(
        r.payload for r in grid.filter("y between 40 and 60").collect()
    )
    got = sorted(
        r.payload for r in read_pruned(spark, d, "y", 40, 60).collect()
    )
    assert got == want and len(want) > 0
