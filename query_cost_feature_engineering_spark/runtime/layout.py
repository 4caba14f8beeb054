"""Range-sorted data layout for file/row-group skipping.

At 100 TB the cheapest scan is the one that never happens: parquet
footers carry min/max statistics per column per row group, and both
Spark's parquet reader (``spark.sql.parquet.filterPushdown``, on by
default) and any other engine skip row groups whose stats exclude the
predicate. That skipping only bites when the data is LAID OUT so each
file/row group covers a narrow range of the filter column —
``repartitionByRange(col) + sortWithinPartitions(col)`` at write time
buys every later range-filtered scan an IO reduction proportional to
selectivity, with zero read-side code.

This is the time-range analog of ``runtime/bucketed.py`` (which
pre-pays equi-join shuffles): here the write pre-pays predicate IO.
The reference re-reads its whole pickled dataset per run
(`main.py:27-44`) and filters in Python; a time-filtered feature
backfill over a range-laid-out table reads only the matching slice.

Evidence functions (pyarrow footer inspection) quantify the effect so
tests pin it instead of trusting the layout by faith.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_range_layout(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
) -> None:
    """Write ``df`` with files partitioned by contiguous ranges of
    ``sort_cols`` and rows sorted within each file.

    ``repartitionByRange`` samples the sort key to build balanced range
    bounds (handles skew better than fixed-width slicing), so every
    output file covers a disjoint narrow key range and its parquet
    min/max stats become selective. ``n_files`` defaults to the
    session's shuffle parallelism."""
    parts = [df[c] for c in sort_cols]
    rp = (
        df.repartitionByRange(n_files, *parts)
        if n_files
        else df.repartitionByRange(*parts)
    )
    rp.sortWithinPartitions(*sort_cols).write.mode("overwrite").parquet(path)


def zorder_expr(df: DataFrame, cols: list[str], bits: int = 10):
    """Morton (Z-order) key over ``cols`` as a pure JVM column expression.

    Each column is linearly bucketed into [0, 2^bits) with
    ``width_bucket`` between its global min/max (one tiny agg job —
    2·k scalars to the driver), then the bucket bits are interleaved:
    bit b of column j lands at position b·k + j. The whole thing is
    built-in bitwise arithmetic (shiftleft/&/|) inside whole-stage
    codegen — no UDF, no shuffle beyond the eventual range write.

    Linear bucketing (vs quantile cuts) is the standard Z-order
    implementation trade: constant-time per row and stats-free, at the
    cost of unbalanced buckets under heavy skew — for skewed keys,
    range-lay-out the skewed column alone instead."""
    from pyspark.sql import functions as F

    n = 1 << bits
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    st = df.agg(*aggs).first()
    k = len(cols)
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        mn, mx = st[f"mn_{c}"], st[f"mx_{c}"]
        if mx == mn:  # constant column contributes nothing
            continue
        bucket = F.coalesce(
            F.least(
                F.width_bucket(
                    F.col(c).cast("double"),
                    F.lit(float(mn)),
                    F.lit(float(mx)),
                    F.lit(n),
                ),
                F.lit(n),
            )
            - 1,
            F.lit(0),
        ).cast("long")
        for b in range(bits):
            bit = F.shiftright(bucket, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * k + j)
    return z


def write_zorder_layout(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 10,
    n_files: int | None = None,
) -> None:
    """Write ``df`` Z-ordered on ``cols`` (Iceberg `rewrite_data_files
    (strategy => 'sort', sort_order => 'zorder(...)')` / Delta `OPTIMIZE
    ZORDER BY`): rows close in the Morton curve land in the same file,
    so EVERY listed column's per-file min/max stats become selective —
    a range layout on one column skips nothing for filters on the
    other; Z-order trades a little per-column locality for skipping on
    all of them (ratios pinned in tests/test_layout.py)."""
    z = zorder_expr(df, cols, bits=bits).alias("__z")
    with_z = df.select("*", z)
    rp = (
        with_z.repartitionByRange(n_files, "__z")
        if n_files
        else with_z.repartitionByRange("__z")
    )
    (
        rp.sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def row_group_stats(path: str, column: str) -> list[tuple]:
    """(min, max, n_rows) per row group for ``column`` across all parquet
    files under ``path`` — read from footers only (no data IO)."""
    import pyarrow.parquet as pq

    out = []
    for root, _dirs, files in os.walk(path):
        for fname in sorted(files):
            if not fname.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, fname)).metadata
            idx = md.schema.to_arrow_schema().get_field_index(column)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                out.append((st.min, st.max, md.row_group(rg).num_rows))
    return out


def pruning_ratio(path: str, column: str, lo, hi) -> tuple[float, int, int]:
    """Fraction of row groups a ``column BETWEEN lo AND hi`` scan can
    skip, judged purely from footer stats (what any stats-aware reader
    does). Returns (skipped_fraction, n_skipped, n_total)."""
    stats = row_group_stats(path, column)
    total = len(stats)
    skipped = sum(1 for mn, mx, _ in stats if mx < lo or mn > hi)
    return (skipped / total if total else 0.0, skipped, total)


def read_pruned(
    spark: SparkSession, path: str, column: str, lo, hi
) -> DataFrame:
    """Range-filtered scan; with a range layout the filter prunes at the
    row-group level (PushedFilters in the plan + footer stats do the
    rest). Read-side code is identical for any layout — the layout alone
    decides the IO."""
    df = spark.read.parquet(path)
    return df.filter(df[column].between(lo, hi))
