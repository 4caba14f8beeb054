"""Deterministic, leakage-free train/test splits.

The reference splits per-template with a seeded sklearn
``train_test_split(random_state=5)`` (tpch_utils_knob.py:300-302) and the
authors' commented-out 消除数据泄漏 blocks show the leakage discipline it
encodes. Distributed twin: a content-hash split (md5 of the key — stable
across engines, so the DuckDB oracle reproduces it exactly) plus a
time-cutoff split (the point-in-time discipline for temporal features).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# md5 hex is uniform; hex-string ordering gives an exact fraction.
# train_frac 0.8 ⇒ threshold = first 8 hex digits of 0.8 * 16^8.
def _hex_threshold(train_frac: float) -> str:
    return format(int(train_frac * 16**8), "08x")


def hash_split(
    df: DataFrame, key_col: str, train_frac: float = 0.8, out_col: str = "split"
) -> DataFrame:
    """split = 'train' iff md5(key) hex < threshold. Engine-agnostic and
    seedless-deterministic: any system with md5 reproduces the assignment."""
    thr = _hex_threshold(train_frac)
    h = F.md5(F.col(key_col).cast("string"))
    return df.withColumn(
        out_col, F.when(F.substring(h, 1, 8) < thr, "train").otherwise("test")
    )


def time_cutoff_split(
    df: DataFrame, ts_col: str = "ts", cutoff: str | None = None,
    quantile: float = 0.8, out_col: str = "split",
) -> DataFrame:
    """Temporal split: rows at ts ≤ cutoff are train. If no explicit cutoff,
    use the given quantile of ts (computed exactly once, tiny collect)."""
    if cutoff is None:
        row = df.select(
            F.expr(f"percentile_approx(cast(cast({ts_col} as timestamp) as double), {quantile})").alias("c")
        ).collect()[0]
        return df.withColumn(
            out_col,
            F.when(F.col(ts_col).cast("timestamp").cast("double") <= float(row["c"]), "train").otherwise(
                "test"
            ),
        )
    return df.withColumn(
        out_col, F.when(F.col(ts_col) <= F.lit(cutoff).cast("timestamp"), "train")
        .otherwise("test"),
    )
