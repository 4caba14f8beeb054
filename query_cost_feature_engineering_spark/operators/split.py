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


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_frac: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling (the distributed twin of
    ``df.sampleBy`` and of sklearn's class-rebalancing resample, but
    seedless and engine-agnostic): a row survives iff the first 8 hex
    digits of md5(key) fall under its stratum's threshold. Same digest on
    any engine ⇒ the DuckDB oracle reproduces the exact row set. One
    narrow filter — no shuffle, fully pushed into the scan stage, so at
    100 TB this is a map-only pass."""
    h = F.substring(F.md5(F.col(key_col).cast("string")), 1, 8)
    cond = None
    for stratum, frac in fractions.items():
        c = F.col(strata_col) == stratum
        if frac < 1.0:
            # frac >= 1.0 keeps the whole stratum unconditionally: the
            # threshold for 1.0 is 9 hex chars ('100000000') and the
            # lexicographic compare of the 8-char prefix against it
            # would keep only hashes starting with '0' (~6.25%).
            c = c & (h < _hex_threshold(frac))
        cond = c if cond is None else cond | c
    others = ~F.col(strata_col).isin(*fractions.keys())
    if default_frac >= 1.0:
        cond = cond | others
    else:
        cond = cond | (others & (h < _hex_threshold(default_frac)))
    return df.filter(cond)


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
