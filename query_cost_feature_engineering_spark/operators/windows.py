"""Point-in-time window layer: lag/lead, backfill, rolling stats, sessionize.

All pure Window-spec expressions (JVM-side, whole-stage codegen) — the
engine's analog of the reference's child→parent feature flow
(models/QPPNet.py:177-239): every feature at time t draws only on rows at
ts ≤ t, which is what makes the layer leakage-free by construction.

Ordering is always (ts, tiebreak_col) — the input table contains duplicate
timestamps per entity (as-of ties), so a deterministic tiebreak is part of
the operator contract, matching the golden oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_S = 1800


def _w(entity_col: str, ts_col: str, tiebreak: str | None):
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    return Window.partitionBy(entity_col).orderBy(*order)


def with_lag_lead(
    df: DataFrame,
    value_col: str,
    entity_col: str = "entity_id",
    ts_col: str = "ts",
    offsets: tuple[int, ...] = (1, 2),
    tiebreak: str | None = "image_id",
) -> DataFrame:
    w = _w(entity_col, ts_col, tiebreak)
    for k in offsets:
        df = df.withColumn(f"lag{k}_{value_col}", F.lag(value_col, k).over(w))
        df = df.withColumn(f"lead{k}_{value_col}", F.lead(value_col, k).over(w))
    return df


def with_backfill(
    df: DataFrame,
    value_col: str,
    out_col: str,
    entity_col: str = "entity_id",
    ts_col: str = "ts",
    direction: str = "ffill",
    tiebreak: str | None = "image_id",
) -> DataFrame:
    """ffill = last non-null at ts' ≤ ts (leakage-free);
    bfill = first non-null at ts' ≥ ts (only valid for label-side columns)."""
    w = _w(entity_col, ts_col, tiebreak)
    if direction == "ffill":
        expr = F.last(value_col, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
    elif direction == "bfill":
        expr = F.first(value_col, ignorenulls=True).over(
            w.rowsBetween(0, Window.unboundedFollowing)
        )
    else:
        raise ValueError(direction)
    return df.withColumn(out_col, expr)


def with_rolling_mean(
    df: DataFrame,
    value_col: str,
    window_rows: int = 3,
    entity_col: str = "entity_id",
    ts_col: str = "ts",
    tiebreak: str | None = "image_id",
) -> DataFrame:
    """Trailing mean over the last `window_rows` rows INCLUDING current —
    strictly backward-looking, so leakage-free."""
    w = _w(entity_col, ts_col, tiebreak).rowsBetween(-(window_rows - 1), 0)
    return df.withColumn(f"roll{window_rows}_{value_col}", F.avg(value_col).over(w))


def with_rolling_time_aggs(
    df: DataFrame,
    value_col: str,
    window_s: int,
    entity_col: str = "entity_id",
    ts_col: str = "ts",
    prefix: str | None = None,
) -> DataFrame:
    """Time-based trailing window [ts - window_s, ts]: sum/count/mean of
    ``value_col`` per entity over a RANGE frame on epoch seconds. Strictly
    backward-looking (leakage-free); rows sharing a timestamp are frame
    peers, included together — the standard RANGE-frame semantics."""
    p = prefix or f"r{window_s}s"
    ep = F.col(ts_col).cast("timestamp").cast("double")
    w = (
        Window.partitionBy(entity_col)
        .orderBy(ep)
        .rangeBetween(-window_s, 0)
    )
    return (
        df.withColumn(f"{p}_sum_{value_col}", F.sum(value_col).over(w))
        .withColumn(f"{p}_cnt_{value_col}", F.count(value_col).over(w))
        .withColumn(f"{p}_avg_{value_col}", F.avg(value_col).over(w))
    )


def with_session_ids(
    df: DataFrame,
    entity_col: str = "entity_id",
    ts_col: str = "ts",
    gap_s: int = SESSION_GAP_S,
    out_col: str = "session_id",
    tiebreak: str | None = "image_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since the
    previous row of the same entity exceeds `gap_s`. session_id = cumulative
    sum of session-start flags (1-based) — the standard batch formulation."""
    w = _w(entity_col, ts_col, tiebreak)
    # cast via TIMESTAMP (LTZ) first: TIMESTAMP_NTZ inputs can't cast to
    # double directly; with a UTC session this is exact epoch seconds
    ep = F.col(ts_col).cast("timestamp").cast("double")
    prev = F.lag(ep).over(w)
    is_new = F.when(prev.isNull() | ((ep - prev) > gap_s), 1).otherwise(0)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out_col, F.sum(is_new).over(cum).cast("long"))
