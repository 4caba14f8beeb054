"""Backward (point-in-time) as-of join — the engine's centerpiece operator.

Spark has no built-in as-of join (SURVEY.md §2.B), so two strategies:

1. ``asof_join_union_window`` — pure DataFrame plan: tag right rows 0 /
   left rows 1, union, and per entity take ``last(value, ignorenulls=True)``
   over ``orderBy(ts, side, tiebreak).rowsBetween(unboundedPreceding, 0)``.
   One shuffle on the entity key, whole-stage codegen, ANSI-SQL
   expressible (DuckDB ``ASOF JOIN`` verifies it). Per-entity work is
   single-partition, so a pathologically hot entity serializes — fine up
   to ~10^7 rows/entity.

2. ``asof_join_pandas_merge`` — the 100-TB path from BASELINE.json
   ``north_rule``: cogroup both sides on a hash bucket of the entity key
   and run a sorted ``pandas.merge_asof`` per bucket (Arrow batches, no
   per-row Python). Entities flagged *hot* (row count above a threshold)
   are additionally range-sliced on time using global quantile cut points
   (``approxQuantile``), with the **last right row of each slice
   carried forward** across slice boundaries (ffill over the tiny
   entity×slice lattice) so no probe misses a match that lives in an
   earlier slice. This is the explicit salting/skew handling the north
   rule demands: a hot entity's probes parallelize across slices while
   cold entities stay on the cheap single-shuffle path.

Tie contract (matches the golden oracle and pandas.merge_asof): backward
join with exact-match allowed; among right rows sharing (entity, ts) the
last by ``tiebreak`` wins.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from query_cost_feature_engineering_spark.runtime.statcache import (
    plan_fingerprint,
)

_SLICES = 32  # time slices for hot entities
# beyond this many hot ids, membership tests use a broadcast join
# instead of `isin` literals (plan size stays O(1) in hot-key count)
_HOT_LITERAL_CAP = 1000


def _filter_hot_membership(spark, df, key, hot_ids, key_type):
    """Keep rows whose ``key`` is in ``hot_ids`` — literals under
    ``_HOT_LITERAL_CAP``, broadcast left-semi join above it."""
    hot_sorted = sorted(hot_ids)
    if len(hot_sorted) <= _HOT_LITERAL_CAP:
        return df.filter(F.col(key).isin(hot_sorted))
    hot_df = spark.createDataFrame(
        [(k,) for k in hot_sorted],
        T.StructType([T.StructField("_hot_key", key_type)]),
    )
    return df.join(
        F.broadcast(hot_df), F.col(key) == F.col("_hot_key"), "left_semi"
    )

# (plan semanticHash, keys, params) -> (hot_ids, cuts); see the
# skew-profile cache note in asof_join_pandas_merge. Bounded FIFO.
_SKEW_PROFILE_CACHE: dict = {}


def asof_join_union_window(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "entity_id",
    value_cols: list[str] | None = None,
    tiebreak: str | None = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, by, tiebreak)
    ]
    lcols = left.columns
    tb = (
        F.col(tiebreak)
        if tiebreak and tiebreak in right.columns
        else F.lit(None).cast("string")
    )
    # exact-match control: with exact matches allowed, right rows sort
    # BEFORE left rows at equal ts (visible to them); strict mode flips the
    # order so equal-ts right rows are invisible to the probe
    r_side, l_side = (0, 1) if allow_exact_matches else (1, 0)
    r = right.select(
        F.col(by),
        F.col(on),
        F.lit(r_side).alias("_side"),
        tb.cast("string").alias("_tb"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    lt = left.select(
        F.col(by),
        F.col(on),
        F.lit(l_side).alias("_side"),
        F.lit(None).cast("string").alias("_tb"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}")
            for c in value_cols
        ],
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    u = r.unionByName(lt)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on), F.col("_side"), F.col("_tb"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in value_cols:
        u = u.withColumn(f"_v_{c}", F.last(f"_v_{c}", ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == F.lit(l_side)).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col(f"_v_{c}").alias(c) for c in value_cols],
    )
    return out


def asof_join_pandas_merge(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "entity_id",
    value_cols: list[str] | None = None,
    tiebreak: str | None = None,
    num_buckets: int = 32,
    hot_threshold: int | None = None,
    slices: int = _SLICES,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Cogrouped sorted-merge as-of with hot-entity time-slicing."""
    spark = left.sparkSession
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, by, tiebreak)
    ]
    rsel = list(dict.fromkeys([by, on] + value_cols + ([tiebreak] if tiebreak else [])))
    # Alias every right column: breaks attribute lineage shared with `left`
    # (a self-cogroup over the same scan otherwise dedups the right side's
    # key attribute and the pandas frame arrives without it) and guarantees
    # distinct names inside merge_asof.
    rpre = "__r_"
    right = right.select(*[F.col(c).alias(f"{rpre}{c}") for c in rsel])
    rby, ron = f"{rpre}{by}", f"{rpre}{on}"
    rtb = f"{rpre}{tiebreak}" if tiebreak else None

    # --- skew detection: entities above threshold get time-sliced ---------
    # Detection runs on a key-only projection: Catalyst column-prunes the
    # upstream plan, so expensive feature UDFs (image decode) are NOT
    # evaluated for these statistics passes — only the final merge pays.
    # ONE scan of the right keys feeds everything: the per-entity counts
    # (persisted — #entities rows, orders of magnitude smaller than the
    # table) answer both the auto-threshold total and the hot-id filter,
    # and the slice cut points come from the hot entities' per-(entity,
    # slice-grain) timestamps rather than a second full key scan.
    # Callers on a measured path can pass ``hot_threshold`` to skip the
    # auto-threshold aggregate entirely.
    from pyspark import StorageLevel

    def _ts_double(df: DataFrame, col: str) -> F.Column:
        t = df.schema[col].dataType.typeName()
        c = F.col(col)
        return c.cast("timestamp").cast("double") if t.startswith("timestamp") else c.cast("double")

    rkeys = right.select(rby, ron)
    # Skew-profile cache: the detection statistics are a pure function of
    # the right-side INPUT + parameters, so re-running the same join
    # (bench reps, a pipeline invoked repeatedly over an unchanged
    # snapshot) reuses the profile instead of paying the detection job
    # again — the statistics-cache pattern. Keyed by the content-aware
    # plan fingerprint (semanticHash + input-file listing hash, see
    # runtime/statcache.py) so rewriting data at the same path misses.
    # Only the caller-tuned path caches (the auto path's threshold
    # depends on a total that should re-read).
    cache_key = None
    if hot_threshold is not None:
        fp = plan_fingerprint(right)
        if fp is not None:
            cache_key = (fp, by, on, hot_threshold, num_buckets, slices)
    cached = (
        _SKEW_PROFILE_CACHE.get(cache_key) if cache_key is not None else None
    )
    if cached is not None:
        hot_ids, cuts = cached
    else:
        if hot_threshold is not None:
            # caller-tuned threshold (the measured/production path):
            # detection is ONE job — per-key counts filtered to hot ids,
            # straight to the driver; nothing persisted, no total
            # aggregate.
            hot_pd = (
                rkeys.groupBy(rby)
                .agg(F.count(F.lit(1)).alias("_cnt"))
                .filter(F.col("_cnt") > hot_threshold)
                .select(rby)
                .toPandas()
            )
            hot_ids = set(hot_pd[rby].tolist())
        else:
            counts = (
                rkeys.groupBy(rby)
                .agg(F.count(F.lit(1)).alias("_cnt"))
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            try:
                total = int(
                    counts.agg(F.sum("_cnt").alias("t")).collect()[0]["t"]
                    or 0
                )
                hot_threshold = max(
                    10_000, total // max(num_buckets, 1) * 2
                )
                # only hot ids cross to the driver (tiny by construction)
                hot_pd = (
                    counts.filter(F.col("_cnt") > hot_threshold)
                    .select(rby)
                    .toPandas()
                )
                hot_ids = set(hot_pd[rby].tolist())
            finally:
                counts.unpersist()

        # Hot-id membership strategy decided BEFORE the cuts pass so the
        # quantile scan uses it too (see _filter_hot below).
        # Time cut points for hot-entity slicing: quantiles over the HOT
        # entities' timestamps only (they are what the slicing balances;
        # cold keys would just dilute the cuts and cost a full re-scan).
        if hot_ids:
            q = [i / slices for i in range(1, slices)]
            hkeys = _filter_hot_membership(
                spark, rkeys, rby, hot_ids, right.schema[rby].dataType
            )
            cuts = hkeys.withColumn(
                "_tsd", _ts_double(hkeys, ron)
            ).approxQuantile("_tsd", q, 0.001)
        else:
            cuts = []
        if cache_key is not None:
            if len(_SKEW_PROFILE_CACHE) >= 64:
                _SKEW_PROFILE_CACHE.pop(next(iter(_SKEW_PROFILE_CACHE)))
            _SKEW_PROFILE_CACHE[cache_key] = (hot_ids, cuts)

    # Hot-id membership: few hot keys (the usual definition of skew) are
    # embedded as `isin` literals — the cheapest plan. A heavy-tailed key
    # space can push 10^4+ entities over threshold, and a literal list
    # that size bloats the plan string linearly; above _HOT_LITERAL_CAP
    # membership switches to a broadcast join against a tiny hot-key
    # frame, keeping plan size O(1) in the hot-key count.
    key_type = right.schema[rby].dataType
    hot_sorted = sorted(hot_ids) if hot_ids else []
    use_literals = len(hot_sorted) <= _HOT_LITERAL_CAP

    def _hot_frame():
        return spark.createDataFrame(
            [(k,) for k in hot_sorted],
            T.StructType([T.StructField("_hot_key", key_type)]),
        )

    def with_bucket(df: DataFrame, key: str, tscol: str) -> DataFrame:
        base = F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets))
        if not hot_ids:
            return df.withColumn("_bkt", base.cast("int"))
        if use_literals:
            df = df.withColumn("_hot", F.col(key).isin(hot_sorted))
        else:
            df = (
                df.join(
                    F.broadcast(
                        _hot_frame().withColumn("_hot_flag", F.lit(True))
                    ),
                    F.col(key) == F.col("_hot_key"),
                    "left",
                )
                .withColumn("_hot", F.col("_hot_flag").isNotNull())
                .drop("_hot_key", "_hot_flag")
            )
        tsd = _ts_double(df, tscol)
        slice_id = F.lit(0)
        for i, c in enumerate(cuts):
            slice_id = F.when(tsd > F.lit(c), F.lit(i + 1)).otherwise(slice_id)
        return df.withColumn(
            "_bkt",
            F.when(F.col("_hot"), F.lit(num_buckets) + slice_id)
            .otherwise(base)
            .cast("int"),
        ).drop("_hot")

    lb = with_bucket(left, by, on)
    rb = with_bucket(right, rby, ron)

    # Carry-forward: last right row of each hot (entity, slice), replicated
    # into every later slice (keeping its true ts) so no probe in a later
    # slice misses a match that lives in an earlier one.
    if hot_ids:
        last_per_slice = (
            _filter_hot_membership(spark, rb, rby, hot_ids, key_type)
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy(rby, "_bkt").orderBy(
                        F.col(ron).desc(),
                        *([F.col(rtb).desc()] if rtb else []),
                    )
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # propagate each slice's closer into every later slice (slices is
        # small and hot entities are few, so this stays tiny)
        slice_ids = list(range(num_buckets, num_buckets + slices))
        lattice = spark.createDataFrame(
            [(s,) for s in slice_ids],
            T.StructType([T.StructField("_tgt", T.IntegerType())]),
        )
        carries = (
            last_per_slice.crossJoin(F.broadcast(lattice))
            .filter(F.col("_tgt") > F.col("_bkt"))
            .withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy(rby, "_tgt").orderBy(F.col("_bkt").desc())
                ),
            )
            .filter(F.col("_rk") == 1)
            .drop("_bkt", "_rk")
            .withColumnRenamed("_tgt", "_bkt")
        )
        rb = rb.unionByName(carries)

    out_schema = T.StructType(
        list(left.schema.fields)
        + [
            T.StructField(c, right.schema[f"{rpre}{c}"].dataType, True)
            for c in value_cols
        ]
    )
    lcols = left.columns
    rvals = [f"{rpre}{c}" for c in value_cols]
    sort_r = [ron] + ([rtb] if rtb else [])

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.drop(columns=["_bkt"]).sort_values(on, kind="mergesort")
        if lpdf.empty:
            return pd.DataFrame(columns=lcols + value_cols)
        rpdf = rpdf.drop(columns=["_bkt"]).sort_values(sort_r, kind="mergesort")
        if rpdf.empty:
            out = lpdf.copy()
            for c in value_cols:
                out[c] = None
            return out[lcols + value_cols]
        merged = pd.merge_asof(
            lpdf,
            rpdf[[rby, ron] + rvals],
            left_on=on,
            right_on=ron,
            left_by=by,
            right_by=rby,
            direction="backward",
            allow_exact_matches=allow_exact_matches,
        )
        merged = merged[lcols + rvals]
        merged.columns = lcols + value_cols
        # unmatched probes: merge_asof fills float NaN even for object
        # columns (arrays/strings) — Arrow needs real None there
        for c in value_cols:
            if merged[c].dtype == object:
                merged.loc[merged[c].isna(), c] = None
        return merged

    return (
        lb.groupBy("_bkt")
        .cogroup(rb.groupBy("_bkt"))
        .applyInPandas(merge, schema=out_schema)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "entity_id",
    value_cols: list[str] | None = None,
    tiebreak: str | None = None,
    strategy: str = "union_window",
    **kw,
) -> DataFrame:
    if strategy == "union_window":
        return asof_join_union_window(left, right, on, by, value_cols, tiebreak)
    if strategy == "pandas_merge":
        return asof_join_pandas_merge(left, right, on, by, value_cols, tiebreak, **kw)
    raise ValueError(strategy)
