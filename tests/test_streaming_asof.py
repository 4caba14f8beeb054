"""Streaming backward as-of join (streaming/asof.py).

Contract pinned here: the fully-drained streaming result over a bounded
tagged corpus EQUALS the batch ``asof_join_union_window`` on the same
frames (backward, exact-ts matches allowed, left-join nulls), each probe
is emitted exactly once, and the per-entity state buffer stays bounded
by the watermark window (+1 compacted update) — verified both through
Spark and by driving ``_asof_update_fn`` directly with a fake GroupState.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from query_cost_feature_engineering_spark.operators.asof import (
    asof_join_union_window,
)
from query_cost_feature_engineering_spark.streaming.asof import (
    _asof_update_fn,
    drain_bounded_asof,
)

US = 1_000_000  # µs per second


def _corpus(n_users=25, n_updates=1500, n_probes=600, seed=7):
    """Updates with per-user-unique timestamps (ties between updates of
    one user are batching-dependent in ANY as-of engine, so the driver
    query dedups them first — mirrored here) and probes that include
    exact-timestamp collisions with updates (the inclusive-backward
    edge)."""
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-03-01T00:00:00", "us")
    u_user = rng.integers(0, n_users, n_updates)
    # unique per user: second-granular draw without replacement per user
    u_off = np.zeros(n_updates, dtype="int64")
    for u in range(n_users):
        m = u_user == u
        u_off[m] = rng.choice(3 * 86_400, size=int(m.sum()), replace=False)
    u_ts = base + (u_off * US + rng.integers(0, US, n_updates)).astype(
        "timedelta64[us]"
    )
    updates = pd.DataFrame(
        {
            "user_id": u_user.astype("int64"),
            "ts": u_ts,
            "purchase_value": rng.normal(50, 20, n_updates).round(4),
        }
    )
    p_user = rng.integers(0, n_users, n_probes)
    p_ts = base + rng.integers(-3600 * US, 3 * 86_400 * US, n_probes).astype(
        "timedelta64[us]"
    )
    # ~10% of probes sit exactly on an update timestamp of their user
    for i in range(0, n_probes, 10):
        m = updates[updates.user_id == p_user[i]]
        if len(m):
            p_ts[i] = m["ts"].iloc[i % len(m)].to_datetime64()
    probes = pd.DataFrame(
        {
            "probe_id": np.arange(n_probes, dtype="int64"),
            "user_id": p_user.astype("int64"),
            "ts": p_ts,
        }
    )
    return updates, probes


def _tagged(spark, updates, probes):
    from pyspark.sql import functions as F

    u = spark.createDataFrame(updates).select(
        F.lit("u").alias("side"),
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("probe_id"),
        "purchase_value",
    )
    p = spark.createDataFrame(probes).select(
        F.lit("p").alias("side"),
        "user_id",
        "ts",
        "probe_id",
        F.lit(None).cast("double").alias("purchase_value"),
    )
    return u.unionByName(p)


@pytest.fixture(scope="module")
def drained(spark, tmp_path_factory):
    updates, probes = _corpus()
    d = str(tmp_path_factory.mktemp("stream_asof"))
    out = drain_bounded_asof(
        spark, _tagged(spark, updates, probes), d, state_partitions=4
    ).toPandas()
    return updates, probes, out


def test_stream_asof_equals_batch(spark, drained):
    updates, probes, out = drained
    from pyspark.sql import functions as F

    spine = spark.createDataFrame(probes)
    right = spark.createDataFrame(updates).withColumn(
        "asof_ts", F.col("ts")
    )
    exp = (
        asof_join_union_window(
            spine, right, on="ts", by="user_id",
            value_cols=["purchase_value", "asof_ts"],
        )
        .select("probe_id", "user_id", "purchase_value", "asof_ts")
        .toPandas()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    got = (
        out[["probe_id", "user_id", "purchase_value", "asof_ts"]]
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_each_probe_emitted_exactly_once(drained):
    _, probes, out = drained
    assert sorted(out["probe_id"]) == sorted(probes["probe_id"])


def test_unmatched_probes_emit_nulls(drained):
    updates, probes, out = drained
    first = updates.groupby("user_id")["ts"].min()
    merged = probes.merge(
        first.rename("first_u"), left_on="user_id", right_index=True,
        how="left",
    )
    expect_null = set(
        merged.loc[
            merged["first_u"].isna() | (merged["ts"] < merged["first_u"]),
            "probe_id",
        ]
    )
    got_null = set(out.loc[out["purchase_value"].isna(), "probe_id"])
    assert got_null == expect_null and len(expect_null) > 0


class _FakeState:
    """Minimal GroupState stand-in for driving the fold directly."""

    def __init__(self, value=None, wm_ms=0, timed_out=False):
        self._v = value
        self.wm = wm_ms
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v, self.removed = None, True

    def getCurrentWatermarkMs(self):
        return self.wm

    def setTimeoutTimestamp(self, ms):
        self.timeout_set = ms


def _pdf(rows):
    return pd.DataFrame(
        rows,
        columns=["side", "ts", "probe_id", "purchase_value"],
    ).astype({"ts": "datetime64[us]"})


def test_state_eviction_keeps_latest_at_or_before_watermark():
    t = np.datetime64("2024-03-01T00:00:00", "us").astype("int64")
    rows = [
        ("u", t, None, 1.0),
        ("u", t + 100 * US, None, 2.0),
        ("u", t + 200 * US, None, 3.0),
        ("p", t + 150 * US, 1, None),
        ("p", t + 10_000 * US, 2, None),
    ]
    st = _FakeState(wm_ms=(t + 150 * US) // 1000)
    out = list(_asof_update_fn((9,), iter([_pdf(rows)]), st))
    # probe 1 (<= wm) finalized against update at t+100; probe 2 pending
    assert len(out) == 1 and out[0]["probe_id"].tolist() == [1]
    assert out[0]["purchase_value"].tolist() == [2.0]
    p_ts, p_id, u_ts, u_val = st.get
    assert p_id == [2]
    # updates: latest <= wm (t+100) compacted in, t+200 kept, t evicted
    assert u_val == [2.0, 3.0]
    assert st.timeout_set is not None  # pending probe armed a timeout


def test_state_removed_when_drained_and_no_updates():
    t = np.datetime64("2024-03-01T00:00:00", "us").astype("int64")
    st = _FakeState(wm_ms=(t + 10 * US) // 1000)
    out = list(
        _asof_update_fn((3,), iter([_pdf([("p", t, 5, None)])]), st)
    )
    assert out[0]["purchase_value"].isna().all()
    assert st.removed


def test_checkpoint_restart_is_exactly_once(spark, tmp_path):
    """Kill-and-resume: drain the first half of the corpus, stop, then
    add the rest and RESTART from the same checkpoint into a parquet
    sink. The second run must process only the new files (the
    checkpoint carries both the source offset and the state store), and
    the union of the two runs' emissions equals the batch as-of with
    every probe exactly once — the north-rule resumability contract for
    the streaming path."""
    from pyspark.sql import functions as F

    from query_cost_feature_engineering_spark.streaming.asof import (
        TAGGED_SCHEMA,
        asof_enrich_stream,
    )

    updates, probes = _corpus(n_users=10, n_updates=300, n_probes=120,
                              seed=11)
    tagged = _tagged(spark, updates, probes).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = tmp_path / "src"
    out = tmp_path / "out"
    cp = tmp_path / "cp"
    src.mkdir()

    bounds = tagged.agg(
        F.max("ts").alias("mx"),
        F.expr("percentile_approx(unix_micros(ts), 0.5)").alias("md"),
    ).collect()[0]
    med = int(bounds["md"])
    import datetime as dt

    ents = tagged.select("user_id").distinct()

    def wave(ts):
        return ents.select(
            F.lit("w").alias("side"), "user_id",
            F.lit(ts).cast("timestamp").alias("ts"),
            F.lit(None).cast("long").alias("probe_id"),
            F.lit(None).cast("double").alias("purchase_value"),
        )

    w1 = bounds["mx"] + dt.timedelta(hours=6)
    w2 = bounds["mx"] + dt.timedelta(hours=12)
    stages = [
        tagged.filter(F.unix_micros("ts") <= med),
        tagged.filter(F.unix_micros("ts") > med),
        wave(w1),
        wave(w2),
    ]

    import os

    def stage(i, df):
        tmp = str(src / f"_s{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        f = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
        dst = str(src / f"b-{i:03d}.parquet")
        os.replace(os.path.join(tmp, f), dst)
        os.utime(dst, (1_700_000_000 + i,) * 2)

    def run():
        stream = (
            spark.readStream.schema(TAGGED_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            asof_enrich_stream(stream, watermark="7200 seconds")
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(cp))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    stage(0, stages[0])  # first half only, then "crash" (query stops)
    run()
    for i, df in enumerate(stages[1:], start=1):
        stage(i, df)
    run()  # resume from the same checkpoint

    got = (
        spark.read.parquet(str(out))
        .select("probe_id", "user_id", "purchase_value", "asof_ts")
        .toPandas()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    assert got["probe_id"].is_unique  # exactly once across both runs
    spine = spark.createDataFrame(probes)
    right = spark.createDataFrame(updates).withColumn(
        "asof_ts", F.col("ts")
    )
    exp = (
        asof_join_union_window(
            spine, right, on="ts", by="user_id",
            value_cols=["purchase_value", "asof_ts"],
        )
        .select("probe_id", "user_id", "purchase_value", "asof_ts")
        .toPandas()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_timeout_invocation_flushes_pending_probe():
    t = np.datetime64("2024-03-01T00:00:00", "us").astype("int64")
    state_val = ([t + 50 * US], [7], [t], [4.5])
    st = _FakeState(value=state_val, wm_ms=(t + 60 * US) // 1000,
                    timed_out=True)
    out = list(_asof_update_fn((1,), iter([]), st))
    assert out[0]["probe_id"].tolist() == [7]
    assert out[0]["purchase_value"].tolist() == [4.5]
