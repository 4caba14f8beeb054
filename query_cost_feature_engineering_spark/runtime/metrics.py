"""Zero-extra-pass job metrics via Spark's Observation API.

The reference accounts workload timings by re-summing its sample
dicts after the fact (`utils/get_time.py:72-78`, ref A22/A23);
``df.observe`` attaches aggregate expressions to the SAME job that
produces the data, so counts/sums/null-rates arrive with the action —
no second scan, which at 100 TB is the difference between free
accounting and doubling the IO bill.

Use for pipeline health numbers (rows in/out, decode failures, null
fractions) alongside ``runtime/checkpoint.py``'s per-partition
manifests (which cover durable per-partition lineage; this covers
cheap whole-job counters)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observe_counts(
    df: DataFrame, name: str = "job_metrics", **exprs: Column
) -> tuple[DataFrame, Observation]:
    """Attach row count + caller aggregates to the next action on ``df``.

    Returns (df, observation); read ``observation.get`` AFTER an action
    has run. Example::

        df, obs = observe_counts(feats, null_px=F.sum(
            F.col("px_mean").isNull().cast("long")))
        df.write.parquet(out)
        obs.get  # {'rows': ..., 'null_px': ...}
    """
    obs = Observation(name)
    aggs = [F.count(F.lit(1)).alias("rows")]
    aggs += [c.alias(k) for k, c in exprs.items()]
    return df.observe(obs, *aggs), obs
