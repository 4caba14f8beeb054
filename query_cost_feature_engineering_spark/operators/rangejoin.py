"""Interval / range joins without a Cartesian product.

A join whose predicate is ``fact.ts BETWEEN interval.start AND
interval.end`` has no equality key, so Spark's only built-in plan is
BroadcastNestedLoopJoin — O(|facts|·|intervals|) comparisons, fine for a
handful of intervals, fatal at 100 TB. The scale path used by every
production range-join implementation (and by DuckDB/Trino's interval-join
optimizations) is **binning**: quantize time into fixed-width bins, map
each fact to the single bin containing its timestamp, explode each
interval to every bin it overlaps, equi-join on the bin id, then apply
the exact BETWEEN as a post-filter.

Correctness: a (fact, interval) pair satisfying the BETWEEN shares the
fact's bin (the interval covers the fact's timestamp, hence its bin), and
the fact side carries ONE bin per row, so the pair surfaces exactly once
— no dedup needed.

Scale properties:
- one shuffle, on the bin id (or zero if the exploded interval side is
  small enough to broadcast — the common case, since intervals are
  usually a dimension);
- interval blow-up factor = interval_length / bin_width + 1; pick
  ``bin_width`` near the typical interval length to keep it ≈ 2;
- a hot bin (burst of facts) is an ordinary skewed equi-join key — AQE
  skew-join splitting applies, unlike a nested-loop plan.

Reference parity: the reference featurizes plan nodes with start/total
cost *ranges* (SURVEY §2.B predicates); this operator is the general
range-predicate join its workloads would need at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPOCH = "1970-01-01"


def _day_bin(col: Column, bin_width_days: int) -> Column:
    return F.floor(F.datediff(col, F.lit(_EPOCH)) / bin_width_days)


def range_join_binned(
    facts: DataFrame,
    fact_ts: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bin_width_days: int = 7,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Join ``facts`` to every interval containing ``fact_ts`` (inclusive
    bounds), via bin equi-join + exact verify. Returns facts ⋈ intervals
    with all columns from both sides."""
    f = facts.withColumn("_bin", _day_bin(F.col(fact_ts), bin_width_days))
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                _day_bin(F.col(start_col), bin_width_days),
                _day_bin(F.col(end_col), bin_width_days),
            )
        ),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    return (
        f.join(iv, on="_bin")
        .filter(F.col(fact_ts).between(F.col(start_col), F.col(end_col)))
        .drop("_bin")
    )
