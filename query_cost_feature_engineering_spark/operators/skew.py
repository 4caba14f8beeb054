"""Salted shuffle join — explicit skew mitigation for non-broadcastable joins.

When the probe side of an equi-join has heavy-hitter keys and the build
side is too large to broadcast, the single shuffle partition holding a hot
key becomes the straggler (AQE's skew-join split helps reads but cannot
split a single hash bucket that one key occupies). The classic fix is
salting: spread each probe-side key over ``n_salts`` sub-keys with a
deterministic per-row salt, replicate every build-side row once per salt
value, and join on ``(key, salt)``. The join result is row-identical to
the unsalted join — replication is on the build side only, and each probe
row meets exactly the one replica carrying its salt.

Cost model (why this is 100-TB-safe): build side grows ``n_salts``×, but
it is the *small-but-not-broadcastable* side by assumption; the probe
side — the 100-TB one — is neither replicated nor re-read. Hot keys now
hash to ``n_salts`` distinct shuffle buckets, so the straggler partition
shrinks by the same factor. Salt derivation uses ``xxhash64`` of the
probe row's unique column (never ``rand()``: retried tasks must re-derive
the same salt or the join drops/duplicates rows on speculative retry).

Reference analog: the reference's per-template Python loops never face
skew (single process); this operator is part of the shuffle layer the
Spark rewrite adds — same role as the hot-entity time-slicing in
``operators/asof.py``, generalized to plain equi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    *,
    n_salts: int = 8,
    salt_col: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe`` with ``build`` on key equality, salted ``n_salts`` ways.

    ``salt_col`` names a probe-side column whose per-row hash seeds the
    salt (use the row's primary key; any column works — salt quality only
    affects balance, never correctness). Returns the same rows as
    ``probe.join(build, probe[probe_key] == build[build_key], how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    p = probe.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)).cast("int")
    )
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    cond = (p[probe_key] == b[build_key]) & (p["__salt"] == b["__salt"])
    return p.join(b, cond, how).drop("__salt")
