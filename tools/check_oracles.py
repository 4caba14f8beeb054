"""Driver-mimicking correctness harness: run every queries() entry on
Spark and its oracle_sql() on DuckDB at a given sf, compare row count,
column names, and order-insensitive values. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(duck_df):
        problems.append(f"rows: spark={len(spark_df)} duck={len(duck_df)}")
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        problems.append(f"cols: spark={sc} duck={dc}")
        return problems
    a = spark_df[sc].copy()
    b = duck_df[sc].copy()
    sort_cols = sc
    a = a.sort_values(sort_cols, kind="mergesort", na_position="last").reset_index(drop=True)
    b = b.sort_values(sort_cols, kind="mergesort", na_position="last").reset_index(drop=True)
    if len(a) != len(b):
        return problems
    for c in sc:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            if not np.allclose(
                av.astype(float), bv.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True
            ):
                bad = (~np.isclose(av.astype(float), bv.astype(float), equal_nan=True)).sum()
                problems.append(f"col {c}: {bad} float mismatches, e.g. "
                                f"{av[~np.isclose(av.astype(float), bv.astype(float), equal_nan=True)].head(2).tolist()} vs "
                                f"{bv[~np.isclose(av.astype(float), bv.astype(float), equal_nan=True)].head(2).tolist()}")
        else:
            eq = (av.astype(str).fillna("∅") == bv.astype(str).fillna("∅"))
            if not eq.all():
                i = (~eq).idxmax()
                problems.append(
                    f"col {c}: {(~eq).sum()} mismatches, first at {i}: "
                    f"{av[i]!r} vs {bv[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from query_cost_feature_engineering_spark.session import get_spark

    spark = get_spark(app="check-oracles", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, os_ = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e).splitlines()[0][:200]}")
            failures += 1
            continue
        if name not in os_:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            ddf = con.execute(os_[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0][:200]}")
            failures += 1
            continue
        probs = compare(name, sdf, ddf)
        if probs:
            failures += 1
            print(f"FAIL  {name}: " + " | ".join(probs))
        else:
            print(f"OK    {name}: {len(sdf)} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
