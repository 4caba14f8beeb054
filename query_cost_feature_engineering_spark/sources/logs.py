"""Console-log salvage source — the reference's A1/A2 scan, Spark-first.

QCFE recovers EXPLAIN JSON plans from noisy psql console logs by filtering
`CREATE/DROP/Tim...` lines, stripping `+` continuation markers, and
re-parsing (`tpch_utils_knob.py:404-441`, sysbench serverlog variant
`snapshot/snapshot.py:10-30`). Here the same salvage is declarative:
``spark.read.text`` → regexp noise filter → strip `+` padding →
``from_json`` with an explicit recursive-ish schema → explode one child
level. Everything JVM-side; a malformed line becomes a NULL struct and is
dropped, exactly like the reference's try/except parse loop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

NODE_TYPES = [
    "Seq Scan", "Index Scan", "Hash Join", "Merge Join", "Nested Loop",
    "Sort", "Aggregate", "Hash", "Limit", "Materialize",
]

NOISE = [
    "CREATE TABLE", "DROP TABLE", "Time: 12.345 ms", "(1 row)",
    "SET", "psql:warning: ...",
]

# one child level is enough for the featurizer contract; deeper trees are
# re-parsed from `plans_json` by the caller if needed
PLAN_SCHEMA = T.StructType(
    [
        T.StructField("Node Type", T.StringType()),
        T.StructField("Plan Rows", T.LongType()),
        T.StructField("Actual Rows", T.LongType()),
        T.StructField("Actual Total Time", T.DoubleType()),
        T.StructField(
            "Plans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("Node Type", T.StringType()),
                        T.StructField("Actual Rows", T.LongType()),
                        T.StructField("Actual Total Time", T.DoubleType()),
                    ]
                )
            ),
        ),
    ]
)


def generate_console_log(path: str, n_plans: int = 200, seed: int = 61) -> None:
    """Deterministic synthetic psql-style log: JSON plan lines padded with
    trailing '+' marks, interleaved with console noise."""
    import json

    rng = np.random.default_rng(seed)
    lines: list[str] = []
    for i in range(n_plans):
        for _ in range(int(rng.integers(0, 3))):
            lines.append(str(NOISE[int(rng.integers(0, len(NOISE)))]))
        nt = NODE_TYPES[int(rng.integers(0, len(NODE_TYPES)))]
        n_kids = int(rng.integers(0, 3))
        kids = [
            {
                "Node Type": NODE_TYPES[int(rng.integers(0, len(NODE_TYPES)))],
                "Actual Rows": int(rng.integers(0, 10_000)),
                "Actual Total Time": round(float(rng.random() * 100), 3),
            }
            for _ in range(n_kids)
        ]
        plan = {
            "Node Type": nt,
            "Plan Rows": int(rng.integers(1, 100_000)),
            "Actual Rows": int(rng.integers(0, 100_000)),
            "Actual Total Time": round(float(rng.random() * 1000), 3),
            "Plans": kids,
        }
        lines.append(json.dumps(plan) + "+" * int(rng.integers(1, 4)))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def read_plans_from_log(spark: SparkSession, path: str) -> DataFrame:
    """Salvage plans: one row per plan with plan_id + parsed fields."""
    raw = spark.read.text(path)
    cleaned = (
        raw.filter(F.col("value").rlike(r"^\s*\{"))
        .withColumn("json", F.regexp_replace(F.col("value"), r"\++\s*$", ""))
        .withColumn("plan", F.from_json(F.col("json"), PLAN_SCHEMA))
        .filter(F.col("plan").isNotNull() & F.col("plan.`Node Type`").isNotNull())
    )
    return cleaned.select(
        F.monotonically_increasing_id().alias("plan_id"),
        F.col("plan.`Node Type`").alias("node_type"),
        F.col("plan.`Plan Rows`").alias("plan_rows"),
        F.col("plan.`Actual Rows`").alias("actual_rows"),
        F.col("plan.`Actual Total Time`").alias("actual_total_time"),
        F.size(F.coalesce(F.col("plan.Plans"), F.array())).alias("n_children"),
        F.col("json").alias("plans_json"),
    )


def per_node_samples(plans: DataFrame) -> DataFrame:
    """Explode parent+children into per-node (node_type, actual_rows, time)
    rows — the reference's snapshot sample collection (A5,
    snapshot/snapshot.py:38-58) including its zero-row filter."""
    parents = plans.select(
        "plan_id",
        F.col("node_type"),
        F.col("actual_rows"),
        F.col("actual_total_time"),
    )
    kids = (
        plans.withColumn(
            "kid",
            F.explode(
                F.from_json(F.col("plans_json"), PLAN_SCHEMA).getField("Plans")
            ),
        )
        .select(
            "plan_id",
            F.col("kid.`Node Type`").alias("node_type"),
            F.col("kid.`Actual Rows`").alias("actual_rows"),
            F.col("kid.`Actual Total Time`").alias("actual_total_time"),
        )
    )
    return parents.unionByName(kids).filter(F.col("actual_rows") > 0)
