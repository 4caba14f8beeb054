"""Console-log salvage source — the reference's A1/A2 scans, Spark-first.

QCFE recovers EXPLAIN JSON plans from noisy logs in TWO formats: psql
console transcripts (filter `CREATE/DROP/Tim...` lines, strip `+`
continuation markers, re-parse — `tpch_utils_knob.py:404-441`) and
server logs keyed on `' CST ['` timestamp prefixes
(`sysbench_dataset/snapshot/snapshot.py:10-30`, `job_utils_knob.py:253`).
Here both salvages are declarative: ``spark.read.text`` → regexp noise
filter → prefix strip → ``from_json`` with an explicit RECURSIVE schema
(depth-bounded nesting of the node struct) → level-by-level explode.
Everything JVM-side; a malformed line becomes a NULL struct and is
dropped, exactly like the reference's try/except parse loop.

The reference featurizes arbitrary-depth plan trees
(`tpch_utils_knob.py:480-535`); ``from_json`` needs a closed schema, so
``plan_schema(depth)`` nests the node struct ``depth`` times (4 covers
the synthetic corpus; callers raise it for deeper trees — schema depth
is a parse-time constant, not a data limit).
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

NODE_TYPES = [
    "Seq Scan", "Index Scan", "Hash Join", "Merge Join", "Nested Loop",
    "Sort", "Aggregate", "Hash", "Limit", "Materialize",
]

SCAN_TYPES = {"Seq Scan", "Index Scan"}

REL_NAMES = ["orders", "lineitem", "customer", "part", "supplier", "nation"]

NOISE = [
    "CREATE TABLE", "DROP TABLE", "Time: 12.345 ms", "(1 row)",
    "SET", "psql:warning: ...",
]

SERVERLOG_NOISE = [
    "LOG:  checkpoint starting: time",
    "LOG:  automatic vacuum of table",
    "STATEMENT:  SELECT 1",
]

MAX_DEPTH = 4


def plan_schema(depth: int = MAX_DEPTH) -> T.StructType:
    """Node struct nested ``depth`` levels (leaf level has no Plans)."""
    fields = [
        T.StructField("Node Type", T.StringType()),
        T.StructField("Plan Rows", T.LongType()),
        T.StructField("Actual Rows", T.LongType()),
        T.StructField("Actual Total Time", T.DoubleType()),
        T.StructField("Relation Name", T.StringType()),
    ]
    schema = T.StructType(fields)
    for _ in range(depth - 1):
        schema = T.StructType(
            fields + [T.StructField("Plans", T.ArrayType(schema))]
        )
    return schema


# kept for backward compatibility with round-1 callers/tests
PLAN_SCHEMA = plan_schema(2)


def _gen_node(rng, depth_left: int) -> dict:
    nt = NODE_TYPES[int(rng.integers(0, len(NODE_TYPES)))]
    node = {
        "Node Type": nt,
        "Plan Rows": int(rng.integers(1, 100_000)),
        "Actual Rows": int(rng.integers(0, 100_000)),
        "Actual Total Time": round(float(rng.random() * 1000), 3),
    }
    if nt in SCAN_TYPES:
        node["Relation Name"] = REL_NAMES[int(rng.integers(0, len(REL_NAMES)))]
    n_kids = int(rng.integers(0, 3)) if depth_left > 1 else 0
    node["Plans"] = [_gen_node(rng, depth_left - 1) for _ in range(n_kids)]
    return node


def generate_plans(
    n_plans: int, seed: int, max_depth: int = MAX_DEPTH
) -> list[dict]:
    rng = np.random.default_rng(seed)
    return [_gen_node(rng, max_depth) for _ in range(n_plans)]


def generate_console_log(
    path: str, n_plans: int = 200, seed: int = 61, max_depth: int = MAX_DEPTH
) -> None:
    """Deterministic synthetic psql-style log: JSON plan lines padded with
    trailing '+' marks, interleaved with console noise (A1 format)."""
    rng = np.random.default_rng(seed + 1)
    lines: list[str] = []
    for plan in generate_plans(n_plans, seed, max_depth):
        for _ in range(int(rng.integers(0, 3))):
            lines.append(str(NOISE[int(rng.integers(0, len(NOISE)))]))
        lines.append(json.dumps(plan) + "+" * int(rng.integers(1, 4)))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def generate_serverlog(
    path: str, n_plans: int = 200, seed: int = 61, max_depth: int = MAX_DEPTH
) -> None:
    """A2 format: every payload line carries a ``<ts> CST [pid] LOG:``
    prefix (the reference keys its serverlog parse on `' CST ['`,
    snapshot/snapshot.py:10-30), interleaved with server noise."""
    rng = np.random.default_rng(seed + 2)
    lines: list[str] = []
    for i, plan in enumerate(generate_plans(n_plans, seed, max_depth)):
        pid = int(rng.integers(1000, 9999))
        ts = f"2024-01-01 00:{(i // 60) % 60:02d}:{i % 60:02d}"
        for _ in range(int(rng.integers(0, 3))):
            noise = SERVERLOG_NOISE[int(rng.integers(0, len(SERVERLOG_NOISE)))]
            lines.append(f"{ts} CST [{pid}] {noise}")
        lines.append(f"{ts} CST [{pid}] LOG:  plan: {json.dumps(plan)}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _plans_from_json_lines(cleaned: DataFrame, depth: int) -> DataFrame:
    parsed = cleaned.withColumn(
        "plan", F.from_json(F.col("json"), plan_schema(depth))
    ).filter(F.col("plan").isNotNull() & F.col("plan.`Node Type`").isNotNull())
    return parsed.select(
        F.monotonically_increasing_id().alias("plan_id"),
        F.col("plan.`Node Type`").alias("node_type"),
        F.col("plan.`Plan Rows`").alias("plan_rows"),
        F.col("plan.`Actual Rows`").alias("actual_rows"),
        F.col("plan.`Actual Total Time`").alias("actual_total_time"),
        F.size(F.coalesce(F.col("plan.Plans"), F.array())).alias("n_children"),
        F.col("json").alias("plans_json"),
    )


def read_plans_from_log(
    spark: SparkSession, path: str, depth: int = MAX_DEPTH
) -> DataFrame:
    """Salvage A1 console format: one row per plan with root fields +
    the raw JSON for deeper descent."""
    raw = spark.read.text(path)
    cleaned = (
        raw.filter(F.col("value").rlike(r"^\s*\{"))
        .withColumn("json", F.regexp_replace(F.col("value"), r"\++\s*$", ""))
    )
    return _plans_from_json_lines(cleaned, depth)


def read_plans_from_serverlog(
    spark: SparkSession, path: str, depth: int = MAX_DEPTH
) -> DataFrame:
    """Salvage A2 serverlog format: key on `' CST ['`, take the JSON
    payload after the `LOG:  plan:` marker."""
    raw = spark.read.text(path)
    cleaned = (
        raw.filter(
            F.col("value").contains(" CST [")
            & F.col("value").contains("LOG:  plan:")
        )
        .withColumn(
            "json",
            F.regexp_extract(F.col("value"), r"LOG:\s+plan:\s+(\{.*\})\s*$", 1),
        )
        .filter(F.col("json") != "")
    )
    return _plans_from_json_lines(cleaned, depth)


def per_node_samples(plans: DataFrame, depth: int = MAX_DEPTH) -> DataFrame:
    """Explode EVERY tree level into per-node (node_type, actual_rows,
    time) rows — the reference's recursive snapshot sample collection
    (A5, snapshot/snapshot.py:38-58) including its zero-row filter.

    Level-by-level: unions one frame per depth level, each a projection +
    explode of the parsed struct. Depth is a small constant, so this is
    ``depth`` narrow passes — no UDF, full codegen.
    """
    tree = plans.select(
        "plan_id", F.from_json("plans_json", plan_schema(depth)).alias("node")
    )
    frames = []
    cur = tree
    for lvl in range(depth):
        frames.append(
            cur.select(
                "plan_id",
                F.col("node.`Node Type`").alias("node_type"),
                F.col("node.`Actual Rows`").alias("actual_rows"),
                F.col("node.`Actual Total Time`").alias("actual_total_time"),
            )
        )
        if lvl < depth - 1:
            cur = cur.select(
                "plan_id",
                F.explode(
                    F.coalesce(F.col("node.Plans"), F.array())
                ).alias("node"),
            )
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out.filter(F.col("actual_rows") > 0)
