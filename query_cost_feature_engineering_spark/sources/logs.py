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
    # round 3: the remaining node types of the reference's featurizer
    # dispatch (TPCH_GET_INPUT, tpch_utils_knob.py:194-208) — appended so
    # existing one-hot indices stay stable
    "Index Only Scan", "Bitmap Heap Scan", "Bitmap Index Scan",
    "ModifyTable",
]

SCAN_TYPES = {"Seq Scan", "Index Scan"}
# Seq-Scan-shaped (rel + predicate-masked attr stats; ref get_scan_input,
# which falls back Filter -> Recheck Cond) vs Index-Scan-shaped (adds
# index one-hot + scan direction; ref get_index_scan_input)
SEQ_LIKE_TYPES = {"Seq Scan", "Bitmap Heap Scan"}
INDEX_LIKE_TYPES = {"Index Scan", "Index Only Scan"}
JOIN_NODE_TYPES = {"Hash Join", "Merge Join", "Nested Loop"}

REL_NAMES = ["orders", "lineitem", "customer", "part", "supplier", "nation"]

# Vocabularies for the A4 featurizers — the graft of the reference's
# attr_rel_dict.py (join_types, parent_rel_types, sort_algos,
# aggreg_strats, rel_attr_list_dict, index_names) over this engine's
# six-table testdata schema.
JOIN_TYPES = ["semi", "inner", "anti", "full", "right", "left"]
PARENT_REL_TYPES = ["inner", "outer", "subquery"]
AGG_STRATEGIES = ["plain", "sorted", "hashed"]
SORT_ALGOS = ["quicksort", "top-n heapsort"]

MAX_ATTR = 8  # attr slots per relation (ref max_num_attr=16; 8 covers ours)
REL_ATTRS = {
    "orders": [
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority", "o_clerk", "o_shippriority",
    ],
    "lineitem": [
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_shipdate", "l_returnflag",
    ],
    "customer": [
        "c_custkey", "c_name", "c_address", "c_nationkey",
        "c_phone", "c_acctbal", "c_mktsegment", "c_comment",
    ],
    "part": [
        "p_partkey", "p_name", "p_mfgr", "p_brand",
        "p_type", "p_size", "p_container", "p_retailprice",
    ],
    "supplier": [
        "s_suppkey", "s_name", "s_address", "s_nationkey",
        "s_phone", "s_acctbal", "s_comment",
    ],
    "nation": ["n_nationkey", "n_name", "n_regionkey", "n_comment"],
}
INDEX_NAMES = [f"idx_{r}_pk" for r in REL_NAMES]


def attr_stats(rel_idx: int, attr_idx: int) -> tuple[float, float, float]:
    """Deterministic (min, med, max) column statistics for attribute slot
    ``attr_idx`` of relation ``rel_idx`` — the engine's stand-in for the
    reference's precomputed ``attr_val_dict.pickle`` (per-attr min/med/max
    looked up when a predicate substring matches the attr). A closed
    formula keeps both engines and the DuckDB oracle bit-identical."""
    base = float(rel_idx * MAX_ATTR + attr_idx + 1)
    return base, base * 2.0 + 3.0, base * 4.0 + 7.0


SCAN_DIRECTIONS = ["Forward", "Backward"]
SORT_METHODS = ["quicksort", "top-n heapsort", "external merge"]

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
    """Node struct nested ``depth`` levels (leaf level has no Plans).

    Round 3 widens the node struct to the reference's full featurized
    surface (`tpch_utils_knob.py:76-191`): predicate/condition strings,
    index name + scan direction, sort keys + method, join type + parent
    relationship + hash/merge conds, aggregate strategy + parallel flag,
    hash buckets, and the `get_basics` numerics (Plan Width, Total
    Cost). Absent fields parse to NULL — old fixtures stay readable."""
    fields = [
        T.StructField("Node Type", T.StringType()),
        T.StructField("Node Id", T.LongType()),
        T.StructField("Plan Rows", T.LongType()),
        T.StructField("Plan Width", T.LongType()),
        T.StructField("Total Cost", T.DoubleType()),
        T.StructField("Actual Rows", T.LongType()),
        T.StructField("Actual Total Time", T.DoubleType()),
        T.StructField("Relation Name", T.StringType()),
        T.StructField("Filter", T.StringType()),
        T.StructField("Recheck Cond", T.StringType()),
        T.StructField("Index Name", T.StringType()),
        T.StructField("Index Cond", T.StringType()),
        T.StructField("Scan Direction", T.StringType()),
        T.StructField("Sort Key", T.ArrayType(T.StringType())),
        T.StructField("Sort Method", T.StringType()),
        T.StructField("Join Type", T.StringType()),
        T.StructField("Parent Relationship", T.StringType()),
        T.StructField("Hash Cond", T.StringType()),
        T.StructField("Merge Cond", T.StringType()),
        T.StructField("Strategy", T.StringType()),
        T.StructField("Parallel Aware", T.StringType()),
        T.StructField("Hash Buckets", T.LongType()),
    ]
    schema = T.StructType(fields)
    for _ in range(depth - 1):
        schema = T.StructType(
            fields + [T.StructField("Plans", T.ArrayType(schema))]
        )
    return schema


# kept for backward compatibility with round-1 callers/tests
PLAN_SCHEMA = plan_schema(2)


def _pick(rng, seq):
    return seq[int(rng.integers(0, len(seq)))]


def _gen_predicate(rng, rel: str) -> str:
    """PG-style predicate over 1-3 attrs of ``rel`` — the substring the
    featurizer's attr matching (ref tpch_utils_knob.py:76-86) keys on."""
    attrs = REL_ATTRS[rel]
    n = int(rng.integers(1, 4))
    idxs = sorted(rng.choice(len(attrs), size=min(n, len(attrs)), replace=False))
    ops = [">", "<", "=", ">=", "<="]
    clauses = [
        f"({attrs[i]} {_pick(rng, ops)} {int(rng.integers(0, 100000))})"
        for i in idxs
    ]
    return " AND ".join(clauses)


def _gen_join_cond(rng, op: str) -> str:
    ra = _pick(rng, REL_NAMES)
    rb = _pick(rng, [r for r in REL_NAMES if r != ra])
    aa = _pick(rng, REL_ATTRS[ra])
    ab = _pick(rng, REL_ATTRS[rb])
    return f"({ra}.{aa} {op} {rb}.{ab})"


def _gen_sort_keys(rng) -> list[str]:
    keys = []
    for _ in range(int(rng.integers(1, 4))):
        rel = _pick(rng, REL_NAMES)
        attr = _pick(rng, REL_ATTRS[rel])
        tok = f"{rel}.{attr}"
        if rng.random() < 0.25:  # exercise the paren-strip path (ref :160)
            tok = f"max({tok})"
        keys.append(tok)
    return keys


def _gen_node(rng, depth_left: int, counter: list[int]) -> dict:
    nt = NODE_TYPES[int(rng.integers(0, len(NODE_TYPES)))]
    counter[0] += 1
    node = {
        "Node Type": nt,
        "Node Id": counter[0],
        "Plan Rows": int(rng.integers(1, 100_000)),
        "Plan Width": int(rng.integers(4, 200)),
        "Total Cost": round(float(rng.random() * 10000), 3),
        "Actual Rows": int(rng.integers(0, 100_000)),
        "Actual Total Time": round(float(rng.random() * 1000), 3),
    }
    if nt in SEQ_LIKE_TYPES:
        rel = _pick(rng, REL_NAMES)
        node["Relation Name"] = rel
        if nt == "Seq Scan":
            if rng.random() < 0.8:  # absent -> featurizer's zero default
                node["Filter"] = _gen_predicate(rng, rel)
        else:  # Bitmap Heap Scan: PG emits Recheck Cond (the featurizer's
            # Filter -> Recheck Cond fallback path, ref :94-100); a
            # residual Filter accompanies it sometimes and wins when it
            # does
            node["Recheck Cond"] = _gen_predicate(rng, rel)
            if rng.random() < 0.3:
                node["Filter"] = _gen_predicate(rng, rel)
    elif nt in INDEX_LIKE_TYPES:
        rel = _pick(rng, REL_NAMES)
        node["Relation Name"] = rel
        node["Index Name"] = f"idx_{rel}_pk"
        node["Index Cond"] = _gen_predicate(rng, rel)
        node["Scan Direction"] = _pick(rng, SCAN_DIRECTIONS)
    elif nt == "Bitmap Index Scan":
        # PG bitmap index scans carry NO Relation Name — only the index
        # (ref get_bitmap_index_scan_input: basics + index one-hot)
        rel = _pick(rng, REL_NAMES)
        node["Index Name"] = f"idx_{rel}_pk"
        node["Index Cond"] = _gen_predicate(rng, rel)
    elif nt == "ModifyTable":
        node["Relation Name"] = _pick(rng, REL_NAMES)
    elif nt in JOIN_NODE_TYPES:
        node["Join Type"] = _pick(rng, JOIN_TYPES).capitalize()
        if nt == "Hash Join":
            node["Hash Cond"] = _gen_join_cond(rng, "=")
        elif nt == "Merge Join":
            node["Merge Cond"] = _gen_join_cond(rng, "=")
        if nt != "Nested Loop" and rng.random() < 0.7:
            node["Parent Relationship"] = _pick(rng, PARENT_REL_TYPES).capitalize()
    elif nt == "Sort":
        node["Sort Key"] = _gen_sort_keys(rng)
        if rng.random() < 0.8:
            node["Sort Method"] = _pick(rng, SORT_METHODS)
    elif nt == "Hash":
        if rng.random() < 0.7:
            node["Hash Buckets"] = int(2 ** rng.integers(10, 22))
    elif nt == "Aggregate":
        node["Strategy"] = _pick(rng, AGG_STRATEGIES).capitalize()
        node["Parallel Aware"] = "true" if rng.random() < 0.3 else "false"
    n_kids = int(rng.integers(0, 3)) if depth_left > 1 else 0
    node["Plans"] = [
        _gen_node(rng, depth_left - 1, counter) for _ in range(n_kids)
    ]
    return node


def generate_plans(
    n_plans: int, seed: int, max_depth: int = MAX_DEPTH
) -> list[dict]:
    rng = np.random.default_rng(seed)
    counter = [0]
    return [_gen_node(rng, max_depth, counter) for _ in range(n_plans)]


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


def generate_explain_json_log(
    path: str, n_plans: int = 200, seed: int = 61, max_depth: int = MAX_DEPTH
) -> None:
    """Real ``EXPLAIN (ANALYZE, FORMAT JSON)`` shape: each line is the
    one-element array PostgreSQL emits, wrapping the root node under
    "Plan" alongside top-level keys ("Planning Time", "Execution Time",
    "Triggers") the featurizer must tolerate and ignore. Same plan
    stream as generate_console_log at the same (n, seed), so the two
    formats parse to IDENTICAL node rows."""
    rng = np.random.default_rng(seed + 3)
    lines: list[str] = []
    for plan in generate_plans(n_plans, seed, max_depth):
        wrapped = [
            {
                "Plan": plan,
                "Planning Time": round(float(rng.random() * 10), 3),
                "Triggers": [],
                "Execution Time": round(float(rng.random() * 1000), 3),
            }
        ]
        lines.append(json.dumps(wrapped))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def read_plans_from_explain_json(
    spark: SparkSession, path: str, depth: int = MAX_DEPTH
) -> DataFrame:
    """Salvage REAL ``EXPLAIN (FORMAT JSON)`` output: accepts per line
    either PostgreSQL's one-element array wrapper
    (``[{"Plan": {...}, "Execution Time": ...}]``), the bare wrapper
    object, or a bare node (the synthetic corpus format) — unknown
    top-level keys are ignored by ``from_json``. ``plans_json`` is the
    canonical re-serialization (``to_json`` of the parsed node) so every
    downstream consumer (``per_node_rows``, the MSCN serializer) reads
    the same shape regardless of source format. NOTE: pretty-printed
    multi-line EXPLAIN files are whole-file JSON, not log lines — read
    those with ``spark.read.option("multiLine", True).json`` and select
    ``Plan`` directly; this reader is for log-embedded one-line plans."""
    wrapper = T.StructType(
        [
            T.StructField("Plan", plan_schema(depth)),
            T.StructField("Planning Time", T.DoubleType()),
            T.StructField("Execution Time", T.DoubleType()),
        ]
    )
    raw = spark.read.text(path)
    stripped = F.regexp_replace(
        F.regexp_replace(F.col("value"), r"^\s*\[\s*", ""), r"\s*\]\s*$", ""
    )
    parsed = (
        raw.filter(F.col("value").rlike(r"^\s*[\[{]"))
        .withColumn("w", F.from_json(stripped, wrapper))
        .withColumn(
            "plan",
            F.coalesce(F.col("w.Plan"), F.from_json(stripped, plan_schema(depth))),
        )
        .filter(F.col("plan").isNotNull() & F.col("plan.`Node Type`").isNotNull())
    )
    return parsed.select(
        F.monotonically_increasing_id().alias("plan_id"),
        F.col("plan.`Node Type`").alias("node_type"),
        F.col("plan.`Plan Rows`").alias("plan_rows"),
        F.col("plan.`Actual Rows`").alias("actual_rows"),
        F.col("plan.`Actual Total Time`").alias("actual_total_time"),
        F.size(F.coalesce(F.col("plan.Plans"), F.array())).alias("n_children"),
        F.col("w.`Planning Time`").alias("planning_time"),
        F.col("w.`Execution Time`").alias("execution_time"),
        F.to_json(F.col("plan")).alias("plans_json"),
    )


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


# (JSON field, snake_case column) pairs for the full per-node surface.
NODE_FIELDS = [
    ("Node Id", "node_id"),
    ("Node Type", "node_type"),
    ("Plan Rows", "plan_rows"),
    ("Plan Width", "plan_width"),
    ("Total Cost", "total_cost"),
    ("Actual Rows", "actual_rows"),
    ("Actual Total Time", "actual_total_time"),
    ("Relation Name", "relation_name"),
    ("Filter", "filter_cond"),
    ("Recheck Cond", "recheck_cond"),
    ("Index Name", "index_name"),
    ("Index Cond", "index_cond"),
    ("Scan Direction", "scan_direction"),
    ("Sort Key", "sort_key"),
    ("Sort Method", "sort_method"),
    ("Join Type", "join_type"),
    ("Parent Relationship", "parent_relationship"),
    ("Hash Cond", "hash_cond"),
    ("Merge Cond", "merge_cond"),
    ("Strategy", "strategy"),
    ("Parallel Aware", "parallel_aware"),
    ("Hash Buckets", "hash_buckets"),
]


def per_node_rows(plans: DataFrame, depth: int = MAX_DEPTH) -> DataFrame:
    """Explode EVERY tree level into per-node rows carrying the FULL
    field surface (NODE_FIELDS) — the input to the A4 featurizers
    (functions/plan_features.py). Same level-by-level JVM explode as
    per_node_samples; no UDF."""
    tree = plans.select(
        "plan_id", F.from_json("plans_json", plan_schema(depth)).alias("node")
    )
    proj = [
        F.col(f"node.`{jf}`").alias(out) for jf, out in NODE_FIELDS
    ]
    frames = []
    cur = tree
    for lvl in range(depth):
        frames.append(cur.select("plan_id", F.lit(lvl).alias("level"), *proj))
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
    return out


def flatten_plan_nodes(plans: list[dict]) -> list[dict]:
    """Pure-Python pre-order flatten of plan dicts to NODE_FIELDS rows —
    the fixture side of the plan_featurize_nodes oracle (and the golden
    for per_node_rows)."""
    rows: list[dict] = []

    def walk(node: dict, level: int) -> None:
        rows.append(
            {out: node.get(jf) for jf, out in NODE_FIELDS} | {"level": level}
        )
        for child in node.get("Plans") or []:
            walk(child, level + 1)

    for p in plans:
        walk(p, 0)
    return rows


# The plan_featurize_nodes corpus: ONE deterministic (seed, size) shared
# by the Spark query (log-text side) and the DuckDB oracle (raw-node
# parquet side).
PLAN_FIXTURE_SEED = 64
PLAN_FIXTURE_N = 200


def ensure_plan_nodes_fixture() -> str:
    """Write (once) and return the raw per-node parquet the DuckDB oracle
    reads. The filename embeds a digest of the generated rows, so a
    generator change can never pair a stale fixture with fresh Spark
    output; generation is pure Python + pyarrow (callable from the oracle
    module, no Spark needed) and atomic (write-aside + rename)."""
    import hashlib
    import os
    import tempfile

    rows = flatten_plan_nodes(generate_plans(PLAN_FIXTURE_N, PLAN_FIXTURE_SEED))
    key = hashlib.md5(
        json.dumps(rows, sort_keys=True).encode()
    ).hexdigest()[:10]
    d = os.path.join(tempfile.gettempdir(), "qcfe_fixtures")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"plan_nodes_{key}.parquet")
    if not os.path.exists(path):
        tmp = f"{path}.tmp{os.getpid()}"
        write_plan_nodes_parquet(tmp, rows)
        os.replace(tmp, path)
    return path


def write_plan_nodes_parquet(path: str, rows: list[dict]) -> None:
    """Raw per-node parquet (pyarrow, no Spark) — the DuckDB-visible
    mirror of the log corpus the Spark side parses. Both engines
    featurize independently from their own parse; the driver's hash
    compare then checks parse + featurization end to end."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    schema = pa.schema(
        [
            ("node_id", pa.int64()),
            ("node_type", pa.string()),
            ("plan_rows", pa.int64()),
            ("plan_width", pa.int64()),
            ("total_cost", pa.float64()),
            ("actual_rows", pa.int64()),
            ("actual_total_time", pa.float64()),
            ("relation_name", pa.string()),
            ("filter_cond", pa.string()),
            ("recheck_cond", pa.string()),
            ("index_name", pa.string()),
            ("index_cond", pa.string()),
            ("scan_direction", pa.string()),
            ("sort_key", pa.list_(pa.string())),
            ("sort_method", pa.string()),
            ("join_type", pa.string()),
            ("parent_relationship", pa.string()),
            ("hash_cond", pa.string()),
            ("merge_cond", pa.string()),
            ("strategy", pa.string()),
            ("parallel_aware", pa.string()),
            ("hash_buckets", pa.int64()),
            ("level", pa.int32()),
        ]
    )
    cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
    pq.write_table(pa.table(cols, schema=schema), path)


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
