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
``plan_schema(depth)`` nests the node struct ``depth`` times. Since
round 4 the depth is AUTO-DETECTED per corpus (``_resolve_depth``:
exact, map-only truncation check + schema doubling), so arbitrary-depth
trees parse without configuration and an explicitly-passed depth fails
loudly instead of silently truncating.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

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


@dataclass(frozen=True)
class PlanVocab:
    """Workload-parameterized plan vocabulary — the graft of the
    reference's per-workload schema dictionaries (it swaps an entire
    module per workload: TPCH 18 ops vs JOB/sysbench 23 ops adding
    ModifyTable/LockRows/Result/Append/Unique, and a different relation
    + attribute + index list — ``job_dataset/attr_rel_dict.py:2-56``).
    Every featurizer / generator / serializer takes a ``PlanVocab``
    argument with :data:`TPCH_VOCAB` (the module constants above) as the
    default, so a user with JOB-style logs passes a vocabulary instead
    of editing source."""

    name: str
    node_types: tuple[str, ...]
    rel_names: tuple[str, ...]
    rel_attrs: dict[str, tuple[str, ...]] = field(repr=False)
    index_names: tuple[str, ...] = ()
    join_types: tuple[str, ...] = tuple(JOIN_TYPES)
    parent_rel_types: tuple[str, ...] = tuple(PARENT_REL_TYPES)
    agg_strategies: tuple[str, ...] = tuple(AGG_STRATEGIES)
    sort_algos: tuple[str, ...] = tuple(SORT_ALGOS)
    max_attr: int = MAX_ATTR
    seq_like: tuple[str, ...] = tuple(sorted(SEQ_LIKE_TYPES))
    index_like: tuple[str, ...] = tuple(sorted(INDEX_LIKE_TYPES))
    join_nodes: tuple[str, ...] = tuple(sorted(JOIN_NODE_TYPES))

    def attr_stats(self, rel_idx: int, attr_idx: int):
        base = float(rel_idx * self.max_attr + attr_idx + 1)
        return base, base * 2.0 + 3.0, base * 4.0 + 7.0


TPCH_VOCAB = PlanVocab(
    name="tpch",
    node_types=tuple(NODE_TYPES),
    rel_names=tuple(REL_NAMES),
    rel_attrs={r: tuple(a) for r, a in REL_ATTRS.items()},
    index_names=tuple(INDEX_NAMES),
)

# JOB-style vocabulary: the PostgreSQL node types the reference's
# JOB/sysbench dictionary adds over TPCH (ModifyTable, LockRows, Result,
# Append, Unique — job_dataset/attr_rel_dict.py:2-7; ModifyTable already
# in the TPCH list here) plus common executor nodes, over the public
# IMDB/JOB benchmark schema (Leis et al., "How Good Are Query
# Optimizers, Really?", VLDB 2015).
_JOB_RELS = {
    "title": (
        "id", "kind_id", "production_year", "imdb_index",
        "phonetic_code", "season_nr", "episode_nr", "series_years",
    ),
    "name": (
        "id", "name_pcode_cf", "name_pcode_nf", "surname_pcode",
        "imdb_index", "gender",
    ),
    "cast_info": (
        "id", "person_id", "movie_id", "person_role_id",
        "role_id", "nr_order", "note",
    ),
    "movie_info": ("id", "movie_id", "info_type_id", "info", "note"),
    "company_name": (
        "id", "country_code", "imdb_index",
        "name_pcode_nf", "name_pcode_sf",
    ),
    "keyword": ("id", "keyword", "phonetic_code"),
}
JOB_VOCAB = PlanVocab(
    name="job",
    node_types=tuple(NODE_TYPES) + (
        "LockRows", "Result", "Append", "Unique",
        "Gather", "Gather Merge", "CTE Scan", "WindowAgg", "Group",
    ),
    rel_names=tuple(_JOB_RELS),
    rel_attrs=_JOB_RELS,
    index_names=tuple(f"idx_{r}_pk" for r in _JOB_RELS),
)


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
        # InitPlan/SubPlan marker — the reference flags these nodes
        # (tpch_utils_knob.py:531-534) and its flow model sums subplan
        # predicted times into the parent (models/QPPNet.py:191-198)
        T.StructField("Subplan Name", T.StringType()),
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


def _gen_predicate(rng, rel: str, vocab: PlanVocab) -> str:
    """PG-style predicate over 1-3 attrs of ``rel`` — the substring the
    featurizer's attr matching (ref tpch_utils_knob.py:76-86) keys on."""
    attrs = vocab.rel_attrs[rel]
    n = int(rng.integers(1, 4))
    idxs = sorted(rng.choice(len(attrs), size=min(n, len(attrs)), replace=False))
    ops = [">", "<", "=", ">=", "<="]
    clauses = [
        f"({attrs[i]} {_pick(rng, ops)} {int(rng.integers(0, 100000))})"
        for i in idxs
    ]
    return " AND ".join(clauses)


def _gen_join_cond(rng, op: str, vocab: PlanVocab) -> str:
    ra = _pick(rng, vocab.rel_names)
    rb = _pick(rng, [r for r in vocab.rel_names if r != ra])
    aa = _pick(rng, vocab.rel_attrs[ra])
    ab = _pick(rng, vocab.rel_attrs[rb])
    return f"({ra}.{aa} {op} {rb}.{ab})"


def _gen_sort_keys(rng, vocab: PlanVocab) -> list[str]:
    keys = []
    for _ in range(int(rng.integers(1, 4))):
        rel = _pick(rng, vocab.rel_names)
        attr = _pick(rng, vocab.rel_attrs[rel])
        tok = f"{rel}.{attr}"
        if rng.random() < 0.25:  # exercise the paren-strip path (ref :160)
            tok = f"max({tok})"
        keys.append(tok)
    return keys


def _gen_node(
    rng,
    depth_left: int,
    counter: list[int],
    vocab: PlanVocab = TPCH_VOCAB,
    is_root: bool = True,
) -> dict:
    nt = vocab.node_types[int(rng.integers(0, len(vocab.node_types)))]
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
    if nt in vocab.seq_like:
        rel = _pick(rng, vocab.rel_names)
        node["Relation Name"] = rel
        if nt == "Seq Scan":
            if rng.random() < 0.8:  # absent -> featurizer's zero default
                node["Filter"] = _gen_predicate(rng, rel, vocab)
        else:  # Bitmap Heap Scan: PG emits Recheck Cond (the featurizer's
            # Filter -> Recheck Cond fallback path, ref :94-100); a
            # residual Filter accompanies it sometimes and wins when it
            # does
            node["Recheck Cond"] = _gen_predicate(rng, rel, vocab)
            if rng.random() < 0.3:
                node["Filter"] = _gen_predicate(rng, rel, vocab)
    elif nt in vocab.index_like:
        rel = _pick(rng, vocab.rel_names)
        node["Relation Name"] = rel
        node["Index Name"] = f"idx_{rel}_pk"
        node["Index Cond"] = _gen_predicate(rng, rel, vocab)
        node["Scan Direction"] = _pick(rng, SCAN_DIRECTIONS)
    elif nt == "Bitmap Index Scan":
        # PG bitmap index scans carry NO Relation Name — only the index
        # (ref get_bitmap_index_scan_input: basics + index one-hot)
        rel = _pick(rng, vocab.rel_names)
        node["Index Name"] = f"idx_{rel}_pk"
        node["Index Cond"] = _gen_predicate(rng, rel, vocab)
    elif nt == "ModifyTable":
        node["Relation Name"] = _pick(rng, vocab.rel_names)
    elif nt in vocab.join_nodes:
        node["Join Type"] = _pick(rng, vocab.join_types).capitalize()
        if nt == "Hash Join":
            node["Hash Cond"] = _gen_join_cond(rng, "=", vocab)
        elif nt == "Merge Join":
            node["Merge Cond"] = _gen_join_cond(rng, "=", vocab)
        if nt != "Nested Loop" and rng.random() < 0.7:
            node["Parent Relationship"] = _pick(
                rng, vocab.parent_rel_types
            ).capitalize()
    elif nt == "Sort":
        node["Sort Key"] = _gen_sort_keys(rng, vocab)
        if rng.random() < 0.8:
            node["Sort Method"] = _pick(rng, SORT_METHODS)
    elif nt == "Hash":
        if rng.random() < 0.7:
            node["Hash Buckets"] = int(2 ** rng.integers(10, 22))
    elif nt == "Aggregate":
        node["Strategy"] = _pick(rng, vocab.agg_strategies).capitalize()
        node["Parallel Aware"] = "true" if rng.random() < 0.3 else "false"
    # InitPlan/SubPlan marker on ~15% of non-root nodes, exactly where PG
    # puts it (ref flags nodes carrying 'Subplan Name',
    # tpch_utils_knob.py:531-534)
    if not is_root and rng.random() < 0.15:
        k = int(rng.integers(1, 5))
        node["Subplan Name"] = (
            f"InitPlan {k} (returns $0)"
            if rng.random() < 0.5
            else f"SubPlan {k}"
        )
    n_kids = int(rng.integers(0, 3)) if depth_left > 1 else 0
    node["Plans"] = [
        _gen_node(rng, depth_left - 1, counter, vocab, is_root=False)
        for _ in range(n_kids)
    ]
    return node


def generate_plans(
    n_plans: int,
    seed: int,
    max_depth: int = MAX_DEPTH,
    vocab: PlanVocab = TPCH_VOCAB,
) -> list[dict]:
    rng = np.random.default_rng(seed)
    counter = [0]
    return [_gen_node(rng, max_depth, counter, vocab) for _ in range(n_plans)]


def generate_console_log(
    path: str,
    n_plans: int = 200,
    seed: int = 61,
    max_depth: int = MAX_DEPTH,
    vocab: PlanVocab = TPCH_VOCAB,
) -> None:
    """Deterministic synthetic psql-style log: JSON plan lines padded with
    trailing '+' marks, interleaved with console noise (A1 format)."""
    rng = np.random.default_rng(seed + 1)
    lines: list[str] = []
    for plan in generate_plans(n_plans, seed, max_depth, vocab):
        for _ in range(int(rng.integers(0, 3))):
            lines.append(str(NOISE[int(rng.integers(0, len(NOISE)))]))
        lines.append(json.dumps(plan) + "+" * int(rng.integers(1, 4)))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def generate_serverlog(
    path: str,
    n_plans: int = 200,
    seed: int = 61,
    max_depth: int = MAX_DEPTH,
    vocab: PlanVocab = TPCH_VOCAB,
) -> None:
    """A2 format: every payload line carries a ``<ts> CST [pid] LOG:``
    prefix (the reference keys its serverlog parse on `' CST ['`,
    snapshot/snapshot.py:10-30), interleaved with server noise."""
    rng = np.random.default_rng(seed + 2)
    lines: list[str] = []
    for i, plan in enumerate(generate_plans(n_plans, seed, max_depth, vocab)):
        pid = int(rng.integers(1000, 9999))
        ts = f"2024-01-01 00:{(i // 60) % 60:02d}:{i % 60:02d}"
        for _ in range(int(rng.integers(0, 3))):
            noise = SERVERLOG_NOISE[int(rng.integers(0, len(SERVERLOG_NOISE)))]
            lines.append(f"{ts} CST [{pid}] {noise}")
        lines.append(f"{ts} CST [{pid}] LOG:  plan: {json.dumps(plan)}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def generate_explain_json_log(
    path: str,
    n_plans: int = 200,
    seed: int = 61,
    max_depth: int = MAX_DEPTH,
    vocab: PlanVocab = TPCH_VOCAB,
) -> None:
    """Real ``EXPLAIN (ANALYZE, FORMAT JSON)`` shape: each line is the
    one-element array PostgreSQL emits, wrapping the root node under
    "Plan" alongside top-level keys ("Planning Time", "Execution Time",
    "Triggers") the featurizer must tolerate and ignore. Same plan
    stream as generate_console_log at the same (n, seed), so the two
    formats parse to IDENTICAL node rows."""
    rng = np.random.default_rng(seed + 3)
    lines: list[str] = []
    for plan in generate_plans(n_plans, seed, max_depth, vocab):
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


# Every plan node carries exactly one "Node Type" key, so a JVM-side
# regexp count over the raw JSON text is an exact per-plan node count —
# the truncation detector's ground truth (no parse involved).
_NODE_TYPE_PAT = '"Node Type"'


def _n_nodes_in_text(col):
    return F.regexp_count(col, F.lit(_NODE_TYPE_PAT))


# introspection for tests/PLANS.md: how many depth probes the last
# _resolve_depth call ran against the FULL corpus vs the driver-side
# sample (the round-4 verdict's "what's wrong #2": auto mode used to pay
# up to log2(cap) full passes; it now pays exactly one on the happy path)
_DEPTH_PROBE_STATS = {"full": 0, "sampled": 0}


def _resolve_depth(
    jsondf: DataFrame, json_col: str, build_plan, depth: int | None,
    cap: int = 64, sample_rows: int = 256,
) -> int:
    """Return a parse depth whose nested schema reaches EVERY node of
    every plan in ``jsondf``, or raise.

    ``from_json`` with a depth-d schema silently DROPS level-(d+1)+
    ``Plans`` subtrees — real TPC-H/JOB EXPLAIN output is routinely
    5-15 levels deep, so silent truncation is the first failure a
    real-log user hits (the reference recurses arbitrarily,
    tpch_utils_knob.py:480-535). Detection is exact and map-only: count
    '"Node Type"' occurrences in the RAW text vs in the canonical
    ``to_json`` re-serialization of the parse — equal iff no subtree was
    dropped.

    With ``depth=None`` (auto) the depth is PICKED on a driver-side
    sample (``limit(sample_rows)`` — the scan short-circuits, so the
    up-to-log2(cap) doubling probes touch ~256 lines, not the corpus)
    and then VERIFIED with exactly ONE full-corpus pass; only the rare
    corpus whose deepest plan lies outside the sample pays further full
    passes (the doubling loop then continues on the full data, keeping
    the hard no-truncation guarantee). With an explicit ``depth`` a
    mismatch raises instead of truncating. ``build_plan(d)`` returns
    the parsed root-node struct column at schema depth ``d``
    (format-specific: bare node vs EXPLAIN wrapper). Lines that fail to
    parse entirely (noise) count as NULL and are skipped — they are
    dropped by design, not truncated."""
    j = F.col(json_col)

    def miss_at(df, d: int):
        return (
            df.select(
                F.max(
                    _n_nodes_in_text(j)
                    - _n_nodes_in_text(F.to_json(build_plan(d)))
                ).alias("miss")
            )
            .first()["miss"]
        )

    _DEPTH_PROBE_STATS["full"] = 0
    _DEPTH_PROBE_STATS["sampled"] = 0
    d = depth or MAX_DEPTH
    if depth is None:
        sample = jsondf.select(j.alias(json_col)).limit(sample_rows)
        while d < cap:
            _DEPTH_PROBE_STATS["sampled"] += 1
            m = miss_at(sample, d)
            if m is None or m <= 0:
                break
            d = min(cap, d * 2)
    while True:
        _DEPTH_PROBE_STATS["full"] += 1
        miss = miss_at(jsondf, d)
        if miss is None or miss <= 0:
            return d
        if depth is not None:
            raise ValueError(
                f"plan tree deeper than parse depth {depth}: up to {miss} "
                "node(s) per plan would be silently dropped — pass "
                "depth=None to auto-detect the required schema depth"
            )
        if d >= cap:
            raise ValueError(
                f"plan tree exceeds the maximum parse depth {cap}"
            )
        d = min(cap, d * 2)


def read_plans_from_explain_json(
    spark: SparkSession, path: str, depth: int | None = None
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
    ``Plan`` directly; this reader is for log-embedded one-line plans.

    ``depth=None`` (default) auto-detects the schema depth needed to
    reach every node (``_resolve_depth``); an explicit ``depth`` raises
    on deeper trees instead of silently truncating them."""

    def wrapper(d: int) -> T.StructType:
        return T.StructType(
            [
                T.StructField("Plan", plan_schema(d)),
                T.StructField("Planning Time", T.DoubleType()),
                T.StructField("Execution Time", T.DoubleType()),
            ]
        )

    raw = spark.read.text(path)
    stripped = F.regexp_replace(
        F.regexp_replace(F.col("value"), r"^\s*\[\s*", ""), r"\s*\]\s*$", ""
    )
    cand = raw.filter(F.col("value").rlike(r"^\s*[\[{]")).withColumn(
        "json", stripped
    )

    def build_plan(d: int):
        return F.coalesce(
            F.from_json(F.col("json"), wrapper(d))["Plan"],
            F.from_json(F.col("json"), plan_schema(d)),
        )

    depth = _resolve_depth(cand, "json", build_plan, depth)
    parsed = (
        cand.withColumn("w", F.from_json(F.col("json"), wrapper(depth)))
        .withColumn("plan", build_plan(depth))
        .filter(F.col("plan").isNotNull() & F.col("plan.`Node Type`").isNotNull())
    )
    out = parsed.select(
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
    # carry the validated depth so downstream explodes skip their probe
    out._qcfe_depth = depth
    return out


def _plans_from_json_lines(cleaned: DataFrame, depth: int | None) -> DataFrame:
    depth = _resolve_depth(
        cleaned, "json", lambda d: F.from_json(F.col("json"), plan_schema(d)),
        depth,
    )
    parsed = cleaned.withColumn(
        "plan", F.from_json(F.col("json"), plan_schema(depth))
    ).filter(F.col("plan").isNotNull() & F.col("plan.`Node Type`").isNotNull())
    out = parsed.select(
        F.monotonically_increasing_id().alias("plan_id"),
        F.col("plan.`Node Type`").alias("node_type"),
        F.col("plan.`Plan Rows`").alias("plan_rows"),
        F.col("plan.`Actual Rows`").alias("actual_rows"),
        F.col("plan.`Actual Total Time`").alias("actual_total_time"),
        F.size(F.coalesce(F.col("plan.Plans"), F.array())).alias("n_children"),
        F.col("json").alias("plans_json"),
    )
    # carry the validated depth so downstream explodes (per_node_rows /
    # per_node_samples) skip their own probe — one scan per corpus, not
    # one per consumer
    out._qcfe_depth = depth
    return out


def read_plans_from_log(
    spark: SparkSession, path: str, depth: int | None = None
) -> DataFrame:
    """Salvage A1 console format: one row per plan with root fields +
    the raw JSON for deeper descent. ``depth=None`` auto-detects the
    required schema depth; an explicit ``depth`` raises on deeper trees
    instead of silently truncating."""
    raw = spark.read.text(path)
    cleaned = (
        raw.filter(F.col("value").rlike(r"^\s*\{"))
        .withColumn("json", F.regexp_replace(F.col("value"), r"\++\s*$", ""))
    )
    return _plans_from_json_lines(cleaned, depth)


def read_plans_from_serverlog(
    spark: SparkSession, path: str, depth: int | None = None
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
    ("Subplan Name", "subplan_name"),
]


def per_node_rows(plans: DataFrame, depth: int | None = None) -> DataFrame:
    """Explode EVERY tree level into per-node rows carrying the FULL
    field surface (NODE_FIELDS) plus ``parent_node_id`` (NULL at the
    root) and the ``is_subplan`` flag (the reference marks nodes
    carrying 'Subplan Name', tpch_utils_knob.py:531-534) — the input to
    the A4 featurizers (functions/plan_features.py) and the subplan
    time rollup. Same level-by-level JVM explode as per_node_samples;
    no UDF. ``depth=None`` auto-detects the schema depth needed to
    reach every node of ``plans_json`` (``_resolve_depth``) — unless
    ``plans`` came straight from a reader, which carries its validated
    depth (``_qcfe_depth``) so the probe scan runs once per corpus, not
    once per consumer. An explicit ``depth`` raises on deeper trees
    instead of silently truncating."""
    carried = getattr(plans, "_qcfe_depth", None)
    if depth is None and carried is not None:
        depth = carried  # validated at read time; skip the probe scan
    else:
        depth = _resolve_depth(
            plans, "plans_json",
            lambda d: F.from_json(F.col("plans_json"), plan_schema(d)),
            depth,
        )
    tree = plans.select(
        "plan_id", F.from_json("plans_json", plan_schema(depth)).alias("node")
    ).withColumn("parent_node_id", F.lit(None).cast("long"))
    proj = [
        F.col(f"node.`{jf}`").alias(out) for jf, out in NODE_FIELDS
    ] + [
        F.col("node.`Subplan Name`").isNotNull().alias("is_subplan"),
    ]
    frames = []
    cur = tree
    for lvl in range(depth):
        frames.append(
            cur.select(
                "plan_id",
                F.lit(lvl).alias("level"),
                "parent_node_id",
                *proj,
            )
        )
        if lvl < depth - 1:
            cur = cur.select(
                "plan_id",
                F.col("node.`Node Id`").alias("parent_node_id"),
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

    def walk(node: dict, level: int, parent_id) -> None:
        rows.append(
            {out: node.get(jf) for jf, out in NODE_FIELDS}
            | {
                "level": level,
                "parent_node_id": parent_id,
                "is_subplan": node.get("Subplan Name") is not None,
            }
        )
        for child in node.get("Plans") or []:
            walk(child, level + 1, node.get("Node Id"))

    for p in plans:
        walk(p, 0, None)
    return rows


# The plan_featurize_nodes corpus: ONE deterministic (seed, size) shared
# by the Spark query (log-text side) and the DuckDB oracle (raw-node
# parquet side).
PLAN_FIXTURE_SEED = 64
PLAN_FIXTURE_N = 200
# the depth-10 corpus (plan_featurize_deep): trees the default depth-4
# schema provably truncates, parsed via auto depth detection
PLAN_DEEP_SEED = 93
PLAN_DEEP_N = 60
PLAN_DEEP_DEPTH = 10
# the JOB-vocabulary corpus (plan_featurize_job_vocab)
PLAN_JOB_SEED = 88
PLAN_JOB_N = 120


def ensure_plan_nodes_fixture(
    n_plans: int = PLAN_FIXTURE_N,
    seed: int = PLAN_FIXTURE_SEED,
    max_depth: int = MAX_DEPTH,
    vocab: PlanVocab = TPCH_VOCAB,
) -> str:
    """Write (once) and return the raw per-node parquet the DuckDB oracle
    reads. The filename embeds a digest of the generated rows, so a
    generator change can never pair a stale fixture with fresh Spark
    output; generation is pure Python + pyarrow (callable from the oracle
    module, no Spark needed) and atomic (write-aside + rename)."""
    import hashlib
    import os
    import tempfile

    rows = flatten_plan_nodes(generate_plans(n_plans, seed, max_depth, vocab))
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
            ("subplan_name", pa.string()),
            ("level", pa.int32()),
            ("parent_node_id", pa.int64()),
            ("is_subplan", pa.bool_()),
        ]
    )
    cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
    pq.write_table(pa.table(cols, schema=schema), path)


def per_node_samples(plans: DataFrame, depth: int | None = None) -> DataFrame:
    """Explode EVERY tree level into per-node (node_type, actual_rows,
    time) rows — the reference's recursive snapshot sample collection
    (A5, snapshot/snapshot.py:38-58) including its zero-row filter.

    Level-by-level: unions one frame per depth level, each a projection +
    explode of the parsed struct. Depth is a small constant, so this is
    ``depth`` narrow passes — no UDF, full codegen. ``depth=None``
    auto-detects (``_resolve_depth``), reusing the reader's validated
    ``_qcfe_depth`` when present.
    """
    carried = getattr(plans, "_qcfe_depth", None)
    if depth is None and carried is not None:
        depth = carried  # validated at read time; skip the probe scan
    else:
        depth = _resolve_depth(
            plans, "plans_json",
            lambda d: F.from_json(F.col("plans_json"), plan_schema(d)),
            depth,
        )
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
