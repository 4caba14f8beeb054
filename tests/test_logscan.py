"""Log-salvage sources (A1/A2) + MSCN serialization (A14) vs pure-python
goldens, over recursive (depth-4) synthetic plan trees."""

from __future__ import annotations

import json

import numpy as np

from query_cost_feature_engineering_spark.plans.mscn import (
    serialize_plan_dict,
    serialize_plans_mscn,
)
from query_cost_feature_engineering_spark.sources.logs import (
    generate_console_log,
    generate_serverlog,
    per_node_samples,
    read_plans_from_log,
    read_plans_from_serverlog,
)


def _golden_console(path):
    plans = []
    for line in open(path):
        line = line.strip()
        if not line.startswith("{"):
            continue
        plans.append(json.loads(line.rstrip("+")))
    return plans


def _golden_serverlog(path):
    plans = []
    for line in open(path):
        if " CST [" not in line or "LOG:  plan:" not in line:
            continue
        plans.append(json.loads(line.split("LOG:  plan:", 1)[1].strip()))
    return plans


def _walk(node):
    yield node
    for k in node.get("Plans") or []:
        yield from _walk(k)


def _check_samples(spark, plans_df, golden):
    samples = per_node_samples(plans_df).toPandas()
    want = sorted(
        (n["Node Type"], n["Actual Rows"])
        for p in golden
        for n in _walk(p)
        if n["Actual Rows"] > 0
    )
    got = sorted(zip(samples["node_type"], samples["actual_rows"]))
    assert got == want


def test_console_logscan_matches_golden(spark, tmp_path):
    path = str(tmp_path / "console.log")
    generate_console_log(path, n_plans=150, seed=61)
    golden = _golden_console(path)
    assert any(
        k.get("Plans") for p in golden for k in p.get("Plans") or []
    ), "fixture must contain depth>=3 trees"

    parsed = read_plans_from_log(spark, path).toPandas()
    assert len(parsed) == len(golden)
    got = sorted(
        zip(parsed["node_type"], parsed["actual_rows"], parsed["n_children"])
    )
    want = sorted(
        (p["Node Type"], p["Actual Rows"], len(p["Plans"])) for p in golden
    )
    assert got == want
    # A5 collection now walks EVERY level of the tree (ref recursion)
    _check_samples(spark, read_plans_from_log(spark, path), golden)


def test_serverlog_matches_golden(spark, tmp_path):
    path = str(tmp_path / "server.log")
    generate_serverlog(path, n_plans=120, seed=62)
    golden = _golden_serverlog(path)
    assert len(golden) == 120

    parsed = read_plans_from_serverlog(spark, path).toPandas()
    assert len(parsed) == len(golden)
    got = sorted(zip(parsed["node_type"], parsed["actual_rows"]))
    want = sorted((p["Node Type"], p["Actual Rows"]) for p in golden)
    assert got == want
    _check_samples(spark, read_plans_from_serverlog(spark, path), golden)


def test_mscn_serialization_matches_golden(spark, tmp_path):
    path = str(tmp_path / "console.log")
    generate_console_log(path, n_plans=80, seed=63)
    golden = _golden_console(path)

    out = serialize_plans_mscn(read_plans_from_log(spark, path)).toPandas()
    assert len(out) == len(golden)
    want = {}
    for p in golden:
        vec, n = serialize_plan_dict(p)
        want[tuple(np.round(vec, 9))] = n
    for row in out.itertuples():
        key = tuple(np.round(np.array(row.vec), 9))
        assert key in want, "spark vector not produced by golden serializer"
        assert row.n_nodes == want[key]


def test_mscn_postorder_and_or_combine():
    """Hand-built depth-3 tree pins the A14 contract: children before
    parent, parent identity AND join one-hots = OR of subtree, per-node
    A4 numerics embedded, zero-pad tail."""
    plan = {
        "Node Type": "Hash Join",
        "Join Type": "Inner",
        "Hash Cond": "(orders.o_custkey = customer.c_custkey)",
        "Plan Rows": 10,
        "Actual Total Time": 5.0,
        "Plans": [
            {
                "Node Type": "Merge Join",
                "Join Type": "Left",
                "Merge Cond": "(lineitem.l_partkey = part.p_partkey)",
                "Plan Rows": 7,
                "Actual Total Time": 2.0,
                "Plans": [
                    {
                        "Node Type": "Seq Scan",
                        "Relation Name": "lineitem",
                        "Plan Rows": 3,
                        "Actual Total Time": 0.5,
                        "Plans": [],
                    },
                    {
                        "Node Type": "Seq Scan",
                        "Relation Name": "part",
                        "Plan Rows": 4,
                        "Actual Total Time": 0.6,
                        "Plans": [],
                    },
                ],
            },
            {
                "Node Type": "Hash",
                "Plan Rows": 3,
                "Actual Total Time": 1.0,
                "Plans": [
                    {
                        "Node Type": "Seq Scan",
                        "Relation Name": "orders",
                        "Plan Rows": 3,
                        "Actual Total Time": 0.5,
                        "Plans": [],
                    }
                ],
            },
        ],
    }
    from query_cost_feature_engineering_spark.functions.plan_features import (
        featurize_node_dict_padded,
    )
    from query_cost_feature_engineering_spark.plans.mscn import (
        MAX_NODES,
        node_feat_len,
    )
    from query_cost_feature_engineering_spark.sources.logs import (
        NODE_TYPES,
        REL_NAMES,
    )

    vec, n = serialize_plan_dict(plan)
    flen = node_feat_len()
    assert n == 6 and len(vec) == MAX_NODES * flen
    nodes = vec.reshape(MAX_NODES, flen)
    n_ops, n_rel = len(NODE_TYPES), len(REL_NAMES)
    i_ord = REL_NAMES.index("orders")
    i_li = REL_NAMES.index("lineitem")
    i_part = REL_NAMES.index("part")
    i_cust = REL_NAMES.index("customer")

    def op(row):
        return NODE_TYPES[int(np.argmax(row[:n_ops]))]

    def joins(row):
        return set(np.nonzero(row[n_ops:n_ops + n_rel])[0])

    def rels(row):
        return set(np.nonzero(row[n_ops + n_rel:n_ops + 2 * n_rel])[0])

    # postorder: li scan, part scan, merge join, orders scan, hash, root
    assert [op(nodes[i]) for i in range(6)] == [
        "Seq Scan", "Seq Scan", "Merge Join", "Seq Scan", "Hash",
        "Hash Join",
    ]
    assert rels(nodes[0]) == {i_li} and rels(nodes[1]) == {i_part}
    assert rels(nodes[2]) == {i_li, i_part}  # OR-combined from children
    assert rels(nodes[4]) == {i_ord}
    assert rels(nodes[5]) == {i_ord, i_li, i_part}  # whole subtree
    # join one-hots: scans zero; merge join matches its cond substrings;
    # the root ORs its own cond bits with the subtree's (ref join_combine)
    assert joins(nodes[0]) == set() and joins(nodes[4]) == set()
    assert joins(nodes[2]) == {i_li, i_part}
    assert joins(nodes[5]) == {i_ord, i_cust, i_li, i_part}
    # per-node numerics are the padded A4 vector
    root_num = nodes[5][n_ops + 2 * n_rel:]
    assert np.array_equal(root_num, featurize_node_dict_padded(plan))
    assert root_num[1] == 10.0  # Plan Rows inside basics
    assert not nodes[6:].any()  # zero-pad align


def test_mscn_serializer_under_job_vocab():
    """A14 under the JOB vocabulary: the serializer's widths, op one-hot
    indices and identity bits all derive from the PlanVocab argument —
    the same no-source-edit contract as the featurizers."""
    import numpy as np

    from query_cost_feature_engineering_spark.functions.plan_features import (
        unified_feat_len,
    )
    from query_cost_feature_engineering_spark.plans.mscn import (
        node_feat_len,
        serialize_plan_dict,
    )
    from query_cost_feature_engineering_spark.sources.logs import JOB_VOCAB

    plan = {
        "Node Type": "Result",
        "Node Id": 1,
        "Plans": [
            {
                "Node Type": "Seq Scan",
                "Node Id": 2,
                "Relation Name": "title",
                "Filter": "(production_year > 2000)",
                "Plan Width": 8,
                "Plan Rows": 10,
                "Total Cost": 1.5,
            }
        ],
    }
    vec, n = serialize_plan_dict(plan, vocab=JOB_VOCAB)
    flen = node_feat_len(vocab=JOB_VOCAB)
    assert n == 2 and len(vec) == 32 * flen
    n_ops = len(JOB_VOCAB.node_types)
    n_rel = len(JOB_VOCAB.rel_names)
    child, parent = vec[:flen], vec[flen : 2 * flen]
    # postorder: child (Seq Scan) first; parent is the JOB-only 'Result'
    assert child[JOB_VOCAB.node_types.index("Seq Scan")] == 1.0
    assert parent[JOB_VOCAB.node_types.index("Result")] == 1.0
    # identity one-hot OR-combines up: 'title' bit set on BOTH rows
    ti = JOB_VOCAB.rel_names.index("title")
    assert child[n_ops + n_rel + ti] == 1.0
    assert parent[n_ops + n_rel + ti] == 1.0
    # numerics tail is the unified JOB-vocab A4 width
    assert flen == n_ops + 2 * n_rel + unified_feat_len(JOB_VOCAB)
    # the masked attr stat for the matched predicate attr is non-zero
    assert np.abs(child[n_ops + 2 * n_rel :]).sum() > 0
