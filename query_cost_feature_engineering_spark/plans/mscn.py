"""MSCN-style plan serialization — the reference's A14, Spark-first.

Graft of ``tpch_utils_serialize_knob.py:566-657``: each plan tree becomes
ONE flat fixed-width vector by walking the tree bottom-up —

* per node: op one-hot (:586-589) ⧺ subtree-identity one-hot ⧺ numerics.
  The reference's join-table one-hot comes from Hash/Merge Cond substring
  matching (:592-597); the engine's synthetic plans carry ``Relation
  Name`` on scan leaves, so the identity one-hot is the relation vocab.
* OR-combine up the tree (:599-603,644): a parent's identity one-hot is
  the OR of its own and all descendants' bits.
* child-before-parent concat (:640-646): node vectors are emitted in
  POSTORDER, children before their parent.
* zero-pad ``align`` (:382-385): the sequence is padded to
  ``max_nodes`` node slots so every plan serializes to the same width.

The tree walk is genuinely recursive over variable-shape JSON, so this is
the sanctioned Arrow-batched escape hatch (``mapInPandas``): one Python
pass per plan ROW (not per node), vectors assembled in NumPy. Everything
before/after (scan, salvage filter, downstream consumers) stays JVM-side.
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from query_cost_feature_engineering_spark.sources.logs import (
    NODE_TYPES,
    REL_NAMES,
)

MAX_NODES = 32


def node_feat_len(
    node_types: list[str] = NODE_TYPES, rels: list[str] = REL_NAMES
) -> int:
    return len(node_types) + len(rels) + 2  # one-hots + [plan_rows, time]


def serialize_plan_dict(
    plan: dict,
    node_types: list[str] = NODE_TYPES,
    rels: list[str] = REL_NAMES,
    max_nodes: int = MAX_NODES,
) -> tuple[np.ndarray, int]:
    """Pure-Python single-plan serializer (also the golden oracle).

    Returns (vector, n_nodes); vector length = max_nodes * node_feat_len.
    Postorder emission; parent identity bits OR child bits.
    """
    flen = node_feat_len(node_types, rels)
    rows: list[np.ndarray] = []

    def walk(node: dict) -> np.ndarray:
        """Returns the subtree's OR-combined identity one-hot."""
        ident = np.zeros(len(rels), dtype=np.float64)
        rel = node.get("Relation Name")
        if rel in rels:
            ident[rels.index(rel)] = 1.0
        for child in node.get("Plans") or []:
            ident = np.maximum(ident, walk(child))
        vec = np.zeros(flen, dtype=np.float64)
        nt = node.get("Node Type")
        if nt in node_types:
            vec[node_types.index(nt)] = 1.0
        vec[len(node_types):len(node_types) + len(rels)] = ident
        vec[-2] = float(node.get("Plan Rows") or 0)
        vec[-1] = float(node.get("Actual Total Time") or 0.0)
        rows.append(vec)  # postorder: children already appended
        return ident

    walk(plan)
    n_nodes = len(rows)
    out = np.zeros(max_nodes * flen, dtype=np.float64)
    flat = np.concatenate(rows)[: max_nodes * flen]  # align / truncate-guard
    out[: len(flat)] = flat
    return out, n_nodes


def serialize_plans_mscn(
    plans: DataFrame,
    json_col: str = "plans_json",
    id_col: str = "plan_id",
    max_nodes: int = MAX_NODES,
) -> DataFrame:
    """Distributed A14: (plan_id, n_nodes, feat_len, vec) per plan."""
    flen = node_feat_len()
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_nodes", T.IntegerType()),
            T.StructField("feat_len", T.IntegerType()),
            T.StructField("vec", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: [], "n_nodes": [], "feat_len": [], "vec": []}
            for pid, js in zip(pdf[id_col], pdf[json_col]):
                vec, n = serialize_plan_dict(
                    json.loads(js), max_nodes=max_nodes
                )
                out[id_col].append(pid)
                out["n_nodes"].append(n)
                out["feat_len"].append(flen)
                out["vec"].append(vec)
            yield pd.DataFrame(out)

    return plans.select(id_col, json_col).mapInPandas(run, schema)
