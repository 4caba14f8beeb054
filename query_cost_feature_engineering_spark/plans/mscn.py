"""MSCN-style plan serialization — the reference's A14, Spark-first.

Graft of ``tpch_utils_serialize_knob.py:566-657``: each plan tree becomes
ONE flat fixed-width vector by walking the tree bottom-up —

* per node: op one-hot (:586-589) ⧺ join-condition one-hot ⧺
  subtree-identity one-hot ⧺ per-type numerics. The join one-hot comes
  from ``Hash Cond`` / ``Merge Cond`` substring matching against the
  relation vocabulary (:592-597, ``get_join_one_hot``) — including the
  reference's substring false-positives (``part`` matches inside
  ``l_partkey``), which are part of the contract. Non-join nodes carry
  zeros (:612-613).
* the per-type numerics are the FULL A4 featurizer vector
  (``functions/plan_features.featurize_node_dict``), zero-padded to the
  unified width — mirroring how the reference embeds
  ``input_func[node_type](node)`` per node (:617-621).
* OR-combine up the tree (:599-603,644): a parent's identity one-hot is
  the OR of its own and all descendants' bits; the join one-hot combines
  the same way (``join_combine``).
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

from query_cost_feature_engineering_spark.functions.plan_features import (
    featurize_node_dict_padded,
    unified_feat_len,
)
from query_cost_feature_engineering_spark.sources.logs import (
    NODE_TYPES,
    REL_NAMES,
    TPCH_VOCAB,
    PlanVocab,
)

MAX_NODES = 32


def node_feat_len(
    node_types: list[str] | None = None,
    rels: list[str] | None = None,
    vocab: PlanVocab = TPCH_VOCAB,
) -> int:
    # op one-hot ⧺ join one-hot ⧺ identity one-hot ⧺ unified A4 numerics
    node_types = node_types if node_types is not None else list(vocab.node_types)
    rels = rels if rels is not None else list(vocab.rel_names)
    return len(node_types) + 2 * len(rels) + unified_feat_len(vocab)


def join_one_hot(node: dict, rels: list[str] = REL_NAMES) -> np.ndarray:
    """Ref ``get_join_one_hot`` (:592-597): relation-name substring match
    over the join condition string; zeros for non-join nodes."""
    arr = np.zeros(len(rels), dtype=np.float64)
    nt = node.get("Node Type")
    cond = None
    if nt == "Hash Join":
        cond = node.get("Hash Cond")
    elif nt == "Merge Join":
        cond = node.get("Merge Cond")
    if cond:
        for idx, rel in enumerate(rels):
            if rel in cond:
                arr[idx] = 1.0
    return arr


def serialize_plan_dict(
    plan: dict,
    node_types: list[str] | None = None,
    rels: list[str] | None = None,
    max_nodes: int = MAX_NODES,
    vocab: PlanVocab = TPCH_VOCAB,
) -> tuple[np.ndarray, int]:
    """Pure-Python single-plan serializer (also the golden oracle).

    Returns (vector, n_nodes); vector length = max_nodes * node_feat_len.
    Postorder emission; parent identity AND join bits OR child bits.
    """
    node_types = node_types if node_types is not None else list(vocab.node_types)
    rels = rels if rels is not None else list(vocab.rel_names)
    flen = node_feat_len(node_types, rels, vocab)
    n_ops = len(node_types)
    n_rel = len(rels)
    rows: list[np.ndarray] = []

    def walk(node: dict) -> tuple[np.ndarray, np.ndarray]:
        """Returns the subtree's OR-combined (identity, join) one-hots."""
        ident = np.zeros(n_rel, dtype=np.float64)
        rel = node.get("Relation Name")
        if rel in rels:
            ident[rels.index(rel)] = 1.0
        joins = join_one_hot(node, rels)
        for child in node.get("Plans") or []:
            ci, cj = walk(child)
            ident = np.maximum(ident, ci)
            joins = np.maximum(joins, cj)  # ref join_combine (:599-603)
        vec = np.zeros(flen, dtype=np.float64)
        nt = node.get("Node Type")
        if nt in node_types:
            vec[node_types.index(nt)] = 1.0
        vec[n_ops:n_ops + n_rel] = joins
        vec[n_ops + n_rel:n_ops + 2 * n_rel] = ident
        vec[n_ops + 2 * n_rel:] = featurize_node_dict_padded(node, vocab)
        rows.append(vec)  # postorder: children already appended
        return ident, joins

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
    vocab: PlanVocab = TPCH_VOCAB,
) -> DataFrame:
    """Distributed A14: (plan_id, n_nodes, feat_len, vec) per plan."""
    flen = node_feat_len(vocab=vocab)
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
                    json.loads(js), max_nodes=max_nodes, vocab=vocab
                )
                out[id_col].append(pid)
                out["n_nodes"].append(n)
                out["feat_len"].append(flen)
                out["vec"].append(vec)
            yield pd.DataFrame(out)

    return plans.select(id_col, json_col).mapInPandas(run, schema)
