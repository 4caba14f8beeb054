"""A4 per-node plan featurizers — graft of ``tpch_utils_knob.py:60-210``.

The reference vectorizes each plan node with an op-specific featurizer
(``TPCH_GET_INPUT``): predicate substrings select masked per-attribute
(min, med, max) statistics, sort keys become ``rel.attr`` token one-hots,
joins carry join-type + parent-relationship one-hots, aggregates carry
strategy + parallel-aware bits, hashes their bucket count, index scans an
index one-hot + scan direction — all prepended with the ``get_basics``
numerics ``[Plan Width, Plan Rows, Total Cost]`` (:60-61).

Two mirrored implementations:

* :func:`featurize_nodes` — declarative JVM column expressions over the
  exploded per-node rows (``sources/logs.per_node_rows``). One-hot
  ``when`` chains, ``contains`` predicate matching, array ``transform`` /
  ``filter`` for sort-key tokenization: everything whole-stage codegen,
  no Python in the hot path.
* :func:`featurize_node_dict` — pure Python over a raw plan-node dict;
  the golden oracle in tests and the per-node numeric vector inside the
  MSCN serializer (``plans/mscn.py``), mirroring how the reference's
  serializer reuses the same ``input_func`` per node
  (``tpch_utils_serialize_knob.py:617-621``).

Vector layout per node type (ref's per-type composition, same order):

====================  =====================================================
Seq Scan              basics ⧺ rel(6) ⧺ attr_stats(24, Filter→Recheck Cond)
Bitmap Heap Scan      same as Seq Scan (ref routes it to get_scan_input)
Index [Only] Scan     basics ⧺ rel(6) ⧺ attr_stats(24, from Index Cond)
                      ⧺ index(6) ⧺ [forward]
Bitmap Index Scan     basics ⧺ index(6)
Hash/Merge Join       basics ⧺ join_type(6) ⧺ parent_rel(3)
Nested Loop           basics ⧺ join_type(6)
Sort                  basics ⧺ sort_key(48 = rel×attr) ⧺ sort_method(2)
Hash                  basics ⧺ [hash_buckets | 1]
Aggregate             basics ⧺ strategy(3) ⧺ [parallel_aware]
ModifyTable           basics ⧺ rel(6)
other                 basics
====================  =====================================================

attr_stats(24) is ``min_vec(8) ⧺ med_vec(8) ⧺ max_vec(8)``: slot *i* of
relation *r* carries the closed-form statistic from
``sources.logs.attr_stats`` iff the attribute name occurs as a substring
of the predicate text, else 0 (ref :76-86 with ``attr_val_dict``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from query_cost_feature_engineering_spark.sources.logs import (
    AGG_STRATEGIES,
    INDEX_NAMES,
    JOIN_TYPES,
    MAX_ATTR,
    PARENT_REL_TYPES,
    REL_ATTRS,
    REL_NAMES,
    SORT_ALGOS,
    attr_stats,
)

BASICS_LEN = 3
ATTR_STATS_LEN = 3 * MAX_ATTR
SORT_KEY_LEN = len(REL_NAMES) * MAX_ATTR

#: per-node-type vector length (ref tpch_dim_dict minus the knob/factor
#: terms, which are training-loop state, not plan features)
TYPE_FEAT_LEN = {
    "Seq Scan": BASICS_LEN + len(REL_NAMES) + ATTR_STATS_LEN,
    # ref get_scan_input also serves Bitmap Heap Scan (Filter -> Recheck
    # Cond fallback); get_index_scan_input also serves Index Only Scan
    "Bitmap Heap Scan": BASICS_LEN + len(REL_NAMES) + ATTR_STATS_LEN,
    "Index Scan": BASICS_LEN + len(REL_NAMES) + ATTR_STATS_LEN
    + len(INDEX_NAMES) + 1,
    "Index Only Scan": BASICS_LEN + len(REL_NAMES) + ATTR_STATS_LEN
    + len(INDEX_NAMES) + 1,
    "Bitmap Index Scan": BASICS_LEN + len(INDEX_NAMES),
    "Hash Join": BASICS_LEN + len(JOIN_TYPES) + len(PARENT_REL_TYPES),
    "Merge Join": BASICS_LEN + len(JOIN_TYPES) + len(PARENT_REL_TYPES),
    "Nested Loop": BASICS_LEN + len(JOIN_TYPES),
    "Sort": BASICS_LEN + SORT_KEY_LEN + len(SORT_ALGOS),
    "Hash": BASICS_LEN + 1,
    "Aggregate": BASICS_LEN + len(AGG_STRATEGIES) + 1,
    "ModifyTable": BASICS_LEN + len(REL_NAMES),
}

#: widest per-type vector — the MSCN serializer zero-pads every node's
#: numerics to this (ref pads per-type batches; one unified width keeps
#: the flat plan vector rectangular)
UNIFIED_FEAT_LEN = max(TYPE_FEAT_LEN.values())


# --------------------------------------------------------------------------
# JVM featurizer
# --------------------------------------------------------------------------

def _one_hot(col: Column, vocab: list[str], lower: bool = False) -> Column:
    c = F.lower(col) if lower else col
    return F.array(
        *[F.when(c == v, F.lit(1.0)).otherwise(F.lit(0.0)) for v in vocab]
    )


def _basics() -> Column:
    return F.array(
        F.coalesce(F.col("plan_width").cast("double"), F.lit(0.0)),
        F.coalesce(F.col("plan_rows").cast("double"), F.lit(0.0)),
        F.coalesce(F.col("total_cost"), F.lit(0.0)),
    )


def _attr_stats_vec(cond: Column) -> Column:
    """min(8) ⧺ med(8) ⧺ max(8) masked by predicate-substring matches,
    dispatched on relation_name (ref get_rel_attr_one_hot)."""
    zeros = F.array(*[F.lit(0.0)] * ATTR_STATS_LEN)
    chain = None
    for ri, rel in enumerate(REL_NAMES):
        attrs = REL_ATTRS[rel]
        cells = []
        for stat_idx in range(3):  # min, med, max — ref's concat order
            for i in range(MAX_ATTR):
                if i < len(attrs):
                    cells.append(
                        F.when(
                            cond.contains(attrs[i]),
                            F.lit(attr_stats(ri, i)[stat_idx]),
                        ).otherwise(F.lit(0.0))
                    )
                else:
                    cells.append(F.lit(0.0))
        arr = F.array(*cells)
        branch = F.col("relation_name") == rel
        chain = (
            F.when(branch, arr) if chain is None else chain.when(branch, arr)
        )
    return chain.otherwise(zeros)


def _sort_key_vec() -> Column:
    """rel×attr one-hot from `Sort Key` tokens: strip parens, split on
    spaces, keep dotted tokens, match ``rel.attr`` (ref :156-168)."""
    toks = F.flatten(
        F.transform(
            F.coalesce(F.col("sort_key"), F.array().cast("array<string>")),
            lambda k: F.filter(
                F.split(F.regexp_replace(k, r"[()]", " "), " "),
                lambda t: t.contains("."),
            ),
        )
    )
    bits = []
    for rel in REL_NAMES:
        attrs = REL_ATTRS[rel]
        for i in range(MAX_ATTR):
            if i < len(attrs):
                bits.append(
                    F.when(
                        F.array_contains(toks, f"{rel}.{attrs[i]}"),
                        F.lit(1.0),
                    ).otherwise(F.lit(0.0))
                )
            else:
                bits.append(F.lit(0.0))
    return F.array(*bits)


def featurize_nodes(
    nodes: DataFrame, feat_col: str = "feat"
) -> DataFrame:
    """Append the per-type feature vector (array<double>) to exploded
    per-node rows (``sources/logs.per_node_rows`` schema)."""
    basics = _basics()
    rel_vec = _one_hot(F.col("relation_name"), REL_NAMES)
    jt_vec = _one_hot(F.col("join_type"), JOIN_TYPES, lower=True)
    parent_vec = _one_hot(
        F.col("parent_relationship"), PARENT_REL_TYPES, lower=True
    )
    strat_vec = _one_hot(F.col("strategy"), AGG_STRATEGIES, lower=True)
    index_vec = _one_hot(F.col("index_name"), INDEX_NAMES)
    sortmeth_vec = _one_hot(F.col("sort_method"), SORT_ALGOS, lower=True)
    forward = F.when(
        F.col("scan_direction") == "Forward", F.lit(1.0)
    ).otherwise(F.lit(0.0))
    parallel = F.when(
        F.col("parallel_aware").isNull()
        | (F.col("parallel_aware") == "false"),
        F.lit(0.0),
    ).otherwise(F.lit(1.0))
    buckets = F.coalesce(
        F.col("hash_buckets").cast("double"), F.lit(1.0)
    )
    nt = F.col("node_type")
    # ref get_scan_input: Filter first, Recheck Cond when Filter is absent
    scan_cond = F.coalesce(F.col("filter_cond"), F.col("recheck_cond"))
    feat = (
        F.when(
            (nt == "Seq Scan") | (nt == "Bitmap Heap Scan"),
            F.concat(basics, rel_vec, _attr_stats_vec(scan_cond)),
        )
        .when(
            (nt == "Index Scan") | (nt == "Index Only Scan"),
            F.concat(
                basics,
                rel_vec,
                _attr_stats_vec(F.col("index_cond")),
                index_vec,
                F.array(forward),
            ),
        )
        .when(nt == "Bitmap Index Scan", F.concat(basics, index_vec))
        .when(nt == "ModifyTable", F.concat(basics, rel_vec))
        .when(
            (nt == "Hash Join") | (nt == "Merge Join"),
            F.concat(basics, jt_vec, parent_vec),
        )
        .when(nt == "Nested Loop", F.concat(basics, jt_vec))
        .when(nt == "Sort", F.concat(basics, _sort_key_vec(), sortmeth_vec))
        .when(nt == "Hash", F.concat(basics, F.array(buckets)))
        .when(
            nt == "Aggregate",
            F.concat(basics, strat_vec, F.array(parallel)),
        )
        .otherwise(basics)
    )
    return nodes.withColumn(feat_col, feat)


def feat_digest(feat_col: str = "feat") -> Column:
    """md5 of the %.4f-joined vector — the cross-engine value check (all
    feature values are exact at ≤3 decimals, so %.4f can't tie-break
    differently across engines)."""
    return F.md5(
        F.concat_ws(
            ",",
            F.transform(
                F.col(feat_col), lambda x: F.format_string("%.4f", x)
            ),
        ).cast("binary")
    )


# --------------------------------------------------------------------------
# pure-Python mirror (golden oracle + MSCN per-node numerics)
# --------------------------------------------------------------------------

def _py_one_hot(val, vocab, lower=False):
    arr = np.zeros(len(vocab))
    if val is not None:
        v = val.lower() if lower else val
        if v in vocab:
            arr[vocab.index(v)] = 1.0
    return arr


def _py_attr_stats(rel, cond):
    out = np.zeros(ATTR_STATS_LEN)
    if rel in REL_ATTRS and cond:
        ri = REL_NAMES.index(rel)
        attrs = REL_ATTRS[rel]
        for stat_idx in range(3):
            for i, attr in enumerate(attrs):
                if attr in cond:
                    out[stat_idx * MAX_ATTR + i] = attr_stats(ri, i)[stat_idx]
    return out


def _py_sort_key(keys):
    out = np.zeros(SORT_KEY_LEN)
    for key in keys or []:
        key = key.replace("(", " ").replace(")", " ")
        for tok in key.split(" "):
            if "." not in tok:
                continue
            rel, attr = tok.split(".", 1)
            if rel in REL_ATTRS and attr in REL_ATTRS[rel]:
                out[
                    REL_NAMES.index(rel) * MAX_ATTR
                    + REL_ATTRS[rel].index(attr)
                ] = 1.0
    return out


def featurize_node_dict(node: dict) -> np.ndarray:
    """Python mirror of :func:`featurize_nodes` over a raw JSON node."""
    nt = node.get("Node Type")
    basics = np.array(
        [
            float(node.get("Plan Width") or 0),
            float(node.get("Plan Rows") or 0),
            float(node.get("Total Cost") or 0.0),
        ]
    )
    rel = node.get("Relation Name")
    if nt in ("Seq Scan", "Bitmap Heap Scan"):
        cond = node.get("Filter")
        if cond is None:  # ref get_scan_input's Recheck Cond fallback
            cond = node.get("Recheck Cond")
        return np.concatenate(
            [
                basics,
                _py_one_hot(rel, REL_NAMES),
                _py_attr_stats(rel, cond),
            ]
        )
    if nt == "Bitmap Index Scan":
        return np.concatenate(
            [basics, _py_one_hot(node.get("Index Name"), INDEX_NAMES)]
        )
    if nt == "ModifyTable":
        return np.concatenate([basics, _py_one_hot(rel, REL_NAMES)])
    if nt in ("Index Scan", "Index Only Scan"):
        fwd = 1.0 if node.get("Scan Direction") == "Forward" else 0.0
        return np.concatenate(
            [
                basics,
                _py_one_hot(rel, REL_NAMES),
                _py_attr_stats(rel, node.get("Index Cond")),
                _py_one_hot(node.get("Index Name"), INDEX_NAMES),
                [fwd],
            ]
        )
    if nt in ("Hash Join", "Merge Join"):
        return np.concatenate(
            [
                basics,
                _py_one_hot(node.get("Join Type"), JOIN_TYPES, lower=True),
                _py_one_hot(
                    node.get("Parent Relationship"),
                    PARENT_REL_TYPES,
                    lower=True,
                ),
            ]
        )
    if nt == "Nested Loop":
        return np.concatenate(
            [
                basics,
                _py_one_hot(node.get("Join Type"), JOIN_TYPES, lower=True),
            ]
        )
    if nt == "Sort":
        return np.concatenate(
            [
                basics,
                _py_sort_key(node.get("Sort Key")),
                _py_one_hot(node.get("Sort Method"), SORT_ALGOS, lower=True),
            ]
        )
    if nt == "Hash":
        b = node.get("Hash Buckets")
        return np.concatenate([basics, [float(b) if b is not None else 1.0]])
    if nt == "Aggregate":
        par = node.get("Parallel Aware")
        bit = 0.0 if (par is None or par == "false") else 1.0
        return np.concatenate(
            [
                basics,
                _py_one_hot(node.get("Strategy"), AGG_STRATEGIES, lower=True),
                [bit],
            ]
        )
    return basics


def featurize_node_dict_padded(node: dict) -> np.ndarray:
    """The unified-width variant the MSCN serializer embeds per node."""
    vec = featurize_node_dict(node)
    out = np.zeros(UNIFIED_FEAT_LEN)
    out[: len(vec)] = vec
    return out
