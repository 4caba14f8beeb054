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
    TPCH_VOCAB,
    PlanVocab,
)

BASICS_LEN = 3


def type_feat_len(vocab: PlanVocab = TPCH_VOCAB) -> dict[str, int]:
    """Per-node-type vector length under ``vocab`` (ref tpch_dim_dict
    minus the knob/factor terms, which are training-loop state, not plan
    features). The reference keeps one dict per workload
    (job_dataset/attr_rel_dict.py); here it is derived from the
    vocabulary."""
    n_rel = len(vocab.rel_names)
    attr_len = 3 * vocab.max_attr
    sort_len = n_rel * vocab.max_attr
    n_idx = len(vocab.index_names)
    return {
        "Seq Scan": BASICS_LEN + n_rel + attr_len,
        # ref get_scan_input also serves Bitmap Heap Scan (Filter ->
        # Recheck Cond fallback); get_index_scan_input also serves Index
        # Only Scan
        "Bitmap Heap Scan": BASICS_LEN + n_rel + attr_len,
        "Index Scan": BASICS_LEN + n_rel + attr_len + n_idx + 1,
        "Index Only Scan": BASICS_LEN + n_rel + attr_len + n_idx + 1,
        "Bitmap Index Scan": BASICS_LEN + n_idx,
        "Hash Join": BASICS_LEN
        + len(vocab.join_types) + len(vocab.parent_rel_types),
        "Merge Join": BASICS_LEN
        + len(vocab.join_types) + len(vocab.parent_rel_types),
        "Nested Loop": BASICS_LEN + len(vocab.join_types),
        "Sort": BASICS_LEN + sort_len + len(vocab.sort_algos),
        "Hash": BASICS_LEN + 1,
        "Aggregate": BASICS_LEN + len(vocab.agg_strategies) + 1,
        "ModifyTable": BASICS_LEN + n_rel,
    }


def unified_feat_len(vocab: PlanVocab = TPCH_VOCAB) -> int:
    """Widest per-type vector — the MSCN serializer zero-pads every
    node's numerics to this (ref pads per-type batches; one unified
    width keeps the flat plan vector rectangular)."""
    return max(type_feat_len(vocab).values())


# default-vocabulary constants (back-compat with round-1..3 callers)
ATTR_STATS_LEN = 3 * TPCH_VOCAB.max_attr
SORT_KEY_LEN = len(TPCH_VOCAB.rel_names) * TPCH_VOCAB.max_attr
TYPE_FEAT_LEN = type_feat_len(TPCH_VOCAB)
UNIFIED_FEAT_LEN = unified_feat_len(TPCH_VOCAB)


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


def _attr_stats_vec(cond: Column, vocab: PlanVocab) -> Column:
    """min(8) ⧺ med(8) ⧺ max(8) masked by predicate-substring matches,
    dispatched on relation_name (ref get_rel_attr_one_hot)."""
    zeros = F.array(*[F.lit(0.0)] * (3 * vocab.max_attr))
    chain = None
    for ri, rel in enumerate(vocab.rel_names):
        attrs = vocab.rel_attrs[rel]
        cells = []
        for stat_idx in range(3):  # min, med, max — ref's concat order
            for i in range(vocab.max_attr):
                if i < len(attrs):
                    cells.append(
                        F.when(
                            cond.contains(attrs[i]),
                            F.lit(vocab.attr_stats(ri, i)[stat_idx]),
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


def _sort_key_vec(vocab: PlanVocab) -> Column:
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
    for rel in vocab.rel_names:
        attrs = vocab.rel_attrs[rel]
        for i in range(vocab.max_attr):
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
    nodes: DataFrame, feat_col: str = "feat", vocab: PlanVocab = TPCH_VOCAB
) -> DataFrame:
    """Append the per-type feature vector (array<double>) to exploded
    per-node rows (``sources/logs.per_node_rows`` schema). ``vocab``
    selects the workload dictionary (TPCH default; pass
    ``sources.logs.JOB_VOCAB`` or a custom :class:`PlanVocab` for other
    schemas — the reference swaps a module per workload)."""
    basics = _basics()
    rel_vec = _one_hot(F.col("relation_name"), list(vocab.rel_names))
    jt_vec = _one_hot(F.col("join_type"), list(vocab.join_types), lower=True)
    parent_vec = _one_hot(
        F.col("parent_relationship"), list(vocab.parent_rel_types), lower=True
    )
    strat_vec = _one_hot(
        F.col("strategy"), list(vocab.agg_strategies), lower=True
    )
    index_vec = _one_hot(F.col("index_name"), list(vocab.index_names))
    sortmeth_vec = _one_hot(
        F.col("sort_method"), list(vocab.sort_algos), lower=True
    )
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
            F.concat(basics, rel_vec, _attr_stats_vec(scan_cond, vocab)),
        )
        .when(
            (nt == "Index Scan") | (nt == "Index Only Scan"),
            F.concat(
                basics,
                rel_vec,
                _attr_stats_vec(F.col("index_cond"), vocab),
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
        .when(
            nt == "Sort", F.concat(basics, _sort_key_vec(vocab), sortmeth_vec)
        )
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


def _py_attr_stats(rel, cond, vocab: PlanVocab):
    out = np.zeros(3 * vocab.max_attr)
    if rel in vocab.rel_attrs and cond:
        ri = vocab.rel_names.index(rel)
        attrs = vocab.rel_attrs[rel]
        for stat_idx in range(3):
            for i, attr in enumerate(attrs):
                if attr in cond:
                    out[stat_idx * vocab.max_attr + i] = vocab.attr_stats(
                        ri, i
                    )[stat_idx]
    return out


def _py_sort_key(keys, vocab: PlanVocab):
    out = np.zeros(len(vocab.rel_names) * vocab.max_attr)
    for key in keys or []:
        key = key.replace("(", " ").replace(")", " ")
        for tok in key.split(" "):
            if "." not in tok:
                continue
            rel, attr = tok.split(".", 1)
            if rel in vocab.rel_attrs and attr in vocab.rel_attrs[rel]:
                out[
                    vocab.rel_names.index(rel) * vocab.max_attr
                    + vocab.rel_attrs[rel].index(attr)
                ] = 1.0
    return out


def featurize_node_dict(
    node: dict, vocab: PlanVocab = TPCH_VOCAB
) -> np.ndarray:
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
    rels = list(vocab.rel_names)
    idxs = list(vocab.index_names)
    if nt in ("Seq Scan", "Bitmap Heap Scan"):
        cond = node.get("Filter")
        if cond is None:  # ref get_scan_input's Recheck Cond fallback
            cond = node.get("Recheck Cond")
        return np.concatenate(
            [
                basics,
                _py_one_hot(rel, rels),
                _py_attr_stats(rel, cond, vocab),
            ]
        )
    if nt == "Bitmap Index Scan":
        return np.concatenate(
            [basics, _py_one_hot(node.get("Index Name"), idxs)]
        )
    if nt == "ModifyTable":
        return np.concatenate([basics, _py_one_hot(rel, rels)])
    if nt in ("Index Scan", "Index Only Scan"):
        fwd = 1.0 if node.get("Scan Direction") == "Forward" else 0.0
        return np.concatenate(
            [
                basics,
                _py_one_hot(rel, rels),
                _py_attr_stats(rel, node.get("Index Cond"), vocab),
                _py_one_hot(node.get("Index Name"), idxs),
                [fwd],
            ]
        )
    if nt in ("Hash Join", "Merge Join"):
        return np.concatenate(
            [
                basics,
                _py_one_hot(
                    node.get("Join Type"), list(vocab.join_types), lower=True
                ),
                _py_one_hot(
                    node.get("Parent Relationship"),
                    list(vocab.parent_rel_types),
                    lower=True,
                ),
            ]
        )
    if nt == "Nested Loop":
        return np.concatenate(
            [
                basics,
                _py_one_hot(
                    node.get("Join Type"), list(vocab.join_types), lower=True
                ),
            ]
        )
    if nt == "Sort":
        return np.concatenate(
            [
                basics,
                _py_sort_key(node.get("Sort Key"), vocab),
                _py_one_hot(
                    node.get("Sort Method"), list(vocab.sort_algos), lower=True
                ),
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
                _py_one_hot(
                    node.get("Strategy"),
                    list(vocab.agg_strategies),
                    lower=True,
                ),
                [bit],
            ]
        )
    return basics


def featurize_node_dict_padded(
    node: dict, vocab: PlanVocab = TPCH_VOCAB
) -> np.ndarray:
    """The unified-width variant the MSCN serializer embeds per node."""
    vec = featurize_node_dict(node, vocab)
    out = np.zeros(unified_feat_len(vocab))
    out[: len(vec)] = vec
    return out
