"""Connected-components dedup clustering vs a pure-python union-find."""

from __future__ import annotations

import numpy as np
import pandas as pd

from query_cost_feature_engineering_spark.operators.cluster import (
    connected_components,
    dedup_clusters,
)


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id representative per component
    comp = {}
    for v in range(n_nodes):
        r = find(v)
        comp.setdefault(r, []).append(v)
    out = {}
    for members in comp.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def test_cc_matches_union_find_random(spark):
    rng = np.random.default_rng(5)
    n = 300
    edges = [
        (int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(250)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    golden = _union_find(n, edges)
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    touched = {v for e in edges for v in e}
    assert set(got) == touched
    for v in touched:
        assert got[v] == golden[v], v


def test_cc_long_chain_converges(spark):
    """A path graph has maximal diameter — worst case for propagation."""
    n = 40
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = connected_components(df, max_iter=50).collect()
    assert all(r["component"] == 0 for r in got)
    assert len(got) == n


def test_dedup_clusters_singletons_and_survivors(spark):
    edges = pd.DataFrame([(1, 2), (2, 3), (10, 11)], columns=["a", "b"])
    ids = pd.DataFrame({"id": [1, 2, 3, 10, 11, 99]})
    out = (
        dedup_clusters(
            spark.createDataFrame(edges), "a", "b",
            all_ids=spark.createDataFrame(ids), id_col="id",
        )
        .toPandas()
        .set_index("id")
    )
    assert out.loc[3, "cluster_id"] == 1
    assert out.loc[11, "cluster_id"] == 10
    assert out.loc[99, "cluster_id"] == 99 and out.loc[99, "is_survivor"]
    assert set(out[out["is_survivor"]].index) == {1, 10, 99}
