"""Connected components (alternating large-star/small-star) vs a
driver-side union-find reference on deterministic pseudo-random graphs,
plus the dedup-cluster reduction semantics."""

import pytest
from pyspark.sql import functions as F

from osc_geo_h3grid_srv_spark.operators.cluster import (
    connected_components, dedup_clusters)


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # component label = min node id in component
    comp = {}
    for x in range(n_nodes):
        r = find(x)
        comp.setdefault(r, []).append(x)
    return {x: min(mem) for r, mem in comp.items() for x in mem}


def _lcg_edges(n_nodes, n_edges, seed):
    s = seed
    out = []
    for _ in range(n_edges):
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        u = (s >> 16) % n_nodes
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        v = (s >> 16) % n_nodes
        if u != v:
            out.append((u, v))
    return out


@pytest.mark.parametrize("n_nodes,n_edges,seed", [
    (40, 25, 7),     # sparse: many small components
    (60, 90, 11),    # dense: giant component emerges
    (30, 250, 13),   # saturated: single component
    (50, 1, 17),     # one edge
])
def test_cc_matches_union_find(spark, n_nodes, n_edges, seed):
    edges = _lcg_edges(n_nodes, n_edges, seed)
    expected = _union_find(n_nodes, edges)
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    touched = {u for e in edges for u in e}
    assert set(got) == touched
    for node in touched:
        assert got[node] == expected[node], node


def test_cc_star_and_chain(spark):
    # a 0-rooted star and a long chain (worst case for naive label prop:
    # needs O(diameter) rounds there, O(log n) for alternating stars)
    chain = [(i, i + 1) for i in range(100, 140)]
    star = [(0, i) for i in range(1, 8)]
    df = spark.createDataFrame(chain + star, "id_a long, id_b long")
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    assert all(got[i] == 100 for i in range(100, 141))
    assert all(got[i] == 0 for i in range(0, 8))


def test_dedup_clusters_representatives(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(10)], "doc_id long")
    # {0,1,2} and {5,6} are duplicate clusters; rest singletons
    pairs = spark.createDataFrame(
        [(1, 0), (2, 1), (6, 5)], "id_a long, id_b long")
    out = {r["doc_id"]: (r["cluster_rep"], r["cluster_size"])
           for r in dedup_clusters(docs, pairs).collect()}
    assert out[0] == (0, 3) and out[1] == (0, 3) and out[2] == (0, 3)
    assert out[5] == (5, 2) and out[6] == (5, 2)
    for i in (3, 4, 7, 8, 9):
        assert out[i] == (i, 1)
    # dedup = keep doc_id == cluster_rep -> one survivor per cluster
    survivors = {d for d, (rep, _) in out.items() if d == rep}
    assert survivors == {0, 3, 4, 5, 7, 8, 9}


def test_cc_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).count() == 0
    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    out = {r["doc_id"]: (r["cluster_rep"], r["cluster_size"])
           for r in dedup_clusters(docs, pairs).collect()}
    assert out == {1: (1, 1), 2: (2, 1)}


def test_dedup_keep_decision(spark):
    from osc_geo_h3grid_srv_spark.operators.cluster import (
        dedup_keep_decision)
    docs = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
    # qualities: cluster {0,1,2} -> doc 1 best; {4,5} -> tie, lowest id
    # (4) wins; singletons keep themselves
    quality = spark.createDataFrame(
        [(0, 10), (1, 99), (2, 50), (3, 1), (4, 7), (5, 7), (6, 0)],
        "doc_id long, quality long")
    cl = dedup_clusters(docs, pairs).join(quality, "doc_id")
    out = {r["doc_id"]: r["keep"]
           for r in dedup_keep_decision(cl, "quality").collect()}
    assert out == {0: False, 1: True, 2: False, 3: True,
                   4: True, 5: False, 6: True}
    # exactly one keeper per cluster, always
    kept = [d for d, k in out.items() if k]
    assert len(kept) == 4
