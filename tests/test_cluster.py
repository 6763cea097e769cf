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


class TestLeakageSafeSplit:
    def _clusters(self, spark):
        # 3 clusters: {1,2,3} rep 1, {10, 11} rep 10, {20} rep 20
        rows = [(1, 1, 3), (2, 1, 3), (3, 1, 3),
                (10, 10, 2), (11, 10, 2), (20, 20, 1)]
        return spark.createDataFrame(
            rows, "doc_id long, cluster_rep long, cluster_size long")

    def test_cluster_members_share_split(self, spark):
        from osc_geo_h3grid_srv_spark.operators.cluster import (
            leakage_safe_split)
        out = leakage_safe_split(self._clusters(spark)).collect()
        by_rep = {}
        for r in out:
            by_rep.setdefault(r.cluster_rep, set()).add(r.split)
        assert all(len(s) == 1 for s in by_rep.values()), by_rep

    def test_split_is_pure_function_of_rep_and_salt(self, spark):
        import hashlib
        from osc_geo_h3grid_srv_spark.operators.cluster import (
            leakage_safe_split)
        out = {r.doc_id: r.split
               for r in leakage_safe_split(self._clusters(spark)).collect()}
        t_train = format(int(0.8 * 2 ** 32), "08x")
        t_val = format(int(0.9 * 2 ** 32), "08x")
        for doc, rep in [(1, 1), (2, 1), (10, 10), (20, 20)]:
            u = hashlib.md5(f"split1|{rep}".encode()).hexdigest()[:8]
            want = ("train" if u < t_train
                    else "val" if u < t_val else "test")
            assert out[doc] == want

    def test_fractions_hold_over_many_clusters(self, spark):
        from pyspark.sql import functions as F
        from osc_geo_h3grid_srv_spark.operators.cluster import (
            leakage_safe_split)
        df = spark.range(10000).selectExpr(
            "id as doc_id", "id as cluster_rep", "1L as cluster_size")
        counts = {r.split: r.n for r in
                  leakage_safe_split(df).groupBy("split")
                  .agg(F.count("*").alias("n")).collect()}
        assert abs(counts["train"] / 10000 - 0.8) < 0.02
        assert abs(counts["val"] / 10000 - 0.1) < 0.01
        assert abs(counts["test"] / 10000 - 0.1) < 0.01

    def test_validation(self, spark):
        import pytest as _pt
        from osc_geo_h3grid_srv_spark.operators.cluster import (
            leakage_safe_split)
        df = self._clusters(spark)
        with _pt.raises(ValueError):
            leakage_safe_split(df, fractions=[("a", 0.5), ("b", 0.4)])
        with _pt.raises(ValueError):
            leakage_safe_split(df, fractions=[])
        with _pt.raises(ValueError):
            leakage_safe_split(df, fractions=[("a", 0.5), ("a", 0.5)])
