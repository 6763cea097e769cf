"""Distributed PageRank (operators/linkgraph.py) vs a dense NumPy
power-iteration replay, including dangling-mass redistribution."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osc_geo_h3grid_srv_spark.operators.linkgraph import pagerank


def _brute(edges, d, k, digits):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for u, v in set(edges):
        out.setdefault(u, []).append(v)
    r = np.full(n, round(1.0 / n, digits))
    for _ in range(k):
        nxt = np.zeros(n)
        dmass = 0.0
        for u in nodes:
            if u in out:
                share = r[idx[u]] / len(out[u])
                for v in out[u]:
                    nxt[idx[v]] += share
            else:
                dmass += r[idx[u]]
        r = np.round((1 - d) / n + d * (nxt + dmass / n), digits)
    return {nodes[i]: r[i] for i in range(n)}


def _run(spark, edges, d=0.85, k=4, digits=9):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, damping=d, num_iter=k,
                             round_digits=digits).collect()}
    want = _brute(edges, d, k, digits)
    assert set(got) == set(want)
    for node in want:
        assert abs(got[node] - want[node]) < 1e-9, (node, got[node],
                                                    want[node])
    return got


def test_chain_with_dangling_sink(spark):
    # 0 -> 1 -> 2 -> 3, node 3 dangling; rank accumulates downstream
    got = _run(spark, [(0, 1), (1, 2), (2, 3)])
    assert got[3] > got[1] > got[0]
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_symmetric_cycle_is_uniform(spark):
    got = _run(spark, [(0, 1), (1, 2), (2, 0)])
    assert len(set(got.values())) == 1


def test_hub_receives_most_rank(spark):
    # needs enough iterations: the hub<->origin 2-cycle oscillates and
    # node 0 still leads at k=4 (verified by the dense replay)
    edges = [(i, 9) for i in range(9)] + [(9, 0)]
    got = _run(spark, edges, k=7)
    assert got[9] == max(got.values())


def test_multi_edges_deduplicated(spark):
    # duplicate edges must not double contributions
    a = _run(spark, [(0, 1), (0, 1), (1, 0)])
    b = _run(spark, [(0, 1), (1, 0)])
    assert a == b


# -- HITS ------------------------------------------------------------------

def _brute_hits(edges, k, digits):
    from osc_geo_h3grid_srv_spark.operators.linkgraph import hits  # noqa
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    es = sorted(set(edges))
    hub = np.ones(len(nodes))
    auth = np.zeros(len(nodes))
    for _ in range(k):
        auth = np.zeros(len(nodes))
        for u, v in es:
            auth[idx[v]] += hub[idx[u]]
        z = np.sqrt((auth * auth).sum())
        auth = np.round(auth / (z if z else 1.0), digits)
        hub = np.zeros(len(nodes))
        for u, v in es:
            hub[idx[u]] += auth[idx[v]]
        z = np.sqrt((hub * hub).sum())
        hub = np.round(hub / (z if z else 1.0), digits)
    return {nodes[i]: (hub[i], auth[i]) for i in range(len(nodes))}


def _run_hits(spark, edges, k=4):
    from osc_geo_h3grid_srv_spark.operators.linkgraph import hits
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: (r["hub"], r["auth"])
            for r in hits(df, num_iter=k).collect()}


def test_hits_matches_brute(spark):
    rs = np.random.RandomState(3)
    edges = [(int(rs.randint(0, 12)), int(rs.randint(0, 12)))
             for _ in range(40)]
    got = _run_hits(spark, edges)
    want = _brute_hits(edges, 4, 9)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n][0] - want[n][0]) < 1e-8
        assert abs(got[n][1] - want[n][1]) < 1e-8


def test_hits_directory_page_is_hub(spark):
    # a page linking to every authority is the top hub; the page every
    # hub links to is the top authority
    edges = [(0, i) for i in range(1, 6)] + [(9, 1), (9, 2)]
    got = _run_hits(spark, edges)
    assert got[0][0] == max(h for h, _ in got.values())
    assert got[1][1] == max(a for _, a in got.values())
    # pure hubs have zero authority, pure authorities zero hub
    assert got[0][1] == 0.0
    assert got[3][0] == 0.0


def test_hits_multi_edges_deduplicated(spark):
    a = _run_hits(spark, [(0, 1), (0, 1), (1, 2)])
    b = _run_hits(spark, [(0, 1), (1, 2)])
    assert a == b


# -- triangles -------------------------------------------------------------

def _brute_triangles(edges):
    adj = {}
    und = set()
    for u, v in edges:
        if u == v:
            continue
        und.add((min(u, v), max(u, v)))
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for a, b in und:
        for c in adj[a] & adj[b]:
            if c > b:  # a<b<c once per triangle needs a<b which und has
                if a < b < c:
                    for n in (a, b, c):
                        counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangle_counts_matches_brute(spark):
    from osc_geo_h3grid_srv_spark.operators.linkgraph import (
        triangle_counts)
    rs = np.random.RandomState(17)
    edges = [(int(rs.randint(0, 25)), int(rs.randint(0, 25)))
             for _ in range(120)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"]
           for r in triangle_counts(df).collect()}
    assert got == _brute_triangles(edges)


def test_triangle_counts_star_plus_triangle(spark):
    from osc_geo_h3grid_srv_spark.operators.linkgraph import (
        triangle_counts)
    # a hub star (no triangles) plus one planted triangle through the
    # hub; duplicate/reversed edges must not double-count
    edges = ([(0, i) for i in range(1, 12)]
             + [(1, 2), (2, 1), (1, 2)])
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"]
           for r in triangle_counts(df).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def _brute_lpa(edges, num_iter):
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    lbl = {n: n for n in adj}
    for _ in range(num_iter):
        nxt = {}
        for n, nbrs in adj.items():
            cnt = {}
            for m in nbrs:
                cnt[lbl[m]] = cnt.get(lbl[m], 0) + 1
            # most frequent, ties to the smallest label
            nxt[n] = min(cnt, key=lambda l: (-cnt[l], l))
        lbl = nxt
    return lbl


def test_label_propagation_matches_brute(spark):
    from osc_geo_h3grid_srv_spark.operators.linkgraph import (
        label_propagation)
    rs = np.random.RandomState(23)
    edges = [(int(rs.randint(0, 30)), int(rs.randint(0, 30)))
             for _ in range(150)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for k in (1, 3, 5):
        got = {r["node"]: r["label"]
               for r in label_propagation(df, num_iter=k).collect()}
        assert got == _brute_lpa(edges, k), f"num_iter={k}"


def test_label_propagation_recovers_blocks(spark):
    from osc_geo_h3grid_srv_spark.operators.linkgraph import (
        label_propagation)
    # two disjoint circulant blocks (+1/+2 chords — pure even rings
    # oscillate under synchronous updates, the published LPA caveat):
    # every node must end with its block's min label
    edges = ([(i, (i + m) % 10) for i in range(10) for m in (1, 2)]
             + [(100 + i, 100 + (i + m) % 10)
                for i in range(10) for m in (1, 2)])
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["label"]
           for r in label_propagation(df, num_iter=12).collect()}
    comm = {}
    for n, l in got.items():
        comm.setdefault(l, set()).add(n)
    rings = sorted(frozenset(m) for m in comm.values())
    assert rings == [frozenset(range(10)),
                     frozenset(range(100, 110))]


def test_label_propagation_tie_breaks_to_smallest(spark):
    from osc_geo_h3grid_srv_spark.operators.linkgraph import (
        label_propagation)
    # node 2 sees labels {0, 1} once each after round 1 start: the
    # tie must resolve to 0, never 1 (and never nondeterministically)
    edges = [(0, 2), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["label"]
           for r in label_propagation(df, num_iter=1).collect()}
    assert got[2] == 0


def _brute_kcore(edges, k):
    """node -> degree inside the k-core (full peel to fixpoint)."""
    adj = {}
    for u, v in edges:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    alive = set(adj)
    while True:
        drop = {n for n in alive
                if len(adj[n] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {n: len(adj[n] & alive) for n in alive}


def test_kcore_matches_brute(spark):
    from osc_geo_h3grid_srv_spark.operators.linkgraph import kcore
    rs = np.random.RandomState(31)
    edges = [(int(rs.randint(0, 40)), int(rs.randint(0, 40)))
             for _ in range(220)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for k in (2, 3, 5):
        got = {r["node"]: r["deg"]
               for r in kcore(df, k=k, num_rounds=40).collect()}
        assert got == _brute_kcore(edges, k), f"k={k}"


def test_kcore_clique_plus_tail(spark):
    from osc_geo_h3grid_srv_spark.operators.linkgraph import kcore
    # K5 clique + a chain hanging off node 0: the 4-core is exactly
    # the clique (deg 4 each); the chain peels away transitively
    edges = ([(i, j) for i in range(5) for j in range(i + 1, 5)]
             + [(0, 10), (10, 11), (11, 12)])
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["deg"]
           for r in kcore(df, k=4, num_rounds=10).collect()}
    assert got == {i: 4 for i in range(5)}


def test_kcore_entry_fixpoint_within_round_budget(spark):
    # the driver entry runs _KCORE_ROUNDS synchronous rounds and its
    # oracle replays exactly that count: assert the planted graph
    # reaches its fixpoint one round EARLIER, so the last round is a
    # no-op and round-count drift can never change the answer
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from pyspark.sql import functions as F
    from osc_geo_h3grid_srv_spark.operators.linkgraph import kcore
    docs = spark.range(600).select(F.col("id").alias("doc_id"))
    nm = 600
    base = [int(d) for d in range(600) if d % 10 != 0]
    edges = [(d, (d * mult + j) % nm)
             for j, mult in enumerate(m._PR_MULTS) for d in base]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {(r["node"], r["deg"]) for r in kcore(
        df, k=m._KCORE_K, num_rounds=m._KCORE_ROUNDS - 1).collect()}
    b = {(r["node"], r["deg"]) for r in kcore(
        df, k=m._KCORE_K, num_rounds=m._KCORE_ROUNDS).collect()}
    assert a == b, "fixpoint not reached within the round budget"
    assert b == {(n, d) for n, d in _brute_kcore(
        edges, m._KCORE_K).items()}


def test_kcore_rejects_bad_args(spark):
    from osc_geo_h3grid_srv_spark.operators.linkgraph import kcore
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="k must be positive"):
        kcore(df, k=0)
    with pytest.raises(ValueError, match="num_rounds"):
        kcore(df, k=2, num_rounds=0)


def _brute_edge_jaccard(edges):
    adj = {}
    es = set()
    for u, v in edges:
        if u != v:
            a, b = min(u, v), max(u, v)
            es.add((a, b))
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    out = {}
    for a, b in es:
        common = len(adj[a] & adj[b])
        union = len(adj[a]) + len(adj[b]) - common
        out[(a, b)] = (common, round(common / union, 6))
    return out


def test_edge_jaccard_matches_brute(spark):
    from osc_geo_h3grid_srv_spark.operators.linkgraph import edge_jaccard
    rs = np.random.RandomState(41)
    edges = [(int(rs.randint(0, 35)), int(rs.randint(0, 35)))
             for _ in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["id_a"], r["id_b"]): (r["common"], r["jaccard"])
           for r in edge_jaccard(df).collect()}
    assert got == _brute_edge_jaccard(edges)


def test_edge_jaccard_clique_and_bridge(spark):
    from osc_geo_h3grid_srv_spark.operators.linkgraph import edge_jaccard
    # K4 + a pendant bridge: clique edges share the other two members
    # (J = 2/4), the bridge shares nothing (J = 0)
    edges = ([(i, j) for i in range(4) for j in range(i + 1, 4)]
             + [(3, 9)])
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in edge_jaccard(df).collect()}
    for i in range(3):
        for jj in range(i + 1, 3):
            assert got[(i, jj)] == 0.5
    assert got[(3, 9)] == 0.0


# ---------------------------------------------------- personalized PR

def _brute_ppr(edges, seeds, d, k, digits):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    out = {}
    for u, v in set(edges):
        out.setdefault(u, []).append(v)
    tele = np.array([1.0 / len(seeds) if n in seeds else 0.0
                     for n in nodes])
    r = np.round(tele, digits)
    for _ in range(k):
        nxt = np.zeros(len(nodes))
        dmass = 0.0
        for u in nodes:
            if u in out:
                share = r[idx[u]] / len(out[u])
                for v in out[u]:
                    nxt[idx[v]] += share
            else:
                dmass += r[idx[u]]
        r = np.round((1 - d) * tele + d * (nxt + dmass * tele), digits)
    return {nodes[i]: r[i] for i in range(len(nodes))}


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_ppr_matches_brute(spark):
    from osc_geo_h3grid_srv_spark.operators.linkgraph import (
        personalized_pagerank)
    rng = np.random.default_rng(3)
    edges = list({(int(a), int(b)) for a, b in
                  zip(rng.integers(0, 30, 120),
                      rng.integers(0, 30, 120)) if a != b})
    seeds = [1, 5, 9]
    got = {r.node: r.rank for r in personalized_pagerank(
        _edges_df(spark, edges), seeds, damping=0.85, num_iter=4,
        round_digits=9).collect()}
    want = _brute_ppr(edges, set(seeds), 0.85, 4, 9)
    assert got.keys() == want.keys()
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=2e-9), n


def test_ppr_unreachable_stays_zero(spark):
    from osc_geo_h3grid_srv_spark.operators.linkgraph import (
        personalized_pagerank)
    # two disconnected components; seed only in the first
    edges = [(1, 2), (2, 1), (10, 11), (11, 10)]
    got = {r.node: r.rank for r in personalized_pagerank(
        _edges_df(spark, edges), [1], num_iter=5).collect()}
    assert got[10] == 0.0 and got[11] == 0.0
    assert got[1] > 0.0 and got[2] > 0.0
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_ppr_rejects_bad_seeds(spark):
    from osc_geo_h3grid_srv_spark.operators.linkgraph import (
        personalized_pagerank)
    df = _edges_df(spark, [(1, 2)])
    with pytest.raises(ValueError):
        personalized_pagerank(df, [])
    with pytest.raises(ValueError):
        personalized_pagerank(df, [1, 1])


# -------------------------------------------------------------- BFS

def test_bfs_matches_brute(spark):
    from osc_geo_h3grid_srv_spark.operators.linkgraph import (
        bfs_distances)
    rng = np.random.default_rng(17)
    edges = list({(int(a), int(b)) for a, b in
                  zip(rng.integers(0, 40, 150),
                      rng.integers(0, 40, 150)) if a != b})
    sources, hops = [0, 7], 3
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    want, frontier = {s: 0 for s in sources}, set(sources)
    for h in range(1, hops + 1):
        nxt = {v for u in frontier for v in adj.get(u, ())} - want.keys()
        want.update({v: h for v in nxt})
        frontier = nxt
    got = {r.node: r.dist for r in bfs_distances(
        _edges_df(spark, edges), sources, hops).collect()}
    assert got == want


def test_bfs_undirected_and_early_stop(spark):
    from osc_geo_h3grid_srv_spark.operators.linkgraph import (
        bfs_distances)
    edges = [(1, 2), (2, 3), (5, 4)]  # 4->5 only via reverse edge
    got = {r.node: r.dist for r in bfs_distances(
        _edges_df(spark, edges), [4], max_hops=10,
        directed=False).collect()}
    assert got == {4: 0, 5: 1}
    directed = {r.node: r.dist for r in bfs_distances(
        _edges_df(spark, edges), [4], max_hops=10).collect()}
    assert directed == {4: 0}


def test_bfs_rejects_bad_args(spark):
    from osc_geo_h3grid_srv_spark.operators.linkgraph import (
        bfs_distances)
    df = _edges_df(spark, [(1, 2)])
    with pytest.raises(ValueError):
        bfs_distances(df, [], 2)
    with pytest.raises(ValueError):
        bfs_distances(df, [1], -1)
