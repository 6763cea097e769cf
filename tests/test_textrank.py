"""TextRank keywords (operators/textrank.py) vs an exact python
replay of the rounded iteration chain, plus a hub-word fixture."""

from collections import Counter, defaultdict

import pytest

from osc_geo_h3grid_srv_spark.operators.textrank import textrank_keywords

SF = "/root/testdata/sf0.001"


def _python_textrank(texts, min_edge=3, d=0.85, num_iter=5, k=20):
    bg = Counter()
    for t in texts:
        ws = t.split(" ")
        for a, b in zip(ws, ws[1:]):
            if a and b:
                bg[(a, b)] += 1
    und = Counter()
    for (a, b), n in bg.items():
        if n >= min_edge and a != b:
            und[(min(a, b), max(a, b))] += n
    edges = defaultdict(dict)
    for (u, v), w in und.items():
        edges[u][v] = edges[u].get(v, 0) + w
        edges[v][u] = edges[v].get(u, 0) + w
    wtot = {u: sum(nbrs.values()) for u, nbrs in edges.items()}
    score = {u: 1.0 for u in edges}
    for _ in range(num_iter):
        nxt = {}
        for v in edges:
            c = sum(edges[u][v] / wtot[u] * score[u]
                    for u in edges[v])
            nxt[v] = round((1.0 - d) + d * c, 9)
        score = nxt
    rows = sorted(((round(score[u], 6), u, len(edges[u])) for u in edges),
                  key=lambda r: (-r[0], r[1]))[:k]
    return [(u, s, deg) for s, u, deg in rows]


def test_vs_python_replay(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    want = _python_textrank(texts)
    got = [(r.term, r.score, r.degree)
           for r in textrank_keywords(docs).collect()]
    assert got == want
    assert len(got) == 20


def test_hub_word_wins(spark):
    # 'hub' co-occurs with 8 distinct spokes (3x each); spokes only
    # ever touch the hub -> hub must rank first
    from pyspark.sql import functions as F
    rows = []
    for i in range(8):
        rows += [(f"hub s{i}",)] * 3
    df = spark.createDataFrame(rows, ["text"]).withColumn(
        "doc_id", F.lit(0))
    got = textrank_keywords(df, min_edge_count=3, k=3).collect()
    assert got[0].term == "hub"
    assert got[0].degree == 8
    assert got[0].score > got[1].score * 3


def test_validation(spark):
    df = spark.createDataFrame([(0, "a b a b a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        textrank_keywords(df, damping=1.0)
    with pytest.raises(ValueError):
        textrank_keywords(df, num_iter=0)
