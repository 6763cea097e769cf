"""Collocation statistics (operators/collocations.py) vs a hand-rolled
python contingency-table oracle, plus analytic spot checks."""

import math
from collections import Counter

import pytest

from osc_geo_h3grid_srv_spark.operators.collocations import collocations

SF = "/root/testdata/sf0.001"


def _python_oracle(texts, min_count, k):
    bg = Counter()
    for t in texts:
        ws = [w for w in t.split(" ")]
        for a, b in zip(ws, ws[1:]):
            if a and b:
                bg[(a, b)] += 1
    lm, rm = Counter(), Counter()
    for (a, b), n in bg.items():
        lm[a] += n
        rm[b] += n
    N = float(sum(bg.values()))

    def xlx(kk, row, col):
        return kk * math.log(kk * N / (row * col)) if kk > 0 else 0.0

    out = []
    for (a, b), n in bg.items():
        if n < min_count:
            continue
        row, col = float(lm[a]), float(rm[b])
        pmi = math.log(n * N / (row * col))
        g2 = 2.0 * (xlx(n, row, col) + xlx(row - n, row, N - col)
                    + xlx(col - n, N - row, col)
                    + xlx(N - row - col + n, N - row, N - col))
        out.append((a, b, n, round(pmi, 6), round(g2, 6)))
    out.sort(key=lambda r: (-r[4], r[0], r[1]))
    return out[:k]


def test_vs_python_oracle_on_documents(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    want = _python_oracle(texts, 5, 30)
    got = [(r.left, r.right, r.n, r.pmi, r.g2)
           for r in collocations(docs, min_count=5, k=30).collect()]
    assert got == want
    assert len(got) == 30


def test_perfect_association_and_independence(spark):
    # "aa bb" always together (perfect association); "xx" pairs with
    # many different right-hand words (weak association)
    rows = [("aa bb",)] * 6 + [(f"xx y{i}",) for i in range(6)]
    df = spark.createDataFrame(rows, ["text"])
    got = {(r.left, r.right): r for r in
           collocations(df, min_count=1, k=100).collect()}
    N = 12.0
    # (aa, bb): k11=6, row=6, col=6 -> pmi = ln(6*12/36) = ln 2
    assert got[("aa", "bb")].pmi == round(math.log(2.0), 6)
    # g2 for the perfectly-associated half-corpus pair: every cell known
    g2 = 2 * (6 * math.log(6 * N / 36) + 0 + 0
              + 6 * math.log(6 * N / 36))
    assert got[("aa", "bb")].g2 == round(g2, 6)
    # xx->y0 occurs once among 6 xx bigrams: far weaker than (aa, bb)
    assert got[("xx", "y0")].g2 < got[("aa", "bb")].g2


def test_min_count_filters(spark):
    df = spark.createDataFrame([("p q",), ("p q",), ("r s",)], ["text"])
    got = collocations(df, min_count=2, k=10).collect()
    assert [(r.left, r.right) for r in got] == [("p", "q")]
    with pytest.raises(ValueError):
        collocations(df, min_count=0)
