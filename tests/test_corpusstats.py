"""Corpus power-law fits (operators/corpusstats.py) vs numpy
least-squares and analytic fixtures."""

import math

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.operators.corpusstats import (
    corpus_power_laws)

SF = "/root/testdata/sf0.001"


def test_vs_numpy_on_documents(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    row = corpus_power_laws(docs, min_freq=5).collect()[0]

    texts = [r.text for r in docs.select("doc_id", "text")
             .orderBy("doc_id").collect()]
    from collections import Counter
    tf = Counter(w for t in texts for w in t.lower().split(" ") if w)
    pairs = sorted(((f, t) for t, f in tf.items() if f >= 5),
                   key=lambda p: (-p[0], p[1]))
    x = np.log(np.arange(1, len(pairs) + 1, dtype=float))
    y = np.log(np.array([f for f, _ in pairs], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert row.zipf_slope == pytest.approx(slope, abs=1e-4)
    assert row.zipf_r2 == pytest.approx(r * r, abs=1e-4)
    assert row.n_terms_fit == len(pairs)
    assert row.vocab_size == len(tf)
    assert row.total_tokens == sum(tf.values())

    # heaps via the same cumulative construction
    seen, cum_t, cx, cy = set(), 0, [], []
    for t in texts:
        ws = [w for w in t.lower().split(" ") if w]
        cum_t += len(ws)
        seen.update(ws)
        cx.append(math.log(cum_t))
        cy.append(math.log(len(seen)))
    hb, hi = np.polyfit(np.array(cx), np.array(cy), 1)
    assert row.heaps_beta == pytest.approx(hb, abs=1e-4)
    assert row.heaps_k == pytest.approx(math.exp(hi), rel=1e-3)
    # the synthetic fixture corpus has a tiny 31-term vocabulary, so
    # only the weak shape holds: freq still decays with rank and the
    # cumulative vocab curve is non-decreasing below linear
    assert row.zipf_slope < 0.0
    assert 0.0 <= row.heaps_beta < 1.0


def test_perfect_zipf_fixture(spark):
    # plant exact f(r) = 64 / r for r in 1..8 (integer counts):
    # log-log points are perfectly collinear -> slope -1, r2 = 1
    words = []
    for r in range(1, 9):
        words += [f"t{r:02d}"] * (64 // r)
    docs = spark.createDataFrame([(0, " ".join(words))],
                                 ["doc_id", "text"])
    row = corpus_power_laws(docs, min_freq=1).collect()[0]
    # ranks of equal-frequency ties break lexically; counts 64//r are
    # exact powers only for r in {1,2,4,8}; allow the integer floor
    assert row.zipf_slope == pytest.approx(-1.0, abs=0.02)
    assert row.zipf_r2 > 0.995


def test_min_freq_validation(spark):
    docs = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        corpus_power_laws(docs, min_freq=0)
