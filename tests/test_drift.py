"""Corpus-drift divergence tests (operators/drift.py)."""

import math

import pytest
from pyspark.sql import functions as F

from osc_geo_h3grid_srv_spark.operators.drift import (
    drifted_terms, vocab_divergence)


def _brute(rows_a, rows_b, alpha=0.5):
    ca, cb = {}, {}
    for t in " ".join(rows_a).lower().split(" "):
        ca[t] = ca.get(t, 0) + 1
    for t in " ".join(rows_b).lower().split(" "):
        cb[t] = cb.get(t, 0) + 1
    vocab = sorted(set(ca) | set(cb))
    na, nb, v = sum(ca.values()), sum(cb.values()), len(vocab)
    kl_ab = kl_ba = js = 0.0
    for t in vocab:
        p = (ca.get(t, 0) + alpha) / (na + alpha * v)
        q = (cb.get(t, 0) + alpha) / (nb + alpha * v)
        m = (p + q) / 2
        kl_ab += p * math.log(p / q)
        kl_ba += q * math.log(q / p)
        js += (p * math.log(p / m) + q * math.log(q / m)) / 2
    return v, kl_ab, kl_ba, js


A = ["the cat sat", "the dog ran fast"]
B = ["der hund lief", "the cat sat still"]


def _df(spark):
    rows = [(i, t, True) for i, t in enumerate(A)] + \
           [(100 + i, t, False) for i, t in enumerate(B)]
    return spark.createDataFrame(rows, "doc_id long, text string, a boolean")


def test_divergence_brute_force_parity(spark):
    got = vocab_divergence(_df(spark), F.col("a")).collect()[0]
    v, kl_ab, kl_ba, js = _brute(A, B)
    assert got["n_terms"] == v
    assert got["kl_ab"] == pytest.approx(kl_ab, abs=1e-9)
    assert got["kl_ba"] == pytest.approx(kl_ba, abs=1e-9)
    assert got["js"] == pytest.approx(js, abs=1e-9)
    # KL >= 0, JS bounded by ln 2
    assert got["kl_ab"] > 0 and got["kl_ba"] > 0
    assert 0 < got["js"] < math.log(2)


def test_identical_corpora_zero_divergence(spark):
    rows = [(i, "x y z", i % 2 == 0) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, a boolean")
    got = vocab_divergence(df, F.col("a")).collect()[0]
    assert got["kl_ab"] == pytest.approx(0.0, abs=1e-12)
    assert got["js"] == pytest.approx(0.0, abs=1e-12)


def test_drifted_terms_sign_and_order(spark):
    got = drifted_terms(_df(spark), F.col("a"), k=50).collect()
    by_term = {r["term"]: r for r in got}
    # a-only words positive, b-only words negative
    assert by_term["dog"]["kl_contrib"] > 0
    assert by_term["hund"]["kl_contrib"] < 0
    mags = [abs(r["kl_contrib"]) for r in got]
    assert mags == sorted(mags, reverse=True)
    with pytest.raises(ValueError):
        drifted_terms(_df(spark), F.col("a"), k=0)
