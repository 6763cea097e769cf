"""DSIR importance-resampling tests (operators/dsir.py): brute-force
parity of the hashed-ngram fit and weights, selection determinism, and
the target-affinity direction the method exists for."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from osc_geo_h3grid_srv_spark.operators.dsir import (
    doc_grams, dsir_select, fit_logratio, importance_weights)


def _grams(text):
    t = text.lower().split(" ")
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _bucket(g):
    return hashlib.md5(g.encode()).hexdigest()[:2]


def _brute_weights(rows, target_langs, alpha=1.0, nb=256.0):
    cq, ct = {}, {}
    for _id, text, lang in rows:
        for g in _grams(text):
            b = _bucket(g)
            cq[b] = cq.get(b, 0) + 1
            if lang in target_langs:
                ct[b] = ct.get(b, 0) + 1
    nq, nt = sum(cq.values()), sum(ct.values())
    lr = {b: math.log((ct.get(b, 0) + alpha) / (nt + alpha * nb))
          - math.log((cq[b] + alpha) / (nq + alpha * nb)) for b in cq}
    out = {}
    for _id, text, lang in rows:
        gs = _grams(text)
        out[_id] = (len(gs), sum(lr[_bucket(g)] for g in gs))
    return out


ROWS = [
    (1, "the cat sat on the mat", "en"),
    (2, "the dog ate the cat food", "en"),
    (3, "der hund frisst das futter", "de"),
    (4, "el gato come la comida", "es"),
    (5, "the cat and the dog", "en"),
    (6, "das futter und der hund", "de"),
    (7, "word", "en"),  # single token: no bigrams
]


def test_weights_brute_force_parity(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string, lang string")
    g = doc_grams(df.withColumn("__t", F.col("lang") == "en"),
                  keep_cols=["__t"])
    w = importance_weights(
        g.drop("__t"), fit_logratio(g, F.col("__t")))
    got = {r["doc_id"]: (r["n_grams"], r["logw"]) for r in w.collect()}
    want = _brute_weights(ROWS, {"en"})
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        assert got[d][1] == pytest.approx(want[d][1], abs=1e-9), d


def test_single_token_doc_has_no_bogus_bigram(spark):
    # sequence(1, 0) in Spark is [1, 0]; the case guard must keep
    # single-token docs at exactly 1 gram
    df = spark.createDataFrame([(7, "word", "en")],
                               "doc_id long, text string, lang string")
    assert doc_grams(df).count() == 1


def test_target_affinity_direction(spark):
    # a doc sharing the target's vocabulary must outweigh one sharing
    # only the non-target vocabulary
    df = spark.createDataFrame(ROWS, "doc_id long, text string, lang string")
    g = doc_grams(df.withColumn("__t", F.col("lang") == "en"),
                  keep_cols=["__t"])
    w = {r["doc_id"]: r["logw"] / r["n_grams"] for r in importance_weights(
        g.drop("__t"), fit_logratio(g, F.col("__t"))).collect()}
    assert w[5] > w[6]  # english vocab vs german vocab, same shape


def test_select_deterministic_and_k(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string, lang string")
    tgt = F.col("lang") == "en"
    a = sorted(r["doc_id"] for r in dsir_select(df, tgt, k=3).collect())
    b = sorted(r["doc_id"] for r in dsir_select(df, tgt, k=3).collect())
    assert a == b and len(a) == 3
    # different salt -> different gumbel keys (values, not necessarily set)
    ka = {r["doc_id"]: r["sel_key"]
          for r in dsir_select(df, tgt, k=7, salt="s1").collect()}
    kb = {r["doc_id"]: r["sel_key"]
          for r in dsir_select(df, tgt, k=7, salt="s2").collect()}
    assert any(abs(ka[d] - kb[d]) > 1e-9 for d in ka)
    with pytest.raises(ValueError):
        dsir_select(df, tgt, k=0)
    with pytest.raises(ValueError):
        dsir_select(df, tgt, k=2, temperature=0.0)


def test_temperature_flattens_weight_influence(spark):
    # at very high temperature the key is ~pure gumbel noise: selection
    # ignores weights; at tau->0+ the top doc is the argmax-weight doc
    df = spark.createDataFrame(ROWS, "doc_id long, text string, lang string")
    tgt = F.col("lang") == "en"
    cold = dsir_select(df, tgt, k=1, temperature=1e-6).collect()[0]
    g = doc_grams(df.withColumn("__t", tgt), keep_cols=["__t"])
    w = importance_weights(g.drop("__t"), fit_logratio(g, F.col("__t")))
    best = w.orderBy(F.col("logw").desc()).first()
    assert cold["doc_id"] == best["doc_id"]
