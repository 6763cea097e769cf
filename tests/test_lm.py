"""Bigram LM perplexity scoring (operators/lm.py)."""

import math
from collections import Counter

from osc_geo_h3grid_srv_spark.operators.lm import (
    bigram_lm_scores, doc_bigrams)


def _brute(docs, k=0.5):
    """pure-Python reference of the same add-k bigram model."""
    toks = {i: s.split(" ") for i, s in docs}
    bg = {i: list(zip(t, t[1:])) for i, t in toks.items() if len(t) >= 2}
    cb = Counter(p for ps in bg.values() for p in ps)
    cu = Counter(p[0] for ps in bg.values() for p in ps)
    v = len({p[1] for ps in bg.values() for p in ps})
    out = {}
    for i, ps in bg.items():
        s = sum(math.log((cb[p] + k) / (cu[p[0]] + k * v)) for p in ps)
        out[i] = (len(ps), round(s / len(ps), 6),
                  round(math.exp(-s / len(ps)), 4))
    return out


def test_hand_computed_smoke(spark):
    rows = [(0, "a b a b c"), (1, "a b"), (2, "x"), (3, "c c c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"],
                         r["perplexity"])
           for r in bigram_lm_scores(df).collect()}
    # doc 1: P(b|a) = (3+0.5)/(3+0.5*3); docs with <2 tokens drop out
    assert got[1] == (1, round(math.log(3.5 / 4.5), 6),
                      round(4.5 / 3.5, 4))
    assert 2 not in got
    assert got == _brute(rows)


def test_brute_force_parity_random_corpus(spark):
    import random
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(17)]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(1, 30))))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"],
                         r["perplexity"])
           for r in bigram_lm_scores(df).collect()}
    assert got == _brute(rows)


def test_bigram_relation_counts(spark):
    rows = [(0, "a b c"), (1, "d e")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(map(tuple, doc_bigrams(df).collect()))
    assert got == [(0, "a", "b"), (0, "b", "c"), (1, "d", "e")]


def test_partition_invariance(spark):
    rows = [(i, " ".join(f"t{(i * j) % 11}" for j in range(12)))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, bigram_lm_scores(df).collect()))
    b = sorted(map(tuple,
                   bigram_lm_scores(df.repartition(13)).collect()))
    assert a == b
