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

def _brute_kn(docs, discount=None):
    """pure-Python interpolated Kneser-Ney with the Chen-Goodman
    count-of-counts discount (matches operators/lm.py kn_lm_scores)."""
    toks = {i: s.split(" ") for i, s in docs}
    bg = {i: list(zip(t, t[1:])) for i, t in toks.items() if len(t) >= 2}
    cb = Counter(p for ps in bg.values() for p in ps)
    cu = Counter()
    t1 = Counter()
    r2 = Counter()
    for (w1, w2), c in cb.items():
        cu[w1] += c
        t1[w1] += 1
        r2[w2] += 1
    btypes = len(cb)
    if discount is None:
        n1 = sum(1 for c in cb.values() if c == 1)
        n2 = sum(1 for c in cb.values() if c == 2)
        discount = n1 / (n1 + 2.0 * n2) if n1 + 2 * n2 > 0 else 0.5
    out = {}
    for i, ps in bg.items():
        s = 0.0
        for w1, w2 in ps:
            p = (max(cb[(w1, w2)] - discount, 0.0) / cu[w1]
                 + (discount * t1[w1] / cu[w1]) * (r2[w2] / btypes))
            s += math.log(p)
        out[i] = (len(ps), round(s / len(ps), 6),
                  round(math.exp(-s / len(ps)), 4))
    return out


def test_kn_hand_computed_smoke(spark):
    from osc_geo_h3grid_srv_spark.operators.lm import kn_lm_scores
    rows = [(0, "a b a b c"), (1, "a b"), (2, "x"), (3, "c c c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"],
                         r["perplexity"])
           for r in kn_lm_scores(df).collect()}
    assert 2 not in got  # <2 tokens -> no bigrams
    assert got == _brute_kn(rows)


def test_kn_brute_force_parity_random_corpus(spark):
    import random
    from osc_geo_h3grid_srv_spark.operators.lm import kn_lm_scores
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(17)]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(1, 30))))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"],
                         r["perplexity"])
           for r in kn_lm_scores(df).collect()}
    assert got == _brute_kn(rows)


def test_kn_fixed_discount_and_mass_conservation(spark):
    """with a fixed D, sum_w2 P(w2|w1) must be 1 for every context w1
    (interpolated KN conserves probability mass exactly over the
    observed continuation vocabulary)."""
    import random
    from osc_geo_h3grid_srv_spark.operators.lm import kn_lm_scores
    rng = random.Random(3)
    vocab = [f"v{i}" for i in range(9)]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(25)))
            for i in range(30)]
    got = {r["doc_id"]: r["perplexity"]
           for r in kn_lm_scores(
               spark.createDataFrame(rows, "doc_id long, text string"),
               discount=0.75).collect()}
    brute = {i: v[2] for i, v in _brute_kn(rows, discount=0.75).items()}
    assert got == brute
    # mass conservation in the brute model (validates the formula itself)
    toks = {i: s.split(" ") for i, s in rows}
    bg = [p for t in toks.values() for p in zip(t, t[1:])]
    cb = Counter(bg)
    cu = Counter()
    t1 = Counter()
    r2 = Counter()
    for (w1, w2), c in cb.items():
        cu[w1] += c
        t1[w1] += 1
        r2[w2] += 1
    btypes = len(cb)
    all_w2 = set(r2)
    for w1 in cu:
        tot = sum(max(cb.get((w1, w2), 0) - 0.75, 0.0) / cu[w1]
                  + (0.75 * t1[w1] / cu[w1]) * (r2[w2] / btypes)
                  for w2 in all_w2)
        assert abs(tot - 1.0) < 1e-9


def test_kn_partition_invariance(spark):
    from osc_geo_h3grid_srv_spark.operators.lm import kn_lm_scores
    rows = [(i, " ".join(f"t{(i * j) % 11}" for j in range(12)))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, kn_lm_scores(df).collect()))
    b = sorted(map(tuple, kn_lm_scores(df.repartition(13)).collect()))
    assert a == b
