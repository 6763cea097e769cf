"""Product-quantization tests (operators/similarity.py PQ section)."""

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.operators.similarity import (
    pq_adc_topk, pq_encode, pq_half_sq, pq_seed_codebooks)


def _vecs(n, dim, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randn(n, dim).astype(np.float32) / np.sqrt(dim)


def _df(spark, v):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(v)],
        "vec_id long, embedding array<float>")


def _brute_codes(v, cb):
    m, k, sub = cb.shape
    out = []
    for row in v.astype(np.float64):
        codes = []
        for j in range(m):
            xs = row[j * sub:(j + 1) * sub]
            d = ((xs[None, :] - cb[j]) ** 2).sum(axis=1)
            codes.append(int(np.argmin(d)))  # first min == lower code
        out.append(codes)
    return out


def test_encode_matches_brute_argmin_l2(spark):
    v = _vecs(60, 32)
    cb = pq_seed_codebooks(32, 4, 8)
    got = {r["vec_id"]: list(r["pq_codes"])
           for r in pq_encode(_df(spark, v), cb).collect()}
    want = _brute_codes(v, cb)
    for i in range(len(v)):
        assert got[i] == want[i], i


def test_adc_score_matches_brute(spark):
    v = _vecs(40, 32, seed=5)
    cb = pq_seed_codebooks(32, 4, 8)
    q = [float(x) for x in v[0]]
    enc = pq_encode(_df(spark, v), cb)
    top = pq_adc_topk(enc, q, cb, k=40).collect()
    codes = _brute_codes(v, cb)
    m, _k, sub = cb.shape
    for r in top:
        want = 0.0
        for j in range(m):
            c = cb[j][codes[r["vec_id"]][j]]
            s = 0.0
            for a, b in zip(q[j * sub:(j + 1) * sub], c):
                s += a * float(b)
            want += s - pq_half_sq(c)
        assert r["adc_score"] == pytest.approx(want, abs=1e-9)
    # scores descending, ties by id
    ss = [(-r["adc_score"], r["vec_id"]) for r in top]
    assert ss == sorted(ss)


def test_adc_ranking_tracks_exact_neighbors(spark):
    # PQ is lossy, but the query's own vector must land in the ADC
    # top-5 of a 200-vector corpus, and recall@10 vs exact L2 must be
    # well above chance (deterministic inputs -> stable assertion)
    v = _vecs(200, 64, seed=11)
    cb = pq_seed_codebooks(64, 8, 16)
    q = v[17].astype(np.float64)
    enc = pq_encode(_df(spark, v), cb)
    top10 = [r["vec_id"]
             for r in pq_adc_topk(enc, list(q), cb, k=10).collect()]
    assert 17 in top10[:5]
    exact = np.argsort(((v.astype(np.float64) - q) ** 2).sum(axis=1))
    overlap = len(set(top10) & set(int(x) for x in exact[:10]))
    assert overlap >= 3, (top10, exact[:10])


def test_pq_validation():
    with pytest.raises(ValueError):
        pq_seed_codebooks(33, 4, 8)  # dim not divisible


def test_adc_arg_validation(spark):
    v = _vecs(5, 32)
    cb = pq_seed_codebooks(32, 4, 8)
    enc = pq_encode(_df(spark, v), cb)
    with pytest.raises(ValueError):
        pq_adc_topk(enc, [0.0] * 32, cb, k=0)
    with pytest.raises(ValueError):
        pq_adc_topk(enc, [0.0] * 31, cb, k=5)
