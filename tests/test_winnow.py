"""Winnowing fingerprint tests (operators/winnow.py)."""

import hashlib

import pytest

from osc_geo_h3grid_srv_spark.operators.winnow import (
    fingerprint_stats, winnow_fingerprints)


def _h(gram):
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)


def _brute(text, k, w):
    t = text.lower().split(" ")
    hs = [_h(" ".join(t[i:i + k])) for i in range(len(t) - k + 1)]
    if not hs:
        return set()
    sel = set()
    if len(hs) < w:
        m = min(hs)
        p = max(i for i, v in enumerate(hs) if v == m)  # rightmost
        return {(p, hs[p])}
    for end in range(w - 1, len(hs)):
        window = hs[end - w + 1:end + 1]
        m = min(window)
        p = end - w + 1 + max(
            i for i, v in enumerate(window) if v == m)
        sel.add((p, hs[p]))
    return sel


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "completely different words compose this second document body"),
    (3, "a b c a b c a b c a b c a b c"),       # heavy repeats -> ties
    (4, "tiny doc here"),                       # < k tokens for k=4
    (5, "five tokens right here now"),          # grams < w (short path)
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_winnow_matches_brute_force(spark):
    got = {}
    for r in winnow_fingerprints(_df(spark), k=4, w=5).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["h"]))
    for doc_id, text in DOCS:
        want = _brute(text, 4, 5)
        assert got.get(doc_id, set()) == want, doc_id


def test_shared_substring_guarantee(spark):
    # two docs sharing a run of >= w+k-1 tokens must share a fingerprint
    k, w = 3, 4
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 >= 6
    docs = spark.createDataFrame(
        [(1, "xx yy " + shared + " zz"),
         (2, shared + " qq rr ss tt")],
        "doc_id long, text string")
    fp = {}
    for r in winnow_fingerprints(docs, k=k, w=w).collect():
        fp.setdefault(r["doc_id"], set()).add(r["h"])
    assert fp[1] & fp[2]


def test_stats_density_and_checksum(spark):
    got = {r["doc_id"]: r.asDict()
           for r in fingerprint_stats(_df(spark), k=4, w=5).collect()}
    assert 4 not in got  # < k tokens: no grams, no row
    for doc_id, text in DOCS:
        if doc_id == 4:
            continue
        want = _brute(text, 4, 5)
        r = got[doc_id]
        assert r["n_fp"] == len(want)
        assert r["fp_checksum"] == sum(h for _, h in want)
        n_grams = len(text.split()) - 3
        assert r["n_grams"] == n_grams
        assert r["density"] == pytest.approx(len(want) / n_grams,
                                             abs=1e-6)


def test_validation(spark):
    with pytest.raises(ValueError):
        winnow_fingerprints(_df(spark), k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(_df(spark), w=0)
